"""paragraph_dedup / stratified_sample / unigram_rarity — constructed
fixtures with hand-computed expectations (brute-force Python oracles)."""

from __future__ import annotations

import hashlib

import pyarrow as pa
import ray.data

from cassovary_ray import textops


def _docs(texts, ids=None, langs=None):
    ids = ids if ids is not None else list(range(len(texts)))
    cols = {
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    }
    if langs is not None:
        cols["lang"] = pa.array(langs, pa.string())
    return ray.data.from_arrow(pa.table(cols))


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_paragraph_dedup_canonical_and_counts():
    # "boiler" appears in docs 2, 5 (twice), 9 -> canonical doc 2,
    # 4 occurrences, 3 docs. Empty lines are dropped. Unique lines keep
    # their own doc.
    docs = _docs(
        [
            "boiler\nunique-two",
            "boiler\n\nboiler\nunique-five",
            "unique-nine\nboiler",
        ],
        ids=[2, 5, 9],
    )
    out = {r["line_md5"]: r for r in textops.paragraph_dedup(docs).take_all()}
    b = out[_md5("boiler")]
    assert (b["doc_id"], b["n_occurrences"], b["n_docs"]) == (2, 4, 3)
    assert out[_md5("unique-five")]["doc_id"] == 5
    assert out[_md5("unique-nine")]["n_occurrences"] == 1
    assert _md5("") not in out
    assert len(out) == 4  # boiler + 3 uniques


def test_paragraph_dedup_parallelism_invariant():
    texts = [f"shared\nline-{i}\nshared" for i in range(40)]
    docs = _docs(texts)
    one = {r["line_md5"]: (r["doc_id"], r["n_occurrences"], r["n_docs"])
           for r in textops.paragraph_dedup(docs.repartition(1)).take_all()}
    many = {r["line_md5"]: (r["doc_id"], r["n_occurrences"], r["n_docs"])
            for r in textops.paragraph_dedup(docs.repartition(8)).take_all()}
    assert one == many
    assert one[_md5("shared")] == (0, 80, 40)


def _u(doc_id: int) -> float:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) / 2**32


def test_stratified_sample_matches_bruteforce():
    n = 200
    langs = ["en", "de", "fr", "xx"]
    rates = {"en": 0.5, "de": 0.25, "fr": 0.1}
    docs = _docs(["t"] * n, ids=list(range(n)),
                 langs=[langs[i % 4] for i in range(n)])
    out = textops.stratified_sample(docs, rates, default_rate=0.05)
    got = sorted(r["doc_id"] for r in out.take_all())
    want = [i for i in range(n)
            if _u(i) < rates.get(langs[i % 4], 0.05)]
    assert got == want
    # sanity: the sample is non-trivial and stratified (en kept more than fr)
    en = sum(1 for i in got if i % 4 == 0)
    fr = sum(1 for i in got if i % 4 == 2)
    assert en > fr > 0 or fr == 0


def test_stratified_sample_deterministic_across_parallelism():
    n = 100
    docs = _docs(["t"] * n, ids=list(range(n)), langs=["en"] * n)
    a = sorted(r["doc_id"] for r in
               textops.stratified_sample(docs.repartition(1), {"en": 0.3}).take_all())
    b = sorted(r["doc_id"] for r in
               textops.stratified_sample(docs.repartition(7), {"en": 0.3}).take_all())
    assert a == b


def test_unigram_rarity_hand_computed():
    # corpus: "a a b" and "b c" -> freq: a=2, b=2, c=1
    docs = _docs(["a a b", "b c"], ids=[10, 11])
    out = {r["doc_id"]: r for r in textops.unigram_rarity(docs).take_all()}
    d0, d1 = out[10], out[11]
    # doc 10: tokens a,a,b -> n=3, min freq 2, sum 2+2+2=6
    assert (d0["n_tokens"], d0["min_tok_freq"], d0["sum_tok_freq"]) == (3, 2, 6)
    # doc 11: tokens b,c -> n=2, min freq 1, sum 2+1=3
    assert (d1["n_tokens"], d1["min_tok_freq"], d1["sum_tok_freq"]) == (2, 1, 3)


def test_unigram_rarity_parallelism_invariant():
    texts = [f"common word-{i % 5} tail-{i}" for i in range(30)]
    docs = _docs(texts)
    one = {r["doc_id"]: (r["n_tokens"], r["min_tok_freq"], r["sum_tok_freq"])
           for r in textops.unigram_rarity(docs.repartition(1)).take_all()}
    many = {r["doc_id"]: (r["n_tokens"], r["min_tok_freq"], r["sum_tok_freq"])
            for r in textops.unigram_rarity(docs.repartition(6)).take_all()}
    assert one == many
    # every doc has the unique tail token -> min_tok_freq == 1 everywhere
    assert all(v[1] == 1 for v in one.values())
    assert all(v[0] == 3 for v in one.values())


def test_paragraph_dedup_docs_rewrite():
    docs = _docs(
        [
            "boiler\nunique-two",
            "boiler\n\nboiler\nunique-five",
            "unique-nine\nboiler\nunique-nine-b",
            "boiler",  # left with no surviving lines -> dropped
        ],
        ids=[2, 5, 9, 12],
    )
    out = {r["doc_id"]: (r["text_clean"], r["n_lines"])
           for r in textops.paragraph_dedup_docs(docs).take_all()}
    assert out == {
        2: ("boiler\nunique-two", 2),
        5: ("unique-five", 1),
        9: ("unique-nine\nunique-nine-b", 2),
    }


def test_paragraph_dedup_docs_parallelism_invariant():
    docs = _docs([f"shared\nline-{i}\nshared\ntail-{i}" for i in range(40)])
    a = {r["doc_id"]: (r["text_clean"], r["n_lines"])
         for r in textops.paragraph_dedup_docs(docs.repartition(1)).take_all()}
    b = {r["doc_id"]: (r["text_clean"], r["n_lines"])
         for r in textops.paragraph_dedup_docs(docs.repartition(8)).take_all()}
    assert a == b
    assert a[0] == ("shared\nline-0\ntail-0", 3)
    assert a[7] == ("line-7\ntail-7", 2)


def test_bpe_token_counts():
    docs = _docs(["Hello, world!  It's 2026...", "", "   ", "don't stop-me now 3.14"])
    out = {r["doc_id"]: r["n_bpe_tokens"]
           for r in textops.bpe_token_counts(docs).take_all()}
    # hand-tokenized with the GPT-2-style coarse split
    assert out == {0: 10, 1: 0, 2: 1, 3: 10}


# -- repetition signals (textops.repetition_signals) --------------------------


def test_repetition_signals_fixture():
    # "a b a b\na b a b\nc": lines [x, x, 'c'] → 3 lines, 1 dup slot,
    # chars 7+7+1=15, dup chars 7; tokens a b a b a b a b c → 8 2-gram
    # slots, top (a,b)×4; 5 5-gram slots, 3 distinct → 2 dup
    df = textops.repetition_signals(
        _docs(["a b a b\na b a b\nc"])).to_pandas()
    r = df.iloc[0]
    assert (r.n_lines, r.n_dup_lines, r.total_line_chars, r.dup_line_chars) \
        == (3, 1, 15, 7)
    assert (r.n_2grams, r.top_2gram_count, r.n_5grams, r.n_dup_5grams) \
        == (8, 4, 5, 2)


def test_repetition_signals_edge_cases():
    # empty text: one empty line slot, one empty token, no grams;
    # no-repeat text: everything distinct
    df = textops.repetition_signals(
        _docs(["", "x y z w v u"])).to_pandas().set_index("doc_id")
    empty = df.loc[0]
    assert (empty.n_lines, empty.n_dup_lines, empty.total_line_chars,
            empty.dup_line_chars) == (1, 0, 0, 0)
    assert (empty.n_2grams, empty.top_2gram_count,
            empty.n_5grams, empty.n_dup_5grams) == (0, 0, 0, 0)
    clean = df.loc[1]
    assert (clean.n_lines, clean.n_dup_lines) == (1, 0)
    assert (clean.n_2grams, clean.top_2gram_count,
            clean.n_5grams, clean.n_dup_5grams) == (5, 1, 2, 0)


def test_repetition_signals_vs_duckdb():
    import duckdb
    import pandas as pd

    from cassovary_ray.queries import ORACLE_SQL

    texts = ["a b a b\na b a b\nc", "", "  lead space\nlead space",
             "x\tx\nx x x x x x", "one two three four five six seven"]
    docs = _docs(texts)
    got = textops.repetition_signals(docs).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts}))
    want = con.sql(ORACLE_SQL["doc_repetition"]).df().sort_values(
        "doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  want[sorted(want.columns)])


# -- decontamination (textops.contamination_counts) ---------------------------


def test_contamination_counts_fixture():
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    # 10 tokens → 3 distinct 8-grams; train doc 1 copies the benchmark text
    # (shares all 3), doc 2 shares a 9-token prefix (2 grams), doc 3 clean
    ref = _docs([base], ids=[100])
    train = _docs(
        [base,
         "alpha beta gamma delta epsilon zeta eta theta iota X Y",
         "totally unrelated words " * 5],
        ids=[1, 2, 3])
    df = textops.contamination_counts(train, ref, n=8).to_pandas()
    got = dict(zip(df.doc_id.astype(int), df.n_shared.astype(int)))
    assert got == {1: 3, 2: 2, 3: 0}


def test_contamination_counts_empty_ref():
    train = _docs(["a b c d e f g h i"], ids=[1])
    ref = _docs([], ids=[])
    df = textops.contamination_counts(train, ref, n=8).to_pandas()
    assert dict(zip(df.doc_id, df.n_shared)) == {1: 0}


# -- PII redaction (textops.redact_pii) ----------------------------------------


def test_redact_pii_counts_and_hash():
    from cassovary_ray.textops import redact_pii

    docs = _docs([
        "mail bob.smith+x@exa-mple.co.uk or call +1 (415) 555-0199 now",
        "server 192.168.0.1 and 8.8.8.8",
        "clean text", ""])
    df = redact_pii(docs).to_pandas().set_index("doc_id")
    assert (int(df.loc[0].n_emails), int(df.loc[0].n_phones)) == (1, 1)
    assert int(df.loc[1].n_ips) == 2
    assert df.loc[2].clean_md5 == _md5("clean text")
    assert df.loc[0].clean_md5 == _md5(
        "mail <EMAIL> or call <PHONE> now")
    assert df.loc[1].clean_md5 == _md5("server <IP> and <IP>")


def test_gopher_filter_rules():
    from cassovary_ray.textops import gopher_filter

    docs = _docs([
        "one two three four five six seven eight nine ten eleven",  # clean
        "short doc",                                                # < 10 toks
        "spam spam spam spam spam spam spam spam spam spam spam",   # top-2gram
        "a b\n" * 20 + "c d e f g h i j k l",                       # dup lines
    ])
    df = gopher_filter(docs).to_pandas().set_index("doc_id")
    assert int(df.loc[0].keep) == 1
    assert int(df.loc[1].keep) == 0      # too short
    assert int(df.loc[2].keep) == 0      # repeated bigram dominates
    assert int(df.loc[3].keep) == 0      # duplicate line slots over 30%
