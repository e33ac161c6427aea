"""dedup_clusters + curate_corpus — constructed near-dup corpora."""

from __future__ import annotations

import pyarrow as pa
import ray.data

from cassovary_ray import textops


def _docs(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))


BASE = "the quick brown fox jumps over the lazy dog near the riverbank today"


def test_dedup_clusters_transitive():
    # 0 ~ 1 (one word changed), 1 ~ 2 (another word changed) -> one cluster
    # {0,1,2} by transitivity even if 0~2 alone is below threshold; 3 distinct
    t0 = BASE
    t1 = BASE.replace("quick", "swift")
    t2 = t1.replace("lazy", "idle")
    t3 = "completely different content about graph engines and arrow tables kernels"
    out = textops.dedup_clusters(_docs([t0, t1, t2, t3]), n=3, max_df=50,
                                 threshold=0.5)
    got = {r["doc_id"]: r["canonical"] for r in out.take_all()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 3}


def test_dedup_clusters_no_pairs():
    texts = ["alpha beta gamma delta epsilon zeta", "one two three four five six",
             "red green blue yellow purple orange"]
    out = textops.dedup_clusters(_docs(texts), n=3, threshold=0.5)
    got = {r["doc_id"]: r["canonical"] for r in out.take_all()}
    assert got == {0: 0, 1: 1, 2: 2}


def test_curate_corpus_filters_and_dedups():
    docs = _docs(
        [
            BASE,                       # kept (13 tokens, all alpha)
            "too short",                # dropped: < 10 tokens
            "1 2 3 4 5 6 7 8 9 10 11 12",  # dropped: alpha ratio < 1/2
            BASE,                       # exact dup of 0 -> dropped (doc 0 kept)
            BASE + " extra",            # kept: distinct text
        ],
        ids=[0, 1, 2, 3, 4],
    )
    out = textops.curate_corpus(docs, min_tokens=10)
    got = {r["doc_id"]: r["n_tokens"] for r in out.take_all()}
    assert got == {0: 13, 4: 14}


def test_curate_corpus_dup_keeps_min_id():
    docs = _docs([BASE, BASE, BASE], ids=[7, 3, 9])
    out = textops.curate_corpus(docs, min_tokens=5)
    got = sorted(r["doc_id"] for r in out.take_all())
    assert got == [3]


def test_vectorized_token_kernels_match_duckdb_semantics():
    """token_counts/quality_scores are RE2-vectorized (VERDICT r2 #4): they
    must agree with DuckDB's regexp expressions on adversarial whitespace,
    including the corners where Python re diverges (\\v, NBSP)."""
    import duckdb

    texts = [" hello  world ", "a\tb\nc", "", "   ", "héllo wörld",
             "a\x0bb", "a\xa0b", "one", " lead", "trail ", "a  b   c"]
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    got_t = textops.token_counts(docs).to_pandas().set_index("doc_id")["n_tokens"]
    got_q = textops.quality_scores(docs).to_pandas().set_index("doc_id")
    con = duckdb.connect()
    con.register("d", __import__("pandas").DataFrame(
        {"doc_id": range(len(texts)), "text": texts}))
    want = con.execute(r"""
        SELECT doc_id,
               length(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
               length(text) AS n_chars_calc,
               length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS n_alpha
        FROM d ORDER BY doc_id""").df().set_index("doc_id")
    for i in range(len(texts)):
        assert got_t.loc[i] == want["n_tokens"].loc[i], (i, texts[i])
        assert got_q["n_tokens"].loc[i] == want["n_tokens"].loc[i]
        assert got_q["n_chars_calc"].loc[i] == want["n_chars_calc"].loc[i]
        assert got_q["n_alpha"].loc[i] == want["n_alpha"].loc[i]
