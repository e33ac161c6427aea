"""Round-3 operator additions: bigram-LM scoring, hourly anomaly z-test,
crawl frontier, url canonicalization/dedup."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from cassovary_ray import events as events_ops
from cassovary_ray import extract, textops

Q = float(1 << 20)


def _brute_lm(texts: dict[int, str]) -> dict[int, tuple[int, int]]:
    """(n_bigrams, lm_logprob_q) per doc — direct reimplementation."""
    cab: Counter = Counter()
    for t in texts.values():
        toks = t.strip(" ").split()
        cab.update(zip(toks, toks[1:]))
    ca: Counter = Counter()
    for (a, _b), c in cab.items():
        ca[a] += c
    out = {}
    for did, t in texts.items():
        toks = t.strip(" ").split()
        bgs = list(zip(toks, toks[1:]))
        s = sum(
            math.floor(math.log(cab[g]) * Q) - math.floor(math.log(ca[g[0]]) * Q)
            for g in bgs
        )
        out[did] = (len(bgs), s)
    return out


def test_lm_scores_brute_force():
    texts = {
        1: "the cat sat on the mat",
        2: "the cat ran",
        3: "a dog sat on a log",
        4: "the cat sat on the mat again",
        5: "xyzzy",           # single token: no bigrams, zero-filled
        6: "",                # empty text: no bigrams
    }
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(texts), pa.int64()),
        "text": pa.array(list(texts.values()), pa.string()),
    }))
    got = textops.lm_scores(docs).to_pandas().set_index("doc_id")
    want = _brute_lm(texts)
    assert set(got.index) == set(texts)
    for did, (nb, s) in want.items():
        assert int(got.loc[did, "n_bigrams"]) == nb, did
        assert int(got.loc[did, "lm_logprob_q"]) == s, did
    # repeated bigrams score higher (less negative) than hapax bigrams
    per_bg = {d: s / max(n, 1) for d, (n, s) in want.items() if n}
    assert per_bg[4] > per_bg[3]


def _events_table(rows):
    return ray.data.from_arrow(pa.table({
        "ts": pa.array([r[0] * 3_600_000_000 + 5 for r in rows],
                       pa.timestamp("us")),
        "event_type": pa.array([r[1] for r in rows], pa.string()),
        "user_id": pa.array([7] * len(rows), pa.int64()),
        "event_id": pa.array(list(range(len(rows))), pa.int64()),
        "value": pa.array([1.0] * len(rows), pa.float64()),
    }))


def test_hourly_anomalies_flags_spike():
    # type "a": 12 quiet hours at 2 events + one 40-event spike → flagged;
    # type "b": constant rate (zero variance) → nothing flagged
    rows = []
    for h in range(12):
        rows += [(h, "a")] * 2
    rows += [(12, "a")] * 40
    for h in range(13):
        rows += [(h, "b")] * 3
    out = events_ops.hourly_anomalies(_events_table(rows), z_threshold=3)
    df = out.to_pandas()
    assert list(zip(df.event_type, df.hour)) == [("a", 12)]
    assert int(df.n_events.iloc[0]) == 40
    # the exact-integer z² test agrees with the float z-score
    c = np.array([2.0] * 12 + [40.0])
    z = (40 - c.mean()) / c.std()
    assert z >= 3


def test_hourly_anomalies_zero_variance_silent():
    rows = [(h, "c") for h in range(5) for _ in range(4)]
    assert events_ops.hourly_anomalies(_events_table(rows)).count() == 0


def test_crawl_frontier():
    # crawled pages: A, B. A→B (crawled, not frontier), A→C, B→C, B→D
    edges = ray.data.from_arrow(pa.table({
        "src_url": pa.array(["http://a", "http://a", "http://b", "http://b"]),
        "dst_url": pa.array(["http://b", "http://c", "http://c", "http://d"]),
    }))
    df = extract.crawl_frontier(edges, num_partitions=2).to_pandas()
    got = dict(zip(df.url, df.n_inlinks))
    assert got == {"http://c": 2, "http://d": 1}


CANON_CASES = [
    ("http://h1.test/p/5", "http://h1.test/p/5"),
    ("http://h1.test/p/5/", "http://h1.test/p/5"),
    ("http://h1.test:80/p/5", "http://h1.test/p/5"),
    ("http://h1.test/p/5#frag", "http://h1.test/p/5"),
    ("http://h1.test/p/5?utm_source=x", "http://h1.test/p/5"),
    ("http://h1.test/p/5?utm_a=1&q=2", "http://h1.test/p/5?q=2"),
    ("http://h1.test/p/5?q=2&utm_a=1", "http://h1.test/p/5?q=2"),
    ("http://h1.test/p/5?utm_a=1&utm_b=2&q=3", "http://h1.test/p/5?q=3"),
    ("http://h1.test/p/5?utm_a=1&q=2&utm_b=3", "http://h1.test/p/5?q=2"),
    ("http://h1.test:80/p/5/?utm_s=1&q=2#f", "http://h1.test/p/5?q=2"),
    ("https://h1.test:80/", "https://h1.test:80"),  # :80 not https default
    ("http://h1.test:8080/p/5", "http://h1.test:8080/p/5"),
]


def test_canonicalize_urls_cases():
    urls = ray.data.from_arrow(pa.table({
        "url": pa.array([u for u, _ in CANON_CASES], pa.string())}))
    df = extract.canonicalize_urls(urls).to_pandas()
    got = dict(zip(df.url, df.canonical_url))
    for raw, want in CANON_CASES:
        assert got[raw] == want, raw


def test_canonicalize_matches_duckdb_chain():
    """The engine's RE2 chain and the oracle's regexp_replace chain are the
    same transform byte-for-byte."""
    import duckdb

    raws = [u for u, _ in CANON_CASES]
    sql = "SELECT url,\n"
    expr = "url"
    for pat, rep in extract._URL_CANON_STEPS:
        # SQL single-quoted literals pass backslashes through untouched
        expr = f"regexp_replace({expr}, '{pat}', '{rep}', 'g')"
    vals = ", ".join(f"('{u}')" for u in raws)
    sql += f"{expr} AS canon FROM (VALUES {vals}) t(url)"
    want = dict(duckdb.sql(sql).fetchall())
    urls = ray.data.from_arrow(pa.table({"url": pa.array(raws, pa.string())}))
    df = extract.canonicalize_urls(urls).to_pandas()
    got = dict(zip(df.url, df.canonical_url))
    assert got == want


def test_url_dedup_collapses_variants():
    raws = ["http://h1.test/p/5", "http://h1.test/p/5/",
            "http://h1.test:80/p/5#x", "http://h2.test/p/9?q=1",
            "http://h2.test/p/9?utm_z=0&q=1"]
    urls = ray.data.from_arrow(pa.table({"url": pa.array(raws, pa.string())}))
    df = extract.url_dedup(urls).to_pandas().set_index("canonical_url")
    assert int(df.loc["http://h1.test/p/5", "n_variants"]) == 3
    assert df.loc["http://h1.test/p/5", "kept_url"] == "http://h1.test/p/5"
    assert int(df.loc["http://h2.test/p/9?q=1", "n_variants"]) == 2


def test_count_min_overestimates_and_is_tight_when_wide():
    # skewed stream: user 1 hot, many cold users
    counts = {1: 500, 2: 40, 3: 7, **{u: 1 for u in range(10, 40)}}
    uids, ts = [], []
    for u, c in counts.items():
        uids += [u] * c
        ts += list(range(c))
    ds = ray.data.from_arrow(pa.table({
        "user_id": pa.array(uids, pa.int64()),
        "ts": pa.array([t * 1000 for t in ts], pa.timestamp("us")),
    }))
    df = events_ops.count_min_counts(ds, depth=4, width=512, seed=7).to_pandas()
    got = df.set_index("user_id")
    assert set(got.index) == set(counts)
    for u, c in counts.items():
        assert int(got.loc[u, "n_exact"]) == c
        # CM never underestimates
        assert int(got.loc[u, "cm_estimate"]) >= c
    # wide sketch (512 cells, 33 keys): the hot key is exact w.h.p.
    assert int(got.loc[1, "cm_estimate"]) == 500

    # narrow sketch: collisions inflate estimates but never deflate
    df2 = events_ops.count_min_counts(ds, depth=2, width=4, seed=7).to_pandas()
    g2 = df2.set_index("user_id")
    for u, c in counts.items():
        assert int(g2.loc[u, "cm_estimate"]) >= c
    assert int(g2["cm_estimate"].sum()) > int(g2["n_exact"].sum())


def test_quality_lr_matches_numpy_reference():
    """Distributed quantized-gradient LR == a local numpy reimplementation
    bit-for-bit (the int64 gradient fold is order-free), and training
    reduces the logistic loss."""
    from cassovary_ray import learn

    texts, langs = [], []
    for i in range(60):
        if i % 3 == 0:
            texts.append("the quick brown fox " * (3 + i % 5))
            langs.append("en")
        else:
            texts.append(("123 456 !!! %%% " + "na " * (i % 7)) * 2)
            langs.append("de" if i % 3 == 1 else "fr")
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(60), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    }))
    got = learn.train_quality_lr(docs, iterations=10, lr=0.5)
    gw = dict(zip(got["feature"].to_pylist(),
                  got["weight"].to_numpy(zero_copy_only=False)))

    # local reference with the identical fold + quantization
    x, y = learn._doc_features(pa.table({
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string())}))
    QQ = float(1 << 20)
    w = np.zeros(4)

    def loss(wv):
        z = wv[0] * x[:, 0]
        for j in range(1, 4):
            z = z + wv[j] * x[:, j]
        p = 1.0 / (1.0 + np.exp(-z))
        eps = 1e-12
        return -np.mean(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps))

    l0 = loss(w)
    for _ in range(10):
        z = w[0] * x[:, 0]
        for j in range(1, 4):
            z = z + w[j] * x[:, j]
        p = 1.0 / (1.0 + np.exp(-z))
        g = np.floor((p - y)[:, None] * x * QQ).astype(np.int64).sum(axis=0)
        w = w - 0.5 * (g.astype(np.float64) / QQ) / 60.0
    for j, name in enumerate(learn.FEATURES):
        assert gw[name] == w[j], name
    assert loss(w) < l0  # training actually learns the separable labels


def test_ws_split_matches_re2_on_exotic_whitespace():
    """Python re's \\s includes \\v and Unicode whitespace; RE2 (DuckDB /
    pyarrow) does not. _WS_SPLIT must follow RE2 or every hash-gated token
    oracle diverges on web text (ADVICE r3)."""
    import pyarrow.compute as pc

    tricky = ["a\vb c", "x y z", "tab\tsep\nline f\rr", " lead  in ",
              "nb thin　ideo", "", "\v", "plain words here"]
    for t in tricky:
        py = textops._WS_SPLIT.split(t.strip(" "))
        r2 = pc.split_pattern_regex(
            pa.array([t.strip(" ")], pa.string()), r"\s+")[0].as_py()
        assert py == r2, repr(t)


def test_lm_scores_exotic_whitespace_matches_re2_bigrams():
    """End-to-end: documents containing \\v / NBSP score by RE2 token
    boundaries (the oracle's), not Python-re ones."""
    texts = {
        1: "the cat\vsat on the mat",      # \v is NOT a separator for RE2
        2: "the cat sat",
        3: "the cat ran",             # NBSP is NOT a separator
    }
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(texts), pa.int64()),
        "text": pa.array(list(texts.values()), pa.string()),
    }))
    got = textops.lm_scores(docs).to_pandas().set_index("doc_id")
    # RE2 tokens: doc1 = [the, cat\vsat, on, the, mat] → 4 bigrams
    assert int(got.loc[1, "n_bigrams"]) == 4
    # doc3 = [the cat, ran] → 1 bigram
    assert int(got.loc[3, "n_bigrams"]) == 1


def test_z2_flags_bigint_promotion_exact():
    """Past int64 the z² comparison must promote to Python ints, not wrap
    (ADVICE r3). Values chosen so the WRAPPED int64 compare gives the
    opposite answer."""
    big = 3_000_000_000  # inputs fit int64; 9·var_n2 ≈ 8.1e19 > 2^63
    c = np.array([big, 10], dtype=np.int64)
    n = np.array([2, 2], dtype=np.int64)
    s = np.array([big + 10, big + 10], dtype=np.int64)
    ss = np.array([big * big + 100, big * big + 100], dtype=np.int64)
    got = events_ops._z2_flags(c, n, s, ss, 9)
    # exact reference with Python ints
    want = []
    for ci in (int(c[0]), int(c[1])):
        dev = ci * 2 - int(s[0])
        var_n2 = 2 * int(ss[0]) - int(s[0]) ** 2
        want.append(dev * dev >= 9 * var_n2 and var_n2 > 0)
    assert got.tolist() == want
    # sanity: the int64-wrapped compare would differ on at least one row
    with np.errstate(over="ignore"):
        dev64 = c * n - s
        var64 = n * ss - s * s
        wrapped = ((dev64 * dev64 >= 9 * var64) & (var64 > 0)).tolist()
    assert wrapped != want
