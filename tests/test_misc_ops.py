"""Closeness centrality, PPR, sampling kernels, multimodal plumbing,
text ops (minhash/simhash/fingerprints)."""

from __future__ import annotations

import os

import numpy as np
import pytest
import pyarrow as pa
import ray.data

from cassovary_ray.analytics import closeness_centrality
from cassovary_ray.corpus import TOY_GRAPHS
from cassovary_ray.engine import ShardedGraph
from cassovary_ray.multimodal import decode_images, frame_sample, synth_media_table
from cassovary_ray.sampling import BinomialDistribution, random_subset, sample_dataset
from cassovary_ray import textops

from tests.util import build_toy_layout, edges_ds_for_graph


def brute_closeness(adj, normalized=True):
    import collections

    verts = set(adj) | {v for vs in adj.values() for v in vs}
    n = len(verts)
    out = {}
    for s in verts:
        depths = {s: 0}
        q = collections.deque([s])
        while q:
            u = q.popleft()
            for w in adj.get(u, []):
                if w not in depths:
                    depths[w] = depths[u] + 1
                    q.append(w)
        reachable, dsum = len(depths), sum(depths.values())
        if dsum > 0 and n > 1:
            denom = (n - 1) / (reachable - 1) if normalized else 1.0
            out[s] = (reachable - 1) / (denom * dsum)
        else:
            out[s] = 0.0
    return out


@pytest.mark.parametrize("normalized", [True, False])
def test_closeness_vs_bruteforce(normalized):
    adj = TOY_GRAPHS["g6"]
    # sampled sources (the scale path); formula still exact per source
    df = closeness_centrality(edges_ds_for_graph(adj), sources=[10, 13],
                              normalized=normalized).to_pandas()
    want = brute_closeness(adj, normalized)
    got = dict(zip(df.vertex, df.closeness))
    for v in [10, 13]:
        assert got[v] == pytest.approx(want[v], abs=1e-12)


def test_personalized_reputation(tmp_dir):
    lay = os.path.join(tmp_dir, "l")
    build_toy_layout(TOY_GRAPHS["g6"], lay, 2)
    with ShardedGraph(lay) as g:
        df = g.personalized_reputation(10, num_steps=1000, num_walkers=20,
                                       reset_prob=0.3, seed=5).to_pandas()
    assert df["visits"].sum() == 1000
    # start node dominates under reset_prob 0.3
    assert df.iloc[0]["vertex"] == 10
    # sorted desc
    assert list(df["visits"]) == sorted(df["visits"], reverse=True)


def test_random_subset_deterministic():
    v = np.arange(100)
    a = random_subset(v, 10, seed=3)
    b = random_subset(v, 10, seed=3)
    assert np.array_equal(a, b)
    assert len(set(a)) == 10
    assert not np.array_equal(np.sort(a), np.sort(random_subset(v, 10, seed=4)))


def test_sample_dataset_keyed():
    ds = ray.data.from_arrow(pa.table({"k": pa.array(range(1000), pa.int64())}))
    a = sample_dataset(ds, 0.2, seed=1, key_col="k").to_pandas()
    b = sample_dataset(ds.repartition(7), 0.2, seed=1, key_col="k").to_pandas()
    assert sorted(a["k"]) == sorted(b["k"])  # parallelism-invariant
    assert 120 < len(a) < 280


def test_binomial_distribution():
    d = BinomialDistribution(20, 0.3)
    assert d.pmf.sum() == pytest.approx(1.0)
    assert d.cdf[-1] == pytest.approx(1.0)
    s = d.sample(2000, seed=2)
    assert abs(s.mean() - 6.0) < 0.3  # E[X] = np = 6


def test_multimodal_decode_plumbing():
    media = ray.data.from_arrow(synth_media_table(20))
    feats = decode_images(media, concurrency=2, batch_size=8).to_pandas()
    assert len(feats) == 20
    assert all(len(f) == 64 for f in feats["features"])
    # deterministic across runs
    again = decode_images(ray.data.from_arrow(synth_media_table(20)),
                          concurrency=2, batch_size=8).to_pandas()
    a = {r.media_id: list(r.features) for r in feats.itertuples()}
    b = {r.media_id: list(r.features) for r in again.itertuples()}
    assert a == b


def test_multimodal_unsupported_mime_raises():
    from cassovary_ray.multimodal import ImageDecodeStage

    stage = ImageDecodeStage()
    if stage.pil is None:
        with pytest.raises(NotImplementedError):
            stage(pa.table({
                "media_id": pa.array([0], pa.int64()),
                "payload": pa.array([b"\x89PNG not a bmp"], pa.binary()),
            }))


def test_frame_sample():
    media = ray.data.from_arrow(synth_media_table(3, kind="video"))
    # 6 frames per payload, every 2nd kept -> 3 rows per media
    out = frame_sample(media, every_n=2).to_pandas()
    assert len(out) == 9
    assert sorted(out["frame_idx"].unique()) == [0, 2, 4]


def _docs(texts):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["t"] * len(texts), pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))


def test_minhash_finds_near_dups():
    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    near = base.replace("lazy", "sleepy")
    far = "completely different words about graphs and rays and tables " * 5
    df = textops.minhash_lsh_pairs(_docs([base, near, far]),
                                   jaccard_threshold=0.3).to_pandas()
    pairs = set(map(tuple, df[["a", "b"]].values))
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_simhash_near_dup_low_hamming():
    """One token changed out of 64 → tiny Hamming distance; the banded
    bucket search must surface the pair (guaranteed for d ≤ 7 with 8 bands)."""
    words = [f"tok{i}" for i in range(64)]
    base = " ".join(words)
    near = " ".join(["tokX" if i == 31 else w for i, w in enumerate(words)])
    a, b = textops.simhash_batch([base, near]).view(np.int64)
    ham = bin(int(np.uint64(a) ^ np.uint64(b))).count("1")
    assert ham <= 7, ham
    df = textops.simhash_dup_pairs(_docs([base, near]), max_hamming=7).to_pandas()
    assert (0, 1) in set(map(tuple, df[["a", "b"]].values))


def test_fingerprint_deterministic():
    texts = ["one two three four five six seven eight nine ten"] * 2 + ["other words"]
    df = textops.rolling_fingerprint(_docs(texts)).to_pandas()
    fp = dict(zip(df.doc_id, df.fingerprint))
    assert fp[0] == fp[1]
    assert fp[0] != fp[2]


def test_substring_dup_counts_constructed():
    """ExactSubstr slots: per doc, positional 8-gram slots whose gram text
    appears in >= 2 distinct docs — brute-force parity on constructed
    overlaps, including intra-doc-only repeats (not counted)."""
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # exactly 8 tokens
    d0 = shared + " unique0 tail0 tail1 tail2"
    d1 = "lead1 " + shared + " unique1"
    d2 = "totally different words here nothing matches at all ok"
    # d3 repeats an 8-gram WITHIN itself only -> ndocs=1 -> not counted
    d3 = ("r1 r2 r3 r4 r5 r6 r7 r8 sep " * 2).strip()
    texts = [d0, d1, d2, d3]
    got = textops.substring_dup_counts(_docs(texts), n=8).to_pandas()
    got = dict(zip(got.doc_id, got.n_dup_spans))

    # brute force
    import re
    ws = re.compile(r"\s+")
    grams_per_doc = []
    for t in texts:
        toks = ws.split(t.strip(" "))
        grams_per_doc.append([" ".join(toks[j:j + 8])
                              for j in range(len(toks) - 8 + 1)])
    from collections import defaultdict
    docs_of = defaultdict(set)
    for i, gs in enumerate(grams_per_doc):
        for g in gs:
            docs_of[g].add(i)
    want = {i: sum(1 for g in gs if len(docs_of[g]) >= 2)
            for i, gs in enumerate(grams_per_doc)}
    assert got == want
    assert want[0] >= 1 and want[1] >= 1  # the shared gram counted both sides
    assert want[2] == 0 and want[3] == 0


# ---------------------------------------------------------------------------
# Hash-sketch oracle parity: the DuckDB SQL builders evaluate the literal
# same md5-token-hash / polynomial-fold / splitmix64 integers as the engine
# kernels (the sf0.01 gate re-checks end-to-end; these pin the toy cases
# incl. empty docs, sub-window docs, and the union-empty jaccard=1.0 rule).
# ---------------------------------------------------------------------------

_SKETCH_TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy cat",
    "completely different words here entirely",
    "one", "two words", "   ", "a b c d e f g", "x " * 200, "", "solo",
]


def _sketch_con():
    import duckdb
    import pandas as pd

    docs = pd.DataFrame({
        "doc_id": np.arange(len(_SKETCH_TEXTS), dtype=np.int64),
        "text": _SKETCH_TEXTS,
    })
    con = duckdb.connect()
    con.register("documents", docs)
    return con


def test_simhash_sql_matches_engine_kernel():
    from cassovary_ray.oracles import simhash_sql

    want = textops.simhash_batch(_SKETCH_TEXTS).view(np.int64)
    con = _sketch_con()  # hold: a chained temp connection GCs mid-query
    got = dict(con.sql(simhash_sql()).fetchall())
    assert all(got[i] == int(want[i]) for i in range(len(_SKETCH_TEXTS)))


def test_fingerprint_sql_matches_engine_kernel():
    from cassovary_ray.oracles import rolling_fingerprint_sql

    df = textops.rolling_fingerprint(_docs(_SKETCH_TEXTS)).to_pandas()
    want = dict(zip(df.doc_id, df.fingerprint))
    con = _sketch_con()
    got = dict(con.sql(rolling_fingerprint_sql()).fetchall())
    assert all(got[i] == int(want[i]) for i in range(len(_SKETCH_TEXTS)))


def test_minhash_pairs_sql_matches_engine():
    from cassovary_ray.oracles import minhash_pairs_sql

    eng = textops.minhash_lsh_pairs(
        _docs(_SKETCH_TEXTS), jaccard_threshold=0.4).to_pandas()
    want = sorted((int(a), int(b), float(j))
                  for a, b, j in eng[["a", "b", "jaccard"]].values)
    con = _sketch_con()
    got = sorted((int(a), int(b), float(j)) for a, b, j in
                 con.sql(minhash_pairs_sql(threshold=0.4)).fetchall())
    assert got == want
    # the empty/whitespace docs (zero signatures, union-empty) pair at 1.0
    assert (5, 8, 1.0) in got
