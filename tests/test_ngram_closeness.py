"""n-gram-Jaccard near-dup pairs and the multi-source-BFS closeness path."""

from __future__ import annotations

import numpy as np
import pytest
import pyarrow as pa
import ray.data

from cassovary_ray import analytics, textops


def docs_ds(texts: dict[int, str]):
    ids = sorted(texts)
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array([texts[i] for i in ids], pa.string()),
    }))


def brute_jaccard(texts: dict[int, str], n: int, max_df: int):
    """Reference implementation: same df-cut universe, all pairs."""
    sh = {}
    for d, t in texts.items():
        toks = t.split()
        sh[d] = {" ".join(toks[i: i + n]) for i in range(len(toks) - n + 1)}
    from collections import Counter

    df = Counter(s for ss in sh.values() for s in ss)
    kept = {s for s, c in df.items() if c <= max_df}
    sh = {d: ss & kept for d, ss in sh.items()}
    out = {}
    ids = sorted(texts)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sh[a] & sh[b])
            union = len(sh[a]) + len(sh[b]) - inter
            if union:
                out[(a, b)] = inter / union
    return out


def test_ngram_jaccard_matches_bruteforce():
    texts = {
        1: "the quick brown fox jumps over the lazy dog today",
        2: "the quick brown fox jumps over the lazy cat today",
        3: "a completely different document about ray data pipelines",
        4: "a completely different document about ray data engines",
        5: "unrelated text with no overlap whatsoever here",
    }
    got = textops.ngram_jaccard_pairs(docs_ds(texts), n=3, max_df=50,
                                      threshold=0.3).to_pandas()
    want = {k: v for k, v in brute_jaccard(texts, 3, 50).items() if v >= 0.3}
    got_map = {(a, b): j for a, b, j in
               zip(got["a"], got["b"], got["jaccard"])}
    assert set(got_map) == set(want)
    for k in want:
        assert abs(got_map[k] - want[k]) < 1e-12
    assert (1, 2) in got_map and (3, 4) in got_map


def test_ngram_jaccard_df_cut_bounds_hub_shingle():
    """A shingle shared by EVERY doc is dropped by the df-cut, so it creates
    no pairs (the skew guard) — docs overlapping only on it score 0."""
    common = "zzz yyy xxx"
    texts = {i: f"{common} unique{i} filler{i} tail{i}" for i in range(1, 9)}
    got = textops.ngram_jaccard_pairs(docs_ds(texts), n=3, max_df=4,
                                      threshold=0.01).to_pandas()
    # every 3-gram containing the common prefix has df=8 > 4 → dropped;
    # remaining shingles are unique per doc → no candidate pairs at all
    assert len(got) == 0


def test_bfs_multi_matches_single_source():
    edges = ray.data.from_arrow(pa.table({
        "src": pa.array([0, 0, 1, 2, 3, 5], pa.int64()),
        "dst": pa.array([1, 2, 3, 3, 4, 6], pa.int64()),
    }))
    multi = analytics.bfs_multi(edges, [0, 5]).to_pandas()
    for s in (0, 5):
        single = analytics.bfs(edges, [s]).to_pandas()
        mine = (multi[multi["source"] == s][["vertex", "depth"]]
                .sort_values("vertex").reset_index(drop=True))
        want = single.sort_values("vertex").reset_index(drop=True)
        assert mine.equals(want)


def test_closeness_multi_source_matches_formula():
    # path graph 0->1->2->3 plus isolated-ish source 9 (no out-edges)
    edges = ray.data.from_arrow(pa.table({
        "src": pa.array([0, 1, 2, 9], pa.int64()),
        "dst": pa.array([1, 2, 3, 0], pa.int64()),
    }))
    out = analytics.closeness_centrality(
        edges, sources=[0, 3, 9], normalized=True
    ).to_pandas().set_index("vertex")["closeness"]
    n = 5  # vertices {0,1,2,3,9}
    # source 0: depths 1,2,3 → reachable=4, dsum=6
    assert np.isclose(out.loc[0], (4 - 1) ** 2 / ((n - 1) * 6))
    # source 3: nothing reachable → 0
    assert out.loc[3] == 0.0
    # source 9: depths 1..4 → reachable=5, dsum=1+2+3+4
    assert np.isclose(out.loc[9], (5 - 1) ** 2 / ((n - 1) * 10))


def test_closeness_all_sources_guard_fires():
    # sources=None enumerates the vertex set on the driver — guarded above
    # max_all_sources (VERDICT r2 #6). n_vertices passed explicitly so the
    # guard triggers without building a huge graph.
    edges = ray.data.from_arrow(pa.table({
        "src": pa.array([0, 1], pa.int64()),
        "dst": pa.array([1, 2], pa.int64()),
    }))
    with pytest.raises(ValueError, match="max_all_sources"):
        analytics.closeness_centrality(edges, sources=None,
                                       n_vertices=10_000_000)
    # under the cap, sources=None still works
    out = analytics.closeness_centrality(edges, sources=None).to_pandas()
    assert set(out.vertex) == {0, 1, 2}


# -- r5 vectorized tokenize/shingle kernels: differential vs Python ----------


def _rand_texts(rng, k=60):
    words = ["alpha", "beta", "gamma", "delta", "x", "yz", "the", "of"]
    out = []
    for _ in range(k):
        L = int(rng.integers(0, 30))
        t = " ".join(rng.choice(words, L))
        # exercise trim/run edges the splitter must survive
        if rng.random() < 0.3:
            t = "  " + t + "\t\n"
        if rng.random() < 0.2:
            t = t.replace(" ", "  ", 1)
        out.append(t)
    out += ["", "   ", "\t\n", "single"]
    return out


def test_tokens_flat_matches_python_split():
    import numpy as np
    import pyarrow as pa

    from cassovary_ray.textops import _tokens_flat

    rng = np.random.default_rng(5)
    texts = _rand_texts(rng)
    flat, counts = _tokens_flat(pa.array(texts, pa.string()))
    toks = flat.to_pylist()
    pos = 0
    for t, c in zip(texts, counts):
        want = t.split()
        assert toks[pos:pos + c] == want, (t, toks[pos:pos + c], want)
        pos += c
    assert pos == len(toks)


def test_tokens_flat_nonascii_falls_back():
    import pyarrow as pa

    from cassovary_ray.textops import _tokens_flat

    assert _tokens_flat(pa.array(["ok", "café"], pa.string())) is None
    assert _tokens_flat(pa.array(["a\x0bb"], pa.string())) is None


def test_simhash_vectorized_matches_py():
    import numpy as np

    from cassovary_ray.textops import _simhash_batch_py, simhash_batch

    rng = np.random.default_rng(11)
    texts = _rand_texts(rng)
    got = simhash_batch(texts)
    want = _simhash_batch_py(texts)
    assert (got == want).all()


def test_token_hash_slices_match_per_doc():
    import numpy as np
    import pyarrow as pa

    from cassovary_ray.textops import _token_hash_slices, _token_hashes

    rng = np.random.default_rng(17)
    texts = _rand_texts(rng)
    slices = _token_hash_slices(pa.array(texts, pa.string()))
    assert slices is not None
    for t, h in zip(texts, slices):
        assert (h == _token_hashes(t)).all()
