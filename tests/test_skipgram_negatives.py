"""textops.skipgram_negatives — counter-RNG negative sampling. Pins the
probe rule against an in-test brute-force reimplementation, the
retry path (probe 0 landing on center/context/non-vertex), the
all-probes-miss truncation, and parallelism invariance."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from cassovary_ray.hashing import splitmix64
from cassovary_ray.textops import skipgram_negatives


def brute(pairs, verts, k, retries, seed):
    nmax = max(verts) + 1
    out = []
    for c, x in pairs:
        for j in range(k):
            for r in range(retries):
                L = splitmix64(np.uint64(2 * (retries * j + r) + 1)
                               ^ np.uint64(seed))
                m1 = np.uint64(splitmix64(np.uint64(c) ^ np.uint64(L)))
                cand = int(np.uint64(splitmix64(m1 ^ np.uint64(x)))
                           % np.uint64(nmax))
                if cand in verts and cand != c and cand != x:
                    out.append((c, x, j, cand))
                    break
    return sorted(out)


def run(pairs, verts, parallelism=4, **kw):
    pd_ds = ray.data.from_arrow(pa.table({
        "center": pa.array([p[0] for p in pairs], pa.int64()),
        "context": pa.array([p[1] for p in pairs], pa.int64()),
    })).repartition(parallelism)
    v_ds = ray.data.from_arrow(pa.table(
        {"u": pa.array(sorted(verts), pa.int64())}))
    out = skipgram_negatives(pd_ds, v_ds, **kw).to_pandas()
    if out.empty:
        return []
    return sorted(zip(out.center, out.context, out.j, out.negative))


@pytest.mark.parametrize("parallelism", [1, 4])
def test_matches_bruteforce(parallelism):
    verts = set(range(11))
    pairs = [(a, b) for a in range(11) for b in range(11) if a != b][:40]
    got = run(pairs, verts, parallelism=parallelism, k=2, retries=4, seed=23)
    assert got == brute(pairs, verts, 2, 4, 23)
    assert len(got) > 0


def test_sparse_universe_forces_retries():
    """~1/3 of the 100-wide id space is a real vertex: probe 0 misses
    often, so the fold must pick the FIRST hitting probe per (pair, j)."""
    verts = set(range(0, 100, 3))
    pairs = [(0, 3), (3, 99), (42, 6), (99, 0), (6, 42)]
    got = run(pairs, verts, k=3, retries=8, seed=5)
    want = brute(pairs, verts, 3, 8, 5)
    assert got == want and len(got) > 0
    # the retry path was actually exercised: probe 0 alone yields fewer
    probe0 = brute(pairs, verts, 3, 1, 5)
    assert len(probe0) < len(want)


def test_all_probes_miss_emits_nothing():
    """A 2-vertex universe where every candidate is excluded (must differ
    from both endpoints) — the documented truncation: no row emitted."""
    got = run([(42, 99)], {42, 99}, k=2, retries=4, seed=5)
    assert got == brute([(42, 99)], {42, 99}, 2, 4, 5) == []


def test_rejects_oversized_ids():
    v_ds = ray.data.from_arrow(pa.table({"u": pa.array([1 << 60], pa.int64())}))
    p_ds = ray.data.from_arrow(pa.table({"center": pa.array([0], pa.int64()),
                                         "context": pa.array([1], pa.int64())}))
    with pytest.raises(ValueError, match="56 bits"):
        skipgram_negatives(p_ds, v_ds)


def test_rejects_overflowing_retries():
    """retries >= 128 would overflow the packed r*2**56 + cand int64
    min-key (ADVICE r4) — refused up front."""
    v_ds = ray.data.from_arrow(pa.table({"u": pa.array([0, 1, 2], pa.int64())}))
    p_ds = ray.data.from_arrow(pa.table({"center": pa.array([0], pa.int64()),
                                         "context": pa.array([1], pa.int64())}))
    with pytest.raises(ValueError, match="retries"):
        skipgram_negatives(p_ds, v_ds, retries=128)
