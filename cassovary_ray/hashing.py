"""Stable hashing + counter-based RNG kernels.

The reference maps external ids to dense internal ints through
``NodeNumberer`` implementations (``util/NodeNumberer.scala:25-35``,
``util/SequentialNodeNumberer.scala:22-68``) — a sequential, lock-guarded
densifier that cannot scale past one process. We instead hash urls to stable
63-bit ids (collision probability ~n^2/2^64: negligible even at 10^12 docs,
documented trade-off per SURVEY §7.3) so any worker can number any record
with no coordination.

Random choices (walk steps, samplers) use a counter-based generator —
``splitmix64`` mixed over (seed, entity, step) — so results are deterministic
and independent of parallelism / execution order, replacing the reference's
seeded sequential ``scala.util.Random`` (``GraphUtils.scala:239-240``).
"""

from __future__ import annotations

import hashlib

import numpy as np

_MASK63 = (1 << 63) - 1
_MASK64 = (1 << 64) - 1


def hash64(s: str | bytes) -> int:
    """Stable 63-bit positive hash of a string (blake2b, 8-byte digest)."""
    if isinstance(s, str):
        s = s.encode("utf-8")
    return int.from_bytes(hashlib.blake2b(s, digest_size=8).digest(), "little") & _MASK63


def hash64_batch(strings) -> np.ndarray:
    """Vectorized-ish hash of an iterable of strings → int64 ndarray.

    blake2b is C-speed; the per-row Python loop is unavoidable for variable
    length strings but runs ~1M rows/s/core, and this stage is only on the
    ingest path (url → vertex id), never inside the iteration loop.
    """
    out = np.empty(len(strings), dtype=np.int64)
    blake2b = hashlib.blake2b
    fb = int.from_bytes
    # batch-scoped memo: link targets are Zipf-hot (a few hub urls dominate
    # the dst column), so most rows are dict hits instead of blake2b calls
    memo: dict = {}
    for i, s in enumerate(strings):
        h = memo.get(s)
        if h is None:
            b = s.encode("utf-8") if isinstance(s, str) else s
            h = fb(blake2b(b, digest_size=8).digest(), "little") & _MASK63
            memo[s] = h
        out[i] = h
    return out


# process-global cache of blake2b results: Ray reuses worker processes
# across map_batches tasks, so Zipf-hot urls (a few hub targets dominate web
# link columns) hash once per WORKER instead of once per batch. Caches only
# a pure function — no determinism risk. Cleared wholesale at the cap
# (amortized O(1); a hot working set repopulates in one batch).
_ARROW_MEMO: dict = {}
_ARROW_MEMO_CAP = 1 << 21  # ~2M entries ≈ 300 MB worst case


def hash64_arrow(col) -> np.ndarray:
    """:func:`hash64` over an Arrow string/binary array → int64 ndarray.

    Dictionary-encodes first (C-speed) so blake2b runs once per UNIQUE
    value per batch — and the process-global memo dedups across batches
    too. The string→binary cast before ``to_pylist`` yields ``bytes``
    directly (zero-copy view), skipping a per-row utf-8 encode. Hash values
    are identical to :func:`hash64_batch` (same blake2b digest)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    d = pc.dictionary_encode(col)
    dict_arr = d.dictionary
    if pa.types.is_string(dict_arr.type) or pa.types.is_large_string(dict_arr.type):
        dict_arr = dict_arr.cast(pa.binary())
    uniq = dict_arr.to_pylist()
    blake2b = hashlib.blake2b
    fb = int.from_bytes
    memo = _ARROW_MEMO
    if len(memo) > _ARROW_MEMO_CAP:
        memo.clear()
    uh = np.empty(len(uniq), dtype=np.int64)
    for i, s in enumerate(uniq):
        h = memo.get(s)
        if h is None:
            h = fb(blake2b(s, digest_size=8).digest(), "little") & _MASK63
            memo[s] = h
        uh[i] = h
    if not len(uh):
        return uh
    return uh[d.indices.to_numpy(zero_copy_only=False)]


def splitmix64(x: np.ndarray | int) -> np.ndarray | int:
    """SplitMix64 finalizer — vectorized over uint64 ndarrays.

    Public-domain mixing function (Steele et al., "Fast Splittable
    Pseudorandom Number Generators", OOPSLA'14). Used as a counter-based RNG:
    ``splitmix64(key)`` for key = combine(seed, entity, step).
    """
    scalar = np.isscalar(x)
    z = np.asarray(x, dtype=np.uint64)
    with np.errstate(over="ignore"):
        z = (z + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(_MASK64)
        z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(_MASK64)
        z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(_MASK64)
        z = z ^ (z >> np.uint64(31))
    return int(z) if scalar else z


def counter_rng_uniform(seed: int, entity: np.ndarray, step: int | np.ndarray) -> np.ndarray:
    """Deterministic U[0,1) per (seed, entity, step) — parallel-safe.

    Same value regardless of batch boundaries or worker assignment, which is
    what makes randomized pipelines (walks, samplers) reproducible at any
    parallelism level (north rule: identical output at num_cpus=1 vs 8).
    """
    e = np.asarray(entity, dtype=np.uint64)
    s = np.asarray(step, dtype=np.uint64)
    with np.errstate(over="ignore"):
        key = splitmix64(e ^ splitmix64(s ^ np.uint64(seed)))
    return (key >> np.uint64(11)).astype(np.float64) / float(1 << 53)
