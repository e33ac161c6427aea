"""Sharded CSR graph engine — stateful actor pool + BSP rounds.

The reference holds the whole graph in one JVM heap as 256 hash-sharded CSR
arrays (``graph/SharedArrayBasedDirectedGraph.scala:22-28,75-209``) and runs
iterative algorithms single-threaded over it
(``algorithms/linkanalysis/LinkAnalysis.scala:87-109``, ``PageRank.scala:45``).
Here each hash-partition of the edge layout (:mod:`cassovary_ray.layout`)
materializes its CSR **inside one Ray actor**, and each iteration is a
bulk-synchronous round:

    scatter:  every shard turns its local edges into per-destination-partition
              partial aggregates (sum for PageRank/HITS, min for WCC,
              (label,count) pairs for LP) with pure numpy ``reduceat`` kernels
              — this per-sender pre-combine IS the combiner: a hub vertex with
              10^9 in-edges receives at most P partials, one per shard, so
              power-law in-degree skew is structurally flattened (no single
              reducer ever sees a hub's raw in-edge list; cf. SURVEY §4 skew
              row — this replaces per-key salting for the iteration loop).
    apply:    the owner of each destination partition merges the ≤P partials
              into its vertex state and reports (error contribution, lineage).

The driver holds only scalars (iteration, error) and the lineage log.
Contribution payloads travel shard→shard through the object store as packed
task-return objects (one per sender per round; trade-off measurements in
``_Scatter.per_part``) — the driver moves only ObjectRefs and fetches only
the per-round stats. Between rounds the only global synchronization is the
convergence test, same as ``LinkAnalysis.run``'s termination predicate
(``LinkAnalysis.scala:98-100``); for PageRank even the dangling-mass scalar
rides inside the payloads (``pr_round``), so a round is a single fused
apply-then-scatter superstep per shard.

Determinism: partition count P fixes the reduction grouping, so floating
point sums are bit-reproducible for a given P and within 1e-6 of the
reference's sequential sums (north rule tolerance). Integer algorithms (WCC,
LP) use only min/count/argmax reductions and are exactly reproducible at any
parallelism.

Fault tolerance / resume: shard state is a pure function of (layout dir,
part id) plus the last checkpoint; ``checkpoint()`` writes per-partition
parquet + a manifest committed by atomic rename, and ``load()`` restarts
from the newest complete manifest (SURVEY §4 checkpoint row).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray

from cassovary_ray.layout import read_layout_manifest, read_partition

LP_UNLABELED = -1  # sentinel: vertex has not yet acquired a label (seeded LP)

# ---------------------------------------------------------------------------
# numpy CSR-scatter kernel shared by all algorithms
# ---------------------------------------------------------------------------


def _energy_cut(pending: np.ndarray, phi: float) -> float:
    """Per-round delta-filter threshold: the largest power-of-two t such
    that the entries with |pending| < t carry at most ``phi`` of the total
    pending L1 mass. O(n): frexp exponents → per-exponent mass bincount →
    cumulative cut. A fixed absolute threshold either filters nothing or
    everything (per-entry deltas decay together); cutting by ENERGY tracks
    the heavy-tailed per-destination distribution every round, so the
    shipped set shrinks smoothly while ≥ (1-phi) of each round's update
    mass still flows. Withheld residue accumulates sender-side and is
    cleared by flush rounds (driver-certified stop)."""
    a = np.abs(pending)
    total = float(a.sum())
    if total <= 0.0:
        return float("inf")  # nothing pending at all — ship nothing
    _m, e = np.frexp(a)
    e = e.astype(np.int64)
    e0 = int(e.min())
    mass = np.bincount(e - e0, weights=a)
    csum = np.cumsum(mass)
    k = int(np.searchsorted(csum, phi * total, side="right"))
    if k <= 0:
        return 0.0
    return float(np.ldexp(0.5, e0 + k))  # = 2^(e0+k-1)


class _Scatter:
    """Per-shard edge structure pre-sorted for destination-partition scatter.

    Built once in the actor (``__init__``-time work, per the reference's
    build-then-iterate split, ``SharedArrayBasedDirectedGraph.scala:75-209``):

    - ``src_pos``: per edge, index of its src in the shard's owned-vertex
      array (int32 — P is chosen so a shard holds < 2^31 vertices).
    - edges sorted by (dst % P, dst); ``seg_starts`` marks each distinct dst
      (``np.add.reduceat`` segment boundaries), ``uniq_dst`` the distinct
      dsts, ``part_ptr[q]:part_ptr[q+1]`` the slice of segments whose dst
      lives in partition q.
    - ``out_deg``: out-degree per owned vertex (the ``outboundCount`` of
      ``PageRank.scala:55-68``).
    """

    __slots__ = ("num_parts", "src_pos", "seg_starts", "uniq_dst", "part_ptr",
                 "out_deg", "n_edges", "_vals", "_sums", "w_sorted", "w_out",
                 "exchange_dtype")

    def __init__(self, src: np.ndarray, dst: np.ndarray, verts: np.ndarray,
                 num_parts: int, weights: np.ndarray | None = None):
        self.num_parts = num_parts
        self.n_edges = len(src)
        src_pos_all = np.searchsorted(verts, src).astype(np.int32)
        self.out_deg = np.bincount(src_pos_all, minlength=len(verts)).astype(np.int64)
        dpart = dst % num_parts
        order = np.lexsort((dst, dpart))
        dst_sorted = dst[order]
        self.src_pos = src_pos_all[order]
        # optional per-edge weights (weighted layouts): kept in scatter order,
        # plus the weighted out-degree Σw per owned vertex. Sum-type scatters
        # (coef_scatter_sums) become weighted; segment_mins stays unweighted.
        self.w_sorted = self.w_out = None
        if weights is not None:
            w = np.asarray(weights, dtype=np.float64)
            if len(w) and w.min() <= 0:
                raise ValueError("edge weights must be strictly positive")
            self.w_sorted = w[order]
            self.w_out = np.bincount(src_pos_all, weights=w, minlength=len(verts))
        if len(dst_sorted):
            new_seg = np.r_[True, dst_sorted[1:] != dst_sorted[:-1]]
        else:
            new_seg = np.zeros(0, dtype=bool)
        self.seg_starts = np.flatnonzero(new_seg)
        self.uniq_dst = dst_sorted[self.seg_starts]
        uniq_part = self.uniq_dst % num_parts
        self.part_ptr = np.searchsorted(uniq_part, np.arange(num_parts + 1))
        # reusable round buffers — scatter allocated ~3 arrays the size of
        # the edge list per round otherwise (hundreds of MB of malloc/page
        # churn per shard per round at bench scale)
        self._vals = np.empty(self.n_edges)
        self._sums = np.empty(len(self.uniq_dst))
        self.exchange_dtype = None

    @classmethod
    def from_arrays(cls, *, num_parts: int, src_pos, seg_starts, uniq_dst,
                    part_ptr, out_deg, w_sorted=None, w_out=None) -> "_Scatter":
        """Rebuild from cached lexsorted arrays (the binary shard cache,
        engine._load_scatter_cache) — skips the searchsorted/lexsort work
        of __init__; only the reusable round buffers are allocated."""
        self = cls.__new__(cls)
        self.num_parts = num_parts
        self.src_pos = src_pos
        self.seg_starts = seg_starts
        self.uniq_dst = uniq_dst
        self.part_ptr = part_ptr
        self.out_deg = out_deg
        self.n_edges = len(src_pos)
        self.w_sorted = w_sorted
        self.w_out = w_out
        self._vals = np.empty(self.n_edges)
        self._sums = np.empty(len(self.uniq_dst))
        self.exchange_dtype = None
        return self

    def segment_sums(self, per_edge_vals: np.ndarray) -> np.ndarray:
        if len(self.seg_starts) == 0:
            return np.zeros(0, dtype=per_edge_vals.dtype)
        return np.add.reduceat(per_edge_vals, self.seg_starts)

    def coef_scatter_sums(self, coef: np.ndarray) -> np.ndarray:
        """sums per uniq dst of coef[src] (× edge weight when the layout is
        weighted) — buffer-reusing hot path."""
        if len(self.seg_starts) == 0:
            return self._sums
        np.take(coef, self.src_pos, out=self._vals)
        if self.w_sorted is not None:
            np.multiply(self._vals, self.w_sorted, out=self._vals)
        np.add.reduceat(self._vals, self.seg_starts, out=self._sums)
        return self._sums

    def segment_mins(self, per_edge_vals: np.ndarray) -> np.ndarray:
        if len(self.seg_starts) == 0:
            return np.zeros(0, dtype=per_edge_vals.dtype)
        return np.minimum.reduceat(per_edge_vals, self.seg_starts)

    def segment_maxs(self, per_edge_vals: np.ndarray) -> np.ndarray:
        if len(self.seg_starts) == 0:
            return np.zeros(0, dtype=per_edge_vals.dtype)
        return np.maximum.reduceat(per_edge_vals, self.seg_starts)

    def slice_for_part(self, sums: np.ndarray, q: int, with_ids: bool):
        lo, hi = self.part_ptr[q], self.part_ptr[q + 1]
        vals = sums[lo:hi]
        # optional float32 ship precision (exchange_precision="f32"): cast
        # only FLOAT payloads — integer payloads (WCC component mins, label
        # ids) are identifiers and ship exact at any precision setting
        if self.exchange_dtype is not None and vals.dtype == np.float64:
            vals = vals.astype(self.exchange_dtype)
        if with_ids:
            return (self.uniq_dst[lo:hi], vals)
        return vals

    def edge_range_for_part(self, q: int) -> tuple[int, int]:
        """[lo, hi) edge-index range whose dst lives in partition q (edges
        are (dst%P, dst)-sorted, so the range is contiguous)."""
        lo_seg, hi_seg = self.part_ptr[q], self.part_ptr[q + 1]
        n_seg = len(self.seg_starts)
        lo = self.seg_starts[lo_seg] if lo_seg < n_seg else self.n_edges
        hi = self.seg_starts[hi_seg] if hi_seg < n_seg else self.n_edges
        return int(lo), int(hi)

    def per_edge_dst(self) -> np.ndarray:
        """dst id per edge (segment expansion; built on demand)."""
        seg_len = np.diff(np.r_[self.seg_starts, self.n_edges])
        return np.repeat(self.uniq_dst, seg_len)

    def per_part(self, sums: np.ndarray, with_ids: bool) -> list:
        """All P per-destination payload slices, returned as ONE task-return
        object ("packed" exchange). Receivers pick ``payloads[self.part]``.

        Exchange design, measured at P=32 / 20M edges on one node:
        - ``num_returns=P`` driver-owned returns: P² small objects/round, all
          pulls mediated by the driver → 7.0 s/round.
        - per-destination ``ray.put`` in the sender: direct shard→shard pulls
          but P² borrowed refs/round → ref-accounting drift, 0.5-0.9 s/round.
        - packed single return (this): P plasma objects/round, zero-copy
          local reads → ~0.1 s/round. On a multi-node cluster the natural
          refinement is packing per NODE (receivers co-located on a node
          share one object) so network overship stays O(1) per payload.
        """
        return [self.slice_for_part(sums, q, with_ids) for q in range(self.num_parts)]

    def per_part_delta(self, pending: np.ndarray, thresh: float, flush: bool,
                       last_sent: np.ndarray) -> list:
        """Delta-filtered packed exchange (incremental PageRank; the r5
        full-span scaling lever): ``pending`` is the per-uniq-dst gap
        between this round's true contribution sums and what receivers
        have accumulated so far; ``thresh`` is the per-round energy cut
        (see ``_energy_cut``). Per part, ship either the dense pending
        slice or a sparse ``("s", idx, vals)`` triple holding only entries
        with ``|pending| >= thresh`` — sparse wins once fewer than half
        the entries cross the threshold (idx:int32 + val vs val). The
        per-destination delta distribution is heavy-tailed, so the energy
        cut drops most entries while almost all update mass still flows,
        and shipped bytes decay with convergence instead of staying
        O(distinct dst) per round. ``last_sent`` advances by exactly the RECEIVER-VISIBLE
        values (after any f32 ship cast), so the sender's model of the
        receiver accumulator never drifts; withheld residue stays bounded
        by thresh per entry and is cleared by ``flush`` rounds (the driver
        certifies convergence only on a post-flush T1)."""
        out = []
        cast = self.exchange_dtype
        for q in range(self.num_parts):
            lo, hi = self.part_ptr[q], self.part_ptr[q + 1]
            d = pending[lo:hi]
            ls = last_sent[lo:hi]
            idx = None
            if not flush:
                m = np.abs(d) >= thresh
                nnz = int(np.count_nonzero(m))
                if nnz * 2 < (hi - lo):
                    idx = np.flatnonzero(m).astype(np.int32)
            if idx is None:
                vals = d.astype(cast) if cast is not None else d
                ls += vals
                out.append(vals)
            else:
                vals = d[idx]
                if cast is not None:
                    vals = vals.astype(cast)
                ls[idx] += vals
                out.append(("s", idx, vals))
        return out


def _partition_digest(ldir: str, primary_dir: str, part: int) -> str:
    """Content key for one shard's CSR cache: the (name, size) list of the
    partition's edge files in ``ldir`` plus the PRIMARY layout's vertex
    files (verts define src_pos/out_deg indexing) plus the manifest's
    weighted flag. Any partition rewrite (update_edge_layout names new
    files) or rebuild changes the digest and invalidates the cache."""
    import hashlib

    h = hashlib.blake2b(digest_size=16)
    for base, table in ((ldir, "edges"), (primary_dir, "vertices")):
        d = os.path.join(base, table, f"part={part}")
        entries = []
        if os.path.isdir(d):
            for name in sorted(os.listdir(d)):
                st = os.stat(os.path.join(d, name))
                # mtime_ns included: update_edge_layout rewrites a partition
                # under the same filename, and int64 columns make equal-size
                # different-content rewrites plausible
                entries.append(f"{table}/{name}:{st.st_size}:{st.st_mtime_ns}")
        h.update("|".join(entries).encode())
        h.update(b";")
    h.update(str(read_layout_manifest(ldir).get("weighted", False)).encode())
    return h.hexdigest()


def _csr_cache_path(ldir: str, part: int) -> str:
    return os.path.join(ldir, "csr_cache", f"part{part}.npz")


_CSR_CACHE_ARRAYS = ("src_pos", "seg_starts", "uniq_dst", "part_ptr", "out_deg")


def _save_scatter_cache(path: str, digest: str, sc: "_Scatter") -> None:
    """Persist the lexsorted scatter arrays (atomic tmp+rename; best-effort:
    a read-only layout dir just skips caching)."""
    if os.environ.get("CASSOVARY_CSR_CACHE", "1") == "0":
        return
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        arrays = {name: getattr(sc, name) for name in _CSR_CACHE_ARRAYS}
        if sc.w_sorted is not None:
            arrays["w_sorted"] = sc.w_sorted
            arrays["w_out"] = sc.w_out
        arrays["digest"] = np.frombuffer(digest.encode(), dtype=np.uint8)
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp, path)
    except OSError:
        pass


def _load_scatter_cache(path: str, digest: str, num_parts: int):
    """Rebuild a _Scatter from the cache iff the digest matches; None on
    any miss/mismatch/corruption (falls back to the parquet build)."""
    if os.environ.get("CASSOVARY_CSR_CACHE", "1") == "0":
        return None
    try:
        with np.load(path) as z:
            if z["digest"].tobytes().decode() != digest:
                return None
            # .copy(): npz members are filled through zipfile's small
            # chunked reads, leaving the buffers on fragmented 4 KB pages;
            # the gather-heavy round kernels (np.take over src_pos) then run
            # ~6x slower TLB-bound (measured 0.1 -> 0.7 s/round/shard at
            # 3.1M edges). A fresh copy reallocates each array as one block
            # (transparent-hugepage-eligible), restoring build-path speed
            # for one memcpy per array.
            arrays = {name: z[name].copy() for name in _CSR_CACHE_ARRAYS}
            w_sorted = z["w_sorted"].copy() if "w_sorted" in z.files else None
            w_out = z["w_out"].copy() if "w_out" in z.files else None
        sc = _Scatter.from_arrays(num_parts=num_parts, w_sorted=w_sorted,
                                  w_out=w_out, **arrays)
        # one throwaway gather+reduceat: pre-faults every page the round
        # kernels touch (the fresh-build path warms the heap as a side
        # effect of the lexsort; without this the first ~6 cached rounds ran
        # 2-4x slow while the actor's arenas faulted in lazily)
        sc.coef_scatter_sums(np.zeros(len(sc.out_deg)))
        return sc
    except (OSError, KeyError, ValueError):
        return None


def _pickle_by_value(obj) -> bytes:
    """cloudpickle an object forcing BY-VALUE class serialization when its
    defining module isn't part of this package: user VertexPrograms live in
    driver scripts/notebooks whose modules the worker processes can't
    import, and default by-reference pickling would ModuleNotFoundError in
    the actor."""
    import sys

    from ray import cloudpickle

    mod_name = type(obj).__module__
    mod = sys.modules.get(mod_name)
    if (mod is None or mod_name.startswith("cassovary_ray")
            or mod_name == "builtins"):
        return cloudpickle.dumps(obj)
    cloudpickle.register_pickle_by_value(mod)
    try:
        return cloudpickle.dumps(obj)
    finally:
        cloudpickle.unregister_pickle_by_value(mod)


def _payload_nbytes(payload) -> int:
    """Plasma bytes this sender ships per round (the exchange-volume metric
    recorded in RoundMetrics; see BASELINE.md's dense/sparse regime note)."""
    per_part, _dangle = payload
    total = 0
    for sl in per_part:
        if isinstance(sl, tuple) and len(sl) == 3:  # sparse ("s", idx, vals)
            total += sl[1].nbytes + sl[2].nbytes
        elif isinstance(sl, tuple):
            total += sl[0].nbytes + sl[1].nbytes
        else:
            total += sl.nbytes
    return total


# Fixed quantization grid for ANF-HLL neighborhood-function sums: each
# per-vertex ball estimate is floored to a multiple of 2^-20 and the SUM is
# carried as an exact integer count of grid units (Python int on the driver
# — arbitrary precision), so N(t) is independent of partition count and
# shard/row summation order, and ``oracles.anf_hll_sql`` reproduces it
# bit-for-bit with ``sum(floor(ball * 2^20))``. Per-shard int64 partials
# overflow only past 2^43 quantized pairs per shard (~8.8e12 ball-size
# units) — raise the shard count or lower the grid before that.
ANF_HLL_QUANT = float(1 << 20)


def hll_estimates(regs: np.ndarray, rho_max: int) -> np.ndarray:
    """Per-row HyperLogLog cardinality estimates (Flajolet et al. '07) from
    an (n, m) uint8 register matrix.

    The indicator sum is a FIXED ascending-k fold over register-VALUE
    counts — ``inv = ((c_0·2⁰) + c_1·2⁻¹) + …`` — rather than a sum over
    register positions, so the float operation sequence is reproducible by
    an unrolled left-associated SQL expression (``oracles.hyperball_sql``):
    identical doubles on both sides, not merely close. The small-range
    linear-counting branch uses ``log`` (possible ≤1-ulp libm divergence,
    far below the gate's 9-dp rounding)."""
    m = regs.shape[1]
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    inv = np.zeros(len(regs), dtype=np.float64)
    for k in range(rho_max + 1):
        inv = inv + (regs == k).sum(axis=1) * (2.0 ** -k)
    est = alpha * m * m / inv
    zeros = (regs == 0).sum(axis=1)
    small = (est <= 2.5 * m) & (zeros > 0)
    if small.any():
        est[small] = m * np.log(m / zeros[small])
    return est


# ---------------------------------------------------------------------------
# The shard actor
# ---------------------------------------------------------------------------


@ray.remote
class GraphShard:
    """One hash-partition of the graph: owned vertices + their out-edges
    (and, when the algorithm gathers, the reversed layout's edges).

    The actor is the Ray analogue of one of the reference's 256 EdgeShards
    plus the slice of per-node ``Array[Double]`` state those ids index
    (``PageRank.scala:38``, ``Hits.scala:35-39``).
    """

    def __init__(self, part: int, num_parts: int, layout_dir: str,
                 reverse_layout_dir: str | None = None, csr_cache: bool = True,
                 exchange_groups: int = 1, exchange_precision: str = "f64"):
        self.part = part
        self.num_parts = num_parts
        self.layout_dir = layout_dir
        self._init_args = (part, num_parts, layout_dir, reverse_layout_dir,
                           csr_cache, exchange_groups, exchange_precision)
        # per-NODE payload packing (the refinement designed in
        # _Scatter.per_part's docstring): parts are split into G contiguous
        # receiver groups; pr_round returns one packed object PER GROUP so a
        # receiver materializes only its group's 1/G share of each sender's
        # payload instead of the whole thing. G=1 == the classic single
        # packed object. Partitioning assumption for the multi-node win:
        # group g's shard actors are co-located on one node (placement
        # groups on a real cluster); the grouping is CORRECT regardless.
        self.exchange_groups = max(1, min(exchange_groups, num_parts))
        b = [g * num_parts // self.exchange_groups
             for g in range(self.exchange_groups + 1)]
        self._group_bounds = b
        self.group = next(g for g in range(self.exchange_groups)
                          if b[g] <= part < b[g + 1])
        self.group_start = b[self.group]
        vt = read_partition(layout_dir, "vertices", part, ["vertex"])
        # vertex files carry per-batch (not global) uniques — dedup here
        self.verts = np.unique(vt["vertex"].to_numpy(zero_copy_only=False))

        def load_scatter(ldir: str) -> _Scatter:
            # binary shard cache (MemoryMappedDirectedGraph.scala:35-46
            # analogue): the lexsorted scatter arrays are persisted keyed by
            # a digest of the partition's parquet files, so an actor restart
            # / resumed run skips the parquet decode + lexsort rebuild.
            # csr_cache=False (or CASSOVARY_CSR_CACHE=0 in the actor env)
            # bypasses both read and write — benchmarking cold loads.
            digest = _partition_digest(ldir, layout_dir, part) if csr_cache else ""
            cpath = _csr_cache_path(ldir, part)
            if csr_cache:
                sc = _load_scatter_cache(cpath, digest, num_parts)
                if sc is not None:
                    return sc
            weighted = bool(read_layout_manifest(ldir).get("weighted", False))
            cols = ["src", "dst"] + (["weight"] if weighted else [])
            et = read_partition(ldir, "edges", part, cols)
            sc = _Scatter(
                et["src"].to_numpy(zero_copy_only=False),
                et["dst"].to_numpy(zero_copy_only=False),
                self.verts,
                num_parts,
                weights=et["weight"].to_numpy(zero_copy_only=False)
                if weighted else None,
            )
            if csr_cache:
                _save_scatter_cache(cpath, digest, sc)
            return sc

        self.fwd = load_scatter(layout_dir)
        self.rev = load_scatter(reverse_layout_dir) if reverse_layout_dir else None
        # ship precision for FLOAT exchange payloads (see
        # _Scatter.slice_for_part): "f32" halves per-round exchange bytes —
        # on a multi-node cluster the network is the weak-scaling binding
        # term, and rank-contribution partials carry ~2^-24 relative error
        # each, orders of magnitude inside the 1e-6 convergence tolerance.
        # Default "f64" keeps the golden-vector tests exact to 1e-10.
        if exchange_precision not in ("f64", "f32"):
            raise ValueError(
                f"exchange_precision must be 'f64' or 'f32', got "
                f"{exchange_precision!r}")
        dt = np.float32 if exchange_precision == "f32" else None
        self.fwd.exchange_dtype = dt
        if self.rev is not None:
            self.rev.exchange_dtype = dt
        # vertex state vectors, keyed by name ("rank", "comp", "label", ...)
        self.state: dict[str, np.ndarray] = {}
        self._walkers = None
        # cached searchsorted positions of each sender's uniq dst ids, per
        # (layout, sender) — ids are round-invariant, so computed once.
        self._pos_cache: dict[tuple[str, int], np.ndarray] = {}

    # -- generic info ------------------------------------------------------

    def counts(self) -> tuple[int, int, int]:
        n_dangling = int((self.fwd.out_deg == 0).sum())
        return len(self.verts), self.fwd.n_edges, n_dangling

    def reload(self, rebuild_walk_csr: bool = False) -> tuple[int, int, int]:
        """Re-read this partition from the (delta-updated) layout in place —
        the served-dynamic-graph refresh (the batch analogue of
        ``ConcurrentHashMapDynamicGraph.scala``'s concurrent updates: disk
        layout updated by ``layout.update_edge_layout``, then only touched
        shards re-read). Drops per-run state (vertex state vectors, walkers,
        position caches); the CSR shard cache re-keys on the new parquet
        digest automatically. Returns fresh ``counts()``."""
        # lazily-built structures are guarded by attribute presence, which
        # __init__ does NOT reassign — drop them or walk_build() would
        # early-return with the stale pre-delta CSR
        for attr in ("walk_csr", "_walk_indptr", "_walk_nbrs",
                     "_walk_visits", "_n2v_nbrs"):
            self.__dict__.pop(attr, None)
        self.__init__(*self._init_args)
        if rebuild_walk_csr:
            self.walk_build()
        return self.counts()

    def point_query(self, ids, with_neighbors: bool = True,
                    max_neighbors: int | None = None) -> list:
        """Per-request node lookups — the ``Graph.getNodeById`` surface
        (``graph/Graph.scala:25``, ``Node.scala:31-43``) answered from the
        resident CSR in O(log V + deg) per id. Every id must be OWNED by
        this partition (``vertex % P == part``; the session routes).
        Returns one record per id: ``{id, out_degree[, in_degree][,
        out_neighbors]}`` or None when the vertex doesn't exist."""
        self.walk_build()
        ids = np.asarray(ids, dtype=np.int64)
        pos = np.searchsorted(self.verts, ids)
        ok = pos < len(self.verts)
        ok[ok] &= self.verts[pos[ok]] == ids[ok]
        out: list = []
        for i in range(len(ids)):
            if not ok[i]:
                out.append(None)
                continue
            p = pos[i]
            rec = {"id": int(ids[i]),
                   "out_degree": int(self.fwd.out_deg[p])}
            if self.rev is not None:
                rec["in_degree"] = int(self.rev.out_deg[p])
            if with_neighbors:
                lo, hi = int(self._walk_indptr[p]), int(self._walk_indptr[p + 1])
                if max_neighbors is not None:
                    hi = min(hi, lo + max_neighbors)
                rec["out_neighbors"] = self._walk_nbrs[lo:hi].tolist()
            out.append(rec)
        return out

    def get_state_table(self, name: str, column: str) -> pa.Table:
        return pa.table({"vertex": pa.array(self.verts, pa.int64()),
                         column: pa.array(self.state[name])})

    def _positions(self, kind: str, sender: int, ids: np.ndarray | None) -> np.ndarray:
        key = (kind, sender)
        if ids is not None:
            pos = np.searchsorted(self.verts, ids).astype(np.int64)
            self._pos_cache[key] = pos
        return self._pos_cache[key]

    # -- generic vertex programs (rounds.VertexProgram protocol) ------------

    def vp_init(self, program_blob: bytes, n_total: int) -> None:
        """Install a user VertexProgram (shipped by VALUE as a cloudpickle
        blob — the defining module need not be importable on workers) and
        run its ``init`` hook against this shard's ctx (rounds.py module
        docstring; the ``defaultInitialState`` slot of
        ``LinkAnalysis.scala:64-68``)."""
        from ray import cloudpickle

        from cassovary_ray.rounds import ShardCtx

        self._vp = program = cloudpickle.loads(program_blob)
        self._vp_ctx = ShardCtx(self.part, self.num_parts, n_total,
                                self.verts, self.fwd.out_deg, self.fwd.w_out,
                                self.state)
        program.init(self._vp_ctx)

    def vp_round(self, bootstrap: bool, *sender_payloads):
        """One fused program superstep — the ``katz_round`` shape
        generalized: apply (combine ≤P incoming partials, hand to the
        program) then scatter (program coefficient pushed along out-edges,
        pre-combined per destination)."""
        from cassovary_ray.rounds import _COMBINE_IDENTITY

        prog, ctx = self._vp, self._vp_ctx
        combine = prog.combine
        err = float("nan")
        t_in = time.perf_counter()
        t_apply = 0.0
        if not bootstrap:
            incoming = [pl[0][self.part] for pl in sender_payloads]
            acc = np.full(len(self.verts), _COMBINE_IDENTITY[combine])
            for sender, payload in enumerate(incoming):
                if isinstance(payload, tuple):
                    ids, sums = payload
                    pos = self._positions("fwd", sender, ids)
                else:
                    sums = payload
                    pos = self._positions("fwd", sender, None)
                if len(sums):
                    # uniq-dst ids are distinct per sender, so fancy-index
                    # assignment is race-free within a sender
                    if combine == "sum":
                        acc[pos] += sums
                    elif combine == "min":
                        acc[pos] = np.minimum(acc[pos], sums)
                    else:
                        acc[pos] = np.maximum(acc[pos], sums)
            err = float(prog.apply(ctx, acc))
            t_apply = time.perf_counter() - t_in
        coef = np.asarray(prog.scatter(ctx), dtype=np.float64)
        if combine == "sum":
            sums = self.fwd.coef_scatter_sums(coef)
        elif combine == "min":
            sums = self.fwd.segment_mins(coef[self.fwd.src_pos]) \
                if self.fwd.n_edges else np.zeros(0)
        else:
            sums = self.fwd.segment_maxs(coef[self.fwd.src_pos]) \
                if self.fwd.n_edges else np.zeros(0)
        payload = (self.fwd.per_part(sums, bootstrap), 0.0)
        return payload, (err, t_apply, time.perf_counter() - t_in - t_apply,
                         t_in, _payload_nbytes(payload))

    def vp_post(self) -> None:
        """Run the program's ``postRun`` hook (``LinkAnalysis.scala:111-117``)."""
        self._vp.post(self._vp_ctx)

    # -- PageRank ----------------------------------------------------------

    def pr_init(self, n_total: int) -> float:
        """rank = 1/n for every existing vertex (``PageRank.scala:80-83``);
        returns this shard's dangling rank mass."""
        self.state["rank"] = np.full(len(self.verts), 1.0 / n_total)
        return float(self.state["rank"][self.fwd.out_deg == 0].sum())

    def _pr_scatter_payload(self, damping: float, with_ids: bool,
                            delta: float = 0.0, flush: bool = False,
                            floor: float = 0.0):
        """Packed scatter: per-part partial sums of d·r(u)/outdeg(u) (the
        scatter loop of ``PageRank.scala:104-109``) PLUS this shard's
        dangling rank mass — shipping the dangling partial with the payload
        lets every receiver reconstruct the global dangling sum locally, so
        no driver-side scalar barrier exists between rounds.

        ``delta > 0`` switches to the incremental exchange (see
        ``_Scatter.per_part_delta``): payloads carry CHANGES against what
        receivers already accumulated, filtered at ``delta``; the bootstrap
        round (``with_ids``) rebases both sides to zero and ships the full
        sums, so resume/warm-start need no extra state."""
        rank = self.state["rank"]
        # weighted layout: transition prob of edge e = w(e)/Σw(out-edges),
        # so the coefficient divides by the weighted out-degree and
        # coef_scatter_sums multiplies each edge's contribution by w(e)
        denom = self.fwd.w_out if self.fwd.w_out is not None else self.fwd.out_deg
        coef = np.where(self.fwd.out_deg > 0,
                        damping * rank / np.where(self.fwd.out_deg > 0, denom, 1.0), 0.0)
        sums = self.fwd.coef_scatter_sums(coef)
        dangle = float(rank[self.fwd.out_deg == 0].sum())
        if delta <= 0.0:
            return (self.fwd.per_part(sums, with_ids), dangle)
        if with_ids:
            # (re)base the incremental state: receivers accumulate from 0
            self._pr_contrib = np.zeros(len(self.verts))
            self._pr_last_sent = np.zeros(len(self.fwd.uniq_dst))
            slices = self.fwd.per_part(sums, True)
            for q in range(self.fwd.num_parts):
                lo, hi = self.fwd.part_ptr[q], self.fwd.part_ptr[q + 1]
                self._pr_last_sent[lo:hi] = slices[q][1]  # post-cast values
            return (slices, dangle)
        pending = np.subtract(sums, self._pr_last_sent)
        # threshold = per-round energy cut ∨ the absolute floor: the energy
        # cut is RELATIVE to this shard's round mass, so a shard whose
        # pending is pure quantization/update residue would ship the noise
        # (measured on the incremental-recrawl experiment: unperturbed
        # shards stayed dense); the floor makes entries that cannot matter
        # even in aggregate (Σ over all U entries < delta·tolerance)
        # unconditionally skippable
        thresh = (0.0 if flush
                  else max(_energy_cut(pending, delta), floor))
        return (self.fwd.per_part_delta(pending, thresh, flush,
                                        self._pr_last_sent), dangle)

    def pr_round(self, damping: float, n_total: int, bootstrap: bool,
                 delta: float, flush: bool, floor: float,
                 *sender_payloads):
        """One fused PageRank superstep: apply last round's contributions
        (unless ``bootstrap``), then scatter from the updated rank.

        ``delta > 0`` runs the incremental exchange: this shard keeps an
        accumulator of received contributions (``_pr_contrib``) that
        payloads ADD INTO (dense delta arrays, sparse ``("s", idx, vals)``
        triples, or the bootstrap's ``(ids, vals)`` rebase), instead of
        rebuilding the sum from scratch; the scatter side ships only
        pending changes ≥ ``delta`` (see ``_pr_scatter_payload``).
        ``flush`` forces a full pending ship so the driver can certify a
        convergence check against zero withheld residue.

        Returns ``exchange_groups + 1`` objects (``num_returns=G+1``): one
        packed payload PER RECEIVER GROUP for the next round (each stays in
        plasma, pulled only by that group's shards — the per-NODE packing)
        and the tiny stats tuple (T1 error) the driver actually fetches.
        Each incoming ``sender_payload`` here is the sender's object for
        THIS shard's group: ``(slices for the group's parts, dangle)``.
        Semantics per round are exactly ``PageRank.scala:85-113``: dangleSum
        = d·Σ_dangling r/n from the PRE-round ranks (shipped inside every
        group payload), every existing vertex gets dangleSum + (1−d)/n plus
        its contribution sums, error = T1 vs previous ranks.
        """
        err = float("nan")
        t_in = time.perf_counter()
        t_apply = 0.0
        if not bootstrap:
            dangle_total = sum(pl[1] for pl in sender_payloads)
            base = damping * dangle_total / n_total + (1.0 - damping) / n_total
            incoming = [pl[0][self.part - self.group_start]
                        for pl in sender_payloads]
            old = self.state["rank"]
            if delta > 0.0:
                contrib = self._pr_contrib
                for sender, payload in enumerate(incoming):
                    if isinstance(payload, tuple) and len(payload) == 3:
                        _tag, idx, vals = payload
                        if len(vals):
                            pos = self._positions("fwd", sender, None)
                            # uniq-dst ids are distinct per sender, so the
                            # fancy index is duplicate-free
                            contrib[pos[idx]] += vals
                    elif isinstance(payload, tuple):
                        ids, vals = payload
                        pos = self._positions("fwd", sender, ids)
                        if len(vals):
                            contrib[pos] += vals
                    else:
                        if len(payload):
                            pos = self._positions("fwd", sender, None)
                            contrib[pos] += payload
                new = contrib + base
            else:
                new = np.full(len(self.verts), base)
                for sender, payload in enumerate(incoming):
                    if isinstance(payload, tuple):
                        ids, sums = payload
                        pos = self._positions("fwd", sender, ids)
                    else:
                        sums = payload
                        pos = self._positions("fwd", sender, None)
                    if len(sums):
                        new[pos] += sums
            err = float(np.abs(new - old).sum())
            self.state["rank"] = new
            t_apply = time.perf_counter() - t_in
        payload = self._pr_scatter_payload(damping, bootstrap, delta, flush,
                                           floor)
        stats = (err, t_apply, time.perf_counter() - t_in - t_apply, t_in,
                 _payload_nbytes(payload))
        per_part, dangle = payload
        G, b = self.exchange_groups, self._group_bounds
        if G == 1:
            return payload, stats
        groups = [(per_part[b[g]:b[g + 1]], dangle) for g in range(G)]
        return (*groups, stats)

    def checkpoint_state(self, name: str, column: str, out_dir: str, tag: str) -> dict:
        """Write this shard's state vector to parquet (tmp + atomic rename);
        returns a lineage record (SURVEY §4 checkpoint row)."""
        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, f"{tag}-part{self.part:05d}.parquet")
        tmp = path + ".tmp"
        tbl = self.get_state_table(name, column)
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)
        vals = self.state[name]
        return {
            "part": self.part,
            "rows": len(vals),
            "sum": float(vals.sum()) if vals.dtype.kind == "f" else int(vals.sum()),
            "path": path,
        }

    def load_state(self, name: str, column: str, path: str) -> int:
        tbl = pq.read_table(path)
        v = np.sort(tbl["vertex"].to_numpy(zero_copy_only=False))
        if not np.array_equal(v, self.verts):
            raise ValueError(f"checkpoint vertex set mismatch for part {self.part}")
        order = np.argsort(tbl["vertex"].to_numpy(zero_copy_only=False))
        self.state[name] = tbl[column].to_numpy(zero_copy_only=False)[order]
        return len(self.verts)

    def pr_dangling_sum(self) -> float:
        return float(self.state["rank"][self.fwd.out_deg == 0].sum())

    def pr_uniq_entries(self) -> int:
        """Distinct destinations this shard scatters to (exchange-volume
        diagnostic: Σ over shards = dense per-round exchange entries)."""
        return int(len(self.fwd.uniq_dst))

    def pr_warm_init(self, n_total: int, path: str | None) -> float:
        """Warm-start rank state from a PRIOR run's checkpoint part file
        (incremental-recrawl path: the layout was delta-updated with
        ``layout.update_edge_layout``, which preserves the ``vertex % P``
        partitioning, so old part p seeds new part p). Vertices absent from
        the old file (newly crawled) start at 1/n; vertices that no longer
        exist are dropped. Returns this shard's un-normalized rank sum —
        the driver rescales globally so Σ rank = 1 before iterating."""
        r = np.full(len(self.verts), 1.0 / n_total)
        if path is not None and os.path.exists(path):
            tbl = pq.read_table(path)
            ov = tbl["vertex"].to_numpy(zero_copy_only=False)
            orank = tbl["rank"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(self.verts, ov)
            valid = (pos < len(self.verts))
            valid[valid] &= self.verts[pos[valid]] == ov[valid]
            r[pos[valid]] = orank[valid]
        self.state["rank"] = r
        return float(r.sum())

    def scale_state(self, name: str, factor: float) -> None:
        self.state[name] = self.state[name] * factor

    # -- Personalized PageRank (exact power iteration) ---------------------

    def ppr_init(self, seed_table: pa.Table) -> None:
        """Reset distribution s from the (tiny, broadcast) seed table;
        rank starts AT s. Exact-power-iteration counterpart of the
        reference's Monte-Carlo personalized reputation
        (``GraphUtils.scala:142-154``): the reset probability mass — and the
        dangling mass — returns to the seed distribution instead of the
        uniform vector, everything else is ``PageRank.scala:85-113``."""
        s = np.zeros(len(self.verts))
        ids = seed_table["vertex"].to_numpy(zero_copy_only=False)
        w = seed_table["weight"].to_numpy(zero_copy_only=False)
        mine = (ids % self.num_parts) == self.part
        pos = self._validated_positions(ids[mine], "PPR seed")
        s[pos] = w[mine]
        self.state["ppr_reset"] = s
        self.state["rank"] = s.copy()

    def ppr_round(self, damping: float, bootstrap: bool, *sender_payloads):
        """One fused PPR superstep (see ``pr_round``): per-vertex base is
        ``s(v)·((1−d) + d·dangleSum)`` — reset AND dangling mass land on the
        seed distribution — plus the damped contribution sums."""
        err = float("nan")
        t_in = time.perf_counter()
        t_apply = 0.0
        if not bootstrap:
            dangle_total = sum(pl[1] for pl in sender_payloads)
            incoming = [pl[0][self.part] for pl in sender_payloads]
            old = self.state["rank"]
            new = self.state["ppr_reset"] * ((1.0 - damping) + damping * dangle_total)
            for sender, payload in enumerate(incoming):
                if isinstance(payload, tuple):
                    ids, sums = payload
                    pos = self._positions("fwd", sender, ids)
                else:
                    sums = payload
                    pos = self._positions("fwd", sender, None)
                if len(sums):
                    new[pos] += sums
            err = float(np.abs(new - old).sum())
            self.state["rank"] = new
            t_apply = time.perf_counter() - t_in
        payload = self._pr_scatter_payload(damping, bootstrap)
        return payload, (err, t_apply, time.perf_counter() - t_in - t_apply, t_in,
                         _payload_nbytes(payload))

    # -- Katz centrality (truncated power series) ---------------------------

    def katz_init(self, beta: float) -> None:
        """x₀ = β·1 (the k=0 term of x = Σ α^k (Aᵀ)^k β·1)."""
        self.state["katz"] = np.full(len(self.verts), beta)

    def katz_round(self, alpha: float, beta: float, bootstrap: bool,
                   *sender_payloads):
        """One fused Katz superstep (the ``pr_round`` shape without
        normalization, dangling mass, or reset): apply
        ``x(v) = β + Σ incoming α·x(u)`` then scatter ``α·x`` along
        out-edges (edge weights multiply in on weighted layouts)."""
        err = float("nan")
        t_in = time.perf_counter()
        t_apply = 0.0
        if not bootstrap:
            incoming = [pl[0][self.part] for pl in sender_payloads]
            old = self.state["katz"]
            new = np.full(len(self.verts), beta)
            for sender, payload in enumerate(incoming):
                if isinstance(payload, tuple):
                    ids, sums = payload
                    pos = self._positions("fwd", sender, ids)
                else:
                    sums = payload
                    pos = self._positions("fwd", sender, None)
                if len(sums):
                    new[pos] += sums
            err = float(np.abs(new - old).sum())
            self.state["katz"] = new
            t_apply = time.perf_counter() - t_in
        sums = self.fwd.coef_scatter_sums(alpha * self.state["katz"])
        # same (per_part, scalar) payload shape as pr_round (no dangling
        # mass in Katz; the slot keeps _payload_nbytes/positions shared)
        payload = (self.fwd.per_part(sums, bootstrap), 0.0)
        return payload, (err, t_apply, time.perf_counter() - t_in - t_apply,
                         t_in, _payload_nbytes(payload))

    def eig_init(self) -> float:
        """y₀ = 1 on every vertex; returns shard Σy² for the global norm.
        (Normalization needs a global reduction, so eigenvector centrality
        runs as explicit scatter/apply phases instead of the fused
        ``pr_round`` shape — one extra actor call per round.)"""
        self.state["eig"] = np.ones(len(self.verts))
        return float(len(self.verts))

    def eig_scatter(self, inv_norm: float, first: bool):
        """Scatter x̂ = y·inv_norm along out-edges; also records x̂ so the
        next apply can report ‖Δx̂‖₁ convergence. Returns (payload, Σ|Δx̂|
        vs the previous round's x̂)."""
        xhat = self.state["eig"] * inv_norm
        prev = self.state.get("eig_prev")
        err = float(np.abs(xhat - prev).sum()) if prev is not None else float("nan")
        self.state["eig_prev"] = xhat
        sums = self.fwd.coef_scatter_sums(xhat)
        return (self.fwd.per_part(sums, first), 0.0), err

    def eig_apply(self, *sender_payloads) -> float:
        """y ← Σ incoming (= Aᵀ x̂); returns shard Σy² for the driver's
        next-norm reduction."""
        incoming = [pl[0][self.part] for pl in sender_payloads]
        new = np.zeros(len(self.verts))
        for sender, payload in enumerate(incoming):
            if isinstance(payload, tuple):
                ids, sums = payload
                pos = self._positions("fwd", sender, ids)
            else:
                sums = payload
                pos = self._positions("fwd", sender, None)
            if len(sums):
                new[pos] += sums
        self.state["eig"] = new
        return float(np.square(new).sum())

    def eig_finalize(self, inv_norm: float) -> None:
        self.state["eig"] = self.state["eig"] * inv_norm

    # -- WCC (hash-min label propagation; SURVEY §2.5 WCC row) -------------

    def wcc_init(self) -> None:
        self.state["comp"] = self.verts.copy()

    def wcc_scatter(self, first_round: bool):
        comp = self.state["comp"]
        mins = self.fwd.segment_mins(comp[self.fwd.src_pos])
        return self.fwd.per_part(mins, first_round)

    def wcc_apply(self, *sender_payloads) -> int:
        incoming = [pl[self.part] for pl in sender_payloads]
        comp = self.state["comp"]
        changed_any = np.zeros(len(comp), dtype=bool)
        for sender, payload in enumerate(incoming):
            if isinstance(payload, tuple):
                ids, mins = payload
                pos = self._positions("fwd", sender, ids)
            else:
                mins = payload
                pos = self._positions("fwd", sender, None)
            if len(mins):
                cur = comp[pos]
                better = mins < cur
                if better.any():
                    comp[pos[better]] = mins[better]
                    changed_any[pos[better]] = True
        return int(changed_any.sum())

    # -- topological layers (max-plus longest path on a DAG) ----------------

    def topo_init(self) -> None:
        self.state["layer"] = np.zeros(len(self.verts), np.int64)

    def topo_scatter(self, first_round: bool):
        vals = self.state["layer"][self.fwd.src_pos] + 1
        return self.fwd.per_part(self.fwd.segment_maxs(vals), first_round)

    def topo_apply(self, *sender_payloads) -> tuple[int, int]:
        """layer(v) ← max(layer(v), incoming max) — Bellman-Ford max-plus;
        returns (changed count, shard max layer) for termination + the
        cycle guard (a layer ≥ |V| is impossible on a DAG)."""
        incoming = [pl[self.part] for pl in sender_payloads]
        layer = self.state["layer"]
        changed_any = np.zeros(len(layer), dtype=bool)
        for sender, payload in enumerate(incoming):
            if isinstance(payload, tuple):
                ids, maxs = payload
                pos = self._positions("fwd", sender, ids)
            else:
                maxs = payload
                pos = self._positions("fwd", sender, None)
            if len(maxs):
                cur = layer[pos]
                better = maxs > cur
                if better.any():
                    layer[pos[better]] = maxs[better]
                    changed_any[pos[better]] = True
        return int(changed_any.sum()), int(layer.max()) if len(layer) else 0

    # -- Weighted SSSP (Bellman-Ford min-plus relaxation) -------------------

    def sssp_init(self, seed_table: pa.Table) -> None:
        """dist = +inf except the (tiny, broadcast) seed table's vertices."""
        dist = np.full(len(self.verts), np.inf)
        ids = seed_table["vertex"].to_numpy(zero_copy_only=False)
        d0 = seed_table["dist"].to_numpy(zero_copy_only=False)
        mine = (ids % self.num_parts) == self.part
        pos = self._validated_positions(ids[mine], "SSSP source")
        dist[pos] = d0[mine]
        self.state["dist"] = dist

    def sssp_scatter(self, first_round: bool):
        """Per-edge relaxation values dist[src] + w (hop weight 1 on
        unweighted layouts), min-combined per destination segment — the
        min-plus counterpart of ``wcc_scatter``. inf + w = inf, so
        unreached sources are inert without any masking."""
        dist = self.state["dist"]
        sc = self.fwd
        vals = dist[sc.src_pos]
        if sc.w_sorted is not None:
            vals = vals + sc.w_sorted
        else:
            vals = vals + 1.0
        mins = sc.segment_mins(vals)
        return sc.per_part(mins, first_round)

    def sssp_apply(self, *sender_payloads) -> int:
        incoming = [pl[self.part] for pl in sender_payloads]
        dist = self.state["dist"]
        changed_any = np.zeros(len(dist), dtype=bool)
        for sender, payload in enumerate(incoming):
            if isinstance(payload, tuple):
                ids, mins = payload
                pos = self._positions("fwd", sender, ids)
            else:
                mins = payload
                pos = self._positions("fwd", sender, None)
            if len(mins):
                cur = dist[pos]
                better = mins < cur
                if better.any():
                    dist[pos[better]] = mins[better]
                    changed_any[pos[better]] = True
        return int(changed_any.sum())

    # -- Label propagation (mode of neighbor labels, smallest-label ties) --

    def lp_init(self, seed_tables: list[pa.Table] | None) -> None:
        """Two modes (FIXTURES §4 LP rules; no reference impl exists —
        SURVEY §2.5):

        - unseeded (community detection): every vertex starts with its own id
          as label; a per-round self-vote makes symmetric label swaps
          (2-cycles) impossible, so the smallest-label tie-break converges
          deterministically.
        - seeded (label spreading): seed vertices are clamped to their seed
          label; all others start unlabeled (sentinel -1) and do not vote
          until they acquire a label.
        """
        self._lp_seeded = bool(seed_tables)
        if self._lp_seeded:
            lab = np.full(len(self.verts), LP_UNLABELED, dtype=np.int64)
            clamp = np.zeros(len(self.verts), dtype=bool)
            for t in seed_tables:
                ids = t["vertex"].to_numpy(zero_copy_only=False)
                vals = t["label"].to_numpy(zero_copy_only=False)
                mine = (ids % self.num_parts) == self.part
                pos = self._validated_positions(ids[mine], "LP seed")
                lab[pos] = vals[mine]
                clamp[pos] = True
            self._lp_clamped = clamp
        else:
            lab = self.verts.astype(np.int64).copy()
            self._lp_clamped = np.zeros(len(self.verts), dtype=bool)
        self.state["label"] = lab

    def _validated_positions(self, ids: np.ndarray, what: str) -> np.ndarray:
        """searchsorted with membership validation: an id absent from this
        shard's vertex set would otherwise silently alias a neighboring
        vertex (or IndexError at the boundary)."""
        pos = np.searchsorted(self.verts, ids)
        if len(self.verts):
            ok = (pos < len(self.verts)) & (
                self.verts[np.minimum(pos, len(self.verts) - 1)] == ids
            )
        else:
            ok = np.zeros(len(ids), dtype=bool)
        if not ok.all():
            bad = ids[~ok][:5].tolist()
            raise ValueError(f"{what} vertex id(s) not in graph: {bad}")
        return pos

    def lp_restore_clamps(self, seed_tables: list[pa.Table] | None) -> None:
        """Rebuild the clamp mask after a checkpoint restore (labels come
        from the checkpoint; which vertices are seeds does not)."""
        clamp = np.zeros(len(self.verts), dtype=bool)
        self._lp_seeded = bool(seed_tables)
        if seed_tables:
            for t in seed_tables:
                ids = t["vertex"].to_numpy(zero_copy_only=False)
                mine = (ids % self.num_parts) == self.part
                clamp[self._validated_positions(ids[mine], "LP seed")] = True
        self._lp_clamped = clamp

    def lp_scatter(self):
        """Per-dst-partition (dst, label, count) triples — the partial
        mode-count combine. Unlabeled sources don't vote."""
        lab = self.state["label"]
        f = self.fwd
        # sort (already dst-major) edges within each dst segment by label
        per_edge_lab = lab[f.src_pos]
        out = []
        for q in range(f.num_parts):
            lo_seg, hi_seg = f.part_ptr[q], f.part_ptr[q + 1]
            if lo_seg == hi_seg:
                out.append((np.empty(0, np.int64),) * 3)
                continue
            lo = f.seg_starts[lo_seg]
            hi = f.seg_starts[hi_seg] if hi_seg < len(f.seg_starts) else f.n_edges
            seg_id = np.searchsorted(f.seg_starts, np.arange(lo, hi), side="right") - 1
            labs = per_edge_lab[lo:hi]
            voting = labs != LP_UNLABELED
            seg_id, labs = seg_id[voting], labs[voting]
            if len(labs) == 0:
                out.append((np.empty(0, np.int64),) * 3)
                continue
            order = np.lexsort((labs, seg_id))
            s, l = seg_id[order], labs[order]
            new = np.r_[True, (s[1:] != s[:-1]) | (l[1:] != l[:-1])]
            starts = np.flatnonzero(new)
            counts = np.diff(np.r_[starts, len(s)])
            out.append((f.uniq_dst[s[starts]], l[starts], counts.astype(np.int64)))
        return out

    def lp_apply(self, *sender_payloads) -> int:
        """new label(v) = most frequent among incoming neighbor labels plus
        one self-vote for v's current label (if labeled); ties → smallest
        label. Clamped seeds never change; unlabeled vertices with no labeled
        neighbors stay unlabeled. Deterministic at any P."""
        incoming = [pl[self.part] for pl in sender_payloads]
        cur = self.state["label"]
        labeled = cur != LP_UNLABELED
        self_ids = self.verts[labeled]
        self_labs = cur[labeled]
        ids = np.concatenate([p[0] for p in incoming] + [self_ids])
        if len(ids) == 0:
            return 0
        labs = np.concatenate([p[1] for p in incoming] + [self_labs])
        cnts = np.concatenate(
            [p[2] for p in incoming] + [np.ones(len(self_ids), dtype=np.int64)]
        )
        # merge counts for identical (id, label) across senders
        order = np.lexsort((labs, ids))
        ids, labs, cnts = ids[order], labs[order], cnts[order]
        new = np.r_[True, (ids[1:] != ids[:-1]) | (labs[1:] != labs[:-1])]
        starts = np.flatnonzero(new)
        grp_ids = ids[starts]
        grp_labs = labs[starts]
        grp_cnts = np.add.reduceat(cnts, starts)
        # per id: argmax count, tie smallest label → sort by (id, -count, label)
        order2 = np.lexsort((grp_labs, -grp_cnts, grp_ids))
        gi, gl = grp_ids[order2], grp_labs[order2]
        first = np.r_[True, gi[1:] != gi[:-1]]
        win_ids, win_labs = gi[first], gl[first]
        pos = np.searchsorted(self.verts, win_ids)
        lab = self.state["label"]
        updatable = ~self._lp_clamped[pos]
        pos, win_labs = pos[updatable], win_labs[updatable]
        changed = int((lab[pos] != win_labs).sum())
        lab[pos] = win_labs
        return changed

    # -- random walks (GraphUtils.randomWalk / RandomBoundedTraverser,
    #    Traverser.scala:75-136; counter-RNG replaces the sequential seeded
    #    Random of GraphUtils.scala:239-240) -------------------------------

    def walk_build(self) -> None:
        """Lazily build the src-indexed CSR used for neighbor sampling
        (edges re-read from the layout; the scatter structure is dst-sorted
        and cannot answer "neighbors of u" directly)."""
        if "walk_csr" in self.__dict__:
            return
        et = read_partition(self.layout_dir, "edges", self.part, ["src", "dst"])
        src = et["src"].to_numpy(zero_copy_only=False)
        dst = et["dst"].to_numpy(zero_copy_only=False)
        # canonical (src, dst) order — NOT parquet file order: the k-th
        # out-neighbor of u is then a pure function of the edge MULTISET,
        # which (a) makes walk output invariant to how the layout build
        # happened to order rows within a partition and (b) lets the DuckDB
        # oracle reproduce neighbor selection with row_number() OVER
        # (PARTITION BY src ORDER BY dst) (oracles.walk_visits_sql)
        order = np.lexsort((dst, src))
        src_sorted, self._walk_nbrs = src[order], dst[order]
        pos = np.searchsorted(self.verts, src_sorted)
        deg = np.bincount(pos, minlength=len(self.verts))
        self._walk_indptr = np.r_[0, np.cumsum(deg)]
        self._walk_visits = np.zeros(len(self.verts), dtype=np.int64)
        self.walk_csr = True

    def walk_seed(self, walker_ids: np.ndarray, starts: np.ndarray,
                  track_prev: bool = False, track_paths: bool = False,
                  filter_home_by_num_edges: bool = False,
                  track_trace: bool = False) -> int:
        """Accept the walkers whose start vertex this shard owns.

        Walkers whose start vertex does not exist in the graph are dropped
        (the reference's ``GraphUtils.randomWalk`` checks ``existsNodeId``
        and returns empty counters, ``GraphUtils.scala:110-113``); returns
        the number of dropped walkers so the driver can surface it."""
        self.walk_build()
        self._walk_track_prev = track_prev
        self._walk_track_paths = track_paths
        self._walk_track_trace = track_trace
        self._walk_filter_home = filter_home_by_num_edges
        # trace = (walker_ids, step, vertices) array triples, appended per
        # step — vectorized (no per-row work), distributed (each shard keeps
        # only the steps walkers took while ON it)
        self._walk_trace: list[tuple[np.ndarray, int, np.ndarray]] = []
        self._walk_prev_pairs: list[tuple[np.ndarray, np.ndarray]] = []
        self._walk_path_counts: dict[tuple[int, tuple], int] = {}
        self._walk_homes = frozenset(int(v) for v in np.unique(starts))
        self._walk_homes_arr = np.unique(starts)
        mine = (starts % self.num_parts) == self.part
        wid, st = walker_ids[mine], starts[mine]
        # membership check: searchsorted alone maps unknown ids onto a
        # neighboring vertex (or IndexError at the end) — validate explicitly
        if len(self.verts):
            pos = np.searchsorted(self.verts, st)
            ok = (pos < len(self.verts)) & (self.verts[np.minimum(pos, len(self.verts) - 1)] == st)
        else:
            ok = np.zeros(len(st), dtype=bool)
        wid, st = wid[ok], st[ok]
        n_mine = len(wid)
        self._walk_replica = 0
        self._walkers = (wid.copy(), st.copy(), st.copy(),
                         np.full(n_mine, -1, np.int64), [()] * n_mine)
        return int((~ok).sum())

    def walk_seed_all(self, replica: int) -> int:
        """Seed one walker at EVERY owned vertex (shard-local — no
        driver-side vertex list, the scale requirement for corpus-wide
        walk generation). walker_id = start vertex; ``replica`` tags the
        sweep in the trace and is added to the RNG seed by the driver.
        Paths/prev tracking are off (corpus mode); hub pruning, when
        requested, applies uniformly (every vertex is a home, so the
        home exemption would disable it entirely)."""
        self.walk_build()
        self._walk_track_prev = False
        self._walk_track_paths = False
        self._walk_track_trace = True
        self._walk_filter_home = True
        self._walk_replica = replica
        if replica == 0:
            self._walk_trace = []
        self._walk_prev_pairs = []
        self._walk_path_counts = {}
        self._walk_homes = frozenset()
        self._walk_homes_arr = np.empty(0, np.int64)
        self._walkers = (self.verts.copy(), self.verts.copy(), self.verts.copy(),
                         np.full(len(self.verts), -1, np.int64), [])
        return len(self.verts)

    def walk_step(self, step: int, seed: int, reset_prob: float,
                  max_out_deg: int | None, last: bool, *sender_payloads):
        """Visit current vertices, then route each walker to its next vertex.

        Next = start on reset (prob ``reset_prob``), on dangling current
        vertex, or on hub pruning (out-degree > ``max_out_deg``,
        ``Traverser.scala:93-102``); else a uniform out-neighbor. RNG is
        counter-based on (seed, walker, step): deterministic at any P.
        """
        from cassovary_ray.hashing import counter_rng_uniform

        parts = [w for w in ([self._walkers] if self._walkers else [])]
        for pl in sender_payloads:
            p = pl[self.part]
            if len(p[0]):
                parts.append(p)
        self._walkers = None
        if not parts:
            return [self._walk_empty_payload()] * self.num_parts
        wid = np.concatenate([p[0] for p in parts])
        start = np.concatenate([p[1] for p in parts])
        cur = np.concatenate([p[2] for p in parts])
        prev = np.concatenate([p[3] for p in parts])
        paths: list[tuple] = []
        if self._walk_track_paths:
            for p in parts:
                paths.extend(p[4])

        pos = np.searchsorted(self.verts, cur)
        np.add.at(self._walk_visits, pos, 1)
        if self._walk_track_trace:
            self._walk_trace.append((wid, step, cur, self._walk_replica))
        if self._walk_track_prev:
            has_prev = prev >= 0
            self._walk_prev_pairs.append((cur[has_prev], prev[has_prev]))
        if self._walk_track_paths:
            # PathsCounter.visit (PathsCounter.scala:36-41): visiting a home
            # node resets the current path; the visited node is appended and
            # the path snapshot counts toward the ending node.
            # Scale bound (documented): this is the ONE per-row Python loop
            # in the BSP engine — tuple paths defeat numpy. Cost is
            # O(walkers_on_this_shard) per step, so track_paths is sized for
            # the reference's use (10^2-10^4 walkers, PathsCounter.scala
            # serves per-request walks), NOT for corpus-wide 10^8-walker
            # sweeps; visits/prev tracking stay fully vectorized for those.
            pc = self._walk_path_counts
            for i in range(len(cur)):
                c = int(cur[i])
                path = () if c in self._walk_homes else paths[i]
                path = path + (c,)
                paths[i] = path
                key = (c, path)
                pc[key] = pc.get(key, 0) + 1
        if last:
            return [self._walk_empty_payload()] * self.num_parts

        deg = (self._walk_indptr[pos + 1] - self._walk_indptr[pos]).astype(np.int64)
        u_reset = counter_rng_uniform(seed, wid.astype(np.uint64), 2 * step)
        u_nbr = counter_rng_uniform(seed, wid.astype(np.uint64), 2 * step + 1)
        reset = (u_reset < reset_prob) | (deg == 0)
        if max_out_deg is not None:
            # the reference skips the degree threshold while AT a home node
            # unless filterHomeNodeByNumEdges is set (Traverser.scala:95-98:
            # needToFilterByNumEdges = filterHomeNodeByNumEdges ||
            # !homeNodeIdSet.contains(currNode.id)) — otherwise a hub start
            # would reset forever and the walk would never leave it
            too_many = deg > max_out_deg
            if not self._walk_filter_home:
                at_home_pos = np.searchsorted(self._walk_homes_arr, cur)
                at_home = (at_home_pos < len(self._walk_homes_arr)) & (
                    self._walk_homes_arr[np.minimum(at_home_pos, len(self._walk_homes_arr) - 1)] == cur
                )
                too_many &= ~at_home
            reset |= too_many
        idx = self._walk_indptr[pos] + np.minimum(
            (u_nbr * np.maximum(deg, 1)).astype(np.int64), np.maximum(deg - 1, 0)
        )
        if len(self._walk_nbrs):
            sampled = self._walk_nbrs[np.minimum(idx, len(self._walk_nbrs) - 1)]
        else:
            sampled = start  # no local edges: deg==0 everywhere → all reset
        nxt = np.where(reset, start, sampled)
        # a reset breaks the path: no prev-neighbor is recorded for the
        # post-reset visit (PrevNbrCounter counts wander-step edges only)
        prev_out = np.where(reset, -1, cur)
        dest = nxt % self.num_parts
        order = np.argsort(dest, kind="stable")
        wid, start, nxt, dest = wid[order], start[order], nxt[order], dest[order]
        prev_out = prev_out[order]
        if self._walk_track_paths:
            paths = [paths[i] for i in order]
        bounds = np.searchsorted(dest, np.arange(self.num_parts + 1))
        out = []
        for q in range(self.num_parts):
            lo, hi = bounds[q], bounds[q + 1]
            payload = (wid[lo:hi], start[lo:hi], nxt[lo:hi], prev_out[lo:hi])
            if self._walk_track_paths:
                payload = payload + (paths[lo:hi],)
            out.append(payload)
        return out

    def _walk_empty_payload(self):
        empty = (np.empty(0, np.int64),) * 4
        return empty + ([],) if self._walk_track_paths else empty

    def walk_top_paths_table(self, top_k: int) -> pa.Table:
        """(vertex, path, count) — top-k paths ending at each owned vertex
        (``DirectedPathCollection.topPathsTill``: count desc, shorter path
        first on ties; we add lexicographic path order as the final
        deterministic tie-break). Counts are complete per shard because a
        visit to v is always processed by v's owner."""
        per_node: dict[int, list] = {}
        for (node, path), count in self._walk_path_counts.items():
            per_node.setdefault(node, []).append((-count, len(path), path))
        verts, paths_col, counts = [], [], []
        for node in sorted(per_node):
            for negc, _, path in sorted(per_node[node])[:top_k]:
                verts.append(node)
                paths_col.append(list(path))
                counts.append(-negc)
        return pa.table({"vertex": pa.array(verts, pa.int64()),
                         "path": pa.array(paths_col, pa.list_(pa.int64())),
                         "count": pa.array(counts, pa.int64())})

    def walk_prev_counts_table(self) -> pa.Table:
        """(vertex, prev, count) — the ``PrevNbrCounter`` aggregation
        (``graph/tourist/PrevNbrCounter.scala:25-113``): how often each
        previous-neighbor preceded a visit to each vertex."""
        if not self._walk_prev_pairs:
            return pa.table({"vertex": pa.array([], pa.int64()),
                             "prev": pa.array([], pa.int64()),
                             "count": pa.array([], pa.int64())})
        cur = np.concatenate([p[0] for p in self._walk_prev_pairs])
        prv = np.concatenate([p[1] for p in self._walk_prev_pairs])
        if len(cur) == 0:
            # pairs recorded but all empty (shard participated in rounds
            # without ever receiving a tracked step): np.r_[True, ...] on
            # the empty diff would fabricate one segment start
            return pa.table({"vertex": pa.array([], pa.int64()),
                             "prev": pa.array([], pa.int64()),
                             "count": pa.array([], pa.int64())})
        order = np.lexsort((prv, cur))
        cur, prv = cur[order], prv[order]
        new = np.r_[True, (cur[1:] != cur[:-1]) | (prv[1:] != prv[:-1])]
        starts = np.flatnonzero(new)
        counts = np.diff(np.r_[starts, len(cur)])
        return pa.table({"vertex": pa.array(cur[starts], pa.int64()),
                         "prev": pa.array(prv[starts], pa.int64()),
                         "count": pa.array(counts, pa.int64())})

    def walk_visits_table(self) -> pa.Table:
        nz = self._walk_visits > 0
        return pa.table({"vertex": pa.array(self.verts[nz], pa.int64()),
                         "visits": pa.array(self._walk_visits[nz], pa.int64())})

    def walk_reset_counts(self) -> None:
        if "walk_csr" in self.__dict__:
            self._walk_visits[:] = 0
        self._walk_prev_pairs = []
        self._walk_path_counts = {}
        self._walk_trace = []
        self._walkers = None

    # -- node2vec second-order walks (Grover & Leskovec 2016) ---------------
    #
    # The biased step needs, at current vertex v with previous vertex t,
    # the distance-class of every candidate x ∈ N(v) w.r.t. t:
    # x == t → weight 1/p, x ∈ N(t) → 1, else → 1/q. N(t) lives on
    # shard(t), so each step is TWO exchanges: phase A at shard(v) gathers
    # the (hub-pruned) candidate list and routes pending walkers to
    # shard(prev); phase B at shard(t) classifies candidates against N(t)
    # (vectorized rank-composite membership — no per-walker Python) and
    # samples. Sampling is integer-exact: a walker's candidate classes are
    # COUNTED (n_ret, n_in, n_out), the class drawn from the three-term
    # weight scalar, and the k-th member of the class selected through
    # exact integer cumulative ranks — no float prefix sums whose grouping
    # could differ with partition count, so results are bit-identical at
    # any P. Payload per pending walker is its candidate list: O(deg(v));
    # at corpus scale node2vec REQUIRES max_out_deg hub pruning, which
    # bounds the exchange by cap × walkers (the same power-law guard as
    # Traverser.scala:93-102).

    def n2v_build(self) -> None:
        """Per-vertex dst-sorted neighbor array (the membership/searchsorted
        form). ``walk_build`` now canonicalizes the CSR to (src, dst)
        lexsort order — the same dst-sorted-within-vertex form — so this is
        an alias, not a copy."""
        self.walk_build()
        if "_n2v_nbrs" in self.__dict__:
            return
        self._n2v_nbrs = self._walk_nbrs

    def _n2v_empty(self):
        e = np.empty(0, np.int64)
        return {"res": [(e, e, e, e)] * self.num_parts,
                "pend": [(e, e, e, e, e, e)] * self.num_parts}

    def n2v_step_a(self, step: int, seed: int, reset_prob: float,
                   max_out_deg: int | None, last: bool, *payloads):
        """Visit + route: resolved walkers (reset / dangling / hub-pruned /
        no-prev) sample uniformly here and go to shard(next); the rest go
        to shard(prev) with their candidate list for phase B."""
        from cassovary_ray.hashing import counter_rng_uniform

        self.n2v_build()
        parts = []
        if self._walkers:
            w = self._walkers
            parts.append((w[0], w[1], w[2], w[3]))
            self._walkers = None
        for pl in payloads:
            sl = pl["res"][self.part] if isinstance(pl, dict) else pl[self.part]
            if len(sl[0]):
                parts.append(sl[:4])
        if not parts:
            return self._n2v_empty()
        wid = np.concatenate([p[0] for p in parts])
        start = np.concatenate([p[1] for p in parts])
        cur = np.concatenate([p[2] for p in parts])
        prev = np.concatenate([p[3] for p in parts])

        pos = np.searchsorted(self.verts, cur)
        np.add.at(self._walk_visits, pos, 1)
        if self._walk_track_trace:
            self._walk_trace.append((wid, step, cur, self._walk_replica))
        if last:
            return self._n2v_empty()

        indptr = self._walk_indptr
        deg = (indptr[pos + 1] - indptr[pos]).astype(np.int64)
        u_reset = counter_rng_uniform(seed, wid.astype(np.uint64), 4 * step)
        reset = (u_reset < reset_prob) | (deg == 0)
        if max_out_deg is not None:
            too_many = deg > max_out_deg
            if not self._walk_filter_home:
                hp = np.searchsorted(self._walk_homes_arr, cur)
                at_home = (hp < len(self._walk_homes_arr)) & (
                    self._walk_homes_arr[np.minimum(hp, len(self._walk_homes_arr) - 1)] == cur
                )
                too_many &= ~at_home
            reset |= too_many
        first_order = reset | (prev < 0)

        out = self._n2v_empty()
        # resolved: uniform sample from the SORTED neighbor array
        if first_order.any():
            f = first_order
            u_nbr = counter_rng_uniform(seed, wid[f].astype(np.uint64), 4 * step + 1)
            degf = deg[f]
            idx = indptr[pos[f]] + np.minimum(
                (u_nbr * np.maximum(degf, 1)).astype(np.int64),
                np.maximum(degf - 1, 0),
            )
            if len(self._n2v_nbrs):
                sampled = self._n2v_nbrs[np.minimum(idx, len(self._n2v_nbrs) - 1)]
            else:
                sampled = start[f]
            rs = reset[f]
            nxt = np.where(rs, start[f], sampled)
            prev_out = np.where(rs, -1, cur[f])
            dest = nxt % self.num_parts
            order = np.argsort(dest, kind="stable")
            wf, sf, nf, pf, df = (wid[f][order], start[f][order], nxt[order],
                                  prev_out[order], dest[order])
            bounds = np.searchsorted(df, np.arange(self.num_parts + 1))
            out["res"] = [
                (wf[bounds[q]:bounds[q + 1]], sf[bounds[q]:bounds[q + 1]],
                 nf[bounds[q]:bounds[q + 1]], pf[bounds[q]:bounds[q + 1]])
                for q in range(self.num_parts)
            ]
        # pending: ship candidate lists to shard(prev)
        if (~first_order).any():
            g = ~first_order
            wg, sg, cg, pg = wid[g], start[g], cur[g], prev[g]
            lg, ng = indptr[pos[g]], deg[g]
            dest = pg % self.num_parts
            order = np.argsort(dest, kind="stable")
            wg, sg, cg, pg = wg[order], sg[order], cg[order], pg[order]
            lg, ng, dest = lg[order], ng[order], dest[order]
            csum = np.cumsum(ng) - ng
            gidx = np.arange(int(ng.sum())) + np.repeat(lg - csum, ng)
            cand = self._n2v_nbrs[gidx]
            cand_bounds = np.r_[0, np.cumsum(ng)]
            bounds = np.searchsorted(dest, np.arange(self.num_parts + 1))
            pend = []
            for q in range(self.num_parts):
                lo, hi = bounds[q], bounds[q + 1]
                pend.append((wg[lo:hi], sg[lo:hi], cg[lo:hi], pg[lo:hi],
                             ng[lo:hi], cand[cand_bounds[lo]:cand_bounds[hi]]))
            out["pend"] = pend
        return out

    def n2v_step_b(self, step: int, seed: int, p_return: float, q_inout: float,
                   *a_outs):
        """Classify candidates against N(prev) and sample the biased step."""
        from cassovary_ray.hashing import counter_rng_uniform

        self.n2v_build()
        parts = [pl["pend"][self.part] for pl in a_outs]
        parts = [p for p in parts if len(p[0])]
        e = np.empty(0, np.int64)
        if not parts:
            return [(e, e, e, e)] * self.num_parts
        wid = np.concatenate([p[0] for p in parts])
        start = np.concatenate([p[1] for p in parts])
        cur = np.concatenate([p[2] for p in parts])
        prev = np.concatenate([p[3] for p in parts])
        lens = np.concatenate([p[4] for p in parts])
        cand = np.concatenate([p[5] for p in parts])
        off = np.r_[0, np.cumsum(lens)]
        widx = np.repeat(np.arange(len(wid)), lens)

        # membership of each candidate in N(prev) via dense-rank composite
        # keys (walker_idx * U + rank) — one global searchsorted, no
        # per-walker loop; keys stay < 2^63 because ranks are dense
        indptr = self._walk_indptr
        tpos = np.searchsorted(self.verts, prev)
        tlo = indptr[tpos]
        tn = (indptr[tpos + 1] - tlo).astype(np.int64)
        tcsum = np.cumsum(tn) - tn
        tgidx = np.arange(int(tn.sum())) + np.repeat(tlo - tcsum, tn)
        G = self._n2v_nbrs[tgidx]
        gwidx = np.repeat(np.arange(len(wid)), tn)
        u = np.unique(np.concatenate([G, cand]))
        U = np.int64(len(u) + 1)
        keyG = gwidx * U + np.searchsorted(u, G)
        keyX = widx * U + np.searchsorted(u, cand)
        ins = np.searchsorted(keyG, keyX)
        if len(keyG):
            member = (ins < len(keyG)) & (keyG[np.minimum(ins, len(keyG) - 1)] == keyX)
        else:
            member = np.zeros(len(keyX), dtype=bool)

        is_ret = cand == prev[widx]
        is_in = member & ~is_ret
        is_out = ~member & ~is_ret
        # integer-exact class counts per walker (np.add.reduceat over
        # per-candidate 0/1; off[:-1] are the segment starts)
        seg_starts = off[:-1]
        n_ret = np.add.reduceat(is_ret.astype(np.int64), seg_starts)
        n_in = np.add.reduceat(is_in.astype(np.int64), seg_starts)
        n_out = np.add.reduceat(is_out.astype(np.int64), seg_starts)
        w_total = n_ret / p_return + n_in * 1.0 + n_out / q_inout
        u_class = counter_rng_uniform(seed, wid.astype(np.uint64), 4 * step + 2)
        t = u_class * w_total
        cls = np.where(t < n_ret / p_return, 0,
                       np.where(t < n_ret / p_return + n_in, 1, 2))
        u_idx = counter_rng_uniform(seed, wid.astype(np.uint64), 4 * step + 3)
        n_cls = np.choose(cls, [n_ret, n_in, n_out])
        k = np.minimum((u_idx * np.maximum(n_cls, 1)).astype(np.int64),
                       np.maximum(n_cls - 1, 0))
        # k-th candidate of the drawn class via exact integer cumulative
        # ranks: global cumsum of the class mask is exact, so the local
        # target rank base + k + 1 and one searchsorted select it at any P
        nxt = np.empty(len(wid), np.int64)
        for mask, c in ((is_ret, 0), (is_in, 1), (is_out, 2)):
            sel = cls == c
            if not sel.any():
                continue
            cm = np.cumsum(mask.astype(np.int64))
            base = np.where(seg_starts > 0, cm[seg_starts - 1], 0)
            target = base[sel] + k[sel] + 1
            ppos = np.searchsorted(cm, target, side="left")
            nxt[sel] = cand[ppos]
        prev_out = cur
        dest = nxt % self.num_parts
        order = np.argsort(dest, kind="stable")
        wid, start, nxt, prev_out, dest = (wid[order], start[order], nxt[order],
                                           prev_out[order], dest[order])
        bounds = np.searchsorted(dest, np.arange(self.num_parts + 1))
        return [
            (wid[bounds[q]:bounds[q + 1]], start[bounds[q]:bounds[q + 1]],
             nxt[bounds[q]:bounds[q + 1]], prev_out[bounds[q]:bounds[q + 1]])
            for q in range(self.num_parts)
        ]

    def walk_trace_scatter(self):
        """Route this shard's trace rows to each walker's home shard
        (walker_id % P) — ONE packed keyed exchange, after which every
        walker's full trajectory is co-located for sequence assembly."""
        if not getattr(self, "_walk_trace", None):
            empty = (np.empty(0, np.int64),) * 4
            return [empty] * self.num_parts
        wid = np.concatenate([t[0] for t in self._walk_trace])
        step = np.concatenate([np.full(len(t[0]), t[1], np.int64)
                               for t in self._walk_trace])
        cur = np.concatenate([t[2] for t in self._walk_trace])
        rep = np.concatenate([np.full(len(t[0]), t[3], np.int64)
                              for t in self._walk_trace])
        dest = wid % self.num_parts
        order = np.argsort(dest, kind="stable")
        wid, rep, step, cur = wid[order], rep[order], step[order], cur[order]
        bounds = np.searchsorted(dest[order], np.arange(self.num_parts + 1))
        return [
            (wid[lo:hi], rep[lo:hi], step[lo:hi], cur[lo:hi])
            for lo, hi in zip(bounds[:-1], bounds[1:])
        ]

    def walk_sequences_table(self, walk_length: int, *sender_payloads) -> pa.Table:
        """Assemble (walker_id, walk, seq) rows from the routed trace: lexsort
        by (walker, replica, step) then one reshape — every walk contributes
        exactly ``walk_length`` rows, so the sort IS the assembly."""
        parts = [pl[self.part] for pl in sender_payloads]
        wid = np.concatenate([p[0] for p in parts])
        if len(wid) == 0:
            return pa.table({
                "walker_id": pa.array([], pa.int64()),
                "walk": pa.array([], pa.int64()),
                "seq": pa.array([], pa.list_(pa.int64())),
            })
        rep = np.concatenate([p[1] for p in parts])
        step = np.concatenate([p[2] for p in parts])
        cur = np.concatenate([p[3] for p in parts])
        order = np.lexsort((step, rep, wid))
        wid, rep, cur = wid[order], rep[order], cur[order]
        L = walk_length
        if len(cur) % L:
            raise AssertionError("trace rows not a multiple of walk_length")
        seq = pa.FixedSizeListArray.from_arrays(pa.array(cur, pa.int64()), L)
        return pa.table({
            "walker_id": pa.array(wid[::L], pa.int64()),
            "walk": pa.array(rep[::L], pa.int64()),
            "seq": seq.cast(pa.list_(pa.int64())),
        })

    def walk_trace_table(self) -> pa.Table:
        """(walker_id, walk, step, vertex) rows for steps taken on this
        shard (walk = replica index for multi-walk corpora)."""
        if not getattr(self, "_walk_trace", None):
            return pa.table({"walker_id": pa.array([], pa.int64()),
                             "walk": pa.array([], pa.int64()),
                             "step": pa.array([], pa.int64()),
                             "vertex": pa.array([], pa.int64())})
        wid = np.concatenate([t[0] for t in self._walk_trace])
        step = np.concatenate([np.full(len(t[0]), t[1], np.int64)
                               for t in self._walk_trace])
        cur = np.concatenate([t[2] for t in self._walk_trace])
        rep = np.concatenate([np.full(len(t[0]), t[3], np.int64)
                              for t in self._walk_trace])
        return pa.table({"walker_id": pa.array(wid, pa.int64()),
                         "walk": pa.array(rep, pa.int64()),
                         "step": pa.array(step, pa.int64()),
                         "vertex": pa.array(cur, pa.int64())})

    # -- bipartite iterative link analysis (IterativeLinkAnalyzer.scala:
    #    36-184 on the BSP engine; bipartite.py pandas is the small-subgraph
    #    fallback). Same contract as bipartite.iterative_link_analysis:
    #    induced subgraph of supplied lefts, reference-code reset pairing,
    #    contributors by share on the last two passes. --------------------

    def bila_init(self, seed_table: pa.Table) -> None:
        n = len(self.verts)
        supplied = np.zeros(n, dtype=bool)
        init = np.zeros(n)
        ids = seed_table["vertex"].to_numpy(zero_copy_only=False)
        vals = seed_table["weight"].to_numpy(zero_copy_only=False)
        mine = (ids % self.num_parts) == self.part
        pos = self._validated_positions(ids[mine], "bipartite left")
        supplied[pos] = True
        init[pos] = vals[mine]
        self.state["bila_supplied"] = supplied
        self.state["bila_init"] = init
        self.state["bila_lw"] = init.copy()  # lefts start at init (:145-148)
        self.state["bila_rw"] = np.zeros(n)
        self._bila_contrib: dict[str, dict[int, np.ndarray]] = {"left": {}, "right": {}}

    def bila_rightdeg_scatter(self, first_round: bool):
        """Induced right in-degree: count only edges out of supplied lefts
        (the reference counts numNeighbors while discovering rights from the
        supplied lefts' edges, :78-85)."""
        coef = self.state["bila_supplied"].astype(np.float64)
        return self.fwd.per_part(self.fwd.coef_scatter_sums(coef), first_round)

    def bila_rightdeg_apply(self, *sender_payloads) -> float:
        return self._sum_apply("fwd", "bila_rdeg", sender_payloads)

    def _bila_share(self, direction: str, reset: float) -> tuple[np.ndarray, np.ndarray]:
        """(per-vertex share, valid-source mask) for one pass: share(v) =
        weight(v)/deg(v)·(1−reset); sources are supplied lefts (forward) or
        induced rights (reverse)."""
        if direction == "fwd":
            w, deg = self.state["bila_lw"], self.fwd.out_deg.astype(np.float64)
            valid = self.state["bila_supplied"] & (deg > 0)
        else:
            w, deg = self.state["bila_rw"], self.state["bila_rdeg"]
            valid = deg > 0
        share = np.where(valid, w / np.maximum(deg, 1e-300) * (1.0 - reset), 0.0)
        return share, valid

    def bila_fwd_scatter(self, reset_right: float, first_round: bool):
        share, _ = self._bila_share("fwd", reset_right)
        return self.fwd.per_part(self.fwd.coef_scatter_sums(share), first_round)

    def bila_fwd_apply(self, *sender_payloads) -> float:
        # rights reset to 0 each pass (initial weight 0, :72-75)
        return self._sum_apply("fwd", "bila_rw", sender_payloads)

    def bila_rev_scatter(self, reset_left: float, first_round: bool):
        share, _ = self._bila_share("rev", reset_left)
        return self.rev.per_part(self.rev.coef_scatter_sums(share), first_round)

    def bila_rev_apply(self, reset_left: float, *sender_payloads) -> float:
        r = self._sum_apply("rev", "_bila_flow", sender_payloads)
        self.state["bila_lw"] = (
            reset_left * self.state["bila_init"] + self.state.pop("_bila_flow")
        )
        return r

    def bila_contrib_scatter(self, direction: str, reset: float):
        """Per-part (dst, src, share) triples for valid-source edges — the
        last-two-pass contributor recording (:158)."""
        sc = self.fwd if direction == "fwd" else self.rev
        share, valid = self._bila_share(direction, reset)
        per_edge_share = share[sc.src_pos]
        per_edge_valid = valid[sc.src_pos]
        src_ids = self.verts[sc.src_pos]
        dst_ids = sc.per_edge_dst()
        out = []
        for q in range(self.num_parts):
            lo, hi = sc.edge_range_for_part(q)
            keep = per_edge_valid[lo:hi]
            out.append((dst_ids[lo:hi][keep], src_ids[lo:hi][keep],
                        per_edge_share[lo:hi][keep]))
        return out

    def bila_contrib_apply(self, direction: str, k: int, *sender_payloads) -> int:
        """Top-k contributors per owned destination: share desc, src id asc
        (``SmallBoundedPriorityQueue`` ordering; ranking by contributed share
        is the documented divergence — see bipartite.py docstring).

        Shares are NANO-QUANTIZED (floor(share·1e9), mirrored in the SQL
        oracle and the pandas fallback) before ranking: pass-2 shares are
        sums whose value depends on summation order at the ulp level, so two
        truly-TIED contributors would otherwise rank by float noise and the
        top-k would flip between runs/engines (observed as a flaky oracle
        hash); quantized, true ties collapse and the src-asc tie-break
        decides deterministically."""
        incoming = [pl[self.part] for pl in sender_payloads]
        dst = np.concatenate([p[0] for p in incoming])
        src = np.concatenate([p[1] for p in incoming])
        share = np.concatenate([p[2] for p in incoming])
        side = "right" if direction == "fwd" else "left"
        if side == "left":
            # only supplied lefts carry output contributors
            pos = np.searchsorted(self.verts, dst)
            keep = self.state["bila_supplied"][pos]
            dst, src, share = dst[keep], src[keep], share[keep]
        contrib: dict[int, np.ndarray] = {}
        if len(dst):
            share_q = np.floor(share * 1e9).astype(np.int64)
            order = np.lexsort((src, -share_q, dst))
            d, s = dst[order], src[order]
            new_grp = np.r_[True, d[1:] != d[:-1]]
            grp_start = np.flatnonzero(new_grp)
            rank = np.arange(len(d)) - np.repeat(grp_start, np.diff(np.r_[grp_start, len(d)]))
            keep = rank < k
            d, s = d[keep], s[keep]
            new_grp = np.r_[True, d[1:] != d[:-1]]
            starts = np.flatnonzero(new_grp)
            for i, st in enumerate(starts):
                en = starts[i + 1] if i + 1 < len(starts) else len(d)
                contrib[int(d[st])] = s[st:en]
        self._bila_contrib[side] = contrib
        return len(contrib)

    def bila_side_table(self, side: str) -> pa.Table:
        if side == "left":
            mask = self.state["bila_supplied"]
            w = self.state["bila_lw"]
        else:
            mask = self.state["bila_rdeg"] > 0
            w = self.state["bila_rw"]
        verts = self.verts[mask]
        contrib = self._bila_contrib[side]
        return pa.table({
            "vertex": pa.array(verts, pa.int64()),
            "weight": pa.array(w[mask], pa.float64()),
            "contributors": pa.array(
                [contrib.get(int(v), np.empty(0, np.int64)).tolist() for v in verts],
                pa.list_(pa.int64()),
            ),
        })

    # -- HITS (needs reverse layout; ``Hits.scala:79-103``) ----------------

    def hits_init(self, n_total: int) -> None:
        self.state["hubs"] = np.full(len(self.verts), 1.0 / n_total)
        self.state["auth"] = np.zeros(len(self.verts))

    def _sum_scatter(self, scatter: _Scatter, vec: np.ndarray, first_round: bool):
        sums = scatter.segment_sums(vec[scatter.src_pos])
        return scatter.per_part(sums, first_round)

    def _sum_apply(self, kind: str, out_name: str, sender_payloads) -> float:
        incoming = [pl[self.part] for pl in sender_payloads]
        new = np.zeros(len(self.verts))
        for sender, payload in enumerate(incoming):
            if isinstance(payload, tuple):
                ids, sums = payload
                pos = self._positions(kind, sender, ids)
            else:
                sums = payload
                pos = self._positions(kind, sender, None)
            if len(sums):
                new[pos] += sums
        self.state[out_name] = new
        return float(new.max()) if len(new) else 0.0

    def hits_auth_scatter(self, first_round: bool):
        return self._sum_scatter(self.fwd, self.state["hubs"], first_round)

    def hits_auth_apply(self, *sender_payloads) -> float:
        return self._sum_apply("fwd", "auth_raw", sender_payloads)

    def hits_hub_scatter(self, first_round: bool):
        return self._sum_scatter(self.rev, self.state["auth_raw"], first_round)

    def hits_hub_apply(self, *sender_payloads) -> float:
        return self._sum_apply("rev", "hubs_raw", sender_payloads)

    def hits_finish_round(self, hub_max: float, auth_max: float) -> float:
        """Scale both vectors by the global max (``Hits.scala:53-56,100-101``)
        and return the T1 hubs-error contribution."""
        old_hubs = self.state["hubs"]
        hubs = self.state.pop("hubs_raw")
        auth = self.state.pop("auth_raw")
        if hub_max > 0:
            hubs = hubs / hub_max
        if auth_max > 0:
            auth = auth / auth_max
        self.state["hubs"], self.state["auth"] = hubs, auth
        return float(np.abs(hubs - old_hubs).sum())

    def hits_sums(self) -> tuple[float, float]:
        return float(self.state["hubs"].sum()), float(self.state["auth"].sum())

    def hits_normalize(self, hub_sum: float, auth_sum: float) -> None:
        if hub_sum > 0:
            self.state["hubs"] = self.state["hubs"] / hub_sum
        if auth_sum > 0:
            self.state["auth"] = self.state["auth"] / auth_sum

    # -- SALSA (Lempel & Moran 2000) ----------------------------------------
    # The stochastic HITS variant behind Twitter's Who-To-Follow, the service
    # Cassovary was built for (reference README.md:9-12 names the use case;
    # the reference itself ships only HITS + the bipartite IterativeLink-
    # Analyzer, so this is adjacent new surface, not a port). One round:
    #   hub(j)  = Σ_{(j,i)∈E} auth(i)/indeg(i)   (backward step on in-edges)
    #   auth(i) = Σ_{(j,i)∈E} hub(j)/outdeg(j)   (forward step on out-edges)
    # Both vectors are L1-normalized each half-step; the normalizer is folded
    # into the NEXT scatter's coefficient, so each half-step costs exactly one
    # exchange and one tiny driver scalar (same BSP shape as HITS).

    def salsa_init(self, n_total: int) -> None:
        self.state["salsa_auth"] = np.full(len(self.verts), 1.0 / n_total)
        self.state["salsa_hub"] = np.zeros(len(self.verts))

    def salsa_hub_scatter(self, auth_sum: float, first_round: bool):
        indeg = self.rev.out_deg  # reverse layout's out-degree == in-degree
        a = self.state["salsa_auth"]
        norm = auth_sum if auth_sum > 0 else 1.0
        coef = np.where(indeg > 0, a / norm / np.maximum(indeg, 1), 0.0)
        return self.rev.per_part(self.rev.coef_scatter_sums(coef), first_round)

    def salsa_hub_apply(self, *sender_payloads) -> float:
        self._sum_apply("rev", "salsa_hub_raw", sender_payloads)
        return float(self.state["salsa_hub_raw"].sum())

    def salsa_auth_scatter(self, hub_sum: float, first_round: bool):
        outdeg = self.fwd.out_deg
        h = self.state["salsa_hub_raw"]
        norm = hub_sum if hub_sum > 0 else 1.0
        coef = np.where(outdeg > 0, h / norm / np.maximum(outdeg, 1), 0.0)
        return self.fwd.per_part(self.fwd.coef_scatter_sums(coef), first_round)

    def salsa_auth_apply(self, *sender_payloads) -> float:
        self._sum_apply("fwd", "salsa_auth_raw", sender_payloads)
        return float(self.state["salsa_auth_raw"].sum())

    def salsa_finish_round(self, hub_sum: float, auth_sum: float) -> float:
        """Store the L1-normalized vectors; T1 error on the auth side."""
        old = self.state["salsa_auth"]
        hub = self.state.pop("salsa_hub_raw")
        auth = self.state.pop("salsa_auth_raw")
        if hub_sum > 0:
            hub = hub / hub_sum
        if auth_sum > 0:
            auth = auth / auth_sum
        self.state["salsa_hub"], self.state["salsa_auth"] = hub, auth
        return float(np.abs(auth - old).sum())

    # -- ANF / HyperBall neighborhood function -------------------------------
    # Approximate Neighborhood Function (Palmer, Gibbons & Faloutsos, KDD'02)
    # with HyperLogLog counters per HyperBall (Boldi & Vigna, 2013): each
    # vertex carries a fixed-size sketch of its distance-<=t ball; one BSP
    # round unions every vertex's sketch with its neighbors' (elementwise
    # max of HLL registers / bitwise OR of exact bitmaps). Beyond-reference
    # surface (the reference has no ANF), same exchange shape as LP.
    #
    # Direction: scattering over the FORWARD layout grows each vertex's
    # IN-ball ({u : dist(u,v) <= t}); summed over all vertices that is the
    # same pair count N(t) = #{(u,v) : dist(u,v) <= t} as out-balls, so the
    # neighborhood function / effective diameter need no reverse layout.

    def anf_init_hll(self, b: int, seed: int) -> float:
        """HLL mode: (n_local, 2^b) uint8 registers seeded from each owned
        vertex's own splitmix64 hash. Returns this shard's round-0
        ball-size total as an integer count of ``ANF_HLL_QUANT`` grid
        units (see ``_anf_shard_estimate``)."""
        from cassovary_ray.hashing import splitmix64

        m = 1 << b
        h = splitmix64(self.verts.astype(np.uint64) ^ np.uint64(seed))
        j = (h >> np.uint64(64 - b)).astype(np.int64)
        w = (h << np.uint64(b)) & np.uint64((1 << 64) - 1)
        # rho = leading-zero count of the remaining 64-b bits + 1
        rho = np.full(len(w), 64 - b + 1, dtype=np.uint8)
        nz = w > 0
        bl = np.zeros(len(w), dtype=np.int64)
        v = w.copy()
        for s in (32, 16, 8, 4, 2, 1):
            big = v >= (np.uint64(1) << np.uint64(s))
            bl[big] += s
            v[big] >>= np.uint64(s)
        bl += v.astype(np.int64)
        rho[nz] = (64 - bl[nz] + 1).astype(np.uint8)
        regs = np.zeros((len(self.verts), m), dtype=np.uint8)
        regs[np.arange(len(self.verts)), j] = rho
        self._anf_regs = regs
        self._anf_mode = "hll"
        self._anf_rho_max = 64 - b + 1
        return self._anf_shard_estimate()

    def anf_init_exact(self, global_verts: pa.Table) -> float:
        """Exact-bitmap mode (small-graph / oracle scale ONLY — O(n·n/64)
        words of state across the cluster, documented): each vertex's ball
        is a bitset over the dense rank of the GLOBAL sorted vertex-id
        array. Returns this shard's round-0 ball total (== n_local)."""
        gv = global_verts["vertex"].to_numpy(zero_copy_only=False)
        bits = np.searchsorted(gv, self.verts)
        n_words = (len(gv) + 63) // 64
        regs = np.zeros((len(self.verts), n_words), dtype=np.uint64)
        regs[np.arange(len(self.verts)), bits // 64] = (
            np.uint64(1) << (bits % 64).astype(np.uint64)
        )
        self._anf_regs = regs
        self._anf_mode = "exact"
        return self._anf_shard_estimate()

    def anf_scatter(self, first_round: bool):
        """Per-dst-partition (ids, combined-register-matrix) payloads: for
        every distinct dst the elementwise max (HLL) / bitwise OR (exact) of
        its in-neighbors' sketches — the sender-side pre-combine that bounds
        a hub's fan-in to P partials. Transient memory per destination part:
        (edges-to-that-part × m) sketch bytes (the per-edge gather feeding
        reduceat); at m=64 B and 100M edges/shard over P=32 parts that is
        ~200 MB, freed between parts."""
        regs = self._anf_regs
        sc = self.fwd
        op = np.maximum if self._anf_mode == "hll" else np.bitwise_or
        out = []
        for q in range(sc.num_parts):
            lo_seg, hi_seg = sc.part_ptr[q], sc.part_ptr[q + 1]
            ids = sc.uniq_dst[lo_seg:hi_seg]
            if lo_seg == hi_seg:
                mat = np.zeros((0, regs.shape[1]), dtype=regs.dtype)
            else:
                lo, hi = sc.edge_range_for_part(q)
                per_edge = regs[sc.src_pos[lo:hi]]
                mat = op.reduceat(per_edge, sc.seg_starts[lo_seg:hi_seg] - lo,
                                  axis=0)
            out.append((ids, mat) if first_round else mat)
        return out

    def anf_apply(self, *sender_payloads) -> tuple[int, float]:
        """Union incoming sketches into the owned rows; returns (#rows whose
        sketch grew, this shard's post-round ball-size total). A row's
        sketch is monotone non-decreasing, so changed==0 everywhere means
        every ball is saturated (t >= eccentricity bound)."""
        regs = self._anf_regs
        op = np.maximum if self._anf_mode == "hll" else np.bitwise_or
        changed = 0
        for sender, payload in enumerate(sender_payloads):
            p = payload[self.part]
            if isinstance(p, tuple):
                ids, mat = p
                pos = self._positions("anf", sender, ids)
            else:
                mat = p
                pos = self._positions("anf", sender, None)
            if len(mat):
                sub = regs[pos]
                new = op(sub, mat)
                changed += int(np.count_nonzero(np.any(new != sub, axis=1)))
                regs[pos] = new
        return changed, self._anf_shard_estimate()

    def _anf_shard_estimate(self):
        """Exact mode: float popcount total. HLL mode: the shard's ball-size
        total as an exact INTEGER count of 2^-20 grid units (floor-quantized
        per vertex, see ``ANF_HLL_QUANT``) so the driver's cross-shard sum is
        order-independent and SQL-reproducible."""
        regs = self._anf_regs
        if len(regs) == 0:
            return 0.0 if self._anf_mode == "exact" else 0
        if self._anf_mode == "exact":
            # popcount per row: exact ball sizes
            bytes_view = regs.view(np.uint8)
            return float(np.unpackbits(bytes_view, axis=1).sum())
        est = hll_estimates(regs, self._anf_rho_max)
        return int(np.floor(est * ANF_HLL_QUANT).astype(np.int64).sum())

    def anf_ball_table(self) -> pa.Table:
        """(vertex, ball) — per-vertex in-ball size (exact) / HLL estimate."""
        regs = self._anf_regs
        if self._anf_mode == "exact":
            sizes = np.unpackbits(regs.view(np.uint8), axis=1).sum(axis=1)
            col = pa.array(sizes.astype(np.int64), pa.int64())
        else:
            col = pa.array(hll_estimates(regs, self._anf_rho_max), pa.float64())
        return pa.table({"vertex": pa.array(self.verts, pa.int64()),
                         "ball": col})


# ---------------------------------------------------------------------------
# Driver-side engine
# ---------------------------------------------------------------------------


@dataclass
class RoundMetrics:
    """Per-round lineage/metrics record (SURVEY §4: checkpoint/resume row)."""

    iteration: int
    error: float
    wall_s: float
    extra: dict = field(default_factory=dict)


class ShardedGraph:
    """P CSR shard actors over a partitioned edge layout + round drivers.

    ``iterate-until-converged`` semantics cloned from ``LinkAnalysis.run``
    (``LinkAnalysis.scala:87-109``): initial error = 100 + tolerance, stop
    when ``iteration >= max_iterations or error <= tolerance``.
    """

    def __init__(self, layout_dir: str, *, reverse_layout_dir: str | None = None,
                 shard_cpus: float = 0.0, csr_cache: bool = True,
                 exchange_groups: int | None = None,
                 exchange_precision: str = "f64"):
        self.layout_dir = layout_dir
        self.has_reverse = reverse_layout_dir is not None
        man = read_layout_manifest(layout_dir)
        self.num_parts = man["num_parts"]
        self.n_vertices = man["n_vertices"]
        self.n_edges = man["n_edges"]
        self.undirected = bool(man.get("undirected", False))
        self.dedup = bool(man.get("dedup", False))
        # per-NODE payload packing (see GraphShard.__init__): G = number of
        # receiver groups for the PageRank exchange. None → one group per
        # ALIVE Ray node, so a single-node box keeps the classic one packed
        # object while a real cluster ships each node only its share. The
        # co-location assumption (group g's shards on one node) needs a
        # placement-group strategy on a real cluster; grouping is correct
        # (same results) regardless of placement.
        if exchange_groups is None:
            try:
                exchange_groups = max(
                    1, len([n for n in ray.nodes() if n.get("Alive")]))
            except Exception:
                exchange_groups = 1
        self.exchange_groups = max(1, min(exchange_groups, self.num_parts))
        # float-payload ship precision: "f32" halves exchange bytes/round
        # (the multi-node network lever; see GraphShard.__init__). Keep the
        # default "f64" for golden-vector-exact results; "f32" is safe for
        # any tolerance ≥ 1e-6 (partials carry ~2^-24 relative error).
        self.exchange_precision = exchange_precision
        # shard_cpus=0 by default: the pool is BSP-driven (exactly P actors
        # compute per phase, P is sized to the cluster by the caller), and a
        # full reservation deadlocks any Ray Data stage sharing the cluster
        # (e.g. the metadata tasks behind from_arrow_refs). SPREAD places one
        # shard per node on a real cluster.
        self.shards = [
            GraphShard.options(num_cpus=shard_cpus, scheduling_strategy="SPREAD").remote(
                p, self.num_parts, layout_dir, reverse_layout_dir, csr_cache,
                self.exchange_groups, exchange_precision
            )
            for p in range(self.num_parts)
        ]
        # force construction + surface build errors early
        counts = ray.get([s.counts.remote() for s in self.shards])
        self.n_dangling = sum(c[2] for c in counts)
        if self.n_vertices is None:
            self.n_vertices = sum(c[0] for c in counts)
        self.metrics: list[RoundMetrics] = []
        from cassovary_ray.labels import NodeLabels

        #: named typed per-node label columns (graph/labels/Labels.scala:19-36)
        self.labels = NodeLabels()

    # -- node labels (DirectedGraph.labelOfNode, DirectedGraph.scala:74-77) --

    def attach_label(self, name: str, ds) -> None:
        """Register a named ``Dataset(vertex, label)`` column (int or string,
        LabelsReader.scala:32-35)."""
        self.labels.add(name, ds)

    def label_of_node(self, name: str, vertex_id: int, expected_type: str | None = None):
        return self.labels.label_of_node(name, vertex_id, expected_type)

    def shutdown(self) -> None:
        """Kill the shard actors, releasing their CPU reservations.

        Results returned as Datasets stay valid (the Arrow tables live in the
        object store, owned by refs the Dataset holds). Call this (or use the
        ``with`` form) before building another ShardedGraph in the same
        session — idle actors still reserve ``shard_cpus`` each.
        """
        for s in self.shards:
            ray.kill(s)
        self.shards = []

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.shutdown()
        return False

    # -- helpers -----------------------------------------------------------

    def _state_dataset(self, name: str, column: str):
        import ray.data

        refs = [s.get_state_table.remote(name, column) for s in self.shards]
        return ray.data.from_arrow_refs(refs)

    def _check_f32_convergence(self, max_iterations, tolerance,
                               state_l1_bound: float = 1.0) -> None:
        """Refuse an UNBOUNDED tolerance loop the f32 exchange cannot
        certify: float32 ship quantization floors the round-to-round T1
        delta around ‖shipped state‖₁·2⁻²⁴, so an f32 run driven to a
        tighter tolerance with no iteration cap can oscillate below the
        floor forever (caught live by the end-to-end verify drive: g6 at
        the default tol=1e-8 never converged). ``state_l1_bound`` is an
        upper bound on the L1 norm of the shipped float state: 1.0 (the
        default) for L1-normalized loops (PageRank, PPR, SALSA — Σ=1 by
        construction), ``n_vertices`` for loops whose per-vertex values are
        only bounded by a constant (HITS max-rescale, Katz, user programs);
        the certified floor — and hence the refusal threshold — scales with
        it (1e-7 ≈ 1.7·2⁻²⁴ certifies the bound-1 case)."""
        threshold = 1e-7 * max(1.0, float(state_l1_bound))
        if (self.exchange_precision == "f32" and max_iterations is None
                and tolerance is not None and tolerance < threshold):
            raise ValueError(
                "exchange_precision='f32' cannot certify convergence below "
                f"{threshold:g} T1 error for this loop's state norm "
                f"(‖state‖₁ ≤ {state_l1_bound:g}; requested "
                f"tolerance={tolerance:g} with max_iterations=None); raise "
                "the tolerance, bound max_iterations, or use the default "
                "exchange_precision='f64'")

    def _exchange(self, scatter_method: str, apply_method: str, first_round: bool,
                  scatter_args=(), apply_args=()):
        """One scatter/apply exchange; returns ray.get of all apply results.

        Each scatter call returns a LIST of P ObjectRefs (payload q owned by
        the sending shard's worker); the driver only reshuffles the tiny ref
        lists, and each apply pulls its P payload objects directly from the
        senders (no driver-mediated data movement)."""
        P = self.num_parts
        outs = [
            getattr(s, scatter_method).remote(*scatter_args)
            if scatter_method in ("lp_scatter", "bila_contrib_scatter")
            else getattr(s, scatter_method).remote(*scatter_args, first_round)
            for s in self.shards
        ]
        # every apply receives all P packed payload lists (top-level args →
        # auto-resolved, zero-copy plasma reads) and slices its own part
        applies = [
            getattr(self.shards[q], apply_method).remote(*apply_args, *outs)
            for q in range(P)
        ]
        return ray.get(applies)

    # -- PageRank ----------------------------------------------------------

    def pagerank(
        self,
        *,
        damping: float = 0.85,
        max_iterations: int | None = 10,
        tolerance: float = 1e-8,
        checkpoint_dir: str | None = None,
        checkpoint_every: int = 5,
        resume: bool = False,
        warm_start_dir: str | None = None,
        delta_filter: float | None = None,
    ):
        """Distributed PageRank, semantics cloned from ``PageRank.scala:80-113``
        (defaults d=0.85, maxIter=10, tol=1e-8 per ``PageRank.scala:28-31``).

        ``delta_filter``: enable the incremental (delta-filtered) exchange —
        classic incremental PageRank: receivers keep an accumulator and
        senders ship only pending contribution changes, filtered per round
        so the entries WITHHELD carry at most fraction ``delta_filter`` of
        that round's pending L1 mass (``_energy_cut``: the per-destination
        delta distribution is heavy-tailed, so a small energy budget drops
        most ENTRIES while ≥ (1-φ) of the update mass still flows, and
        exchange bytes decay with convergence instead of staying O(distinct
        dst) per round). Withheld residue accumulates sender-side and
        convergence is only certified on a FLUSH round (all pending
        shipped), so the stop criterion is exactly the vanilla one: a full
        update moved ≤ ``tolerance`` in T1. Requires ``tolerance``.
        Suggested value 1e-3. Off (None) by default — the vanilla exchange
        stays bit-identical to previous rounds.

        Per round: dangling mass ``d·Σ_dangling r(v)/n`` (``:93``), scatter
        ``d·r(u)/outdeg(u)`` to out-neighbors, every existing vertex adds
        ``dangleSum + (1-d)/n`` (``:104-109``), T1 error vs previous (``:112``).
        Returns ``Dataset(vertex, rank)``.

        ``warm_start_dir``: a PRIOR run's checkpoint dir (possibly from a
        layout since delta-updated by ``layout.update_edge_layout``) seeds
        the initial ranks instead of 1/n — the incremental-recrawl path:
        the power iteration's fixpoint is unique and attracts any start,
        so a near-converged seed cuts iterations-to-tolerance roughly in
        proportion to how small the delta was. Requires the same partition
        count (``vertex % P`` is the stable key); seeds are rescaled to
        Σ=1 globally. Ignored when ``resume`` finds a checkpoint of THIS
        run."""
        self._check_f32_convergence(max_iterations, tolerance)
        n = self.n_vertices
        delta_abs = 0.0
        if delta_filter is not None and delta_filter > 0:
            if tolerance is None:
                raise ValueError(
                    "delta_filter requires a tolerance: the flush-certified "
                    "stop needs a convergence target")
            delta_abs = float(delta_filter)
            U = sum(ray.get([s.pr_uniq_entries.remote()
                             for s in self.shards]))
            # absolute skip floor: entries below it can move the T1 by at
            # most 0.5·tolerance even if ALL U of them are withheld — it
            # clears DIFFUSE pending fields the RELATIVE energy cut ships
            # (a warm start's leftover convergence error spreads ~tol/U
            # per entry over every entry; f32 cast residue likewise), which
            # is what makes incremental recrawls sparse. The flush-
            # certified stop keeps the guarantee exact regardless: at worst
            # the withheld mass surfaces in one extra flush round. Fixed
            # 0.5 budget, independent of delta_filter, so a tiny φ still
            # clears noise floors.
            delta_floor = 0.5 * tolerance / max(1, U)
        else:
            delta_floor = 0.0
        iteration, error = 0, 100.0 + tolerance
        dangle_total = None
        if resume and checkpoint_dir:
            ck = latest_checkpoint(checkpoint_dir)
            if ck is not None:
                iteration = ck["iteration"]
                error = ck["error"]
                if delta_abs > 0.0:
                    # a checkpoint written at a FILTERED round records the
                    # shipped-only T1, which can sit below tolerance while
                    # withheld residue remains (extreme case: a round that
                    # shipped nothing records ~0). Never let a stale
                    # uncertified error stop the resumed loop before its
                    # own flush-certified check runs — the bootstrap
                    # rebase is a flush, so one round re-certifies.
                    error = 100.0 + tolerance
                paths = {rec["part"]: rec["path"] for rec in ck["lineage"]}
                ray.get([
                    s.load_state.remote("rank", "rank", paths[p])
                    for p, s in enumerate(self.shards)
                ])
                dangle_total = sum(ray.get([s.pr_dangling_sum.remote() for s in self.shards]))
        if dangle_total is None and warm_start_dir:
            ck = latest_checkpoint(warm_start_dir)
            if ck is not None:
                # the manifest records both the partition count and the
                # checkpointed column; a smaller-P checkpoint would pass a
                # bare subset check yet seed only the coinciding vertices,
                # and a non-PageRank checkpoint (e.g. WCC) would KeyError
                # deep inside an actor — reject both up front (ADVICE r3)
                if ck.get("num_parts") != self.num_parts:
                    raise ValueError(
                        f"warm_start_dir checkpoint was written with "
                        f"num_parts={ck.get('num_parts')} but this layout "
                        f"has {self.num_parts} — the vertex % P key must "
                        "match for checkpoint reuse")
                if ck.get("column") != "rank":
                    raise ValueError(
                        "warm_start_dir checkpoint holds column "
                        f"{ck.get('column')!r} (name={ck.get('name')!r}), "
                        "not a PageRank 'rank' checkpoint")
                paths = {rec["part"]: rec["path"] for rec in ck["lineage"]}
                sums = ray.get([
                    s.pr_warm_init.remote(n, paths.get(p))
                    for p, s in enumerate(self.shards)
                ])
                total = sum(sums)
                if total > 0:
                    ray.get([s.scale_state.remote("rank", 1.0 / total)
                             for s in self.shards])
                dangle_total = total
        if dangle_total is None:
            dangle_total = sum(ray.get([s.pr_init.remote(n) for s in self.shards]))

        del dangle_total  # dangling mass travels inside the payloads now
        stop = (max_iterations is not None and iteration >= max_iterations) or error <= tolerance
        # grouped exchange: pr_round returns G payload objects + 1 stats;
        # receiver q only ever holds refs to (and hence pulls) its own
        # group's 1/G share of each sender's payload
        G = self.exchange_groups
        b = [g * self.num_parts // G for g in range(G + 1)]
        group_of = [next(g for g in range(G) if b[g] <= q < b[g + 1])
                    for q in range(self.num_parts)]
        if not stop:
            # bootstrap superstep: scatter from the initial/loaded ranks
            # (under delta_filter this rebases the incremental state and
            # ships the full sums — itself a flush)
            outs = [
                s.pr_round.options(num_returns=G + 1).remote(
                    damping, n, True, delta_abs, True, delta_floor)
                for s in self.shards
            ]
        prev_scatter_flush = True  # the bootstrap scatter ships everything
        flush_next = False
        while not stop:
            t0 = time.perf_counter()
            outs = [
                self.shards[q].pr_round.options(num_returns=G + 1).remote(
                    damping, n, False, delta_abs, flush_next, delta_floor,
                    *[o[group_of[q]] for o in outs])
                for q in range(self.num_parts)
            ]
            # the payloads applied this round came from the PREVIOUS call's
            # scatter: only a post-flush T1 certifies convergence (zero
            # withheld residue → exactly the vanilla stop criterion)
            applied_flush = prev_scatter_flush
            prev_scatter_flush = flush_next
            stats = ray.get([o[G] for o in outs])
            error = sum(st[0] for st in stats)
            iteration += 1
            wall = time.perf_counter() - t0
            extra = {"algo": "pagerank",
                     "max_apply_s": round(max(st[1] for st in stats), 3),
                     "max_scatter_s": round(max(st[2] for st in stats), 3),
                     "task_spread_s": round(max(st[3] for st in stats) - min(st[3] for st in stats), 3),
                     "exchange_mb": round(sum(st[4] for st in stats) / 1e6, 3),
                     "exchange_groups": G,
                     "exchange_objects": self.num_parts * G}
            if delta_abs > 0.0:
                extra["delta_filter"] = delta_filter
                extra["flush_round"] = applied_flush
            self.metrics.append(RoundMetrics(iteration, error, wall, extra))
            converged = tolerance is not None and error <= tolerance
            true_conv = converged and (delta_abs == 0.0 or applied_flush)
            stop = (max_iterations is not None
                    and iteration >= max_iterations) or true_conv
            flush_next = delta_abs > 0.0 and converged and not true_conv
            if checkpoint_dir and (iteration % checkpoint_every == 0 or stop):
                self._write_checkpoint(checkpoint_dir, "rank", "rank", iteration, error)
        return self._state_dataset("rank", "rank")

    def personalized_pagerank(self, seeds: dict[int, float], *,
                              damping: float = 0.85,
                              max_iterations: int | None = 10,
                              tolerance: float = 1e-8):
        """Exact Personalized PageRank by power iteration over the seed
        distribution (normalized to Σ=1). Deterministic counterpart of the
        reference's Monte-Carlo ``calculatePersonalizedReputation``
        (``GraphUtils.scala:142-154``); round semantics follow
        ``PageRank.scala:85-113`` with the reset/dangling mass redirected to
        the seeds. Returns ``Dataset(vertex, rank)``."""
        self._check_f32_convergence(max_iterations, tolerance)
        if not seeds:
            raise ValueError("personalized_pagerank needs at least one seed")
        total = float(sum(seeds.values()))
        if total <= 0:
            raise ValueError("seed weights must sum to a positive value")
        seed_table = pa.table({
            "vertex": pa.array(list(seeds.keys()), pa.int64()),
            "weight": pa.array([w / total for w in seeds.values()], pa.float64()),
        })
        ray.get([s.ppr_init.remote(seed_table) for s in self.shards])
        iteration, error = 0, 100.0 + tolerance
        stop = (max_iterations is not None and iteration >= max_iterations) or error <= tolerance
        if not stop:
            outs = [
                s.ppr_round.options(num_returns=2).remote(damping, True)
                for s in self.shards
            ]
            payloads = [o[0] for o in outs]
        while not stop:
            t0 = time.perf_counter()
            outs = [
                s.ppr_round.options(num_returns=2).remote(damping, False, *payloads)
                for s in self.shards
            ]
            payloads = [o[0] for o in outs]
            stats = ray.get([o[1] for o in outs])
            error = sum(st[0] for st in stats)
            iteration += 1
            self.metrics.append(RoundMetrics(
                iteration, error, time.perf_counter() - t0, {"algo": "ppr"}))
            stop = (max_iterations is not None and iteration >= max_iterations) or error <= tolerance
        return self._state_dataset("rank", "rank")

    def _write_checkpoint(self, ckpt_dir: str, name: str, column: str,
                          iteration: int, error: float) -> None:
        tag = f"round{iteration:06d}"
        lineage = ray.get([
            s.checkpoint_state.remote(name, column, os.path.join(ckpt_dir, tag), tag)
            for s in self.shards
        ])
        manifest = {
            "iteration": iteration,
            "error": error,
            "name": name,
            "column": column,
            "num_parts": self.num_parts,
            "lineage": lineage,
        }
        tmp = os.path.join(ckpt_dir, f".manifest-{tag}.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, os.path.join(ckpt_dir, f"manifest-{tag}.json"))

    # -- WCC ---------------------------------------------------------------

    def weakly_connected_components(self, max_iterations: int | None = None,
                                    *, checkpoint_dir: str | None = None,
                                    checkpoint_every: int = 5, resume: bool = False):
        """Hash-min WCC on an **undirected** layout (build with
        ``undirected=True``); component id = min vertex id (FIXTURES §4).
        Exact, integer-only; rounds are idempotent min-reductions, so a
        resumed run converges to the identical fixpoint from any checkpoint.
        Returns ``Dataset(vertex, component)``."""
        if not self.undirected:
            raise ValueError(
                "weakly_connected_components needs a layout built with "
                "undirected=True (this one's manifest says undirected=False; "
                "on a directed layout min-labels only flow along edge "
                "direction and the result is not the weak components)"
            )
        iteration = self._init_or_resume(
            "comp", "component", checkpoint_dir, resume,
            lambda: ray.get([s.wcc_init.remote() for s in self.shards]),
        )
        first = True
        while True:
            t0 = time.perf_counter()
            changed = sum(self._exchange("wcc_scatter", "wcc_apply", first))
            first = False
            iteration += 1
            self.metrics.append(
                RoundMetrics(iteration, float(changed), time.perf_counter() - t0, {"algo": "wcc"})
            )
            done = changed == 0 or (max_iterations is not None and iteration >= max_iterations)
            if checkpoint_dir and (iteration % checkpoint_every == 0 or done):
                self._write_checkpoint(checkpoint_dir, "comp", "component", iteration, float(changed))
            if done:
                break
        return self._state_dataset("comp", "component")

    def topological_layers(self):
        """Longest-path layer per vertex on a DAG (= Kahn peel depth:
        layer(v) = max over in-edges of layer(u)+1, 0 at sources) by
        Bellman-Ford max-plus supersteps — the distributed topological sort
        (vertices ordered by (layer, id)). Raises ValueError if the graph
        has a cycle (a layer reaches |V|, impossible on a DAG — the rounds
        double as cycle detection). Returns ``Dataset(vertex, layer)``."""
        ray.get([s.topo_init.remote() for s in self.shards])
        n = self.n_vertices
        first = True
        iteration = 0
        while True:
            t0 = time.perf_counter()
            rets = self._exchange("topo_scatter", "topo_apply", first)
            first = False
            iteration += 1
            changed = sum(r[0] for r in rets)
            max_layer = max(r[1] for r in rets)
            self.metrics.append(RoundMetrics(
                iteration, float(changed), time.perf_counter() - t0,
                {"algo": "topo", "max_layer": max_layer}))
            if max_layer >= n:
                raise ValueError(
                    "topological_layers: graph has a cycle (longest-path "
                    f"layer reached |V|={n})")
            if changed == 0:
                break
        return self._state_dataset("layer", "layer")

    def _init_or_resume(self, name: str, column: str, checkpoint_dir: str | None,
                        resume: bool, init_fn) -> int:
        """Load the newest complete checkpoint (if resuming) or run init_fn;
        returns the starting iteration number."""
        if resume and checkpoint_dir:
            ck = latest_checkpoint(checkpoint_dir)
            if ck is not None and ck.get("name") == name:
                paths = {rec["part"]: rec["path"] for rec in ck["lineage"]}
                ray.get([
                    s.load_state.remote(name, column, paths[p])
                    for p, s in enumerate(self.shards)
                ])
                return ck["iteration"]
        init_fn()
        return 0

    def eigenvector_centrality(self, *, max_iterations: int = 30,
                               tolerance: float | None = 1e-10):
        """Eigenvector centrality by power iteration on Aᵀ (in-edge
        prestige, the PageRank-without-damping limit): x̂ ← Aᵀx̂ / ‖Aᵀx̂‖₂
        from x̂₀ ∝ 1. Converges to the principal eigenvector when the graph's
        reachable core is aperiodic; stops at ``max_iterations`` or when
        ‖Δx̂‖₁ ≤ ``tolerance``. Vertices with no in-paths from the core get
        0. Beyond the reference (its users run PageRank instead); returns
        ``Dataset(vertex, eig)``."""
        sq = sum(ray.get([s.eig_init.remote() for s in self.shards]))
        inv = 1.0 / np.sqrt(sq)
        outs = [s.eig_scatter.options(num_returns=2).remote(inv, True)
                for s in self.shards]
        payloads = [o[0] for o in outs]
        ray.get([o[1] for o in outs])
        tol = -1.0 if tolerance is None else tolerance
        for it in range(max_iterations):
            t0 = time.perf_counter()
            sq = sum(ray.get([s.eig_apply.remote(*payloads) for s in self.shards]))
            if sq == 0.0:
                break  # no edges: zero vector, normalization undefined
            inv = 1.0 / np.sqrt(sq)
            outs = [s.eig_scatter.options(num_returns=2).remote(inv, False)
                    for s in self.shards]
            payloads = [o[0] for o in outs]
            err = sum(ray.get([o[1] for o in outs]))
            self.metrics.append(RoundMetrics(
                it + 1, err, time.perf_counter() - t0, {"algo": "eigenvector"}))
            if err <= tol:
                break
        ray.get([s.eig_finalize.remote(inv) for s in self.shards])
        return self._state_dataset("eig", "eig")

    def katz(self, *, alpha: float = 0.1, beta: float = 1.0,
             max_iterations: int | None = 10, tolerance: float | None = None):
        """Katz centrality ``x = Σ_{k≥0} α^k (Aᵀ)^k β·1`` truncated at
        ``max_iterations`` terms (or until T1 change ≤ ``tolerance``):
        ``x_{t+1}(v) = β + α Σ_{u→v} x_t(u)``. Convergence of the full
        series requires α < 1/λ_max; the truncated sum is well-defined for
        any α (Katz 1953 status index — the attenuation-factor sibling of
        PageRank the reference leaves to its users). Beyond the reference.
        Returns ``Dataset(vertex, katz)``."""
        if max_iterations is None and tolerance is None:
            raise ValueError("katz: max_iterations=None requires a tolerance "
                             "(otherwise the loop has no stopping condition)")
        # Katz state is unnormalized (x ≥ β per vertex): ‖state‖₁ scales
        # with n, so the f32 floor does too — conservative n bound
        self._check_f32_convergence(max_iterations, tolerance,
                                    state_l1_bound=float(self.n_vertices))
        ray.get([s.katz_init.remote(beta) for s in self.shards])
        tol = -1.0 if tolerance is None else tolerance
        iteration, error = 0, float("inf")
        stop = max_iterations is not None and iteration >= max_iterations
        if not stop:
            outs = [s.katz_round.options(num_returns=2).remote(alpha, beta, True)
                    for s in self.shards]
            payloads = [o[0] for o in outs]
        while not stop:
            t0 = time.perf_counter()
            outs = [
                s.katz_round.options(num_returns=2).remote(
                    alpha, beta, False, *payloads)
                for s in self.shards
            ]
            payloads = [o[0] for o in outs]
            stats = ray.get([o[1] for o in outs])
            error = sum(st[0] for st in stats)
            iteration += 1
            self.metrics.append(RoundMetrics(
                iteration, error, time.perf_counter() - t0, {"algo": "katz"}))
            stop = (max_iterations is not None and iteration >= max_iterations) \
                or error <= tol
        return self._state_dataset("katz", "katz")

    def run_program(self, program, *, max_iterations: int | None = 10,
                    tolerance: float | None = None):
        """Run a user :class:`cassovary_ray.rounds.VertexProgram` to the
        standard stop rule (``iteration >= max_iterations or error <=
        tolerance``, ``LinkAnalysis.scala:87-109``) — the documented way to
        add an iterative algorithm WITHOUT editing ``GraphShard``. The
        engine owns the distributed machinery (CSR shards, packed plasma
        exchange, per-round :class:`RoundMetrics` lineage); the program owns
        only pure-numpy per-shard math. See ``rounds.py`` for the protocol
        and a worked Katz example (engine-parity tested).
        Returns ``Dataset(vertex, program.output_column)``."""
        if max_iterations is None and tolerance is None:
            raise ValueError("run_program: max_iterations=None requires a "
                             "tolerance (no stopping condition otherwise)")
        if program.combine not in ("sum", "min", "max"):
            raise ValueError(f"unknown combine {program.combine!r}")
        # under exchange_precision="f32" every FLOAT payload ships
        # quantized: sum-combine programs get the unbounded-tolerance guard
        # (quantization floors the T1 delta); min/max-combine programs stay
        # monotone and terminate, but float state is then f32-approximate.
        if program.combine == "sum":
            # user program: state norm unknown — conservative n bound
            self._check_f32_convergence(max_iterations, tolerance,
                                        state_l1_bound=float(self.n_vertices))
        blob = _pickle_by_value(program)
        ray.get([s.vp_init.remote(blob, self.n_vertices)
                 for s in self.shards])
        tol = -1.0 if tolerance is None else tolerance
        iteration, error = 0, float("inf")
        algo = f"program:{type(program).__name__}"
        stop = max_iterations is not None and iteration >= max_iterations
        if not stop:
            outs = [s.vp_round.options(num_returns=2).remote(True)
                    for s in self.shards]
            payloads = [o[0] for o in outs]
        while not stop:
            t0 = time.perf_counter()
            outs = [s.vp_round.options(num_returns=2).remote(False, *payloads)
                    for s in self.shards]
            payloads = [o[0] for o in outs]
            stats = ray.get([o[1] for o in outs])
            error = sum(st[0] for st in stats)
            iteration += 1
            self.metrics.append(RoundMetrics(
                iteration, error, time.perf_counter() - t0,
                {"algo": algo,
                 "exchange_mb": sum(st[4] for st in stats) / 2**20}))
            stop = (max_iterations is not None and iteration >= max_iterations) \
                or error <= tol
        ray.get([s.vp_post.remote() for s in self.shards])
        return self._state_dataset(program.state_name, program.output_column)

    def sssp(self, sources, *, max_iterations: int | None = None,
             checkpoint_dir: str | None = None, checkpoint_every: int = 5,
             resume: bool = False):
        """Single/multi-source shortest paths by synchronous Bellman-Ford
        relaxation (min-plus supersteps on the same scatter machinery as
        :meth:`weakly_connected_components`): per round,
        ``dist(v) ← min(dist(v), min over u→v of dist(u) + w(u,v))`` with
        ``w ≡ 1`` on unweighted layouts (hop distance = BFS levels).
        Weighted layouts require strictly positive weights (enforced at
        layout build), so the relaxation converges in ≤ |V| rounds with no
        negative-cycle cases. Rounds are idempotent min-reductions, so a
        resumed run converges to the identical fixpoint from any checkpoint
        (the same lineage/manifest discipline as WCC). Distances are exact
        left-fold float sums along each path — deterministic at any
        parallelism (min of identical candidate sets). Under
        ``exchange_precision="f32"`` shipped distance candidates are
        float32-quantized (~1e-7 relative); the min-reduction stays
        monotone so convergence is unaffected, but distances are then
        f32-approximate — keep the default f64 when exact distances matter.

        ``sources``: iterable of vertex ids (distance 0) or a
        ``{vertex: starting_distance}`` mapping. Returns
        ``Dataset(vertex, dist)`` over REACHED vertices only.
        """
        import ray.data

        if isinstance(sources, dict):
            items = sorted((int(k), float(v)) for k, v in sources.items())
        else:
            items = sorted((int(v), 0.0) for v in set(sources))
        if not items:
            raise ValueError("sssp needs at least one source vertex")
        seed_table = pa.table({
            "vertex": pa.array([i[0] for i in items], pa.int64()),
            "dist": pa.array([i[1] for i in items], pa.float64()),
        })
        iteration = self._init_or_resume(
            "dist", "dist", checkpoint_dir, resume,
            lambda: ray.get([s.sssp_init.remote(seed_table) for s in self.shards]),
        )
        first = True
        while True:
            t0 = time.perf_counter()
            changed = sum(self._exchange("sssp_scatter", "sssp_apply", first))
            first = False
            iteration += 1
            self.metrics.append(
                RoundMetrics(iteration, float(changed), time.perf_counter() - t0,
                             {"algo": "sssp"})
            )
            done = changed == 0 or (max_iterations is not None and iteration >= max_iterations)
            if checkpoint_dir and (iteration % checkpoint_every == 0 or done):
                self._write_checkpoint(checkpoint_dir, "dist", "dist", iteration,
                                       float(changed))
            if done:
                break

        def finite_only(batch: pa.Table) -> pa.Table:
            d = batch["dist"].to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(np.isfinite(d)))

        return self._state_dataset("dist", "dist").map_batches(
            finite_only, batch_format="pyarrow")

    # -- Label propagation -------------------------------------------------

    def label_propagation(self, *, seeds=None, max_iterations: int = 20,
                          checkpoint_dir: str | None = None,
                          checkpoint_every: int = 5, resume: bool = False):
        """Synchronous LP over an undirected **dedup'd** layout (build with
        ``undirected=True, dedup=True`` — votes are per neighbor, not per
        parallel edge, and a mutual edge stored twice would outvote the
        self-vote and reintroduce 2-cycle oscillation): new label = mode of
        labeled-neighbor labels + a self-vote, ties → smallest label
        (FIXTURES §4 LP rules); seeds (``Dataset(vertex,label)``) are clamped;
        runs until fixpoint or ``max_iterations``. Returns
        ``Dataset(vertex, label)``."""
        if not (self.undirected and self.dedup):
            raise ValueError(
                "label_propagation needs a layout built with undirected=True "
                "AND dedup=True (manifest says undirected="
                f"{self.undirected}, dedup={self.dedup}); duplicate mutual "
                "edges outvote the self-vote and reintroduce the 2-cycle "
                "label oscillation"
            )
        if isinstance(seeds, str):
            # seed from a named attached label (int-typed; Labels.get check)
            name = seeds
            seeds = self.labels.get(name, expected_type="int")
            if seeds is None:
                raise KeyError(f"no attached label named {name!r}")
        seed_tables = None
        if seeds is not None:
            seed_tables = [b for b in seeds.iter_batches(batch_format="pyarrow", batch_size=1 << 20)]
        iteration = self._init_or_resume(
            "label", "label", checkpoint_dir, resume,
            lambda: ray.get([s.lp_init.remote(seed_tables) for s in self.shards]),
        )
        if resume and iteration > 0:
            # clamp masks are not checkpointed; rebuild them from the seeds
            ray.get([s.lp_restore_clamps.remote(seed_tables) for s in self.shards])
        while iteration < max_iterations:
            t0 = time.perf_counter()
            changed = sum(self._exchange("lp_scatter", "lp_apply", False))
            iteration += 1
            self.metrics.append(
                RoundMetrics(iteration, float(changed), time.perf_counter() - t0, {"algo": "lp"})
            )
            done = changed == 0 or iteration >= max_iterations
            if checkpoint_dir and (iteration % checkpoint_every == 0 or done):
                self._write_checkpoint(checkpoint_dir, "label", "label", iteration, float(changed))
            if done:
                break
        return self._state_dataset("label", "label")

    # -- HITS --------------------------------------------------------------

    def random_walks(self, starts: list[int] | dict[int, int], num_steps: int,
                     *, reset_prob: float = 0.0, seed: int = 1,
                     max_out_deg: int | None = None, track_prev: bool = False,
                     track_paths: bool = False,
                     filter_home_by_num_edges: bool = False):
        """Monte-Carlo random walks → visit counts.

        ``GraphUtils.randomWalk`` semantics (``GraphUtils.scala:106-130`` via
        ``RandomBoundedTraverser``, ``Traverser.scala:75-136``): ``num_steps``
        visits per walker; each step resets to the walker's start vertex with
        probability ``reset_prob``, on a dangling vertex, or on a hub with
        out-degree > ``max_out_deg`` (the reference's power-law pruning,
        ``RandomWalkParams.maxNumEdgesThresh``). ``starts`` is a list of start
        vertices (walker i starts at starts[i]) or {walker_id: start}.
        Counter-based RNG on (seed, walker, step) makes the result identical
        at any partition count. Returns ``Dataset(vertex, visits)`` sorted
        desc by visits (``VisitsCounter`` output order, tie = lower id,
        ``VisitsCounter.scala:61-76``).
        """
        import ray.data

        if isinstance(starts, dict):
            wid = np.array(sorted(starts), dtype=np.int64)
            st = np.array([starts[w] for w in wid], dtype=np.int64)
        else:
            wid = np.arange(len(starts), dtype=np.int64)
            st = np.asarray(starts, dtype=np.int64)
        ray.get([s.walk_reset_counts.remote() for s in self.shards])
        dropped = sum(ray.get([
            s.walk_seed.remote(wid, st, track_prev, track_paths, filter_home_by_num_edges)
            for s in self.shards
        ]))
        if dropped:
            import logging

            logging.getLogger(__name__).warning(
                "random_walks: dropped %d walker(s) whose start vertex is not "
                "in the graph (GraphUtils.scala:110-113 existsNodeId check)",
                dropped,
            )
        P = self.num_parts
        # per step: every shard advances its walkers; payload q of shard p
        # feeds shard q next step. Chained by object refs, one barrier per
        # step (num_returns=P, same pattern as _exchange).
        # packed exchange (see _Scatter.per_part): outs[p] is ONE ref to
        # sender p's per-part payload list; next step every shard receives
        # all refs and slices its own part
        outs = []
        for step in range(num_steps):
            last = step == num_steps - 1
            outs = [
                s.walk_step.remote(step, seed, reset_prob, max_out_deg, last, *outs)
                for s in self.shards
            ]
        ray.get(outs)  # drain final step
        return ray.data.from_arrow_refs(
            self.walk_visit_refs()
        ).sort(["visits", "vertex"], descending=[True, False])

    def walk_visit_refs(self) -> list:
        """Per-shard ``(vertex, visits)`` Arrow-table refs of the LAST walk
        run — the raw form of :meth:`random_walks`' result, used by the
        serving layer (`serve.GraphServer`) to answer per-request walks
        without spinning up a Ray Data plan per request."""
        return [s.walk_visits_table.remote() for s in self.shards]

    def walk_corpus(self, *, walks_per_vertex: int = 1, walk_length: int = 10,
                    seed: int = 1, reset_prob: float = 0.0,
                    max_out_deg: int | None = None,
                    output: str = "long"):
        """DeepWalk-style training corpus (Perozzi et al. 2014):
        ``walks_per_vertex`` fixed-length unbiased random walks started at
        EVERY vertex, returned in long format
        ``Dataset(walker_id, walk, step, vertex)`` where walker_id is the
        start vertex and walk ∈ [0, walks_per_vertex) — ready to be
        ``groupby(walker_id, walk).sort(step)``-assembled into sequences or
        windowed directly for skip-gram pair generation.

        Scale shape: seeding is shard-local (``walk_seed_all`` — the driver
        never materializes the vertex universe), trace recording is an
        O(1)-per-step array append on whichever shard a walker is visiting,
        and the result Dataset is assembled zero-copy from per-shard Arrow
        tables. Replicas run as sequential BSP sweeps with seed+replica so
        every walk has an independent counter-RNG stream while walker ids
        stay equal to the start vertex. Dangling vertices restart the walk
        at its start (the engine's standard reset), so every emitted walk
        has exactly ``walk_length`` rows.

        ``output="sequences"`` instead returns
        ``Dataset(walker_id, walk, seq: list<int64>)`` — one row per walk —
        via ONE extra keyed exchange (trace rows routed to each walker's
        home shard, lexsort + reshape assembly; see ``walk_trace_scatter``).
        Feed that to :func:`cassovary_ray.textops.skipgram_pairs`."""
        import ray.data

        if output not in ("long", "sequences"):
            raise ValueError("output must be 'long' or 'sequences'")
        ray.get([s.walk_reset_counts.remote() for s in self.shards])
        for k in range(walks_per_vertex):
            ray.get([s.walk_seed_all.remote(k) for s in self.shards])
            outs = []
            for step in range(walk_length):
                last = step == walk_length - 1
                outs = [
                    s.walk_step.remote(step, seed + k, reset_prob,
                                       max_out_deg, last, *outs)
                    for s in self.shards
                ]
            ray.get(outs)
        if output == "sequences":
            routed = [s.walk_trace_scatter.remote() for s in self.shards]
            return ray.data.from_arrow_refs(
                [s.walk_sequences_table.remote(walk_length, *routed)
                 for s in self.shards]
            )
        return ray.data.from_arrow_refs(
            [s.walk_trace_table.remote() for s in self.shards]
        )

    def _n2v_drive(self, num_steps: int, seed: int, reset_prob: float,
                   max_out_deg: int | None, p: float, q: float):
        """Chain the two-phase node2vec supersteps: phase A output feeds
        both phase B (pending walkers, routed by prev) and the NEXT phase A
        (resolved walkers, routed by next); phase B output feeds the next
        phase A. One list of refs carried per step — the driver never
        touches walker data."""
        if p <= 0 or q <= 0:
            raise ValueError("node2vec p and q must be > 0")
        carry: list = []
        final = []
        for step in range(num_steps):
            last = step == num_steps - 1
            a_outs = [
                s.n2v_step_a.remote(step, seed, reset_prob, max_out_deg, last, *carry)
                for s in self.shards
            ]
            if last:
                final = a_outs
                break
            b_outs = [
                s.n2v_step_b.remote(step, seed, p, q, *a_outs)
                for s in self.shards
            ]
            carry = a_outs + b_outs
        ray.get(final)

    def node2vec_walks(self, starts: list[int] | dict[int, int], num_steps: int,
                       *, p: float = 1.0, q: float = 1.0,
                       reset_prob: float = 0.0, seed: int = 1,
                       max_out_deg: int | None = None):
        """node2vec second-order biased walks (Grover & Leskovec, KDD 2016)
        → visit counts. At vertex v with previous vertex t, a candidate
        x ∈ N(v) is weighted 1/p if x == t (return), 1 if x ∈ N(t)
        (BFS-like), 1/q otherwise (DFS-like); the first step from each
        start (and the step after any reset) is uniform. Reset/dangling/
        hub-prune semantics match :meth:`random_walks`. Counter-based RNG
        on (seed, walker, step) with integer-exact class selection makes
        the result identical at any partition count. Returns
        ``Dataset(vertex, visits)`` in ``VisitsCounter`` order.

        The reference has no second-order walks (its ``RandomTraverser``
        is memoryless, ``Traverser.scala:75-136``); this is beyond-reference
        surface for graph-embedding corpus generation. At corpus scale set
        ``max_out_deg``: the phase-B exchange ships each pending walker's
        candidate list, so the cap bounds payloads exactly like the
        reference's ``RandomWalkParams.maxNumEdgesThresh`` bounds its walks.
        """
        import ray.data

        if isinstance(starts, dict):
            wid = np.array(sorted(starts), dtype=np.int64)
            st = np.array([starts[w] for w in wid], dtype=np.int64)
        else:
            wid = np.arange(len(starts), dtype=np.int64)
            st = np.asarray(starts, dtype=np.int64)
        ray.get([s.walk_reset_counts.remote() for s in self.shards])
        dropped = sum(ray.get([
            s.walk_seed.remote(wid, st, False, False, False)
            for s in self.shards
        ]))
        if dropped:
            import logging

            logging.getLogger(__name__).warning(
                "node2vec_walks: dropped %d walker(s) whose start vertex is "
                "not in the graph", dropped)
        self._n2v_drive(num_steps, seed, reset_prob, max_out_deg, p, q)
        visits = ray.data.from_arrow_refs(
            [s.walk_visits_table.remote() for s in self.shards]
        )
        return visits.sort(["visits", "vertex"], descending=[True, False])

    def node2vec_corpus(self, *, walks_per_vertex: int = 1, walk_length: int = 10,
                        p: float = 1.0, q: float = 1.0, seed: int = 1,
                        reset_prob: float = 0.0, max_out_deg: int | None = None,
                        output: str = "long"):
        """node2vec training corpus: ``walks_per_vertex`` biased walks from
        EVERY vertex — the :meth:`walk_corpus` pipeline with second-order
        steps. Same shard-local seeding, trace recording and (for
        ``output="sequences"``) one keyed assembly exchange; feed the
        sequences to :func:`cassovary_ray.textops.skipgram_pairs`."""
        import ray.data

        if output not in ("long", "sequences"):
            raise ValueError("output must be 'long' or 'sequences'")
        ray.get([s.walk_reset_counts.remote() for s in self.shards])
        for k in range(walks_per_vertex):
            ray.get([s.walk_seed_all.remote(k) for s in self.shards])
            self._n2v_drive(walk_length, seed + k, reset_prob, max_out_deg, p, q)
        if output == "sequences":
            routed = [s.walk_trace_scatter.remote() for s in self.shards]
            return ray.data.from_arrow_refs(
                [s.walk_sequences_table.remote(walk_length, *routed)
                 for s in self.shards]
            )
        return ray.data.from_arrow_refs(
            [s.walk_trace_table.remote() for s in self.shards]
        )

    def walk_top_paths(self, top_k: int = 2):
        """After ``random_walks(..., track_paths=True)``: top-k paths ending
        at each node with frequencies — the ``PathsCounter`` output
        (``PathsCounter.scala:29-61``; the reference's RandomWalk example
        prints top-10 visited with top-2 paths). Returns
        ``Dataset(vertex, path: list<int64>, count)``."""
        import ray.data

        return ray.data.from_arrow_refs(
            [s.walk_top_paths_table.remote(top_k) for s in self.shards]
        )

    def walk_prev_neighbor_counts(self, top_k: int | None = None):
        """After a ``random_walks(..., track_prev=True)`` run: per-vertex
        (prev-neighbor → count) table, optionally top-k prevs per vertex
        (``PrevNbrCounter.infoAllNodes`` top-k semantics: count desc, lower
        prev id ties). Returns ``Dataset(vertex, prev, count)``."""
        import ray.data

        ds = ray.data.from_arrow_refs(
            [s.walk_prev_counts_table.remote() for s in self.shards]
        )
        if top_k is None:
            return ds

        def topk(group):
            g = group.sort_values(["count", "prev"], ascending=[False, True])
            return g.head(top_k)

        return ds.groupby("vertex").map_groups(topk, batch_format="pandas")

    def personalized_reputation(self, start: int | list[int], num_steps: int = 10_000,
                                *, reset_prob: float = 0.3, num_walkers: int = 100,
                                seed: int = 1, max_out_deg: int | None = None,
                                top_k: int | None = None):
        """Monte-Carlo personalized PageRank — the
        ``GraphUtils.calculatePersonalizedReputation`` surface
        (``GraphUtils.scala:142-154``; PPR benchmark params 10k steps /
        reset 0.3, ``PersonalizedPageRankBenchmark.scala:20-22``).

        The reference runs ONE sequential walker for ``num_steps``; here the
        same visit budget is split over ``num_walkers`` parallel walkers
        (``num_steps // num_walkers`` steps each) — statistically equivalent
        mass, W× fewer BSP rounds. Returns ``Dataset(vertex, visits)`` sorted
        by visits desc, vertex asc (``VisitsCounter`` order), limited to
        ``top_k`` if given.
        """
        starts = [start] * num_walkers if isinstance(start, int) else list(start) * max(
            1, num_walkers // max(1, len(start))
        )
        steps = max(1, num_steps // len(starts))
        ds = self.random_walks(starts, steps, reset_prob=reset_prob, seed=seed,
                               max_out_deg=max_out_deg)
        return ds.limit(top_k) if top_k else ds

    def bipartite_link_analysis(self, left_init: dict[int, float], *,
                                num_iterations: int = 2,
                                reset_prob_left: float = 0.1,
                                reset_prob_right: float = 0.1,
                                num_top_contributors: int = 2):
        """Alternating bipartite flow on the BSP engine — the corpus-scale
        variant of ``bipartite.iterative_link_analysis`` (same contract:
        ``IterativeLinkAnalyzer.scala:36-184`` semantics, induced subgraph of
        the supplied lefts, reference-code reset pairing, contributors by
        share on the last two passes; see bipartite.py for the documented
        divergences). Requires a reverse layout (the right→left pass gathers
        along in-edges). Left/right id spaces must be globally distinct —
        the engine's single vertex universe (hash ids guarantee this),
        unlike the reference's two overlapping int spaces
        (``BipartiteGraph.scala:24-100``).

        Returns ``(left Dataset, right Dataset)`` of
        ``(vertex, weight, contributors)`` sorted weight desc, vertex asc.
        """
        import ray.data

        self._bila_run(left_init, num_iterations=num_iterations,
                       reset_prob_left=reset_prob_left,
                       reset_prob_right=reset_prob_right,
                       num_top_contributors=num_top_contributors)
        left = ray.data.from_arrow_refs(
            [s.bila_side_table.remote("left") for s in self.shards])
        right = ray.data.from_arrow_refs(
            [s.bila_side_table.remote("right") for s in self.shards])
        return (left.sort(["weight", "vertex"], descending=[True, False]),
                right.sort(["weight", "vertex"], descending=[True, False]))

    def _bila_run(self, left_init: dict[int, float], *, num_iterations: int,
                  reset_prob_left: float, reset_prob_right: float,
                  num_top_contributors: int) -> None:
        """Run the bipartite BSP rounds on the resident shards, leaving the
        per-shard side tables in actor state (``bila_side_table``). Split
        out so the serving layer can drive the same rounds per request and
        fold the small result in numpy without building a Dataset plan."""
        if not self.has_reverse:
            raise ValueError(
                "bipartite_link_analysis() needs a ShardedGraph built with "
                "reverse_layout_dir"
            )
        seed = pa.table({
            "vertex": pa.array(sorted(left_init), pa.int64()),
            "weight": pa.array([left_init[v] for v in sorted(left_init)], pa.float64()),
        })
        ray.get([s.bila_init.remote(seed) for s in self.shards])
        # induced right degrees (one fwd exchange; also seeds the fwd id cache)
        self._exchange("bila_rightdeg_scatter", "bila_rightdeg_apply", True)
        rev_first = True
        for it in range(1, num_iterations + 1):
            record = it in (num_iterations - 1, num_iterations)
            t0 = time.perf_counter()
            if it % 2 == 1:  # forward: left→right, resetProbOnRight (:152-156)
                self._exchange("bila_fwd_scatter", "bila_fwd_apply", False,
                               scatter_args=(reset_prob_right,))
                if record:
                    self._exchange("bila_contrib_scatter", "bila_contrib_apply", False,
                                   scatter_args=("fwd", reset_prob_right),
                                   apply_args=("fwd", num_top_contributors))
            else:  # reverse: right→left, resetProbOnLeft
                self._exchange("bila_rev_scatter", "bila_rev_apply", rev_first,
                               scatter_args=(reset_prob_left,),
                               apply_args=(reset_prob_left,))
                rev_first = False
                if record:
                    self._exchange("bila_contrib_scatter", "bila_contrib_apply", False,
                                   scatter_args=("rev", reset_prob_left),
                                   apply_args=("rev", num_top_contributors))
            self.metrics.append(RoundMetrics(it, float("nan"),
                                             time.perf_counter() - t0,
                                             {"algo": "bipartite"}))

    def hits(self, *, max_iterations: int | None = 100, tolerance: float = 1e-8,
             normalize: bool = True):
        """HITS, semantics cloned from ``Hits.scala:79-110``: per round
        auth = Σ in-hub, hubs = Σ out-auth-of-raw-auth, both rescaled by
        global max; error = T1 on hubs; optional final L1 normalize.
        Requires a reverse layout. Returns (hubs Dataset, auth Dataset,
        iterations)."""
        if not self.has_reverse:
            raise ValueError("hits() needs a ShardedGraph built with reverse_layout_dir")
        # max-rescaled state: per-vertex values ≤ 1, so ‖state‖₁ ≤ n
        self._check_f32_convergence(max_iterations, tolerance,
                                    state_l1_bound=float(self.n_vertices))
        ray.get([s.hits_init.remote(self.n_vertices) for s in self.shards])
        iteration, error, first = 0, 100.0 + tolerance, True
        while not ((max_iterations is not None and iteration >= max_iterations) or error <= tolerance):
            t0 = time.perf_counter()
            auth_maxes = self._exchange("hits_auth_scatter", "hits_auth_apply", first)
            hub_maxes = self._exchange("hits_hub_scatter", "hits_hub_apply", first)
            first = False
            hub_max, auth_max = max(hub_maxes), max(auth_maxes)
            errs = ray.get([s.hits_finish_round.remote(hub_max, auth_max) for s in self.shards])
            error = sum(errs)
            iteration += 1
            self.metrics.append(
                RoundMetrics(iteration, error, time.perf_counter() - t0, {"algo": "hits"})
            )
        if normalize:
            sums = ray.get([s.hits_sums.remote() for s in self.shards])
            hub_sum = sum(s[0] for s in sums)
            auth_sum = sum(s[1] for s in sums)
            ray.get([s.hits_normalize.remote(hub_sum, auth_sum) for s in self.shards])
        return (
            self._state_dataset("hubs", "hubs"),
            self._state_dataset("auth", "authorities"),
            iteration,
        )

    def salsa(self, *, max_iterations: int | None = 100, tolerance: float = 1e-8):
        """SALSA hub/authority scores (see the shard-method block for the
        recurrence and the Cassovary/Who-To-Follow lineage). Both vectors are
        L1-normalized per half-step (the normalizer rides into the next
        scatter coefficient — no extra exchange); error = T1 on authorities.
        Requires a reverse layout. Returns (hubs, authorities, iterations)."""
        if not self.has_reverse:
            raise ValueError("salsa() needs a ShardedGraph built with reverse_layout_dir")
        self._check_f32_convergence(max_iterations, tolerance)
        ray.get([s.salsa_init.remote(self.n_vertices) for s in self.shards])
        auth_sum = 1.0  # init vector sums to exactly 1
        iteration, error, first = 0, 100.0 + tolerance, True
        while not ((max_iterations is not None and iteration >= max_iterations)
                   or error <= tolerance):
            t0 = time.perf_counter()
            hub_sums = self._exchange("salsa_hub_scatter", "salsa_hub_apply",
                                      first, scatter_args=(auth_sum,))
            hub_sum = sum(hub_sums)
            auth_sums = self._exchange("salsa_auth_scatter", "salsa_auth_apply",
                                       first, scatter_args=(hub_sum,))
            auth_sum = sum(auth_sums)
            first = False
            errs = ray.get([s.salsa_finish_round.remote(hub_sum, auth_sum)
                            for s in self.shards])
            error = sum(errs)
            # after finish_round the stored vectors are normalized — the next
            # hub scatter must not re-divide
            auth_sum = 1.0 if auth_sum > 0 else 0.0
            iteration += 1
            self.metrics.append(
                RoundMetrics(iteration, error, time.perf_counter() - t0,
                             {"algo": "salsa"})
            )
        return (
            self._state_dataset("salsa_hub", "hubs"),
            self._state_dataset("salsa_auth", "authorities"),
            iteration,
        )

    # -- ANF / HyperBall ----------------------------------------------------

    def neighborhood_function(self, *, mode: str = "hll", precision_bits: int = 6,
                              seed: int = 1, max_distance: int | None = None):
        """Neighborhood function N(t) = #{(u,v) : dist(u,v) <= t} by
        HyperBall BSP rounds (see the ``anf_*`` shard methods): every vertex
        carries a ball sketch, one exchange per distance unit.

        ``mode="hll"`` (the 100 TB path): 2^precision_bits one-byte HLL
        registers per vertex — state is O(n·m), exchange is the LP shape,
        relative error ~1.04/sqrt(m) per vertex and much lower on the sum.
        N(t) sums floor-quantize each per-vertex estimate to the 2^-20 grid
        (``ANF_HLL_QUANT``) so the total is an exact integer fold —
        partition- and order-independent, replayed verbatim by
        ``oracles.anf_hll_sql``.
        ``mode="exact"``: bitsets over the dense global vertex rank —
        O(n²/8) state, ORACLE/TEST SCALE ONLY (the driver materializes the
        global vertex-id array).

        ``max_distance=None`` runs to saturation (every ball closed — N has
        reached the number of connected pairs); an explicit ``max_distance``
        emits exactly max_distance+1 rows (saturated rounds repeat the final
        value), which is what the SQL oracle unrolls. Returns
        ``pa.Table(distance, reachable_pairs)`` — int64 pairs in exact mode,
        float64 estimates in hll mode."""
        if mode == "exact":
            tables = [
                read_partition(self.layout_dir, "vertices", p, ["vertex"])
                for p in range(self.num_parts)
            ]
            gv = np.unique(np.concatenate(
                [t["vertex"].to_numpy(zero_copy_only=False) for t in tables]
            ))
            gv_table = pa.table({"vertex": pa.array(gv, pa.int64())})
            est = sum(ray.get([s.anf_init_exact.remote(gv_table)
                               for s in self.shards]))
        elif mode == "hll":
            est = sum(ray.get([
                s.anf_init_hll.remote(precision_bits, seed)
                for s in self.shards
            ]))
        else:
            raise ValueError("mode must be 'hll' or 'exact'")
        rows = [(0, est)]
        t, first = 0, True
        while max_distance is None or t < max_distance:
            t0 = time.perf_counter()
            res = self._exchange("anf_scatter", "anf_apply", first)
            first = False
            t += 1
            changed = sum(r[0] for r in res)
            est = sum(r[1] for r in res)
            rows.append((t, est))
            self.metrics.append(RoundMetrics(
                t, float(changed), time.perf_counter() - t0, {"algo": "anf"}))
            if max_distance is None and changed == 0:
                break
        dist = pa.array([r[0] for r in rows], pa.int64())
        if mode == "exact":
            pairs = pa.array([int(round(r[1])) for r in rows], pa.int64())
        else:
            # shard partials are exact integer counts of 2^-20 grid units
            # (arbitrary-precision Python-int sum on the driver); dividing by
            # the power-of-two grid is exact in float64 below 2^53 units
            pairs = pa.array([r[1] / ANF_HLL_QUANT for r in rows],
                             pa.float64())
        return pa.table({"distance": dist, "reachable_pairs": pairs})

    def anf_ball_sizes(self):
        """Per-vertex in-ball size after the last ``neighborhood_function``
        run: ``Dataset(vertex, ball)`` (int64 exact / float64 HLL)."""
        import ray.data

        return ray.data.from_arrow_refs(
            [s.anf_ball_table.remote() for s in self.shards])


def effective_diameter(nf_rows, alpha: float = 0.9) -> float:
    """Interpolated effective diameter from a neighborhood-function table
    (the standard ANF/HyperBall definition): the smallest t such that
    N(t) >= alpha·N(t_max), linearly interpolated between the two bracketing
    integer distances. ``nf_rows`` is the pa.Table returned by
    ``ShardedGraph.neighborhood_function`` (or anything with
    distance/reachable_pairs columns)."""
    d = nf_rows["distance"].to_numpy(zero_copy_only=False)
    n = nf_rows["reachable_pairs"].to_numpy(zero_copy_only=False).astype(np.float64)
    order = np.argsort(d)
    d, n = d[order], n[order]
    target = alpha * n[-1]
    t = int(np.searchsorted(n, target))
    if t == 0 or n[t] == n[t - 1]:
        return float(d[t])
    return float(d[t - 1] + (target - n[t - 1]) / (n[t] - n[t - 1]))


def latest_checkpoint(ckpt_dir: str) -> dict | None:
    """Newest complete (atomically committed) checkpoint manifest, or None."""
    if not os.path.isdir(ckpt_dir):
        return None
    manifests = sorted(f for f in os.listdir(ckpt_dir) if f.startswith("manifest-"))
    if not manifests:
        return None
    with open(os.path.join(ckpt_dir, manifests[-1])) as f:
        return json.load(f)
