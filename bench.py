"""Benchmark harness (driver-run per round; see BASELINE.md).

Headline (BASELINE.json metric): **edges/sec per PageRank iteration** over a
deterministic power-law (Common-Crawl-shaped in-degree skew) edge table
scaled by sf, plus iterations to 1e-6 convergence. Secondary: wall times of
representative queries over ``$GRAFT_SF_DIR``.

Prints ONE JSON line:
  {"metric": "pagerank_wall_to_1e-6", "value": <sec>, "unit": "sec",
   "queries": {...}, "sf": <sf>, "num_cpus": N,
   "edges": M, "iterations": K, "edges_per_sec_per_iter": T, ...}

``--scaling``: sandbox evidence for the north rule's N-vs-4N-cluster
criterion (no multi-node cluster available here). Runs fresh-process pairs
at two spans — 2→8 CPUs (below this VM's memory-bandwidth contention knee)
and 8→32 (above it) — with constant 12.5M edges/shard, reports per-config
MEDIAN throughput over 5 interleaved pairs, plus the hardware
weak-scaling ceiling measured by an embarrassingly parallel numpy probe at
the same worker counts, and the engine-vs-ceiling ratio. See BASELINE.md
for why the ceiling normalization is the honest single-box reading.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
LOADAVG_AT_START = [round(x, 2) for x in os.getloadavg()]
# graph scale: sf0.1 -> 100M edges / 10M vertices (bench tier per FIXTURES §5)
EDGES_PER_SF = 1_000_000_000
VERTS_PER_SF = 100_000_000
SEED = 42
BENCH_EDGES = os.environ.get("BENCH_EDGES")  # override for scaling runs


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def bench_layout_dir(n_edges: int, n_verts: int, num_parts: int) -> str:
    return f"/tmp/cassovary_ray_bench/pl_e{n_edges}_v{n_verts}_p{num_parts}_s{SEED}"


def run_bench() -> dict:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from cassovary_ray.corpus import build_powerlaw_layout_direct
    from cassovary_ray.engine import ShardedGraph
    from cassovary_ray.layout import read_layout_manifest

    sf = _sf_from_dir(SF_DIR)
    n_edges = int(BENCH_EDGES) if BENCH_EDGES else max(100_000, int(sf * EDGES_PER_SF))
    n_verts = max(10_000, n_edges // 10)
    num_parts = NUM_CPUS
    # vertex count must be a multiple of P for the direct builder
    n_verts -= n_verts % num_parts

    lay = bench_layout_dir(n_edges, n_verts, num_parts)
    t0 = time.perf_counter()
    try:
        man = read_layout_manifest(lay)
    except FileNotFoundError:
        man = build_powerlaw_layout_direct(n_edges, n_verts, num_parts, lay, seed=SEED)
    build_s = time.perf_counter() - t0

    # headline runs on a COLD-built CSR (csr_cache=False) so the iteration
    # metric is methodology-identical across rounds; the binary shard
    # cache's own win — restart latency — is measured separately below as
    # csr_{cold,warm}_load_sec.
    import shutil as _sh

    _sh.rmtree(os.path.join(lay, "csr_cache"), ignore_errors=True)

    # BENCH_EXCHANGE_PRECISION=f32 runs the headline loop with the halved
    # float32 ship payload (BASELINE.md "Float32 exchange option") — used
    # for the f32 legs of scaling comparisons; default f64 keeps the
    # headline methodology identical across rounds.
    prec = os.environ.get("BENCH_EXCHANGE_PRECISION", "f64")
    # BENCH_DELTA_FILTER=<frac> enables the incremental (delta-filtered)
    # exchange for the timed loop (engine.pagerank(delta_filter=...)) —
    # used by the scaling sweep; default off keeps the headline loop
    # methodology identical across rounds.
    dfil = os.environ.get("BENCH_DELTA_FILTER")
    dfil = float(dfil) if dfil else None
    with ShardedGraph(lay, csr_cache=False, exchange_precision=prec) as g:
        n_vertices = g.n_vertices
        # warm: one untimed round so actor CSR build and page cache are
        # excluded from the throughput number
        g.pagerank(max_iterations=1)
        t0 = time.perf_counter()
        g.pagerank(max_iterations=None, tolerance=1e-6, delta_filter=dfil)
        pr_wall = time.perf_counter() - t0
        iters = len(g.metrics) - 1  # minus the warm round
        round_walls = [m.wall_s for m in g.metrics[1:]]
        exch = [m.extra.get("exchange_mb", 0.0) for m in g.metrics[1:]]

    per_iter = sum(round_walls) / max(1, len(round_walls))
    eps = man["n_edges"] / per_iter

    # binary CSR shard-cache restart latency: cold construction (builds +
    # writes the cache) vs warm construction (loads it) — the
    # MemoryMappedDirectedGraph-analogue metric
    csr_restart = {}
    if not os.environ.get("BENCH_SKIP_QUERIES"):
        t0 = time.perf_counter()
        with ShardedGraph(lay) as g2:
            cold_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        with ShardedGraph(lay) as g2:
            warm_s = time.perf_counter() - t0
        csr_restart = {"csr_cold_load_sec": round(cold_s, 2),
                       "csr_warm_load_sec": round(warm_s, 2)}

    # real shuffle-path layout build (VERDICT r1: the headline excludes the
    # cached direct-builder layout; this measures the actual
    # edges → hash-partition shuffle → partitioned-parquet write path on a
    # FRESH directory every run, so the number is never a cache hit).
    # VERDICT r2 #3: measured at the FULL bench edge count (100M at sf0.1),
    # median of 3 runs — the single-pass direct writer's wall time is
    # writeback-noise-sensitive (±2x observed on this VM's disk).
    shuffle_build = {}
    if not os.environ.get("BENCH_SKIP_QUERIES"):
        import shutil

        from cassovary_ray.corpus import powerlaw_edges_dataset
        from cassovary_ray.layout import build_edge_layout

        sb_edges = min(n_edges, 100_000_000)
        sb_dir = f"/tmp/cassovary_ray_bench/shufbuild_{os.getpid()}"
        walls = []
        for _ in range(3):
            shutil.rmtree(sb_dir, ignore_errors=True)
            eds = powerlaw_edges_dataset(sb_edges, max(10_000, sb_edges // 10),
                                         seed=SEED)
            t0 = time.perf_counter()
            build_edge_layout(eds, sb_dir, num_parts)
            walls.append(time.perf_counter() - t0)
        shutil.rmtree(sb_dir, ignore_errors=True)
        sb_wall = sorted(walls)[1]
        shuffle_build = {
            "layout_build_shuffle_sec": round(sb_wall, 2),
            "layout_build_shuffle_runs": [round(w, 2) for w in walls],
            "layout_build_shuffle_edges": sb_edges,
            "layout_build_shuffle_eps": round(sb_edges / sb_wall),
        }

    # flagship north-star pipeline (VERDICT r2 #2): pages(url, html) →
    # extract links → hash urls → shuffle-build layout → PageRank to 1e-6.
    # The pages corpus (~2 KB logical/page: html + extracted text, zipf
    # vocab + zipf link targets) is generated once and cached on disk; the
    # TIMED phases are the real extract+shuffle ingest and the iteration
    # loop, exactly the north_star's dataflow.
    flagship = {}
    if not os.environ.get("BENCH_SKIP_QUERIES"):
        import shutil

        import pyarrow as pa

        from cassovary_ray.corpus import write_powerlaw_pages
        from cassovary_ray.engine import ShardedGraph as SG
        from cassovary_ray.extract import pages_to_edges
        from cassovary_ray.layout import build_edge_layout

        n_pages = max(50_000, int(sf * 62_500_000))  # ×16 links ≈ sf×1e9 edges
        pages_dir = f"/tmp/cassovary_ray_bench/pages_{n_pages}_s{SEED}"
        write_powerlaw_pages(pages_dir, n_pages, seed=SEED)
        import ray.data as rd

        pages = rd.read_parquet(pages_dir)
        logical_bytes = int(pages.map_batches(
            lambda b: pa.table({"n": pa.array(
                [b["html"].nbytes + b["text"].nbytes], pa.int64())}),
            batch_format="pyarrow").sum("n"))
        fl_lay = f"/tmp/cassovary_ray_bench/flagship_{os.getpid()}"
        shutil.rmtree(fl_lay, ignore_errors=True)
        t0 = time.perf_counter()
        # materialize() between extract and layout write: the two map stages
        # otherwise FUSE, and Ray Data bundles the fused task's input to the
        # write stage's batch_size counted in INPUT (pages) rows — with 16
        # links/page that serialized the whole corpus into one task (10x
        # wall). The barrier costs one object-store copy of the edge table.
        # Measured alternative (r4): fusing with a batch_size=None write
        # stage removes the bundling pathology and pipelines extract with
        # the write, and wins 1.6x at 625k pages — but at bench scale
        # (6.25M pages) extract already saturates all cores, pipelining has
        # no idle resource to overlap into, and per-row-group writes inflate
        # part files 21x and wall 31.7s -> 36.3s. Barrier kept by measurement.
        fl_edges = pages_to_edges(
            rd.read_parquet(pages_dir, columns=["url", "html"])).materialize()
        t_extract = time.perf_counter() - t0
        fl_man = build_edge_layout(fl_edges, fl_lay, num_parts)
        t_ingest = time.perf_counter() - t0
        del fl_edges
        t0 = time.perf_counter()
        with SG(fl_lay) as fg:
            t_csr = time.perf_counter() - t0
            t0 = time.perf_counter()
            fg.pagerank(max_iterations=None, tolerance=1e-6)
            t_pr = time.perf_counter() - t0
            fl_iters = len(fg.metrics)
        shutil.rmtree(fl_lay, ignore_errors=True)
        # anchor-text corpus over the same pages (round-4 vectorized
        # split-scan kernel): extract (dst_url, anchor) pairs + the
        # pre-combined global aggregation, consumed by count()
        from cassovary_ray.extract import anchor_texts

        t0 = time.perf_counter()
        n_anchor_rows = anchor_texts(
            rd.read_parquet(pages_dir, columns=["url", "html"])).count()
        t_anchor = time.perf_counter() - t0
        flagship = {
            "flagship_pages": n_pages,
            "flagship_logical_gb": round(logical_bytes / 2**30, 2),
            "flagship_edges": fl_man["n_edges"],
            "flagship_extract_sec": round(t_extract, 2),
            "flagship_ingest_sec": round(t_ingest, 2),
            "flagship_pages_per_sec": round(n_pages / t_ingest),
            "flagship_ingest_mb_per_sec": round(logical_bytes / 2**20 / t_ingest),
            "flagship_csr_load_sec": round(t_csr, 2),
            "flagship_pagerank_sec": round(t_pr, 2),
            "flagship_pagerank_iters": fl_iters,
            "flagship_end_to_end_sec": round(t_ingest + t_csr + t_pr, 2),
            "flagship_anchor_sec": round(t_anchor, 2),
            "flagship_anchor_pages_per_sec": round(n_pages / t_anchor),
            "flagship_anchor_rows": int(n_anchor_rows),
        }

    # representative query timings over the driver testdata at this sf
    from cassovary_ray.queries import QUERIES

    queries = {}
    qnames = [] if os.environ.get("BENCH_SKIP_QUERIES") else [
        "graph_edges", "graph_degrees", "graph_pagerank",
        "doc_token_counts", "doc_exact_dedup", "knn_top5", "events_hourly"]
    for name in qnames:
        t0 = time.perf_counter()
        res = QUERIES[name](SF_DIR)
        if hasattr(res, "to_pandas"):
            res.to_pandas()
        queries[name] = round(time.perf_counter() - t0, 3)

    out = {
        "metric": "pagerank_wall_to_1e-6",
        "value": round(pr_wall, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        # ambient load when the run STARTED (1/5/15 min) — this VM shares a
        # host; numbers taken at loadavg ≫ 1 are contended 2-3× (observed:
        # PageRank wall 2.7 s quiet vs 7-14 s busy) and should be read
        # against a quiet-box baseline, not as engine regressions
        "loadavg_at_start": LOADAVG_AT_START,
        "num_cpus": NUM_CPUS,
        "edges": man["n_edges"],
        "vertices": n_vertices,
        "iterations_to_1e-6": iters,
        "sec_per_iter": round(per_iter, 4),
        "edges_per_sec_per_iter": round(eps),
        "exchange_mb_per_iter": round(max(exch) if exch else 0.0, 1),
        "layout_build_sec": round(build_s, 2),
        **csr_restart,
        **shuffle_build,
        **flagship,
    }
    ray.shutdown()
    return out


def hw_bandwidth_probe(workers: int, mb_per_worker: int = 200) -> float:
    """Per-worker wall time of an identical, fully independent numpy
    gather+sum workload run in ``workers`` parallel processes.

    This measures the sandbox VM's shared-memory-bandwidth ceiling with ZERO
    coordination: any slowdown vs fewer workers is pure hardware contention,
    the upper bound on what any engine (ours included) can weak-scale to on
    ONE box. On a real N→4N-node cluster each node brings its own memory
    bus, so this term scales linearly and drops out."""
    import multiprocessing as mp

    import numpy as np

    def worker(q):
        n = mb_per_worker * 131072  # float64s
        a = np.random.rand(n)
        idx = np.random.randint(0, n, n // 4)
        t0 = time.perf_counter()
        np.take(a, idx).sum()
        q.put(time.perf_counter() - t0)

    q = mp.Queue()
    ps = [mp.Process(target=worker, args=(q,)) for _ in range(workers)]
    [p.start() for p in ps]
    times = [q.get() for _ in ps]
    [p.join() for p in ps]
    return sum(times) / len(times)


def kernel_probe(workers: int, edges: int = 50_000_000,
                 verts: int = 5_000_000, segs: int = 9_000_000,
                 ship_f32: bool = False, apply_stage: bool = False) -> float:
    """Per-worker wall time of ONE PageRank-scatter-shaped kernel round —
    random gather of ``edges`` positions into a ``verts``-entry coef table
    + segmented reduceat over ``segs`` distinct destinations (+ optionally
    the float32 payload cast that models the plasma ship) — run as
    ``workers`` fully INDEPENDENT processes (no Ray, no exchange, no
    driver).

    This is the kernel-matched hardware ceiling the 200 MB gather probe
    (:func:`hw_bandwidth_probe`) understates. r5 upgrade: the r4 sweep ran
    IDENTICAL work at both worker counts, which silently attributed the
    workload's own growth to engine coordination — at constant
    edges/shard, a 4× graph has ~1.5× more DISTINCT destinations per
    shard (measured 5.23M → 7.99M on the full-span fixtures), so each
    hi-leg shard genuinely reduces more segments and ships more payload
    bytes. The honest per-config ceiling runs each config's own
    (edges, verts, segs) as taken from the engine's actual layouts; the
    engine's remaining gap on top of THAT ratio (exchange copies,
    dispatch, fan-in) is engine-attributable coordination loss.

    ``apply_stage`` completes the zero-coordination BSP round: every
    receiver must also accumulate its incoming per-destination partials
    into its dense state — entry count per receiver equals its own
    distinct-dst count by symmetry — so the matched round is gather +
    segment-reduce (scatter), f32 cast (ship), positional scatter-add
    (apply). All three phases are information-theoretically required by
    the algorithm's data distribution; what the probe still EXCLUDES —
    dispatch, plasma copies, barrier wait, per-sender fan-in — is the
    engine-attributable coordination the ratio is meant to isolate."""
    import multiprocessing as mp

    import numpy as np

    def worker(q):
        rng = np.random.default_rng(0)
        src_pos = rng.integers(0, verts, edges, dtype=np.int32)
        seg = np.unique(rng.integers(0, edges, segs, dtype=np.int64))
        coef = rng.random(verts)
        apos = rng.integers(0, verts, len(seg), dtype=np.int64)
        state = np.zeros(verts)
        vals = coef[src_pos]  # warm (alloc + first sweep)
        out = np.add.reduceat(vals, seg)
        t0 = time.perf_counter()
        for _ in range(3):
            vals = coef[src_pos]
            out = np.add.reduceat(vals, seg)
            if ship_f32:
                inc = out.astype(np.float32)  # payload ship cast + copy
            if apply_stage:
                state[apos] += inc if ship_f32 else out
        q.put((time.perf_counter() - t0) / 3)

    q = mp.Queue()
    ps = [mp.Process(target=worker, args=(q,)) for _ in range(workers)]
    [p.start() for p in ps]
    times = [q.get() for _ in ps]
    [p.join() for p in ps]
    return sum(times) / len(times)


def _uniq_dst_per_shard(layout_dir: str) -> int:
    """Distinct destinations in one shard of a built layout (part=0) — the
    per-config ``segs`` for the kernel-matched probe."""
    import glob

    import numpy as np
    import pyarrow.parquet as pq

    fs = sorted(glob.glob(os.path.join(layout_dir, "edges", "part=0",
                                       "*.parquet")))
    dst = np.concatenate([
        pq.read_table(f, columns=["dst"]).column(0)
        .to_numpy(zero_copy_only=False) for f in fs])
    return int(len(np.unique(dst)))


def matched_kernel_pair(k_lo: int, k_hi: int, per_shard: int,
                        lay_lo: str, lay_hi: str,
                        n_lo: int, n_hi: int) -> dict:
    """Config-matched kernel ceiling for one span: per-worker probe time at
    each worker count with THAT config's (edges/shard, owned verts/shard,
    distinct dsts/shard), interleaved lo/hi; ceiling = t_lo / t_hi."""
    segs_lo, segs_hi = _uniq_dst_per_shard(lay_lo), _uniq_dst_per_shard(lay_hi)
    lo_runs, hi_runs = [], []
    for _ in range(3):
        lo_runs.append(kernel_probe(k_lo, edges=per_shard,
                                    verts=max(1, n_lo // k_lo),
                                    segs=segs_lo, ship_f32=True,
                                    apply_stage=True))
        hi_runs.append(kernel_probe(k_hi, edges=per_shard,
                                    verts=max(1, n_hi // k_hi),
                                    segs=segs_hi, ship_f32=True,
                                    apply_stage=True))
    lo_m, hi_m = sorted(lo_runs)[1], sorted(hi_runs)[1]
    return {
        "matched_segs_lo": segs_lo, "matched_segs_hi": segs_hi,
        "matched_kernel_sec_lo_runs": [round(x, 3) for x in lo_runs],
        "matched_kernel_sec_hi_runs": [round(x, 3) for x in hi_runs],
        "matched_kernel_sec_lo": round(lo_m, 3),
        "matched_kernel_sec_hi": round(hi_m, 3),
        "matched_kernel_ceiling_weak_eff": round(lo_m / hi_m, 3) if hi_m else None,
    }


def run_scaling() -> dict:
    """Scaling evidence for the north rule's N vs 4N cluster criterion,
    sandbox edition (single VM, no real cluster):

    - engine weak scaling: identical job at num_cpus=8 on E edges vs
      num_cpus=32 on 4E edges (constant 12.5M edges/shard);
      eff = eps_32 / (4 · eps_8).
    - engine strong scaling: same 100M-edge input at both levels.
    - hardware ceiling: the same 8→32 weak-scaling efficiency for an
      embarrassingly parallel numpy gather workload (hw_bandwidth_probe) —
      this VM's shared memory bus saturates well below 32 streaming
      workers, so NO engine can exceed this ceiling here. The engine's
      coordination quality is eff / ceiling (≈1 ⇒ all loss is hardware
      bandwidth, which a real 4N-node cluster scales linearly).
    """

    def run(ncpu: int, edges: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), BENCH_EDGES=str(edges),
                   BENCH_SKIP_QUERIES="1")
        # the scaling sweep measures the SCALE configuration (r5): float32
        # ship payloads (halved exchange bytes, the lever SCALING_r4's
        # decomposition identified). The delta-filtered exchange exists and
        # is certified (engine.pagerank(delta_filter=...)) but measures
        # NEUTRAL-to-negative on this workload — the per-destination delta
        # distribution is flat (bottom 90% of entries carry 55% of the
        # mass, measured on the bench fixture), so no energy cut shrinks
        # payloads without withholding O(10%) of each round's update mass —
        # so the sweep leaves it off. Override per leg via env
        # (BENCH_EXCHANGE_PRECISION=f64, BENCH_DELTA_FILTER=0.001).
        env.setdefault("BENCH_EXCHANGE_PRECISION", "f32")
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        if proc.returncode != 0:
            raise RuntimeError(
                f"bench subprocess (ncpu={ncpu}, edges={edges}) failed:\n"
                + proc.stderr[-2000:]
            )
        return json.loads(proc.stdout.strip().splitlines()[-1])

    def median(xs):
        s = sorted(xs)
        n = len(s)
        return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2

    def paired_medians(lo, hi, e_lo, e_hi, n_pairs):
        """Interleaved (lo, hi) runs so ambient noise hits both configs
        equally; per-config MEDIAN eps over n_pairs runs (VERDICT r1: a
        single best-of-2 ratio with 0.08-0.67 spread was thin evidence)."""
        eps_lo, eps_hi = [], []
        for _ in range(n_pairs):
            eps_lo.append(run(lo, e_lo)["edges_per_sec_per_iter"])
            eps_hi.append(run(hi, e_hi)["edges_per_sec_per_iter"])
        return median(eps_lo), median(eps_hi), eps_lo, eps_hi

    # constant work per shard (weak scaling); override to probe how
    # efficiency moves with per-shard work — at the 100 TB design point
    # shards carry hundreds of MB and per-round fixed overhead amortizes
    per_shard = int(os.environ.get("BENCH_PER_SHARD", "12500000"))
    # BENCH_SPANS=knee|full|both: larger per-shard probes can only afford the
    # knee span (the full span's hi config would exceed one VM's memory)
    spans = os.environ.get("BENCH_SPANS", "both")
    out = {"metric": "pagerank_weak_scaling_efficiency", "unit": "ratio",
           "loadavg_at_start": LOADAVG_AT_START}

    # below-the-contention-knee measurement (2→8 CPUs): the VM's shared
    # memory bus is not yet saturated at 8 streaming workers, so engine
    # coordination loss is observable directly instead of being buried
    # under the hardware ceiling
    def _layout_for(ncpu: int, edges: int) -> tuple[str, int]:
        n_verts = max(10_000, edges // 10)
        n_verts -= n_verts % ncpu
        return bench_layout_dir(edges, n_verts, ncpu), n_verts

    if spans in ("knee", "both"):
        k_lo, k_hi = 2, 8
        m_lo, m_hi, raw_lo, raw_hi = paired_medians(
            k_lo, k_hi, k_lo * per_shard, k_hi * per_shard, 5)
        knee_eff = (m_hi / m_lo) / (k_hi / k_lo)
        hw_k_lo, hw_k_hi = hw_bandwidth_probe(k_lo), hw_bandwidth_probe(k_hi)
        knee_ceiling = hw_k_lo / hw_k_hi if hw_k_hi > 0 else 1.0
        kp_lo, kp_hi = kernel_probe(k_lo), kernel_probe(k_hi)
        kp_ceiling = kp_lo / kp_hi if kp_hi > 0 else 1.0
        klay_lo, kn_lo = _layout_for(k_lo, k_lo * per_shard)
        klay_hi, kn_hi = _layout_for(k_hi, k_hi * per_shard)
        knee_matched = matched_kernel_pair(k_lo, k_hi, per_shard,
                                           klay_lo, klay_hi, kn_lo, kn_hi)
        out.update({f"knee_{k}": v for k, v in knee_matched.items()})
        kmc = knee_matched["matched_kernel_ceiling_weak_eff"]
        out.update({
            "knee_engine_eff_vs_matched_kernel":
                round(knee_eff / kmc, 2) if kmc else None})
        out.update({
            "per_shard_edges": per_shard,
            "knee_num_cpus": [k_lo, k_hi],
            "knee_weak_scaling_efficiency": round(knee_eff, 3),
            "knee_eps_lo_runs": raw_lo, "knee_eps_hi_runs": raw_hi,
            "knee_eps_lo_median": m_lo, "knee_eps_hi_median": m_hi,
            "knee_hw_bandwidth_ceiling_weak_eff": round(knee_ceiling, 3),
            "knee_engine_eff_vs_hw_ceiling": round(knee_eff / knee_ceiling, 2),
            # kernel-matched ceiling: the engine's own scatter kernel run as
            # independent processes (see kernel_probe) — the honest hardware
            # bound for THIS workload's bus footprint
            "knee_kernel_probe_sec_lo": round(kp_lo, 3),
            "knee_kernel_probe_sec_hi": round(kp_hi, 3),
            "knee_kernel_ceiling_weak_eff": round(kp_ceiling, 3),
            "knee_engine_eff_vs_kernel_ceiling": round(knee_eff / kp_ceiling, 2),
        })
    if spans == "knee":
        return out

    # full-span measurement (8→32) — dominated by the bandwidth ceiling here
    lo, hi = 8, 32
    e_lo, e_hi = lo * per_shard, hi * per_shard
    t_lo, t_hi, raw_lo, raw_hi = paired_medians(lo, hi, e_lo, e_hi, 5)
    weak_eff = (t_hi / t_lo) / (hi / lo)
    # strong scaling: same 100M-edge input at both levels (median of 3)
    strong_hi = median([run(hi, e_lo)["edges_per_sec_per_iter"] for _ in range(3)])
    strong_eff = (strong_hi / t_lo) / (hi / lo)
    # hardware weak-scaling ceiling on this VM (independent processes)
    hw_lo = hw_bandwidth_probe(lo)
    hw_hi = hw_bandwidth_probe(hi)
    hw_ceiling = hw_lo / hw_hi if hw_hi > 0 else 1.0  # = per-worker slowdown⁻¹
    flay_lo, fn_lo = _layout_for(lo, e_lo)
    flay_hi, fn_hi = _layout_for(hi, e_hi)
    full_matched = matched_kernel_pair(lo, hi, per_shard,
                                       flay_lo, flay_hi, fn_lo, fn_hi)
    out.update(full_matched)
    fmc = full_matched["matched_kernel_ceiling_weak_eff"]
    out.update({
        "engine_eff_vs_matched_kernel":
            round(((t_hi / t_lo) / (hi / lo)) / fmc, 2) if fmc else None})
    out.update({
        "value": round(weak_eff, 3),
        "num_cpus_lo": lo,
        "num_cpus_hi": hi,
        "edges_lo": e_lo,
        "edges_hi": e_hi,
        "eps_lo_runs": raw_lo, "eps_hi_runs": raw_hi,
        "edges_per_sec_per_iter_lo": t_lo,
        "edges_per_sec_per_iter_hi": t_hi,
        "strong_scaling_efficiency_same_input": round(strong_eff, 3),
        "strong_edges_per_sec_per_iter_hi": strong_hi,
        "hw_bandwidth_ceiling_weak_eff": round(hw_ceiling, 3),
        "hw_probe_sec_per_worker_lo": round(hw_lo, 3),
        "hw_probe_sec_per_worker_hi": round(hw_hi, 3),
        "engine_eff_vs_hw_ceiling": round(weak_eff / hw_ceiling, 2) if hw_ceiling else None,
    })
    return out


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
