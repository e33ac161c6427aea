"""Query registry: named Ray pipelines + matching DuckDB oracle SQL.

This is the driver correctness surface (``__ray_entry__.queries()`` /
``oracle_sql()``): every graph / text / ANN / events operator is exposed as a
callable over an ``sf_dir`` of parquet tables, and as ANSI SQL DuckDB runs on
the same tables. Iterative algorithms are oracle-checked too, via
``oracles.py``: a pinned iteration count on the query side + the identical
rounds unrolled into chained MATERIALIZED CTEs (PageRank, LP, HITS) or the
exact fixpoint as a recursive CTE (WCC, BFS, closeness). The seeded /
hash-driven families are oracled too — counter-RNG uniforms embedded as
literals (walks, node2vec), splitmix64 re-expressed in HUGEINT limbs
(minhash, LSH, count-min), fixed-grid integer quantization for float
reductions (ANF-HLL, LM scores, LR training). The ONE remaining rows-only
query is ``graph_dfs`` — queue order IS its semantics — pinned by
TraverserSpec golden fixtures instead.

The graph queries run over a **derived edge table** built deterministically
from ``lineitem`` (`(13·l_orderkey + l_linenumber) mod 1021 →
(31·l_partkey + 7·l_suppkey) mod 1021`, distinct, self-loops dropped) so the
Ray side and the SQL side compute over the identical graph. Engine-backed
queries build their partitioned layout once per (sf_dir, variant) under
``/tmp/cassovary_ray_layouts`` and reuse it across queries in the session.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count

from cassovary_ray import (
    analytics,
    ann,
    events as events_ops,
    joins,
    learn,
    multimodal,
    oracles,
    textops,
)
from cassovary_ray.ann import _planes as _ann_planes
from cassovary_ray.engine import ShardedGraph
from cassovary_ray.layout import build_edge_layout, read_layout_manifest

GRAPH_MOD = 1021
ENGINE_PARTS = 8

DERIVED_EDGES_CTE = f"""
    SELECT DISTINCT (l_orderkey * 13 + l_linenumber) % {GRAPH_MOD} AS src,
                    (l_partkey * 31 + l_suppkey * 7) % {GRAPH_MOD} AS dst
    FROM lineitem
    WHERE (l_orderkey * 13 + l_linenumber) % {GRAPH_MOD}
       <> (l_partkey * 31 + l_suppkey * 7) % {GRAPH_MOD}
"""


# core/periphery split for the densest-subgraph gate: rows with
# l_orderkey%20==0 land in a dense 89-vertex core (ids 0..88), the rest in a
# sparse 9973-id periphery — so the greedy peel's argmax lands mid-trajectory
# (round 3 of 6 at sf0.01), exercising the full density bookkeeping
SKEWED_EDGES_CTE = """
    SELECT DISTINCT
      CASE WHEN l_orderkey % 20 = 0 THEN (l_orderkey * 13 + l_linenumber) % 89
           ELSE 89 + (l_orderkey * 13 + l_linenumber) % 9973 END AS src,
      CASE WHEN l_orderkey % 20 = 0 THEN (l_partkey * 31 + l_suppkey * 7) % 89
           ELSE 89 + (l_partkey * 31 + l_suppkey * 7) % 9973 END AS dst
    FROM lineitem
"""


def skewed_edges(sf_dir: str):
    """Core+periphery edge table (matches ``SKEWED_EDGES_CTE`` row for
    row; self-loops retained — consumers canonicalize)."""
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"],
    )

    def kernel(b: pa.Table) -> pa.Table:
        ok = b["l_orderkey"].to_numpy(zero_copy_only=False)
        ln = b["l_linenumber"].to_numpy(zero_copy_only=False)
        pk = b["l_partkey"].to_numpy(zero_copy_only=False)
        sk = b["l_suppkey"].to_numpy(zero_copy_only=False)
        core = (ok % 20) == 0
        src = np.where(core, (ok * 13 + ln) % 89, 89 + (ok * 13 + ln) % 9973)
        dst = np.where(core, (pk * 31 + sk * 7) % 89, 89 + (pk * 31 + sk * 7) % 9973)
        return pa.table({"src": pa.array(src, pa.int64()),
                         "dst": pa.array(dst, pa.int64())})

    return analytics.distinct_edges(
        li.map_batches(kernel, batch_format="pyarrow"), small_domain=True)


def derived_edges(sf_dir: str):
    """The deterministic lineitem-derived edge table (matches
    ``DERIVED_EDGES_CTE`` row for row)."""
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"],
    )

    def kernel(b: pa.Table) -> pa.Table:
        ok = b["l_orderkey"].to_numpy(zero_copy_only=False)
        ln = b["l_linenumber"].to_numpy(zero_copy_only=False)
        pk = b["l_partkey"].to_numpy(zero_copy_only=False)
        sk = b["l_suppkey"].to_numpy(zero_copy_only=False)
        src = (ok * 13 + ln) % GRAPH_MOD
        dst = (pk * 31 + sk * 7) % GRAPH_MOD
        keep = src != dst
        return pa.table({"src": pa.array(src[keep], pa.int64()),
                         "dst": pa.array(dst[keep], pa.int64())})

    # small_domain: the derived graph is modulus-bounded (≤ GRAPH_MOD² ≈ 1M
    # distinct pairs), so the combine-tree distinct applies
    return analytics.distinct_edges(
        li.map_batches(kernel, batch_format="pyarrow"), small_domain=True)


DERIVED_WEDGES_CTE = f"""
    SELECT src, dst, CAST(count(*) AS DOUBLE) AS w
    FROM (SELECT (l_orderkey * 13 + l_linenumber) % {GRAPH_MOD} AS src,
                 (l_partkey * 31 + l_suppkey * 7) % {GRAPH_MOD} AS dst
          FROM lineitem)
    WHERE src <> dst GROUP BY src, dst
"""


def derived_weighted_edges(sf_dir: str):
    """The derived edge table with multiplicity weights: w(src, dst) = how
    many lineitem rows map to the pair — the natural web-graph analogue of
    duplicate links between two pages (matches ``DERIVED_WEDGES_CTE``)."""
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"],
    )

    def kernel(b: pa.Table) -> pa.Table:
        ok = b["l_orderkey"].to_numpy(zero_copy_only=False)
        ln = b["l_linenumber"].to_numpy(zero_copy_only=False)
        pk = b["l_partkey"].to_numpy(zero_copy_only=False)
        sk = b["l_suppkey"].to_numpy(zero_copy_only=False)
        src = (ok * 13 + ln) % GRAPH_MOD
        dst = (pk * 31 + sk * 7) % GRAPH_MOD
        keep = src != dst
        return pa.table({"src": pa.array(src[keep], pa.int64()),
                         "dst": pa.array(dst[keep], pa.int64())})

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({"src": b["src"], "dst": b["dst"],
                         "weight": b["w"].cast(pa.float64())})

    return (
        li.map_batches(kernel, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .aggregate(Count(alias_name="w"))
        .map_batches(finish, batch_format="pyarrow")
    )


def _table(sf_dir: str, name: str):
    return ray.data.read_parquet(os.path.join(sf_dir, f"{name}.parquet"))


LAYOUT_FORMAT_VERSION = 2  # bump when layout.py changes its on-disk format


def _layout_dir(sf_dir: str, variant: str) -> str:
    key = hashlib.md5(
        f"{sf_dir}|{variant}|{GRAPH_MOD}|{ENGINE_PARTS}|v{LAYOUT_FORMAT_VERSION}".encode()
    ).hexdigest()[:16]
    return os.path.join("/tmp/cassovary_ray_layouts", key)


def _ensure_layout(sf_dir: str, variant: str) -> str:
    """Build (once) the partitioned layout for the derived graph."""
    d = _layout_dir(sf_dir, variant)
    try:
        read_layout_manifest(d)
        return d
    except FileNotFoundError:
        pass
    kwargs = {
        "directed": {},
        "reversed": {"reverse": True},
        "undirected": {"undirected": True, "dedup": True},
        "weighted": {"weighted": True},
        "dag": {},
    }[variant]
    if variant == "weighted":
        src_ds = derived_weighted_edges(sf_dir)
    elif variant == "dag":
        # id-ordered filter makes any edge table acyclic (src < dst)
        src_ds = derived_edges(sf_dir).map_batches(
            lambda b: b.filter(pc.less(b["src"], b["dst"])),
            batch_format="pyarrow")
    else:
        src_ds = derived_edges(sf_dir)
    build_edge_layout(src_ds, d, ENGINE_PARTS, **kwargs)
    return d


def _scalar(name: str, value: int):
    return pa.table({name: pa.array([value], pa.int64())})


# ---------------------------------------------------------------------------
# query callables
# ---------------------------------------------------------------------------


def q_graph_edges(sf_dir: str):
    return derived_edges(sf_dir)


def q_graph_degrees(sf_dir: str):
    return analytics.degrees(derived_edges(sf_dir))


def q_graph_degree_centrality(sf_dir: str):
    return analytics.degree_centrality(derived_edges(sf_dir), "out", normalized=True)


def q_graph_mutual_edges(sf_dir: str):
    return _scalar("mutual_pairs", analytics.mutual_edge_count(derived_edges(sf_dir)))


def q_graph_triangles(sf_dir: str):
    return _scalar("triangles", analytics.triangle_count(derived_edges(sf_dir)))


# Sampled-triangle coin: p=0.5 keeps E[sampled] = T/8 — plenty at sf0.01's
# triangle count while still exercising real thinning; the oracle replays
# the same (seed, edge) splitmix64 coin so the gate is hash-exact.
TRI_SAMPLE_P, TRI_SAMPLE_SEED = 0.5, 42


def q_graph_triangles_approx(sf_dir: str):
    return analytics.triangle_count_approx(
        derived_edges(sf_dir), sample_prob=TRI_SAMPLE_P, seed=TRI_SAMPLE_SEED)


# Hub skew guard for the deg²-fan-out co-occurrence joins: dst vertices with
# in-degree > SIM_MAX_IN_DEG are excluded from the shared-neighbor
# intersection (degrees in score denominators still count all edges). The
# SAME threshold is spelled into the three oracles below, exactly as
# graph_two_hop does with its max_mid_deg — so the gate stays hash-green
# whether or not the guard fires. 256 > sf0.01's max in-degree (82), so the
# small-SF results are bit-identical to the unguarded exact computation,
# while ONE power-law hub at corpus scale can no longer emit deg² pairs
# (VERDICT r3 "What's wrong" #2).
SIM_MAX_IN_DEG = 256


def q_graph_jaccard_top3(sf_dir: str):
    return analytics.similarity_top_k(derived_edges(sf_dir), k=3,
                                      metric="jaccard",
                                      max_in_deg=SIM_MAX_IN_DEG)


def q_graph_cosine_top3(sf_dir: str):
    return analytics.similarity_top_k(derived_edges(sf_dir), k=3,
                                      metric="cosine",
                                      max_in_deg=SIM_MAX_IN_DEG)


def q_graph_similar_pairs(sf_dir: str):
    """Global top-10 most similar pairs — the ``getTopKAllSimilarPairs``
    entry point (``Similarity.scala:85-89``): canonical u<w pairs, score
    desc then (lower u, lower w)."""
    return analytics.similar_pairs_top_k(derived_edges(sf_dir), k=10,
                                         metric="jaccard",
                                         max_in_deg=SIM_MAX_IN_DEG)


def q_graph_adamic_adar(sf_dir: str):
    return analytics.adamic_adar_top_k(derived_edges(sf_dir), k=3,
                                       max_in_deg=SIM_MAX_IN_DEG)


def q_graph_modularity(sf_dir: str):
    """Modularity of the deterministic c(v) = v % 7 partition (the same
    assignment rule as ``graph_labels`` — SQL-expressible, so the full
    integer pipeline is oracle-checked)."""
    e = derived_edges(sf_dir)

    def assign(batch):
        import numpy as _np
        import pyarrow as _pa
        v = batch["vertex"].to_numpy(zero_copy_only=False)
        return _pa.table({"vertex": _pa.array(v, _pa.int64()),
                          "community": _pa.array(v % 7, _pa.int64())})

    comm = analytics.degrees(e).select_columns(["vertex"]).map_batches(
        assign, batch_format="pyarrow")
    return analytics.modularity(e, comm)


def q_graph_local_clustering(sf_dir: str):
    return analytics.local_triangle_counts(derived_edges(sf_dir))


def q_graph_ppr(sf_dir: str):
    """Exact Personalized PageRank from seeds {0: ½, 1: ¼, 2: ¼} (exact
    binary fractions — no decimal-literal float divergence vs the oracle);
    iterations pinned for the unrolled-CTE oracle."""
    lay = _ensure_layout(sf_dir, "directed")
    with ShardedGraph(lay) as g:
        return g.personalized_pagerank(
            PPR_SEEDS, max_iterations=10, tolerance=0.0
        )


PPR_SEEDS = {0: 0.5, 1: 0.25, 2: 0.25}


def q_graph_pagerank(sf_dir: str):
    # iteration count pinned (tolerance=0 disables early stop) so the
    # unrolled-CTE SQL oracle runs the identical 10 rounds
    lay = _ensure_layout(sf_dir, "directed")
    with ShardedGraph(lay) as g:
        return g.pagerank(max_iterations=10, tolerance=0.0)


def q_graph_pagerank_weighted(sf_dir: str):
    # same pinned-10-round protocol as graph_pagerank, over the
    # multiplicity-weighted derived graph
    lay = _ensure_layout(sf_dir, "weighted")
    with ShardedGraph(lay) as g:
        return g.pagerank(max_iterations=10, tolerance=0.0)


def q_graph_katz(sf_dir: str):
    # pinned 8 truncated-series terms so the unrolled SQL runs identically;
    # alpha small enough that α·avg_deg < 1 keeps values O(1) — float
    # summation-order drift (~1e-16 relative) then stays far below the
    # checker's 9-dp grid (at alpha=0.05 values reach ~4e3 and straddle it)
    lay = _ensure_layout(sf_dir, "directed")
    with ShardedGraph(lay) as g:
        return g.katz(alpha=0.005, beta=1.0, max_iterations=8)


def q_graph_topo(sf_dir: str):
    """Topological layers (longest-path depth) of the DAG-ified derived
    graph (src<dst filter; 101 layers at sf0.01 — real max-plus rounds)."""
    lay = _ensure_layout(sf_dir, "dag")
    with ShardedGraph(lay) as g:
        return g.topological_layers()


def q_graph_msf(sf_dir: str):
    """Borůvka minimum spanning forest of the multiplicity-weighted derived
    graph (rows-only: no SQL MST; uniqueness under the (w,src,dst) total
    order is pinned by the Kruskal-parity tests)."""
    e = derived_weighted_edges(sf_dir).map_batches(
        lambda b: pa.table({"src": b["src"], "dst": b["dst"],
                            "w": b["weight"]}),
        batch_format="pyarrow")
    return analytics.minimum_spanning_forest(e)


def q_graph_eigenvector(sf_dir: str):
    # pinned 7 power-iteration rounds (tolerance=None) for the SQL unroll
    lay = _ensure_layout(sf_dir, "directed")
    with ShardedGraph(lay) as g:
        return g.eigenvector_centrality(max_iterations=7, tolerance=None)


SSSP_SOURCES = {0: 0.0}
SSSP_ROUNDS = 8


def q_graph_sssp(sf_dir: str):
    # pinned 8 min-plus relaxation rounds over the multiplicity-weighted
    # derived graph; distances are identical left-fold float sums on both
    # sides, so the oracle compares doubles bitwise
    lay = _ensure_layout(sf_dir, "weighted")
    with ShardedGraph(lay) as g:
        return g.sssp(SSSP_SOURCES, max_iterations=SSSP_ROUNDS)


def q_graph_wcc(sf_dir: str):
    lay = _ensure_layout(sf_dir, "undirected")
    with ShardedGraph(lay) as g:
        return g.weakly_connected_components()


def q_graph_labelprop(sf_dir: str):
    lay = _ensure_layout(sf_dir, "undirected")
    with ShardedGraph(lay) as g:
        return g.label_propagation(max_iterations=10)


def q_graph_mis(sf_dir: str):
    """Luby maximal independent set via the public VertexProgram protocol
    (``rounds.MISProgram`` — no engine edits); run to zero undecided."""
    from cassovary_ray.rounds import MISProgram

    lay = _ensure_layout(sf_dir, "undirected")
    with ShardedGraph(lay) as g:
        ds = g.run_program(MISProgram(), max_iterations=None, tolerance=0.0)
    return ds.map_batches(
        lambda b: b.filter(pc.equal(b["in_mis"], 1.0)).select(["vertex"]),
        batch_format="pyarrow")


def q_graph_coloring(sf_dir: str):
    """Greedy graph coloring (Luby MIS per color class) via the public
    VertexProgram protocol — fixed 2-round-per-color schedule so the
    DuckDB unroll evaluates the literal same priorities (max_colors
    matches the oracle's unroll bound: divergence raises, never silent;
    2 rounds/color minimizes the oracle's CTE chain, which hits DuckDB's
    expression-depth cap near ~700 CTEs)."""
    from cassovary_ray.rounds import ColoringProgram

    lay = _ensure_layout(sf_dir, "undirected")
    with ShardedGraph(lay) as g:
        ds = g.run_program(ColoringProgram(rounds_per_color=2, max_colors=64),
                           max_iterations=None, tolerance=0.0)
    return ds.map_batches(
        lambda b: pa.table({"vertex": b["vertex"],
                            "color": b["color"].cast(pa.int64())}),
        batch_format="pyarrow")


def q_graph_hits(sf_dir: str):
    fwd = _ensure_layout(sf_dir, "directed")
    rev = _ensure_layout(sf_dir, "reversed")
    with ShardedGraph(fwd, reverse_layout_dir=rev) as g:
        # pinned iterations (see q_graph_pagerank) for the unrolled oracle
        hubs, auth, _ = g.hits(max_iterations=8, tolerance=0.0)
        h = hubs.to_pandas()
        a = auth.to_pandas()
    return h.merge(a, on="vertex")


def q_graph_salsa(sf_dir: str):
    fwd = _ensure_layout(sf_dir, "directed")
    rev = _ensure_layout(sf_dir, "reversed")
    with ShardedGraph(fwd, reverse_layout_dir=rev) as g:
        # pinned iterations (see q_graph_pagerank) for the unrolled oracle
        hubs, auth, _ = g.salsa(max_iterations=8, tolerance=0.0)
        h = hubs.to_pandas()
        a = auth.to_pandas()
    return h.merge(a, on="vertex")


def q_graph_walk_visits(sf_dir: str):
    lay = _ensure_layout(sf_dir, "directed")
    with ShardedGraph(lay) as g:
        return g.random_walks([0] * 64, 50, reset_prob=0.15, seed=11).to_pandas()


def q_graph_walk_corpus(sf_dir: str):
    # DeepWalk-style corpus — hash-gated: the counter RNG is a pure function
    # of (seed, walker, step), so oracles.walk_corpus_sql replays the exact
    # walks in DuckDB (splitmix64 re-expressed in HUGEINT limbs)
    lay = _ensure_layout(sf_dir, "directed")
    with ShardedGraph(lay) as g:
        corpus = g.walk_corpus(walks_per_vertex=2, walk_length=10, seed=17)
        return corpus.sort(["walker_id", "walk", "step"])


def q_graph_node2vec(sf_dir: str):
    # second-order biased walks — hash-gated: class counts are integers,
    # class weights exact dyadics (p=0.5, q=2.0), and the counter RNG is a
    # pure function of (seed, walker, step), so oracles.node2vec_visits_sql
    # replays the literal same biased steps in DuckDB
    # (bit-exact simulator cross-check in test_node2vec.py)
    lay = _ensure_layout(sf_dir, "directed")
    with ShardedGraph(lay) as g:
        return g.node2vec_walks([0] * 64, 50, p=0.5, q=2.0,
                                reset_prob=0.15, seed=11).to_pandas()


def q_graph_skipgram(sf_dir: str):
    # DeepWalk → word2vec training pairs: walk corpus assembled to sequences
    # (one keyed exchange), then vectorized windowed pair counts — hash-gated
    # via oracles.skipgram_sql (deterministic corpus + pure pair transform)
    lay = _ensure_layout(sf_dir, "directed")
    with ShardedGraph(lay) as g:
        seqs = g.walk_corpus(walks_per_vertex=1, walk_length=10, seed=17,
                             output="sequences")
        return textops.skipgram_pairs(seqs, window=2).sort(
            ["center", "context"])


def q_graph_neighborhood(sf_dir: str):
    # exact ANF: N(t) pairs within distance t, t = 0..4 (bitset mode —
    # oracle scale; the HLL scale path is q_graph_anf_hll)
    lay = _ensure_layout(sf_dir, "directed")
    with ShardedGraph(lay) as g:
        return g.neighborhood_function(mode="exact", max_distance=4)


def q_graph_effective_diameter(sf_dir: str):
    import pandas as pd

    from cassovary_ray.engine import effective_diameter

    lay = _ensure_layout(sf_dir, "directed")
    with ShardedGraph(lay) as g:
        nf = g.neighborhood_function(mode="exact", max_distance=4)
    return pd.DataFrame({"eff_diameter": [effective_diameter(nf)]})


def q_graph_anf_hll(sf_dir: str):
    # HyperBall scale path: 64 one-byte HLL registers per vertex. Hash-
    # gated via oracles.anf_hll_sql: N(t) is the 2^-20-grid-quantized
    # integer sum of per-vertex ball estimates (order-independent exact
    # fold); accuracy vs exact additionally pinned in test_anf.py.
    lay = _ensure_layout(sf_dir, "directed")
    with ShardedGraph(lay) as g:
        return g.neighborhood_function(mode="hll", precision_bits=6,
                                       max_distance=4)


def q_graph_hyperball(sf_dir: str):
    """Per-vertex HyperBall in-ball HLL estimates at distance 4 —
    hash-gated: ball membership is set algebra, registers are integer bit
    ops, and the HLL indicator sum is a fixed ascending-k count fold
    (``engine.hll_estimates``) that ``oracles.hyperball_sql`` replays as one
    left-associated SQL expression, so the doubles are identical (the
    linear-counting ``ln`` branch may differ by 1 ulp, far below the gate's
    rounding)."""
    lay = _ensure_layout(sf_dir, "directed")
    with ShardedGraph(lay) as g:
        g.neighborhood_function(mode="hll", precision_bits=6, max_distance=4)
        return g.anf_ball_sizes().materialize()


def q_graph_bfs(sf_dir: str):
    return analytics.bfs(derived_edges(sf_dir), [0], max_depth=4)


def q_graph_ego_net(sf_dir: str):
    """Radius-1 undirected ego network of two seed vertices: induced
    directed edges on the ball."""
    return analytics.ego_net(derived_edges(sf_dir), [7, 500], radius=1,
                             direction="both")


def q_graph_adjacency_stats(sf_dir: str):
    """Exercises the vectorized adjacency fold: per-src neighbor-list stats
    recomputed FROM the list column (so a wrong fold breaks the values)."""
    adj = analytics.adjacency_lists(derived_edges(sf_dir))

    def stats(batch: pa.Table) -> pa.Table:
        srcs = batch["src"].to_numpy(zero_copy_only=False)
        col = batch["neighbors"].combine_chunks() if isinstance(
            batch["neighbors"], pa.ChunkedArray) else batch["neighbors"]
        n, mn, mx, sm = [], [], [], []
        for lst in col.to_pylist():
            a = np.asarray(lst, dtype=np.int64)
            n.append(len(a))
            mn.append(int(a.min()))
            mx.append(int(a.max()))
            sm.append(int(a.sum()))
        return pa.table({"src": pa.array(srcs, pa.int64()),
                         "n_neighbors": pa.array(n, pa.int64()),
                         "min_nbr": pa.array(mn, pa.int64()),
                         "max_nbr": pa.array(mx, pa.int64()),
                         "sum_nbr": pa.array(sm, pa.int64())})

    return adj.map_batches(stats, batch_format="pyarrow")


def q_graph_labels(sf_dir: str):
    """Typed node-labels surface: attach label = vertex % 7 and join it onto
    the degree table (labels.with_label left-outer join)."""
    from cassovary_ray.labels import NodeLabels

    deg = analytics.degrees(derived_edges(sf_dir))
    lab = deg.map_batches(
        lambda b: pa.table({
            "vertex": b["vertex"],
            "label": pa.array(b["vertex"].to_numpy(zero_copy_only=False) % 7,
                              pa.int64()),
        }),
        batch_format="pyarrow",
    )
    labs = NodeLabels()
    labs.add("community", lab)
    return labs.with_label(deg, "community").select_columns(
        ["vertex", "out_deg", "in_deg", "community"]
    )


def q_graph_numberer(sf_dir: str):
    """MapNodeNumberer round-trip: name every vertex 'n<id>', rename the edge
    endpoints to names, translate back through the numberer (join path) —
    output must equal graph_edges."""
    from cassovary_ray.numberer import MapNodeNumberer

    e = derived_edges(sf_dir)
    verts = analytics.degrees(e).select_columns(["vertex"])
    mapping = verts.map_batches(
        lambda b: pa.table({
            "name": pa.array(["n%d" % v for v in
                              b["vertex"].to_numpy(zero_copy_only=False)],
                             pa.string()),
            "id": b["vertex"],
        }),
        batch_format="pyarrow",
    )
    named = e.map_batches(
        lambda b: pa.table({
            "src": pa.array(["n%d" % v for v in
                             b["src"].to_numpy(zero_copy_only=False)], pa.string()),
            "dst": pa.array(["n%d" % v for v in
                             b["dst"].to_numpy(zero_copy_only=False)], pa.string()),
        }),
        batch_format="pyarrow",
    )
    n = MapNodeNumberer(mapping, broadcast_limit=1)  # force the join path
    return n.translate_edges(named)


def q_graph_dfs(sf_dir: str):
    """Driver-side DFS fallback with discovery/finish times (rows-only)."""
    from cassovary_ray.traversal import dfs

    return dfs(derived_edges(sf_dir), [0])


def q_graph_bipartite(sf_dir: str):
    """Engine bipartite flow over the derived graph: supplied lefts are the
    20 smallest src vertices, weight 1.0 (rows-only)."""
    e = derived_edges(sf_dir)
    srcs = [r["vertex"] for r in
            analytics.out_degrees(e).select_columns(["vertex"])
            .sort("vertex").take(20)]
    fwd = _ensure_layout(sf_dir, "directed")
    rev = _ensure_layout(sf_dir, "reversed")
    with ShardedGraph(fwd, reverse_layout_dir=rev) as g:
        left, right = g.bipartite_link_analysis(
            {v: 1.0 for v in srcs}, num_iterations=2
        )
        ldf = left.to_pandas()
        rdf = right.to_pandas()
    ldf["side"] = "left"
    rdf["side"] = "right"
    import pandas as pd

    out = pd.concat([ldf, rdf], ignore_index=True)
    # list column -> sortable/hashable string for the driver's value compare
    out["contributors"] = out["contributors"].map(
        lambda l: ",".join(str(int(x)) for x in l)
    )
    return out


#: WTF pipeline constants, shared verbatim with the SQL oracle: user 0's
#: circle of trust is its top-10 exact-PPR vertices, recommendations are
#: the top-20 authority scores.
WTF_USER = 0
WTF_COT_SIZE = 10
WTF_TOP_K = 20


def q_graph_wtf(sf_dir: str):
    """Who-To-Follow (Gupta et al., WWW'13 — Twitter's production WTF,
    the reference's flagship application): circle of trust = the user's
    top-``WTF_COT_SIZE`` exact-PPR vertices (selection by quantized
    ``floor(rank·1e6)`` desc / vertex asc — coarse enough that the
    ~1e-16 summation divergence between engine and oracle cannot flip
    the cut), then one personalized-SALSA round — the engine's
    bipartite alternating flow (``IterativeLinkAnalyzer.scala:36-184``
    semantics) seeded with the PPR weights over the circle's induced
    out-edges. Recommendations = authority-side vertices minus the user
    and the accounts it already follows (anti-join, never a driver
    set at scale), top-``WTF_TOP_K`` by quantized score desc / vertex
    asc. Both rank phases run in ONE graph session."""
    fwd = _ensure_layout(sf_dir, "directed")
    rev = _ensure_layout(sf_dir, "reversed")
    with ShardedGraph(fwd, reverse_layout_dir=rev) as g:
        ppr = g.personalized_pagerank({WTF_USER: 1.0}, max_iterations=10,
                                      tolerance=0.0)

        def quant_rank(b: pa.Table) -> pa.Table:
            q = pc.cast(pc.floor(pc.multiply(b["rank"], 1000000.0)),
                        pa.int64())
            return b.append_column("q", q)

        cot = (ppr.map_batches(quant_rank, batch_format="pyarrow")
               .sort(["q", "vertex"], descending=[True, False])
               .take(WTF_COT_SIZE))
        left_init = {r["vertex"]: r["rank"] for r in cot}
        _, right = g.bipartite_link_analysis(left_init, num_iterations=2)

    def followed_batch(b: pa.Table) -> pa.Table:
        f = b.filter(pc.equal(b["src"], WTF_USER))
        return pa.table({"vertex": f["dst"]})

    followed = derived_edges(sf_dir).map_batches(followed_batch,
                                                 batch_format="pyarrow")

    def stringify(b: pa.Table) -> pa.Table:
        # list<int64> → the oracle's comma-joined string (Arrow joins
        # cannot carry list-typed non-key fields)
        s = pc.binary_join(
            pc.cast(b["contributors"], pa.list_(pa.string())), ",")
        return b.set_column(b.schema.get_field_index("contributors"),
                            "contributors", s)

    cand = joins.shuffle_join(
        right.map_batches(stringify, batch_format="pyarrow"),
        followed, on="vertex", how="anti")

    def quant_score(b: pa.Table) -> pa.Table:
        b = b.filter(pc.not_equal(b["vertex"], WTF_USER))
        q = pc.cast(pc.floor(pc.multiply(b["weight"], 1000000000.0)),
                    pa.int64())
        return b.append_column("q", q)

    return (cand.map_batches(quant_score, batch_format="pyarrow")
            .sort(["q", "vertex"], descending=[True, False])
            .limit(WTF_TOP_K).drop_columns(["q"]))


def q_graph_wtf_batch(sf_dir: str):
    """Batch Who-To-Follow for EVERY user in one dataflow — the production
    batch shape of ``graph_wtf`` (Gupta et al., WWW'13: Twitter recomputed
    recommendations for all users periodically). Pure Ray-Data composition,
    no per-user loop and no BSP:

    1. Monte-Carlo circles of trust for ALL users at once from the DeepWalk
       corpus (``walk_corpus`` is counter-RNG exact, so the oracle replays
       the literal walks in SQL — same parameters as ``graph_walk_corpus``):
       visit counts per (user, vertex) via a segment fold, top-5 per user
       via ``topk_per_key`` (integer counts — no float-cut risk).
    2. One personalized-SALSA forward pass batched as cot ⋈ outdeg ⋈ edges
       with per-edge share ``visits/deg·0.9`` (the bipartite pass-1 formula,
       ``IterativeLinkAnalyzer.scala:152-156``) summed per (user, candidate)
       by a segment fold.
    3. Already-followed + self exclusion as a distributed anti-join.
    4. Top-5 per user by quantized score desc / candidate asc (the
       ``graph_wtf`` tie discipline). Returns (user_id, rec, score, rank).
    """
    e = derived_edges(sf_dir)
    lay = _ensure_layout(sf_dir, "directed")
    with ShardedGraph(lay) as g:
        corpus = g.walk_corpus(walks_per_vertex=2, walk_length=10, seed=17)
    visits = analytics.fold_by_keys(
        corpus.select_columns(["walker_id", "vertex"]),
        ["walker_id", "vertex"], [("vertex", "count", "visits")])
    cot = analytics.topk_per_key(visits, "walker_id", ["visits", "vertex"],
                                 [True, False], k=5).drop_columns(["rank"])
    deg = analytics.out_degrees(e)  # (vertex, out_deg), multiplicity-counted
    # materialize() between the chained joins: Ray pins an aggregator pool
    # per live join operator — three concurrent joins deadlock on small
    # clusters (the _auto_partitions discipline, analytics.py)
    hubs = joins.shuffle_join(cot, deg, on="vertex").materialize()

    def edge_vertex(b: pa.Table) -> pa.Table:
        return pa.table({"vertex": b["src"], "dst": b["dst"]})

    flow = joins.shuffle_join(
        hubs, e.map_batches(edge_vertex, batch_format="pyarrow"),
        on="vertex").materialize()

    def share(b: pa.Table) -> pa.Table:
        w = pc.multiply(pc.divide(pc.cast(b["visits"], pa.float64()),
                                  pc.cast(b["out_deg"], pa.float64())), 0.9)
        return pa.table({"user_id": b["walker_id"], "rec": b["dst"],
                         "share": w})

    scores = analytics.fold_by_keys(
        flow.map_batches(share, batch_format="pyarrow"),
        ["user_id", "rec"], [("share", "sum", "score")])

    def followed_batch(b: pa.Table) -> pa.Table:
        return pa.table({"user_id": b["src"], "rec": b["dst"]})

    cand = joins.shuffle_join(
        scores, e.map_batches(followed_batch, batch_format="pyarrow"),
        on=("user_id", "rec"), how="anti")

    def quant(b: pa.Table) -> pa.Table:
        b = b.filter(pc.not_equal(b["user_id"], b["rec"]))
        q = pc.cast(pc.floor(pc.multiply(b["score"], 1000000000.0)),
                    pa.int64())
        return b.append_column("q", q)

    return analytics.topk_per_key(
        cand.map_batches(quant, batch_format="pyarrow"),
        "user_id", ["q", "rec"], [True, False], k=5).drop_columns(["q"])


def q_graph_closeness(sf_dir: str):
    """Sampled-source closeness via ONE tagged multi-source BFS (sources =
    vertices 0..7; the all-sources variant is O(n·m) by nature). max_depth=32
    is shared with the SQL oracle: it bounds the recursive CTE (which would
    otherwise chase cycles to ever-larger depths before the min) and is far
    above the derived graph's eccentricity (≤4 at sf0.01), so distances are
    uncapped in practice."""
    return analytics.closeness_centrality(
        derived_edges(sf_dir), sources=list(range(8)), normalized=True,
        max_depth=32,
    )


def q_doc_ngram_jaccard(sf_dir: str):
    return textops.ngram_jaccard_pairs(
        _table(sf_dir, "documents"), n=3, max_df=50, threshold=0.5
    )


def q_doc_stats(sf_dir: str):
    return textops.doc_stats(_table(sf_dir, "documents"))


def q_doc_exact_dedup(sf_dir: str):
    return textops.exact_dedup(_table(sf_dir, "documents"))


def q_doc_token_counts(sf_dir: str):
    return textops.token_counts(_table(sf_dir, "documents"))


def q_doc_quality(sf_dir: str):
    return textops.quality_scores(_table(sf_dir, "documents"))


def q_doc_repetition(sf_dir: str):
    """Gopher-style per-doc repetition counts (integer num/denom pairs)."""
    return textops.repetition_signals(_table(sf_dir, "documents"))


def q_doc_substring_dups(sf_dir: str):
    """ExactSubstr duplicate-span counts: per doc, positional 8-gram slots
    shared (as exact text) with at least one OTHER document."""
    return textops.substring_dup_counts(_table(sf_dir, "documents"), n=8)


def q_doc_contamination(sf_dir: str):
    """Benchmark decontamination: distinct 8-gram overlap of every training
    doc (doc_id%37≠0) against the benchmark subset (doc_id%37==0)."""
    docs = _table(sf_dir, "documents")

    def part(keep_ref: bool):
        def f(b: pa.Table) -> pa.Table:
            m = (b["doc_id"].to_numpy(zero_copy_only=False) % 37) == 0
            return b.filter(pa.array(m if keep_ref else ~m))
        return f

    ref = docs.map_batches(part(True), batch_format="pyarrow")
    train = docs.map_batches(part(False), batch_format="pyarrow")
    return textops.contamination_counts(train, ref, n=8)


def q_doc_gopher(sf_dir: str):
    """Gopher-rule quality gate verdicts (integer percent thresholds)."""
    return textops.gopher_filter(_table(sf_dir, "documents"))


def q_doc_pii(sf_dir: str):
    """PII scrub: redacted-text md5 + per-kind match counts."""
    return textops.redact_pii(_table(sf_dir, "documents"))


def q_doc_langid(sf_dir: str):
    return textops.lang_id(_table(sf_dir, "documents"))


def q_doc_simhash(sf_dir: str):
    return textops.simhash(_table(sf_dir, "documents"))


def q_doc_minhash_pairs(sf_dir: str):
    return textops.minhash_lsh_pairs(
        _table(sf_dir, "documents"), jaccard_threshold=0.4
    )


def q_doc_fingerprints(sf_dir: str):
    return textops.rolling_fingerprint(_table(sf_dir, "documents"))


def q_doc_paragraph_dedup(sf_dir: str):
    return textops.paragraph_dedup(_table(sf_dir, "documents"))


def q_doc_paragraph_rewrite(sf_dir: str):
    return textops.paragraph_dedup_docs(_table(sf_dir, "documents"))


# fixed per-language sample rates for the gate query (deterministic md5 CDF)
_SAMPLE_RATES = {"en": 0.5, "de": 0.25, "fr": 0.1}


def q_doc_sample(sf_dir: str):
    out = textops.stratified_sample(
        _table(sf_dir, "documents"), _SAMPLE_RATES, default_rate=0.05
    )
    return out.select_columns(["doc_id", "lang"])


def q_doc_rarity(sf_dir: str):
    return textops.unigram_rarity(_table(sf_dir, "documents"))


def q_doc_bpe_tokens(sf_dir: str):
    return textops.bpe_token_counts(_table(sf_dir, "documents"))


def q_knn_top5(sf_dir: str):
    return ann.knn_bruteforce(_table(sf_dir, "embeddings"), list(range(10)), k=5)


def q_knn_lsh(sf_dir: str):
    return ann.lsh_knn(_table(sf_dir, "embeddings"), list(range(10)), k=5)


def q_knn_ivf(sf_dir: str):
    return ann.ivf_knn(_table(sf_dir, "embeddings"), list(range(10)), k=5)


def q_knn_ivf_kmeans(sf_dir: str):
    """IVF with a Lloyd-trained coarse quantizer — hash-gated: the oracle
    unrolls the same spherical-k-means training in SQL from the literal
    init directions (`oracles.kmeans_ivf_knn_sql`); recall vs brute force
    is additionally pinned by `tests/test_ann.py`."""
    emb = _table(sf_dir, "embeddings")
    cents = ann.kmeans_centroids(emb, n_centroids=16, iters=3)
    return ann.ivf_knn(emb, list(range(10)), k=5, n_centroids=16,
                       centroids=cents)


def q_embedding_dups(sf_dir: str):
    # 0.42 sits in a 2.7e-3-wide empty band of the sf0.01 cosine distribution
    # (boundary-flip-safe for the float comparison with the oracle)
    return ann.embedding_dup_pairs(_table(sf_dir, "embeddings"), threshold=0.42)


def q_embedding_dup_clusters(sf_dir: str):
    """Embedding near-dup clustering: components over the cosine pair graph
    (same 0.42 boundary-safe threshold as embedding_dups), canonical = min
    vec_id, singletons map to themselves."""
    return ann.embedding_dup_clusters(_table(sf_dir, "embeddings"),
                                      threshold=0.42)


def q_events_hourly(sf_dir: str):
    return events_ops.hourly_user_counts(_table(sf_dir, "events"))


def q_events_sessions(sf_dir: str):
    return events_ops.sessionize(_table(sf_dir, "events"), gap_minutes=30)


def q_events_type_totals(sf_dir: str):
    return events_ops.event_type_totals(_table(sf_dir, "events"))


def q_events_sliding(sf_dir: str):
    return events_ops.sliding_window_counts(
        _table(sf_dir, "events"), window_minutes=60, step_minutes=15
    )


def q_events_sliding_users(sf_dir: str):
    """Distinct active users per 60-min sliding window (15-min step)."""
    return events_ops.sliding_unique_users(
        _table(sf_dir, "events"), window_minutes=60, step_minutes=15
    )


def q_events_retention(sf_dir: str):
    return events_ops.hourly_retention(_table(sf_dir, "events"))


def q_events_asof(sf_dir: str):
    """Per purchase: latest preceding click by the same user (as-of join)."""
    return events_ops.asof_latest(
        _table(sf_dir, "events"), probe_type="purchase", build_type="click"
    )


def q_events_range_join(sf_dir: str):
    """Per purchase: same-user clicks in the trailing 60-min window."""
    return events_ops.range_join_counts(
        _table(sf_dir, "events"), probe_type="purchase", build_type="click",
        window_minutes=60,
    )


def q_join_orders_customer(sf_dir: str):
    """Broadcast hash join: orders (probe stream) x customer (small build
    side, ray.put once) — the dimension-table join shape at 100 TB."""
    orders = _table(sf_dir, "orders").select_columns(
        ["o_orderkey", "o_custkey", "o_totalprice"])
    cust = _table(sf_dir, "customer").select_columns(
        ["c_custkey", "c_name", "c_nationkey"])
    return joins.broadcast_hash_join(orders, cust,
                                     on="o_custkey", right_on="c_custkey")


def q_join_lineitem_orders(sf_dir: str):
    """Native hash-shuffle join: both sides large, exchanged once on the
    key hash (Ray Data ``Dataset.join``)."""
    li = _table(sf_dir, "lineitem").select_columns(
        ["l_orderkey", "l_linenumber", "l_quantity"])
    orders = _table(sf_dir, "orders").select_columns(
        ["o_orderkey", "o_custkey", "o_orderstatus"])
    out = joins.shuffle_join(li, orders, on="l_orderkey",
                             right_on="o_orderkey", num_partitions=8)
    return out.select_columns(["l_orderkey", "l_linenumber", "l_quantity",
                               "o_custkey", "o_orderstatus"])


def q_join_customer_no_f_orders(sf_dir: str):
    """Anti join (shuffle path): customers with no 'F'-status order —
    filter pushed below the exchange so only matching build rows ship."""
    cust = _table(sf_dir, "customer").select_columns(
        ["c_custkey", "c_acctbal"])
    orders = (_table(sf_dir, "orders")
              .select_columns(["o_custkey", "o_orderstatus"])
              .map_batches(
                  lambda b: b.filter(
                      pc.equal(b["o_orderstatus"], "F")).select(["o_custkey"]),
                  batch_format="pyarrow"))
    return joins.shuffle_join(cust, orders, on="c_custkey",
                              right_on="o_custkey", how="anti",
                              num_partitions=8)


def q_join_customer_order_counts(sf_dir: str):
    """Broadcast LEFT join of a pre-aggregated build side: per-customer
    order count, 0 for customers with no orders (null-fill after the
    outer join). Pre-aggregate-then-broadcast instead of shuffling the
    fact table on customer key."""
    cust = _table(sf_dir, "customer").select_columns(["c_custkey"])
    cnt = (_table(sf_dir, "orders").select_columns(["o_custkey"])
           .groupby("o_custkey").aggregate(Count()))

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({"o_custkey": b["o_custkey"],
                         "n_orders": b["count()"].cast(pa.int64())})

    cnt = cnt.map_batches(rename, batch_format="pyarrow")
    out = joins.broadcast_hash_join(cust, cnt, on="c_custkey",
                                    right_on="o_custkey", how="left")

    def fill(b: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": b["c_custkey"],
            "n_orders": pc.fill_null(b["n_orders"], 0).cast(pa.int64()),
        })

    return out.map_batches(fill, batch_format="pyarrow")


def q_doc_vocab(sf_dir: str):
    return textops.token_frequencies(_table(sf_dir, "documents"))


def q_doc_quality_lr(sf_dir: str):
    """Distributed full-batch logistic-regression training INSIDE the
    dataflow (quality/language gate): integer-quantized gradient sums make
    the 10-step loop bit-reproducible and SQL-unrollable (learn.py)."""
    return learn.train_quality_lr(_table(sf_dir, "documents"),
                                  iterations=10, lr=0.5)


def q_doc_lm_score(sf_dir: str):
    """Corpus-trained bigram-LM log-likelihood per doc (the CCNet-style
    quality filter signal) — exact-int 2^-20-quantized log-prob fold,
    hash-gated against the pure-SQL bigram model."""
    return textops.lm_scores(_table(sf_dir, "documents"))


def q_events_anomaly(sf_dir: str):
    """Hourly volume-spike detection per event type: ≥3σ outlier hours by
    the exact-integer z² test (zero floats → hash-gated)."""
    return events_ops.hourly_anomalies(_table(sf_dir, "events"),
                                       z_threshold=3)


def q_events_count_min(sf_dir: str):
    """Count-Min sketch heavy-hitter estimates next to exact per-user
    counts (all-integer sketch → hash-gated; est ≥ exact by construction)."""
    return events_ops.count_min_counts(_table(sf_dir, "events"),
                                       depth=4, width=256, seed=7)


def q_graph_reciprocity(sf_dir: str):
    return analytics.reciprocity(derived_edges(sf_dir))


def q_graph_degree_hist(sf_dir: str):
    return analytics.degree_histogram(derived_edges(sf_dir), "out")


def q_graph_two_hop(sf_dir: str):
    """Two-hop neighborhood sizes with the shared hub guard (middles of
    total degree > 120 excluded — the spec'd skew cut, see
    ``analytics.two_hop_counts``)."""
    return analytics.two_hop_counts(derived_edges(sf_dir), max_mid_deg=120)


def q_graph_kcore(sf_dir: str):
    """90-core of the derived graph (nonempty with real peeling at sf0.01:
    3 peel rounds drop 28 of 1021 vertices). max_rounds=10 matches the
    oracle's 10-round unroll — the query raises rather than silently
    mismatching if peeling ever needs more."""
    return analytics.k_core(derived_edges(sf_dir), k=90, max_rounds=10)


def q_graph_edge_supports(sf_dir: str):
    """Triangle support per canonical undirected edge (0 where the edge
    closes no triangle) — the k-truss peeling primitive."""
    return analytics.edge_triangle_supports(derived_edges(sf_dir))


def q_graph_ktruss(sf_dir: str):
    """8-truss of the derived graph (real cascade at sf0.01: 7 peel rounds,
    56,508 → 55,043 edges). max_rounds=10 matches the oracle's 10-round
    unroll — the query raises rather than silently mismatching if peeling
    ever needs more (the ``q_graph_kcore`` discipline)."""
    return analytics.k_truss(derived_edges(sf_dir), k=8, max_rounds=10)


def q_graph_conductance(sf_dir: str):
    """Per-community conductance under the deterministic vertex%7
    assignment."""
    e = derived_edges(sf_dir)

    def vert_partial(b: pa.Table) -> pa.Table:
        v = np.unique(np.concatenate([
            b["src"].to_numpy(zero_copy_only=False),
            b["dst"].to_numpy(zero_copy_only=False)]))
        return pa.table({"vertex": pa.array(v, pa.int64())})

    comm = (
        e.map_batches(vert_partial, batch_format="pyarrow")
        .groupby("vertex").aggregate(Count(alias_name="_c"))
        .map_batches(
            lambda b: pa.table({
                "vertex": b["vertex"],
                "community": pa.array(
                    b["vertex"].to_numpy(zero_copy_only=False) % 7, pa.int64())}),
            batch_format="pyarrow")
    )
    return analytics.conductance(e, comm)


def q_graph_contract(sf_dir: str):
    """Community contraction under vertex%7: supergraph edge weights."""
    e = derived_edges(sf_dir)

    def vert_partial(b: pa.Table) -> pa.Table:
        v = np.unique(np.concatenate([
            b["src"].to_numpy(zero_copy_only=False),
            b["dst"].to_numpy(zero_copy_only=False)]))
        return pa.table({"vertex": pa.array(v, pa.int64())})

    comm = (
        e.map_batches(vert_partial, batch_format="pyarrow")
        .groupby("vertex").aggregate(Count(alias_name="_c"))
        .map_batches(
            lambda b: pa.table({
                "vertex": b["vertex"],
                "community": pa.array(
                    b["vertex"].to_numpy(zero_copy_only=False) % 7, pa.int64())}),
            batch_format="pyarrow")
    )
    return analytics.contract_graph(e, comm)


def q_graph_sample_neighbors(sf_dir: str):
    """Deterministic 3-fanout neighbor sample (md5 order, seed 7)."""
    return analytics.sample_neighbors(derived_edges(sf_dir), k=3, seed=7)


def _edge_urls_batch(b: pa.Table) -> pa.Table:
    """Synthetic url scaffolding for the web_* gate queries (not a hot
    path): vertex v → ``http://h{v%53}.test/p/{v}``, mirrored verbatim by
    the oracles' ``'http://h' || (v % 53) || '.test/p/' || v``."""
    def mk(col):
        return pa.array(
            [f"http://h{v % 53}.test/p/{v}"
             for v in b[col].to_numpy(zero_copy_only=False)], pa.string())
    return pa.table({"src_url": mk("src"), "dst_url": mk("dst")})


def q_web_host_graph(sf_dir: str):
    """Host-level collapse of a synthetic page-link graph (urls derived
    deterministically from the edge table): ``(src_host, dst_host,
    n_links)`` — the web-graph reduction feeding host-level PageRank."""
    from cassovary_ray import extract

    return extract.host_graph(
        derived_edges(sf_dir).map_batches(_edge_urls_batch,
                                          batch_format="pyarrow"))


def q_web_crawl_frontier(sf_dir: str):
    """Crawl frontier of a PARTIAL crawl (pages with ``src % 5 != 0``
    fetched — a crawler only knows the outlinks of fetched pages): link
    targets with no crawled page of their own, ranked by in-link count —
    one pre-combined groupby + a distributed anti-join (no url-universe
    broadcast, no driver set)."""
    from cassovary_ray import extract

    def fetched(b: pa.Table) -> pa.Table:
        src = b["src"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(src % 5 != 0))

    return extract.crawl_frontier(
        derived_edges(sf_dir).map_batches(fetched, batch_format="pyarrow")
        .map_batches(_edge_urls_batch, batch_format="pyarrow"))


def q_web_host_pagerank(sf_dir: str):
    """End-to-end web composition: page urls → host-graph collapse →
    weighted PageRank over hosts (pinned 10 rounds). The engine runs the
    full string path (urls → RE2 host pull → pre-combined link counts →
    host index from the host-name digits); the oracle replays the same
    graph arithmetically as (src % 53, dst % 53, count) because host
    ``h{k}.test`` ⇔ ``k`` by construction — equal ranks certify the whole
    chain."""
    from cassovary_ray import extract

    d = _layout_dir(sf_dir, "hosts")
    try:
        read_layout_manifest(d)
    except FileNotFoundError:
        hg = extract.host_graph(
            derived_edges(sf_dir).map_batches(_edge_urls_batch,
                                              batch_format="pyarrow"))

        def to_ids(b: pa.Table) -> pa.Table:
            def hid(col):
                m = pc.extract_regex(b[col], r"^h(?P<k>\d+)\.")
                return pc.cast(pc.struct_field(m, "k"), pa.int64())

            return pa.table({"src": hid("src_host"), "dst": hid("dst_host"),
                             "weight": pc.cast(b["n_links"], pa.float64())})

        build_edge_layout(hg.map_batches(to_ids, batch_format="pyarrow"),
                          d, ENGINE_PARTS, weighted=True)
    with ShardedGraph(d) as g:
        return g.pagerank(max_iterations=10, tolerance=0.0)


#: TrustRank trusted-host seed set: hosts 0-3, uniform ¼ each (exact binary
#: fractions — no decimal-literal float divergence vs the oracle). A real
#: deployment feeds a curated seed list; the rule here is deterministic so
#: both sides embed the identical distribution.
TRUST_SEEDS = {0: 0.25, 1: 0.25, 2: 0.25, 3: 0.25}


def q_web_trustrank(sf_dir: str):
    """TrustRank (Gyöngyi, Garcia-Molina & Pedersen, VLDB'04) over the
    host graph: personalized PageRank whose reset AND dangling mass return
    to a trusted-host seed distribution instead of the uniform vector, so
    trust decays with link distance from the seeds and hosts reachable
    only from untrusted regions are demoted. The engine runs the full
    string chain (urls → RE2 host pull → distinct host edges → layout →
    seeded exact PPR, 10 pinned rounds); the oracle replays the same graph
    arithmetically as DISTINCT (src % 53, dst % 53) because host
    ``h{k}.test`` ⇔ ``k`` by construction (see q_web_host_pagerank)."""
    d = _ensure_hosts_unweighted_layout(sf_dir)
    with ShardedGraph(d) as g:
        return g.personalized_pagerank(TRUST_SEEDS, max_iterations=10,
                                       tolerance=0.0)


def _host_id_edges(sf_dir: str):
    """``Dataset(src, dst)`` — the DISTINCT host→host link graph with int
    ids (host ``h{k}.test`` ⇔ ``k`` by construction; the full url → RE2
    host pull → pre-grouped collapse chain)."""
    from cassovary_ray import extract

    hg = extract.host_graph(
        derived_edges(sf_dir).map_batches(_edge_urls_batch,
                                          batch_format="pyarrow"))

    def to_ids(b: pa.Table) -> pa.Table:
        def hid(col):
            m = pc.extract_regex(b[col], r"^h(?P<k>\d+)\.")
            return pc.cast(pc.struct_field(m, "k"), pa.int64())

        # host_graph pre-groups, so (src, dst) pairs are already
        # distinct — drop the link counts
        return pa.table({"src": hid("src_host"), "dst": hid("dst_host")})

    return hg.map_batches(to_ids, batch_format="pyarrow")


def _ensure_hosts_unweighted_layout(sf_dir: str) -> str:
    """Unweighted host-graph layout (distinct host→host link pairs) shared
    by the TrustRank / spam-mass family."""
    d = _layout_dir(sf_dir, "hosts_unweighted")
    try:
        read_layout_manifest(d)
    except FileNotFoundError:
        build_edge_layout(_host_id_edges(sf_dir), d, ENGINE_PARTS)
    return d


def q_web_host_mirrors(sf_dir: str):
    """Mirror-host detection: per host, the top-3 hosts with the most
    similar outlink TARGET sets (Jaccard over the distinct host→host
    graph) — the classic duplicate-site / mirror signal used to collapse
    a web corpus before training. Reuses the guarded similarity machinery
    (``Similarity.scala`` semantics: score desc, lower id ties), with the
    same hub skew guard and oracle threshold as ``graph_jaccard_top3``."""
    return analytics.similarity_top_k(_host_id_edges(sf_dir), k=3,
                                      metric="jaccard",
                                      max_in_deg=SIM_MAX_IN_DEG)


def q_web_spam_mass(sf_dir: str):
    """Spam mass (Gyöngyi, Berkhin, Garcia-Molina & Pedersen, VLDB'06):
    the fraction of a host's PageRank that does NOT survive when the
    reset/dangling mass is restricted to the trusted seeds —
    ``(pr − tr) / pr``. Hosts whose rank comes mostly from untrusted
    regions score near 1 and are demotion candidates. Both ranks run on
    the same unweighted host layout in ONE graph session (CSR loaded
    once); the combine is a vertex-keyed shuffle join + a vectorized
    Arrow kernel, so at corpus scale no rank table ever lands on the
    driver. IEEE float ops on hash-exact inputs keep engine and oracle
    bit-comparable at the driver's 9-dp rounding."""
    d = _ensure_hosts_unweighted_layout(sf_dir)
    with ShardedGraph(d) as g:
        pr = g.pagerank(max_iterations=10, tolerance=0.0)
        tr = g.personalized_pagerank(TRUST_SEEDS, max_iterations=10,
                                     tolerance=0.0)
    out = joins.shuffle_join(pr.rename_columns({"rank": "pr"}),
                             tr.rename_columns({"rank": "trust"}),
                             on="vertex")

    def spam(b: pa.Table) -> pa.Table:
        return b.append_column(
            "spam_mass", pc.divide(pc.subtract(b["pr"], b["trust"]), b["pr"]))

    return out.map_batches(spam, batch_format="pyarrow")


def q_web_anchor_texts(sf_dir: str):
    """Inbound anchor-text corpus — certifies the REAL html anchor chain
    (closed-tag regex pull, entity unescape, ``urljoin`` resolution,
    fragment/javascript drops, text cleaning, pre-combined aggregation)
    end-to-end at sf scale: pages are synthesized deterministically from
    the derived edges (one closed anchor per out-edge, RELATIVE href when
    src and dst share a host so resolution is exercised, plus fragment and
    javascript links the extractor must drop), then
    ``extract.anchor_texts`` reduces to ``(dst_url, anchor, n)``. The
    oracle computes the same table in closed form from the edges — equal
    hashes certify the whole string chain, the ``web_host_pagerank``
    pattern."""
    from cassovary_ray import extract

    adj = analytics.adjacency_lists(derived_edges(sf_dir))

    def make_pages(b: pa.Table) -> pa.Table:
        urls, htmls = [], []
        for s, nbrs in zip(b["src"].to_pylist(), b["neighbors"].to_pylist()):
            h = s % 53
            links = [
                '<p><a href="#top">top</a> <a href="javascript:void(0)">js</a></p>'
            ]
            for d in nbrs:
                href = (f"/p/{d}" if d % 53 == h
                        else f"http://h{d % 53}.test/p/{d}")
                links.append(
                    f'<p>see <a href="{href}">node {d} from {s}</a>.</p>')
            html = (f"<html><body><h1>Page {s}</h1>\n"
                    + "\n".join(links) + "\n</body></html>")
            urls.append(f"http://h{h}.test/p/{s}")
            htmls.append(html.encode("utf-8"))
        return pa.table({"url": pa.array(urls, pa.string()),
                         "html": pa.array(htmls, pa.binary())})

    return extract.anchor_texts(
        adj.map_batches(make_pages, batch_format="pyarrow"))


def _derived_vertices(sf_dir: str):
    """``Dataset(u)`` — the distinct vertex universe of the derived graph
    (segment-fold distinct over both endpoint columns)."""
    e = derived_edges(sf_dir)

    def ucol(col):
        return e.map_batches(lambda b, c=col: pa.table({"u": b[c]}),
                             batch_format="pyarrow")

    return analytics.fold_by_keys(
        ucol("src").union(ucol("dst")),
        ["u"], [("u", "count", "_c")]).drop_columns(["_c"])


def q_graph_skipgram_negatives(sf_dir: str):
    """word2vec negative sampling over the DeepWalk pair table — the
    training-data step after ``graph_skipgram``: k=2 deterministic
    negatives per (center, context) pair, uniform over the vertex
    universe via counter-RNG modulo-rejection probes (see
    ``textops.skipgram_negatives``). The oracle replays the literal walks,
    the pair transform, AND the splitmix64 probe chain in SQL."""
    lay = _ensure_layout(sf_dir, "directed")
    with ShardedGraph(lay) as g:
        seqs = g.walk_corpus(walks_per_vertex=1, walk_length=10, seed=17,
                             output="sequences")
        pairs = textops.skipgram_pairs(seqs, window=2)
    return textops.skipgram_negatives(pairs, _derived_vertices(sf_dir),
                                      k=2, retries=4, seed=23)


def q_web_redirect_resolve(sf_dir: str):
    """Redirect-chain resolution by distributed POINTER DOUBLING — the
    crawl-preprocessing step that maps every redirecting url to its
    terminal target before graph construction. Synthetic deterministic
    redirect table: url with vertex id v ≡ 0,1,2 (mod 7) 301-redirects to
    v+1 (chains up to 3 hops, acyclic by construction). Resolution
    composes the mapping with itself (R ← R∘R) via ONE hash join per
    round, so a chain of length L resolves in ⌈log₂ L⌉ rounds instead of
    L sequential hops — 2 pinned rounds cover length ≤ 4; the oracle
    unrolls the same two compositions as LEFT JOIN + COALESCE. Returns
    ``(url, final_url)`` per redirecting url."""
    e = derived_edges(sf_dir)

    def ucol(col):
        return e.map_batches(lambda b, c=col: pa.table({"u": b[c]}),
                             batch_format="pyarrow")

    verts = analytics.fold_by_keys(ucol("src").union(ucol("dst")),
                                   ["u"], [("u", "count", "_c")])

    def mk_redirect(b: pa.Table) -> pa.Table:
        u = b["u"].to_numpy(zero_copy_only=False)
        src = u[(u % 7) < 3]
        return pa.table({"src": pa.array(src, pa.int64()),
                         "dst": pa.array(src + 1, pa.int64())})

    r = (verts.map_batches(mk_redirect, batch_format="pyarrow")
         .materialize())
    for _ in range(2):
        m = r.map_batches(
            lambda b: pa.table({"m_src": b["src"], "m_dst": b["dst"]}),
            batch_format="pyarrow")
        j = joins.shuffle_join(r, m, on="dst", right_on="m_src",
                               how="left")

        def compose(b: pa.Table) -> pa.Table:
            return pa.table({"src": b["src"],
                             "dst": pc.coalesce(b["m_dst"], b["dst"])})

        r = j.map_batches(compose, batch_format="pyarrow").materialize()

    def to_urls(b: pa.Table) -> pa.Table:
        def f(col):
            return pa.array(
                [f"http://h{v % 53}.test/p/{v}"
                 for v in b[col].to_numpy(zero_copy_only=False)],
                pa.string())
        return pa.table({"url": f("src"), "final_url": f("dst")})

    return r.map_batches(to_urls, batch_format="pyarrow")


def q_web_rank_delta(sf_dir: str):
    """Rank-shift analysis across a recrawl: PageRank before vs after a
    deterministic link-rot sample (edges with (src+dst) ≡ 0 mod 11
    dropped — the pages whose outlinks died), top-50 movers by quantized
    |Δrank| desc / vertex asc. The operational question after every
    incremental recrawl ("whose rank did the dead links move?"): two
    pinned-10-round PageRanks over the two layouts, one vertex-keyed
    inner join (vertices present in both crawls), vectorized delta. The
    oracle joins two unrolled PageRank CTEs."""
    lay_old = _ensure_layout(sf_dir, "directed")
    d = _layout_dir(sf_dir, "rot11")
    try:
        read_layout_manifest(d)
    except FileNotFoundError:
        def keep(b: pa.Table) -> pa.Table:
            s = b["src"].to_numpy(zero_copy_only=False)
            t = b["dst"].to_numpy(zero_copy_only=False)
            return b.filter(pa.array(((s + t) % 11) != 0))

        build_edge_layout(
            derived_edges(sf_dir).map_batches(keep, batch_format="pyarrow"),
            d, ENGINE_PARTS)
    with ShardedGraph(lay_old) as g:
        pr_old = g.pagerank(max_iterations=10, tolerance=0.0)
    with ShardedGraph(d) as g:
        pr_new = g.pagerank(max_iterations=10, tolerance=0.0)
    j = joins.shuffle_join(pr_old.rename_columns({"rank": "pr_old"}),
                           pr_new.rename_columns({"rank": "pr_new"}),
                           on="vertex")

    def delta(b: pa.Table) -> pa.Table:
        dl = pc.subtract(b["pr_new"], b["pr_old"])
        q = pc.cast(pc.floor(pc.multiply(pc.abs(dl), 1000000000.0)),
                    pa.int64())
        return b.append_column("delta", dl).append_column("q", q)

    return (j.map_batches(delta, batch_format="pyarrow")
            .sort(["q", "vertex"], descending=[True, False]).limit(50)
            .drop_columns(["q"]))


def q_web_url_dedup(sf_dir: str):
    """URL canonicalization dedup: messy variants (fragments, utm params,
    :80 ports, trailing slashes — deterministically synthesised per edge)
    collapsed onto their canonical form with an observation count and the
    lexicographically-smallest kept variant. The RE2 rewrite chain is
    shared verbatim with the SQL oracle."""
    from cassovary_ray import extract

    def messy(b: pa.Table) -> pa.Table:
        # gate-feed scaffolding, mirrored by the oracle's CASE expressions
        src = b["src"].to_numpy(zero_copy_only=False)
        dst = b["dst"].to_numpy(zero_copy_only=False)
        urls = []
        for s, d in zip(src, dst):
            u = f"http://h{d % 53}.test"
            if s % 7 == 0:
                u += ":80"
            u += f"/p/{d}"
            if s % 2 == 0:
                u += "/"
            params = []
            if s % 3 == 0:
                params.append(f"utm_source=s{s % 5}")
            if d % 5 == 0:
                params.append(f"q={d % 11}")
            if params:
                u += "?" + "&".join(params)
            if s % 11 == 0:
                u += f"#f{s % 4}"
            urls.append(u)
        return pa.table({"url": pa.array(urls, pa.string())})

    return extract.url_dedup(
        derived_edges(sf_dir).map_batches(messy, batch_format="pyarrow"))


def q_graph_densest(sf_dir: str):
    """Densest subgraph by (1+ε) greedy peeling over the core/periphery
    derivation (argmax at round 3 of 6 at sf0.01 — the 89-vertex core)."""
    return analytics.densest_subgraph(skewed_edges(sf_dir), epsilon=0.1,
                                      max_rounds=10)


def q_graph_wl(sf_dir: str):
    """1-WL color refinement (3 rounds) — structural role fingerprints."""
    return analytics.wl_refinement(derived_edges(sf_dir), rounds=3)


def q_graph_coreness(sf_dir: str):
    """Exact per-vertex core numbers via H-index iteration (15 rounds to
    fixpoint at sf0.01). max_rounds=18 matches the oracle's 18-round
    unroll — raises rather than silently mismatching (kcore discipline)."""
    return analytics.coreness(derived_edges(sf_dir), max_rounds=18)


def q_graph_scc(sf_dir: str):
    """Strongly connected components (Orzan coloring + backward sweep)."""
    return analytics.scc(derived_edges(sf_dir))


def q_doc_dedup_clusters(sf_dir: str):
    """Full near-dup clustering: n-gram-Jaccard pairs → hash-min components
    → canonical doc per cluster (every doc_id mapped)."""
    return textops.dedup_clusters(
        _table(sf_dir, "documents"), n=3, max_df=50, threshold=0.5)


def q_doc_curation(sf_dir: str):
    """End-to-end corpus curation: quality filter + exact dedup."""
    return textops.curate_corpus(_table(sf_dir, "documents"), min_tokens=10)


def q_graph_harmonic(sf_dir: str):
    """Harmonic centrality from the first 8 vertices (bounded-source sample,
    same contract as closeness — exact all-sources is O(n·m))."""
    return analytics.harmonic_centrality(
        derived_edges(sf_dir), sources=list(range(8)), max_depth=32)


def q_graph_assortativity(sf_dir: str):
    """Out-in degree assortativity (Newman r) — one row, exact int moments."""
    return analytics.degree_assortativity(derived_edges(sf_dir))


def q_doc_tfidf(sf_dir: str):
    """Top-3 tf-idf tokens per document."""
    return textops.tfidf_top_k(_table(sf_dir, "documents"), k=3)


def q_graph_neighbor_agg(sf_dir: str):
    """Out-neighbor value aggregation (message-passing primitive) with the
    deterministic vertex feature value = vertex % 97."""
    edges = derived_edges(sf_dir).materialize()
    verts = (
        edges.select_columns(["src"]).rename_columns({"src": "vertex"})
        .union(edges.select_columns(["dst"]).rename_columns({"dst": "vertex"}))
        .groupby("vertex").aggregate(Count(alias_name="_c"))
        .select_columns(["vertex"])
    )
    def with_value(t: pa.Table) -> pa.Table:
        v = t["vertex"].to_numpy(zero_copy_only=False)
        return t.append_column("value", pa.array(v % 97, pa.int64()))

    values = verts.map_batches(with_value, batch_format="pyarrow")
    return analytics.neighbor_value_aggregate(edges, values, direction="out")


def q_events_funnel(sf_dir: str):
    """view→click→purchase funnel progression per user."""
    return events_ops.funnel(_table(sf_dir, "events"))


def q_events_latest(sf_dir: str):
    """Latest event per user (arg-max by (ts, event_id)) — the crawl-recency
    primitive (`extract.latest_capture`) gate-checked on the events table."""
    ev = _table(sf_dir, "events").map_batches(
        lambda b: pa.table({
            "user_id": b["user_id"], "event_id": b["event_id"],
            "ts_us": b["ts"].cast(pa.int64()),
            "event_type": b["event_type"], "value": b["value"]}),
        batch_format="pyarrow")
    return analytics.latest_by_key(ev, "user_id", ["ts_us", "event_id"])


def q_graph_dynamic(sf_dir: str):
    """Dynamic-graph mutation log → compacted edge set: seed the log with
    the derived edges, remove every edge with (src+dst)%5==0, then add
    (src, (dst+1)%GRAPH_MOD) for src%7==0 — latest-op-wins compaction
    (one groupby, two max aggregates). Oracle is the same set algebra.

    The driver-side pandas here only FABRICATES the mutation batches for the
    gate (the add/remove API takes explicit pair batches by design — real
    users bring their own mutations); the scale path is the parquet edge log
    (``checkpoint_log``) + the one-shuffle compaction, which is what this
    query actually exercises."""
    from cassovary_ray.dynamic import DynamicDirectedGraph

    base = derived_edges(sf_dir).materialize()
    pdf = base.to_pandas()
    rem = pdf[(pdf.src + pdf.dst) % 5 == 0]
    add = pdf[pdf.src % 7 == 0].copy()
    add["dst"] = (add["dst"] + 1) % GRAPH_MOD
    add = add[add.src != add.dst]
    g = DynamicDirectedGraph(base_edges=base)
    g.remove_edges(list(zip(rem.src, rem.dst)))
    g.add_edges(list(zip(add.src, add.dst)))
    return g.edges()


def q_graph_eccentricity(sf_dir: str):
    """Sampled-source eccentricity (max BFS depth + reachable count)."""
    return analytics.eccentricity(
        derived_edges(sf_dir), sources=list(range(8)), max_depth=32)


def q_graph_degree_quantiles(sf_dir: str):
    """Exact discrete out-degree quantiles (p50/p90/p99)."""
    return analytics.degree_quantiles(derived_edges(sf_dir))


def q_events_top_users(sf_dir: str):
    """Top-3 heaviest users per event type."""
    return events_ops.top_users_per_type(_table(sf_dir, "events"), k=3)


def q_graph_betweenness(sf_dir: str):
    """Sampled-source Brandes betweenness. max_depth pinned to 8 (actual
    BFS depth from these sources is 3 at sf0.01) so the SQL oracle's unroll
    bound and the engine's truncation agree on ANY input; δ float sums are
    ~1e-15-relative divergent, far below the checker's 9-dp grid (the
    pagerank-oracle argument). Golden-tested against brute Brandes in
    pytest as well."""
    return analytics.betweenness_centrality(
        derived_edges(sf_dir), sources=list(range(8)), max_depth=8)


def _media_ids(sf_dir: str):
    return (
        _table(sf_dir, "documents").select_columns(["doc_id"])
        .rename_columns({"doc_id": "media_id"})
    )


def q_media_image_stats(sf_dir: str):
    """Encode every doc_id's deterministic image as a REAL 24-bit BMP, then
    decode it back (actor-pool stage) and emit integer pixel stats — the
    oracle recomputes the stats from the generator's closed form, so any
    codec round-trip bug mismatches."""
    media = multimodal.media_from_ids(_media_ids(sf_dir), "image")
    return multimodal.decode_images(media).drop_columns(["features"])


def q_media_image_ahash(sf_dir: str):
    """Perceptual average-hash per image through the REAL BMP round-trip —
    the image near-dup primitive; the oracle recomputes the 8×8 block bits
    from the generator's closed form (integer cross-multiplied mean test),
    so hash equality certifies codec + pooling + bit packing."""
    media = multimodal.media_from_ids(_media_ids(sf_dir), "image")
    return multimodal.image_ahash(media)


def q_media_audio_stats(sf_dir: str):
    """RIFF/WAVE PCM16 round-trip (stdlib wave codec) + integer sample stats."""
    media = multimodal.media_from_ids(_media_ids(sf_dir), "audio")
    return multimodal.decode_audio(media).drop_columns(["rms_windows"])


def q_media_video_frames(sf_dir: str):
    """Raw-frame video container: sample every 2nd frame by byte slicing."""
    media = multimodal.media_from_ids(_media_ids(sf_dir), "video")
    return multimodal.frame_sample(media, every_n=2)


QUERIES = {
    "graph_edges": q_graph_edges,
    "graph_degrees": q_graph_degrees,
    "graph_degree_centrality": q_graph_degree_centrality,
    "graph_mutual_edges": q_graph_mutual_edges,
    "graph_triangles": q_graph_triangles,
    "graph_triangles_approx": q_graph_triangles_approx,
    "graph_jaccard_top3": q_graph_jaccard_top3,
    "graph_cosine_top3": q_graph_cosine_top3,
    "graph_similar_pairs": q_graph_similar_pairs,
    "graph_adamic_adar": q_graph_adamic_adar,
    "graph_modularity": q_graph_modularity,
    "graph_local_clustering": q_graph_local_clustering,
    "graph_pagerank": q_graph_pagerank,
    "graph_katz": q_graph_katz,
    "graph_eigenvector": q_graph_eigenvector,
    "graph_topo": q_graph_topo,
    "graph_msf": q_graph_msf,
    "graph_pagerank_weighted": q_graph_pagerank_weighted,
    "graph_sssp": q_graph_sssp,
    "graph_ppr": q_graph_ppr,
    "graph_wcc": q_graph_wcc,
    "graph_labelprop": q_graph_labelprop,
    "graph_mis": q_graph_mis,
    "graph_coloring": q_graph_coloring,
    "graph_hits": q_graph_hits,
    "graph_salsa": q_graph_salsa,
    "graph_walk_visits": q_graph_walk_visits,
    "graph_walk_corpus": q_graph_walk_corpus,
    "graph_node2vec": q_graph_node2vec,
    "graph_skipgram": q_graph_skipgram,
    "graph_skipgram_negatives": q_graph_skipgram_negatives,
    "graph_neighborhood": q_graph_neighborhood,
    "graph_effective_diameter": q_graph_effective_diameter,
    "graph_anf_hll": q_graph_anf_hll,
    "graph_hyperball": q_graph_hyperball,
    "graph_bfs": q_graph_bfs,
    "graph_ego_net": q_graph_ego_net,
    "graph_adjacency_stats": q_graph_adjacency_stats,
    "graph_labels": q_graph_labels,
    "graph_numberer": q_graph_numberer,
    "graph_dfs": q_graph_dfs,
    "graph_bipartite": q_graph_bipartite,
    "graph_wtf": q_graph_wtf,
    "graph_wtf_batch": q_graph_wtf_batch,
    "graph_closeness": q_graph_closeness,
    "doc_ngram_jaccard": q_doc_ngram_jaccard,
    "doc_stats": q_doc_stats,
    "doc_exact_dedup": q_doc_exact_dedup,
    "doc_token_counts": q_doc_token_counts,
    "doc_quality": q_doc_quality,
    "doc_repetition": q_doc_repetition,
    "doc_contamination": q_doc_contamination,
    "doc_substring_dups": q_doc_substring_dups,
    "doc_pii": q_doc_pii,
    "doc_gopher": q_doc_gopher,
    "doc_langid": q_doc_langid,
    "doc_simhash": q_doc_simhash,
    "doc_minhash_pairs": q_doc_minhash_pairs,
    "doc_fingerprints": q_doc_fingerprints,
    "doc_paragraph_dedup": q_doc_paragraph_dedup,
    "doc_paragraph_rewrite": q_doc_paragraph_rewrite,
    "doc_sample": q_doc_sample,
    "doc_rarity": q_doc_rarity,
    "doc_bpe_tokens": q_doc_bpe_tokens,
    "knn_top5": q_knn_top5,
    "knn_lsh": q_knn_lsh,
    "knn_ivf": q_knn_ivf,
    "knn_ivf_kmeans": q_knn_ivf_kmeans,
    "embedding_dups": q_embedding_dups,
    "embedding_dup_clusters": q_embedding_dup_clusters,
    "events_hourly": q_events_hourly,
    "events_sessions": q_events_sessions,
    "events_type_totals": q_events_type_totals,
    "events_sliding": q_events_sliding,
    "events_sliding_users": q_events_sliding_users,
    "events_asof": q_events_asof,
    "events_range_join": q_events_range_join,
    "join_orders_customer": q_join_orders_customer,
    "join_lineitem_orders": q_join_lineitem_orders,
    "join_customer_no_f_orders": q_join_customer_no_f_orders,
    "join_customer_order_counts": q_join_customer_order_counts,
    "doc_vocab": q_doc_vocab,
    "doc_lm_score": q_doc_lm_score,
    "doc_quality_lr": q_doc_quality_lr,
    "graph_reciprocity": q_graph_reciprocity,
    "graph_degree_hist": q_graph_degree_hist,
    "graph_two_hop": q_graph_two_hop,
    "graph_kcore": q_graph_kcore,
    "graph_edge_supports": q_graph_edge_supports,
    "graph_ktruss": q_graph_ktruss,
    "graph_densest": q_graph_densest,
    "graph_coreness": q_graph_coreness,
    "graph_wl": q_graph_wl,
    "web_host_graph": q_web_host_graph,
    "web_crawl_frontier": q_web_crawl_frontier,
    "web_host_pagerank": q_web_host_pagerank,
    "web_trustrank": q_web_trustrank,
    "web_spam_mass": q_web_spam_mass,
    "web_host_mirrors": q_web_host_mirrors,
    "web_anchor_texts": q_web_anchor_texts,
    "web_redirect_resolve": q_web_redirect_resolve,
    "web_rank_delta": q_web_rank_delta,
    "web_url_dedup": q_web_url_dedup,
    "graph_conductance": q_graph_conductance,
    "graph_contract": q_graph_contract,
    "graph_sample_neighbors": q_graph_sample_neighbors,
    "graph_scc": q_graph_scc,
    "doc_dedup_clusters": q_doc_dedup_clusters,
    "doc_curation": q_doc_curation,
    "graph_harmonic": q_graph_harmonic,
    "graph_assortativity": q_graph_assortativity,
    "doc_tfidf": q_doc_tfidf,
    "media_image_stats": q_media_image_stats,
    "media_image_ahash": q_media_image_ahash,
    "media_audio_stats": q_media_audio_stats,
    "media_video_frames": q_media_video_frames,
    "graph_betweenness": q_graph_betweenness,
    "graph_eccentricity": q_graph_eccentricity,
    "graph_degree_quantiles": q_graph_degree_quantiles,
    "events_top_users": q_events_top_users,
    "graph_dynamic": q_graph_dynamic,
    "graph_neighbor_agg": q_graph_neighbor_agg,
    "events_funnel": q_events_funnel,
    "events_latest": q_events_latest,
    "events_retention": q_events_retention,
    "events_anomaly": q_events_anomaly,
    "events_count_min": q_events_count_min,
}


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB; views region..embeddings pre-registered by the driver)
# ---------------------------------------------------------------------------

ORACLE_SQL = {
    "graph_edges": f"WITH e AS ({DERIVED_EDGES_CTE}) SELECT src, dst FROM e",
    "graph_degrees": f"""
        WITH e AS ({DERIVED_EDGES_CTE}),
        v AS (SELECT src AS vertex FROM e UNION SELECT dst FROM e),
        o AS (SELECT src AS vertex, count(*) AS c FROM e GROUP BY 1),
        i AS (SELECT dst AS vertex, count(*) AS c FROM e GROUP BY 1)
        SELECT v.vertex, coalesce(o.c, 0) AS out_deg, coalesce(i.c, 0) AS in_deg
        FROM v LEFT JOIN o USING (vertex) LEFT JOIN i USING (vertex)
    """,
    "graph_degree_centrality": f"""
        WITH e AS ({DERIVED_EDGES_CTE}),
        o AS (SELECT src AS vertex, count(*) AS c FROM e GROUP BY 1),
        n AS (SELECT count(*) AS n FROM (SELECT src AS v FROM e UNION SELECT dst FROM e))
        SELECT vertex, CAST(c AS DOUBLE) / (n.n - 1) AS centrality FROM o, n
    """,
    "graph_mutual_edges": f"""
        WITH e AS ({DERIVED_EDGES_CTE})
        SELECT count(*) // 2 AS mutual_pairs
        FROM e a JOIN e b ON a.src = b.dst AND a.dst = b.src
    """,
    "graph_triangles": f"""
        WITH e AS ({DERIVED_EDGES_CTE}),
        und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v FROM e)
        SELECT count(*) AS triangles
        FROM und a JOIN und b ON b.u = a.v JOIN und c ON c.u = a.u AND c.v = b.v
    """,
    "graph_triangles_approx": oracles.triangles_approx_sql(
        DERIVED_EDGES_CTE, TRI_SAMPLE_P, TRI_SAMPLE_SEED),
    "graph_jaccard_top3": f"""
        WITH e AS ({DERIVED_EDGES_CTE}),
        deg AS (SELECT src AS vtx, count(*) AS deg FROM e GROUP BY 1),
        okd AS (SELECT dst FROM e GROUP BY 1 HAVING count(*) <= {SIM_MAX_IN_DEG}),
        ef AS (SELECT e.src, e.dst FROM e JOIN okd USING (dst)),
        co AS (SELECT a.src AS u, b.src AS w, count(*) AS common
               FROM ef a JOIN ef b ON a.dst = b.dst AND a.src <> b.src GROUP BY 1, 2),
        scored AS (SELECT co.u, co.w,
                          CAST(common AS DOUBLE) / (du.deg + dw.deg - common) AS score
                   FROM co JOIN deg du ON du.vtx = co.u JOIN deg dw ON dw.vtx = co.w),
        ranked AS (SELECT u, w, score,
                          row_number() OVER (PARTITION BY u ORDER BY score DESC, w ASC) AS rank
                   FROM scored)
        SELECT u, w, score, rank FROM ranked WHERE rank <= 3
    """,
    "graph_cosine_top3": f"""
        WITH e AS ({DERIVED_EDGES_CTE}),
        deg AS (SELECT src AS vtx, count(*) AS deg FROM e GROUP BY 1),
        okd AS (SELECT dst FROM e GROUP BY 1 HAVING count(*) <= {SIM_MAX_IN_DEG}),
        ef AS (SELECT e.src, e.dst FROM e JOIN okd USING (dst)),
        co AS (SELECT a.src AS u, b.src AS w, count(*) AS common
               FROM ef a JOIN ef b ON a.dst = b.dst AND a.src <> b.src GROUP BY 1, 2),
        scored AS (SELECT co.u, co.w,
                          CAST(common AS DOUBLE) / sqrt(du.deg * dw.deg) AS score
                   FROM co JOIN deg du ON du.vtx = co.u JOIN deg dw ON dw.vtx = co.w),
        ranked AS (SELECT u, w, score,
                          row_number() OVER (PARTITION BY u ORDER BY score DESC, w ASC) AS rank
                   FROM scored)
        SELECT u, w, score, rank FROM ranked WHERE rank <= 3
    """,
    "graph_similar_pairs": f"""
        WITH e AS ({DERIVED_EDGES_CTE}),
        deg AS (SELECT src AS vtx, count(*) AS deg FROM e GROUP BY 1),
        okd AS (SELECT dst FROM e GROUP BY 1 HAVING count(*) <= {SIM_MAX_IN_DEG}),
        ef AS (SELECT e.src, e.dst FROM e JOIN okd USING (dst)),
        co AS (SELECT a.src AS u, b.src AS w, count(*) AS common
               FROM ef a JOIN ef b ON a.dst = b.dst AND a.src <> b.src GROUP BY 1, 2),
        scored AS (SELECT co.u, co.w,
                          CAST(common AS DOUBLE) / (du.deg + dw.deg - common) AS score
                   FROM co JOIN deg du ON du.vtx = co.u JOIN deg dw ON dw.vtx = co.w),
        canon AS (SELECT DISTINCT least(u, w) AS u, greatest(u, w) AS w, score
                  FROM scored)
        SELECT u, w, score FROM canon ORDER BY score DESC, u ASC, w ASC LIMIT 10
    """,
    "graph_adamic_adar": f"""
        WITH e AS ({DERIVED_EDGES_CTE}),
        ind AS (SELECT dst, count(*) AS d FROM e GROUP BY 1),
        ef AS (SELECT e.src, e.dst FROM e JOIN ind i USING (dst)
               WHERE i.d <= {SIM_MAX_IN_DEG}),
        pairs AS (SELECT a.src AS u, b.src AS w, i.d AS d
                  FROM ef a JOIN ef b ON a.dst = b.dst AND a.src <> b.src
                  JOIN ind i ON i.dst = a.dst),
        s AS (SELECT u, w, sum(1.0 / ln(d)) AS score FROM pairs GROUP BY 1, 2),
        q AS (SELECT u, w, CAST(floor(score * 1e6) AS BIGINT) AS score_micro FROM s),
        ranked AS (SELECT u, w, score_micro,
                          row_number() OVER (PARTITION BY u
                                             ORDER BY score_micro DESC, w ASC) AS rank
                   FROM q)
        SELECT u, w, score_micro, rank FROM ranked WHERE rank <= 3
    """,
    "graph_modularity": f"""
        WITH e AS ({DERIVED_EDGES_CTE}),
        m AS (SELECT count(*) AS m FROM e),
        intra AS (SELECT count(*) AS intra FROM e WHERE src % 7 = dst % 7),
        kout AS (SELECT src % 7 AS c, count(*) AS kout FROM e GROUP BY 1),
        kin AS (SELECT dst % 7 AS c, count(*) AS kin FROM e GROUP BY 1),
        s AS (SELECT CAST(sum(kout.kout * kin.kin) AS BIGINT) AS s
              FROM kout JOIN kin USING (c))
        SELECT m.m AS m, intra.intra AS intra,
               CAST(floor((CAST(intra.intra AS DOUBLE) / m.m
                           - CAST(s.s AS DOUBLE) / (m.m * m.m)) * 1e9) AS BIGINT)
                   AS q_nano
        FROM m, intra, s
    """,
    "graph_local_clustering": oracles.local_clustering_sql(DERIVED_EDGES_CTE),
    "graph_bfs": oracles.bfs_sql(DERIVED_EDGES_CTE, source=0, max_depth=4),
    "graph_ego_net": oracles.ego_net_sql(DERIVED_EDGES_CTE, [7, 500], radius=1),
    "graph_pagerank": oracles.pagerank_sql(DERIVED_EDGES_CTE, iterations=10),
    "graph_betweenness": oracles.betweenness_sql(
        DERIVED_EDGES_CTE, sources=list(range(8)), max_depth=8),
    "graph_msf": oracles.msf_sql(DERIVED_WEDGES_CTE, rounds=12),
    "graph_katz": oracles.katz_sql(DERIVED_EDGES_CTE, iterations=8,
                                   alpha=0.005, beta=1.0),
    "graph_eigenvector": oracles.eigenvector_sql(DERIVED_EDGES_CTE,
                                                 iterations=7),
    "graph_topo": f"""
        WITH RECURSIVE de AS ({DERIVED_EDGES_CTE}),
        e AS (SELECT src, dst FROM de WHERE src < dst),
        v AS (SELECT src AS vertex FROM e UNION SELECT dst FROM e),
        lp(vertex, d) AS (
            SELECT vertex, 0 FROM v
            UNION
            SELECT e.dst, lp.d + 1 FROM lp JOIN e ON e.src = lp.vertex
        )
        SELECT vertex, CAST(max(d) AS BIGINT) AS layer FROM lp GROUP BY 1
    """,
    "graph_pagerank_weighted": oracles.pagerank_weighted_sql(
        DERIVED_WEDGES_CTE, iterations=10),
    "graph_ppr": oracles.ppr_sql(DERIVED_EDGES_CTE, PPR_SEEDS, iterations=10),
    "graph_sssp": oracles.sssp_sql(DERIVED_WEDGES_CTE, SSSP_SOURCES, SSSP_ROUNDS),
    "graph_wcc": oracles.wcc_sql(DERIVED_EDGES_CTE),
    "graph_labelprop": oracles.label_propagation_sql(DERIVED_EDGES_CTE, iterations=10),
    "graph_mis": oracles.mis_sql(DERIVED_EDGES_CTE, rounds=24),
    "graph_wtf_batch": f"""
        WITH corpus AS ({oracles.walk_corpus_sql(
            DERIVED_EDGES_CTE, walks_per_vertex=2, walk_length=10, seed=17)}),
        visits AS (SELECT walker_id AS user_id, vertex, count(*) AS visits
                   FROM corpus GROUP BY 1, 2),
        cot AS (SELECT user_id, vertex AS hub, visits FROM (
                    SELECT user_id, vertex, visits, row_number() OVER (
                        PARTITION BY user_id
                        ORDER BY visits DESC, vertex ASC) AS rn
                    FROM visits) WHERE rn <= 5),
        e AS (SELECT src, dst FROM ({DERIVED_EDGES_CTE})),
        deg AS (SELECT src, count(*) AS dg FROM e GROUP BY 1),
        flow AS (SELECT cot.user_id, e.dst AS rec,
                        sum(CAST(cot.visits AS DOUBLE)
                            / CAST(deg.dg AS DOUBLE) * 0.9) AS score
                 FROM cot JOIN deg ON deg.src = cot.hub
                          JOIN e ON e.src = cot.hub
                 GROUP BY 1, 2),
        cand AS (SELECT f.user_id, f.rec, f.score FROM flow f
                 WHERE f.rec <> f.user_id AND NOT EXISTS (
                     SELECT 1 FROM e WHERE e.src = f.user_id
                                       AND e.dst = f.rec))
        SELECT user_id, rec, score, rank FROM (
            SELECT user_id, rec, score, row_number() OVER (
                PARTITION BY user_id
                ORDER BY CAST(floor(score * 1000000000.0) AS BIGINT) DESC,
                         rec ASC) AS rank
            FROM cand) WHERE rank <= 5""",
    "graph_walk_visits": oracles.walk_visits_sql(
        DERIVED_EDGES_CTE, [0] * 64, 50, reset_prob=0.15, seed=11),
    "graph_walk_corpus": oracles.walk_corpus_sql(
        DERIVED_EDGES_CTE, walks_per_vertex=2, walk_length=10, seed=17),
    "graph_skipgram": oracles.skipgram_sql(
        DERIVED_EDGES_CTE, walks_per_vertex=1, walk_length=10, seed=17,
        window=2),
    "graph_skipgram_negatives": oracles.skipgram_negatives_sql(
        DERIVED_EDGES_CTE, walks_per_vertex=1, walk_length=10,
        corpus_seed=17, window=2, k=2, retries=4, seed=23),
    "graph_hyperball": oracles.hyperball_sql(
        DERIVED_EDGES_CTE, b=6, seed=1, max_distance=4),
    "graph_anf_hll": oracles.anf_hll_sql(
        DERIVED_EDGES_CTE, b=6, seed=1, max_distance=4),
    "graph_node2vec": oracles.node2vec_visits_sql(
        DERIVED_EDGES_CTE, [0] * 64, 50, p=0.5, q=2.0,
        reset_prob=0.15, seed=11),
    "graph_coloring": oracles.coloring_sql(DERIVED_EDGES_CTE,
                                           colors=64, rounds=2),
    "graph_hits": oracles.hits_sql(DERIVED_EDGES_CTE, iterations=8),
    "graph_salsa": oracles.salsa_sql(DERIVED_EDGES_CTE, iterations=8),
    "graph_neighborhood": oracles.neighborhood_sql(DERIVED_EDGES_CTE, 4),
    "graph_effective_diameter": oracles.effective_diameter_sql(
        DERIVED_EDGES_CTE, 4),
    # knn_lsh: projection planes are a pure function of (n_planes=8,
    # seed=1234, dim=64 — the embeddings schema) embedded as literals
    "knn_lsh": oracles.lsh_knn_sql(_ann_planes(8, 1234, 64), n_queries=10, k=5),
    # knn_ivf: centroids are a pure function of (n_centroids=16, seed=4242,
    # dim=64) embedded pre-normalized as literals
    "knn_ivf": oracles.ivf_knn_sql(ann._ivf_centroids(16, 4242, 64),
                                   n_queries=10, k=5, nprobe=4),
    # trained-quantizer IVF: Lloyd spherical k-means unrolled in SQL from
    # the same literal init directions (see kmeans_ivf_knn_sql's exactness
    # stance: 1e-15 mean noise can only flip measure-zero argmax ties)
    "knn_ivf_kmeans": oracles.kmeans_ivf_knn_sql(
        ann._ivf_centroids(16, 4242, 64), iters=3,
        n_queries=10, k=5, nprobe=4),
    "graph_closeness": oracles.closeness_sql(
        DERIVED_EDGES_CTE, sources=list(range(8)), max_depth=32),
    "doc_ngram_jaccard": oracles.ngram_jaccard_sql(n=3, max_df=50, threshold=0.5),
    # hash-sketch mirrors: engine token hash = md5 low 8 bytes LE =
    # DuckDB md5_number_upper(), so signatures are value-identical
    "doc_simhash": oracles.simhash_sql(),
    "doc_fingerprints": oracles.rolling_fingerprint_sql(window=8),
    "doc_minhash_pairs": oracles.minhash_pairs_sql(threshold=0.4),
    "graph_adjacency_stats": f"""
        WITH e AS ({DERIVED_EDGES_CTE})
        SELECT src, count(*) AS n_neighbors, min(dst) AS min_nbr,
               max(dst) AS max_nbr, CAST(sum(dst) AS BIGINT) AS sum_nbr
        FROM e GROUP BY src
    """,
    "graph_labels": f"""
        WITH e AS ({DERIVED_EDGES_CTE}),
        v AS (SELECT src AS vertex FROM e UNION SELECT dst FROM e),
        o AS (SELECT src AS vertex, count(*) AS c FROM e GROUP BY 1),
        i AS (SELECT dst AS vertex, count(*) AS c FROM e GROUP BY 1)
        SELECT v.vertex, coalesce(o.c, 0) AS out_deg, coalesce(i.c, 0) AS in_deg,
               v.vertex % 7 AS community
        FROM v LEFT JOIN o USING (vertex) LEFT JOIN i USING (vertex)
    """,
    "graph_numberer": f"WITH e AS ({DERIVED_EDGES_CTE}) SELECT src, dst FROM e",
    "doc_stats": """
        SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents GROUP BY lang
    """,
    "doc_exact_dedup": """
        SELECT md5(text) AS text_md5, min(doc_id) AS doc_id FROM documents GROUP BY 1
    """,
    "doc_token_counts": r"""
        SELECT doc_id, length(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
        FROM documents
    """,
    "doc_quality": r"""
        SELECT doc_id,
               length(text) AS n_chars_calc,
               length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS n_alpha,
               length(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
        FROM documents
    """,
    "doc_repetition": r"""
        WITH d AS (SELECT doc_id, text FROM documents),
        lines AS (
            SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM d),
        lstats AS (
            SELECT doc_id, count(*) AS n_lines,
                   count(*) - count(DISTINCT line) AS n_dup_lines,
                   CAST(sum(length(line)) AS BIGINT) AS total_line_chars
            FROM lines GROUP BY doc_id),
        ldup AS (
            SELECT doc_id,
                   CAST(sum((c - 1) * length(line)) AS BIGINT) AS dup_line_chars
            FROM (SELECT doc_id, line, count(*) AS c FROM lines GROUP BY 1, 2)
            WHERE c > 1 GROUP BY doc_id),
        toks AS (
            SELECT doc_id, arr, len(arr) AS n FROM (
                SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS arr
                FROM d)),
        g2 AS (
            SELECT doc_id, arr[i] || ' ' || arr[i + 1] AS g FROM (
                SELECT doc_id, arr, unnest(generate_series(1, n - 1)) AS i
                FROM toks)),
        g2top AS (
            SELECT doc_id, max(c) AS top_2gram_count FROM (
                SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2)
            GROUP BY doc_id),
        g5 AS (
            SELECT doc_id, arr[i] || ' ' || arr[i + 1] || ' ' || arr[i + 2]
                   || ' ' || arr[i + 3] || ' ' || arr[i + 4] AS g FROM (
                SELECT doc_id, arr, unnest(generate_series(1, n - 4)) AS i
                FROM toks)),
        g5s AS (
            SELECT doc_id, count(*) - count(DISTINCT g) AS n_dup_5grams
            FROM g5 GROUP BY doc_id)
        SELECT d.doc_id, l.n_lines, l.n_dup_lines, l.total_line_chars,
               coalesce(ld.dup_line_chars, 0) AS dup_line_chars,
               greatest(t.n - 1, 0) AS n_2grams,
               coalesce(g2top.top_2gram_count, 0) AS top_2gram_count,
               greatest(t.n - 4, 0) AS n_5grams,
               coalesce(g5s.n_dup_5grams, 0) AS n_dup_5grams
        FROM d JOIN lstats l USING (doc_id) JOIN toks t USING (doc_id)
        LEFT JOIN ldup ld USING (doc_id)
        LEFT JOIN g2top USING (doc_id)
        LEFT JOIN g5s USING (doc_id)
    """,
    "doc_gopher": r"""
        WITH d AS (SELECT doc_id, text FROM documents),
        lines AS (
            SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM d),
        lstats AS (
            SELECT doc_id, count(*) AS n_lines,
                   count(*) - count(DISTINCT line) AS n_dup_lines
            FROM lines GROUP BY doc_id),
        toks AS (
            SELECT doc_id, arr, len(arr) AS n FROM (
                SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS arr
                FROM d)),
        g2 AS (
            SELECT doc_id, arr[i] || ' ' || arr[i + 1] AS g FROM (
                SELECT doc_id, arr, unnest(generate_series(1, n - 1)) AS i
                FROM toks)),
        g2top AS (
            SELECT doc_id, max(c) AS top2 FROM (
                SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2)
            GROUP BY doc_id),
        g5 AS (
            SELECT doc_id, arr[i] || ' ' || arr[i + 1] || ' ' || arr[i + 2]
                   || ' ' || arr[i + 3] || ' ' || arr[i + 4] AS g FROM (
                SELECT doc_id, arr, unnest(generate_series(1, n - 4)) AS i
                FROM toks)),
        g5s AS (
            SELECT doc_id, count(*) - count(DISTINCT g) AS dup5
            FROM g5 GROUP BY doc_id)
        SELECT d.doc_id, t.n AS n_tokens,
               CAST(CASE WHEN t.n >= 10
                    AND 100 * l.n_dup_lines <= 30 * l.n_lines
                    AND (greatest(t.n - 1, 0) = 0
                         OR 100 * coalesce(g2top.top2, 0)
                            <= 20 * greatest(t.n - 1, 0))
                    AND (greatest(t.n - 4, 0) = 0
                         OR 100 * coalesce(g5s.dup5, 0)
                            <= 30 * greatest(t.n - 4, 0))
                    THEN 1 ELSE 0 END AS BIGINT) AS keep
        FROM d JOIN lstats l USING (doc_id) JOIN toks t USING (doc_id)
        LEFT JOIN g2top USING (doc_id)
        LEFT JOIN g5s USING (doc_id)
    """,
    "doc_pii": r"""
        SELECT doc_id,
               md5(regexp_replace(regexp_replace(regexp_replace(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                   '<EMAIL>', 'g'),
                   '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g'),
                   '\+?[0-9][0-9()\- ]{6,}[0-9]', '<PHONE>', 'g'))
                 AS clean_md5,
               CAST(len(regexp_extract_all(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                 AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(text,
                   '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS BIGINT) AS n_ips,
               CAST(len(regexp_extract_all(text,
                   '\+?[0-9][0-9()\- ]{6,}[0-9]')) AS BIGINT) AS n_phones
        FROM documents
    """,
    "doc_substring_dups": r"""
        WITH d AS (SELECT doc_id, text FROM documents),
        t_toks AS (
            SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS arr
            FROM d),
        grams AS (
            SELECT doc_id,
                   arr[i] || ' ' || arr[i + 1] || ' ' || arr[i + 2] || ' '
                   || arr[i + 3] || ' ' || arr[i + 4] || ' ' || arr[i + 5]
                   || ' ' || arr[i + 6] || ' ' || arr[i + 7] AS gram
            FROM (SELECT doc_id, arr,
                         unnest(generate_series(1, len(arr) - 7)) AS i
                  FROM t_toks)),
        dupg AS (SELECT gram FROM (
                    SELECT gram, count(DISTINCT doc_id) AS ndocs
                    FROM grams GROUP BY 1) WHERE ndocs >= 2),
        cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_spans
                FROM grams JOIN dupg USING (gram) GROUP BY 1)
        SELECT d.doc_id, coalesce(c.n_dup_spans, 0) AS n_dup_spans
        FROM d LEFT JOIN cnt c USING (doc_id)
    """,
    "doc_contamination": r"""
        WITH d AS (SELECT doc_id, text FROM documents),
        t_toks AS (
            SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS arr
            FROM d),
        grams AS (
            SELECT doc_id,
                   arr[i] || ' ' || arr[i + 1] || ' ' || arr[i + 2] || ' '
                   || arr[i + 3] || ' ' || arr[i + 4] || ' ' || arr[i + 5]
                   || ' ' || arr[i + 6] || ' ' || arr[i + 7] AS gram
            FROM (SELECT doc_id, arr,
                         unnest(generate_series(1, len(arr) - 7)) AS i
                  FROM t_toks)),
        dg AS (SELECT DISTINCT doc_id, gram FROM grams),
        rg AS (SELECT DISTINCT gram FROM dg WHERE doc_id % 37 = 0),
        tg AS (SELECT * FROM dg WHERE doc_id % 37 <> 0),
        hits AS (SELECT doc_id, count(*) AS n_shared
                 FROM tg JOIN rg USING (gram) GROUP BY 1)
        SELECT d.doc_id, coalesce(h.n_shared, 0) AS n_shared
        FROM d LEFT JOIN hits h USING (doc_id) WHERE d.doc_id % 37 <> 0
    """,
    "doc_paragraph_dedup": """
        WITH p AS (
            SELECT doc_id, unnest(string_split(text, chr(10))) AS line
            FROM documents
        )
        SELECT md5(line) AS line_md5,
               min(doc_id) AS doc_id,
               CAST(count(*) AS BIGINT) AS n_occurrences,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM p WHERE line <> '' GROUP BY 1
    """,
    "doc_bpe_tokens": """
        SELECT doc_id,
               len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^ A-Za-z0-9]+|\\s+'))
                   AS n_bpe_tokens
        FROM documents
    """,
    "doc_paragraph_rewrite": """
        WITH p AS (
            SELECT doc_id,
                   unnest(string_split(text, chr(10))) AS line,
                   unnest(list_transform(string_split(text, chr(10)),
                                         (x, i) -> i - 1)) AS line_idx
            FROM documents
        ),
        np AS (
            SELECT doc_id, line, line_idx,
                   row_number() OVER (PARTITION BY line
                                      ORDER BY doc_id, line_idx) AS rn
            FROM p WHERE line <> ''
        )
        SELECT doc_id,
               string_agg(line, chr(10) ORDER BY line_idx) AS text_clean,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM np WHERE rn = 1 GROUP BY doc_id
    """,
    "doc_sample": """
        SELECT doc_id, lang FROM documents
        WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
              / 4294967296.0
            < CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.25
                        WHEN 'fr' THEN 0.1 ELSE 0.05 END
    """,
    "doc_quality_lr": learn.quality_lr_sql(iterations=10, lr=0.5),
    "doc_lm_score": r"""
        WITH d AS (SELECT doc_id, text FROM documents),
        t_toks AS (
            SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS arr
            FROM d),
        bg AS (
            SELECT doc_id, arr[i] AS a, arr[i + 1] AS b
            FROM (SELECT doc_id, arr,
                         unnest(generate_series(1, len(arr) - 1)) AS i
                  FROM t_toks)),
        bgc AS (SELECT doc_id, a, b, CAST(count(*) AS BIGINT) AS cnt
                FROM bg GROUP BY 1, 2, 3),
        cab AS (SELECT a, b, CAST(sum(cnt) AS BIGINT) AS c_ab
                FROM bgc GROUP BY 1, 2),
        ca AS (SELECT a, CAST(sum(c_ab) AS BIGINT) AS c_a FROM cab GROUP BY 1),
        sc AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_bigrams,
                      CAST(sum(cnt *
                        (CAST(floor(ln(c_ab) * 1048576.0) AS BIGINT)
                         - CAST(floor(ln(c_a) * 1048576.0) AS BIGINT)))
                      AS BIGINT) AS lm_logprob_q
               FROM bgc JOIN cab USING (a, b) JOIN ca USING (a) GROUP BY 1)
        SELECT d.doc_id,
               coalesce(s.n_bigrams, 0) AS n_bigrams,
               coalesce(s.lm_logprob_q, 0) AS lm_logprob_q
        FROM d LEFT JOIN sc s USING (doc_id)
    """,
    "doc_rarity": r"""
        WITH tok AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(trim(text), '\s+')) AS token
            FROM documents
        ),
        freq AS (SELECT token, count(*) AS n FROM tok GROUP BY 1)
        SELECT t.doc_id,
               count(*) AS n_tokens,
               CAST(min(f.n) AS BIGINT) AS min_tok_freq,
               CAST(sum(f.n) AS BIGINT) AS sum_tok_freq
        FROM tok t JOIN freq f USING (token) GROUP BY 1
    """,
    "knn_top5": """
        WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 10),
        sims AS (SELECT q.query_id, e.vec_id AS neighbor_id,
                        list_cosine_similarity(CAST(q.qe AS DOUBLE[]),
                                               CAST(e.embedding AS DOUBLE[])) AS sim
                 FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.query_id),
        r AS (SELECT query_id, neighbor_id,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY sim DESC, neighbor_id) AS rank
              FROM sims)
        SELECT query_id, neighbor_id, rank FROM r WHERE rank <= 5
    """,
    "embedding_dup_clusters": """
        WITH RECURSIVE p AS (
            SELECT a.vec_id AS a, b.vec_id AS b
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) >= 0.42),
        und AS (SELECT DISTINCT src, dst FROM
                (SELECT a AS src, b AS dst FROM p UNION ALL SELECT b, a FROM p)),
        reach(vertex, m) AS (
            SELECT src AS vertex, src AS m FROM und
            UNION
            SELECT und.dst AS vertex, reach.m
            FROM reach JOIN und ON und.src = reach.vertex
            WHERE reach.m < und.dst
        ),
        comp AS (SELECT vertex, min(m) AS canonical FROM reach GROUP BY vertex)
        SELECT e.vec_id, coalesce(comp.canonical, e.vec_id) AS canonical
        FROM embeddings e LEFT JOIN comp ON comp.vertex = e.vec_id
    """,
    "embedding_dups": """
        SELECT a.vec_id AS a, b.vec_id AS b
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[])) >= 0.42
    """,
    "events_hourly": """
        SELECT user_id, epoch_us(ts) // 3600000000 AS hour,
               count(*) AS n_events,
               CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS value_milli
        FROM events GROUP BY 1, 2
    """,
    "events_sessions": """
        WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                           CAST(floor(value * 1000) AS BIGINT) AS vmilli
                    FROM events),
        d AS (SELECT *,
                     CASE WHEN lag(ts_us) OVER w IS NULL
                               OR ts_us - lag(ts_us) OVER w > 1800000000
                          THEN 1 ELSE 0 END AS new_s
              FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                         ROWS UNBOUNDED PRECEDING) AS session
              FROM d)
        SELECT user_id, min(ts_us) AS session_start_us,
               count(*) AS n_events, CAST(sum(vmilli) AS BIGINT) AS value_milli
        FROM s GROUP BY user_id, session
    """,
    "events_count_min": oracles.count_min_sql(depth=4, width=256, seed=7),
    "events_anomaly": """
        WITH h AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hour,
                          CAST(count(*) AS BIGINT) AS n_events
                   FROM events GROUP BY 1, 2),
        st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(n_events) AS BIGINT) AS s,
                      CAST(sum(n_events * n_events) AS BIGINT) AS ss
               FROM h GROUP BY 1)
        SELECT h.event_type, h.hour, h.n_events
        FROM h JOIN st USING (event_type)
        WHERE (h.n_events * st.n - st.s) * (h.n_events * st.n - st.s)
              >= 9 * (st.n * st.ss - st.s * st.s)
          AND (st.n * st.ss - st.s * st.s) > 0
    """,
    "events_retention": """
        WITH uh AS (SELECT DISTINCT user_id,
                           epoch_us(ts) // 3600000000 AS hour
                    FROM events)
        SELECT a.hour, count(*) AS active,
               CAST(sum(CASE WHEN b.user_id IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS retained
        FROM uh a LEFT JOIN uh b
          ON b.user_id = a.user_id AND b.hour = a.hour + 1
        GROUP BY a.hour
    """,
    "events_type_totals": """
        SELECT event_type, count(*) AS n,
               CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS value_milli
        FROM events GROUP BY 1
    """,
    # sliding 60-min windows advancing every 15 min: each event belongs to 4
    # windows (the same np.repeat expansion the Ray kernel does)
    "events_sliding": """
        SELECT (epoch_us(ts) // 900000000 - j.j) * 900000000 AS window_start_us,
               count(*) AS n_events,
               CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS value_milli
        FROM events, unnest(generate_series(0, 3)) AS j(j)
        WHERE (epoch_us(ts) // 900000000 - j.j) >= 0
        GROUP BY 1
    """,
    "events_sliding_users": """
        SELECT (epoch_us(ts) // 900000000 - j.j) * 900000000 AS window_start_us,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events, unnest(generate_series(0, 3)) AS j(j)
        WHERE (epoch_us(ts) // 900000000 - j.j) >= 0
        GROUP BY 1
    """,
    # as-of join: DuckDB's native ASOF LEFT JOIN (latest click with
    # click.ts <= purchase.ts per user); -1 sentinels mirror the Ray op
    "events_asof": """
        SELECT p.event_id, p.user_id,
               CAST(epoch_us(p.ts) AS BIGINT) AS ts_us,
               CAST(COALESCE(c.event_id, -1) AS BIGINT) AS prior_event_id,
               CAST(COALESCE(epoch_us(p.ts) - epoch_us(c.ts), -1) AS BIGINT)
                   AS gap_us
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    # range join: clicks in the trailing half-open hour (p.ts-60min, p.ts]
    "events_range_join": """
        SELECT p.event_id, p.user_id,
               CAST(count(c.event_id) AS BIGINT) AS n_in_window
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON c.user_id = p.user_id
         AND c.ts > p.ts - INTERVAL 60 MINUTE AND c.ts <= p.ts
        GROUP BY 1, 2
    """,
    "join_orders_customer": """
        SELECT o.o_orderkey, o.o_custkey, o.o_totalprice,
               c.c_name, c.c_nationkey
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    "join_lineitem_orders": """
        SELECT l.l_orderkey, l.l_linenumber, l.l_quantity,
               o.o_custkey, o.o_orderstatus
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
    "join_customer_no_f_orders": """
        SELECT c.c_custkey, c.c_acctbal
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderstatus = 'F')
    """,
    "join_customer_order_counts": """
        SELECT c.c_custkey,
               CAST(COALESCE(n.cnt, 0) AS BIGINT) AS n_orders
        FROM customer c
        LEFT JOIN (SELECT o_custkey, count(*) AS cnt FROM orders
                   GROUP BY o_custkey) n ON n.o_custkey = c.c_custkey
    """,
    "doc_vocab": r"""
        SELECT t AS token, count(*) AS n
        FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS t
              FROM documents)
        GROUP BY 1
    """,
    "graph_bipartite": oracles.bipartite_sql(DERIVED_EDGES_CTE, n_lefts=20,
                                             reset_left=0.1, reset_right=0.1, k=2),
    "graph_wtf": f"""
        WITH bip AS ({oracles.bipartite_sql(
            DERIVED_EDGES_CTE, reset_left=0.1, reset_right=0.1, k=2,
            lefts_cte=f'''SELECT vertex, rank AS w0 FROM (
                SELECT vertex, rank, row_number() OVER (
                    ORDER BY CAST(floor(rank * 1000000.0) AS BIGINT) DESC,
                             vertex ASC) AS rn
                FROM ({oracles.ppr_sql(DERIVED_EDGES_CTE, {WTF_USER: 1.0},
                                       iterations=10)}) p) WHERE rn <= {WTF_COT_SIZE}''')}),
        followed AS (SELECT DISTINCT dst FROM ({DERIVED_EDGES_CTE})
                     WHERE src = {WTF_USER})
        SELECT vertex, weight, contributors FROM (
            SELECT vertex, weight, contributors, row_number() OVER (
                ORDER BY CAST(floor(weight * 1000000000.0) AS BIGINT) DESC,
                         vertex ASC) AS rn
            FROM bip WHERE side = 'right' AND vertex <> {WTF_USER}
                  AND vertex NOT IN (SELECT dst FROM followed))
        WHERE rn <= {WTF_TOP_K}""",
    "doc_langid": oracles.langid_sql(textops._LANG_MARKERS),
    "graph_reciprocity": f"""
        WITH e AS ({DERIVED_EDGES_CTE}),
        ne AS (SELECT DISTINCT src, dst FROM e WHERE src <> dst),
        m AS (SELECT count(*) AS mutual FROM ne a
              JOIN ne b ON b.src = a.dst AND b.dst = a.src),
        t AS (SELECT count(*) AS total FROM ne)
        SELECT mutual AS mutual_edges, total AS total_edges,
               CAST(mutual AS DOUBLE) / total AS reciprocity FROM m, t
    """,
    "graph_degree_hist": f"""
        WITH e AS ({DERIVED_EDGES_CTE}),
        v AS (SELECT src AS vertex FROM e UNION SELECT dst FROM e),
        o AS (SELECT src AS vertex, count(*) AS c FROM e GROUP BY 1)
        SELECT coalesce(o.c, 0) AS deg, count(*) AS n_vertices
        FROM v LEFT JOIN o USING (vertex) GROUP BY 1
    """,
    "graph_two_hop": f"""
        WITH e AS ({DERIVED_EDGES_CTE}),
        d AS (SELECT vertex, sum(o) AS od, sum(i) AS idg FROM (
                  SELECT src AS vertex, 1 AS o, 0 AS i FROM e
                  UNION ALL SELECT dst, 0, 1 FROM e) GROUP BY 1),
        ok AS (SELECT vertex FROM d WHERE od + idg <= 120),
        mids AS (SELECT e.src, e.dst FROM e JOIN ok a ON a.vertex = e.src),
        fst AS (SELECT e.src, e.dst FROM e JOIN ok ON ok.vertex = e.dst)
        SELECT f.src AS vertex, count(DISTINCT m.dst) AS n_two_hop
        FROM fst f JOIN mids m ON m.src = f.dst
        WHERE m.dst <> f.src GROUP BY 1
    """,
    "graph_kcore": oracles.k_core_sql(DERIVED_EDGES_CTE, k=90, rounds=10),
    "graph_edge_supports": oracles.edge_supports_sql(DERIVED_EDGES_CTE),
    "graph_ktruss": oracles.k_truss_sql(DERIVED_EDGES_CTE, k=8, rounds=10),
    "graph_densest": oracles.densest_subgraph_sql(
        SKEWED_EDGES_CTE, epsilon=0.1, rounds=10),
    "graph_coreness": oracles.coreness_sql(DERIVED_EDGES_CTE, rounds=18),
    "graph_wl": oracles.wl_refinement_sql(DERIVED_EDGES_CTE, rounds=3),
    "graph_contract": f"""
        WITH e AS MATERIALIZED ({DERIVED_EDGES_CTE}),
        comm AS (SELECT vertex, vertex % 7 AS community FROM (
            SELECT DISTINCT vertex FROM (
                SELECT src AS vertex FROM e UNION ALL SELECT dst FROM e)))
        SELECT a.community AS src, b.community AS dst, count(*) AS weight
        FROM e JOIN comm a ON a.vertex = e.src
        JOIN comm b ON b.vertex = e.dst
        WHERE a.community <> b.community GROUP BY 1, 2
    """,
    "graph_sample_neighbors": f"""
        WITH e AS ({DERIVED_EDGES_CTE})
        SELECT src, dst FROM (
            SELECT src, dst, row_number() OVER (PARTITION BY src
                ORDER BY md5('7|' || CAST(src AS VARCHAR) || '|'
                             || CAST(dst AS VARCHAR)), dst) AS rn
            FROM e)
        WHERE rn <= 3
    """,
    "graph_conductance": f"""
        WITH e AS MATERIALIZED ({DERIVED_EDGES_CTE}),
        cu AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS src,
                            greatest(src, dst) AS dst FROM e WHERE src <> dst),
        comm AS (SELECT vertex, vertex % 7 AS community FROM (
            SELECT DISTINCT vertex FROM (
                SELECT src AS vertex FROM e UNION ALL SELECT dst FROM e))),
        deg AS (SELECT vertex, count(*) AS deg FROM (
            SELECT src AS vertex FROM cu UNION ALL SELECT dst FROM cu)
            GROUP BY 1),
        vol AS (SELECT community, CAST(sum(deg) AS BIGINT) AS volume
                FROM deg JOIN comm USING (vertex) GROUP BY 1),
        tot AS (SELECT CAST(sum(deg) AS BIGINT) AS t FROM deg),
        tagged AS (SELECT a.community AS ca, b.community AS cb
                   FROM cu JOIN comm a ON a.vertex = cu.src
                   JOIN comm b ON b.vertex = cu.dst),
        cut AS (SELECT community, count(*) AS cut_edges FROM (
            SELECT ca AS community FROM tagged WHERE ca <> cb
            UNION ALL SELECT cb FROM tagged WHERE ca <> cb) GROUP BY 1)
        SELECT v.community, coalesce(c.cut_edges, 0) AS cut_edges, v.volume,
               CASE WHEN least(v.volume, t.t - v.volume) > 0
                    THEN CAST(coalesce(c.cut_edges, 0) AS DOUBLE)
                         / least(v.volume, t.t - v.volume)
                    ELSE 0.0 END AS conductance
        FROM vol v LEFT JOIN cut c USING (community), tot t
    """,
    "web_host_graph": f"""
        WITH e AS ({DERIVED_EDGES_CTE}),
        urls AS (
            SELECT 'http://h' || CAST(src % 53 AS VARCHAR) || '.test/p/'
                   || CAST(src AS VARCHAR) AS src_url,
                   'http://h' || CAST(dst % 53 AS VARCHAR) || '.test/p/'
                   || CAST(dst AS VARCHAR) AS dst_url
            FROM e)
        SELECT regexp_extract(src_url, '^https?://([^/?#]*)', 1) AS src_host,
               regexp_extract(dst_url, '^https?://([^/?#]*)', 1) AS dst_host,
               count(*) AS n_links
        FROM urls GROUP BY 1, 2
    """,
    "web_host_pagerank": oracles.pagerank_weighted_sql(
        f"SELECT src % 53 AS src, dst % 53 AS dst,"
        f" CAST(count(*) AS DOUBLE) AS w"
        f" FROM ({DERIVED_EDGES_CTE}) e GROUP BY 1, 2", iterations=10),
    "web_trustrank": oracles.ppr_sql(
        f"SELECT DISTINCT src % 53 AS src, dst % 53 AS dst"
        f" FROM ({DERIVED_EDGES_CTE}) e", TRUST_SEEDS, iterations=10),
    "web_spam_mass": f"""
        SELECT pr.vertex AS vertex, pr.rank AS pr, tr.rank AS trust,
               (pr.rank - tr.rank) / pr.rank AS spam_mass
        FROM ({oracles.pagerank_sql(
            f"SELECT DISTINCT src % 53 AS src, dst % 53 AS dst"
            f" FROM ({DERIVED_EDGES_CTE}) e", iterations=10)}) pr
        JOIN ({oracles.ppr_sql(
            f"SELECT DISTINCT src % 53 AS src, dst % 53 AS dst"
            f" FROM ({DERIVED_EDGES_CTE}) e", TRUST_SEEDS,
            iterations=10)}) tr USING (vertex)""",
    "web_host_mirrors": f"""
        WITH e AS (SELECT DISTINCT src % 53 AS src, dst % 53 AS dst
                   FROM ({DERIVED_EDGES_CTE}) de),
        deg AS (SELECT src AS vtx, count(*) AS deg FROM e GROUP BY 1),
        okd AS (SELECT dst FROM e GROUP BY 1
                HAVING count(*) <= {SIM_MAX_IN_DEG}),
        ef AS (SELECT e.src, e.dst FROM e JOIN okd USING (dst)),
        co AS (SELECT a.src AS u, b.src AS w, count(*) AS common
               FROM ef a JOIN ef b ON a.dst = b.dst AND a.src <> b.src
               GROUP BY 1, 2),
        scored AS (SELECT co.u, co.w,
                          CAST(common AS DOUBLE)
                            / (du.deg + dw.deg - common) AS score
                   FROM co JOIN deg du ON du.vtx = co.u
                           JOIN deg dw ON dw.vtx = co.w),
        ranked AS (SELECT u, w, score,
                          row_number() OVER (PARTITION BY u
                              ORDER BY score DESC, w ASC) AS rank
                   FROM scored)
        SELECT u, w, score, rank FROM ranked WHERE rank <= 3""",
    "web_rank_delta": f"""
        SELECT vertex, pr_old, pr_new, delta FROM (
            SELECT o.vertex AS vertex, o.rank AS pr_old, n.rank AS pr_new,
                   n.rank - o.rank AS delta,
                   row_number() OVER (
                       ORDER BY CAST(floor(abs(n.rank - o.rank)
                                           * 1000000000.0) AS BIGINT) DESC,
                                o.vertex ASC) AS rn
            FROM ({oracles.pagerank_sql(DERIVED_EDGES_CTE, iterations=10)}) o
            JOIN ({oracles.pagerank_sql(
                f"SELECT src, dst FROM ({DERIVED_EDGES_CTE}) e"
                f" WHERE (src + dst) % 11 <> 0", iterations=10)}) n
              ON n.vertex = o.vertex)
        WHERE rn <= 50""",
    "web_redirect_resolve": f"""
        WITH e AS ({DERIVED_EDGES_CTE}),
        v AS (SELECT DISTINCT u FROM
              (SELECT src AS u FROM e UNION ALL SELECT dst FROM e)),
        r0 AS (SELECT u AS src, u + 1 AS dst FROM v WHERE u % 7 < 3),
        r1 AS (SELECT a.src, COALESCE(b.dst, a.dst) AS dst
               FROM r0 a LEFT JOIN r0 b ON b.src = a.dst),
        r2 AS (SELECT a.src, COALESCE(b.dst, a.dst) AS dst
               FROM r1 a LEFT JOIN r1 b ON b.src = a.dst)
        SELECT 'http://h' || (src % 53) || '.test/p/' || src AS url,
               'http://h' || (dst % 53) || '.test/p/' || dst AS final_url
        FROM r2""",
    "web_anchor_texts": f"""
        SELECT 'http://h' || (dst % 53) || '.test/p/' || dst AS dst_url,
               'node ' || dst || ' from ' || src AS anchor,
               count(*) AS n
        FROM ({DERIVED_EDGES_CTE}) e GROUP BY 1, 2""",
    "web_crawl_frontier": f"""
        WITH e AS (SELECT * FROM ({DERIVED_EDGES_CTE}) WHERE src % 5 <> 0),
        urls AS (
            SELECT 'http://h' || CAST(src % 53 AS VARCHAR) || '.test/p/'
                   || CAST(src AS VARCHAR) AS src_url,
                   'http://h' || CAST(dst % 53 AS VARCHAR) || '.test/p/'
                   || CAST(dst AS VARCHAR) AS dst_url
            FROM e),
        cand AS (SELECT dst_url AS url, count(*) AS n_inlinks
                 FROM urls GROUP BY 1),
        crawled AS (SELECT DISTINCT src_url AS url FROM urls)
        SELECT c.url, CAST(c.n_inlinks AS BIGINT) AS n_inlinks
        FROM cand c ANTI JOIN crawled w USING (url)
    """,
    "web_url_dedup": f"""
        WITH e AS ({DERIVED_EDGES_CTE}),
        urls AS (
            SELECT 'http://h' || CAST(dst % 53 AS VARCHAR) || '.test'
                   || CASE WHEN src % 7 = 0 THEN ':80' ELSE '' END
                   || '/p/' || CAST(dst AS VARCHAR)
                   || CASE WHEN src % 2 = 0 THEN '/' ELSE '' END
                   || CASE
                        WHEN src % 3 = 0 AND dst % 5 = 0 THEN
                          '?utm_source=s' || CAST(src % 5 AS VARCHAR)
                          || '&q=' || CAST(dst % 11 AS VARCHAR)
                        WHEN src % 3 = 0 THEN
                          '?utm_source=s' || CAST(src % 5 AS VARCHAR)
                        WHEN dst % 5 = 0 THEN
                          '?q=' || CAST(dst % 11 AS VARCHAR)
                        ELSE '' END
                   || CASE WHEN src % 11 = 0
                           THEN '#f' || CAST(src % 4 AS VARCHAR)
                           ELSE '' END AS url
            FROM e),
        canon AS (
            SELECT url,
              regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                regexp_replace(regexp_replace(url,
                  '#.*$', '', 'g'),
                  '&utm_[^&]*', '', 'g'),
                  '\\?utm_[^&]*&', '?', 'g'),
                  '\\?utm_[^&]*$', '', 'g'),
                  '^(http://[^/:?#]+):80(/|\\?|$)', '\\1\\2', 'g'),
                  '^([a-z]+://[^?#]*[^/?#])/(\\?|$)', '\\1\\2', 'g')
              AS canonical_url
            FROM urls)
        SELECT canonical_url, count(*) AS n_variants,
               min(url) AS kept_url
        FROM canon GROUP BY 1
    """,
    "graph_scc": oracles.scc_sql(DERIVED_EDGES_CTE),
    "doc_dedup_clusters": oracles.dedup_clusters_sql(n=3, max_df=50, threshold=0.5),
    "graph_harmonic": oracles.harmonic_sql(
        DERIVED_EDGES_CTE, sources=list(range(8)), max_depth=32),
    "graph_eccentricity": oracles.eccentricity_sql(
        DERIVED_EDGES_CTE, sources=list(range(8)), max_depth=32),
    "graph_degree_quantiles": f"""
        WITH e AS ({DERIVED_EDGES_CTE}),
        o AS (SELECT src AS v, count(*) AS c FROM e GROUP BY 1),
        h AS (SELECT c AS deg, count(*) AS nv FROM o GROUP BY 1),
        n AS (SELECT count(*) AS n FROM o),
        cum AS (SELECT deg, sum(nv) OVER (ORDER BY deg) AS cum FROM h),
        q(q_pct) AS (VALUES (50), (90), (99))
        SELECT CAST(q.q_pct AS BIGINT) AS q_pct, CAST(min(cum.deg) AS BIGINT) AS degree
        FROM q CROSS JOIN n CROSS JOIN cum
        WHERE cum.cum >= (q.q_pct * n.n + 99) // 100
        GROUP BY 1
    """,
    "graph_neighbor_agg": f"""
        WITH e AS ({DERIVED_EDGES_CTE})
        SELECT e.src AS vertex, count(*) AS n_neighbors,
               CAST(sum(e.dst % 97) AS BIGINT) AS sum_val,
               CAST(min(e.dst % 97) AS BIGINT) AS min_val,
               CAST(max(e.dst % 97) AS BIGINT) AS max_val
        FROM e GROUP BY 1
    """,
    "events_funnel": """
        WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        v AS (SELECT user_id, min(ts_us) AS t1 FROM ev
              WHERE event_type = 'view' GROUP BY 1),
        c AS (SELECT e.user_id, min(e.ts_us) AS t2
              FROM ev e JOIN v ON v.user_id = e.user_id
              WHERE e.event_type = 'click' AND e.ts_us > v.t1 GROUP BY 1),
        p AS (SELECT e.user_id, min(e.ts_us) AS t3
              FROM ev e JOIN c ON c.user_id = e.user_id
              WHERE e.event_type = 'purchase' AND e.ts_us > c.t2 GROUP BY 1)
        SELECT v.user_id,
               CAST(1 + CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END
                      + CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END
                    AS BIGINT) AS stages,
               v.t1 AS first_step_us
        FROM v LEFT JOIN c ON c.user_id = v.user_id
               LEFT JOIN p ON p.user_id = v.user_id
    """,
    "events_latest": """
        SELECT user_id, event_id, ts_us, event_type, value FROM (
            SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
                   event_type, value,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events)
        WHERE rn = 1
    """,
    "graph_dynamic": f"""
        WITH e AS ({DERIVED_EDGES_CTE}),
        rem AS (SELECT src, dst FROM e WHERE (src + dst) % 5 = 0),
        adds AS (SELECT src, (dst + 1) % {GRAPH_MOD} AS dst FROM e
                 WHERE src % 7 = 0 AND src <> (dst + 1) % {GRAPH_MOD})
        (SELECT src, dst FROM e EXCEPT SELECT src, dst FROM rem)
        UNION
        SELECT src, dst FROM adds
    """,
    "events_top_users": """
        WITH t AS (SELECT event_type, user_id, count(*) AS n_events
                   FROM events GROUP BY 1, 2),
        r AS (SELECT *, row_number() OVER (PARTITION BY event_type
                                           ORDER BY n_events DESC, user_id ASC)
                            AS rank
              FROM t)
        SELECT event_type, user_id, n_events, rank FROM r WHERE rank <= 3
    """,
    "graph_assortativity": f"""
        WITH e AS ({DERIVED_EDGES_CTE}),
        o AS (SELECT src AS v, count(*) AS od FROM e GROUP BY 1),
        i AS (SELECT dst AS v, count(*) AS idg FROM e GROUP BY 1),
        xy AS (SELECT o.od AS x, i.idg AS y
               FROM e JOIN o ON o.v = e.src JOIN i ON i.v = e.dst),
        s AS (SELECT count(*) AS n,
                     CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                     CAST(sum(x*x) AS BIGINT) AS sxx,
                     CAST(sum(y*y) AS BIGINT) AS syy,
                     CAST(sum(x*y) AS BIGINT) AS sxy
              FROM xy)
        SELECT n AS n_edges, sx, sy, sxx, syy, sxy,
               CASE WHEN n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0
                    THEN CAST(n*sxy - sx*sy AS DOUBLE)
                         / sqrt(CAST(n*sxx - sx*sx AS DOUBLE)
                                * CAST(n*syy - sy*sy AS DOUBLE))
                    ELSE 0.0 END AS assortativity
        FROM s
    """,
    # media oracles: the synth generators are affine-mod functions of
    # (media_id, x, y, ch, t) — the SQL recomputes their integer stats in
    # closed form while the Ray side round-trips the real codec (BMP / WAV /
    # raw-frame container); any encode/decode bug breaks the match
    "media_image_stats": """
        WITH g AS (SELECT doc_id, doc_id % 7 + 1 AS a, doc_id % 11 + 2 AS b,
                          (doc_id * 13) % 256 AS c
                   FROM documents),
        px AS (SELECT doc_id, (a * x.x + b * y.y + c + 31 * ch.ch) % 256 AS v
               FROM g, range(0, 40) x(x), range(0, 24) y(y), range(0, 3) ch(ch))
        SELECT doc_id AS media_id, CAST(40 AS BIGINT) AS width,
               CAST(24 AS BIGINT) AS height,
               CAST(sum(v) AS BIGINT) AS px_sum,
               min(v) AS px_min, max(v) AS px_max
        FROM px GROUP BY doc_id
    """,
    "media_image_ahash": """
        WITH g AS (SELECT doc_id, doc_id % 7 + 1 AS a, doc_id % 11 + 2 AS b,
                          (doc_id * 13) % 256 AS c
                   FROM documents),
        px AS (SELECT doc_id, x.x AS x, y.y AS y,
                      (a * x.x + b * y.y + c) % 256
                      + (a * x.x + b * y.y + c + 31) % 256
                      + (a * x.x + b * y.y + c + 62) % 256 AS gray
               FROM g, range(0, 40) x(x), range(0, 24) y(y)),
        cells AS (SELECT doc_id, y // 3 AS gy, x // 5 AS gx,
                         CAST(sum(gray) AS BIGINT) AS cs
                  FROM px GROUP BY 1, 2, 3),
        tot AS (SELECT doc_id, CAST(sum(cs) AS BIGINT) AS total
                FROM cells GROUP BY 1),
        bits AS (SELECT cells.doc_id, gy * 8 + gx AS i,
                        CASE WHEN cs * 64 > total THEN 1 ELSE 0 END AS bit
                 FROM cells JOIN tot USING (doc_id))
        SELECT doc_id AS media_id,
               CAST(sum(CASE WHEN bit = 1 AND i >= 32
                        THEN (CAST(1 AS BIGINT) << (i - 32)) ELSE 0 END)
                    AS BIGINT) AS ahash_hi,
               CAST(sum(CASE WHEN bit = 1 AND i < 32
                        THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)
                    AS BIGINT) AS ahash_lo
        FROM bits GROUP BY doc_id
    """,
    "media_audio_stats": """
        WITH p AS (SELECT doc_id, 800 + (doc_id % 5) * 100 AS n,
                          doc_id % 13 + 3 AS k
                   FROM documents),
        s AS (SELECT doc_id, n, k, t.t AS t, ((t.t * k) % 2048) - 1024 AS v
              FROM p, range(0, 1200) t(t) WHERE t.t < n)
        SELECT doc_id AS media_id, CAST(max(n) AS BIGINT) AS n_samples,
               CAST(sum(v) AS BIGINT) AS s_sum,
               CAST(sum(abs(v)) AS BIGINT) AS abs_sum,
               CAST(sum(CASE WHEN t >= 1
                             AND v * (((t - 1) * k) % 2048 - 1024) < 0
                        THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
        FROM s GROUP BY doc_id
    """,
    "media_video_frames": """
        WITH g AS (SELECT doc_id, doc_id % 7 + 1 AS a, doc_id % 11 + 2 AS b,
                          (doc_id * 13) % 256 AS c
                   FROM documents)
        SELECT doc_id AS media_id, f.f AS frame_idx,
               CAST(sum((a * x.x + b * y.y + c + 17 * f.f) % 256) AS BIGINT)
                   AS frame_sum
        FROM g, range(0, 6) f(f), range(0, 16) x(x), range(0, 16) y(y)
        WHERE f.f % 2 = 0
        GROUP BY doc_id, f.f
    """,
    "doc_tfidf": r"""
        WITH toks AS (SELECT doc_id,
                             unnest(regexp_split_to_array(trim(text), '\s+')) AS token
                      FROM documents),
        tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
        df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT count(*) AS n FROM documents),
        r AS (SELECT tf.doc_id, tf.token, tf.tf, df.df,
                     row_number() OVER (PARTITION BY tf.doc_id
                                        ORDER BY tf.tf * ln(CAST(n.n AS DOUBLE) / df.df) DESC,
                                                 tf.token) AS rank
              FROM tf JOIN df USING (token), n)
        SELECT doc_id, token, tf, df, rank FROM r WHERE rank <= 3
    """,
    "doc_curation": r"""
        WITH f AS (SELECT doc_id, md5(text) AS m,
                          length(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
                          length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS n_alpha,
                          length(text) AS n_chars
                   FROM documents),
        kept AS (SELECT * FROM f WHERE n_tokens >= 10 AND 2 * n_alpha >= n_chars),
        canon AS (SELECT m, min(doc_id) AS doc_id FROM kept GROUP BY 1)
        SELECT k.doc_id, k.n_tokens FROM kept k JOIN canon USING (doc_id)
    """,
}
ORACLE_SQL = {k: v for k, v in ORACLE_SQL.items() if v is not None}
