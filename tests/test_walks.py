"""Random-walk fixtures from ``GraphUtilsSpec.scala:41-123`` (FIXTURES §4):
exact behavior at resetProb 0 on a 2-cycle, statistical coverage on g6,
and counter-RNG parallelism invariance (the reference's seeded sequential
Random is replaced by a (seed, walker, step) counter generator)."""

from __future__ import annotations

import os

import pytest

from cassovary_ray.corpus import TOY_GRAPHS
from cassovary_ray.engine import ShardedGraph

from tests.util import build_toy_layout


def run_walk(adj, tmp_dir, starts, steps, num_parts=2, **kwargs):
    lay = os.path.join(tmp_dir, f"w{num_parts}")
    build_toy_layout(adj, lay, num_parts)
    with ShardedGraph(lay) as g:
        df = g.random_walks(starts, steps, **kwargs).to_pandas()
    return dict(zip(df.vertex, df.visits))


def test_two_cycle_two_steps(tmp_dir):
    """2-cycle, resetProb 0, 2 steps from node 1 → visits {1:1, 2:1}
    (`GraphUtilsSpec.scala:49-55`)."""
    got = run_walk(TOY_GRAPHS["g2_mutual"], tmp_dir, [1], 2, reset_prob=0.0)
    assert got == {1: 1, 2: 1}


@pytest.mark.parametrize("steps", [5, 8])
def test_two_cycle_parity(tmp_dir, steps):
    """n-step walk on the 2-cycle alternates deterministically
    (`GraphUtilsSpec.scala:67-84`)."""
    got = run_walk(TOY_GRAPHS["g2_mutual"], tmp_dir, [1], steps, reset_prob=0.0)
    assert got[1] == (steps + 1) // 2
    assert got[2] == steps // 2


def test_dangling_resets_to_start(tmp_dir):
    """On g3_dangling (0→1→2, 2 dangling) a walker hitting 2 resets to its
    start; visits keep accumulating (dangling-reset rule,
    `Traverser.scala:93-102`)."""
    got = run_walk(TOY_GRAPHS["g3_dangling"], tmp_dir, [0], 9, reset_prob=0.0)
    assert got == {0: 3, 1: 3, 2: 3}


def test_g6_coverage_statistical(tmp_dir):
    """g6, 1000 total visits → every node visited ≥ 10 times
    (`GraphUtilsSpec.scala:107-123` adapted to 10 parallel walkers)."""
    got = run_walk(TOY_GRAPHS["g6"], tmp_dir, [10] * 10, 100,
                   reset_prob=0.1, seed=7)
    assert sum(got.values()) == 1000
    for n in TOY_GRAPHS["g6"]:
        assert got.get(n, 0) >= 10


def test_parallelism_invariance(tmp_dir):
    """Identical visit counts at P=1 and P=3 with the same seed."""
    kw = dict(reset_prob=0.2, seed=13)
    a = run_walk(TOY_GRAPHS["g7"], tmp_dir, [10, 12, 15], 50, num_parts=1, **kw)
    b = run_walk(TOY_GRAPHS["g7"], tmp_dir, [10, 12, 15], 50, num_parts=3, **kw)
    assert a == b


def test_hub_pruning_skips_home_by_default(tmp_dir):
    """Home nodes are exempt from the out-degree threshold unless
    filterHomeNodeByNumEdges is set (`Traverser.scala:95-98`): a walker
    starting AT the hub still leaves it."""
    got = run_walk(TOY_GRAPHS["g6"], tmp_dir, [10], 6,
                   reset_prob=0.0, max_out_deg=2, seed=3)
    assert sum(got.values()) == 6
    assert got[10] < 6  # the walk left the hub start


def test_hub_pruning_filter_home_resets(tmp_dir):
    """With filter_home_by_num_edges=True the threshold applies at home too:
    on g6 with thresh 2, hub start 10 (deg 3) resets forever."""
    got = run_walk(TOY_GRAPHS["g6"], tmp_dir, [10], 6,
                   reset_prob=0.0, max_out_deg=2, seed=3,
                   filter_home_by_num_edges=True)
    assert got == {10: 6}  # every visit to 10 resets back to 10


def test_hub_pruning_resets_at_non_home_hub(tmp_dir):
    """A NON-home hub still triggers the reset: start at 15 (deg 2) on g6
    with thresh 2; any arrival at hub 10 (deg 3) bounces back to 15."""
    got = run_walk(TOY_GRAPHS["g6"], tmp_dir, [15], 60,
                   reset_prob=0.0, max_out_deg=2, seed=3)
    # 10 is visited (15→10 is an edge) but never expanded: 10's exclusive
    # out-neighbor 13 is unreachable any other way
    assert got.get(10, 0) > 0
    assert got.get(13, 0) == 0


def test_unknown_start_vertex_dropped(tmp_dir):
    """A walker whose start vertex is not in the graph is dropped — the
    reference returns empty counters for a missing start
    (`GraphUtils.scala:110-113` existsNodeId)."""
    got = run_walk(TOY_GRAPHS["g2_mutual"], tmp_dir, [1, 999], 4,
                   reset_prob=0.0)
    # only walker 1 contributes: visits 1,2,1,2
    assert got == {1: 2, 2: 2}


def test_prev_neighbor_counts(tmp_dir):
    """PrevNbrCounter semantics: (vertex, prev) visit-pair counts; resets
    break the path (no prev recorded). 2-cycle from 1, 4 steps:
    visits 1,2,1,2 → (2 prev 1):2, (1 prev 2):1."""
    import os

    from cassovary_ray.corpus import TOY_GRAPHS
    from cassovary_ray.engine import ShardedGraph
    from tests.util import build_toy_layout

    lay = os.path.join(tmp_dir, "pc")
    build_toy_layout(TOY_GRAPHS["g2_mutual"], lay, 2)
    with ShardedGraph(lay) as g:
        g.random_walks([1], 4, reset_prob=0.0, track_prev=True)
        df = g.walk_prev_neighbor_counts().to_pandas()
    got = {(r.vertex, r.prev): r.count for r in df.itertuples()}
    assert got == {(2, 1): 2, (1, 2): 1}


def test_paths_counter_two_cycle(tmp_dir):
    """`GraphUtilsSpec.scala:49-55`: 2-cycle, resetProb 0, 2 steps from 1 →
    path counts {1: [((1,), 1)], 2: [((1,2), 1)]}."""
    import os

    from cassovary_ray.corpus import TOY_GRAPHS
    from cassovary_ray.engine import ShardedGraph
    from tests.util import build_toy_layout

    lay = os.path.join(tmp_dir, "paths")
    build_toy_layout(TOY_GRAPHS["g2_mutual"], lay, 2)
    with ShardedGraph(lay) as g:
        g.random_walks([1], 2, reset_prob=0.0, track_paths=True)
        df = g.walk_top_paths(top_k=2).to_pandas()
    got = {(r.vertex, tuple(r.path)): r.count for r in df.itertuples()}
    assert got == {(1, (1,)): 1, (2, (1, 2)): 1}


def test_paths_counter_top_k_ordering(tmp_dir):
    """Longer walk on the 2-cycle: node 1's paths are (1) repeated (reset at
    home each revisit... resetProb 0 so only the home-visit rule applies:
    every visit to 1 resets the path). 6 steps: visits 1,2,1,2,1,2 →
    node 1 paths: (1,)x3; node 2 paths: (1,2)x3."""
    import os

    from cassovary_ray.corpus import TOY_GRAPHS
    from cassovary_ray.engine import ShardedGraph
    from tests.util import build_toy_layout

    lay = os.path.join(tmp_dir, "paths2")
    build_toy_layout(TOY_GRAPHS["g2_mutual"], lay, 2)
    with ShardedGraph(lay) as g:
        g.random_walks([1], 6, reset_prob=0.0, track_paths=True)
        df = g.walk_top_paths(top_k=1).to_pandas()
    got = {(r.vertex, tuple(r.path)): r.count for r in df.itertuples()}
    assert got == {(1, (1,)): 3, (2, (1, 2)): 3}


# -- walk_corpus (DeepWalk-style sequence generation) -----------------------

def _corpus(adj, tmp_dir, num_parts, **kwargs):
    lay = os.path.join(tmp_dir, f"wc{num_parts}")
    build_toy_layout(adj, lay, num_parts)
    with ShardedGraph(lay) as g:
        return g.walk_corpus(**kwargs).to_pandas()


def test_walk_corpus_shape_and_validity(tmp_dir):
    adj = TOY_GRAPHS["g6"]
    L, W = 6, 2
    df = _corpus(adj, tmp_dir, 3, walks_per_vertex=W, walk_length=L, seed=7)
    verts = sorted({u for u in adj} | {v for nb in adj.values() for v in nb})
    assert len(df) == len(verts) * W * L
    edges = {(u, v) for u, nb in adj.items() for v in nb}
    for (wid, walk), g in df.groupby(["walker_id", "walk"]):
        g = g.sort_values("step")
        assert list(g.step) == list(range(L))
        seq = list(g.vertex)
        assert seq[0] == wid  # step 0 visits the start
        for a, b in zip(seq, seq[1:]):
            # unbiased step: an out-edge, or a reset to start (dangling)
            assert (a, b) in edges or b == wid


def test_walk_corpus_partition_invariant_and_replicas_differ(tmp_dir):
    adj = TOY_GRAPHS["g6"]
    kw = dict(walks_per_vertex=2, walk_length=8, seed=11)
    a = (_corpus(adj, tmp_dir, 1, **kw)
         .sort_values(["walker_id", "walk", "step"]).reset_index(drop=True))
    b = (_corpus(adj, os.path.join(tmp_dir, "p3"), 3, **kw)
         .sort_values(["walker_id", "walk", "step"]).reset_index(drop=True))
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)
    # the two replicas are independent RNG streams: at least one start
    # vertex must produce two different sequences
    w0 = a[a.walk == 0].pivot(index="walker_id", columns="step", values="vertex")
    w1 = a[a.walk == 1].pivot(index="walker_id", columns="step", values="vertex")
    assert not w0.equals(w1)


def test_walk_corpus_sequences_match_long(tmp_dir):
    adj = TOY_GRAPHS["g6"]
    kw = dict(walks_per_vertex=2, walk_length=5, seed=3)
    lay = os.path.join(tmp_dir, "wcseq")
    build_toy_layout(adj, lay, 3)
    with ShardedGraph(lay) as g:
        long = g.walk_corpus(**kw).to_pandas()
    with ShardedGraph(lay) as g:
        seqs = g.walk_corpus(output="sequences", **kw).to_pandas()
    want = {
        (wid, walk): list(grp.sort_values("step").vertex)
        for (wid, walk), grp in long.groupby(["walker_id", "walk"])
    }
    got = {(r.walker_id, r.walk): list(r.seq) for r in seqs.itertuples()}
    assert got == want


def test_skipgram_pairs_bruteforce():
    import collections

    import pyarrow as pa
    import ray.data

    from cassovary_ray.textops import skipgram_pairs

    seqs = [[1, 2, 3, 1], [2, 2], [5], [4, 1, 2]]
    ds = ray.data.from_arrow(pa.table({
        "walker_id": pa.array(range(len(seqs)), pa.int64()),
        "seq": pa.array(seqs, pa.list_(pa.int64())),
    })).repartition(2)
    for window in (1, 2, 3):
        want = collections.Counter()
        for s in seqs:
            for i, a in enumerate(s):
                for d in range(1, window + 1):
                    if i + d < len(s):
                        want[(a, s[i + d])] += 1
                        want[(s[i + d], a)] += 1
        df = skipgram_pairs(ds, window=window).to_pandas()
        got = {(r.center, r.context): r.n for r in df.itertuples()}
        assert got == dict(want), window


# ---------------------------------------------------------------------------
# DuckDB oracle parity: the counter RNG is a pure function of
# (seed, walker, step), so the SQL builders replay the literal same walks
# (the sf0.01 gate re-checks end-to-end; these pin toy multigraphs with
# dangling vertices, multi-edges and self-loops).
# ---------------------------------------------------------------------------

_ORACLE_ADJ = {0: [1, 1, 2], 1: [3, 0], 2: [3, 0], 3: [0, 5], 4: [0], 6: [6]}


def _edges_cte(adj):
    return " UNION ALL ".join(f"SELECT {u} AS src, {v} AS dst"
                              for u, nb in adj.items() for v in nb)


def test_walk_visits_matches_duckdb(tmp_dir):
    import duckdb

    from cassovary_ray.oracles import walk_visits_sql

    starts = [0] * 5 + [4, 6, 9]  # 9 not in the graph -> dropped
    got = run_walk(_ORACLE_ADJ, tmp_dir, starts, 12,
                   num_parts=3, reset_prob=0.2, seed=11)
    sql = walk_visits_sql(_edges_cte(_ORACLE_ADJ), starts, 12,
                          reset_prob=0.2, seed=11)
    want = {int(v): int(c) for v, c in duckdb.sql(sql).fetchall()}
    assert got == want


def test_walk_corpus_matches_duckdb(tmp_dir):
    import duckdb

    from cassovary_ray.oracles import walk_corpus_sql

    df = _corpus(_ORACLE_ADJ, tmp_dir, 3, walks_per_vertex=2,
                 walk_length=8, seed=17)
    got = set(map(tuple, df[["walker_id", "walk", "step", "vertex"]]
                  .astype(int).values))
    sql = walk_corpus_sql(_edges_cte(_ORACLE_ADJ), 2, 8, seed=17)
    want = set((int(a), int(b), int(c), int(d))
               for a, b, c, d in duckdb.sql(sql).fetchall())
    assert got == want


def test_skipgram_matches_duckdb(tmp_dir):
    import duckdb

    from cassovary_ray import textops
    from cassovary_ray.oracles import skipgram_sql

    lay = os.path.join(tmp_dir, "sgo")
    build_toy_layout(_ORACLE_ADJ, lay, 3)
    with ShardedGraph(lay) as g:
        seqs = g.walk_corpus(walks_per_vertex=2, walk_length=8, seed=17,
                             output="sequences")
        df = textops.skipgram_pairs(seqs, window=2).to_pandas()
    got = {(int(a), int(b)): int(n)
           for a, b, n in df[["center", "context", "n"]].values}
    sql = skipgram_sql(_edges_cte(_ORACLE_ADJ), 2, 8, seed=17, window=2)
    want = {(int(a), int(b)): int(n) for a, b, n in duckdb.sql(sql).fetchall()}
    assert got == want
