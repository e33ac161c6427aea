"""Incremental layout maintenance (layout.update_edge_layout): an updated
layout must equal a fresh build over the updated edge set (edges exactly;
vertices monotone-superset with identical endpoint coverage)."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from cassovary_ray.layout import (
    build_edge_layout,
    read_layout_manifest,
    update_edge_layout,
)


def _ds(pairs):
    s, d = zip(*pairs) if pairs else ((), ())
    return ray.data.from_arrow(pa.table({
        "src": pa.array(list(s), pa.int64()),
        "dst": pa.array(list(d), pa.int64()),
    }))


def _edges_of(layout_dir):
    t = ray.data.read_parquet(os.path.join(layout_dir, "edges")).to_pandas()
    return sorted(zip(t["src"].astype(int), t["dst"].astype(int)))


def _verts_of(layout_dir):
    t = ray.data.read_parquet(os.path.join(layout_dir, "vertices")).to_pandas()
    return set(t["vertex"].astype(int))


@pytest.mark.parametrize("flags", [
    {}, {"undirected": True, "dedup": True, "drop_self_loops": True}])
def test_update_matches_fresh_build(tmp_path, flags):
    rng = np.random.default_rng(31)
    e1 = sorted({(int(a), int(b)) for a, b in rng.integers(0, 50, (150, 2))})
    removed = e1[::7]
    if flags.get("undirected"):
        # undirected removal = "delete the undirected edge entirely": only
        # well-defined when no reverse directed counterpart survives
        removed = [(a, b) for a, b in removed if (b, a) not in set(e1)]
    added = [(a + 100, b + 100) for a, b in e1[::11]] + [(1, 2), (3, 3)]
    e2 = sorted((set(e1) - set(removed)) | set(added))

    upd = str(tmp_path / "upd")
    build_edge_layout(_ds(e1), upd, 4, **flags)
    update_edge_layout(upd, added_edges=_ds(added), removed_edges=_ds(removed),
                       removals_pre_resolved=flags.get("undirected", False))

    fresh = str(tmp_path / "fresh")
    build_edge_layout(_ds(e2), fresh, 4, **flags)

    assert _edges_of(upd) == _edges_of(fresh)
    # vertices: superset of the fresh universe (monotone), covering e2
    assert _verts_of(upd) >= _verts_of(fresh)
    man = read_layout_manifest(upd)
    assert man["n_edges"] == len(_edges_of(fresh))


def test_update_engine_results_match(tmp_path):
    from cassovary_ray.engine import ShardedGraph

    rng = np.random.default_rng(41)
    e1 = sorted({(int(a), int(b)) for a, b in rng.integers(0, 40, (120, 2))
                 if a != b})
    removed = e1[::5]
    # re-add some endpoints so no vertex is orphaned (universes then agree)
    touched = sorted({v for ab in removed for v in ab})
    added = [(touched[i], touched[(i + 1) % len(touched)])
             for i in range(len(touched))]
    # exclude pairs already present: a non-dedup layout is a multiset, so
    # re-adding an existing row would duplicate it (as a fresh build from a
    # list with duplicates would)
    added = [(a, b) for a, b in added if a != b and (a, b) not in set(e1)]
    e2 = sorted((set(e1) - set(removed)) | set(added))

    upd = str(tmp_path / "upd")
    build_edge_layout(_ds(e1), upd, 3)
    update_edge_layout(upd, added_edges=_ds(added), removed_edges=_ds(removed))
    fresh = str(tmp_path / "fresh")
    build_edge_layout(_ds(e2), fresh, 3)

    if _verts_of(upd) == _verts_of(fresh):
        with ShardedGraph(upd) as g:
            r_upd = g.pagerank(max_iterations=10).to_pandas()
        with ShardedGraph(fresh) as g:
            r_fresh = g.pagerank(max_iterations=10).to_pandas()
        a = dict(zip(r_upd.vertex, r_upd["rank"]))
        b = dict(zip(r_fresh.vertex, r_fresh["rank"]))
        assert a.keys() == b.keys()
        assert all(abs(a[k] - b[k]) < 1e-12 for k in a)
    else:
        # monotone universe: extra empty nodes allowed, never missing ones
        assert _verts_of(upd) >= _verts_of(fresh)


def test_update_noop_and_weighted_guard(tmp_path):
    lay = str(tmp_path / "l")
    build_edge_layout(_ds([(1, 2), (2, 3)]), lay, 2)
    man0 = read_layout_manifest(lay)
    man1 = update_edge_layout(lay)
    assert man1 == man0
    assert _edges_of(lay) == [(1, 2), (2, 3)]

    wl = str(tmp_path / "w")
    wds = ray.data.from_arrow(pa.table({
        "src": pa.array([1], pa.int64()), "dst": pa.array([2], pa.int64()),
        "weight": pa.array([1.0], pa.float64())}))
    build_edge_layout(wds, wl, 2, weighted=True)
    with pytest.raises(ValueError):
        update_edge_layout(wl, added_edges=_ds([(5, 6)]))


def test_update_undirected_removal_guard(tmp_path):
    lay = str(tmp_path / "g")
    build_edge_layout(_ds([(1, 2), (2, 1), (2, 3)]), lay, 2,
                      undirected=True, dedup=True)
    with pytest.raises(ValueError):
        update_edge_layout(lay, removed_edges=_ds([(1, 2)]))


def test_incremental_recrawl_end_to_end(tmp_path):
    """Change one page's links, add a page, drop a page: the incrementally
    maintained layout's edges equal a fresh build from the new crawl."""
    import pyarrow.parquet as pq

    from cassovary_ray.corpus import TOY_GRAPHS, pages_table_for_graph
    from cassovary_ray.extract import (
        incremental_recrawl,
        pages_to_edges,
    )

    adj_old = dict(TOY_GRAPHS["g6"])
    old_tbl = pages_table_for_graph(adj_old)

    adj_new = dict(adj_old)
    adj_new[10] = [15]          # changed page: links rewritten
    adj_new[99] = [10, 11]      # added page
    del adj_new[13]             # removed page (its out-links vanish)
    new_tbl = pages_table_for_graph(adj_new)

    old_pages = ray.data.from_arrow(old_tbl)
    new_pages = ray.data.from_arrow(new_tbl)

    lay = str(tmp_path / "lay")
    build_edge_layout(pages_to_edges(old_pages), lay, 3)
    incremental_recrawl(lay, old_pages, new_pages)

    fresh = str(tmp_path / "fresh")
    build_edge_layout(pages_to_edges(new_pages), fresh, 3)
    assert _edges_of(lay) == _edges_of(fresh)
    assert _verts_of(lay) >= _verts_of(fresh)


def test_random_node_parts_deterministic_and_balanced():
    # RandomNodeMapper analogue (Partitioner.scala:36-38): deterministic
    # pure function of (seed, id), roughly balanced, covers all parts
    import numpy as np

    from cassovary_ray.layout import assign_random_parts, random_node_parts

    ids = np.arange(10_000, dtype=np.int64)
    p1 = random_node_parts(ids, 8, seed=3)
    p2 = random_node_parts(ids, 8, seed=3)
    assert (p1 == p2).all()
    assert set(np.unique(p1)) == set(range(8))
    counts = np.bincount(p1, minlength=8)
    assert counts.min() > 10_000 / 8 * 0.8
    assert (random_node_parts(ids, 8, seed=4) != p1).any()
    ds = ray.data.from_arrow(pa.table({"vertex": pa.array(ids, pa.int64())}))
    out = assign_random_parts(ds, 8, seed=3).to_pandas()
    assert (out["part"].to_numpy() == p1).all()


def test_pagerank_warm_start_after_delta(tmp_path):
    """Incremental-recrawl rank refresh: converge on graph A with a
    checkpoint, delta-update the layout, warm-start from A's checkpoint —
    same fixpoint as a cold run on the updated graph, in fewer rounds."""
    from cassovary_ray.engine import ShardedGraph

    rng = np.random.default_rng(7)
    e1 = sorted({(int(a), int(b)) for a, b in rng.integers(0, 80, (400, 2))
                 if a != b})
    lay = str(tmp_path / "lay")
    ck = str(tmp_path / "ck")
    build_edge_layout(_ds(e1), lay, 4)
    with ShardedGraph(lay) as g:
        g.pagerank(max_iterations=None, tolerance=1e-10, checkpoint_dir=ck)

    # small delta: ~3% edges removed, a few added (incl. one new vertex)
    removed = e1[::31]
    added = [(90, 1), (2, 90), (5, 17)]
    update_edge_layout(lay, added_edges=_ds(added), removed_edges=_ds(removed))

    with ShardedGraph(lay) as g:
        warm = g.pagerank(max_iterations=None, tolerance=1e-10,
                          warm_start_dir=ck).to_pandas()
        warm_iters = len([m for m in g.metrics if m.extra.get("algo") == "pagerank"])
    with ShardedGraph(lay) as g:
        cold = g.pagerank(max_iterations=None, tolerance=1e-10).to_pandas()
        cold_iters = len([m for m in g.metrics if m.extra.get("algo") == "pagerank"])

    w = warm.set_index("vertex")["rank"].sort_index()
    c = cold.set_index("vertex")["rank"].sort_index()
    assert list(w.index) == list(c.index)
    np.testing.assert_allclose(w.to_numpy(), c.to_numpy(), atol=1e-9)
    assert abs(w.sum() - 1.0) < 1e-8
    assert warm_iters < cold_iters  # the seed actually pays


def test_pagerank_warm_start_part_mismatch_raises(tmp_path):
    from cassovary_ray.engine import ShardedGraph

    e = [(0, 1), (1, 2), (2, 0), (3, 1), (4, 3), (5, 4), (6, 5)]
    lay4 = str(tmp_path / "l4")
    lay2 = str(tmp_path / "l2")
    ck = str(tmp_path / "ck4")
    build_edge_layout(_ds(e), lay4, 4)
    build_edge_layout(_ds(e), lay2, 2)
    with ShardedGraph(lay4) as g:
        g.pagerank(max_iterations=5, checkpoint_dir=ck)
    with ShardedGraph(lay2) as g:
        with pytest.raises(ValueError, match="vertex % P"):
            g.pagerank(max_iterations=5, warm_start_dir=ck)


def test_pagerank_warm_start_smaller_parts_raises(tmp_path):
    """A checkpoint from FEWER parts passed the old subset check but seeded
    only coinciding vertices (ADVICE r3) — must now be rejected."""
    from cassovary_ray.engine import ShardedGraph

    e = [(0, 1), (1, 2), (2, 0), (3, 1), (4, 3), (5, 4), (6, 5)]
    lay2 = str(tmp_path / "l2")
    lay4 = str(tmp_path / "l4")
    ck = str(tmp_path / "ck2")
    build_edge_layout(_ds(e), lay2, 2)
    build_edge_layout(_ds(e), lay4, 4)
    with ShardedGraph(lay2) as g:
        g.pagerank(max_iterations=5, checkpoint_dir=ck)
    with ShardedGraph(lay4) as g:
        with pytest.raises(ValueError, match="num_parts=2"):
            g.pagerank(max_iterations=5, warm_start_dir=ck)


def test_pagerank_warm_start_wrong_column_raises(tmp_path):
    """Pointing warm_start_dir at e.g. a WCC checkpoint must fail with a
    descriptive error, not a KeyError inside a Ray actor (ADVICE r3)."""
    from cassovary_ray.engine import ShardedGraph

    e = [(0, 1), (1, 2), (2, 0), (3, 1)]
    lay = str(tmp_path / "lu")
    ck = str(tmp_path / "ck_wcc")
    build_edge_layout(_ds(e), lay, 2, undirected=True, dedup=True)
    with ShardedGraph(lay) as g:
        g.weakly_connected_components(checkpoint_dir=ck, checkpoint_every=1)
    with ShardedGraph(lay) as g:
        with pytest.raises(ValueError, match="not a PageRank"):
            g.pagerank(max_iterations=5, warm_start_dir=ck)
