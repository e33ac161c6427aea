"""NodeTouristSpec fixtures (NodeTouristSpec.scala) against the named
InfoKeeper/tourist API, plus the from_walk bridges over a real engine run."""

from __future__ import annotations

import os

import pytest

from cassovary_ray.tourist import (
    BoolInfoKeeper,
    IntInfoKeeper,
    PathsCounter,
    PrevNbrCounter,
    VisitsCounter,
)


def test_visits_counter_counts_properly():
    # NodeTouristSpec "count visits properly"
    v = VisitsCounter()
    v.visit_all([1, 2, 3, 1, 2, 3, 1, 4, 2])
    assert list(v.info_all_nodes().items()) == [(1, 3), (2, 3), (3, 2), (4, 1)]
    assert v.info_of_node(3) == 2
    assert v.info_of_node(99) is None


def test_paths_counter_two_home_nodes():
    # NodeTouristSpec "count paths properly with 2 home nodes"
    p = PathsCounter(10, [1, 2])
    p.visit_all([1, 2, 3, 4, 1, 2, 3, 4, 3, 1, 1, 4, 1, 3, 2, 3])
    assert list(p.info_of_node(1).items()) == [((1,), 5)]
    assert list(p.info_of_node(2).items()) == [((2,), 3)]
    assert list(p.info_of_node(3).items()) == [
        ((2, 3), 3), ((1, 3), 1), ((2, 3, 4, 3), 1)]
    assert list(p.info_of_node(4).items()) == [((2, 3, 4), 2), ((1, 4), 1)]


def test_paths_counter_num_top_truncates():
    p = PathsCounter(1, [1, 2])
    p.visit_all([1, 2, 3, 4, 1, 2, 3, 4, 3, 1, 1, 4, 1, 3, 2, 3])
    assert list(p.info_of_node(3).items()) == [((2, 3), 3)]


def test_prev_nbr_counter_stores_all():
    # NodeTouristSpec "store all previous neighbors"
    c = PrevNbrCounter(None, False)
    for nbr in (4, 2, 1, 3, 1, 4):
        c.record_previous_neighbor(5, nbr)
    assert list(c.info_of_node(5).items()) == [(1, 2), (4, 2), (2, 1), (3, 1)]


def test_prev_nbr_counter_top2():
    # NodeTouristSpec "store top 2 previous neighbors"
    c = PrevNbrCounter(2, False)
    for nbr in (4, 2, 1, 3, 1, 4):
        c.record_previous_neighbor(5, nbr)
    assert list(c.info_of_node(5).items()) == [(1, 2), (4, 2)]


def test_prev_nbr_counter_record_info_unsupported():
    with pytest.raises(NotImplementedError):
        PrevNbrCounter().record_info(1, {})
    with pytest.raises(NotImplementedError):
        PathsCounter().record_info(1, {})


def test_info_keeper_only_once_and_types():
    k = IntInfoKeeper(only_once=True)
    k.record_info(7, 1)
    k.record_info(7, 2)  # first write wins
    assert k.info_of_node(7) == 1
    k2 = IntInfoKeeper(only_once=False)
    k2.record_info(7, 1)
    k2.record_info(7, 2)
    assert k2.info_of_node(7) == 2
    with pytest.raises(TypeError):
        k.record_info(8, "x")
    b = BoolInfoKeeper(only_once=False)
    b.record_info(1, True)
    assert b.info_all_nodes() == {1: True}
    b.clear()
    assert b.info_all_nodes() == {}


def test_from_walk_bridges(tmp_dir):
    # fill keepers from a real distributed walk (engine → named API)
    from cassovary_ray.corpus import TOY_GRAPHS
    from cassovary_ray.engine import ShardedGraph

    from tests.util import build_toy_layout

    adj = TOY_GRAPHS["g6"]
    lay = os.path.join(tmp_dir, "layout")
    build_toy_layout(adj, lay, 2)
    with ShardedGraph(lay) as g:
        visits_ds = g.random_walks([10] * 8, 20, reset_prob=0.2, seed=3,
                                   track_prev=True, track_paths=True)
        vc = VisitsCounter.from_walk(visits_ds)
        pn = PrevNbrCounter.from_walk(g.walk_prev_neighbor_counts(), num_top=2)
        pp = PathsCounter.from_walk(g.walk_top_paths(top_k=2), num_top=2)
    info = vc.info_all_nodes()
    assert sum(info.values()) == 8 * 20  # num_steps visits per walker
    counts = list(info.values())
    assert counts == sorted(counts, reverse=True)  # VisitsComparator order
    # every visited (non-start-only) vertex's top prevs are bounded by 2
    for m in pn.info_all_nodes().values():
        assert 1 <= len(m) <= 2
    for m in pp.info_all_nodes().values():
        assert 1 <= len(m) <= 2
        for path in m:
            assert len(path) >= 1
