"""Harmonic centrality, degree assortativity, tf-idf top-k — brute-force
oracles on small fixtures (round-2 additions; Cassovary's centrality surface
stops at degree/closeness, AbstractCentrality.scala:24-46 is the contract
these extend)."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from cassovary_ray import analytics, textops
from cassovary_ray.corpus import TOY_GRAPHS

from tests.util import edges_ds_for_graph


def _brute_distances(adj, source):
    """BFS depths over out-edges from source (dict vertex -> depth)."""
    depth = {source: 0}
    frontier = [source]
    while frontier:
        nxt = []
        for u in frontier:
            for v in adj.get(u, []):
                if v not in depth:
                    depth[v] = depth[u] + 1
                    nxt.append(v)
        frontier = nxt
    return depth


def test_harmonic_path_graph():
    # 0 -> 1 -> 2 -> 3: harmonic(0) = 1 + 1/2 + 1/3
    adj = {0: [1], 1: [2], 2: [3], 3: []}
    got = (
        analytics.harmonic_centrality(edges_ds_for_graph(adj), sources=[0, 3])
        .to_pandas().set_index("vertex")["harmonic"].to_dict()
    )
    assert got[0] == pytest.approx(1 + 0.5 + 1 / 3, abs=1e-12)
    assert got[3] == 0.0  # sink: nothing reachable


def test_harmonic_matches_bruteforce_g6():
    adj = TOY_GRAPHS["g6"]
    sources = sorted(adj)
    got = (
        analytics.harmonic_centrality(edges_ds_for_graph(adj), sources=sources)
        .to_pandas().set_index("vertex")["harmonic"].to_dict()
    )
    for s in sources:
        depths = _brute_distances(adj, s)
        want = sum(1.0 / d for v, d in depths.items() if d > 0)
        assert got[s] == pytest.approx(want, abs=1e-9), s


def test_harmonic_max_depth_cut():
    adj = {0: [1], 1: [2], 2: [3], 3: []}
    got = (
        analytics.harmonic_centrality(
            edges_ds_for_graph(adj), sources=[0], max_depth=2)
        .to_pandas().set_index("vertex")["harmonic"].to_dict()
    )
    assert got[0] == pytest.approx(1 + 0.5, abs=1e-12)


def test_assortativity_matches_bruteforce():
    adj = TOY_GRAPHS["g6"]
    tbl = analytics.degree_assortativity(edges_ds_for_graph(adj)).to_pandas()
    assert len(tbl) == 1
    # brute force: Pearson r over edges of (outdeg(src), indeg(dst))
    edges = [(u, v) for u, nbrs in adj.items() for v in nbrs]
    od = Counter(u for u, _ in edges)
    idg = Counter(v for _, v in edges)
    x = np.array([od[u] for u, _ in edges], float)
    y = np.array([idg[v] for _, v in edges], float)
    want = float(np.corrcoef(x, y)[0, 1])
    assert tbl["assortativity"].iloc[0] == pytest.approx(want, abs=1e-9)
    assert int(tbl["n_edges"].iloc[0]) == len(edges)
    assert int(tbl["sxy"].iloc[0]) == int((x * y).sum())


def test_assortativity_degenerate_regular():
    # 2-cycle: every src outdeg 1, every dst indeg 1 — zero variance => 0.0
    adj = {0: [1], 1: [0]}
    tbl = analytics.degree_assortativity(edges_ds_for_graph(adj)).to_pandas()
    assert tbl["assortativity"].iloc[0] == 0.0


def _docs_ds(texts):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))


def _brute_tfidf(texts, k):
    import re

    n = len(texts)
    tf = {i: Counter(re.split(r"\s+", t.strip(" "))) for i, t in enumerate(texts)}
    df = Counter()
    for c in tf.values():
        df.update(set(c))
    rows = []
    for i, c in tf.items():
        scored = sorted(
            ((tok, cnt, df[tok], cnt * math.log(n / df[tok])) for tok, cnt in c.items()),
            key=lambda r: (-r[3], r[0]),
        )[:k]
        for rank, (tok, cnt, d, _s) in enumerate(scored, 1):
            rows.append((i, tok, cnt, d, rank))
    return sorted(rows)


def test_tfidf_top_k_bruteforce():
    texts = [
        "apple banana apple cherry",
        "banana cherry cherry date",
        "apple date date date elder",
        "fig fig fig fig",
        "apple banana cherry date elder fig",
    ]
    got = sorted(
        tuple(r) for r in textops.tfidf_top_k(_docs_ds(texts), k=3)
        .to_pandas()[["doc_id", "token", "tf", "df", "rank"]]
        .itertuples(index=False)
    )
    assert got == _brute_tfidf(texts, 3)


def test_tfidf_rank_bounded_and_total():
    texts = ["a b", "a b c d e f g h i j"]
    df = textops.tfidf_top_k(_docs_ds(texts), k=3).to_pandas()
    per_doc = df.groupby("doc_id")["rank"].agg(["min", "max", "count"])
    assert (per_doc["min"] == 1).all()
    assert (per_doc["max"] <= 3).all()
    # doc 0 has only 2 distinct tokens
    assert per_doc.loc[0, "count"] == 2


def _brute_brandes(adj, sources):
    """Pure-python Brandes over directed shortest paths (accumulation over
    all given sources; sources earn no credit on their own paths)."""
    from collections import defaultdict, deque

    bc = defaultdict(float)
    verts = set(adj) | {v for ns in adj.values() for v in ns}
    for s in sources:
        # forward BFS
        dist = {s: 0}
        sigma = defaultdict(int)
        sigma[s] = 1
        order = []
        q = deque([s])
        while q:
            u = q.popleft()
            order.append(u)
            for v in adj.get(u, []):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
                if dist[v] == dist[u] + 1:
                    sigma[v] += sigma[u]
        delta = defaultdict(float)
        for u in reversed(order):
            for v in adj.get(u, []):
                if dist.get(v) == dist[u] + 1:
                    delta[u] += sigma[u] / sigma[v] * (1 + delta[v])
            if u != s:
                bc[u] += delta[u]
    reached = set()
    for s in sources:
        dist = {s}
        frontier = [s]
        while frontier:
            nxt = []
            for u in frontier:
                for v in adj.get(u, []):
                    if v not in dist:
                        dist.add(v)
                        nxt.append(v)
            frontier = nxt
        reached |= dist
    return {v: bc.get(v, 0.0) for v in reached}


@pytest.mark.parametrize("name", ["g5", "g6"])
def test_betweenness_matches_bruteforce(name):
    adj = TOY_GRAPHS[name]
    sources = sorted(set(adj) | {v for ns in adj.values() for v in ns})
    got = (
        analytics.betweenness_centrality(edges_ds_for_graph(adj), sources)
        .to_pandas().set_index("vertex")["betweenness"].to_dict()
    )
    want = _brute_brandes(adj, sources)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), v


def test_betweenness_diamond_split_paths():
    # s -> a, s -> b, a -> t, b -> t: two shortest paths, each mid gets 1/2
    adj = {0: [1, 2], 1: [3], 2: [3], 3: []}
    got = (
        analytics.betweenness_centrality(edges_ds_for_graph(adj), [0])
        .to_pandas().set_index("vertex")["betweenness"].to_dict()
    )
    assert got[1] == pytest.approx(0.5)
    assert got[2] == pytest.approx(0.5)
    assert got[3] == pytest.approx(0.0)
    assert got[0] == pytest.approx(0.0)


def test_eccentricity_path_graph():
    adj = {0: [1], 1: [2], 2: [3], 3: []}
    got = (
        analytics.eccentricity(edges_ds_for_graph(adj), sources=[0, 2, 3])
        .to_pandas().set_index("vertex")
    )
    assert got.loc[0, "eccentricity"] == 3 and got.loc[0, "reachable"] == 4
    assert got.loc[2, "eccentricity"] == 1 and got.loc[2, "reachable"] == 2
    assert got.loc[3, "eccentricity"] == 0 and got.loc[3, "reachable"] == 1


def test_degree_quantiles_exact():
    # out-degrees: v0..v3 -> 1,1,2,4 (n=4): p50 -> need 2 -> deg 1;
    # p90 -> need 4 -> deg 4; p99 -> need 4 -> deg 4
    adj = {0: [9], 1: [9], 2: [8, 9], 3: [5, 6, 7, 8]}
    t = analytics.degree_quantiles(edges_ds_for_graph(adj)).to_pandas()
    got = dict(zip(t["q_pct"], t["degree"]))
    assert got == {50: 1, 90: 4, 99: 4}


def test_top_users_per_type():
    import pyarrow as pa

    ev = ray.data.from_arrow(pa.table({
        "event_type": pa.array(["a"] * 6 + ["b"] * 3, pa.string()),
        "user_id": pa.array([1, 1, 1, 2, 2, 3, 7, 7, 8], pa.int64()),
    }))
    from cassovary_ray import events as events_ops

    got = events_ops.top_users_per_type(ev, k=2).to_pandas()
    a = got[got.event_type == "a"].sort_values("rank")
    assert list(a["user_id"]) == [1, 2] and list(a["n_events"]) == [3, 2]
    b = got[got.event_type == "b"].sort_values("rank")
    assert list(b["user_id"]) == [7, 8]


def test_neighbor_value_aggregate():
    adj = {0: [1, 2], 1: [2], 2: []}
    vals = ray.data.from_arrow(pa.table({
        "vertex": pa.array([0, 1, 2], pa.int64()),
        "value": pa.array([10, 20, 30], pa.int64()),
    }))
    got = (
        analytics.neighbor_value_aggregate(edges_ds_for_graph(adj), vals)
        .to_pandas().set_index("vertex")
    )
    assert got.loc[0, "sum_val"] == 50 and got.loc[0, "n_neighbors"] == 2
    assert got.loc[0, "min_val"] == 20 and got.loc[0, "max_val"] == 30
    assert got.loc[1, "sum_val"] == 30
    assert 2 not in got.index  # no out-neighbors


def test_events_funnel_stages():
    import pandas as pd

    from cassovary_ray import events as events_ops

    # u1: view->click->purchase; u2: view->click, purchase BEFORE click;
    # u3: click only (never enters); u4: view & click same instant (tie
    # does not advance)
    rows = [
        (1, "view", 100), (1, "click", 200), (1, "purchase", 300),
        (2, "purchase", 50), (2, "view", 100), (2, "click", 200),
        (3, "click", 100),
        (4, "view", 100), (4, "click", 100),
    ]
    ev = ray.data.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows], pa.string()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
    }))
    got = events_ops.funnel(ev).to_pandas().set_index("user_id")
    assert got.loc[1, "stages"] == 3
    assert got.loc[2, "stages"] == 2  # purchase before click doesn't count
    assert 3 not in got.index
    assert got.loc[4, "stages"] == 1  # tie at same microsecond
    assert got.loc[1, "first_step_us"] == 100


def test_events_hourly_retention():
    from cassovary_ray import events as events_ops

    H = 3_600_000_000  # us per hour
    # u1 active hours {0,1,3}; u2 active {0}; u3 active {1,2}
    rows = [(1, 0), (1, 10), (1, H), (1, 3 * H),
            (2, 100), (3, H + 5), (3, 2 * H)]
    ev = ray.data.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
    })).repartition(3)
    got = (events_ops.hourly_retention(ev).to_pandas()
           .set_index("hour").sort_index())
    # hour0: active {1,2}, retained {1}; hour1: active {1,3}, retained {3};
    # hour2: active {3}, retained {}; hour3: active {1}, retained {}
    assert got.loc[0].tolist() == [2, 1]
    assert got.loc[1].tolist() == [2, 1]
    assert got.loc[2].tolist() == [1, 0]
    assert got.loc[3].tolist() == [1, 0]
    assert set(got.index) == {0, 1, 2, 3}


def test_sessionize_segment_fold_vs_bruteforce():
    """sessionize's sort+segment-fold must match a pure-pandas reference,
    including sessions that straddle block boundaries (hot user 5 has 60
    events so the range sort splits it across blocks at P=4) and exact
    gap==threshold ties (gap stays in-session), at several parallelisms."""
    import pandas as pd
    import pyarrow as pa

    from cassovary_ray import events as events_ops

    gap_min = 30
    gap_us = gap_min * 60_000_000
    rng = np.random.default_rng(7)
    rows = []
    eid = 0
    for user in range(1, 12):
        n = 60 if user == 5 else int(rng.integers(1, 9))
        t = int(rng.integers(0, 10**9))
        for _ in range(n):
            # mix sub-gap steps, the exact-gap tie, and super-gap splits
            t += int(rng.choice([1_000_000, gap_us, gap_us + 1,
                                 3 * gap_us, 120_000_000]))
            rows.append((eid, user, t, float(rng.integers(0, 5000)) / 100.0))
            eid += 1
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "value"])
    df = df.sample(frac=1.0, random_state=3).reset_index(drop=True)  # shuffle

    # brute force
    want = []
    for user, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        start = None
        prev = None
        cur = []
        for _, r in g.iterrows():
            if prev is not None and r.ts - prev > gap_us:
                want.append((user, start, len(cur), sum(cur)))
                start, cur = None, []
            if start is None:
                start = int(r.ts)
            cur.append(int(np.floor(r.value * 1000.0)))
            prev = int(r.ts)
        want.append((user, start, len(cur), sum(cur)))
    want_df = (pd.DataFrame(want, columns=["user_id", "session_start_us",
                                           "n_events", "value_milli"])
               .sort_values(["user_id", "session_start_us"])
               .reset_index(drop=True))

    tbl = pa.table({
        "event_id": pa.array(df.event_id, pa.int64()),
        "user_id": pa.array(df.user_id, pa.int64()),
        "ts": pa.array(df.ts, pa.int64()).cast(pa.timestamp("us")),
        "value": pa.array(df.value, pa.float64()),
    })
    for p in (1, 2, 4):
        ev = ray.data.from_arrow(tbl).repartition(p)
        got = (events_ops.sessionize(ev, gap_minutes=gap_min).to_pandas()
               .sort_values(["user_id", "session_start_us"])
               .reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got.astype("int64"), want_df.astype("int64"), check_like=True)
