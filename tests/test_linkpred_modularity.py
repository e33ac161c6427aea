"""adamic_adar_top_k + modularity — brute-force oracles on random and
hand-built graphs."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np
import pyarrow as pa
import ray.data

from cassovary_ray import analytics


def _edges_ds(E):
    return ray.data.from_arrow(pa.table({
        "src": pa.array([e[0] for e in E], pa.int64()),
        "dst": pa.array([e[1] for e in E], pa.int64()),
    }))


def _random_edges(n_nodes=25, n_edges=120, seed=7):
    rng = np.random.default_rng(seed)
    E = set()
    while len(E) < n_edges:
        a, b = rng.integers(0, n_nodes, 2)
        if a != b:
            E.add((int(a), int(b)))
    return sorted(E)


def _aa_bruteforce(E, k):
    outn, ind = defaultdict(set), defaultdict(int)
    for s, d in E:
        outn[s].add(d)
        ind[d] += 1
    want = {}
    for u in sorted(outn):
        cands = []
        for w in sorted(outn):
            if u == w:
                continue
            zs = outn[u] & outn[w]
            if zs:
                sc = sum(1.0 / math.log(ind[z]) for z in zs)
                cands.append((int(np.floor(sc * 1e6)), w))
        cands.sort(key=lambda t: (-t[0], t[1]))
        for r, (sq, w) in enumerate(cands[:k], 1):
            want[(u, w)] = (sq, r)
    return want


def test_adamic_adar_matches_bruteforce():
    E = _random_edges()
    got = {(r["u"], r["w"]): (r["score_micro"], r["rank"])
           for r in analytics.adamic_adar_top_k(_edges_ds(E), k=5).take_all()}
    assert got == _aa_bruteforce(E, 5)


def test_adamic_adar_hub_prune_bounds_pairs():
    # hub vertex 99 pointed at by everyone; with max_in_deg it contributes
    # nothing, so the only surviving pairs share the low-degree dst 50.
    E = [(i, 99) for i in range(20)] + [(0, 50), (1, 50)]
    got = analytics.adamic_adar_top_k(_edges_ds(E), k=5, max_in_deg=10).take_all()
    pairs = {(r["u"], r["w"]) for r in got}
    assert pairs == {(0, 1), (1, 0)}
    # exact weight: 1/ln(2) for the single shared dst
    sq = int(np.floor(1.0 / math.log(2) * 1e6))
    assert all(r["score_micro"] == sq and r["rank"] == 1 for r in got)


def test_modularity_hand_graph():
    # two 3-cycles (communities 0 and 1) + one cross edge
    E = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (0, 3)]
    comm = ray.data.from_arrow(pa.table({
        "vertex": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
        "community": pa.array([0, 0, 0, 1, 1, 1], pa.int64()),
    }))
    m, intra = 7, 6
    kout = {0: 4, 1: 3}
    kin = {0: 3, 1: 4}
    s = kout[0] * kin[0] + kout[1] * kin[1]
    q = intra / m - s / (m * m)
    row = analytics.modularity(_edges_ds(E), comm).take_all()[0]
    assert (row["m"], row["intra"], row["q_nano"]) == (m, intra, int(np.floor(q * 1e9)))


def test_modularity_random_vs_bruteforce():
    E = _random_edges(n_nodes=30, n_edges=150, seed=11)
    comm = ray.data.from_arrow(pa.table({
        "vertex": pa.array(list(range(30)), pa.int64()),
        "community": pa.array([v % 3 for v in range(30)], pa.int64()),
    }))
    m = len(E)
    intra = sum(1 for s, d in E if s % 3 == d % 3)
    kout, kin = defaultdict(int), defaultdict(int)
    for s, d in E:
        kout[s % 3] += 1
        kin[d % 3] += 1
    S = sum(kout[c] * kin[c] for c in set(kout) & set(kin))
    q = intra / m - S / (m * m)
    row = analytics.modularity(_edges_ds(E), comm).take_all()[0]
    assert (row["m"], row["intra"], row["q_nano"]) == (m, intra, int(np.floor(q * 1e9)))


def test_modularity_empty_edges():
    comm = ray.data.from_arrow(pa.table({
        "vertex": pa.array([0], pa.int64()),
        "community": pa.array([0], pa.int64()),
    }))
    empty = ray.data.from_arrow(pa.table({
        "src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64()),
    }))
    row = analytics.modularity(empty, comm).take_all()[0]
    assert (row["m"], row["intra"], row["q_nano"]) == (0, 0, 0)


def test_similarity_guard_matches_mirrored_sql_when_firing():
    """The registered queries mirror SIM_MAX_IN_DEG into their oracles
    (VERDICT r3 #4). Verify engine and mirrored SQL agree on a graph where
    the guard actually drops a hub (hash-equivalence of the guard itself,
    not just at sf0.01 where nothing is hot)."""
    import duckdb

    # hub 99 has in-degree 20 (> guard 5); normal dst 50 shared by 3 spokes
    E = [(i, 99) for i in range(20)] + [(0, 50), (1, 50), (2, 50), (3, 51)]
    guard = 5
    got = (analytics.similarity_top_k(_edges_ds(E), k=3, metric="jaccard",
                                      max_in_deg=guard)
           .to_pandas().sort_values(["u", "rank"]).reset_index(drop=True))
    con = duckdb.connect()
    con.execute("CREATE TABLE e (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?)", E)
    want = con.execute(f"""
        WITH deg AS (SELECT src AS vtx, count(*) AS deg FROM e GROUP BY 1),
        okd AS (SELECT dst FROM e GROUP BY 1 HAVING count(*) <= {guard}),
        ef AS (SELECT e.src, e.dst FROM e JOIN okd USING (dst)),
        co AS (SELECT a.src AS u, b.src AS w, count(*) AS common
               FROM ef a JOIN ef b ON a.dst = b.dst AND a.src <> b.src
               GROUP BY 1, 2),
        scored AS (SELECT co.u, co.w,
                          CAST(common AS DOUBLE) / (du.deg + dw.deg - common)
                              AS score
                   FROM co JOIN deg du ON du.vtx = co.u
                           JOIN deg dw ON dw.vtx = co.w),
        ranked AS (SELECT u, w, score,
                          row_number() OVER (PARTITION BY u
                              ORDER BY score DESC, w ASC) AS rank
                   FROM scored)
        SELECT u, w, score, rank FROM ranked WHERE rank <= 3
        ORDER BY u, rank
    """).df()
    assert len(got) == len(want) > 0
    assert got.u.tolist() == want.u.tolist()
    assert got.w.tolist() == want.w.tolist()
    assert got["rank"].tolist() == want["rank"].tolist()
    np.testing.assert_allclose(got.score.to_numpy(), want.score.to_numpy())
    # the guard fired: no pair owes its row to hub 99 alone
    assert set(got.u) == {0, 1, 2}
