"""As-of join and range join over the events stream (`events.asof_latest`,
`events.range_join_counts`) — hand fixtures plus a randomized brute-force
parity check mirroring DuckDB ASOF LEFT JOIN semantics."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from cassovary_ray import events as events_ops

US = 1_000_000
MIN_US = 60 * US


def _events_ds(rows):
    """rows: list of (event_id, ts_us, user_id, event_type)."""
    eid, ts, uid, et = zip(*rows)
    return ray.data.from_arrow(pa.table({
        "event_id": pa.array(eid, pa.int64()),
        "ts": pa.array(list(ts), pa.timestamp("us")),
        "user_id": pa.array(uid, pa.int64()),
        "event_type": pa.array(et, pa.string()),
        "value": pa.array([0.0] * len(rows), pa.float64()),
        "props": pa.array([""] * len(rows), pa.string()),
    }))


def test_asof_hand_fixture():
    # user 1: clicks at t=10,30,60; purchases at t=5 (no prior), 30 (tie ->
    # non-strict match), 50 (-> click@30), 100 (-> click@60)
    # user 2: purchase with no clicks at all
    rows = [
        (1, 10 * MIN_US, 1, "click"),
        (2, 30 * MIN_US, 1, "click"),
        (3, 60 * MIN_US, 1, "click"),
        (4, 5 * MIN_US, 1, "purchase"),
        (5, 30 * MIN_US + 1, 1, "purchase"),
        (6, 50 * MIN_US, 1, "purchase"),
        (7, 100 * MIN_US, 1, "purchase"),
        (8, 10 * MIN_US, 2, "purchase"),
        (9, 10 * MIN_US, 3, "view"),  # other types ignored
    ]
    got = (events_ops.asof_latest(_events_ds(rows))
           .to_pandas().set_index("event_id").sort_index())
    assert list(got.index) == [4, 5, 6, 7, 8]
    assert list(got["prior_event_id"]) == [-1, 2, 2, 3, -1]
    assert list(got["gap_us"]) == [-1, 1, 20 * MIN_US, 40 * MIN_US, -1]
    assert list(got["ts_us"]) == [r[1] for r in rows if r[0] in (4, 5, 6, 7, 8)]


def test_asof_nonstrict_tie():
    # click and purchase at the exact same ts: non-strict (<=) matches it
    rows = [
        (1, 7 * MIN_US, 5, "click"),
        (2, 7 * MIN_US, 5, "purchase"),
    ]
    got = events_ops.asof_latest(_events_ds(rows)).to_pandas()
    assert list(got["prior_event_id"]) == [1] and list(got["gap_us"]) == [0]


def test_range_join_hand_fixture():
    # 60-min trailing window, half-open (p-60min, p]
    rows = [
        (1, 0 * MIN_US, 1, "click"),
        (2, 30 * MIN_US, 1, "click"),
        (3, 60 * MIN_US, 1, "purchase"),   # click@0 excluded (>), click@30 in
        (4, 90 * MIN_US, 1, "purchase"),   # click@30 exactly at boundary: out
        (5, 30 * MIN_US, 2, "purchase"),   # no clicks for user 2
        (6, 30 * MIN_US, 1, "purchase"),   # clicks@0,30 both in (0 is > -30)
    ]
    got = (events_ops.range_join_counts(_events_ds(rows), window_minutes=60)
           .to_pandas().set_index("event_id").sort_index())
    assert got.loc[3, "n_in_window"] == 1
    assert got.loc[4, "n_in_window"] == 0
    assert got.loc[5, "n_in_window"] == 0
    assert got.loc[6, "n_in_window"] == 2


def _brute(df: pd.DataFrame, win_us: int):
    """Brute-force asof + range join per purchase row."""
    out = []
    for _, p in df[df.event_type == "purchase"].iterrows():
        c = df[(df.event_type == "click") & (df.user_id == p.user_id)]
        prior = c[c.ts_us <= p.ts_us].sort_values("ts_us").tail(1)
        n_win = int(((c.ts_us > p.ts_us - win_us) & (c.ts_us <= p.ts_us)).sum())
        out.append((
            int(p.event_id),
            int(prior.event_id.iloc[0]) if len(prior) else -1,
            int(p.ts_us - prior.ts_us.iloc[0]) if len(prior) else -1,
            n_win,
        ))
    return pd.DataFrame(out, columns=["event_id", "prior_event_id",
                                      "gap_us", "n_win"]).set_index("event_id")


def test_asof_and_range_brute_parity():
    rng = np.random.default_rng(7)
    n = 400
    # distinct ts per user guaranteed by unique global ts draw
    ts = rng.choice(10_000, size=n, replace=False).astype(np.int64) * US
    df = pd.DataFrame({
        "event_id": np.arange(1, n + 1, dtype=np.int64),
        "ts_us": ts,
        "user_id": rng.integers(1, 12, n).astype(np.int64),
        "event_type": rng.choice(["click", "purchase", "view"], n),
    })
    rows = [(int(r.event_id), int(r.ts_us), int(r.user_id), r.event_type)
            for r in df.itertuples()]
    want = _brute(df, 45 * MIN_US)
    ds = _events_ds(rows)
    got_asof = (events_ops.asof_latest(ds)
                .to_pandas().set_index("event_id").sort_index())
    got_rj = (events_ops.range_join_counts(ds, window_minutes=45)
              .to_pandas().set_index("event_id").sort_index())
    assert list(got_asof.index) == list(want.sort_index().index)
    pd.testing.assert_series_equal(
        got_asof["prior_event_id"], want.sort_index()["prior_event_id"],
        check_names=False)
    pd.testing.assert_series_equal(
        got_asof["gap_us"], want.sort_index()["gap_us"], check_names=False)
    pd.testing.assert_series_equal(
        got_rj["n_in_window"], want.sort_index()["n_win"], check_names=False)
