"""token_frequencies (vocab build) and sliding_window_counts."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from cassovary_ray import events as events_ops, textops


def test_token_frequencies():
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["a b a", "b c", "a"], pa.string()),
    }))
    got = textops.token_frequencies(docs).to_pandas().set_index("token")["n"]
    assert got.to_dict() == {"a": 3, "b": 2, "c": 1}
    kept = textops.token_frequencies(docs, min_count=2).to_pandas()
    assert set(kept["token"]) == {"a", "b"}


def test_sliding_windows_expand_and_sum():
    # events at t=0min and t=20min, 60-min windows stepping 15 min.
    # t=0 → window starts {0, -15, -30, -45}min → only 0 kept (>= 0)
    # t=20 → base window 15min → starts {15, 0, -15, -30}min → {15, 0}
    us = 60_000_000
    ev = ray.data.from_arrow(pa.table({
        "event_id": pa.array([1, 2], pa.int64()),
        "ts": pa.array([0, 20 * us], pa.timestamp("us")),
        "user_id": pa.array([1, 1], pa.int64()),
        "event_type": pa.array(["x", "x"], pa.string()),
        "value": pa.array([1.5, 2.25], pa.float64()),
    }))
    got = (events_ops.sliding_window_counts(ev, 60, 15).to_pandas()
           .set_index("window_start_us").sort_index())
    assert got.index.tolist() == [0, 15 * us]
    # window 0 contains both events; window 15min only the second
    assert got.loc[0, "n_events"] == 2
    assert got.loc[0, "value_milli"] == 1500 + 2250
    assert got.loc[15 * us, "n_events"] == 1
    assert got.loc[15 * us, "value_milli"] == 2250


def test_sliding_windows_validation():
    ev = ray.data.from_arrow(pa.table({
        "ts": pa.array([0], pa.timestamp("us")),
        "value": pa.array([1.0], pa.float64()),
    }))
    with pytest.raises(ValueError):
        events_ops.sliding_window_counts(ev, 60, 25)


def test_sliding_unique_users_fixture():
    import datetime

    import pyarrow as pa

    from cassovary_ray.events import sliding_unique_users

    epoch = datetime.datetime(2024, 1, 1)
    # user 1 twice in the same 15-min step (counted once), user 2 an hour on
    rows = [(1, 0), (1, 5), (2, 70)]
    ev = ray.data.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([epoch + datetime.timedelta(minutes=r[1])
                        for r in rows], pa.timestamp("us")),
    }))
    df = sliding_unique_users(ev, 60, 15).to_pandas()
    got = dict(zip((df.window_start_us // 900_000_000).astype(int), df.n_users))
    base = int(epoch.timestamp() * 1_000_000) // 900_000_000
    # user1 (min 0-5) covers window starts base-3..base; user2 (min 70)
    # covers base+1..base+4 — all windows here hold exactly one distinct user
    assert got == {base + o: 1 for o in range(-3, 5)}
