"""Property tests (hypothesis) for the sort + segment-fold operators.

The fold discipline's correctness burden is the block-boundary bookkeeping:
interior key segments fold vectorized, edge keys divert to a tiny merge.
Hypothesis drives randomized key/timestamp layouts — including single-key
datasets, all-distinct keys, duplicate sort keys, and exact gap==threshold
ties — through several parallelism levels and compares against pure-pandas
brute force. Complements the fixed fixtures in test_round2_ops.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cassovary_ray import events as events_ops
from cassovary_ray.analytics import topk_per_key

GAP_MIN = 30
GAP_US = GAP_MIN * 60_000_000

# (n_users, events_per_user bounds, gap choices) — gap choices straddle the
# threshold on purpose: == stays in-session, +1 splits
_events = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=5),          # user id
        st.sampled_from([1_000_000, GAP_US, GAP_US + 1, 3 * GAP_US]),
        st.integers(min_value=0, max_value=4999),       # value centi-units
    ),
    min_size=1,
    max_size=60,
)


def _sessions_bruteforce(df: pd.DataFrame) -> pd.DataFrame:
    out = []
    for user, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        start, prev, cur = None, None, []
        for _, r in g.iterrows():
            if prev is not None and r.ts - prev > GAP_US:
                out.append((user, start, len(cur), sum(cur)))
                start, cur = None, []
            if start is None:
                start = int(r.ts)
            cur.append(int(np.floor(r.value * 1000.0)))
            prev = int(r.ts)
        out.append((user, start, len(cur), sum(cur)))
    return (pd.DataFrame(out, columns=["user_id", "session_start_us",
                                       "n_events", "value_milli"])
            .sort_values(["user_id", "session_start_us"])
            .reset_index(drop=True))


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_events)
def test_sessionize_matches_bruteforce(raw):
    rows = []
    t = {u: 10**8 * u for u, _, _ in raw}
    for i, (u, step, cval) in enumerate(raw):
        t[u] += step
        rows.append((i, u, t[u], cval / 100.0))
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "value"])
    want = _sessions_bruteforce(df)
    tbl = pa.table({
        "event_id": pa.array(df.event_id, pa.int64()),
        "user_id": pa.array(df.user_id, pa.int64()),
        "ts": pa.array(df.ts, pa.int64()).cast(pa.timestamp("us")),
        "value": pa.array(df.value, pa.float64()),
    })
    for p in (1, 3):
        got = (events_ops.sessionize(
            ray.data.from_arrow(tbl).repartition(p), gap_minutes=GAP_MIN)
            .to_pandas()
            .sort_values(["user_id", "session_start_us"])
            .reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got[want.columns].astype("int64"), want.astype("int64"))


_frames = st.lists(
    st.tuples(st.integers(min_value=0, max_value=6),    # key
              st.integers(min_value=-50, max_value=50)),  # score
    min_size=1,
    max_size=50,
)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_frames, st.integers(min_value=1, max_value=4))
def test_topk_per_key_matches_pandas(rows, k):
    df = pd.DataFrame(rows, columns=["key", "score"])
    df["uid"] = np.arange(len(df), dtype=np.int64)  # total-order tie-break
    want = (df.sort_values(["key", "score", "uid"],
                           ascending=[True, False, True])
            .groupby("key").head(k)
            .sort_values(["key", "score", "uid"],
                         ascending=[True, False, True])
            .reset_index(drop=True))
    tbl = pa.table({c: pa.array(df[c], pa.int64()) for c in df.columns})
    for p in (1, 3):
        got = (topk_per_key(ray.data.from_arrow(tbl).repartition(p),
                            "key", ["score", "uid"], [True, False], k)
               .to_pandas()
               .sort_values(["key", "score", "uid"],
                            ascending=[True, False, True])
               .reset_index(drop=True))
        assert list(got["rank"]) == [
            r + 1 for key in want["key"].unique()
            for r in range(int((want["key"] == key).sum()))]
        pd.testing.assert_frame_equal(
            got[["key", "score", "uid"]].astype("int64"),
            want[["key", "score", "uid"]].astype("int64"))
