"""Stream-shaped operators over the ``events(event_id, ts, user_id,
event_type, value, props)`` table.

Ray Data is a batch engine (no watermarks); windows are expressed as integer
window keys (tumbling) or per-key sorted ``map_groups`` (sessionization) —
the ordering assumption is "events of one user fit one group and are sorted
by ts within it". Value sums are made exact (integer micro-units per row
before summing) so results hash-match a SQL oracle regardless of reduction
order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Count, Max, Min, Sum

from cassovary_ray import compat

# Ray 2.49 workarounds (see compat.py): empty-first-block hash-join schema
# broadcast, and Project skipping empty blocks (schema drift into joins).
# Installed here because this module issues Dataset.join calls.
compat.install()

US_PER_HOUR = 3_600_000_000


def hourly_user_counts(events):
    """``(user_id, hour, n_events, value_milli)`` — tumbling 1-hour windows.

    hour = epoch_us(ts) // 3.6e9; value_milli = Σ floor(value·1000) as int64
    (per-row truncation then integer sum == the SQL oracle exactly)."""

    def kernel(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        val = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": batch["user_id"],
            "hour": pa.array(ts // US_PER_HOUR, pa.int64()),
            "vmilli": pa.array(np.floor(val * 1000.0).astype(np.int64), pa.int64()),
        })

    return (
        events.map_batches(kernel, batch_format="pyarrow")
        .groupby(["user_id", "hour"])
        .aggregate(Count(alias_name="n_events"), Sum("vmilli", alias_name="value_milli"))
    )


def sessionize(events, gap_minutes: int = 30):
    """``(user_id, session_start_us, n_events, value_milli)`` — sessions split
    when the gap between consecutive events of a user exceeds ``gap_minutes``.

    Sort + segment-fold (the ``adjacency_lists`` / ``topk_per_key``
    discipline, VERDICT r3 #8) instead of one pandas DataFrame per user:
    ONE global range sort on (user_id, ts_us, event_id), then each block
    folds its *interior* users' sessions with pure numpy (segment bounds +
    ``np.add.reduceat``); only the ≤2 users touching a block edge divert
    their raw rows to a tiny per-user pandas merge, because a session can
    only straddle blocks through the edge users. The SQL oracle is the
    standard lag/gap/cumsum window construction."""
    gap_us = gap_minutes * 60_000_000

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts_us", "event_id"])
        new = (g["ts_us"].diff().fillna(gap_us + 1) > gap_us).astype(np.int64)
        g = g.assign(session=new.cumsum())
        out = (
            g.groupby("session")
            .agg(
                user_id=("user_id", "first"),
                session_start_us=("ts_us", "min"),
                n_events=("event_id", "count"),
                value_milli=("vmilli", "sum"),
            )
            .reset_index(drop=True)
        )
        return out[["user_id", "session_start_us", "n_events", "value_milli"]]

    def prep(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64())
        val = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": batch["user_id"],
            "event_id": batch["event_id"],
            "ts_us": ts,
            "vmilli": pa.array(np.floor(val * 1000.0).astype(np.int64), pa.int64()),
        })

    srt = (
        events.map_batches(prep, batch_format="pyarrow")
        .sort(["user_id", "ts_us", "event_id"])
    )

    zero = np.zeros(0, np.int64)

    def fold(batch: pa.Table) -> pa.Table:
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        n = len(u)
        if n == 0:
            z = pa.array(zero, pa.int64())
            return pa.table({
                "user_id": z, "session_start_us": z, "n_events": z,
                "value_milli": z, "ts_us": z, "event_id": z, "vmilli": z,
                "boundary": pa.array([], pa.bool_()),
            })
        ts = batch["ts_us"].to_numpy(zero_copy_only=False)
        vm = batch["vmilli"].to_numpy(zero_copy_only=False)
        ev = batch["event_id"].to_numpy(zero_copy_only=False)
        new_sess = np.r_[True, (u[1:] != u[:-1]) | (ts[1:] - ts[:-1] > gap_us)]
        starts = np.flatnonzero(new_sess)
        sess_user = u[starts]
        lengths = np.diff(np.r_[starts, n])
        keep = (sess_user != u[0]) & (sess_user != u[-1])  # interior users
        agg_n = int(keep.sum())
        sums = np.add.reduceat(vm, starts)
        raw = (u == u[0]) | (u == u[-1])  # edge users' raw rows → merge
        raw_n = int(raw.sum())
        pad_agg = np.zeros(agg_n, np.int64)
        pad_raw = np.zeros(raw_n, np.int64)
        return pa.table({
            "user_id": pa.array(np.r_[sess_user[keep], u[raw]], pa.int64()),
            "session_start_us": pa.array(np.r_[ts[starts][keep], pad_raw],
                                         pa.int64()),
            "n_events": pa.array(np.r_[lengths[keep], pad_raw], pa.int64()),
            "value_milli": pa.array(np.r_[sums[keep], pad_raw], pa.int64()),
            "ts_us": pa.array(np.r_[pad_agg, ts[raw]], pa.int64()),
            "event_id": pa.array(np.r_[pad_agg, ev[raw]], pa.int64()),
            "vmilli": pa.array(np.r_[pad_agg, vm[raw]], pa.int64()),
            "boundary": pa.array(np.r_[np.zeros(agg_n, bool),
                                       np.ones(raw_n, bool)]),
        })

    folded = srt.map_batches(fold, batch_format="pyarrow",
                             batch_size=None).materialize()

    def split(want_boundary: bool, cols: list[str]):
        def f(batch: pa.Table) -> pa.Table:
            keep = batch["boundary"].to_numpy(
                zero_copy_only=False) == want_boundary
            return batch.filter(pa.array(keep)).select(cols)
        return folded.map_batches(f, batch_format="pyarrow")

    done = split(False, ["user_id", "session_start_us", "n_events",
                         "value_milli"])
    merged = (
        split(True, ["user_id", "ts_us", "event_id", "vmilli"])
        .groupby("user_id")
        .map_groups(sessions, batch_format="pandas")
    )
    return done.union(merged)


def event_type_totals(events):
    """``(event_type, n, value_milli)`` — global per-type rollup."""

    def kernel(batch: pa.Table) -> pa.Table:
        val = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": batch["event_type"],
            "vmilli": pa.array(np.floor(val * 1000.0).astype(np.int64), pa.int64()),
        })

    return (
        events.map_batches(kernel, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Count(alias_name="n"), Sum("vmilli", alias_name="value_milli"))
    )


def sliding_window_counts(events, window_minutes: int = 60, step_minutes: int = 15):
    """``(window_start_us, n_events, value_milli)`` — SLIDING windows of
    ``window_minutes`` advancing every ``step_minutes`` (window must be a
    multiple of step). Each event lands in ``window/step`` windows — the
    expansion happens vectorized per batch (``np.repeat``), then one global
    groupby on the window key; no per-event Python, no driver state.
    """
    if window_minutes % step_minutes:
        raise ValueError("window_minutes must be a multiple of step_minutes")
    step_us = step_minutes * 60_000_000
    k = window_minutes // step_minutes

    def expand(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        val = np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * 1000.0
        ).astype(np.int64)
        base = ts // step_us  # newest window containing the event
        offs = np.arange(k, dtype=np.int64)
        starts = ((np.repeat(base, k) - np.tile(offs, len(ts))) * step_us)
        return pa.table({
            "window_start_us": pa.array(starts[starts >= 0], pa.int64()),
            "vmilli": pa.array(np.repeat(val, k)[starts >= 0], pa.int64()),
        })

    return (
        events.map_batches(expand, batch_format="pyarrow")
        .groupby("window_start_us")
        .aggregate(Count(alias_name="n_events"), Sum("vmilli", alias_name="value_milli"))
    )


def sliding_unique_users(events, window_minutes: int = 60, step_minutes: int = 15):
    """``(window_start_us, n_users)`` — DISTINCT active users per sliding
    window (the standard engagement metric): same vectorized window
    expansion as :func:`sliding_window_counts`, then the one-sort
    boundary-safe distinct fold (``analytics._distinct_counts_by_key`` —
    distinct counts aren't additive, so a hash aggregate would need two
    all-to-all passes)."""
    if window_minutes % step_minutes:
        raise ValueError("window_minutes must be a multiple of step_minutes")
    from cassovary_ray.analytics import _distinct_counts_by_key

    step_us = step_minutes * 60_000_000
    k = window_minutes // step_minutes

    def expand(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        base = ts // step_us
        offs = np.arange(k, dtype=np.int64)
        starts = ((np.repeat(base, k) - np.tile(offs, len(ts))) * step_us)
        return pa.table({
            "window_start_us": pa.array(starts[starts >= 0], pa.int64()),
            "user_id": pa.array(np.repeat(uid, k)[starts >= 0], pa.int64()),
        })

    return _distinct_counts_by_key(
        events.map_batches(expand, batch_format="pyarrow"),
        "window_start_us", "user_id", "n_users")


def top_users_per_type(events, k: int = 3):
    """``(event_type, user_id, n_events, rank)`` — the ``k`` heaviest users
    per event type (heavy-hitters). Per-batch (type, user) partial counts
    pre-combine (pure Arrow group_by, no pandas in the kernel) before ONE
    groupby; the top-k cut is the sort + segment-fold idiom
    (:func:`cassovary_ray.analytics.topk_per_key`) over the already
    aggregated (type × user) table, which is cardinality-bounded (distinct
    pairs, not events). Ranking is total: count desc, then user_id asc —
    integers only, so it hash-matches SQL."""
    from cassovary_ray.analytics import topk_per_key

    def partial(batch: pa.Table) -> pa.Table:
        t = (batch.select(["event_type", "user_id"])
             .group_by(["event_type", "user_id"])
             .aggregate([([], "count_all")]))
        return t.rename_columns(["event_type", "user_id", "_c"])

    totals = (
        events.select_columns(["event_type", "user_id"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "user_id"])
        .aggregate(Sum("_c", alias_name="n_events"))
    )
    return topk_per_key(totals, "event_type", ["n_events", "user_id"],
                        [True, False], k)


def hourly_retention(events):
    """``(hour, active, retained)`` — distinct users active in hour ``h``,
    and how many of them are also active in hour ``h+1``.

    Join-free tag-combine shape (scale note: retention is usually written as
    a self-join of the distinct (user, hour) table on ``hour+1`` — a second
    all-to-all over the same data): each event emits TWO tagged rows,
    ``(user, hour, cur=1)`` and ``(user, hour-1, nxt=1)``, pre-deduped
    within the batch, then ONE ``groupby(user, hour).max`` collapses them;
    a row with ``cur=1`` is an active (user, hour) pair and its ``nxt`` bit
    says whether the same user appears in the next hour. Max-aggregation
    makes cross-batch duplicates harmless (no distinct pass needed). The
    final per-hour rollup groups on the hour key alone (tiny)."""

    def tag(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        hour = ts // US_PER_HOUR
        # within-batch dedup of (user, hour) before emitting tags
        key = np.unique(np.c_[uid, hour], axis=0)
        u, h = key[:, 0], key[:, 1]
        n = len(u)
        return pa.table({
            "user_id": pa.array(np.concatenate([u, u]), pa.int64()),
            "hour": pa.array(np.concatenate([h, h - 1]), pa.int64()),
            "cur": pa.array(np.r_[np.ones(n, np.int64), np.zeros(n, np.int64)]),
            "nxt": pa.array(np.r_[np.zeros(n, np.int64), np.ones(n, np.int64)]),
        })

    tagged = (
        events.map_batches(tag, batch_format="pyarrow")
        .groupby(["user_id", "hour"])
        .aggregate(Max("cur", alias_name="cur"), Max("nxt", alias_name="nxt"))
    )

    def active_rows(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["cur"], 1))
        return pa.table({"hour": b["hour"], "retained": b["nxt"]})

    return (
        tagged.map_batches(active_rows, batch_format="pyarrow")
        .groupby("hour")
        .aggregate(Count(alias_name="active"), Sum("retained", alias_name="retained"))
    )


def funnel(events, steps: tuple[str, str, str] = ("view", "click", "purchase")):
    """Per-user funnel progression: first ``steps[0]`` at t1, first
    ``steps[1]`` strictly after t1, first ``steps[2]`` strictly after that —
    returns ``(user_id, stages, first_step_us)`` for users who reached
    stage ≥ 1 (stages ∈ {1,2,3}; strict μs ordering, ties don't advance).

    Structure mirrors the SQL oracle: one min-groupby per step + a join
    filtering to events after the previous step's time — no per-user Python,
    each stage is one shuffle keyed on user_id (same key every stage, so a
    co-partitioned engine moves nothing after the first)."""
    from cassovary_ray.analytics import _auto_partitions, _join_safe

    P = _auto_partitions(None)

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"],
            "event_type": batch["event_type"],
            "ts_us": batch["ts"].cast(pa.int64()),
        })

    ev = events.select_columns(["user_id", "event_type", "ts"]).map_batches(
        prep, batch_format="pyarrow").materialize()

    def first_after(prev, step):
        """min ts of `step` events strictly after prev (user_id, t)."""
        j = ev.join(prev, "inner", P, on=("user_id",))
        j = j.map_batches(
            lambda b, s=step: b.filter(
                pc.and_(pc.equal(b["event_type"], s),
                        pc.greater(b["ts_us"], b["t"]))
            ).select(["user_id", "ts_us"]),
            batch_format="pyarrow")
        return _join_safe(
            j.groupby("user_id").aggregate(Min("ts_us", alias_name="t")), P)

    t1 = _join_safe(
        ev.map_batches(
            lambda b: b.filter(pc.equal(b["event_type"], steps[0]))
            .select(["user_id", "ts_us"]),
            batch_format="pyarrow")
        .groupby("user_id").aggregate(Min("ts_us", alias_name="t")), P)
    t2 = first_after(t1, steps[1])
    t3 = first_after(t2, steps[2])

    out = t1.join(t2.rename_columns({"t": "t2", "user_id": "u2"}),
                  "left_outer", P, on=("user_id",), right_on=("u2",))
    out = _join_safe(out, P)
    out = out.join(t3.rename_columns({"t": "t3", "user_id": "u3"}),
                   "left_outer", P, on=("user_id",), right_on=("u3",))

    def finish(b: pa.Table) -> pa.Table:
        t2v = b["t2"].to_numpy(zero_copy_only=False)
        t3v = b["t3"].to_numpy(zero_copy_only=False)
        stages = 1 + (~np.isnan(t2v.astype(np.float64))).astype(np.int64) \
            + (~np.isnan(t3v.astype(np.float64))).astype(np.int64)
        return pa.table({
            "user_id": b["user_id"],
            "stages": pa.array(stages, pa.int64()),
            "first_step_us": b["t"],
        })

    return out.map_batches(finish, batch_format="pyarrow")


def _typed_pair_prep(events, probe_type: str, build_type: str):
    """Shared prep for the temporal joins: keep only the two event types,
    tag the side, and carry ``(event_id, user_id, ts_us)``. One column-pruned
    pass; the single shuffle that follows is keyed on user_id."""

    def prep(batch: pa.Table) -> pa.Table:
        keep = pc.or_(pc.equal(batch["event_type"], probe_type),
                      pc.equal(batch["event_type"], build_type))
        b = batch.filter(keep)
        return pa.table({
            "event_id": b["event_id"],
            "user_id": b["user_id"],
            "ts_us": b["ts"].cast(pa.int64()),
            "is_probe": pc.equal(b["event_type"], probe_type),
        })

    return events.select_columns(
        ["event_id", "user_id", "ts", "event_type"]
    ).map_batches(prep, batch_format="pyarrow")


_ASOF_DTYPES = {"event_id": np.int64, "user_id": np.int64, "ts_us": np.int64,
                "prior_event_id": np.int64, "gap_us": np.int64}


def asof_latest(events, probe_type: str = "purchase",
                build_type: str = "click"):
    """AS-OF join inside the events stream: for every ``probe_type`` event,
    the LATEST ``build_type`` event of the same user with ``ts <= probe.ts``
    (non-strict, matching DuckDB ``ASOF LEFT JOIN``'s default inequality).

    Returns ``(event_id, user_id, ts_us, prior_event_id, gap_us)`` with the
    sentinel ``-1`` for probes that have no prior build event — sentinels
    instead of nulls keep every column int64 so results hash-match the SQL
    oracle without nullable-dtype coercion.

    Ray Data has no as-of join; the distributed shape is ONE hash shuffle on
    user_id (``groupby.map_groups``) and a vectorized ``searchsorted`` merge
    inside each group. Partitioning assumption: one user's events fit one
    group (the same assumption ``sessionize`` documents); group size is
    per-user event count, so hot users bound the group, not the corpus."""

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        probe = g[g["is_probe"]].sort_values("ts_us")
        build = g[~g["is_probe"]].sort_values("ts_us")
        if len(probe) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d)
                                 for c, d in _ASOF_DTYPES.items()})
        bts = build["ts_us"].to_numpy()
        idx = np.searchsorted(bts, probe["ts_us"].to_numpy(), side="right") - 1
        hit = idx >= 0
        prior_id = np.full(len(probe), -1, np.int64)
        gap = np.full(len(probe), -1, np.int64)
        bids = build["event_id"].to_numpy()
        prior_id[hit] = bids[idx[hit]]
        gap[hit] = probe["ts_us"].to_numpy()[hit] - bts[idx[hit]]
        return pd.DataFrame({
            "event_id": probe["event_id"].to_numpy(),
            "user_id": probe["user_id"].to_numpy(),
            "ts_us": probe["ts_us"].to_numpy(),
            "prior_event_id": prior_id,
            "gap_us": gap,
        })

    return (
        _typed_pair_prep(events, probe_type, build_type)
        .groupby("user_id")
        .map_groups(merge, batch_format="pandas")
    )


_RANGE_DTYPES = {"event_id": np.int64, "user_id": np.int64,
                 "n_in_window": np.int64}


def range_join_counts(events, probe_type: str = "purchase",
                      build_type: str = "click",
                      window_minutes: int = 60):
    """Range (interval) join inside the events stream: for every
    ``probe_type`` event, the COUNT of same-user ``build_type`` events in
    the trailing half-open window ``(probe.ts - window, probe.ts]``.

    Returns ``(event_id, user_id, n_in_window)``, zero for empty windows
    (LEFT semantics). Same distributed shape as :func:`asof_latest` — one
    user_id shuffle, two ``searchsorted`` probes per group — instead of the
    O(|probe|·|build|) expansion a naive theta-join would do."""
    win_us = window_minutes * 60_000_000

    def count(g: pd.DataFrame) -> pd.DataFrame:
        probe = g[g["is_probe"]].sort_values("ts_us")
        build = g[~g["is_probe"]].sort_values("ts_us")
        if len(probe) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d)
                                 for c, d in _RANGE_DTYPES.items()})
        bts = build["ts_us"].to_numpy()
        pts = probe["ts_us"].to_numpy()
        lo = np.searchsorted(bts, pts - win_us, side="right")
        hi = np.searchsorted(bts, pts, side="right")
        return pd.DataFrame({
            "event_id": probe["event_id"].to_numpy(),
            "user_id": probe["user_id"].to_numpy(),
            "n_in_window": (hi - lo).astype(np.int64),
        })

    return (
        _typed_pair_prep(events, probe_type, build_type)
        .groupby("user_id")
        .map_groups(count, batch_format="pandas")
    )


def _z2_flags(c, n, s, ss, t_sq) -> np.ndarray:
    """Exact evaluation of ``(c·n − s)² ≥ t²·(n·ss − s²) ∧ (n·ss − s²) > 0``.

    int64 fast path; when a worst-case bound on the intermediates reaches
    2^63 the inputs are promoted to object dtype (arbitrary-precision
    Python ints) so the comparison never wraps where the oracle's BIGINT
    would raise (ADVICE r3)."""
    if len(c) == 0:
        return np.zeros(0, dtype=bool)
    cm, nm, sm, ssm = (int(a.max()) for a in (c, n, s, ss))
    worst = max((cm * nm + sm) ** 2, t_sq * (nm * ssm + sm * sm))
    if worst >= 2 ** 63:
        c, n, s, ss = (a.astype(object) for a in (c, n, s, ss))
    dev = c * n - s
    var_n2 = n * ss - s * s  # n² · variance, exact
    return np.asarray((dev * dev >= t_sq * var_n2) & (var_n2 > 0), dtype=bool)


def hourly_anomalies(events, z_threshold: int = 3):
    """``(event_type, hour, n_events)`` — hours whose event count is a
    ≥ ``z_threshold``-sigma outlier for that event type (the volume-spike /
    outage detector of stream monitoring).

    The z-test is evaluated in EXACT integer arithmetic so results are
    reduction-order-free and hash-match the SQL oracle: with per-type hour
    count n, sum s = Σc and sum of squares ss = Σc², population variance is
    (n·ss − s²)/n² and z² ≥ T² rewrites to

        (c·n − s)² ≥ T² · (n·ss − s²),   requiring (n·ss − s²) > 0

    (zero variance ⇒ every hour equals the mean ⇒ no anomalies; this also
    drops single-hour types). Exact at ANY magnitude: the kernel bounds the
    largest intermediate — (c·n−s)² can reach ≈ Σc²·n²·T² — and promotes to
    arbitrary-precision Python ints (object dtype) when it would exceed
    int64, so the comparison never wraps where the oracle's BIGINT would
    raise (ADVICE r3). The stats table is hours×types-sized, so the slow
    path costs microseconds when it triggers.

    Scale shape: one pre-combined ``groupby(event_type, hour)`` (hours ≪
    events), one tiny per-type stats groupby, then a broadcast join of the
    stats onto the hourly stream — no second shuffle, no driver loop."""
    from cassovary_ray.joins import broadcast_hash_join

    def kernel(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": batch["event_type"],
            "hour": pa.array(ts // US_PER_HOUR, pa.int64()),
        })

    hourly = (
        events.map_batches(kernel, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Count(alias_name="n_events"))
    )

    def square(batch: pa.Table) -> pa.Table:
        c = batch["n_events"].to_numpy(zero_copy_only=False)
        return batch.append_column("c_sq", pa.array(c * c, pa.int64()))

    stats = (
        hourly.map_batches(square, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Count(alias_name="n_hours"),
                   Sum("n_events", alias_name="sum_c"),
                   Sum("c_sq", alias_name="sum_sq"))
    )

    t_sq = z_threshold * z_threshold

    def flag(batch: pa.Table) -> pa.Table:
        keep = _z2_flags(
            batch["n_events"].to_numpy(zero_copy_only=False),
            batch["n_hours"].to_numpy(zero_copy_only=False),
            batch["sum_c"].to_numpy(zero_copy_only=False),
            batch["sum_sq"].to_numpy(zero_copy_only=False),
            t_sq)
        return batch.filter(pa.array(keep)).select(
            ["event_type", "hour", "n_events"])

    return broadcast_hash_join(hourly, stats, on="event_type").map_batches(
        flag, batch_format="pyarrow")


def _cm_salts(depth: int, seed: int) -> np.ndarray:
    """Per-row salts of the Count-Min sketch: splitmix64(j+1 ⊕ seed·golden),
    shared by the engine kernel and ``oracles.count_min_sql``."""
    from cassovary_ray.hashing import splitmix64

    with np.errstate(over="ignore"):  # intentional mod-2^64 wraparound
        return splitmix64(
            np.arange(1, depth + 1, dtype=np.uint64)
            ^ (np.uint64(seed) * np.uint64(0x9E3779B97F4A7C15)))


def count_min_counts(events, key_col: str = "user_id", depth: int = 4,
                     width: int = 256, seed: int = 7):
    """``(user_id, n_exact, cm_estimate)`` — per-key exact counts next to
    their Count-Min sketch estimates (Cormode & Muthukrishnan 2005), the
    fixed-memory heavy-hitter primitive for streams too large to key-count.

    Everything is integer arithmetic (cell sums, min over rows), so the
    output is reduction-order-free and hash-matches the SQL oracle; the
    guarantee ``cm_estimate ≥ n_exact`` is asserted by tests. Keys must be
    NON-NEGATIVE int64 (the engine hashes via the uint64 view; the SQL
    mirror via HUGEINT — they agree only on [0, 2^63)).

    Scale shape: each batch pre-combines into its own (depth × width)
    counter matrix and emits ≤ depth·width non-zero cells — the groupby
    that follows moves sketch-sized data, NEVER key-sized. The combined
    sketch (depth·width int64s, a few KB) is the one driver-side object —
    that is the point of a sketch — and is ``ray.put`` once for the
    estimate pass. The exact side (one key groupby) exists only to expose
    the estimate/exact pairing; production callers query the sketch alone.
    """
    from cassovary_ray.hashing import splitmix64

    salts = _cm_salts(depth, seed)

    def cells(batch: pa.Table) -> pa.Table:
        u = batch[key_col].to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(u, return_counts=True)
        mat = np.zeros((depth, width), dtype=np.int64)
        uu = uniq.astype(np.uint64)
        for j in range(depth):
            k = (splitmix64(uu ^ salts[j]) % np.uint64(width)).astype(np.int64)
            np.add.at(mat[j], k, cnt)
        jj, kk = np.nonzero(mat)
        return pa.table({"j": pa.array(jj, pa.int64()),
                         "k": pa.array(kk, pa.int64()),
                         "c": pa.array(mat[jj, kk], pa.int64())})

    sketch_ds = (
        events.select_columns([key_col])
        .map_batches(cells, batch_format="pyarrow")
        .groupby(["j", "k"])
        .aggregate(Sum("c", alias_name="cnt"))
    )
    mat = np.zeros((depth, width), dtype=np.int64)
    sk = sketch_ds.to_pandas()  # ≤ depth·width rows by construction
    mat[sk["j"].to_numpy(), sk["k"].to_numpy()] = sk["cnt"].to_numpy()
    mat_ref = ray.put(mat)

    exact = (
        events.select_columns([key_col])
        .groupby(key_col)
        .aggregate(Count(alias_name="n_exact"))
    )

    def estimate(batch: pa.Table) -> pa.Table:
        m = ray.get(mat_ref)
        uu = batch[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        est = np.full(len(uu), np.iinfo(np.int64).max, dtype=np.int64)
        for j in range(depth):
            k = (splitmix64(uu ^ salts[j]) % np.uint64(width)).astype(np.int64)
            est = np.minimum(est, m[j, k])
        return batch.append_column("cm_estimate", pa.array(est, pa.int64()))

    return exact.map_batches(estimate, batch_format="pyarrow")
