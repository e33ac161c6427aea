"""Distributed join strategies over ``ray.data.Dataset``.

Two shapes, chosen by the size of the build side — the same decision a
100 TB pipeline has to make:

- :func:`broadcast_hash_join`: the build side is SMALL (a dimension
  table, a lookup, a centroid set). It is materialized ONCE into the
  object store with ``ray.put`` and every probe-side ``map_batches`` task
  reads it zero-copy — no shuffle of either side, the probe stream keeps
  its partitioning. This is the pattern the engine already uses
  internally (ANN query matrices, numberer maps); here it is the public,
  general-purpose operator.
- :func:`shuffle_join`: both sides are LARGE. Thin, documented wrapper
  over Ray Data's native hash-shuffle ``Dataset.join`` (both sides
  exchanged once on the key hash, partitions joined independently), with
  partition-count sizing guidance in one place.

Within each probe batch the broadcast join is a vectorized
``pyarrow.Table.join`` — Arrow's hash join kernel, no Python rows. Rows
with null keys never match (SQL semantics) for inner/semi/left, and ARE
emitted for anti (a null key has no partner, mirroring DuckDB
``NOT EXISTS``).
"""

from __future__ import annotations

import pyarrow as pa

import ray

from cassovary_ray import compat

# Ray 2.49 workarounds (see compat.py): empty-first-block hash-join schema
# broadcast, and Project skipping empty blocks (schema drift into joins).
# Installed here because this module issues Dataset.join calls.
compat.install()

_HOW = {"inner", "left", "semi", "anti"}


class _BroadcastJoiner:
    """Actor-pool stage: deref the broadcast build table once per actor
    (``__init__``), probe per batch (``__call__``)."""

    def __init__(self, build_ref, on, right_on, how, suffix):
        self.build = ray.get(build_ref) if isinstance(
            build_ref, ray.ObjectRef) else build_ref
        self.on = list(on)
        self.right_on = list(right_on)
        self.how = how
        self.suffix = suffix

    def __call__(self, batch: pa.Table) -> pa.Table:
        how = self.how
        if how in ("semi", "anti"):
            joined = batch.join(
                self.build.select(self.right_on), keys=self.on,
                right_keys=self.right_on,
                join_type="left semi" if how == "semi" else "left anti")
            # Arrow may reorder; column set is unchanged
            return joined.select(batch.column_names)
        joined = batch.join(
            self.build, keys=self.on, right_keys=self.right_on,
            join_type="inner" if how == "inner" else "left outer",
            right_suffix=self.suffix)
        # keep deterministic column order: probe columns first, then the
        # build side's non-key columns in build-table order
        probe_cols = batch.column_names
        out_cols = [c for c in joined.column_names if c in probe_cols]
        out_cols += [c for c in joined.column_names if c not in probe_cols]
        return joined.select(out_cols)


def broadcast_hash_join(probe, build, on, *, right_on=None, how="inner",
                        suffix="_r", concurrency=None):
    """Join a large streaming ``probe`` Dataset against a small ``build``
    Dataset without shuffling either side.

    The build side is collected to ONE Arrow table on the driver and
    ``ray.put`` once (it must fit comfortably in a worker heap — this is
    the dimension-table path, not a general join; use
    :func:`shuffle_join` when both sides are large). Each probe batch is
    joined with Arrow's vectorized hash-join kernel.

    ``how``: ``"inner"`` / ``"left"`` (left outer) / ``"semi"`` /
    ``"anti"`` — probe side is always the left/kept side. Build-side
    column name collisions get ``suffix``. Key columns are compared by
    value; null keys never match (and anti therefore keeps them).

    Returns the joined Dataset, preserving the probe side's streaming
    partitioning (one map_batches stage, no all-to-all)."""
    if how not in _HOW:
        raise ValueError(f"how must be one of {sorted(_HOW)}, got {how!r}")
    on = [on] if isinstance(on, str) else list(on)
    right_on = on if right_on is None else (
        [right_on] if isinstance(right_on, str) else list(right_on))
    if len(on) != len(right_on):
        raise ValueError("on and right_on must have the same length")

    # Ray aggregates can emit zero-column placeholder blocks alongside the
    # real ones; they carry no rows and would fail the schema-equality
    # check in concat_tables — drop them.
    blocks = [b for b in (ray.get(r) for r in build.to_arrow_refs())
              if b.num_columns > 0]
    build_tbl = (pa.concat_tables(blocks) if blocks
                 else build.schema().base_schema.empty_table())
    ref = ray.put(build_tbl.combine_chunks())
    fn_kwargs = {"build_ref": ref, "on": on, "right_on": right_on,
                 "how": how, "suffix": suffix}
    # map_batches with a callable CLASS requires an explicit actor-pool
    # size; default to autoscaling 1..8 probes
    return probe.map_batches(
        _BroadcastJoiner, batch_format="pyarrow",
        fn_constructor_kwargs=fn_kwargs,
        concurrency=concurrency if concurrency is not None else (1, 8))


def shuffle_join(left, right, on, *, right_on=None, how="inner",
                 num_partitions=16, right_suffix="_r"):
    """Hash-shuffle join for two LARGE Datasets: both sides are exchanged
    once on the key hash and each partition pair is joined independently
    (Ray Data's native ``Dataset.join``). ``num_partitions`` bounds the
    per-partition working set — size it so (|left|+|right|)/P fits a
    worker heap; at cluster scale use ≥ total cores so every aggregator
    is busy.

    ``how``: ``"inner"`` / ``"left"`` / ``"semi"`` / ``"anti"`` (the
    latter two keep only/none-matching LEFT rows, projecting the left
    schema)."""
    how_map = {"inner": "inner", "left": "left_outer",
               "semi": "left_semi", "anti": "left_anti"}
    if how not in how_map:
        raise ValueError(f"how must be one of {sorted(how_map)}, got {how!r}")
    on = (on,) if isinstance(on, str) else tuple(on)
    right_on = on if right_on is None else (
        (right_on,) if isinstance(right_on, str) else tuple(right_on))
    return left.join(right, join_type=how_map[how],
                     num_partitions=num_partitions, on=on,
                     right_on=right_on, right_suffix=right_suffix)
