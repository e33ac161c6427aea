"""Runtime workarounds for Ray Data bugs this engine would otherwise hit.

patch_hash_shuffle_schema_broadcast
-----------------------------------
Ray 2.49's hash-shuffle schema broadcast is racy with empty blocks: the
operator marks an input sequence's schemas as broadcast when it submits the
FIRST ``_shuffle_block`` task with ``send_empty_blocks=True``, but the task
itself returns early — without fanning empty schema-carrying shards out to
the aggregators — whenever its input block has zero rows
(``hash_shuffle.py``: the ``block.num_rows == 0`` early return precedes the
``send_empty_blocks`` fan-out). If that first-submitted block happens to be
empty (scheduling-order dependent, hence flaky), any join bucket that then
receives no rows builds a ZERO-COLUMN table in
``JoinAggregator.finalize`` and pyarrow's acero join aborts the whole
dataset with ``ArrowInvalid: No match or multiple matches for key field
reference FieldRef.Name(...)``. Deterministic repro: inner-join any
dataset whose blocks are all empty (e.g. a filtered-to-nothing Dataset)
against a non-empty one.

The patch wraps the ``_shuffle_block`` remote task: empty blocks with
``send_empty_blocks=True`` now run the schema fan-out (apply the block
transformer, convert to Arrow, send one zero-row shard per partition and
await acceptance — exactly what the original does for non-empty input)
instead of returning early. Non-empty blocks take the original code path
unchanged. The wrapper is version-gated and degrades to a no-op if Ray's
internals moved.

patch_project_empty_blocks
--------------------------
Ray 2.49's Project kernel (``plan_udf_map_op.py`` ``plan_project_op``,
the physical op behind ``select_columns`` / ``rename_columns`` /
``with_columns``) returns ZERO-ROW blocks unchanged (`if not num_rows:
return block`), so a dataset's empty blocks keep the PRE-projection
schema while its non-empty blocks get the new one — silent schema drift
inside one dataset. Downstream consumers that unify block schemas then
see both: a hash-join partition builder that receives a stale-schema
empty shard (broadcast by the schema fix above, or submitted by the
original fan-out when the first block is non-empty) concatenates e.g.
``(src, dst, deg)`` with ``(src, dst, deg_src)`` and the acero join
emits a table with the field twice; Ray's Arrow serializer then dies
with ``KeyError: 'Field "deg" exists 2 times in schema'``. Observed as
a scheduling-order flake in ``join(...).rename_columns(...).join(...)``
chains (the triangle-orientation pipeline).

The patch re-registers the Project plan fn with the early-return
removed: selection/rename/expressions now apply to empty blocks too
(pure metadata work on zero rows), so every block of a projected
dataset carries the SAME schema. Zero-column empty blocks (no schema to
project) and any projection error on an empty block fall back to the
original pass-through.
"""

from __future__ import annotations

_PATCHED = False


def patch_hash_shuffle_schema_broadcast() -> bool:
    """Install the empty-block schema-broadcast fix; returns True if active.

    Idempotent; safe to call before ``ray.init`` (pure module rebinding —
    the operator looks ``_shuffle_block`` up as a module global at task
    submission time, so rebinding reaches every subsequent execution).
    """
    global _PATCHED
    if _PATCHED:
        return True
    import os

    if os.environ.get("CASSOVARY_NO_COMPAT"):  # kill switch for A/B debugging
        return False
    try:
        import ray
        from ray.data._internal.execution.operators import hash_shuffle as hs
        from ray.data._internal.arrow_block import ArrowBlockAccessor  # noqa: F401
        from ray.data.block import BlockAccessor, BlockExecStats

        original = hs._shuffle_block
        # the fields the wrapper depends on; bail out (no-op) if Ray moved them
        inner = getattr(original, "_function", None)
        if inner is None or not hasattr(hs, "_create_empty_table"):
            return False
    except Exception:
        return False

    @ray.remote
    def _shuffle_block_patched(
        block,
        input_index,
        key_columns,
        pool,
        block_transformer=None,
        send_empty_blocks=False,
        override_partition_id=None,
    ):
        n_rows = BlockAccessor.for_block(block).num_rows()
        if n_rows > 0 or not send_empty_blocks:
            # non-empty input (or no broadcast requested): original behavior
            return inner(
                block,
                input_index,
                key_columns,
                pool,
                block_transformer=block_transformer,
                send_empty_blocks=send_empty_blocks,
                override_partition_id=override_partition_id,
            )

        # empty block carrying the schema-broadcast duty: do the fan-out the
        # original skips (its num_rows == 0 early return), mirroring its
        # transform → convert → submit → await-acceptance sequence
        import pyarrow as pa

        from ray.data._internal.table_block import TableBlockAccessor
        from ray.data.block import BlockType

        stats = BlockExecStats.builder()
        if block_transformer is not None:
            block = block_transformer(block)
        block = TableBlockAccessor.try_convert_block_type(
            block, block_type=BlockType.ARROW
        )
        assert isinstance(block, pa.Table)
        if block.num_columns == 0:
            # Schema-less empty block (e.g. from an all-empty `from_items`):
            # there is no schema to broadcast, and fanning out zero-column
            # shards would poison join partition builders that also receive
            # real shards. Fall back to the original early-return.
            meta = BlockAccessor.for_block(block).get_metadata(
                exec_stats=stats.build()
            )
            return (meta, {})
        shard = hs._create_empty_table(block.schema)
        pending = []
        for partition_id in range(pool.num_partitions):
            aggregator = pool.get_aggregator_for_partition(partition_id)
            ref = ray.put(shard)
            pending.append(aggregator.submit.remote(input_index, partition_id, ref))
        while pending:
            _, pending = ray.wait(pending, num_returns=len(pending), timeout=1)
        meta = BlockAccessor.for_block(block).get_metadata(exec_stats=stats.build())
        return (meta, {})

    hs._shuffle_block = _shuffle_block_patched
    _PATCHED = True
    return True


_PATCHED_PROJECT = False


def patch_project_empty_blocks() -> bool:
    """Make Project (select/rename/with_columns) apply to empty blocks too;
    returns True if active.

    Re-registers ``Planner._DEFAULT_PLAN_FNS[Project]`` with a plan fn whose
    block kernel mirrors Ray's but WITHOUT the zero-row early return, so a
    projected dataset's empty blocks carry the post-projection schema
    instead of drifting (see module docstring). Idempotent; version-gated —
    degrades to a no-op if Ray's internals moved.
    """
    global _PATCHED_PROJECT
    if _PATCHED_PROJECT:
        return True
    import os

    if os.environ.get("CASSOVARY_NO_COMPAT"):  # kill switch for A/B debugging
        return False
    try:
        from ray.data._expression_evaluator import eval_expr
        from ray.data._internal.compute import get_compute
        from ray.data._internal.logical.operators.map_operator import Project
        from ray.data._internal.planner import plan_udf_map_op as pm
        from ray.data._internal.planner.planner import Planner
        from ray.data.block import BlockAccessor

        # machinery the fixed plan fn reuses verbatim from Ray's module;
        # bail out (no-op) if any of it moved
        transformer_for = pm._create_map_transformer_for_block_based_map_op
        gen_transform = pm._generate_transform_fn_for_map_block
        wrap_exc = pm._try_wrap_udf_exception
        MapOperator = pm.MapOperator
        assert Planner._DEFAULT_PLAN_FNS[Project] is pm.plan_project_op
    except Exception:
        return False

    def plan_project_op_fixed(op, physical_children, data_context):
        assert len(physical_children) == 1
        input_physical_dag = physical_children[0]

        columns = op.cols
        columns_rename = op.cols_rename
        exprs = op.exprs

        def fn(block):
            try:
                accessor = BlockAccessor.for_block(block)
                is_empty = not accessor.num_rows()
                try:
                    if exprs:
                        new_columns = {
                            name: block[name] for name in accessor.column_names()
                        }
                        for name, expr in exprs.items():
                            new_columns[name] = eval_expr(expr, block)
                        block = BlockAccessor.batch_to_block(new_columns)
                    if columns:
                        block = BlockAccessor.for_block(block).select(columns)
                    if columns_rename:
                        block = block.rename_columns(
                            [columns_rename.get(c, c) for c in block.schema.names]
                        )
                    return block
                except Exception:
                    if is_empty:
                        # zero-column empty block, or an expression that can't
                        # evaluate on zero rows: stock pass-through behavior
                        return block
                    raise
            except Exception as e:
                wrap_exc(e, block)

        return MapOperator.create(
            transformer_for(gen_transform(fn)),
            input_physical_dag,
            data_context,
            name=op.name,
            compute_strategy=get_compute(op._compute),
            ray_remote_args=op._ray_remote_args,
            ray_remote_args_fn=op._ray_remote_args_fn,
        )

    Planner._DEFAULT_PLAN_FNS[Project] = plan_project_op_fixed
    _PATCHED_PROJECT = True
    return True


def install() -> None:
    """Install every applicable workaround (each one idempotent/gated)."""
    patch_hash_shuffle_schema_broadcast()
    patch_project_empty_blocks()
