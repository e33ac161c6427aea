"""Regression tests for the Ray hash-shuffle schema-broadcast workaround
(`compat.patch_hash_shuffle_schema_broadcast`).

Ray 2.49's `_shuffle_block` early-returns on zero-row input blocks WITHOUT
fanning schema-carrying empty shards out to the join aggregators, while the
operator records the broadcast as done. A join bucket that then receives no
rows builds a zero-column table and pyarrow's acero join aborts with
``ArrowInvalid: No match or multiple matches for key field reference``.
Before the patch this was a scheduling-order flake on any tiny-input join
(observed on `triangle_count` of K_4 at P=4) and a deterministic failure
when one join side is entirely empty.
"""

import pyarrow as pa
import pytest
import ray
import ray.data as rd

import cassovary_ray.analytics  # noqa: F401  (installs the compat patches)
from cassovary_ray.analytics import triangle_count
from cassovary_ray.compat import (
    patch_hash_shuffle_schema_broadcast,
    patch_project_empty_blocks,
)
from cassovary_ray.corpus import complete_graph

from tests.util import edges_ds_for_graph


def test_patch_installed():
    assert patch_hash_shuffle_schema_broadcast() is True
    assert patch_project_empty_blocks() is True


def _empty(schema_cols):
    return rd.from_arrow(pa.table(
        {c: pa.array([], pa.int64()) for c in schema_cols}))


def test_inner_join_empty_left():
    """Deterministic pre-patch failure: every left block is empty, so the
    original code never broadcast the left schema to any bucket."""
    left = _empty(["k", "v"])
    right = rd.from_arrow(pa.table({"k": pa.array([1, 2], pa.int64()),
                                    "w": pa.array([5, 6], pa.int64())}))
    out = left.join(right, "inner", 4, on=("k",)).materialize()
    assert out.count() == 0


def test_left_outer_join_empty_right():
    """left_outer against an all-empty right side must keep every left row
    and null-pad the right columns (needs the broadcast schema to know
    them)."""
    left = rd.from_arrow(pa.table({"k": pa.array([1, 2], pa.int64()),
                                   "v": pa.array([10, 20], pa.int64())}))
    out = left.join(_empty(["k", "w"]), "left_outer", 4,
                    on=("k",)).materialize()
    df = out.to_pandas().sort_values("k").reset_index(drop=True)
    assert sorted(df.columns) == ["k", "v", "w"]
    assert list(df["k"]) == [1, 2]
    assert df["w"].isna().all()


def test_left_anti_join_empty_right():
    left = rd.from_arrow(pa.table({"k": pa.array([1, 2, 3], pa.int64())}))
    out = left.join(_empty(["k"]), "left_anti", 4, on=("k",)).materialize()
    assert out.count() == 3


@pytest.mark.parametrize("rep", range(3))
def test_triangles_k4_not_flaky(rep):
    """The originally observed flake: K_4 at P=4 leaves some join buckets
    empty; whether the schema broadcast survived depended on which block
    Ray submitted first (~1/3 failure rate before the patch)."""
    assert triangle_count(edges_ds_for_graph(complete_graph(4))) == 4


# -- Project on empty blocks (compat.patch_project_empty_blocks) ------------
#
# Stock Ray's Project kernel passes zero-row blocks through unprojected, so
# `join(...).rename_columns(...)` leaves empty blocks with the pre-rename
# schema; a later join then unifies both schemas in one partition builder and
# acero emits a duplicate field (`KeyError: Field "deg" exists 2 times`).


def _block_schemas(ds):
    names = []
    for bundle in ds.materialize().iter_internal_ref_bundles():
        for ref in bundle.block_refs:
            names.append(tuple(ray.get(ref).schema.names))
    return names


def test_rename_applies_to_empty_blocks():
    """Every materialized block — including empty ones — must carry the
    post-rename schema (stock Ray: empty blocks keep (k, deg))."""
    full = pa.table({"k": pa.array([1, 2], pa.int64()),
                     "deg": pa.array([10, 20], pa.int64())})
    empty = full.slice(0, 0)
    ds = rd.from_arrow([full, empty]).rename_columns({"deg": "deg_l"})
    schemas = _block_schemas(ds)
    assert len(schemas) == 2
    assert all(s == ("k", "deg_l") for s in schemas), schemas


def test_select_applies_to_empty_blocks():
    full = pa.table({"k": pa.array([1], pa.int64()),
                     "v": pa.array([9], pa.int64()),
                     "w": pa.array([7], pa.int64())})
    ds = rd.from_arrow([full, full.slice(0, 0)]).select_columns(["k", "w"])
    assert all(s == ("k", "w") for s in _block_schemas(ds))


def test_rename_then_join_no_duplicate_field():
    """The observed flake shape: a rename whose input has empty blocks,
    joined against a table sharing the ORIGINAL column name. Pre-fix, a
    stale (k, deg) empty shard in a join bucket yields two 'deg' fields."""
    full = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                     "deg": pa.array([10, 20, 30], pa.int64())})
    left = rd.from_arrow([full, full.slice(0, 0), full.slice(0, 0)])
    left = left.rename_columns({"deg": "deg_l"})
    right = rd.from_arrow(pa.table({"k": pa.array([1, 2], pa.int64()),
                                    "deg": pa.array([5, 6], pa.int64())}))
    out = left.join(right, "inner", 4, on=("k",)).to_pandas()
    assert sorted(out.columns) == ["deg", "deg_l", "k"]
    assert len(out) == 2
