"""Typed, named per-node label columns — the ``graph/labels`` surface.

Semantics cloned from the reference:

- ``Labels.scala:19-36``: a registry of named labels; ``get[L](key)`` is
  type-checked — asking for a label under the wrong type yields None (here:
  ``TypeError``).
- ``Label.scala:28-43``: a label maps node id → value, is named and typed,
  and **need not be defined for all ids** (partial).
- ``Label.scala:60-79`` (``FlagLabel``/``TrueLabel``): a presence-set label
  whose value is always True.
- ``LabelsReader.scala:32-35``: only int and string label types exist in the
  reference's file format; we enforce the same two types.
- ``DirectedGraph.labelOfNode`` (``DirectedGraph.scala:74-77``): point lookup
  by (node, label name) returning Option[L].

Ray-Data shape: each label IS a ``Dataset(vertex: int64, label: int64|string)``
— a parquet-backed column, never collected. Attaching is a registry insert
(lazy); consuming joins the label Dataset against whatever vertex-keyed table
needs it (``with_label``), which is a hash shuffle on the vertex key — the
SURVEY §1.4 vertex-column story. Point lookups (``label_of_node``) run a
distributed filter + take(1): O(scan) per call, meant for debugging/serving
single nodes at small scale; batch consumers must use ``with_label``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from cassovary_ray import compat

# Ray 2.49 workarounds (see compat.py): empty-first-block hash-join schema
# broadcast, and Project skipping empty blocks (schema drift into joins).
# Installed here because this module issues Dataset.join calls.
compat.install()


INT, STR = "int", "string"
_ALLOWED = {INT, STR}


def _label_dtype(ds) -> str:
    """Validate (vertex, label) schema; return the canonical type name."""
    schema = ds.schema()
    cols = dict(zip(schema.names, schema.types))
    if "vertex" not in cols or "label" not in cols:
        raise ValueError(f"label dataset needs (vertex, label) columns, has {schema.names}")
    if not pa.types.is_integer(cols["vertex"]):
        raise ValueError(f"vertex column must be integer, is {cols['vertex']}")
    t = cols["label"]
    if pa.types.is_integer(t):
        return INT
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return STR
    if pa.types.is_boolean(t):  # flag labels
        return INT
    raise ValueError(
        f"label type {t} not supported: the reference's label files are "
        "int or string only (LabelsReader.scala:32-35)"
    )


def flag_label(vertices_ds):
    """Presence-set → always-true label (``FlagLabel``, ``Label.scala:74-79``):
    ids in the set map to True; everyone else is undefined."""
    def to_flag(batch: pa.Table) -> pa.Table:
        v = batch["vertex"]
        return pa.table({"vertex": v, "label": pa.array(np.ones(len(v), dtype=np.int64))})

    return vertices_ds.select_columns(["vertex"]).map_batches(
        to_flag, batch_format="pyarrow"
    )


class NodeLabels:
    """Named, typed label registry (``Labels.scala:19-36``)."""

    def __init__(self):
        self._labels: dict[str, tuple[str, object]] = {}

    def add(self, name: str, ds) -> None:
        """``labels += label`` (``Labels.scala:28-30``); replaces an existing
        entry under the same name, like the reference's map insert."""
        self._labels[name] = (_label_dtype(ds), ds)

    def remove(self, name: str) -> None:
        self._labels.pop(name, None)  # ``-=`` is a no-op on absent keys

    def names(self) -> list[str]:
        return sorted(self._labels)

    def get(self, name: str, expected_type: str | None = None):
        """Typed get (``Labels.scala:22-26``): with ``expected_type`` given
        ('int'|'string'), a type mismatch raises instead of silently
        returning the wrong-typed column."""
        if name not in self._labels:
            return None
        dtype, ds = self._labels[name]
        if expected_type is not None:
            if expected_type not in _ALLOWED:
                raise ValueError(f"expected_type must be one of {_ALLOWED}")
            if dtype != expected_type:
                raise TypeError(
                    f"label {name!r} is {dtype}, requested {expected_type} "
                    "(Labels.get type-tag check, Labels.scala:22-26)"
                )
        return ds

    def dtype(self, name: str) -> str | None:
        return self._labels[name][0] if name in self._labels else None

    def label_of_node(self, name: str, vertex_id: int, expected_type: str | None = None):
        """``DirectedGraph.labelOfNode`` — None when the label doesn't exist
        or is undefined for this id (partial labels, ``Label.scala:31-34``)."""
        ds = self.get(name, expected_type)
        if ds is None:
            return None

        def match(batch: pa.Table) -> pa.Table:
            v = batch["vertex"].to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(v == vertex_id))

        rows = ds.map_batches(match, batch_format="pyarrow").take(1)
        return rows[0]["label"] if rows else None

    def with_label(self, ds, name: str, *, how: str = "left_outer",
                   num_partitions: int | None = None, column: str | None = None):
        """Join a named label onto any vertex-keyed Dataset — the batch
        consumption path (vertex-column join, SURVEY §1.4). ``how`` is
        'left_outer' (undefined ids → null, mirroring partial labels) or
        'inner'. The label column lands as ``column`` (default: the label's
        name)."""
        from cassovary_ray.analytics import _auto_partitions, _join_safe

        label = self.get(name)
        if label is None:
            raise KeyError(name)
        P = _auto_partitions(num_partitions)
        out_col = column or name
        lab = _join_safe(label.rename_columns({"label": out_col}), P)
        return ds.join(lab, how, P, on=("vertex",))
