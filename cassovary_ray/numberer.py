"""External↔internal node-id mapping — the ``MapNodeNumberer`` analogue
(``util/MapNodeNumberer.scala:21-66``).

The default id scheme in this engine is the stable 63-bit content hash
(``hashing.py``; SURVEY §1.4) — no map needed. This module serves users who
bring an EXISTING name↔id file (the reference ships test fixtures in exactly
that format: ``name id`` per line, ``MapNodeNumberer.scala:33-45``) and need
their ids preserved.

Scale shape: the mapping is a ``Dataset(name, id)`` — parquet/text-backed,
validated DISTRIBUTEDLY (duplicate detection is a groupby-count, not a
driver hash map), applied to edge tables by hash join (big maps) or by a
``ray.put`` broadcast lookup (small maps, the default up to
``broadcast_limit`` rows). Point lookups are distributed filters.

Duplicate semantics per the reference (``MapNodeNumberer.scala:47-57``):
a duplicate ID raises, a duplicate NAME raises — both detected in one
validation pass and reported with examples.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from cassovary_ray import compat

# Ray 2.49 workarounds (see compat.py): empty-first-block hash-join schema
# broadcast, and Project skipping empty blocks (schema drift into joins).
# Installed here because this module issues Dataset.join calls.
compat.install()



def read_numbering(path: str, *, separator: str = " "):
    """``name id`` lines → ``Dataset(name: string, id: int64)``
    (``MapNodeNumberer.forStringsFromFile``, ``:46-65``). Comments (#) and
    blank lines are skipped like the graph readers."""
    import ray.data

    def parse(batch: dict) -> pa.Table:
        names, ids = [], []
        for data in batch["bytes"]:
            text = bytes(data).decode()
            for line in text.splitlines():
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                parts = line.split(separator)
                names.append(parts[0])
                ids.append(int(parts[1]))
        return pa.table({"name": pa.array(names, pa.string()),
                         "id": pa.array(ids, pa.int64())})

    return ray.data.read_binary_files([path]).map_batches(parse, batch_format="numpy")


class MapNodeNumberer:
    """Bidirectional numberer over a ``Dataset(name, id)``."""

    def __init__(self, mapping, *, validate: bool = True,
                 broadcast_limit: int = 1_000_000):
        self.mapping = mapping.materialize()
        self.broadcast_limit = broadcast_limit
        self._fwd: dict | None = None  # name -> id, small-map fast path
        self._rev: dict | None = None
        if validate:
            self._validate()

    @classmethod
    def from_file(cls, path: str, *, separator: str = " ", **kw):
        return cls(read_numbering(path, separator=separator), **kw)

    def _validate(self) -> None:
        """Distributed duplicate detection (``MapNodeNumberer.scala:47-57``):
        any name or id appearing twice raises, naming offenders."""
        from ray.data.aggregate import Count

        for col, what in (("name", "name"), ("id", "id")):
            dup = (
                self.mapping.groupby(col)
                .aggregate(Count(alias_name="c"))
                .map_batches(
                    lambda b, c=col: b.filter(
                        pa.compute.greater(b["c"], pa.scalar(1))),
                    batch_format="pyarrow",
                )
                .take(5)
            )
            if dup:
                offenders = [r[col] for r in dup]
                raise ValueError(f"Duplicate {what} found: {offenders}")

    def _small_maps(self):
        if self._fwd is None:
            n = self.mapping.count()
            if n > self.broadcast_limit:
                raise ValueError(
                    f"numbering has {n} rows > broadcast_limit="
                    f"{self.broadcast_limit}; use translate_edges (join path)"
                )
            rows = self.mapping.take_all()
            self._fwd = {r["name"]: r["id"] for r in rows}
            self._rev = {r["id"]: r["name"] for r in rows}
        return self._fwd, self._rev

    def external_to_internal(self, name: str) -> int:
        fwd, _ = self._small_maps()
        return fwd[name]  # KeyError like the reference's Map apply

    def internal_to_external(self, node_id: int) -> str:
        _, rev = self._small_maps()
        return rev[node_id]

    def translate_edges(self, edges_named, src_col: str = "src",
                        dst_col: str = "dst", num_partitions: int | None = None):
        """``Dataset(src: name, dst: name)`` → ``Dataset(src: int64,
        dst: int64)``. Small maps broadcast (``ray.put`` once, read per
        task); big maps fall back to two hash joins. Unknown names raise
        (broadcast path) / drop (join path, inner-join semantics —
        documented)."""
        import ray

        n = self.mapping.count()
        if n <= self.broadcast_limit:
            fwd, _ = self._small_maps()
            ref = ray.put(fwd)

            def lookup(batch: pa.Table) -> pa.Table:
                m = ray.get(ref)
                s = [m[x] for x in batch[src_col].to_pylist()]
                d = [m[x] for x in batch[dst_col].to_pylist()]
                return pa.table({"src": pa.array(s, pa.int64()),
                                 "dst": pa.array(d, pa.int64())})

            return edges_named.map_batches(lookup, batch_format="pyarrow")

        from cassovary_ray.analytics import _auto_partitions, _join_safe

        P = _auto_partitions(num_partitions)
        m = _join_safe(self.mapping, P)
        j1 = _join_safe(
            edges_named.join(m, "inner", P, on=(src_col,), right_on=("name",))
            .rename_columns({"id": "src_id"}).select_columns([dst_col, "src_id"]),
            P,
        )
        j2 = j1.join(m, "inner", P, on=(dst_col,), right_on=("name",))
        return (
            j2.rename_columns({"id": "dst_id"})
            .select_columns(["src_id", "dst_id"])
            .rename_columns({"src_id": "src", "dst_id": "dst"})
        )

    def names_of(self, vertices, id_col: str = "vertex",
                 num_partitions: int | None = None):
        """Attach the external name column to any id-keyed Dataset (the
        ``internalToExternal`` bulk form)."""
        from cassovary_ray.analytics import _auto_partitions, _join_safe

        P = _auto_partitions(num_partitions)
        m = _join_safe(self.mapping, P)
        return vertices.join(m, "left_outer", P, on=(id_col,), right_on=("id",))
