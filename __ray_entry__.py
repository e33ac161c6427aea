"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module, then:
- ``entry()`` as a smoke check on sf0.001,
- each ``queries()[name](sf_dir)`` at sf0.01 compared against
  ``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
  value hash).

Nothing here (or in ``cassovary_ray``) calls ``ray.init``/``ray.shutdown`` —
the caller owns the session.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF0001 = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship pipeline: lineitem-derived edge table → partitioned layout →
    sharded-CSR PageRank to convergence. Returns a pandas DataFrame
    ``(vertex, rank)``."""
    from cassovary_ray.queries import q_graph_pagerank

    return q_graph_pagerank(SF0001).to_pandas()


def queries() -> dict[str, Callable[[str], Any]]:
    from cassovary_ray.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from cassovary_ray.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
