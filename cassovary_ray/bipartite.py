"""Bipartite iterative link analysis — alternating weighted flow.

Semantics cloned from ``graph/bipartite/IterativeLinkAnalyzer.scala:36-184``:
starting from supplied left-side nodes with initial weights, iterations
alternate direction (pass 1 flows left→right, pass 2 flows right→left, ...);
each pass sets

    dest.weight = resetProb · dest.initialWeight
                + Σ_src (src.weight / src.numNeighbors) · (1 − resetProb)

where the graph is the bipartite subgraph **induced by the supplied left
nodes** (the reference discovers right nodes lazily from the supplied lefts'
neighbor lists, ``IterativeLinkAnalyzer.scala:78-91``, so right in-degrees
count only supplied-left edges and the left output contains exactly the
supplied nodes), right-side nodes have initial weight 0, and the last TWO
passes record each destination's top-k contributor sources
(``isLastIterOnEitherSide``, ``IterativeLinkAnalyzer.scala:158``) so both
sides carry contributors in the output.

Reset-prob pairing follows the reference **code**
(``IterativeLinkAnalyzer.scala:152-156``): left→right passes apply
``reset_prob_right`` on the right-side destinations and right→left passes
apply ``reset_prob_left`` — the opposite of what the reference's class doc
comment (``:32-33``) says; we match the code.

Deliberate divergence: contributor top-k is ranked by **contributed share**
(desc, source id asc on ties), not by the source's end-of-run total weight.
The reference stores mutable NodeInfo refs in a bounded queue and sorts at
output time by whatever the source's weight then is
(``IterativeLinkAnalyzer.scala:44-52``) — an artifact of shared mutation that
is non-deterministic under re-ranking and unreproducible in a distributed
setting; contributed share is the documented, order-stable choice.

Execution shape: the reference runs this per request on small induced
subgraphs (``cassovary-server/src/main/scala/CassovaryServer.scala:36-59``),
so after the distributed edge dedup the flow itself is vectorized pandas on
the driver. For corpus-scale bipartite flow, use
``engine.ShardedGraph.bipartite_link_analysis`` (same contract, BSP engine).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from cassovary_ray.analytics import _auto_partitions, _join_safe, distinct_edges


def iterative_link_analysis(
    edges,
    left_init: dict[int, float],
    *,
    num_iterations: int = 2,
    reset_prob_left: float = 0.1,
    reset_prob_right: float = 0.1,
    num_top_contributors: int = 2,
    num_partitions: int | None = None,
    max_edges: int = 5_000_000,
):
    """Run the alternating flow over ``edges`` = Dataset(src,dst) left→right
    links, restricted to the subgraph induced by ``left_init``. Returns
    (left_df, right_df): ``(vertex, weight, contributors)`` sorted weight
    desc (the analyze() output shape, ``IterativeLinkAnalyzer.scala:136-178``).

    This is the documented SMALL-GRAPH driver fallback: it materializes the
    distinct edge set on the driver, so it is GUARDED like
    ``closeness_centrality(sources=None)`` — more than ``max_edges``
    distinct edges raises ValueError pointing at the distributed path
    (``ShardedGraph.bipartite_link_analysis``, which runs the same rounds
    as BSP exchanges over resident CSR shards) instead of silently pulling
    a corpus-scale table to one process."""
    P = _auto_partitions(num_partitions)
    de = _join_safe(distinct_edges(edges), P).materialize()
    n_edges = de.count()
    if n_edges > max_edges:
        raise ValueError(
            f"iterative_link_analysis is the driver-side fallback and would "
            f"materialize {n_edges} distinct edges locally (cap {max_edges}); "
            "use ShardedGraph.bipartite_link_analysis for large graphs, or "
            "raise max_edges knowingly")
    edf = de.to_pandas()
    # Induced subgraph: only edges out of supplied left nodes — the reference
    # never touches a left node it wasn't given (IterativeLinkAnalyzer.scala:78).
    edf = edf[edf["src"].isin(left_init)].reset_index(drop=True)

    left_deg = edf.groupby("src").size()
    right_deg = edf.groupby("dst").size()
    linit = pd.Series(left_init, dtype=float)
    lw = linit.copy()  # lefts start at their initial weight (:145-148)
    rw = pd.Series(0.0, index=right_deg.index)
    left_contrib: dict[int, list[int]] = {}
    right_contrib: dict[int, list[int]] = {}

    for it in range(1, num_iterations + 1):
        record = it in (num_iterations - 1, num_iterations)  # :158
        flow_reverse = it % 2 == 0
        # Reference-code pairing (:152-156): forward pass → resetProbOnRight.
        reset = reset_prob_left if flow_reverse else reset_prob_right
        if flow_reverse:
            src_col, dst_col = "dst", "src"
            src_w, src_deg = rw, right_deg
            base = linit * reset  # every supplied left resets (:72-75)
        else:
            src_col, dst_col = "src", "dst"
            src_w, src_deg = lw, left_deg
            base = pd.Series(0.0, index=rw.index)  # rights reset to 0
        share = (src_w / src_deg * (1.0 - reset)).rename("share")
        flows = edf.join(share, on=src_col).dropna(subset=["share"])
        summed = flows.groupby(dst_col)["share"].sum()
        new = base.add(summed, fill_value=0.0)
        if flow_reverse:
            lw = new
        else:
            rw = new
        if record:
            # nano-quantized ranking (floor(share·1e9)) — shares of truly
            # tied contributors are summation-order-sensitive at the ulp
            # level; quantizing collapses the ties so the src-asc tie-break
            # decides (mirrors engine.bila_contrib_apply and the SQL oracle)
            flows = flows.assign(share_q=np.floor(flows["share"] * 1e9).astype(np.int64))
            ranked = flows.sort_values(["share_q", src_col], ascending=[False, True])
            top = ranked.groupby(dst_col)[src_col].apply(
                lambda s: s.head(num_top_contributors).tolist()
            )
            if flow_reverse:
                left_contrib = top.to_dict()
            else:
                right_contrib = top.to_dict()

    def frame(weights: pd.Series, contributors: dict[int, list[int]]) -> pd.DataFrame:
        df = weights.rename("weight").rename_axis("vertex").reset_index()
        df = df.sort_values(["weight", "vertex"], ascending=[False, True]).reset_index(drop=True)
        df["contributors"] = df["vertex"].map(lambda v: contributors.get(v, []))
        return df

    return frame(lw.reindex(linit.index, fill_value=0.0), left_contrib), frame(
        rw, right_contrib
    )


# ---------------------------------------------------------------------------
# Bipartite data model (two independent id spaces)
# ---------------------------------------------------------------------------


class BipartiteGraph:
    """The bipartite graph data model of ``graph/bipartite/BipartiteGraph.
    scala:24-100``: LEFT and RIGHT nodes live in **independent id spaces**
    (left 3 and right 3 are different nodes), edges link left→right.

    Ray-Data-first representation (SURVEY §1.4's side-column proposal,
    realized): ONE edge table ``Dataset(left_id, right_id)`` — the side of
    each endpoint is carried by the column it sits in, not by a tag field.
    For algorithms that need a single id space (the whole analytics/engine
    stack), :meth:`to_unipartite` encodes left k → 2k and right k → 2k+1
    (collision-free, order-preserving per side, O(1) to invert with
    :func:`decode_vertex`) — the distributed analogue of the reference's
    separate leftNodesById/rightNodesById arrays.
    """

    def __init__(self, edges):
        """``edges``: Dataset with columns (left_id, right_id) — or
        (src, dst), renamed on ingestion."""
        import pyarrow as pa

        cols = set(edges.schema().names)
        if {"src", "dst"} <= cols:
            edges = edges.map_batches(
                lambda t: pa.table({"left_id": t["src"], "right_id": t["dst"]}),
                batch_format="pyarrow",
            )
        self.edges = distinct_edges(
            edges.map_batches(
                lambda t: pa.table({"src": t["left_id"], "dst": t["right_id"]}),
                batch_format="pyarrow",
            )
        ).map_batches(
            lambda t: pa.table({"left_id": t["src"], "right_id": t["dst"]}),
            batch_format="pyarrow",
        )

    def _side_degrees(self, col: str, out_name: str):
        import pyarrow as pa
        from ray.data.aggregate import Sum

        def partial(t: pa.Table):
            import numpy as np

            ids, counts = np.unique(
                t[col].to_numpy(zero_copy_only=False), return_counts=True)
            return pa.table({"vertex": pa.array(ids, pa.int64()),
                             "_c": pa.array(counts, pa.int64())})

        return (
            self.edges.map_batches(partial, batch_format="pyarrow")
            .groupby("vertex").aggregate(Sum("_c", alias_name=out_name))
        )

    def left_nodes(self):
        """``Dataset(vertex, out_deg)`` — left side, its own id space
        (``BipartiteGraph.leftNodeCount`` / per-node ``outboundNodes``)."""
        return self._side_degrees("left_id", "out_deg")

    def right_nodes(self):
        """``Dataset(vertex, in_deg)`` — right side, its own id space."""
        return self._side_degrees("right_id", "in_deg")

    def left_node_count(self) -> int:
        return self.left_nodes().count()

    def right_node_count(self) -> int:
        return self.right_nodes().count()

    def edge_count(self) -> int:
        return self.edges.count()

    def to_unipartite(self):
        """``Dataset(src, dst)`` in the combined id space: left k → 2k,
        right k → 2k+1."""
        import numpy as np
        import pyarrow as pa

        def enc(t: pa.Table) -> pa.Table:
            l = t["left_id"].to_numpy(zero_copy_only=False)
            r = t["right_id"].to_numpy(zero_copy_only=False)
            return pa.table({"src": pa.array(l * 2, pa.int64()),
                             "dst": pa.array(r * 2 + 1, pa.int64())})

        return self.edges.map_batches(enc, batch_format="pyarrow")

    def iterative_link_analysis(self, left_init: dict[int, float], **kwargs):
        """Alternating flow with LEFT-SPACE / RIGHT-SPACE ids in and out
        (wraps :func:`iterative_link_analysis`; encode → flow → decode)."""
        left, right = iterative_link_analysis(
            self.to_unipartite(), {2 * k: v for k, v in left_init.items()},
            **kwargs,
        )
        for df, parity in ((left, 0), (right, 1)):
            df["vertex"] = (df["vertex"] - parity) // 2
            df["contributors"] = df["contributors"].map(
                lambda l, p=1 - parity: [(int(x) - p) // 2 for x in l]
            )
        return left, right


def decode_vertex(v: int) -> tuple[str, int]:
    """Combined-space id → ('left'|'right', side-space id)."""
    return ("left", v // 2) if v % 2 == 0 else ("right", v // 2)
