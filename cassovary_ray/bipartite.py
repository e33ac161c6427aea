"""Bipartite iterative link analysis — alternating weighted flow.

Semantics cloned from ``graph/bipartite/IterativeLinkAnalyzer.scala:36-184``:
starting from supplied left-side nodes with initial weights, iterations
alternate direction (iteration 0 flows left→right, 1 flows right→left, ...);
each pass sets

    dest.weight = resetProb · dest.initialWeight
                + Σ_src (src.weight / src.numNeighbors) · (1 − resetProb)

where ``numNeighbors`` is the degree within the induced bipartite subgraph,
``resetProb`` is ``reset_prob_left`` for left→right passes and
``reset_prob_right`` for right→left, right-side nodes have initial weight 0,
and the LAST pass records each destination's top-k contributor sources by
contributed weight (``SmallBoundedPriorityQueue`` top-k, contribution desc,
id asc ties).

Execution shape: the reference runs this per request on small induced
subgraphs (``cassovary-server/src/main/scala/CassovaryServer.scala:36-59``),
so after the distributed edge dedup the flow itself is vectorized pandas on
the driver. For corpus-scale bipartite flow, the ShardedGraph PageRank
machinery with a ``side`` column is the path (SURVEY §2.5 bipartite row).
"""

from __future__ import annotations

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
):
    """Run the alternating flow over ``edges`` = Dataset(src,dst) left→right
    links. Returns (left_df, right_df): ``(vertex, weight, contributors)``
    sorted weight desc (the analyze() output shape,
    ``IterativeLinkAnalyzer.scala:136-178``)."""
    P = _auto_partitions(num_partitions)
    edf = _join_safe(distinct_edges(edges), P).to_pandas()

    left_deg = edf.groupby("src").size()
    right_deg = edf.groupby("dst").size()
    lw = pd.Series(left_init, dtype=float)
    rw = pd.Series(0.0, index=right_deg.index)
    contributors: dict[int, list[int]] = {}

    for it in range(num_iterations):
        last = it == num_iterations - 1
        flow_reverse = it % 2 == 1
        reset = reset_prob_right if flow_reverse else reset_prob_left
        if flow_reverse:
            src_col, dst_col = "dst", "src"
            src_w, src_deg = rw, right_deg
            base = pd.Series(left_init, dtype=float).reindex(lw.index, fill_value=0.0) * reset
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
        if last:
            ranked = flows.sort_values(["share", src_col], ascending=[False, True])
            top = ranked.groupby(dst_col)[src_col].apply(
                lambda s: s.head(num_top_contributors).tolist()
            )
            contributors = top.to_dict()

    def frame(weights: pd.Series) -> pd.DataFrame:
        df = weights.rename("weight").rename_axis("vertex").reset_index()
        df = df.sort_values(["weight", "vertex"], ascending=[False, True]).reset_index(drop=True)
        df["contributors"] = df["vertex"].map(lambda v: contributors.get(v, []))
        return df

    return frame(lw), frame(rw)
