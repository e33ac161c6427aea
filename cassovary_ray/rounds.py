"""Generic user-extension protocol for iterative vertex programs.

The reference's whole iterative surface is one trait: a ``LinkAnalysis``
subclass supplies ``defaultInitialState`` / ``iterate`` (returning the new
state + an error) / ``postRun`` hooks and the base class owns the
iterate-until-converged loop (``LinkAnalysis.scala:58-68,87-109,111-117``).
This module is that extension point for the sharded engine: a user writes a
:class:`VertexProgram` with pure-numpy hooks and runs it via
:meth:`cassovary_ray.engine.ShardedGraph.run_program` — no edits to
``GraphShard`` required. The engine keeps ownership of everything
distributed: CSR shards, the packed plasma exchange, per-round lineage
metrics, and the stop rule (``iteration >= max_iterations or error <=
tolerance``, cloned from ``LinkAnalysis.run``).

Execution model (one BSP superstep per round, the ``pr_round`` shape):

1. ``scatter``: each shard asks the program for a per-owned-vertex
   coefficient vector; the engine pushes ``coef[src]`` (× edge weight on
   weighted layouts) along every out-edge and pre-combines per destination
   (``np.add/minimum/maximum.reduceat``) into one packed payload per
   destination partition — the partial-aggregation discipline, so a hub
   vertex receives at most P partials regardless of in-degree.
2. exchange: P plasma objects/round, shard→shard reads (see
   ``_Scatter.per_part``).
3. ``apply``: each shard combines the ≤P incoming partials into one
   per-owned-vertex array (identity-filled where nothing arrived: 0 for
   ``combine="sum"``, +inf for ``"min"``, -inf for ``"max"``) and hands it
   to the program, which updates its state and returns a LOCAL error; the
   driver sums shard errors into the round error.

Worked example — Katz centrality through the public protocol (this exact
class is also the engine-parity fixture in ``tests/test_rounds.py``)::

    class KatzProgram(VertexProgram):
        state_name = "katz_vp"          # shard state key
        output_column = "katz"          # result Dataset column
        combine = "sum"

        def __init__(self, alpha=0.1, beta=1.0):
            self.alpha, self.beta = alpha, beta

        def init(self, ctx):            # x0 = beta (the k=0 series term)
            ctx.state[self.state_name] = np.full(ctx.n_local, self.beta)

        def scatter(self, ctx):         # push alpha * x along out-edges
            return self.alpha * ctx.state[self.state_name]

        def apply(self, ctx, incoming): # x'(v) = beta + sum_in alpha*x(u)
            new = self.beta + incoming
            err = float(np.abs(new - ctx.state[self.state_name]).sum())
            ctx.state[self.state_name] = new
            return err

    with ShardedGraph(layout_dir) as g:
        ds = g.run_program(KatzProgram(alpha=0.1), max_iterations=10)
        # ds == g.katz(alpha=0.1, max_iterations=10) exactly

Programs are shipped to the shard actors by value (cloudpickle) once at
``run_program`` start — keep them small (scalars/config only); per-vertex
state belongs in ``ctx.state`` so checkpointing and ``get_state_table``
see it.
"""

from __future__ import annotations

import numpy as np

_COMBINE_IDENTITY = {"sum": 0.0, "min": np.inf, "max": -np.inf}


class ShardCtx:
    """Per-shard view handed to every :class:`VertexProgram` hook.

    Attributes:
        part, num_parts: this shard's partition id and the partition count.
        n_total: global vertex count.
        n_local: number of vertices this shard owns.
        verts: sorted int64 ids of the owned vertices.
        out_deg: out-degree per owned vertex (``PageRank.scala:55-68``'s
            ``outboundCount``), int64.
        weighted_out_deg: Σ outgoing edge weight per owned vertex on
            weighted layouts, else None.
        state: the shard's named per-vertex state dict — write your
            program's vectors here (length ``n_local``); the engine
            materializes ``state[program.state_name]`` as the result.
    """

    __slots__ = ("part", "num_parts", "n_total", "n_local", "verts",
                 "out_deg", "weighted_out_deg", "state")

    def __init__(self, part, num_parts, n_total, verts, out_deg,
                 weighted_out_deg, state):
        self.part = part
        self.num_parts = num_parts
        self.n_total = n_total
        self.n_local = len(verts)
        self.verts = verts
        self.out_deg = out_deg
        self.weighted_out_deg = weighted_out_deg
        self.state = state


class VertexProgram:
    """Base class for user iterative algorithms (``LinkAnalysis.scala:58-68``
    trait surface re-expressed for the sharded engine; see module docstring
    for the superstep contract and a worked example).

    Subclasses set:
        state_name: key under which the program keeps its primary state
            vector in ``ctx.state`` (and from which the result is read).
        output_column: column name of the returned ``Dataset(vertex, col)``.
        combine: per-destination edge combiner — ``"sum"`` (default),
            ``"min"`` or ``"max"``.

    and implement ``init`` / ``scatter`` / ``apply`` (+ optional ``post``).
    """

    state_name = "vp"
    output_column = "value"
    combine = "sum"

    def init(self, ctx: ShardCtx) -> None:
        """Set initial state vectors (``defaultInitialState``,
        ``LinkAnalysis.scala:64-68``)."""
        raise NotImplementedError

    def scatter(self, ctx: ShardCtx) -> np.ndarray:
        """Return the per-owned-vertex coefficient pushed along each
        out-edge this round (length ``ctx.n_local`` float64)."""
        raise NotImplementedError

    def apply(self, ctx: ShardCtx, incoming: np.ndarray) -> float:
        """Consume the combined incoming contributions (length
        ``ctx.n_local``; identity-filled where no edge arrived), update
        ``ctx.state``, and return this shard's contribution to the round
        error (``iterate``'s error, ``LinkAnalysis.scala:58-63``; the
        driver sums shards and stops at ``error <= tolerance``)."""
        raise NotImplementedError

    def post(self, ctx: ShardCtx) -> None:
        """Optional post-convergence hook (``postRun``,
        ``LinkAnalysis.scala:111-117``) — e.g. normalization."""


class KatzProgram(VertexProgram):
    """Katz centrality expressed through the public protocol — the parity
    witness that :meth:`ShardedGraph.run_program` reproduces a hand-wired
    engine algorithm (``ShardedGraph.katz``) exactly. Also the doc example.
    """

    state_name = "katz_vp"
    output_column = "katz"
    combine = "sum"

    def __init__(self, alpha: float = 0.1, beta: float = 1.0):
        self.alpha = float(alpha)
        self.beta = float(beta)

    def init(self, ctx: ShardCtx) -> None:
        ctx.state[self.state_name] = np.full(ctx.n_local, self.beta)

    def scatter(self, ctx: ShardCtx) -> np.ndarray:
        return self.alpha * ctx.state[self.state_name]

    def apply(self, ctx: ShardCtx, incoming: np.ndarray) -> float:
        new = self.beta + incoming
        err = float(np.abs(new - ctx.state[self.state_name]).sum())
        ctx.state[self.state_name] = new
        return err
