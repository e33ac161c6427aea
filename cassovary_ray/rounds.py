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


_MIS_M = 2147483647          # Mersenne prime 2^31-1; lane modulus
_MIS_LANES = (                # (a, b, c, d) per lane, all < 2^30 so every
    (1000003, 999983, 12345, 2654435),    # intermediate stays < 2^62
    (1000033, 999979, 54321, 7654321),
)


def _mis_lane(verts: np.ndarray, salt: int, a: int, b: int, c: int,
              d: int) -> np.ndarray:
    vl = verts & 0x7FFFFFFF
    vh = (verts >> 31) & 0x7FFFFFFF
    t = ((vl * a + vh * b + c) % _MIS_M + salt * d) % _MIS_M
    return (t * t) % _MIS_M


def mis_priority(verts: np.ndarray, salt: int) -> np.ndarray:
    """Deterministic per-round Luby priority: two independent quadratic
    hashes of (62 id bits, round salt) mod the Mersenne prime 2^31-1,
    packed into 52 bits — so the value is exactly representable in float64
    (the engine's exchange payload) AND every intermediate fits a signed
    64-bit product (max ≈ 2^62), letting the DuckDB oracle evaluate the
    literal same integers in BIGINT arithmetic.

    Why quadratic, not linear: with p = (v·a + r·b) mod prime, the
    difference p(u,r) − p(v,r) is independent of r, so two adjacent
    vertices that tie once tie EVERY round and livelock under strict-less
    selection. Squaring makes the pairwise order salt-dependent
    (t_u² ≡ t_v² needs t_u ≡ ±t_v; the '+' branch moves with r), so a tie
    at one salt breaks at the next. A PERSISTENT tie needs both 31-bit
    lane digests of both ids to collide (~2⁻⁶² per adjacent pair — at
    10¹³ edges, ≈2·10⁻⁶ expected pairs corpus-wide)."""
    v = verts.astype(np.int64)
    lane1 = _mis_lane(v, salt, *_MIS_LANES[0])
    lane2 = _mis_lane(v, salt, *_MIS_LANES[1])
    return (lane1 * 2097152 + (lane2 & 0x1FFFFF)).astype(np.float64)


class MISProgram(VertexProgram):
    """Maximal independent set (Luby 1986, "A simple parallel algorithm for
    the maximal independent set problem", SIAM J. Comput.) expressed through
    the public protocol — no engine edits. Demonstrates the protocol beyond
    linear-algebra folds: tri-state per-vertex status, ``combine="min"``,
    and a two-phase superstep cycle.

    Per logical Luby round (= 2 engine supersteps on an UNDIRECTED layout):

    - select phase: every undecided vertex scatters its round priority
      (decided vertices scatter +inf, the min identity); an undecided vertex
      whose priority is strictly below the min over its undecided neighbors
      joins the MIS. Strict-less means two tied neighbors both stay
      undecided — resolved next round by the fresh salt.
    - notify phase: MIS members scatter 1.0; any undecided vertex that
      hears one becomes OUT.

    Requires a self-loop-free undirected (symmetrized) layout: a self-loop
    feeds a vertex its own priority, so strict-less can never admit it.
    Run with ``run_program(MISProgram(), max_iterations=None,
    tolerance=0.0)`` — the returned error is the number of still-undecided
    vertices, so the standard stop rule IS the convergence proof. Output
    column ``in_mis`` is 1.0 for members, 0.0 otherwise. Deterministic at
    any parallelism (pure functions of vertex id + round index)."""

    state_name = "in_mis"
    output_column = "in_mis"
    combine = "min"

    _UNDECIDED, _IN, _OUT = 0, 1, 2

    def init(self, ctx: ShardCtx) -> None:
        ctx.state["mis_status"] = np.zeros(ctx.n_local, np.int8)
        ctx.state[self.state_name] = np.zeros(ctx.n_local, np.float64)
        self._k = 0          # scatters emitted so far (engine round index)

    def scatter(self, ctx: ShardCtx) -> np.ndarray:
        status = ctx.state["mis_status"]
        if self._k % 2 == 0:      # select phase: push round priorities
            coef = mis_priority(ctx.verts, self._k // 2)
            coef[status != self._UNDECIDED] = np.inf
        else:                     # notify phase: members shout 1.0
            coef = np.full(ctx.n_local, np.inf)
            coef[status == self._IN] = 1.0
        self._k += 1
        return coef

    def apply(self, ctx: ShardCtx, incoming: np.ndarray) -> float:
        # consumes the scatter indexed self._k - 1 (apply runs before this
        # round's scatter in the fused superstep)
        status = ctx.state["mis_status"]
        undecided = status == self._UNDECIDED
        if (self._k - 1) % 2 == 0:   # selection
            own = mis_priority(ctx.verts, (self._k - 1) // 2)
            status[undecided & (own < incoming)] = self._IN
        else:                        # neighbor-of-member elimination
            status[undecided & (incoming <= 1.0)] = self._OUT
        return float((status == self._UNDECIDED).sum())

    def post(self, ctx: ShardCtx) -> None:
        ctx.state[self.state_name] = (
            ctx.state["mis_status"] == self._IN).astype(np.float64)


class ColoringProgram(VertexProgram):
    """Distributed greedy graph coloring: Luby MIS per color class
    (Luby 1986 applied color-by-color — each color class is an independent
    set, so the coloring is proper by construction; a vertex is eliminated
    from a class only by a distinct neighbor joining it, so every vertex is
    colored within ``deg(v) + 1`` classes plus tie slack).

    Written AGAINST the public protocol like :class:`MISProgram`, with one
    extra discipline: every color runs a FIXED schedule of
    ``rounds_per_color`` Luby rounds (2 supersteps each — select, notify)
    whether or not the class converged early. Phase/color/round are
    therefore pure functions of the superstep counter, so every shard
    advances in lockstep with NO global coordination beyond the engine's
    standard error sum — and the DuckDB oracle (``oracles.coloring_sql``)
    can unroll the literal same schedule with the literal same
    :func:`mis_priority` integers (salt = ``color * 64 + round``). Parity
    holds for ANY ``rounds_per_color``: an unconverged class just defers
    its leftovers to the next color on both sides. No-op rounds on an
    emptied pool are harmless.

    Per select phase: undecided vertices scatter their salted priority
    (everyone else +inf, the min identity); an undecided vertex strictly
    below the min over its undecided neighbors joins the CURRENT color
    immediately (terminal). Per notify phase: current-color members
    scatter 1.0; undecided vertices that hear one sit out the rest of this
    color. At each color boundary the sat-out vertices rejoin the pool.

    Requires a self-loop-free undirected layout (as :class:`MISProgram`;
    a self-loop would make its vertex uncolorable). Run with
    ``run_program(p, max_iterations=None, tolerance=0.0)`` — the error is
    the number of still-uncolored vertices. Output column ``color`` holds
    float64 color indices (exact small ints); raises if ``max_colors``
    classes don't finish the graph (ties are ~2^-62 per adjacent pair per
    round, so in practice colors ≤ max degree + 1)."""

    state_name = "color"
    output_column = "color"
    combine = "min"

    _UNDECIDED, _IN, _OUT = 0, 1, 2
    _SALT_STRIDE = 64          # injective (color, round) -> salt for r < 64

    def __init__(self, rounds_per_color: int = 6, max_colors: int = 64):
        if not (1 <= rounds_per_color < self._SALT_STRIDE):
            raise ValueError("rounds_per_color must be in [1, 64)")
        self.rounds_per_color = int(rounds_per_color)
        self.max_colors = int(max_colors)

    def init(self, ctx: ShardCtx) -> None:
        ctx.state["col_status"] = np.zeros(ctx.n_local, np.int8)
        ctx.state[self.state_name] = np.full(ctx.n_local, -1.0)
        self._s = 0          # supersteps scattered so far

    def _where(self, s: int) -> tuple[int, int, int]:
        """(color, luby round, phase) of superstep ``s`` — pure function."""
        per = 2 * self.rounds_per_color
        return s // per, (s % per) // 2, s % 2

    def scatter(self, ctx: ShardCtx) -> np.ndarray:
        color, rnd, phase = self._where(self._s)
        if color >= self.max_colors:
            raise RuntimeError(
                f"coloring did not finish within max_colors={self.max_colors}")
        status = ctx.state["col_status"]
        if rnd == 0 and phase == 0:      # color boundary: sat-outs rejoin
            status[status == self._OUT] = self._UNDECIDED
        if phase == 0:                   # select: push round priorities
            coef = mis_priority(ctx.verts, color * self._SALT_STRIDE + rnd)
            coef[status != self._UNDECIDED] = np.inf
        else:                            # notify: current color shouts 1.0
            coef = np.full(ctx.n_local, np.inf)
            coef[(status == self._IN)
                 & (ctx.state[self.state_name] == float(color))] = 1.0
        self._s += 1
        return coef

    def apply(self, ctx: ShardCtx, incoming: np.ndarray) -> float:
        color, rnd, phase = self._where(self._s - 1)
        status = ctx.state["col_status"]
        undecided = status == self._UNDECIDED
        if phase == 0:                   # selection lands terminally
            own = mis_priority(ctx.verts, color * self._SALT_STRIDE + rnd)
            won = undecided & (own < incoming)
            status[won] = self._IN
            ctx.state[self.state_name][won] = float(color)
        else:                            # member neighbors sit this color out
            status[undecided & (incoming <= 1.0)] = self._OUT
        return float((ctx.state[self.state_name] < 0).sum())


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
