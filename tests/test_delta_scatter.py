"""Delta-filtered (incremental) PageRank exchange
(``ShardedGraph.pagerank(delta_filter=...)``): senders ship only pending
contribution changes ≥ delta_filter·tolerance/U, receivers accumulate, and
convergence is certified only on a post-flush T1 — so the stop criterion
is exactly the vanilla one and the fixpoint is unchanged within tolerance
(VERDICT r4 next-round #1)."""

from __future__ import annotations

import numpy as np
import pytest

from cassovary_ray.corpus import TOY_GRAPHS
from cassovary_ray.engine import ShardedGraph
from tests.util import build_toy_layout

G6_GOLDEN = {10: 0.12699, 11: 0.16297, 12: 0.15616, 13: 0.06098,
             14: 0.25292, 15: 0.23998}


@pytest.fixture(scope="module")
def g6_layout(tmp_path_factory):
    lay = str(tmp_path_factory.mktemp("ds") / "lay")
    build_toy_layout(TOY_GRAPHS["g6"], lay, 4)
    return lay


def _ranks(lay, **kw):
    with ShardedGraph(lay, **{k: v for k, v in kw.items()
                              if k in ("exchange_precision",)}) as g:
        df = g.pagerank(
            max_iterations=None,
            tolerance=kw.get("tolerance", 1e-8),
            delta_filter=kw.get("delta_filter"),
        ).to_pandas().sort_values("vertex").reset_index(drop=True)
        metrics = list(g.metrics)
    return df, metrics


def test_golden_vectors_with_filter_on(g6_layout):
    """PageRankSpec g6 golden vectors hold with the delta filter enabled
    (the VERDICT-r4 done-criterion)."""
    df, _ = _ranks(g6_layout, tolerance=1e-8, delta_filter=1e-3)
    by_v = dict(zip(df["vertex"], df["rank"]))
    for n, want in G6_GOLDEN.items():  # raw toy ids (build_toy_layout)
        assert by_v[n] == pytest.approx(want, abs=5e-5)
    # the flush-certified stop bounds |Σrank - 1| by ~tolerance/(1-d)
    assert df["rank"].sum() == pytest.approx(1.0, abs=1e-7)


def test_matches_vanilla_within_tolerance(g6_layout):
    tol = 1e-10
    base, _ = _ranks(g6_layout, tolerance=tol)
    got, metrics = _ranks(g6_layout, tolerance=tol, delta_filter=0.1)
    assert (got["vertex"] == base["vertex"]).all()
    assert (got["rank"] - base["rank"]).abs().max() < 10 * tol
    # the certifying round must be a flush round
    assert metrics[-1].extra.get("flush_round") is True


def test_extreme_filter_still_converges_exactly(g6_layout):
    """A filter so coarse that non-flush rounds ship nothing: progress then
    comes only from flush rounds, and the flush discipline must still land
    on the correct fixpoint (a filtered round's tiny T1 is never trusted)."""
    tol = 1e-8
    base, _ = _ranks(g6_layout, tolerance=tol)
    got, metrics = _ranks(g6_layout, tolerance=tol, delta_filter=1e9)
    assert (got["rank"] - base["rank"]).abs().max() < 10 * tol
    assert metrics[-1].extra.get("flush_round") is True


def test_f32_plus_delta_golden(g6_layout):
    df, _ = _ranks(g6_layout, tolerance=1e-7, delta_filter=0.1,
                   exchange_precision="f32")
    by_v = dict(zip(df["vertex"], df["rank"]))
    for n, want in G6_GOLDEN.items():
        assert by_v[n] == pytest.approx(want, abs=5e-5)


def test_delta_requires_tolerance(g6_layout):
    with ShardedGraph(g6_layout) as g:
        with pytest.raises(ValueError, match="delta_filter"):
            g.pagerank(max_iterations=5, tolerance=None, delta_filter=0.1)


def test_exchange_bytes_decay(tmp_path):
    """On a denser random graph the filtered rounds must ship measurably
    fewer bytes than the dense bootstrap/flush rounds."""
    rng = np.random.default_rng(3)
    adj = {int(u): sorted({int(x) for x in rng.integers(0, 200, 12)} - {int(u)})
           for u in range(200)}
    lay = str(tmp_path / "lay")
    build_toy_layout(adj, lay, 4)
    with ShardedGraph(lay) as g:
        g.pagerank(max_iterations=None, tolerance=1e-8, delta_filter=1.0)
        mb = [m.extra["exchange_mb"] for m in g.metrics]
    # some later round's scatter shipped well under the dense round's bytes
    assert len(mb) > 2 and min(mb[1:]) < 0.5 * mb[0]


def test_delta_with_exchange_groups_and_resume(tmp_path):
    """The cluster-path combination: delta filter × grouped exchange (G=2)
    must match vanilla, and a cross-run resume under delta mode rebases the
    incremental state via the bootstrap round."""
    rng = np.random.default_rng(9)
    adj = {int(u): sorted({int(x) for x in rng.integers(0, 80, 6)} - {int(u)})
           for u in range(80)}
    lay = str(tmp_path / "lay")
    build_toy_layout(adj, lay, 4)
    tol = 1e-9
    with ShardedGraph(lay) as g:
        base = (g.pagerank(max_iterations=None, tolerance=tol)
                .to_pandas().sort_values("vertex").reset_index(drop=True))
    with ShardedGraph(lay, exchange_groups=2) as g:
        got = (g.pagerank(max_iterations=None, tolerance=tol,
                          delta_filter=1e-3)
               .to_pandas().sort_values("vertex").reset_index(drop=True))
    assert (got["rank"] - base["rank"]).abs().max() < 10 * tol
    # checkpoint under delta, resume in a fresh graph (still delta mode)
    ck = str(tmp_path / "ck")
    with ShardedGraph(lay) as g:
        g.pagerank(max_iterations=3, tolerance=tol, delta_filter=1e-3,
                   checkpoint_dir=ck, checkpoint_every=1)
    with ShardedGraph(lay) as g:
        out = (g.pagerank(max_iterations=None, tolerance=tol,
                          delta_filter=1e-3, checkpoint_dir=ck, resume=True)
               .to_pandas().sort_values("vertex").reset_index(drop=True))
    assert (out["rank"] - base["rank"]).abs().max() < 10 * tol


def test_resume_ignores_uncertified_checkpoint_error(tmp_path):
    """A checkpoint written at a FILTERED round can record a near-zero
    shipped-only T1 (extreme filter: nothing ships, err == 0 on a
    dangling-free graph). A delta-mode resume must not stop on that stale
    number — it must re-certify and land on the true fixpoint."""
    # dangling-free ring + chords so filtered rounds have exactly err 0
    adj = {i: [(i + 1) % 40, (i + 7) % 40] for i in range(40)}
    lay = str(tmp_path / "lay")
    build_toy_layout(adj, lay, 4)
    tol = 1e-9
    with ShardedGraph(lay) as g:
        base = (g.pagerank(max_iterations=None, tolerance=tol)
                .to_pandas().sort_values("vertex").reset_index(drop=True))
    ck = str(tmp_path / "ck")
    with ShardedGraph(lay) as g:
        # stop uncoverged at iteration 2; round 2 shipped nothing under the
        # extreme filter, so the recorded error is ~0 despite no progress
        g.pagerank(max_iterations=2, tolerance=tol, delta_filter=1e9,
                   checkpoint_dir=ck, checkpoint_every=1)
        last_err = g.metrics[-1].error
    assert last_err <= tol  # the trap: stale "converged-looking" number
    with ShardedGraph(lay) as g:
        out = (g.pagerank(max_iterations=None, tolerance=tol,
                          delta_filter=1e9, checkpoint_dir=ck, resume=True)
               .to_pandas().sort_values("vertex").reset_index(drop=True))
    assert (out["rank"] - base["rank"]).abs().max() < 10 * tol
