"""TrustRank semantics (Gyöngyi et al., VLDB'04 — seeded PPR where reset
and dangling mass return to the trusted set): trust decays with link
distance from the seeds and never reaches regions with no trusted in-path.
The web_trustrank gate query composes this over the url→host chain; here
the engine property is pinned on a constructed two-region graph."""

from __future__ import annotations

import pytest

from cassovary_ray.engine import ShardedGraph
from tests.util import build_toy_layout

# trusted chain 0→1→2→3 (3 dangles) + spam farm {10, 11} linking only to
# itself and INTO the trusted region (2) — no trusted page links to spam
TWO_REGION = {0: [1], 1: [2], 2: [3], 3: [], 10: [11, 2], 11: [10]}


@pytest.fixture(scope="module")
def layout(tmp_path_factory):
    lay = str(tmp_path_factory.mktemp("tr") / "lay")
    build_toy_layout(TWO_REGION, lay, 3)
    return lay


def test_trust_never_reaches_unlinked_region(layout):
    with ShardedGraph(layout) as g:
        df = (g.personalized_pagerank({0: 1.0}, max_iterations=50,
                                      tolerance=0.0)
              .to_pandas().set_index("vertex")["rank"])
    # spam hosts get EXACTLY zero trust: no trusted path leads there, and
    # unlike uniform PageRank the reset mass never teleports to them
    assert df[10] == 0.0 and df[11] == 0.0
    assert abs(df.sum() - 1.0) < 1e-9
    # trust decays along the chain from the seed
    assert df[0] > df[1] > df[2] > df[3] > 0


def test_trust_decay_rate_is_damping(layout):
    """First-hop decay: with a single out-link chain, each hop carries
    d = 0.85 of the previous vertex's rank (plus the reset/dangling share
    at the seed only), so r(k+1)/r(k) ≤ d away from the seed. The identity
    holds at the FIXED POINT (iterate k compares against iterate k-1 one
    hop back), so run until the power-iteration residual 0.85^k is far
    below the assertion tolerance: 0.85^200 ≈ 6e-15 ≪ 1e-9."""
    with ShardedGraph(layout) as g:
        df = (g.personalized_pagerank({0: 1.0}, max_iterations=200,
                                      tolerance=0.0)
              .to_pandas().set_index("vertex")["rank"])
    assert df[2] == pytest.approx(0.85 * df[1], rel=1e-9)
    assert df[3] == pytest.approx(0.85 * df[2], rel=1e-9)


def test_spam_mass_separates_regions(layout):
    """Spam mass (Gyöngyi et al., VLDB'06) = (pr − tr)/pr. Hosts with no
    trusted in-path have tr = 0 exactly → spam mass exactly 1; the seed
    itself keeps most of its rank under the trusted reset → mass ≪ 1."""
    with ShardedGraph(layout) as g:
        pr = (g.pagerank(max_iterations=200, tolerance=0.0)
              .to_pandas().set_index("vertex")["rank"])
        tr = (g.personalized_pagerank({0: 1.0}, max_iterations=200,
                                      tolerance=0.0)
              .to_pandas().set_index("vertex")["rank"])
    mass = (pr - tr) / pr
    assert mass[10] == 1.0 and mass[11] == 1.0
    assert mass[0] < 0.0  # the seed GAINS rank under the trusted reset
    assert all(mass[v] < 1.0 for v in (0, 1, 2, 3))
