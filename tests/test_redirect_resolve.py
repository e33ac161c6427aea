"""web_redirect_resolve — pointer-doubling chain resolution. The synthetic
rule (v ≡ 0,1,2 mod 7 redirects to v+1) has the closed form
final(v) = v + (3 − v%7): a 3-hop chain must fully resolve in the 2
pinned doubling rounds (2 rounds cover length ≤ 4), pinning that the
composition R∘R actually doubles reach instead of walking one hop."""

import re

from cassovary_ray.queries import QUERIES

_ID = re.compile(r"/p/(\d+)$")


def test_chains_fully_resolved_closed_form():
    out = QUERIES["web_redirect_resolve"]("/root/testdata/sf0.001").to_pandas()
    assert len(out) > 0
    src = out.url.str.extract(_ID)[0].astype(int)
    dst = out.final_url.str.extract(_ID)[0].astype(int)
    assert ((src % 7) < 3).all()          # only redirecting urls emitted
    assert (dst == src + (3 - src % 7)).all()  # terminal of the full chain
    assert ((dst % 7) == 3).all()         # every target is a non-redirector
