"""Extractor contract: pure, deterministic, byte-identical per url
(``BASELINE.json`` ``input_hint`` per-row invariant). The reference has no
extractor (SURVEY §2.1) — these goldens define the engine's own contract."""

from __future__ import annotations

import ray.data

from cassovary_ray.corpus import TOY_GRAPHS, pages_table_for_graph
from cassovary_ray.extract import (
    extract_links,
    extract_text,
    extract_text_batch,
    pages_to_edge_urls,
)


def test_extract_links_basic():
    html = (
        b'<html><body><a href="/2">two</a> <A HREF=\'https://other.test/x#frag\'>x</A>'
        b'<a href=rel>rel</a><a href="mailto:a@b">no</a>'
        b'<a href="javascript:void(0)">no</a><a href="ftp://f/">no</a></body></html>'
    )
    links = extract_links("https://ex.test/1", html)
    assert links == [
        "https://ex.test/2",
        "https://other.test/x",
        "https://ex.test/rel",
    ]


def test_extract_links_entities_and_unquoted():
    html = b'<a href="/a?x=1&amp;y=2">q</a><a href=/b>b</a>'
    assert extract_links("https://ex.test/", html) == [
        "https://ex.test/a?x=1&y=2",
        "https://ex.test/b",
    ]


def test_extract_text_strips_script_style_comments():
    html = (
        b"<html><head><script>var x=1;</script><style>p{}</style></head>"
        b"<body><!-- c --><h1>Hi&amp;lo</h1>\n<p>a  b</p></body></html>"
    )
    assert extract_text(html) == "Hi&lo a b"


def test_extract_text_golden_page():
    # Frozen golden: any change to this byte string is a breaking change to
    # the per-url byte-identity invariant and must be versioned.
    from cassovary_ray.corpus import _page_html

    html = _page_html(10, [11, 12])
    assert extract_text(html) == (
        "Node 10 Page for node 10 see node 11 . see node 12 . End of node 10."
    )


def test_text_column_matches_reextraction():
    """pages.text (written at synthesis) == extractor(html) for every url,
    through the distributed map_batches path."""
    tbl = pages_table_for_graph(TOY_GRAPHS["g6"])
    ds = ray.data.from_arrow(tbl)
    out = ds.map_batches(extract_text_batch, batch_format="pyarrow").to_pandas()
    expected = {u: t for u, t in zip(tbl["url"].to_pylist(), tbl["text"].to_pylist())}
    assert len(out) == len(expected)
    for u, t in zip(out["url"], out["text"]):
        assert t == expected[u]


def test_extraction_parallelism_invariance():
    """Same edge multiset at block counts 1 and 8 (north rule: byte-identical
    per url across parallelism levels)."""
    tbl = pages_table_for_graph(TOY_GRAPHS["g7"])
    one = pages_to_edge_urls(ray.data.from_arrow(tbl).repartition(1)).to_pandas()
    many = pages_to_edge_urls(ray.data.from_arrow(tbl).repartition(8)).to_pandas()
    key = lambda df: sorted(map(tuple, df[["src_url", "dst_url"]].values))
    assert key(one) == key(many)
