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


# -- host-level graph collapse (extract.host_edges / host_graph) --------------


def test_host_edges_parsing_and_drops():
    import pyarrow as pa

    from cassovary_ray.extract import host_edges

    rows = [
        ("http://a.test/p/1", "https://b.test:8080/x?q=1"),
        ("https://A.test/q", "http://c.test"),          # host kept verbatim
        ("ftp://bad.test/f", "http://a.test/"),          # non-http src dropped
        ("http://a.test/p/2", "mailto:x@y"),             # non-http dst dropped
    ]
    ds = ray.data.from_arrow(pa.table({
        "src_url": [r[0] for r in rows],
        "dst_url": [r[1] for r in rows],
    }))
    got = set(map(tuple, host_edges(ds).to_pandas().values))
    assert got == {("a.test", "b.test:8080"), ("A.test", "c.test")}


def test_host_graph_counts_and_duckdb_parity():
    import duckdb
    import pandas as pd
    import pyarrow as pa

    from cassovary_ray.extract import host_graph

    urls = [
        ("http://a.test/1", "http://b.test/1"),
        ("http://a.test/2", "http://b.test/9"),
        ("http://a.test/3", "http://c.test/1"),
        ("http://b.test/1", "http://a.test/8"),
    ]
    ds = ray.data.from_arrow(pa.table({
        "src_url": [u[0] for u in urls],
        "dst_url": [u[1] for u in urls],
    }))
    got = host_graph(ds).to_pandas().sort_values(
        ["src_host", "dst_host"]).reset_index(drop=True)
    assert dict(zip(zip(got.src_host, got.dst_host), got.n_links)) == {
        ("a.test", "b.test"): 2, ("a.test", "c.test"): 1,
        ("b.test", "a.test"): 1}
    con = duckdb.connect()
    con.register("u", pd.DataFrame(urls, columns=["src_url", "dst_url"]))
    want = con.sql("""
        SELECT regexp_extract(src_url, '^https?://([^/?#]*)', 1) AS src_host,
               regexp_extract(dst_url, '^https?://([^/?#]*)', 1) AS dst_host,
               count(*) AS n_links FROM u GROUP BY 1, 2
        ORDER BY 1, 2""").df().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


# -- crawl recency (extract.latest_capture / capture_delta) -------------------


def _pages(rows):
    """rows: (url, ts_seconds, html bytes)"""
    import datetime

    import pyarrow as pa

    epoch = datetime.datetime(2020, 1, 1)
    return ray.data.from_arrow(pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "warc_ts": pa.array(
            [epoch + datetime.timedelta(seconds=r[1]) for r in rows],
            pa.timestamp("us")),
        "html": pa.array([r[2] for r in rows], pa.binary()),
        "text": pa.array(["" for _ in rows], pa.string()),
        "lang": pa.array(["en" for _ in rows], pa.string()),
    }))


def test_latest_capture_keeps_max_ts():
    from cassovary_ray.extract import latest_capture

    ds = _pages([
        ("http://a.test/", 10, b"v1"),
        ("http://a.test/", 30, b"v3"),
        ("http://a.test/", 20, b"v2"),
        ("http://b.test/", 5, b"only"),
    ])
    df = latest_capture(ds).to_pandas().sort_values("url")
    assert list(df.columns) == ["url", "warc_ts", "html", "text", "lang"]
    got = dict(zip(df.url, df.html))
    assert got == {"http://a.test/": b"v3", "http://b.test/": b"only"}


def test_capture_delta_statuses():
    from cassovary_ray.extract import capture_delta

    old = _pages([
        ("http://same.test/", 1, b"x"),
        ("http://chg.test/", 1, b"old"),
        ("http://gone.test/", 1, b"bye"),
        ("http://chg.test/", 0, b"older"),   # superseded within old crawl
    ])
    new = _pages([
        ("http://same.test/", 9, b"x"),
        ("http://chg.test/", 9, b"new"),
        ("http://fresh.test/", 9, b"hi"),
    ])
    df = capture_delta(old, new).to_pandas()
    got = dict(zip(df.url, df.status))
    assert got == {
        "http://same.test/": "unchanged",
        "http://chg.test/": "changed",
        "http://gone.test/": "removed",
        "http://fresh.test/": "added",
    }


# -- anchor text (extract.extract_anchors / anchor_texts) ---------------------


def test_extract_anchors_cleaning_and_drops():
    from cassovary_ray.extract import extract_anchors

    html = (b'<a href="/x">see <b>bold</b>\n  text</a>'
            b'<a href="mailto:z@y">mail</a>'
            b'<a href="/y"></a>'
            b"<a href='http://Other.TEST/p?q=1#frag'>other&amp;more</a>"
            b'<a href="/dangling">')  # unclosed: edge-only, no anchor
    got = extract_anchors("http://a.test/base", html)
    assert got == [
        ("http://a.test/x", "see bold text"),
        ("http://a.test/y", ""),
        # netloc case preserved — matches extract_links normalization
        ("http://Other.TEST/p?q=1", "other&more"),
    ]


def test_anchor_texts_aggregation():
    from cassovary_ray.extract import anchor_texts

    # toy graph g6: anchors are "node <dst>"; dst 12 has in-edges from 10, 13, 14
    tbl = pages_table_for_graph(TOY_GRAPHS["g6"])
    df = anchor_texts(ray.data.from_arrow(tbl)).to_pandas()
    from cassovary_ray.corpus import node_url

    row = df[(df.dst_url == node_url(12)) & (df.anchor == "node 12")]
    assert len(row) == 1 and int(row.n.iloc[0]) == 3
    # every aggregated anchor follows the synth pattern and counts match in-degree
    indeg = {}
    for u, vs in TOY_GRAPHS["g6"].items():
        for v in vs:
            indeg[v] = indeg.get(v, 0) + 1
    got = {(r.dst_url, r.anchor): int(r.n) for r in df.itertuples()}
    assert got == {(node_url(v), f"node {v}"): n for v, n in indeg.items()}


def test_fast_path_href_resolution_matches_urljoin():
    """The root-relative fast path in extract_links must be byte-identical
    to the uncached urljoin+urlsplit+urlunsplit pipeline across adversarial
    href forms (dot segments, queries, fragments, tabs, protocol-relative,
    non-http bases)."""
    import html as htmllib

    from cassovary_ray.extract import _resolve_href, extract_links

    bases = ["https://ex.test/a/b?q=1", "http://UP.Host/x",
             "https://u:p@h:8080/d/", "ftp://h/x"]
    hrefs = ["/1", "/", "/x?", "/x?a=1", "/x?a?b", "/x#f", "/x?a=1#f",
             "/a/./b", "/a/../b", "/..", "//other/x", "/x%20y", "/x\ty",
             "/TABLE", "/a//b", "/x;p", "/x?#", "/ x",
             # trailing '?' that is NOT the sole '?': urlsplit keeps
             # query="?"/"q?" so the strip must not fire (r4 latent-bug fix)
             "/x??", "/x???", "/x?q?", "/x??#f", "/x?q?#f", "/x?#?"]
    for b in bases:
        for h in hrefs:
            doc = f'<a href="{h}">x</a>'.encode()
            got = extract_links(b, doc, _memo={})
            want = _resolve_href(b, htmllib.unescape(h).strip())
            want = [want] if want is not None else []
            assert got == want, (b, h, got, want)


# -- vectorized extract_batch ≡ Python extract_batch_py -----------------------


def _diff_pages(pages):
    """pages: list[(url, html_bytes)] → assert vectorized == python kernel."""
    import pyarrow as pa

    from cassovary_ray.extract import extract_batch, extract_batch_py

    tbl = pa.table({
        "url": pa.array([p[0] for p in pages], pa.string()),
        "html": pa.array([p[1] for p in pages], pa.binary()),
    })
    fast = extract_batch(tbl)
    ref = extract_batch_py(tbl)
    assert fast.column("src_url").to_pylist() == ref.column("src_url").to_pylist()
    assert fast.column("dst_url").to_pylist() == ref.column("dst_url").to_pylist()


ADVERSARIAL_HTML = [
    # plain fast forms
    b'<a href="/1">a</a><a href=/2>b</a><a href=\'/3\'>c</a>',
    b'<a href="https://abs.test/x?q=1">abs</a>',
    # drops
    b'<a href="#f">x</a><a href="javascript:void(0)">x</a><a href="mailto:a@b">x</a>',
    b'<a href="">empty</a>',
    # residue forms -> python path
    b'<a href="rel/path">r</a><a href="../up">u</a><a href="./dot">d</a>',
    b'<a href="//proto.test/x">pr</a><a href="ftp://f/x">f</a>',
    b'<a href="HTTPS://UP.test/x">up</a>',
    b'<a href="http://x.test/y;p=1">semi</a>',
    b'<a href="http://x.test/y;">semi-trail</a>',
    # entities / whitespace / dirty bytes
    b'<a href="/a?x=1&amp;y=2">ent</a>',
    b'<a href="/a&b">amp</a>',
    b'<a href=" /lead">sp</a>',
    b'<a href="/tr ail">sp2</a>',
    b'<a href="/t\tab">tab</a>',
    b'<a href="/nl\n">nl</a>',
    '<a href="/unié">uni</a>'.encode(),
    b'<a href="/vert\x0btab">vt</a>',
    b'<a\x0bhref="/aftervt">vt2</a>',
    # pathological scan cases (separator inside value / dangling)
    b'<a href="x<a y">q</a>',
    b'<a href="a<a href=b>">q2</a>',
    b'<a href=x<a y>',
    b'<a href= <a x>',
    b'<a href=<a x>',
    b'<a href="unclosed',
    b'<a href=endsatend',
    b'<a href=',
    b'<a <a href=/nested>',
    b'<a x="<a" href=/attr>',
    b'<a href=/1 <a href=/2>',
    b'<a href=> href=/fallback>',
    b'<a href= href=/lazy>',
    # no-anchor / malformed
    b'no anchors at all',
    b'<ahref=/notag>',
    b'<a>bare</a>',
    b'<a href>no value</a>',
    # multiple + fragments + trailing ?
    b'<a href="/x?">tq</a><a href="/y#f">fr</a><a href="/z?#f">both</a>',
    b'<a href="http://abs.test/p?">aq</a><a href="http://abs.test/p#f">af</a>',
    # invalid utf-8 in href
    b'<a href="/bad\xff">bin</a>',
    # upper-case tag/attr
    b'<A HREF="/UP">u</A><a HrEf=/mix>m</a>',
]

ADVERSARIAL_BASES = [
    "https://ex.test/a/b?q=1",
    "http://site.test/p/123",
    "HTTP://UP.test/x",
    "ftp://h/x",
    "https://u:p@h:8080/d/",
    "weird",
]


def test_extract_batch_vectorized_matches_python_adversarial():
    pages = []
    for i, h in enumerate(ADVERSARIAL_HTML):
        for b in ADVERSARIAL_BASES:
            pages.append((b if i % 3 else b + f"/{i}", h))
    _diff_pages(pages)


def test_extract_batch_vectorized_matches_python_fuzz():
    """Deterministic fuzz: random token soup heavy on anchor/href/quote
    tokens, compared page-by-page against the Python scan."""
    import random

    rng = random.Random(1234)
    toks = ['<a ', '<A\t', 'href', '=', '"', "'", '>', '</a>', '/p', '&amp;',
            'x', ' ', 'http://t.test/q', '#f', '?q=1', '<a', 'HREF', '\x0b',
            '..', './', '//h/x', 'mailto:a', '\n', ';', '<', '>', 'é']
    pages = []
    for i in range(400):
        html = "".join(rng.choice(toks) for _ in range(rng.randrange(1, 40)))
        base = rng.choice(ADVERSARIAL_BASES)
        pages.append((f"{base}/{i}", html.encode()))
    _diff_pages(pages)


def test_extract_batch_vectorized_matches_python_corpus():
    """The bench corpus shape (root-relative hrefs) goes 100% fast-path and
    must still be identical."""
    import numpy as np

    from cassovary_ray.corpus import powerlaw_pages_batch

    tbl = powerlaw_pages_batch(np.arange(500), 500)
    _diff_pages(list(zip(tbl["url"].to_pylist(), tbl["html"].to_pylist())))


def test_extract_batch_trailing_query_marks():
    """Regression (r4): a trailing '?' is dropped only when it is the SOLE
    '?' — urlsplit("a??") has query="?" which urlunsplit keeps verbatim.
    Both the vectorized kernel and the Python fast path had a naive
    endswith('?') strip that agreed with each other while diverging from
    _resolve_href (the stated single source of truth); pin all three."""
    import pyarrow as pa

    from cassovary_ray.extract import (
        _resolve_href,
        extract_batch,
        extract_batch_py,
    )

    cases = ["a?#f", "a#f", "a?", "a??", "a?#", "a#", "a?q#f", "a#f?g",
             "a?x?y#z#w", "a???", "a?q?", "a??#f", "?x", "a#?", "a?#?",
             "a", "a?q", "a?q?r"]
    hrefs = [f"http://h.test/{c}" for c in cases] + [f"/{c}" for c in cases]
    base = "http://base.test/p"
    html = " ".join(f'<a href="{h}">x</a>' for h in hrefs).encode()
    truth = [r for h in hrefs if (r := _resolve_href(base, h)) is not None]
    tbl = pa.table({"url": [base], "html": [html]})
    got_vec = extract_batch(tbl)["dst_url"].to_pylist()
    got_py = extract_batch_py(tbl)["dst_url"].to_pylist()
    assert got_py == truth
    assert got_vec == truth


# -- vectorized anchor_batch ≡ Python anchor_batch_py -------------------------


def _diff_anchor_pages(pages):
    """pages: list[(url, html_bytes)] → assert vectorized == python kernel."""
    import pyarrow as pa

    from cassovary_ray.extract import anchor_batch, anchor_batch_py

    tbl = pa.table({
        "url": pa.array([p[0] for p in pages], pa.string()),
        "html": pa.array([p[1] for p in pages], pa.binary()),
    })
    fast = anchor_batch(tbl)
    ref = anchor_batch_py(tbl)
    for col in ("src_url", "dst_url", "anchor"):
        assert fast.column(col).to_pylist() == ref.column(col).to_pylist(), col


ANCHOR_BODY_HTML = [
    # clean fast bodies
    b'<a href="/1">plain text</a>',
    b'<a href="/1">  leading and   runs\t\n</a>',
    b'<a href="/1"></a>',
    b'<a href="/1">x</a  >',
    # body needs the cleaning chain -> python path
    b'<a href="/1">with <b>tags</b></a>',
    b'<a href="/1">ent &amp; ity</a>',
    '<a href="/1">unicodé</a>'.encode(),
    b'<a href="/1">nbsp\xc2\xa0body</a>',
    b'<a href="/1">ctrl\x1cbody</a>',
    # close tag crossing the separator (finditer swallows the inner <a)
    b'<a href="/out"><a href="/in">t</a></a>',
    b'<a href="/1">never closed',
    b'<a href="/1">closed later<a href="/2">x</a>',
    b'<a href="/1" <a nested attr>body</a>',
    # open tag's '>' in a later segment
    b'<a href=/1 <a href=/2>body</a>',
    # dropped anchors with dirty bodies stay fast
    b'<a href="#f">dirty <b>body</b> &amp;</a><a href="/keep">kept</a>',
    # mixed fast/drop/residue
    b'<a href="/a">A</a><a href="mailto:x">M</a><a href="rel">R</a>',
    b'<a HREF="/up">UP</a><A href=/mix>MIX</A>',
    # bare <a href> (no close anywhere) plus a following good anchor
    b'<a href="/solo"\n<a href="/good">g</a>',
]


def test_anchor_batch_vectorized_matches_python_adversarial():
    pages = []
    corpus = ANCHOR_BODY_HTML + ADVERSARIAL_HTML
    for i, h in enumerate(corpus):
        for b in ADVERSARIAL_BASES:
            pages.append((b if i % 3 else b + f"/{i}", h))
    _diff_anchor_pages(pages)


def test_anchor_batch_vectorized_matches_python_fuzz():
    import random

    rng = random.Random(4321)
    toks = ['<a ', '<A\t', 'href', '=', '"', "'", '>', '</a>', '</a >', '/p',
            '&amp;', 'body', ' ', 'http://t.test/q', '#f', '?q=1', '<a',
            'HREF', '\x0b', '..', './', '//h/x', 'mailto:a', '\n', ';', '<',
            '>', 'é', '<b>', '</b>', '</a', 'text']
    pages = []
    for i in range(400):
        html = "".join(rng.choice(toks) for _ in range(rng.randrange(1, 40)))
        base = rng.choice(ADVERSARIAL_BASES)
        pages.append((f"{base}/{i}", html.encode()))
    _diff_anchor_pages(pages)


def test_anchor_batch_fast_path_on_clean_corpus():
    """The synthetic corpus shape must take the fast path page-for-page
    (no divergence AND no Python residue — guarded by monkeypatching the
    residue scanner to fail loudly)."""
    import pyarrow as pa

    from cassovary_ray import extract

    pages = [(f"http://h{s % 7}.test/p/{s}",
              ("".join(f'<p><a href="/p/{d}">node {d} from {s}</a></p>'
                       for d in range(s, s + 3))).encode())
             for s in range(50)]
    tbl = pa.table({"url": pa.array([p[0] for p in pages]),
                    "html": pa.array([p[1] for p in pages], pa.binary())})
    ref = extract.anchor_batch_py(tbl)
    orig = extract.extract_anchors
    try:
        def boom(u, h):
            raise AssertionError("residue path taken on clean corpus")
        extract.extract_anchors = boom
        fast = extract.anchor_batch(tbl)
    finally:
        extract.extract_anchors = orig
    assert fast.to_pylist() == ref.to_pylist()
