"""Pure, byte-deterministic HTML → (outlinks, text) extraction.

Cassovary has **no** web-page parser anywhere in the repo — it consumes
pre-built edge lists (SURVEY §2.1, last row). This stage is therefore new
surface whose contract comes from ``BASELINE.json`` ``input_hint``: the
extracted text must be *byte-identical per url* across runs and parallelism
levels. Both functions are pure functions of ``(url, html)`` — no locale, no
time, no randomness — and are pinned by golden fixtures in
``tests/test_extract.py``.

Implementation is stdlib-only (``re`` + ``html`` + ``urllib.parse``); the
regexes are compiled at module import, i.e. once per worker process, so the
``map_batches`` hot path does no setup work.
"""

from __future__ import annotations

import html as _htmllib
import re
from urllib.parse import urljoin, urlsplit, urlunsplit

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from cassovary_ray.hashing import hash64_arrow

from cassovary_ray import compat

# Ray 2.49 workarounds (see compat.py): empty-first-block hash-join schema
# broadcast, and Project skipping empty blocks (schema drift into joins).
# Installed here because this module issues Dataset.join calls.
compat.install()

# href capture: single-, double-, or un-quoted attribute values.
_HREF_RE = re.compile(
    rb"""<a\s[^>]*?href\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""",
    re.IGNORECASE | re.DOTALL,
)
# strip script/style bodies entirely, then all tags, then collapse whitespace
_SCRIPT_STYLE_RE = re.compile(
    rb"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_COMMENT_RE = re.compile(rb"<!--.*?-->", re.DOTALL)
_TAG_RE = re.compile(rb"<[^>]+>")
_WS_RE = re.compile(r"\s+")


def _resolve_href(url: str, href: str) -> str | None:
    """Resolve one cleaned href against ``url``; returns the normalized
    target or None for non-http(s) schemes. The single source of truth for
    link normalization (memoized variants must equal this exactly)."""
    target = urljoin(url, href)
    parts = urlsplit(target)
    if parts.scheme not in ("http", "https"):
        return None
    return urlunsplit((parts.scheme, parts.netloc, parts.path, parts.query, ""))


def extract_links(url: str, html: bytes, _memo: dict | None = None) -> list[str]:
    """All out-link urls of a page, resolved against ``url``, in document order.

    Deterministic normalization: fragment stripped, scheme/host lowercased by
    ``urlsplit`` round-trip; only http(s) targets kept; self-links preserved
    (self-loop policy is applied later, at edge-table normalization — mirrors
    the reference keeping parse and graph policy separate,
    ``util/io/ListOfEdgesGraphReader.scala:176-189``).

    ``_memo``: optional batch-scoped resolution cache (see
    :func:`extract_batch`). urljoin/urlsplit dominate extraction cost
    (~80% profiled), and web link targets are Zipf-hot, so memoizing
    resolution is a big win — but ONLY href forms whose resolution provably
    doesn't depend on the base PATH are cached: root-relative ``/x`` keyed
    by (scheme, netloc, href) and protocol-relative ``//host/x`` keyed by
    (scheme, href). Every other form (relative paths, absolute urls with
    uppercase schemes, ...) takes the uncached exact path, so output is
    byte-identical with or without the cache (pinned by the P-invariance
    golden tests)."""
    out: list[str] = []
    base_parts = None
    for m in _HREF_RE.finditer(html):
        raw = next(g for g in m.groups() if g is not None)
        try:
            href = raw.decode("utf-8", "strict")
        except UnicodeDecodeError:
            continue
        href = _htmllib.unescape(href).strip()
        if not href or href.startswith(("#", "javascript:", "mailto:")):
            continue
        if (href.startswith("/") and not href.startswith("//")
                and "./" not in href and ".." not in href
                and "\t" not in href and "\n" not in href
                and "\r" not in href):
            # FAST PATH for root-relative hrefs (the dominant web form;
            # urljoin+urlsplit dominate extraction cost). Provably equal to
            # _resolve_href here: "/p?q#f" against base (scheme, netloc)
            # resolves to scheme://netloc/p?q with the fragment dropped and
            # no dot-segment or scheme/netloc rewriting possible (dot forms
            # are excluded above and take the exact slow path).
            if base_parts is None:
                base_parts = urlsplit(url)
                base_ok = base_parts.scheme in ("http", "https")
            if not base_ok:
                continue
            h = href.split("#", 1)[0]
            # a trailing '?' is dropped only when it is the SOLE '?':
            # urlsplit gives query="" only then (query="?" for "a??" is
            # kept by urlunsplit — matching _resolve_href exactly)
            if h.endswith("?") and h.count("?") == 1:
                h = h[:-1]
            if _memo is not None:
                key = (base_parts.scheme, base_parts.netloc, h)
                target = _memo.get(key)
                if target is None:
                    target = f"{base_parts.scheme}://{base_parts.netloc}{h}"
                    _memo[key] = target
            else:
                target = f"{base_parts.scheme}://{base_parts.netloc}{h}"
        else:
            target = _resolve_href(url, href)
        if target is not None:
            out.append(target)
    return out


_MISS = object()


def extract_text(html: bytes) -> str:
    """Visible text of a page: drop script/style/comments/tags, unescape
    entities, collapse runs of whitespace to single spaces, strip ends."""
    body = _SCRIPT_STYLE_RE.sub(b" ", html)
    body = _COMMENT_RE.sub(b" ", body)
    body = _TAG_RE.sub(b" ", body)
    text = _htmllib.unescape(body.decode("utf-8", "replace"))
    return _WS_RE.sub(" ", text).strip()


def extract_batch_py(batch: pa.Table) -> pa.Table:
    """Pure-Python ``extract_links`` over every page of the batch — the
    semantic reference for :func:`extract_batch` (the vectorized kernel's
    differential tests compare against this) and the residue path for pages
    the vectorized pre-checks reject."""
    urls = batch["url"].to_pylist()
    htmls = batch["html"].to_pylist()
    src, dst = [], []
    memo: dict = {}  # batch-scoped href-resolution cache (bounded by batch)
    for u, h in zip(urls, htmls):
        for link in extract_links(u, h, _memo=memo):
            src.append(u)
            dst.append(link)
    return pa.table({"src_url": pa.array(src, pa.string()), "dst_url": pa.array(dst, pa.string())})


# -- vectorized link extraction (RE2 kernels over the whole batch) -----------
#
# pyarrow's regex kernels are RE2 and Python `re` over bytes is ASCII, but
# their \s classes differ (Python bytes \s includes \v=0x0b, RE2's does not),
# so every whitespace class below is spelled out as the explicit byte class
# [\t\n\x0b\f\r ] to match Python exactly. All patterns run on BINARY arrays.
_SEP_PAT = r"(?i)<a[\t\n\x0b\f\r ]"
# anchored per-segment href pull. Quotes are CAPTURED with the value so a
# participating quoted group is never empty — extract_regex returns "" (not
# null) for non-participating groups, which would otherwise be ambiguous
# with href="".
_SEG_HREF_PAT = (
    r"(?i)^[^>]*?href[\t\n\x0b\f\r ]*=[\t\n\x0b\f\r ]*"
    r"(?:(?P<dq>\"[^\"]*\")|(?P<sq>'[^']*')|(?P<uq>[^\t\n\x0b\f\r >]+))"
)
# a segment whose (potential) href VALUE runs to the segment's end was
# truncated by the NEXT `<a\s` separator — exactly the case where the
# split-scan can disagree with `_HREF_RE.finditer` (whose match span may
# cross the separator). Conservative: any such page takes the Python path.
_SEG_DANGLING_PAT = (
    r"(?i)^[^>]*?href[\t\n\x0b\f\r ]*=[\t\n\x0b\f\r ]*"
    r"(\"[^\"]*|'[^']*|[^\t\n\x0b\f\r >]*)$"
)
# base url fast form: scheme ALREADY lowercase (urlsplit lowercases it in
# the Python path, so uppercase-scheme pages must go there)
_BASE_PAT = r"^(?P<scheme>https?)://(?P<netloc>[^/?#]*)"
# values on which unescape+strip are provably identity: printable ASCII
# minus space (0x20) and '&' (0x26). Anything else → Python path.
_CLEAN_PAT = r"^[!-%'-~]*$"


def _npb(arr) -> np.ndarray:
    """Arrow boolean array → numpy bool with nulls as False."""
    return arr.fill_null(False).to_numpy(zero_copy_only=False)


def extract_batch(batch: pa.Table) -> pa.Table:
    """``map_batches`` kernel: pages batch → edge rows ``(src_url, dst_url)``.

    One output row per extracted link, in (page, document) order — byte- and
    order-identical to :func:`extract_batch_py` (differentially tested in
    ``tests/test_extract.py``). Vectorized scan: the html column is split on
    ``<a\\s`` with one RE2 pass, each segment's href is pulled with one
    anchored RE2 extract, and the two dominant href forms (root-relative and
    absolute-http(s)) resolve with pure Arrow string kernels. A page falls
    back to the exact Python scan iff any of its segments could diverge from
    ``_HREF_RE.finditer`` semantics (value truncated at the next separator),
    any href needs entity-unescaping/stripping (contains ``&``, whitespace,
    or non-printable/non-ASCII bytes), any href is a residue form (relative
    path, ``//host``, non-http scheme, ``;`` in an absolute url — the
    urljoin params quirk), or the page's own url is not a plain lowercase
    http(s) url.
    """
    urls = batch["url"].combine_chunks().cast(pa.string())
    htmls = batch["html"].combine_chunks().cast(pa.binary())
    n = len(urls)
    empty = pa.table({"src_url": pa.array([], pa.string()),
                      "dst_url": pa.array([], pa.string())})
    if n == 0:
        return empty

    segs_list = pc.split_pattern_regex(htmls, pattern=_SEP_PAT)
    counts = pc.list_value_length(segs_list).to_numpy().astype(np.int64)
    flat = pc.list_flatten(segs_list)
    total = len(flat)
    # drop each page's first segment (text before its first `<a\s`)
    first_idx = np.concatenate(([0], np.cumsum(counts)))[:-1]
    keep = np.ones(total, dtype=bool)
    keep[first_idx] = False
    seg_page = np.repeat(np.arange(n, dtype=np.int64), counts)[keep]
    segs = flat.filter(pa.array(keep))
    if len(segs) == 0:
        return empty

    m = pc.extract_regex(segs, _SEG_HREF_PAT)
    matched = pc.is_valid(m).to_numpy(zero_copy_only=False)
    dangling = _npb(pc.match_substring_regex(segs, _SEG_DANGLING_PAT))
    dq, sq, uq = (pc.struct_field(m, f) for f in ("dq", "sq", "uq"))
    raw = pc.if_else(
        pc.greater(pc.binary_length(dq), 0), pc.binary_slice(dq, 1, -1),
        pc.if_else(pc.greater(pc.binary_length(sq), 0),
                   pc.binary_slice(sq, 1, -1), uq))

    clean = _npb(pc.match_substring_regex(raw, _CLEAN_PAT))
    drop = _npb(pc.equal(pc.binary_length(raw), 0))
    for pref in ("#", "javascript:", "mailto:"):
        drop |= _npb(pc.starts_with(raw, pattern=pref))
    rootrel = (_npb(pc.starts_with(raw, pattern="/"))
               & ~_npb(pc.starts_with(raw, pattern="//"))
               & ~_npb(pc.match_substring(raw, pattern="./"))
               & ~_npb(pc.match_substring(raw, pattern=".."))
               & ~drop)
    absu = (_npb(pc.match_substring_regex(raw, r"^https?://"))
            & ~_npb(pc.match_substring(raw, pattern=";"))
            & ~drop & ~rootrel)

    seg_ok = ~dangling & (~matched | drop | ((rootrel | absu) & clean))
    page_fast = np.ones(n, dtype=bool)
    page_fast[seg_page[~seg_ok]] = False
    base = pc.extract_regex(urls, _BASE_PAT)
    base_ok = pc.is_valid(base).to_numpy(zero_copy_only=False)
    has_rr = np.zeros(n, dtype=bool)
    has_rr[seg_page[rootrel & clean]] = True
    page_fast &= base_ok | ~has_rr

    # fast-path rows, resolved with Arrow kernels
    seg_kept = (rootrel | absu) & clean & page_fast[seg_page]
    kidx = np.nonzero(seg_kept)[0]
    pg = seg_page[kidx]
    raw_k = raw.take(pa.array(kidx)).cast(pa.string())
    # urlsplit semantics: fragment = FIRST '#' onward (always dropped); a
    # trailing '?' is dropped only when it is the SOLE '?' (empty query —
    # urlunsplit re-emits "a?q?" verbatim but turns query="" into "a").
    # A bare `\?$` strip is WRONG on "a??" (caught by differential test).
    v = pc.replace_substring_regex(raw_k, pattern=r"(?s)#.*$", replacement="")
    v = pc.replace_substring_regex(v, pattern=r"^([^?]*)\?$", replacement=r"\1")
    prefix_pages = pc.binary_join_element_wise(
        pc.struct_field(base, "scheme"), pc.struct_field(base, "netloc"), "://")
    dst_fast = pc.if_else(
        pa.array(rootrel[kidx]),
        pc.binary_join_element_wise(prefix_pages.take(pa.array(pg)), v, ""),
        v)
    src_fast = urls.take(pa.array(pg))

    # residue pages through the exact Python scan
    bad = np.nonzero(~page_fast)[0]
    psrc: list[str] = []
    pdst: list[str] = []
    ppage: list[int] = []
    prank: list[int] = []
    if len(bad):
        memo: dict = {}
        u_py = urls.take(pa.array(bad)).to_pylist()
        h_py = htmls.take(pa.array(bad)).to_pylist()
        for bi, u, h in zip(bad, u_py, h_py):
            links = extract_links(u, h, _memo=memo)
            psrc.extend([u] * len(links))
            pdst.extend(links)
            ppage.extend([bi] * len(links))
            prank.extend(range(len(links)))
        if not len(kidx):
            return pa.table({"src_url": pa.array(psrc, pa.string()),
                             "dst_url": pa.array(pdst, pa.string())})

    if not len(ppage):
        return pa.table({"src_url": src_fast.cast(pa.string()),
                         "dst_url": dst_fast.cast(pa.string())})

    # merge, restoring (page, document-order) — a page is wholly fast or
    # wholly Python, so ranks only ever compare within one path
    all_page = np.concatenate([pg, np.asarray(ppage, dtype=np.int64)])
    all_rank = np.concatenate([kidx, np.asarray(prank, dtype=np.int64)])
    order = pa.array(np.lexsort((all_rank, all_page)))
    src_all = pa.concat_arrays([src_fast.cast(pa.string()),
                                pa.array(psrc, pa.string())]).take(order)
    dst_all = pa.concat_arrays([dst_fast.cast(pa.string()),
                                pa.array(pdst, pa.string())]).take(order)
    return pa.table({"src_url": src_all, "dst_url": dst_all})


def extract_text_batch(batch: pa.Table) -> pa.Table:
    """``map_batches`` kernel: pages batch → ``(url, text)`` with freshly
    extracted text (used by the byte-identity invariant tests and by
    re-extraction pipelines when the stored ``text`` column is absent)."""
    urls = batch["url"]
    texts = pa.array([extract_text(h) for h in batch["html"].to_pylist()], pa.string())
    return pa.table({"url": urls, "text": texts})


def hash_edges_batch(batch: pa.Table) -> pa.Table:
    """``(src_url, dst_url)`` → ``(src, dst)`` int64 vertex ids via the stable
    63-bit url hash (replaces ``NodeNumberer``, see ``cassovary_ray.hashing``).
    Dictionary-encoded so blake2b runs once per unique url in the batch."""
    src = hash64_arrow(batch["src_url"])
    dst = hash64_arrow(batch["dst_url"])
    return pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})


def pages_to_edge_urls(pages_ds):
    """Dataset(pages) → Dataset(src_url, dst_url)."""
    return pages_ds.map_batches(extract_batch, batch_format="pyarrow")


def pages_to_edges(pages_ds):
    """Dataset(pages) → Dataset(src:int64, dst:int64) — the engine's edge table."""
    return pages_to_edge_urls(pages_ds).map_batches(hash_edges_batch, batch_format="pyarrow")


# anchor capture: href (same value forms as _HREF_RE) + inner text up to the
# closing tag — anchors require a CLOSED <a>…</a>; bare <a href> tags still
# yield edges via extract_links but carry no anchor text
_ANCHOR_RE = re.compile(
    rb"""<a\s[^>]*?href\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))[^>]*>(.*?)</a\s*>""",
    re.IGNORECASE | re.DOTALL,
)


def extract_anchors(url: str, html: bytes) -> list[tuple[str, str]]:
    """``(dst_url, anchor_text)`` per closed ``<a href>…</a>`` in document
    order — target normalization identical to :func:`extract_links`, anchor
    text cleaned with the :func:`extract_text` pipeline (tags stripped,
    entities unescaped, whitespace collapsed). The inbound-anchor signal is
    a classic web ranking / training-data feature (anchor corpus)."""
    out: list[tuple[str, str]] = []
    for m in _ANCHOR_RE.finditer(html):
        raw = next(g for g in m.groups()[:3] if g is not None)
        try:
            href = raw.decode("utf-8", "strict")
        except UnicodeDecodeError:
            continue
        href = _htmllib.unescape(href).strip()
        if not href or href.startswith(("#", "javascript:", "mailto:")):
            continue
        target = urljoin(url, href)
        parts = urlsplit(target)
        if parts.scheme not in ("http", "https"):
            continue
        dst = urlunsplit((parts.scheme, parts.netloc, parts.path, parts.query, ""))
        body = _TAG_RE.sub(b" ", m.group(4))
        anchor = _WS_RE.sub(" ", _htmllib.unescape(body.decode("utf-8", "replace"))).strip()
        out.append((dst, anchor))
    return out


def anchor_batch_py(batch: pa.Table) -> pa.Table:
    """Reference ``map_batches`` kernel: the exact per-page Python scan
    (:func:`extract_anchors`), kept as the residue path and the
    differential-test oracle for :func:`anchor_batch`."""
    urls = batch["url"].to_pylist()
    htmls = batch["html"].to_pylist()
    src, dst, anc = [], [], []
    for u, h in zip(urls, htmls):
        for d, a in extract_anchors(u, h):
            src.append(u)
            dst.append(d)
            anc.append(a)
    return pa.table({"src_url": pa.array(src, pa.string()),
                     "dst_url": pa.array(dst, pa.string()),
                     "anchor": pa.array(anc, pa.string())})


# anchored per-segment FULL anchor pull: the _SEG_HREF_PAT value forms, the
# rest of the open tag, then the non-greedy body up to a closing </a>. All
# three pieces must land INSIDE the segment for the fast path — a close tag
# (or the open tag's '>') in a later segment means the Python regex's match
# span crosses the `<a\s` separator, swallowing segments the split-scan
# would misread as fresh anchors.
_SEG_ANCHOR_FULL_PAT = (
    r"(?i)^[^>]*?href[\t\n\x0b\f\r ]*=[\t\n\x0b\f\r ]*"
    r"(?:(?P<dq>\"[^\"]*\")|(?P<sq>'[^']*')|(?P<uq>[^\t\n\x0b\f\r >]+))"
    r"[^>]*>(?P<body>(?s:.*?))</a[\t\n\x0b\f\r ]*>"
)
# the open tag alone (href value + '>' in-segment) — open-but-not-full
# detects a body/close crossing the separator
_SEG_ANCHOR_OPEN_PAT = (
    r"(?i)^[^>]*?href[\t\n\x0b\f\r ]*=[\t\n\x0b\f\r ]*"
    r"(?:\"[^\"]*\"|'[^']*'|[^\t\n\x0b\f\r >]+)[^>]*>"
)
# bodies on which the Python cleaning chain (tag strip, utf-8 decode,
# entity unescape, Unicode-\s collapse, strip) reduces to the pure-ASCII
# collapse done vectorized below: printable ASCII + [\t\n\x0b\f\r ] minus
# '&' (0x26, unescape) and '<' (0x3c, tag strip)
_BODY_CLEAN_PAT = r"^[\t\n\x0b\f\r -%'-;=-~]*$"


def anchor_batch(batch: pa.Table) -> pa.Table:
    """``map_batches`` kernel: pages batch → ``(src_url, dst_url, anchor)``,
    one row per closed anchor tag, byte- and order-identical to
    :func:`anchor_batch_py` (differentially tested in ``test_extract.py``).

    Same split-scan design as :func:`extract_batch` (one RE2 split on
    ``<a\\s``, anchored per-segment RE2 pulls, Arrow-kernel resolution); a
    page falls back to the exact Python scan iff any segment could diverge
    from ``_ANCHOR_RE.finditer`` semantics — a dangling href value, an open
    tag or anchor body whose close lands in a later segment — or any KEPT
    anchor needs the non-ASCII cleaning chain (href outside the fast forms,
    body with tags/entities/non-ASCII), or the page url is not a plain
    lowercase http(s) base."""
    urls = batch["url"].combine_chunks().cast(pa.string())
    htmls = batch["html"].combine_chunks().cast(pa.binary())
    n = len(urls)
    empty = pa.table({"src_url": pa.array([], pa.string()),
                      "dst_url": pa.array([], pa.string()),
                      "anchor": pa.array([], pa.string())})
    if n == 0:
        return empty

    segs_list = pc.split_pattern_regex(htmls, pattern=_SEP_PAT)
    counts = pc.list_value_length(segs_list).to_numpy().astype(np.int64)
    flat = pc.list_flatten(segs_list)
    total = len(flat)
    first_idx = np.concatenate(([0], np.cumsum(counts)))[:-1]
    keep = np.ones(total, dtype=bool)
    keep[first_idx] = False
    seg_page = np.repeat(np.arange(n, dtype=np.int64), counts)[keep]
    segs = flat.filter(pa.array(keep))
    if len(segs) == 0:
        return empty

    href_m = pc.extract_regex(segs, _SEG_HREF_PAT)
    has_href = pc.is_valid(href_m).to_numpy(zero_copy_only=False)
    dangling = _npb(pc.match_substring_regex(segs, _SEG_DANGLING_PAT))
    opened = _npb(pc.match_substring_regex(segs, _SEG_ANCHOR_OPEN_PAT))
    full = pc.extract_regex(segs, _SEG_ANCHOR_FULL_PAT)
    has_full = pc.is_valid(full).to_numpy(zero_copy_only=False)

    dq, sq, uq = (pc.struct_field(full, f) for f in ("dq", "sq", "uq"))
    raw = pc.if_else(
        pc.greater(pc.binary_length(dq), 0), pc.binary_slice(dq, 1, -1),
        pc.if_else(pc.greater(pc.binary_length(sq), 0),
                   pc.binary_slice(sq, 1, -1), uq))
    body = pc.struct_field(full, "body")

    clean = _npb(pc.match_substring_regex(raw, _CLEAN_PAT))
    drop = _npb(pc.equal(pc.binary_length(raw), 0))
    for pref in ("#", "javascript:", "mailto:"):
        drop |= _npb(pc.starts_with(raw, pattern=pref))
    rootrel = (_npb(pc.starts_with(raw, pattern="/"))
               & ~_npb(pc.starts_with(raw, pattern="//"))
               & ~_npb(pc.match_substring(raw, pattern="./"))
               & ~_npb(pc.match_substring(raw, pattern=".."))
               & ~drop)
    absu = (_npb(pc.match_substring_regex(raw, r"^https?://"))
            & ~_npb(pc.match_substring(raw, pattern=";"))
            & ~drop & ~rootrel)
    body_clean = _npb(pc.match_substring_regex(body, _BODY_CLEAN_PAT))

    # a segment is safe iff nothing about it can diverge from finditer:
    # no dangling value, no open/close crossing the separator, and every
    # KEPT anchor within the fast href forms + ASCII body
    kept = has_full & ~drop
    seg_ok = (~dangling & (has_href == opened) & (opened == has_full)
              & (~kept | ((rootrel | absu) & clean & body_clean)))
    page_fast = np.ones(n, dtype=bool)
    page_fast[seg_page[~seg_ok]] = False
    base = pc.extract_regex(urls, _BASE_PAT)
    base_ok = pc.is_valid(base).to_numpy(zero_copy_only=False)
    has_rr = np.zeros(n, dtype=bool)
    has_rr[seg_page[rootrel & clean & has_full]] = True
    page_fast &= base_ok | ~has_rr

    # fast-path rows, resolved with Arrow kernels
    seg_kept = kept & page_fast[seg_page]
    kidx = np.nonzero(seg_kept)[0]
    pg = seg_page[kidx]
    raw_k = raw.take(pa.array(kidx)).cast(pa.string())
    v = pc.replace_substring_regex(raw_k, pattern=r"(?s)#.*$", replacement="")
    v = pc.replace_substring_regex(v, pattern=r"^([^?]*)\?$", replacement=r"\1")
    prefix_pages = pc.binary_join_element_wise(
        pc.struct_field(base, "scheme"), pc.struct_field(base, "netloc"), "://")
    dst_fast = pc.if_else(
        pa.array(rootrel[kidx]),
        pc.binary_join_element_wise(prefix_pages.take(pa.array(pg)), v, ""),
        v)
    src_fast = urls.take(pa.array(pg))
    body_k = body.take(pa.array(kidx)).cast(pa.string())
    anc_fast = pc.utf8_trim(pc.replace_substring_regex(
        body_k, pattern=r"[\t\n\x0b\f\r ]+", replacement=" "), " ")

    # residue pages through the exact Python scan
    bad = np.nonzero(~page_fast)[0]
    psrc: list[str] = []
    pdst: list[str] = []
    panc: list[str] = []
    ppage: list[int] = []
    prank: list[int] = []
    if len(bad):
        u_py = urls.take(pa.array(bad)).to_pylist()
        h_py = htmls.take(pa.array(bad)).to_pylist()
        for bi, u, h in zip(bad, u_py, h_py):
            anchors = extract_anchors(u, h)
            psrc.extend([u] * len(anchors))
            pdst.extend(a[0] for a in anchors)
            panc.extend(a[1] for a in anchors)
            ppage.extend([bi] * len(anchors))
            prank.extend(range(len(anchors)))
        if not len(kidx):
            return pa.table({"src_url": pa.array(psrc, pa.string()),
                             "dst_url": pa.array(pdst, pa.string()),
                             "anchor": pa.array(panc, pa.string())})

    if not len(ppage):
        return pa.table({"src_url": src_fast.cast(pa.string()),
                         "dst_url": dst_fast.cast(pa.string()),
                         "anchor": anc_fast.cast(pa.string())})

    all_page = np.concatenate([pg, np.asarray(ppage, dtype=np.int64)])
    all_rank = np.concatenate([kidx, np.asarray(prank, dtype=np.int64)])
    order = pa.array(np.lexsort((all_rank, all_page)))
    src_all = pa.concat_arrays([src_fast.cast(pa.string()),
                                pa.array(psrc, pa.string())]).take(order)
    dst_all = pa.concat_arrays([dst_fast.cast(pa.string()),
                                pa.array(pdst, pa.string())]).take(order)
    anc_all = pa.concat_arrays([anc_fast.cast(pa.string()),
                                pa.array(panc, pa.string())]).take(order)
    return pa.table({"src_url": src_all, "dst_url": dst_all,
                     "anchor": anc_all})


def pages_to_anchor_edges(pages_ds):
    """Dataset(pages) → ``(src_url, dst_url, anchor)`` — one row per closed
    anchor tag (vectorized split-scan, Python residue per page)."""
    return pages_ds.map_batches(anchor_batch, batch_format="pyarrow")


def anchor_texts(pages_ds):
    """Inbound anchor aggregation: ``(dst_url, anchor, n)`` — how many links
    point at each target with each exact anchor string (empty anchors
    dropped). Per-batch pre-combined pair counts, then the repo's sort +
    segment-fold sum (``analytics.sum_by_keys``) instead of a hash groupby
    — on string-pair keys the fold is 5× faster (measured: 51.6 s → 10.1 s
    on the 10M-anchor / 625k-page corpus at 16 CPUs)."""

    def partial(b: pa.Table) -> pa.Table:
        keep = pc.not_equal(b["anchor"], "")
        t = (b.filter(keep).select(["dst_url", "anchor"])
             .group_by(["dst_url", "anchor"]).aggregate([([], "count_all")]))
        return t.rename_columns(["dst_url", "anchor", "partial"])

    from cassovary_ray.analytics import sum_by_keys  # circular-safe local

    return sum_by_keys(
        pages_to_anchor_edges(pages_ds)
        .map_batches(partial, batch_format="pyarrow"),
        ["dst_url", "anchor"], "partial", alias="n")


# host extraction: RE2 both here (pyarrow uses RE2) and in DuckDB's
# regexp_extract, so the oracle semantics are identical by construction
_HOST_PATTERN = r"^https?://(?P<host>[^/?#]*)"


def host_edges(edge_urls_ds):
    """``(src_url, dst_url)`` → ``(src_host, dst_host)`` — one row per link,
    hosts pulled with an RE2 match (rows whose url doesn't parse as http(s)
    are dropped). Vectorized ``pc.extract_regex``, zero Python per row."""

    def kernel(b: pa.Table) -> pa.Table:
        sh = pc.extract_regex(b["src_url"], _HOST_PATTERN)
        dh = pc.extract_regex(b["dst_url"], _HOST_PATTERN)
        keep = pc.and_(pc.is_valid(sh), pc.is_valid(dh))
        return pa.table({
            "src_host": pc.struct_field(sh, "host").filter(keep),
            "dst_host": pc.struct_field(dh, "host").filter(keep),
        })

    return edge_urls_ds.map_batches(kernel, batch_format="pyarrow")


def host_graph(edge_urls_ds):
    """Collapse the page-level link graph to the host level:
    ``(src_host, dst_host, n_links)`` with per-batch pre-aggregated counts
    before the global groupby (the degree-combiner discipline) — the
    standard web-graph reduction feeding host-level PageRank
    (``hash_edges_batch`` + the engine consume its output directly)."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        t = b.group_by(["src_host", "dst_host"]).aggregate([([], "count_all")])
        return t.rename_columns(["src_host", "dst_host", "partial"])

    return (
        host_edges(edge_urls_ds)
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["src_host", "dst_host"])
        .aggregate(Sum("partial", alias_name="n_links"))
    )


def latest_capture(pages_ds):
    """Crawl-recency dedup: keep each url's row with the maximal
    ``warc_ts`` (Common-Crawl re-crawl convention — (url, warc_ts) is
    unique per archive, so this is one row per url). The timestamp rides as
    an epoch-µs int64 through one pruned groupby-max + one join-back
    (``analytics.latest_by_key``); html/text never enter an aggregate."""
    from cassovary_ray.analytics import latest_by_key

    with_us = pages_ds.map_batches(
        lambda b: b.append_column("_ts_us", b["warc_ts"].cast(pa.int64())),
        batch_format="pyarrow")
    return latest_by_key(with_us, "url", ["_ts_us"]).drop_columns(["_ts_us"])


def capture_delta(old_pages_ds, new_pages_ds):
    """Re-crawl delta: ``(url, status)`` with status ∈ {added, removed,
    changed, unchanged} comparing html md5 per url across two crawls
    (inputs deduped via :func:`latest_capture` first). Drives incremental
    re-extraction: only added/changed pages re-enter ``pages_to_edges``."""
    return capture_delta_from_latest(latest_capture(old_pages_ds),
                                     latest_capture(new_pages_ds))


def incremental_recrawl(layout_dir: str, old_pages_ds, new_pages_ds) -> dict:
    """End-to-end re-crawl maintenance: diff two crawls, re-extract ONLY
    added/changed pages, and apply the edge delta to a directed layout in
    place (:func:`cassovary_ray.layout.update_edge_layout`) — the
    incremental alternative to rebuilding a 10^12-page layout.

    Assumes the layout was built from ``pages_to_edges(latest_capture(old))``.
    Per-page replacement is exact for edges (a page's out-edges are exactly
    the rows with its url hash as src — removing the old page's link list
    and adding the new one reproduces a fresh build, link multiplicity
    included); the vertex universe grows monotonically (see
    ``update_edge_layout``). Returns the updated manifest."""
    from cassovary_ray.analytics import _auto_partitions, _join_safe
    from cassovary_ray.layout import update_edge_layout

    P = _auto_partitions(None)
    old_latest = latest_capture(old_pages_ds).materialize()
    new_latest = latest_capture(new_pages_ds).materialize()
    delta = _join_safe(capture_delta_from_latest(old_latest, new_latest), P)

    def urls_with(statuses):
        s = set(statuses)
        picked = delta.map_batches(
            lambda b, ss=tuple(sorted(s)): b.filter(
                pc.is_in(b["status"], value_set=pa.array(list(ss)))),
            batch_format="pyarrow",
        ).select_columns(["url"])
        return _join_safe(picked, P)

    def edges_of(pages, statuses):
        urls = urls_with(statuses)
        if urls.count() == 0:
            return None
        picked = _join_safe(pages, P).join(urls, "left_semi", P, on=("url",))
        return pages_to_edges(picked)

    removed = edges_of(old_latest, ("changed", "removed"))
    added = edges_of(new_latest, ("changed", "added"))
    return update_edge_layout(layout_dir, added_edges=added,
                              removed_edges=removed)


def capture_delta_from_latest(old_latest, new_latest):
    """:func:`capture_delta` body for inputs ALREADY deduped by
    :func:`latest_capture` (skips the redundant dedup pass)."""
    import hashlib

    from cassovary_ray.analytics import _auto_partitions, _join_safe

    P = _auto_partitions(None)

    def md5s(b: pa.Table) -> pa.Table:
        h = [hashlib.md5(x).hexdigest() for x in b["html"].to_pylist()]
        return pa.table({"url": b["url"], "h": pa.array(h, pa.string())})

    old = _join_safe(old_latest.map_batches(md5s, batch_format="pyarrow"), P)
    new = _join_safe(new_latest.map_batches(md5s, batch_format="pyarrow"), P)
    joined = old.join(new, "full_outer", P, on=("url",),
                      left_suffix="_old", right_suffix="_new")

    def classify(b: pa.Table) -> pa.Table:
        ho, hn = b["h_old"], b["h_new"]
        status = pc.if_else(
            pc.is_null(ho), pa.scalar("added"),
            pc.if_else(pc.is_null(hn), pa.scalar("removed"),
                       pc.if_else(pc.equal(ho, hn), pa.scalar("unchanged"),
                                  pa.scalar("changed"))))
        return pa.table({"url": b["url"], "status": status})

    return joined.map_batches(classify, batch_format="pyarrow")


def pages_to_vertices(pages_ds):
    """Dataset(pages) → Dataset(vertex:int64) — one row per page url.

    The vertex universe of a crawl is the set of *crawled* pages plus every
    link target; engine builds union this with edge endpoints (mirrors
    ``markEmptyNodes``/``createEmptyNodes``, ``ArrayBasedDirectedGraph.scala:225-281``).
    """

    def k(batch: pa.Table) -> pa.Table:
        v = hash64_arrow(batch["url"])
        return pa.table({"vertex": pa.array(v, pa.int64())})

    return pages_ds.map_batches(k, batch_format="pyarrow")


def crawl_frontier(edge_urls_ds, num_partitions: int = 16):
    """``(url, n_inlinks)`` — the crawl frontier: link targets not yet
    fetched, ranked by how many crawled pages point at them (the standard
    breadth-expansion priority of a web crawler; cf. the reference's
    GzipGraphDownloader ingest side, `util/io/GzipGraphDownloader.scala`,
    which consumes the OUTPUT of such a crawl).

    Scale shape: the crawled set is the distinct src side (page-count
    rows), candidates are one pre-combined ``groupby(dst_url)`` over the
    edge stream, and "not yet crawled" is a distributed hash anti-join —
    no driver set, no broadcast of the url universe."""
    from cassovary_ray.analytics import fold_by_keys  # circular-safe local
    from cassovary_ray.joins import shuffle_join

    cand = fold_by_keys(
        edge_urls_ds.select_columns(["dst_url"])
        .rename_columns({"dst_url": "url"}),
        ["url"], [("url", "count", "n_inlinks")])
    crawled = (
        edge_urls_ds.select_columns(["src_url"])
        .rename_columns({"src_url": "url"})
    )
    return shuffle_join(cand, crawled, on="url", how="anti",
                        num_partitions=num_partitions)


# URL canonicalization: a fixed chain of RE2 rewrites shared verbatim with
# the SQL oracle (pyarrow's replace_substring_regex and DuckDB's
# regexp_replace(..., 'g') are both RE2, so the transform is identical
# byte-for-byte). Order matters: fragments go first so `utm_[^&#]*` never
# swallows one; the ?utm→? bridge runs before the generic utm drop.
_URL_CANON_STEPS: tuple[tuple[str, str], ...] = (
    (r"#.*$", ""),                                  # drop fragment
    (r"&utm_[^&]*", ""),                            # drop non-leading utm_*
    (r"\?utm_[^&]*&", "?"),                         # ?utm_x=1&q=2 → ?q=2
    (r"\?utm_[^&]*$", ""),                          # ?utm_x=1 → (nothing)
    (r"^(http://[^/:?#]+):80(/|\?|$)", r"\1\2"),    # default http port only
    (r"^([a-z]+://[^?#]*[^/?#])/(\?|$)", r"\1\2"),  # trailing slash
)


def canonicalize_urls(urls_ds, url_col: str = "url"):
    """Append a ``canonical_url`` column: the input url with fragment,
    ``utm_*`` tracking params, default ``:80`` port and trailing slash
    removed (the crawl-dedup normalization; RFC 3986 §6 syntax-based
    normalization subset). Vectorized RE2 rewrites, zero Python per row."""

    def kernel(b: pa.Table) -> pa.Table:
        c = b[url_col]
        for pat, rep in _URL_CANON_STEPS:
            c = pc.replace_substring_regex(c, pat, rep)
        return b.append_column("canonical_url", c)

    return urls_ds.map_batches(kernel, batch_format="pyarrow")


def url_dedup(urls_ds, url_col: str = "url"):
    """Collapse url variants onto their canonical form:
    ``(canonical_url, n_variants, kept_url)`` — observation count and the
    lexicographically-smallest raw variant (the deterministic
    representative to fetch/keep). One groupby on the canonical key after
    the streaming canonicalization pass."""
    from ray.data.aggregate import Count, Min

    return (
        canonicalize_urls(urls_ds, url_col)
        .groupby("canonical_url")
        .aggregate(Count(alias_name="n_variants"),
                   Min(url_col, alias_name="kept_url"))
    )
