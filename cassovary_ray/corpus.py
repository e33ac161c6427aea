"""Deterministic synthetic corpus: toy graphs, random graphs, and a
Common-Crawl-style ``pages`` table whose html encodes a known link graph.

The reference ships canonical toy fixtures g1..g7 with explicit adjacency
(``cassovary-core/src/main/scala/com/twitter/cassovary/graph/TestGraph.scala:57-153``)
and seeded Erdős–Rényi generators (``TestGraph.scala:270-323``). We port the
adjacency maps verbatim (FIXTURES.md §3) and replace the sequential
``scala.util.Random`` generators with counter-based RNG
(:func:`cassovary_ray.hashing.counter_rng_uniform`) so that graph synthesis is
deterministic at any parallelism level.

The ``pages`` table matches ``BASELINE.json`` ``input_hint``:
``(url: string, warc_ts: timestamp[us], html: binary, text: string, lang: string)``.
Each page's html contains one ``<a href=...>`` per out-edge, so the extracted
edge table equals the chosen toy graph exactly (FIXTURES.md §1).
"""

from __future__ import annotations

import datetime
import os

import numpy as np
import pyarrow as pa

from cassovary_ray.hashing import counter_rng_uniform, hash64

# ---------------------------------------------------------------------------
# Toy graph fixtures — adjacency cloned from graph/TestGraph.scala (see lines
# cited per graph in FIXTURES.md §3). Keys are node ids, values out-neighbors.
# ---------------------------------------------------------------------------

TOY_GRAPHS: dict[str, dict[int, list[int]]] = {
    # TestGraph.scala:60-63 / :65-68
    "g2_mutual": {1: [2], 2: [1]},
    "g2_nonmutual": {1: [2], 2: []},
    # TestGraph.scala:81-85
    "g3": {10: [11, 12], 11: [12], 12: [11]},
    # TestGraph.scala:70-79 — chain with dangling end
    "g3_dangling": {0: [1], 1: [2], 2: []},
    # TestGraph.scala:87-93
    "g5": {10: [11, 12, 13], 11: [12], 12: [11], 13: [14], 14: []},
    # TestGraph.scala:115-122 — the main golden graph
    "g6": {10: [11, 12, 13], 11: [12, 14], 12: [14], 13: [12, 14], 14: [15], 15: [10, 11]},
    # TestGraph.scala:124-127 — g6 plus isolated nodes 0 and 1
    "g6_empty": {0: [], 1: [], 10: [11, 12, 13], 11: [12, 14], 12: [14],
                 13: [12, 14], 14: [15], 15: [10, 11]},
    # TestGraph.scala:95-113
    "dangling_g7": {1: [2], 2: [3, 4], 3: [], 4: [], 5: [6], 6: [1, 2, 7], 7: []},
    # TestGraph.scala:140-152
    "g7": {10: [11, 12, 13], 11: [10, 13, 14], 12: [13, 14], 13: [12, 14],
           14: [10, 11, 15], 15: [10, 11, 16], 16: [15]},
}


def complete_graph(n: int) -> dict[int, list[int]]:
    """Complete digraph on nodes 1..n — every node follows every other.

    Mirrors ``TestGraphs.generateCompleteGraph`` (``TestGraph.scala:238-245``);
    closed-form triangle count n(n-1)(n-2)/6 used for validation
    (``TriangleCountSpec.scala:75-88``).
    """
    return {i: [j for j in range(1, n + 1) if j != i] for i in range(1, n + 1)}


def er_graph(n: int, p: float, seed: int = 1, mutual: bool = False) -> dict[int, list[int]]:
    """Erdős–Rényi directed graph on nodes 0..n-1, edge prob p, no self-loops.

    Counter-RNG replacement for ``TestGraphs.generateRandomGraph``
    (``TestGraph.scala:270-281``) / ``generateRandomUndirectedGraph`` (:289-323):
    edge (i,j) present iff U(seed, i*n+j) < p, deterministic at any parallelism.
    When ``mutual`` both directions are added for each sampled unordered pair.
    """
    adj: dict[int, list[int]] = {i: [] for i in range(n)}
    if mutual:
        for i in range(n):
            js = np.arange(i + 1, n, dtype=np.int64)
            if len(js) == 0:
                continue
            u = counter_rng_uniform(seed, np.int64(i) * n + js, 0)
            for j in js[u < p]:
                adj[i].append(int(j))
                adj[int(j)].append(i)
    else:
        for i in range(n):
            js = np.arange(n, dtype=np.int64)
            js = js[js != i]
            u = counter_rng_uniform(seed, np.int64(i) * n + js, 0)
            adj[i] = [int(j) for j in js[u < p]]
    return adj


def graph_to_edges(adj: dict[int, list[int]]) -> pa.Table:
    """Adjacency map → edge table ``(src:int64, dst:int64)``.

    Nodes with no out-edges contribute no rows; they survive as dst-only or
    (for isolated nodes) must be carried via an explicit vertex table — same
    "implicit node" semantics as ``ArrayBasedDirectedGraph.markEmptyNodes``.
    """
    src, dst = [], []
    for u, nbrs in sorted(adj.items()):
        for v in nbrs:
            src.append(u)
            dst.append(v)
    return pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})


def graph_vertices(adj: dict[int, list[int]]) -> list[int]:
    verts = set(adj.keys())
    for nbrs in adj.values():
        verts.update(nbrs)
    return sorted(verts)


# ---------------------------------------------------------------------------
# Pages table synthesis (input_hint schema)
# ---------------------------------------------------------------------------

URL_PREFIX = "https://ex.test/"
_EPOCH = datetime.datetime(2024, 1, 1)

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def node_url(node_id: int) -> str:
    return f"{URL_PREFIX}{node_id}"


def node_vertex_id(node_id: int) -> int:
    """int64 vertex id of a toy node = hash64 of its fixture url."""
    return hash64(node_url(node_id))


def _page_html(node_id: int, nbrs: list[int]) -> bytes:
    links = "\n".join(f'<p>see <a href="/{v}">node {v}</a>.</p>' for v in nbrs)
    return (
        f"<html><head><title>Node {node_id}</title>"
        f"<script>var x = {node_id};</script>"
        f"<style>p {{ margin: 0 }}</style></head>\n"
        f"<body><h1>Page for node {node_id}</h1>\n{links}\n"
        f"<p>End of node {node_id}.</p></body></html>"
    ).encode("utf-8")


def pages_table_for_graph(adj: dict[int, list[int]]) -> pa.Table:
    """Synthesize a pages table whose extracted link graph equals ``adj``.

    Every vertex (including dst-only / isolated ones) gets a page so the
    vertex universe derived from pages equals ``graph_vertices(adj)``.
    Deterministic: fixed timestamps, html a pure function of (id, neighbors).
    """
    from cassovary_ray.extract import extract_text  # circular-safe local import

    rows = {"url": [], "warc_ts": [], "html": [], "text": [], "lang": []}
    for node in graph_vertices(adj):
        nbrs = adj.get(node, [])
        html = _page_html(node, nbrs)
        rows["url"].append(node_url(node))
        rows["warc_ts"].append(_EPOCH + datetime.timedelta(seconds=node))
        rows["html"].append(html)
        rows["text"].append(extract_text(html))
        rows["lang"].append("en")
    return pa.table(rows, schema=PAGES_SCHEMA)


def write_pages_parquet(path: str, adj: dict[int, list[int]]) -> None:
    import pyarrow.parquet as pq

    pq.write_table(pages_table_for_graph(adj), path)


# ---------------------------------------------------------------------------
# Scalable synthetic edge corpus for benchmarks (power-law web-ish graph)
# ---------------------------------------------------------------------------


def powerlaw_edge_batch(
    k: np.ndarray, n_vertices: int, seed: int, alpha: float = 0.7
) -> dict[str, np.ndarray]:
    """Edges with indices ``k`` of a deterministic power-law directed graph.

    Edge k: src uniform over vertices; dst drawn from an approximate Zipf by
    inverse-CDF ``floor(n * u^(1/(1-alpha)))`` truncated to [0, n) — so a few
    hub vertices receive a large share of in-edges, reproducing the web's
    in-degree skew (the skew case the engine's salting must handle, SURVEY §4).
    Pure function of (k, seed): any worker can generate any slice.
    """
    k = np.asarray(k, dtype=np.int64)
    u_src = counter_rng_uniform(seed, k, 0)
    u_dst = counter_rng_uniform(seed, k, 1)
    src = (u_src * n_vertices).astype(np.int64)
    dst = np.minimum(
        (n_vertices * np.power(u_dst, 1.0 / (1.0 - alpha))).astype(np.int64),
        n_vertices - 1,
    )
    # shift self-loops (same trick as TestGraph.scala:276-277's index shift)
    self_loop = src == dst
    dst[self_loop] = (dst[self_loop] + 1) % n_vertices
    return {"src": src, "dst": dst}


def build_powerlaw_layout_direct(
    n_edges: int, n_vertices: int, num_parts: int, layout_dir: str,
    seed: int = 42, alpha: float = 0.7,
) -> dict:
    """Bench fast path: write a power-law graph layout WITHOUT a shuffle.

    For the synthetic corpus the partition of every edge is known at
    generation time (edge k belongs to partition k mod P and its src is
    drawn from that partition's vertex residue class), and the vertex
    universe is 0..n_vertices-1 by construction — so each partition's
    edges+vertices parquet is generated and written by one independent Ray
    task. Statistically identical to :func:`powerlaw_edges_dataset` +
    :func:`cassovary_ray.layout.build_edge_layout` (src uniform, dst zipf),
    minus the build-time shuffle that real extracted corpora need (that path
    is exercised by the pages pipeline and its tests).
    """
    import json
    import shutil

    import ray

    from cassovary_ray.layout import MANIFEST_NAME

    for sub in ("edges", "vertices"):
        shutil.rmtree(os.path.join(layout_dir, sub), ignore_errors=True)
    os.makedirs(layout_dir, exist_ok=True)

    per_class = n_vertices // num_parts  # vertices p, p+P, p+2P, ...

    @ray.remote
    def write_part(p: int) -> int:
        import pyarrow as pa
        import pyarrow.parquet as pq

        k = np.arange(p, n_edges, num_parts, dtype=np.int64)
        u_src = counter_rng_uniform(seed, k, 0)
        u_dst = counter_rng_uniform(seed, k, 1)
        src = np.minimum((u_src * per_class).astype(np.int64), per_class - 1) * num_parts + p
        dst = np.minimum(
            (n_vertices * np.power(u_dst, 1.0 / (1.0 - alpha))).astype(np.int64),
            n_vertices - 1,
        )
        self_loop = src == dst
        dst[self_loop] = (dst[self_loop] + 1) % n_vertices
        ed = os.path.join(layout_dir, "edges", f"part={p}")
        vd = os.path.join(layout_dir, "vertices", f"part={p}")
        os.makedirs(ed, exist_ok=True)
        os.makedirs(vd, exist_ok=True)
        pq.write_table(
            pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}),
            os.path.join(ed, "data.parquet"),
        )
        pq.write_table(
            pa.table({"vertex": pa.array(np.arange(p, n_vertices, num_parts, dtype=np.int64), pa.int64())}),
            os.path.join(vd, "data.parquet"),
        )
        return len(src)

    counts = ray.get([write_part.remote(p) for p in range(num_parts)])
    manifest = {
        "num_parts": num_parts,
        "n_vertices": n_vertices,
        "n_edges": int(sum(counts)),
        "undirected": False,
        "dedup": False,
        "drop_self_loops": False,
        "reverse": False,
    }
    tmp = os.path.join(layout_dir, MANIFEST_NAME + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(layout_dir, MANIFEST_NAME))
    return manifest


def powerlaw_pages_batch(ids: np.ndarray, n_pages: int, *, links_per_page: int = 16,
                         filler_tokens: int = 120, seed: int = 42,
                         alpha: float = 0.7) -> pa.Table:
    """Pages-table rows (input_hint schema) for page ids ``ids`` of a
    deterministic Common-Crawl-shaped corpus: page ``i`` carries
    ``links_per_page`` out-links whose targets follow the same truncated-Zipf
    in-degree skew as :func:`powerlaw_edge_batch` (a few hub pages receive a
    large share of in-links), plus ``filler_tokens`` Zipf-vocabulary filler
    words so html/text sizes and compressibility are web-ish rather than
    degenerate. Pure function of (ids, seed): any worker generates any slice,
    and the stored ``text`` column is produced by running the REAL
    :func:`cassovary_ray.extract.extract_text` over the html — so the
    per-url byte-identity invariant holds by construction."""
    from cassovary_ray.extract import extract_text  # circular-safe

    ids = np.asarray(ids, dtype=np.int64)
    L = links_per_page
    # all link targets for the batch in one vectorized draw
    k = (ids[:, None] * L + np.arange(L)[None, :]).reshape(-1)
    u = counter_rng_uniform(seed, k, 2)
    tgt = np.minimum((n_pages * np.power(u, 1.0 / (1.0 - alpha))).astype(np.int64),
                     n_pages - 1).reshape(len(ids), L)
    # filler vocabulary draws (50k-word Zipf)
    kw = (ids[:, None] * filler_tokens + np.arange(filler_tokens)[None, :]).reshape(-1)
    uw = counter_rng_uniform(seed, kw, 3)
    words = np.minimum((50_000 * np.power(uw, 1.0 / (1.0 - 0.85))).astype(np.int64),
                       49_999).reshape(len(ids), filler_tokens)

    urls, tss, htmls, texts = [], [], [], []
    for row, pid in enumerate(ids):
        pid = int(pid)
        links = " ".join(f'<a href="/{t}">ref {t}</a>' for t in tgt[row])
        filler = " ".join(f"w{w}" for w in words[row])
        html = (
            f"<html><head><title>Page {pid}</title>"
            f"<script>var p = {pid};</script>"
            f"<style>a {{ color: blue }}</style></head>\n"
            f"<body><h1>Crawled page {pid}</h1>\n<p>{filler}</p>\n"
            f"<p>{links}</p>\n</body></html>"
        ).encode("utf-8")
        urls.append(f"{URL_PREFIX}{pid}")
        tss.append(_EPOCH + datetime.timedelta(seconds=pid % 86_400))
        htmls.append(html)
        texts.append(extract_text(html))
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(tss, pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(ids), pa.string()),
    }, schema=PAGES_SCHEMA)


def powerlaw_pages_dataset(n_pages: int, *, links_per_page: int = 16,
                           filler_tokens: int = 120, seed: int = 42,
                           alpha: float = 0.7):
    """Distributed deterministic pages-table generator → Dataset with the
    input_hint schema (url, warc_ts, html, text, lang). n_pages × links_per_page
    extracted edges; see :func:`powerlaw_pages_batch`."""
    import ray
    import ray.data

    def gen(batch: dict[str, np.ndarray]) -> pa.Table:
        return powerlaw_pages_batch(batch["id"], n_pages,
                                    links_per_page=links_per_page,
                                    filler_tokens=filler_tokens,
                                    seed=seed, alpha=alpha)

    blocks = max(16, int(ray.cluster_resources().get("CPU", 16)) * 2) \
        if ray.is_initialized() else 32
    return ray.data.range(n_pages, override_num_blocks=blocks).map_batches(
        gen, batch_format="numpy", batch_size=1 << 15)


def write_powerlaw_pages(out_dir: str, n_pages: int, **kwargs) -> str:
    """Materialize :func:`powerlaw_pages_dataset` as parquet under
    ``out_dir`` (idempotent: returns immediately if a _SUCCESS marker
    exists — bench runs reuse the corpus across invocations)."""
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    powerlaw_pages_dataset(n_pages, **kwargs).write_parquet(out_dir)
    with open(marker, "w") as f:
        f.write(str(n_pages))
    return out_dir


def powerlaw_edges_dataset(n_edges: int, n_vertices: int, seed: int = 42, alpha: float = 0.7):
    """Distributed deterministic generator → ``Dataset(src:int64, dst:int64)``."""
    import ray.data

    def gen(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        return powerlaw_edge_batch(batch["id"], n_vertices, seed, alpha)

    import ray

    blocks = max(16, int(ray.cluster_resources().get("CPU", 16)) * 2) if ray.is_initialized() else 32
    return (
        ray.data.range(n_edges, override_num_blocks=blocks)
        .map_batches(gen, batch_format="numpy", batch_size=1 << 21)
        .select_columns(["src", "dst"])
    )
