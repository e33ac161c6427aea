"""cassovary_ray — a Ray-Data-native link-graph analytics engine.

A from-scratch reimplementation of the query/data-processing capabilities of
twitter/cassovary (reference at /root/reference, Scala/JVM, single-machine
in-memory CSR graphs) re-expressed Ray-Data-first:

- the graph is an **edge table** ``ray.data.Dataset`` with schema
  ``(src: int64, dst: int64)`` derived from a Common-Crawl-style pages table
  ``(url, warc_ts, html, text, lang)`` — urls hashed to stable int64 vertex
  ids (no global dense renumber; contrast the reference's
  ``util/SequentialNodeNumberer.scala``),
- iterative algorithms (PageRank, WCC, label propagation, HITS) run as
  streaming rounds of ``map_batches`` gather-scatter over zero-copy Arrow
  batches followed by a ``groupby(dst)`` shuffle that combines partial
  contributions (semantics cloned from
  ``algorithms/linkanalysis/LinkAnalysis.scala`` / ``PageRank.scala``),
- one-shot analytics (degrees, triangles, similarity, mutual edges) are pure
  Dataset pipelines (joins + groupbys + sort/limit).

Nothing here calls ``ray.init()`` — the caller (driver, bench.py, pytest
fixture) owns the Ray session.
"""

__version__ = "0.1.0"

from cassovary_ray.hashing import hash64, hash64_arrow, hash64_batch, splitmix64  # noqa: F401


def __getattr__(name):  # lazy re-exports; keep import light for workers
    public = {
        "ShardedGraph": ("cassovary_ray.engine", "ShardedGraph"),
        "build_edge_layout": ("cassovary_ray.layout", "build_edge_layout"),
        "pages_to_edges": ("cassovary_ray.extract", "pages_to_edges"),
        "pages_to_vertices": ("cassovary_ray.extract", "pages_to_vertices"),
        "NodeLabels": ("cassovary_ray.labels", "NodeLabels"),
        "flag_label": ("cassovary_ray.labels", "flag_label"),
        "MapNodeNumberer": ("cassovary_ray.numberer", "MapNodeNumberer"),
        "Limits": ("cassovary_ray.traversal", "Limits"),
        "dfs": ("cassovary_ray.traversal", "dfs"),
        "bfs_exact": ("cassovary_ray.traversal", "bfs_exact"),
        "DynamicDirectedGraph": ("cassovary_ray.dynamic", "DynamicDirectedGraph"),
        "BipartiteGraph": ("cassovary_ray.bipartite", "BipartiteGraph"),
        "decode_bmp": ("cassovary_ray.multimodal", "decode_bmp"),
        "encode_bmp": ("cassovary_ray.multimodal", "encode_bmp"),
        "decode_images": ("cassovary_ray.multimodal", "decode_images"),
        "decode_audio": ("cassovary_ray.multimodal", "decode_audio"),
        "VertexProgram": ("cassovary_ray.rounds", "VertexProgram"),
        "ShardCtx": ("cassovary_ray.rounds", "ShardCtx"),
        "MISProgram": ("cassovary_ray.rounds", "MISProgram"),
        "ColoringProgram": ("cassovary_ray.rounds", "ColoringProgram"),
        "broadcast_hash_join": ("cassovary_ray.joins", "broadcast_hash_join"),
        "shuffle_join": ("cassovary_ray.joins", "shuffle_join"),
        "InfoKeeper": ("cassovary_ray.tourist", "InfoKeeper"),
        "IntInfoKeeper": ("cassovary_ray.tourist", "IntInfoKeeper"),
        "BoolInfoKeeper": ("cassovary_ray.tourist", "BoolInfoKeeper"),
        "VisitsCounter": ("cassovary_ray.tourist", "VisitsCounter"),
        "PrevNbrCounter": ("cassovary_ray.tourist", "PrevNbrCounter"),
        "PathsCounter": ("cassovary_ray.tourist", "PathsCounter"),
        "image_ahash": ("cassovary_ray.multimodal", "image_ahash"),
        "lm_scores": ("cassovary_ray.textops", "lm_scores"),
        "hourly_anomalies": ("cassovary_ray.events", "hourly_anomalies"),
        "count_min_counts": ("cassovary_ray.events", "count_min_counts"),
        "crawl_frontier": ("cassovary_ray.extract", "crawl_frontier"),
        "canonicalize_urls": ("cassovary_ray.extract", "canonicalize_urls"),
        "url_dedup": ("cassovary_ray.extract", "url_dedup"),
        "train_quality_lr": ("cassovary_ray.learn", "train_quality_lr"),
    }
    if name in public:
        import importlib

        mod, attr = public[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(name)
