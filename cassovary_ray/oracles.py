"""Generated DuckDB oracle SQL for the iterative link-analysis queries.

The driver's correctness gate runs each ``queries()`` entry AND its
``oracle_sql()`` string side-by-side and hash-compares the values.  Round 1
left the iterative algorithms (PageRank, WCC, LP, HITS, BFS) as rows-only
checks; this module closes that gap by *unrolling* a pinned number of
supersteps into chained CTEs (PageRank / LP / HITS) or expressing the exact
fixpoint with a recursive CTE (WCC / BFS).  Equivalence arguments:

- PageRank (``engine.pr_round``, semantics ``PageRank.scala:85-113``): the
  round update is ``r'(v) = (1-d)/n + d*dangle/n + d*sum_{u->v} r(u)/out(u)``
  with ``dangle = sum_{out(u)=0} r(u)`` from the PRE-round ranks.  The query
  pins ``max_iterations=10, tolerance=0.0`` so both sides run exactly 10
  rounds.  Floats: each side sums doubles in a different order, but the
  divergence is ~1e-15 relative per round — far below the driver's 9-dp
  value rounding.
- WCC (``engine.wcc_apply``): hash-min over an undirected layout converges
  to component = min vertex id reachable; the recursive CTE computes the
  same min over the exact transitive closure (integer-only, no float risk).
- Label propagation (``engine.lp_apply``, FIXTURES §4 rules): new label =
  mode of (neighbor labels over the dedup'd undirected edge set + one
  self-vote), ties -> smallest label.  The engine stops early at a fixpoint;
  running the unrolled 10 rounds through the fixpoint is a no-op, so a
  10-round unroll matches any early stop.  Integer-only.
- HITS (``engine.hits_*``, semantics ``Hits.scala:79-110``): per round
  ``auth_raw(v) = sum_{u->v} hub(u)``; ``hub_raw(u) = sum_{u->v}
  auth_raw(v)`` (note: RAW auth, pre-rescale); both rescaled by their global
  max; final L1 normalization.  Pinned iteration count.
- BFS (``analytics.bfs``, ``Traverser.scala:401-415`` DepthTracker): first
  visit depth = min path length; recursive CTE with depth < max_depth bound
  and a min-depth group-by.
- LSH kNN (``ann.lsh_knn``): the projection matrix is a pure function of
  (seed, n_planes, dim) (splitmix64), so its 512 doubles are embedded as SQL
  literals; bucket = packed sign bits of the plane dot products, candidates =
  rows whose bucket is in the queries' bucket set, ranked by exact cosine.
"""

from __future__ import annotations

import numpy as np

DAMPING = 0.85


def pagerank_sql(edges_cte: str, iterations: int = 10, damping: float = DAMPING) -> str:
    """Unrolled PageRank over the edge CTE; returns (vertex, rank)."""
    parts = [
        f"WITH e AS MATERIALIZED ({edges_cte})",
        "v AS MATERIALIZED (SELECT src AS vertex FROM e UNION SELECT dst FROM e)",
        "od AS MATERIALIZED (SELECT v.vertex, count(e2.src) AS outdeg"
        "      FROM v LEFT JOIN e e2 ON e2.src = v.vertex GROUP BY v.vertex)",
        "n AS (SELECT count(*) AS cnt FROM v)",
        "r0 AS MATERIALIZED (SELECT vertex, 1.0 / n.cnt AS rank FROM v, n)",
    ]
    for k in range(1, iterations + 1):
        p = k - 1
        parts.append(
            f"d{k} AS MATERIALIZED (SELECT coalesce(sum(r.rank), 0.0) AS dangle"
            f"        FROM r{p} r JOIN od ON od.vertex = r.vertex WHERE od.outdeg = 0)"
        )
        parts.append(
            f"c{k} AS MATERIALIZED (SELECT e.dst AS vertex, sum(p.rank / od.outdeg) AS contrib"
            f"        FROM e JOIN r{p} p ON p.vertex = e.src"
            f"        JOIN od ON od.vertex = e.src GROUP BY e.dst)"
        )
        parts.append(
            f"r{k} AS MATERIALIZED (SELECT v.vertex,"
            f"  (1.0 - {damping}) / n.cnt + {damping} * d{k}.dangle / n.cnt"
            f"  + {damping} * coalesce(c{k}.contrib, 0.0) AS rank"
            f"  FROM v CROSS JOIN n CROSS JOIN d{k}"
            f"  LEFT JOIN c{k} ON c{k}.vertex = v.vertex)"
        )
    return ",\n".join(parts) + f"\nSELECT vertex, rank FROM r{iterations}"


def katz_sql(edges_cte: str, iterations: int, alpha: float,
             beta: float) -> str:
    """Unrolled truncated Katz series (``ShardedGraph.katz``):
    x₀ = β; x_{k+1}(v) = β + α·Σ_{u→v} x_k(u). Returns (vertex, katz);
    float drift across summation orders is absorbed by the checker's 9-dp
    rounding (the ``pagerank_sql`` discipline)."""
    parts = [
        f"WITH e AS MATERIALIZED ({edges_cte})",
        "v AS MATERIALIZED (SELECT src AS vertex FROM e UNION SELECT dst FROM e)",
        f"x0 AS MATERIALIZED (SELECT vertex, CAST({beta!r} AS DOUBLE) AS x FROM v)",
    ]
    for k in range(1, iterations + 1):
        p = k - 1
        parts.append(
            f"c{k} AS MATERIALIZED (SELECT e.dst AS vertex, sum(p.x) AS contrib"
            f" FROM e JOIN x{p} p ON p.vertex = e.src GROUP BY e.dst)")
        parts.append(
            f"x{k} AS MATERIALIZED (SELECT v.vertex,"
            f" {beta!r} + {alpha!r} * coalesce(c{k}.contrib, 0.0) AS x"
            f" FROM v LEFT JOIN c{k} ON c{k}.vertex = v.vertex)")
    return ",\n".join(parts) + f"\nSELECT vertex, x AS katz FROM x{iterations}"


def eigenvector_sql(edges_cte: str, iterations: int) -> str:
    """Unrolled power iteration (``ShardedGraph.eigenvector_centrality``):
    x̂₀ ∝ 1; per round y = Aᵀx̂, x̂ = y/‖y‖₂. Returns (vertex, eig); float
    drift absorbed by the checker's 9-dp rounding (values are O(n^-1/2))."""
    parts = [
        f"WITH e AS MATERIALIZED ({edges_cte})",
        "v AS MATERIALIZED (SELECT src AS vertex FROM e UNION SELECT dst FROM e)",
        "x0 AS MATERIALIZED (SELECT vertex,"
        " 1.0 / sqrt((SELECT count(*) FROM v)) AS x FROM v)",
    ]
    for k in range(1, iterations + 1):
        p = k - 1
        parts.append(
            f"y{k} AS MATERIALIZED (SELECT v.vertex, coalesce(s.m, 0.0) AS y"
            f" FROM v LEFT JOIN (SELECT e.dst AS vertex, sum(p.x) AS m"
            f" FROM e JOIN x{p} p ON p.vertex = e.src GROUP BY 1) s"
            f" USING (vertex))")
        parts.append(
            f"n{k} AS (SELECT sqrt(sum(y * y)) AS nrm FROM y{k})")
        parts.append(
            f"x{k} AS MATERIALIZED (SELECT vertex, y / nrm AS x"
            f" FROM y{k}, n{k})")
    return ",\n".join(parts) + f"\nSELECT vertex, x AS eig FROM x{iterations}"


def pagerank_weighted_sql(edges_cte: str, iterations: int = 10,
                          damping: float = DAMPING) -> str:
    """Unrolled WEIGHTED PageRank: ``edges_cte`` yields (src, dst, w) with
    w > 0; a vertex's rank splits across out-edges proportionally to w.
    Returns (vertex, rank)."""
    parts = [
        f"WITH e AS MATERIALIZED ({edges_cte})",
        "v AS MATERIALIZED (SELECT src AS vertex FROM e UNION SELECT dst FROM e)",
        "od AS MATERIALIZED (SELECT v.vertex, count(e2.src) AS outdeg,"
        "      coalesce(sum(e2.w), 0.0) AS wout"
        "      FROM v LEFT JOIN e e2 ON e2.src = v.vertex GROUP BY v.vertex)",
        "n AS (SELECT count(*) AS cnt FROM v)",
        "r0 AS MATERIALIZED (SELECT vertex, 1.0 / n.cnt AS rank FROM v, n)",
    ]
    for k in range(1, iterations + 1):
        p = k - 1
        parts.append(
            f"d{k} AS MATERIALIZED (SELECT coalesce(sum(r.rank), 0.0) AS dangle"
            f"        FROM r{p} r JOIN od ON od.vertex = r.vertex WHERE od.outdeg = 0)"
        )
        parts.append(
            f"c{k} AS MATERIALIZED (SELECT e.dst AS vertex,"
            f"        sum(p.rank * e.w / od.wout) AS contrib"
            f"        FROM e JOIN r{p} p ON p.vertex = e.src"
            f"        JOIN od ON od.vertex = e.src GROUP BY e.dst)"
        )
        parts.append(
            f"r{k} AS MATERIALIZED (SELECT v.vertex,"
            f"  (1.0 - {damping}) / n.cnt + {damping} * d{k}.dangle / n.cnt"
            f"  + {damping} * coalesce(c{k}.contrib, 0.0) AS rank"
            f"  FROM v CROSS JOIN n CROSS JOIN d{k}"
            f"  LEFT JOIN c{k} ON c{k}.vertex = v.vertex)"
        )
    return ",\n".join(parts) + f"\nSELECT vertex, rank FROM r{iterations}"


def wcc_sql(edges_cte: str) -> str:
    """Exact WCC fixpoint: component = min vertex id in the weak component."""
    return f"""
        WITH RECURSIVE e AS ({edges_cte}),
        -- DISTINCT spelled out: see closeness_sql note on UNION semantics
        -- inside WITH RECURSIVE (duplicates would be harmless for min(),
        -- but double every recursion input)
        und AS (SELECT DISTINCT src, dst FROM
                (SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e)),
        reach(vertex, m) AS (
            SELECT src AS vertex, src AS m FROM und
            UNION
            SELECT dst AS vertex, dst AS m FROM und
            UNION
            SELECT und.dst AS vertex, reach.m
            FROM reach JOIN und ON und.src = reach.vertex
            WHERE reach.m < und.dst
        )
        SELECT vertex, min(m) AS component FROM reach GROUP BY vertex
    """


def label_propagation_sql(edges_cte: str, iterations: int = 10) -> str:
    """Unrolled synchronous LP (unseeded): start label = own id; per round
    new label = mode of (dedup'd-undirected-neighbor labels + self-vote),
    ties -> smallest label."""
    parts = [
        f"WITH e AS MATERIALIZED ({edges_cte})",
        "und AS MATERIALIZED (SELECT src, dst FROM e UNION SELECT dst, src FROM e)",
        "v AS MATERIALIZED (SELECT src AS vertex FROM e UNION SELECT dst FROM e)",
        "l0 AS MATERIALIZED (SELECT vertex, vertex AS label FROM v)",
    ]
    for k in range(1, iterations + 1):
        p = k - 1
        parts.append(
            f"l{k} AS MATERIALIZED (SELECT vertex, label FROM ("
            f"  SELECT vertex, label,"
            f"         row_number() OVER (PARTITION BY vertex"
            f"                            ORDER BY cnt DESC, label ASC) AS rn"
            f"  FROM (SELECT votes.vertex, votes.label, count(*) AS cnt FROM ("
            f"          SELECT und.dst AS vertex, prev.label"
            f"          FROM und JOIN l{p} prev ON prev.vertex = und.src"
            f"          UNION ALL SELECT vertex, label FROM l{p}"
            f"        ) votes GROUP BY 1, 2)"
            f") WHERE rn = 1)"
        )
    return ",\n".join(parts) + f"\nSELECT vertex, label FROM l{iterations}"


def ppr_sql(edges_cte: str, seeds: dict[int, float], iterations: int = 10,
            damping: float = DAMPING) -> str:
    """Unrolled exact Personalized PageRank (``engine.ppr_round``): reset AND
    dangling mass return to the normalized seed distribution; rank starts at
    the seed vector. Seed weights are embedded pre-normalized with full
    float64 repr so both sides iterate identical doubles."""
    total = float(sum(seeds.values()))
    rows = ", ".join(f"({v}, {float(w) / total!r})" for v, w in seeds.items())
    parts = [
        f"WITH e AS MATERIALIZED ({edges_cte})",
        "v AS MATERIALIZED (SELECT src AS vertex FROM e UNION SELECT dst FROM e)",
        "od AS MATERIALIZED (SELECT v.vertex, count(e2.src) AS outdeg"
        "      FROM v LEFT JOIN e e2 ON e2.src = v.vertex GROUP BY v.vertex)",
        f"sw(vertex, w) AS (VALUES {rows})",
        "s AS MATERIALIZED (SELECT v.vertex, coalesce(sw.w, 0.0) AS w"
        "      FROM v LEFT JOIN sw USING (vertex))",
        "r0 AS MATERIALIZED (SELECT vertex, w AS rank FROM s)",
    ]
    for k in range(1, iterations + 1):
        p = k - 1
        parts.append(
            f"d{k} AS MATERIALIZED (SELECT coalesce(sum(r.rank), 0.0) AS dangle"
            f"        FROM r{p} r JOIN od ON od.vertex = r.vertex WHERE od.outdeg = 0)"
        )
        parts.append(
            f"c{k} AS MATERIALIZED (SELECT e.dst AS vertex, sum(p.rank / od.outdeg) AS contrib"
            f"        FROM e JOIN r{p} p ON p.vertex = e.src"
            f"        JOIN od ON od.vertex = e.src GROUP BY e.dst)"
        )
        parts.append(
            f"r{k} AS MATERIALIZED (SELECT s.vertex,"
            f"  s.w * ((1.0 - {damping}) + {damping} * d{k}.dangle)"
            f"  + {damping} * coalesce(c{k}.contrib, 0.0) AS rank"
            f"  FROM s CROSS JOIN d{k}"
            f"  LEFT JOIN c{k} ON c{k}.vertex = s.vertex)"
        )
    return ",\n".join(parts) + f"\nSELECT vertex, rank FROM r{iterations}"


def local_clustering_sql(edges_cte: str) -> str:
    """Per-vertex exact triangle counts + local clustering coefficient over
    the undirected view (``analytics.local_triangle_counts``): each triangle
    {x < y < z} credits all three corners; lcc = 2·t / (deg·(deg−1)), 0 when
    deg < 2, with deg the dedup'd undirected degree."""
    return f"""
        WITH e AS ({edges_cte}),
        und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v FROM e),
        tri AS (SELECT a.u AS x, a.v AS y, b.v AS z
                FROM und a JOIN und b ON b.u = a.v
                           JOIN und c ON c.u = a.u AND c.v = b.v),
        tv AS (SELECT x AS vertex FROM tri UNION ALL SELECT y FROM tri
               UNION ALL SELECT z FROM tri),
        tc AS (SELECT vertex, count(*) AS t FROM tv GROUP BY 1),
        deg AS (SELECT vertex, count(*) AS d FROM
                (SELECT u AS vertex FROM und UNION ALL SELECT v FROM und)
                GROUP BY 1)
        SELECT deg.vertex, coalesce(tc.t, 0) AS triangles,
               CASE WHEN deg.d >= 2
                    THEN (2.0 * coalesce(tc.t, 0)) / (deg.d * (deg.d - 1.0))
                    ELSE 0.0 END AS lcc
        FROM deg LEFT JOIN tc USING (vertex)
    """


def _centroid_literal_rows(centroids) -> str:
    """VALUES rows ``(cid, [c_0, ...])`` for a literal centroid matrix."""
    return ", ".join(
        "(%d, [%s])" % (c, ", ".join(repr(float(x)) for x in centroids[c]))
        for c in range(len(centroids))
    )


def _ivf_search_sql(ct_rel: str, n_queries: int, k: int, nprobe: int) -> str:
    """Shared IVF search tail over centroid relation ``ct_rel(cid, c)`` and
    ``emb(vec_id, de)``: assign every vector to its max-inner-product
    centroid, probe each query's ``nprobe`` best cells, exact cosine top-k
    within the probed cells. Tie-breaks: lowest centroid id / lowest
    neighbor id (measure-zero for real-valued data)."""
    return f"""
        asg AS (SELECT emb.vec_id, ct.cid,
                       row_number() OVER (PARTITION BY emb.vec_id
                                          ORDER BY list_inner_product(emb.de, ct.c) DESC,
                                                   ct.cid) AS rn
                FROM emb CROSS JOIN {ct_rel} ct),
        assign AS (SELECT vec_id, cid FROM asg WHERE rn = 1),
        q AS (SELECT vec_id AS query_id, de AS qe FROM emb WHERE vec_id < {n_queries}),
        probe AS (SELECT q.query_id, ct.cid,
                         row_number() OVER (PARTITION BY q.query_id
                                            ORDER BY list_inner_product(q.qe, ct.c) DESC,
                                                     ct.cid) AS rn
                  FROM q CROSS JOIN {ct_rel} ct),
        wanted AS (SELECT DISTINCT cid FROM probe WHERE rn <= {nprobe}),
        cand AS (SELECT emb.vec_id, emb.de FROM emb
                 JOIN assign USING (vec_id)
                 WHERE assign.cid IN (SELECT cid FROM wanted)),
        sims AS (SELECT q.query_id, cand.vec_id AS neighbor_id,
                        list_cosine_similarity(q.qe, cand.de) AS sim
                 FROM q CROSS JOIN cand WHERE cand.vec_id <> q.query_id),
        r AS (SELECT query_id, neighbor_id,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY sim DESC, neighbor_id) AS rank
              FROM sims)
        SELECT query_id, neighbor_id, rank FROM r WHERE rank <= {k}
    """


def ivf_knn_sql(centroids: np.ndarray, n_queries: int, k: int, nprobe: int) -> str:
    """IVF-restricted kNN over ``embeddings``: every vector is assigned to
    its max-inner-product centroid (pre-normalized literals, so inner
    product = cosine ranking); queries probe their ``nprobe`` best
    centroids; exact cosine top-k within the probed cells. Tie-break on the
    centroid ranking is lowest centroid id (measure-zero for real data —
    same acceptance as the LSH sign bits)."""
    return f"""
        WITH ct(cid, c) AS (VALUES {_centroid_literal_rows(centroids)}),
        emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS de FROM embeddings),
        {_ivf_search_sql("ct", n_queries, k, nprobe)}
    """


def kmeans_ivf_knn_sql(init_centroids: np.ndarray, iters: int,
                       n_queries: int, k: int, nprobe: int) -> str:
    """``ann.kmeans_centroids`` + ``ann.ivf_knn(centroids=...)`` mirror:
    Lloyd spherical k-means unrolled from the literal init directions, then
    the shared IVF search tail over the trained centroids.

    Exactness stance (the knn_top5/knn_ivf acceptance, NOT the bit-exact
    hash-sketch one): per-cluster means are float sums whose reduction
    order differs between numpy and DuckDB by ~1e-15; that noise can only
    change the RESULT if it flips an assignment/probe argmax or a final
    top-k boundary — measure-zero for real-valued embeddings, and the final
    sims are exact cosines of the raw vectors (centroids only select the
    candidate cells). Per-iteration semantics mirror the engine exactly:
    assign = max inner product (ties -> lowest cid), empty clusters keep
    their previous centroid, non-empty means renormalized to unit length
    (norm 0 kept unnormalized)."""
    n_cent, dim = init_centroids.shape
    parts = [
        f"WITH ct0(cid, c) AS (VALUES {_centroid_literal_rows(init_centroids)})",
        "emb AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS de"
        " FROM embeddings)",
    ]
    for t in range(iters):
        mean_list = ", ".join(f"avg(de[{d + 1}])" for d in range(dim))
        parts.append(
            f"asg{t} AS (SELECT vec_id, de, cid FROM ("
            f" SELECT emb.vec_id, emb.de, ct.cid,"
            f" row_number() OVER (PARTITION BY emb.vec_id"
            f" ORDER BY list_inner_product(emb.de, ct.c) DESC, ct.cid) AS rn"
            f" FROM emb CROSS JOIN ct{t} ct) WHERE rn = 1)")
        parts.append(
            f"upd{t} AS (SELECT cid, [{mean_list}] AS mean"
            f" FROM asg{t} GROUP BY cid)")
        parts.append(
            f"nm{t} AS (SELECT cid, mean,"
            f" sqrt(list_inner_product(mean, mean)) AS nrm FROM upd{t})")
        parts.append(
            f"ct{t + 1}(cid, c) AS ("
            f" SELECT ct.cid, CASE WHEN nm.cid IS NULL THEN ct.c"
            f" WHEN nm.nrm > 0 THEN list_transform(nm.mean, x -> x / nm.nrm)"
            f" ELSE nm.mean END"
            f" FROM ct{t} ct LEFT JOIN nm{t} nm USING (cid))")
    return (",\n".join(parts) + ",\n"
            + _ivf_search_sql(f"ct{iters}", n_queries, k, nprobe))


def hits_sql(edges_cte: str, iterations: int = 8) -> str:
    """Unrolled HITS with max-rescale per round and final L1 normalization;
    returns (vertex, hubs, authorities) matching ``q_graph_hits``'s merge."""
    parts = [
        f"WITH e AS MATERIALIZED ({edges_cte})",
        "v AS MATERIALIZED (SELECT src AS vertex FROM e UNION SELECT dst FROM e)",
        "n AS (SELECT count(*) AS cnt FROM v)",
        "h0 AS MATERIALIZED (SELECT vertex, 1.0 / n.cnt AS hub FROM v, n)",
    ]
    for k in range(1, iterations + 1):
        p = k - 1
        parts.append(
            f"ar{k} AS MATERIALIZED (SELECT v.vertex, coalesce(s.x, 0.0) AS a FROM v LEFT JOIN ("
            f"  SELECT e.dst AS vertex, sum(h.hub) AS x FROM e"
            f"  JOIN h{p} h ON h.vertex = e.src GROUP BY e.dst) s USING (vertex))"
        )
        parts.append(
            f"hr{k} AS MATERIALIZED (SELECT v.vertex, coalesce(s.x, 0.0) AS h FROM v LEFT JOIN ("
            f"  SELECT e.src AS vertex, sum(a.a) AS x FROM e"
            f"  JOIN ar{k} a ON a.vertex = e.dst GROUP BY e.src) s USING (vertex))"
        )
        parts.append(f"hm{k} AS MATERIALIZED (SELECT max(h) AS m FROM hr{k})")
        parts.append(f"am{k} AS MATERIALIZED (SELECT max(a) AS m FROM ar{k})")
        parts.append(
            f"h{k} AS MATERIALIZED (SELECT vertex, CASE WHEN hm{k}.m > 0 THEN h / hm{k}.m"
            f"         ELSE h END AS hub FROM hr{k}, hm{k})"
        )
        parts.append(
            f"a{k} AS MATERIALIZED (SELECT vertex, CASE WHEN am{k}.m > 0 THEN a / am{k}.m"
            f"         ELSE a END AS auth FROM ar{k}, am{k})"
        )
    K = iterations
    parts.append(f"hsum AS (SELECT sum(hub) AS s FROM h{K})")
    parts.append(f"asum AS (SELECT sum(auth) AS s FROM a{K})")
    return ",\n".join(parts) + f"""
        SELECT v.vertex,
               CASE WHEN hsum.s > 0 THEN h.hub / hsum.s ELSE h.hub END AS hubs,
               CASE WHEN asum.s > 0 THEN a.auth / asum.s ELSE a.auth END AS authorities
        FROM v JOIN h{K} h USING (vertex) JOIN a{K} a USING (vertex),
             hsum, asum
    """


def salsa_sql(edges_cte: str, iterations: int = 8) -> str:
    """Unrolled SALSA (see ``engine.GraphShard`` SALSA block): per round
    hub(j) = Σ auth(i)/indeg(i) over in-edges, auth(i) = Σ hub(j)/outdeg(j)
    over out-edges, each vector L1-normalized per half-step. Returns
    (vertex, hubs, authorities) after ``iterations`` rounds."""
    parts = [
        f"WITH e AS MATERIALIZED ({edges_cte})",
        "v AS MATERIALIZED (SELECT src AS vertex FROM e UNION SELECT dst FROM e)",
        "od AS MATERIALIZED (SELECT src AS vertex, count(*) AS outdeg FROM e GROUP BY 1)",
        "idg AS MATERIALIZED (SELECT dst AS vertex, count(*) AS indeg FROM e GROUP BY 1)",
        "n AS (SELECT count(*) AS cnt FROM v)",
        "a0 AS MATERIALIZED (SELECT vertex, 1.0 / n.cnt AS a FROM v, n)",
    ]
    for k in range(1, iterations + 1):
        p = k - 1
        parts.append(
            f"hraw{k} AS MATERIALIZED (SELECT e.src AS vertex,"
            f"  sum(a.a / idg.indeg) AS h"
            f"  FROM e JOIN a{p} a ON a.vertex = e.dst"
            f"  JOIN idg ON idg.vertex = e.dst GROUP BY e.src)"
        )
        parts.append(
            f"h{k} AS MATERIALIZED (SELECT v.vertex,"
            f"  coalesce(hr.h, 0.0) / nullif((SELECT sum(h) FROM hraw{k}), 0.0) AS h"
            f"  FROM v LEFT JOIN hraw{k} hr ON hr.vertex = v.vertex)"
        )
        parts.append(
            f"araw{k} AS MATERIALIZED (SELECT e.dst AS vertex,"
            f"  sum(h.h / od.outdeg) AS a"
            f"  FROM e JOIN h{k} h ON h.vertex = e.src"
            f"  JOIN od ON od.vertex = e.src GROUP BY e.dst)"
        )
        parts.append(
            f"a{k} AS MATERIALIZED (SELECT v.vertex,"
            f"  coalesce(ar.a, 0.0) / nullif((SELECT sum(a) FROM araw{k}), 0.0) AS a"
            f"  FROM v LEFT JOIN araw{k} ar ON ar.vertex = v.vertex)"
        )
    k = iterations
    return (",\n".join(parts)
            + f"\nSELECT h.vertex, h.h AS hubs, a.a AS authorities"
            f"\nFROM h{k} h JOIN a{k} a ON a.vertex = h.vertex")


def bfs_sql(edges_cte: str, source: int, max_depth: int) -> str:
    """Single-source BFS first-visit depths, depth <= max_depth."""
    return f"""
        WITH RECURSIVE e AS ({edges_cte}),
        reach(vertex, depth) AS (
            SELECT CAST({source} AS BIGINT) AS vertex, CAST(0 AS BIGINT) AS depth
            UNION
            SELECT e.dst, reach.depth + 1
            FROM reach JOIN e ON e.src = reach.vertex
            WHERE reach.depth < {max_depth}
        )
        SELECT vertex, min(depth) AS depth FROM reach GROUP BY vertex
    """


def closeness_sql(edges_cte: str, sources: list[int], max_depth: int | None = None,
                  normalized: bool = True) -> str:
    """Multi-source closeness over out-edge BFS distances, matching
    ``analytics.closeness_centrality`` (``ClosenessCentrality`` semantics:
    normalized score = (reachable-1)^2 / ((n-1) * sum_depths))."""
    src_rows = ", ".join(f"({s})" for s in sources)
    depth_bound = f"WHERE reach.depth < {max_depth}" if max_depth is not None else ""
    if normalized:
        score = ("CASE WHEN dsum > 0 AND n.cnt > 1 THEN"
                 " CAST(reachable - 1 AS DOUBLE) * (reachable - 1)"
                 " / ((n.cnt - 1) * dsum) ELSE 0.0 END")
    else:
        score = ("CASE WHEN dsum > 0 AND n.cnt > 1 THEN"
                 " CAST(reachable - 1 AS DOUBLE) / dsum ELSE 0.0 END")
    return f"""
        WITH RECURSIVE e AS ({edges_cte}),
        -- explicit DISTINCT: inside WITH RECURSIVE DuckDB 1.0 gives a
        -- plain UNION in a non-recursive CTE UNION ALL semantics
        v AS (SELECT DISTINCT vertex FROM
              (SELECT src AS vertex FROM e UNION ALL SELECT dst FROM e)),
        n AS (SELECT count(*) AS cnt FROM v),
        s(vertex) AS (VALUES {src_rows}),
        reach(source, vertex, depth) AS (
            SELECT CAST(vertex AS BIGINT), CAST(vertex AS BIGINT),
                   CAST(0 AS BIGINT) FROM s
            UNION
            SELECT reach.source, e.dst, reach.depth + 1
            FROM reach JOIN e ON e.src = reach.vertex
            {depth_bound}
        ),
        dist AS (SELECT source, vertex, min(depth) AS d FROM reach GROUP BY 1, 2),
        agg AS (SELECT source AS vertex, count(*) AS reachable,
                       CAST(sum(d) AS DOUBLE) AS dsum
                FROM dist GROUP BY 1)
        SELECT agg.vertex, {score} AS closeness FROM agg, n
    """


def lsh_knn_sql(planes: np.ndarray, n_queries: int, k: int) -> str:
    """LSH-restricted kNN over the ``embeddings`` view: bucket = packed sign
    bits of the literal plane dot products (planes embedded with full
    round-trip float64 repr so both sides compute identical doubles)."""
    n_planes, _dim = planes.shape
    rows = ", ".join(
        "(%d, [%s])" % (b, ", ".join(repr(float(x)) for x in planes[b]))
        for b in range(n_planes)
    )
    return f"""
        WITH pl(b, p) AS (VALUES {rows}),
        emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS de FROM embeddings),
        codes AS (
            SELECT emb.vec_id,
                   CAST(sum(CASE WHEN list_inner_product(emb.de, pl.p) > 0
                                 THEN (1::BIGINT << pl.b) ELSE 0 END) AS BIGINT) AS bucket
            FROM emb CROSS JOIN pl GROUP BY emb.vec_id
        ),
        q AS (SELECT vec_id AS query_id, de AS qe FROM emb WHERE vec_id < {n_queries}),
        wanted AS (SELECT DISTINCT bucket FROM codes
                   WHERE vec_id IN (SELECT query_id FROM q)),
        cand AS (SELECT emb.vec_id, emb.de FROM emb
                 JOIN codes ON codes.vec_id = emb.vec_id
                 WHERE codes.bucket IN (SELECT bucket FROM wanted)),
        sims AS (SELECT q.query_id, cand.vec_id AS neighbor_id,
                        list_cosine_similarity(q.qe, cand.de) AS sim
                 FROM q CROSS JOIN cand WHERE cand.vec_id <> q.query_id),
        r AS (SELECT query_id, neighbor_id,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY sim DESC, neighbor_id) AS rank
              FROM sims)
        SELECT query_id, neighbor_id, rank FROM r WHERE rank <= {k}
    """


def ngram_jaccard_sql(n: int = 3, max_df: int = 50, threshold: float = 0.5) -> str:
    """Exact n-gram-Jaccard near-dup pairs over ``documents``: distinct
    whitespace-token n-gram shingles per doc, shingles with document
    frequency > max_df dropped (the df-cut skew guard both sides share),
    jaccard = |A∩B| / (|A|+|B|-|A∩B|) over the kept shingle universe."""
    return rf"""
        WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
                      FROM documents),
        sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+{n - 1}], ' ') AS s
               FROM toks, unnest(generate_series(1, len(t) - {n - 1})) AS u(i)),
        kept AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= {max_df}),
        ksh AS (SELECT sh.doc_id, sh.s FROM sh JOIN kept USING (s)),
        sizes AS (SELECT doc_id, count(*) AS sz FROM ksh GROUP BY 1),
        inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS common
                  FROM ksh x JOIN ksh y ON x.s = y.s AND x.doc_id < y.doc_id
                  GROUP BY 1, 2),
        scored AS (SELECT inter.a, inter.b,
                          CAST(common AS DOUBLE) / (sa.sz + sb.sz - common) AS jaccard
                   FROM inter JOIN sizes sa ON sa.doc_id = inter.a
                              JOIN sizes sb ON sb.doc_id = inter.b)
        SELECT a, b, jaccard FROM scored WHERE jaccard >= {threshold}
    """


def bipartite_sql(edges_cte: str, n_lefts: int = 20, reset_left: float = 0.1,
                  reset_right: float = 0.1, k: int = 2,
                  lefts_cte: str | None = None) -> str:
    """Two-iteration bipartite alternating flow (``bipartite.iterative_link_
    analysis`` / ``engine.bipartite_link_analysis``, semantics
    ``IterativeLinkAnalyzer.scala:36-184``): supplied lefts = the ``n_lefts``
    smallest distinct srcs with weight 1.0, induced-subgraph degrees, pass 1
    left→right with reset_prob_right on rights (base 0), pass 2 right→left
    with reset_prob_left (base = reset·w0 for every supplied left).
    Contributors (both sides — passes 1 and 2 are the last two) are the
    top-``k`` sources by contributed share desc / src asc, emitted as the
    same comma-joined string the query side produces. Per-edge shares are
    identical doubles on both sides ((w/deg)·(1−reset), same literal
    association); only the summed weights differ at ~1e-16 — below the
    driver's 9-dp rounding.

    ``lefts_cte``: optional SQL yielding ``(vertex, w0)`` to seed the left
    side (e.g. a PPR circle of trust for WTF-style personalized SALSA);
    defaults to the ``n_lefts`` smallest distinct srcs at weight 1.0."""
    linit = lefts_cte if lefts_cte is not None else (
        f"SELECT vertex, 1.0 AS w0 FROM ("
        f"SELECT DISTINCT src AS vertex FROM ea ORDER BY vertex LIMIT {n_lefts})")
    return f"""
        WITH ea AS MATERIALIZED ({edges_cte}),
        linit AS MATERIALIZED ({linit}),
        e AS MATERIALIZED (
            SELECT ea.src, ea.dst FROM ea JOIN linit ON linit.vertex = ea.src),
        ldeg AS MATERIALIZED (SELECT src, count(*) AS c FROM e GROUP BY 1),
        rdeg AS MATERIALIZED (SELECT dst, count(*) AS c FROM e GROUP BY 1),
        f1 AS MATERIALIZED (
            SELECT e.src, e.dst, linit.w0 / ldeg.c * (1.0 - {reset_right}) AS share
            FROM e JOIN linit ON linit.vertex = e.src JOIN ldeg ON ldeg.src = e.src),
        rw AS MATERIALIZED (SELECT dst, sum(share) AS weight FROM f1 GROUP BY 1),
        rc AS (SELECT dst, string_agg(CAST(src AS VARCHAR), ','
                                      ORDER BY share_q DESC, src ASC) AS contributors
               FROM (SELECT dst, src, share_q,
                            row_number() OVER (PARTITION BY dst
                                               ORDER BY share_q DESC, src ASC) AS rn
                     FROM (SELECT dst, src,
                                  CAST(floor(share * 1000000000.0) AS BIGINT)
                                    AS share_q FROM f1))
               WHERE rn <= {k} GROUP BY dst),
        f2 AS MATERIALIZED (
            SELECT e.dst AS s, e.src AS d, rw.weight / rdeg.c * (1.0 - {reset_left}) AS share
            FROM e JOIN rw ON rw.dst = e.dst JOIN rdeg ON rdeg.dst = e.dst),
        lsum AS (SELECT d, sum(share) AS ws FROM f2 GROUP BY 1),
        lw AS (SELECT linit.vertex, {reset_left} * linit.w0 + coalesce(lsum.ws, 0.0) AS weight
               FROM linit LEFT JOIN lsum ON lsum.d = linit.vertex),
        lc AS (SELECT d, string_agg(CAST(s AS VARCHAR), ','
                                    ORDER BY share_q DESC, s ASC) AS contributors
               FROM (SELECT d, s, share_q,
                            row_number() OVER (PARTITION BY d
                                               ORDER BY share_q DESC, s ASC) AS rn
                     FROM (SELECT d, s,
                                  CAST(floor(share * 1000000000.0) AS BIGINT)
                                    AS share_q FROM f2))
               WHERE rn <= {k} GROUP BY d)
        SELECT lw.vertex, lw.weight, coalesce(lc.contributors, '') AS contributors,
               'left' AS side
        FROM lw LEFT JOIN lc ON lc.d = lw.vertex
        UNION ALL
        SELECT rw.dst AS vertex, rw.weight, coalesce(rc.contributors, '') AS contributors,
               'right' AS side
        FROM rw LEFT JOIN rc ON rc.dst = rw.dst
    """


def skipgram_negatives_sql(edges_cte: str, walks_per_vertex: int,
                           walk_length: int, corpus_seed: int, window: int,
                           k: int, retries: int, seed: int) -> str:
    """``textops.skipgram_negatives`` mirror over the deterministic
    DeepWalk pair table: candidate (j, r) for pair (c, x) is
    ``splitmix64(splitmix64(c ⊕ L(j,r)) ⊕ x) mod (max_vertex + 1)`` with
    L a Python-side literal of (seed, j, r); selection = first probe
    landing on a real vertex ≠ c, x, via MIN over the packed
    ``r·2^56 + cand`` key. Output (center, context, j, negative)."""
    from cassovary_ray.hashing import splitmix64 as _smx

    pairs_sql = skipgram_sql(edges_cte, walks_per_vertex, walk_length,
                             corpus_seed, window)
    probes = ", ".join(
        f"({j}, {r}, "
        f"{int(_smx(np.uint64(2 * (retries * j + r) + 1) ^ np.uint64(seed)))})"
        for j in range(k) for r in range(retries))
    inner0 = (f"SELECT center, context, j, r,"
              f" xor(center::HUGEINT, L::HUGEINT) AS x0"
              f" FROM (SELECT DISTINCT center, context FROM ({pairs_sql}))"
              f" CROSS JOIN (VALUES {probes}) AS probes(j, r, L)")
    m1 = _splitmix64_sql(inner0, "center, context, j, r", "x0", "m1")
    inner1 = (f"SELECT center, context, j, r,"
              f" xor(m1, context::HUGEINT) AS x1 FROM ({m1})")
    m2 = _splitmix64_sql(inner1, "center, context, j, r", "x1", "m2")
    pack = 1 << 56
    return f"""
        WITH eo AS MATERIALIZED ({edges_cte}),
        vu AS MATERIALIZED (SELECT DISTINCT src AS u FROM
                  (SELECT src FROM eo UNION ALL SELECT dst AS src FROM eo) t),
        nm AS (SELECT MAX(u) + 1 AS m FROM vu),
        cand AS (SELECT center, context, j, r,
                        CAST(m2 % nm.m AS BIGINT) AS cand
                 FROM ({m2}) CROSS JOIN nm),
        valid AS (SELECT c.center, c.context, c.j, c.r, c.cand
                  FROM cand c JOIN vu v ON v.u = c.cand
                  WHERE c.cand <> c.center AND c.cand <> c.context),
        best AS (SELECT center, context, j,
                        MIN(r * {pack} + cand) AS packed
                 FROM valid GROUP BY 1, 2, 3)
        SELECT center, context, CAST(j AS BIGINT) AS j,
               packed % {pack} AS negative
        FROM best
    """


def langid_sql(markers: dict[str, set[str]]) -> str:
    """The stopword-marker language-ID heuristic (``textops.LangIdStage``) in
    SQL: tokens = RE2 ``[a-zà-ÿ]+`` over lower(text) (same regex both
    sides); per-language score = marker-token occurrence count; winner = max
    score, ties → lexicographically smallest language, no hits → 'und'."""
    rows = ", ".join(
        f"('{lang}', '{w}')" for lang in sorted(markers) for w in sorted(markers[lang])
    )
    return f"""
        WITH markers(lang, w) AS (VALUES {rows}),
        toks AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-zà-ÿ]+')) AS w
                 FROM documents),
        sc AS (SELECT toks.doc_id, m.lang, count(*) AS c
               FROM toks JOIN markers m USING (w) GROUP BY 1, 2),
        best AS (SELECT doc_id, lang FROM (
                     SELECT doc_id, lang,
                            row_number() OVER (PARTITION BY doc_id
                                               ORDER BY c DESC, lang ASC) AS rn
                     FROM sc) WHERE rn = 1)
        SELECT d.doc_id, coalesce(best.lang, 'und') AS lang_pred
        FROM documents d LEFT JOIN best USING (doc_id)
    """


def dedup_clusters_sql(n: int = 3, max_df: int = 50, threshold: float = 0.5) -> str:
    """Near-dup clustering over ``documents``: the exact n-gram-Jaccard pair
    graph (same CTEs as :func:`ngram_jaccard_sql`) + recursive-CTE hash-min
    components; canonical = min doc_id in the cluster, singletons map to
    themselves (``textops.dedup_clusters``)."""
    return rf"""
        WITH RECURSIVE toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
                      FROM documents),
        sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+{n - 1}], ' ') AS s
               FROM toks, unnest(generate_series(1, len(t) - {n - 1})) AS u(i)),
        kept AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= {max_df}),
        ksh AS (SELECT sh.doc_id, sh.s FROM sh JOIN kept USING (s)),
        sizes AS (SELECT doc_id, count(*) AS sz FROM ksh GROUP BY 1),
        inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS common
                  FROM ksh x JOIN ksh y ON x.s = y.s AND x.doc_id < y.doc_id
                  GROUP BY 1, 2),
        p AS (SELECT inter.a, inter.b
              FROM inter JOIN sizes sa ON sa.doc_id = inter.a
                         JOIN sizes sb ON sb.doc_id = inter.b
              WHERE CAST(common AS DOUBLE) / (sa.sz + sb.sz - common) >= {threshold}),
        -- DISTINCT spelled out: inside WITH RECURSIVE a plain UNION in a
        -- non-recursive CTE gets UNION ALL semantics (see wcc_sql)
        und AS (SELECT DISTINCT src, dst FROM
                (SELECT a AS src, b AS dst FROM p UNION ALL SELECT b, a FROM p)),
        reach(vertex, m) AS (
            SELECT src AS vertex, src AS m FROM und
            UNION
            SELECT und.dst AS vertex, reach.m
            FROM reach JOIN und ON und.src = reach.vertex
            WHERE reach.m < und.dst
        ),
        comp AS (SELECT vertex, min(m) AS canonical FROM reach GROUP BY vertex)
        SELECT d.doc_id, coalesce(comp.canonical, d.doc_id) AS canonical
        FROM documents d LEFT JOIN comp ON comp.vertex = d.doc_id
    """


def k_core_sql(edges_cte: str, k: int, rounds: int) -> str:
    """Unrolled k-core peeling (``analytics.k_core``): canonical undirected
    dedup'd edges mirrored to both directions, then ``rounds`` rounds of
    (degree, keep deg≥k, drop edges touching a dropped vertex). The Ray side
    raises if it hasn't converged within its own round bound, so a
    ``rounds`` ≥ that bound unroll always covers the fixpoint (extra rounds
    are no-ops). Integer-only."""
    parts = [
        f"WITH e AS MATERIALIZED ({edges_cte})",
        "cu AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS src,"
        " greatest(src, dst) AS dst FROM e WHERE src <> dst)",
        "u0 AS MATERIALIZED (SELECT src, dst FROM cu UNION ALL SELECT dst, src FROM cu)",
    ]
    for r in range(rounds):
        parts.append(
            f"d{r} AS MATERIALIZED (SELECT src AS vertex, count(*) AS c"
            f" FROM u{r} GROUP BY 1)")
        parts.append(f"g{r} AS MATERIALIZED (SELECT vertex FROM d{r} WHERE c >= {k})")
        parts.append(
            f"u{r + 1} AS MATERIALIZED (SELECT u.src, u.dst FROM u{r} u"
            f" JOIN g{r} a ON a.vertex = u.src JOIN g{r} b ON b.vertex = u.dst)")
    return ",\n".join(parts) + (
        f"\nSELECT src AS vertex, count(*) AS degree FROM u{rounds} GROUP BY 1")


def ego_net_sql(edges_cte: str, sources: list[int], radius: int) -> str:
    """Induced directed edges on the radius-``radius`` undirected ball
    around ``sources`` (``analytics.ego_net`` with direction='both'):
    unrolled frontier expansion over the both-direction edge list, then
    two joins inducing the original directed rows."""
    src_vals = ", ".join(f"({int(s)})" for s in sources)
    parts = [
        f"WITH e AS MATERIALIZED ({edges_cte})",
        "u AS MATERIALIZED (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e)",
        f"v0 AS (SELECT CAST(vertex AS BIGINT) AS vertex"
        f" FROM (VALUES {src_vals}) AS t(vertex))",
    ]
    for r in range(radius):
        parts.append(
            f"v{r + 1} AS MATERIALIZED (SELECT DISTINCT vertex FROM ("
            f"SELECT vertex FROM v{r}"
            f" UNION ALL SELECT u.dst AS vertex FROM u"
            f" JOIN v{r} ON u.src = v{r}.vertex))")
    return ",\n".join(parts) + (
        f"\nSELECT e.src, e.dst FROM e"
        f" JOIN v{radius} a ON a.vertex = e.src"
        f" JOIN v{radius} b ON b.vertex = e.dst")


def edge_supports_sql(edges_cte: str) -> str:
    """Triangle support per canonical undirected edge
    (``analytics.edge_triangle_supports``): enumerate triangles a<b<c over
    the canonical edge set with a 3-way self-join, credit each triangle's
    three edges, left-join back so triangle-free edges report 0."""
    return f"""
        WITH e AS ({edges_cte}),
        cu AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS src,
                            greatest(src, dst) AS dst FROM e WHERE src <> dst),
        tri AS (SELECT ab.src AS a, ab.dst AS b, bc.dst AS c
                FROM cu ab JOIN cu bc ON bc.src = ab.dst
                JOIN cu ac ON ac.src = ab.src AND ac.dst = bc.dst),
        te AS (SELECT a AS src, b AS dst FROM tri
               UNION ALL SELECT a, c FROM tri
               UNION ALL SELECT b, c FROM tri),
        sup AS (SELECT src, dst, count(*) AS support FROM te GROUP BY 1, 2)
        SELECT cu.src, cu.dst, coalesce(sup.support, 0) AS support
        FROM cu LEFT JOIN sup USING (src, dst)
    """


def k_truss_sql(edges_cte: str, k: int, rounds: int) -> str:
    """Unrolled k-truss peeling (``analytics.k_truss``): per round a triangle
    enumeration over the surviving canonical edge set + per-edge support
    count, keeping edges with support ≥ k−2. The Ray side raises if it hasn't
    converged within its own round bound, so a ``rounds`` ≥ that bound unroll
    always covers the fixpoint; the final round's support column is computed
    over an already-fixed edge set, matching the Ray side's fixpoint supports.
    Integer-only."""
    parts = [
        f"WITH e AS MATERIALIZED ({edges_cte})",
        "cu0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS src,"
        " greatest(src, dst) AS dst FROM e WHERE src <> dst)",
    ]
    for r in range(rounds):
        parts.append(
            f"tri{r} AS MATERIALIZED (SELECT ab.src AS a, ab.dst AS b, bc.dst AS c"
            f" FROM cu{r} ab JOIN cu{r} bc ON bc.src = ab.dst"
            f" JOIN cu{r} ac ON ac.src = ab.src AND ac.dst = bc.dst)")
        parts.append(
            f"cu{r + 1} AS MATERIALIZED (SELECT src, dst, count(*) AS support"
            f" FROM (SELECT a AS src, b AS dst FROM tri{r}"
            f" UNION ALL SELECT a, c FROM tri{r}"
            f" UNION ALL SELECT b, c FROM tri{r})"
            f" GROUP BY 1, 2 HAVING count(*) >= {k - 2})")
    return ",\n".join(parts) + f"\nSELECT src, dst, support FROM cu{rounds}"


def wl_refinement_sql(edges_cte: str, rounds: int) -> str:
    """Unrolled 1-WL refinement (``analytics.wl_refinement``): md5 colors,
    sorted neighbor-color signature via ``string_agg(... ORDER BY ...)``,
    separators shared with the Ray kernel."""
    parts = [
        f"WITH e AS MATERIALIZED ({edges_cte})",
        "cu AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS src,"
        " greatest(src, dst) AS dst FROM e WHERE src <> dst)",
        "u AS MATERIALIZED (SELECT src, dst FROM cu UNION ALL SELECT dst, src FROM cu)",
        "c0 AS MATERIALIZED (SELECT src AS vertex,"
        " md5(CAST(count(*) AS VARCHAR)) AS color FROM u GROUP BY 1)",
    ]
    for r in range(rounds):
        parts.append(
            f"c{r + 1} AS MATERIALIZED (SELECT v.vertex,"
            f" md5(v.color || '|' || s.sig) AS color"
            f" FROM c{r} v JOIN (SELECT u.src AS vertex,"
            f" string_agg(c.color, ',' ORDER BY c.color) AS sig"
            f" FROM u JOIN c{r} c ON c.vertex = u.dst GROUP BY 1) s"
            f" ON s.vertex = v.vertex)")
    return ",\n".join(parts) + f"\nSELECT vertex, color FROM c{rounds}"


def coreness_sql(edges_cte: str, rounds: int) -> str:
    """Unrolled H-index iteration for exact coreness
    (``analytics.coreness``): c0 = degree; each round ranks every vertex's
    neighbor values descending and counts positions with value ≥ rank (the
    H-index under a descending sort). ``rounds`` ≥ the Ray side's
    convergence bound makes extra rounds no-ops. Integer-only."""
    parts = [
        f"WITH e AS MATERIALIZED ({edges_cte})",
        "cu AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS src,"
        " greatest(src, dst) AS dst FROM e WHERE src <> dst)",
        "u AS MATERIALIZED (SELECT src, dst FROM cu UNION ALL SELECT dst, src FROM cu)",
        "c0 AS MATERIALIZED (SELECT src AS vertex, count(*) AS c FROM u GROUP BY 1)",
    ]
    for r in range(rounds):
        parts.append(
            f"c{r + 1} AS MATERIALIZED (SELECT src AS vertex,"
            f" count(*) FILTER (WHERE cv >= rn) AS c FROM ("
            f"SELECT u.src, c.c AS cv,"
            f" row_number() OVER (PARTITION BY u.src ORDER BY c.c DESC) AS rn"
            f" FROM u JOIN c{r} c ON c.vertex = u.dst) GROUP BY 1)")
    return ",\n".join(parts) + (
        f"\nSELECT vertex, c AS coreness FROM c{rounds}")


def densest_subgraph_sql(edges_cte: str, epsilon: float, rounds: int) -> str:
    """Unrolled (1+ε)-peeling densest subgraph
    (``analytics.densest_subgraph``): per round degrees + scalar
    (vcnt, ecnt) stats + the ``deg > (1+ε)·avg`` cut, then an argmax over
    the per-round densities (ties → earliest round). Float expressions
    mirror the Ray side operation for operation (single divisions of exact
    integers, so doubles are bitwise-reproducible)."""
    thresh_mult = repr(1.0 + epsilon)
    parts = [
        f"WITH e AS MATERIALIZED ({edges_cte})",
        "cu AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS src,"
        " greatest(src, dst) AS dst FROM e WHERE src <> dst)",
        "u0 AS MATERIALIZED (SELECT src, dst FROM cu UNION ALL SELECT dst, src FROM cu)",
    ]
    for r in range(rounds):
        parts.append(
            f"d{r} AS MATERIALIZED (SELECT src AS vertex, count(*) AS deg"
            f" FROM u{r} GROUP BY 1)")
        parts.append(
            f"s{r} AS MATERIALIZED (SELECT count(*) AS vcnt,"
            f" (SELECT count(*) FROM u{r}) AS ecnt FROM d{r})")
        parts.append(
            f"g{r} AS MATERIALIZED (SELECT vertex FROM d{r}, s{r}"
            f" WHERE deg > {thresh_mult} * (CAST(ecnt AS DOUBLE) / vcnt))")
        parts.append(
            f"u{r + 1} AS MATERIALIZED (SELECT u.src, u.dst FROM u{r} u"
            f" JOIN g{r} a ON a.vertex = u.src JOIN g{r} b ON b.vertex = u.dst)")
    stats = " UNION ALL ".join(
        f"SELECT {r} AS r, vcnt, ecnt FROM s{r} WHERE vcnt > 0"
        for r in range(rounds))
    allv = " UNION ALL ".join(
        f"SELECT {r} AS r, vertex, deg FROM d{r}" for r in range(rounds))
    parts.append(f"stats AS ({stats})")
    parts.append(
        "best AS (SELECT r, CAST(ecnt AS DOUBLE) / (2 * vcnt) AS density"
        " FROM stats ORDER BY density DESC, r ASC LIMIT 1)")
    parts.append(f"allv AS ({allv})")
    return ",\n".join(parts) + (
        "\nSELECT a.vertex, a.deg AS degree, b.density"
        " FROM allv a, best b WHERE a.r = b.r")


def scc_sql(edges_cte: str) -> str:
    """Exact SCC fixpoint via transitive closure: component = min vertex of
    the mutually-reachable set (``analytics.scc`` id convention). Closure is
    O(n²) rows — an oracle for the gate graph, not a scale path."""
    return f"""
        WITH RECURSIVE e AS ({edges_cte}),
        ne AS (SELECT DISTINCT src, dst FROM e WHERE src <> dst),
        reach(s, v) AS (
            SELECT src, src FROM ne
            UNION
            SELECT dst, dst FROM ne
            UNION
            SELECT reach.s, ne.dst FROM reach JOIN ne ON ne.src = reach.v
        )
        SELECT r1.s AS vertex, min(r1.v) AS component
        FROM reach r1 JOIN reach r2 ON r2.s = r1.v AND r2.v = r1.s
        GROUP BY 1
    """


def harmonic_sql(edges_cte: str, sources: list[int], max_depth: int = 32) -> str:
    """Harmonic centrality over out-edge BFS distances, matching
    ``analytics.harmonic_centrality`` (exact-int Σ LCM(1..32)//d, one final
    division — both sides bit-identical)."""
    lcm = 144403552893600
    src_rows = ", ".join(f"({s})" for s in sources)
    return f"""
        WITH RECURSIVE e AS ({edges_cte}),
        s(vertex) AS (VALUES {src_rows}),
        reach(source, vertex, depth) AS (
            SELECT CAST(vertex AS BIGINT), CAST(vertex AS BIGINT),
                   CAST(0 AS BIGINT) FROM s
            UNION
            SELECT reach.source, e.dst, reach.depth + 1
            FROM reach JOIN e ON e.src = reach.vertex
            WHERE reach.depth < {max_depth}
        ),
        dist AS (SELECT source, vertex, min(depth) AS d FROM reach GROUP BY 1, 2),
        agg AS (SELECT source AS vertex,
                       CAST(sum({lcm} // d) AS BIGINT) AS inv_sum
                FROM dist WHERE d > 0 GROUP BY 1)
        SELECT CAST(s.vertex AS BIGINT) AS vertex,
               coalesce(CAST(agg.inv_sum AS DOUBLE) / {lcm}, 0.0) AS harmonic
        FROM s LEFT JOIN agg ON agg.vertex = s.vertex
    """


def eccentricity_sql(edges_cte: str, sources: list[int],
                     max_depth: int | None = None) -> str:
    """Per-source max BFS depth + reachable count, matching
    ``analytics.eccentricity`` (integers only)."""
    src_rows = ", ".join(f"({s})" for s in sources)
    depth_bound = f"WHERE reach.depth < {max_depth}" if max_depth is not None else ""
    return f"""
        WITH RECURSIVE e AS ({edges_cte}),
        s(vertex) AS (VALUES {src_rows}),
        reach(source, vertex, depth) AS (
            SELECT CAST(vertex AS BIGINT), CAST(vertex AS BIGINT),
                   CAST(0 AS BIGINT) FROM s
            UNION
            SELECT reach.source, e.dst, reach.depth + 1
            FROM reach JOIN e ON e.src = reach.vertex
            {depth_bound}
        ),
        dist AS (SELECT source, vertex, min(depth) AS d FROM reach GROUP BY 1, 2)
        SELECT source AS vertex, CAST(max(d) AS BIGINT) AS eccentricity,
               count(*) AS reachable
        FROM dist GROUP BY 1
    """


def neighborhood_sql(edges_cte: str, max_distance: int) -> str:
    """Exact neighborhood function N(t) for t = 0..max_distance: distinct
    (u, v) pairs with a directed path of length <= t (self-pairs at t=0).
    Matches ``ShardedGraph.neighborhood_function(mode="exact")`` — the
    engine grows IN-balls (forward-layout scatter) while this SQL grows
    OUT-balls, but the pair TOTALS are identical by symmetry (each counts
    the same set of (u, v) pairs). Integer-only."""
    parts = [
        f"WITH e AS MATERIALIZED ({edges_cte})",
        "vx AS MATERIALIZED (SELECT src AS vertex FROM e UNION SELECT dst FROM e)",
        "b0 AS MATERIALIZED (SELECT vertex AS u, vertex AS v FROM vx)",
    ]
    for t in range(1, max_distance + 1):
        parts.append(
            f"b{t} AS MATERIALIZED (SELECT u, v FROM b{t-1} "
            f"UNION SELECT b.u, e.dst AS v FROM b{t-1} b JOIN e ON e.src = b.v)"
        )
    selects = [
        f"SELECT CAST({t} AS BIGINT) AS distance, "
        f"CAST(count(*) AS BIGINT) AS reachable_pairs FROM b{t}"
        for t in range(max_distance + 1)
    ]
    return ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(selects) + "\nORDER BY distance"


def effective_diameter_sql(edges_cte: str, max_distance: int,
                           alpha: float = 0.9) -> str:
    """Interpolated effective diameter over the exact neighborhood function
    (same arithmetic as ``engine.effective_diameter``: target = alpha·N(last);
    t = first distance with N(t) >= target; linear interpolation against
    N(t-1))."""
    nf = neighborhood_sql(edges_cte, max_distance)
    # re-wrap: the nf statement is WITH ... SELECT; embed as a subquery
    return f"""
        WITH nf AS MATERIALIZED ({nf}),
        tgt AS (SELECT {alpha} * (SELECT reachable_pairs FROM nf
                                  WHERE distance = {max_distance}) AS target),
        hit AS (SELECT min(distance) AS t FROM nf, tgt
                WHERE reachable_pairs >= tgt.target)
        SELECT CASE WHEN (SELECT t FROM hit) = 0 THEN CAST(0.0 AS DOUBLE)
            ELSE (SELECT t FROM hit) - 1.0 +
                 ((SELECT target FROM tgt) -
                  (SELECT CAST(reachable_pairs AS DOUBLE) FROM nf
                   WHERE distance = (SELECT t FROM hit) - 1))
               / ((SELECT CAST(reachable_pairs AS DOUBLE) FROM nf
                   WHERE distance = (SELECT t FROM hit)) -
                  (SELECT CAST(reachable_pairs AS DOUBLE) FROM nf
                   WHERE distance = (SELECT t FROM hit) - 1))
            END AS eff_diameter
    """


def sssp_sql(wedges_cte: str, sources: dict[int, float], rounds: int) -> str:
    """Unrolled Bellman-Ford over weighted edges (src, dst, w): ``rounds``
    min-plus relaxations from the seed distances — exactly
    ``ShardedGraph.sssp(max_iterations=rounds)``. Each round's candidate set
    (previous dist ∪ relaxed sums) is identical to the engine's, and every
    path distance is the same left-fold float sum, so the doubles agree
    bitwise. Returns (vertex, dist) over reached vertices."""
    seed_rows = " UNION ALL ".join(
        f"SELECT CAST({int(v)} AS BIGINT) AS vertex, CAST({float(d)!r} AS DOUBLE) AS dist"
        for v, d in sorted(sources.items())
    )
    parts = [
        f"WITH e AS MATERIALIZED ({wedges_cte})",
        f"d0 AS MATERIALIZED ({seed_rows})",
    ]
    for k in range(1, rounds + 1):
        p = k - 1
        parts.append(
            f"d{k} AS MATERIALIZED (SELECT vertex, min(dist) AS dist FROM ("
            f"  SELECT vertex, dist FROM d{p}"
            f"  UNION ALL"
            f"  SELECT e.dst AS vertex, d.dist + e.w AS dist"
            f"  FROM d{p} d JOIN e ON e.src = d.vertex"
            f") GROUP BY vertex)"
        )
    return ",\n".join(parts) + f"\nSELECT vertex, dist FROM d{rounds}"


def betweenness_sql(edges_cte: str, sources: list[int], max_depth: int) -> str:
    """Unrolled Brandes betweenness from a pinned source set — exactly
    ``analytics.betweenness_centrality(sources=sources, max_depth=max_depth)``
    (Brandes 2001; the engine's forward BFS-with-σ and per-level backward δ
    sweep, ``analytics.py`` dataflow):

    - forward, level d→d+1: σ of a NEW vertex = Σ σ of its frontier
      predecessors (anti-joined against all earlier levels);
    - backward, deepest first: δ(v) = Σ_{(v,w)∈E, w at level d+1}
      σ(v)/σ(w) · (1 + δ(w)); the deepest level's δ is 0;
    - bc(v) = Σ over sources s≠v of δ_s(v), zero-filled over every visited
      vertex.

    σ is integer-exact both sides; δ divisions/sums are doubles whose
    summation-order divergence (~1e-15 relative, values ≤ |sources|·n) sits
    far below the checker's 9-dp grid. The unroll bound must equal the
    query's pinned ``max_depth``; extra rounds past BFS exhaustion are
    empty-table no-ops. Returns (vertex, betweenness)."""
    src_rows = " UNION ALL ".join(
        f"SELECT CAST({int(s)} AS BIGINT) AS source" for s in sorted(set(sources)))
    D = max_depth
    parts = [
        f"WITH e AS MATERIALIZED ({edges_cte})",
        f"srcs AS MATERIALIZED ({src_rows})",
        "lvl0 AS MATERIALIZED (SELECT source, source AS vertex,"
        " CAST(1 AS BIGINT) AS sigma FROM srcs)",
        "vis0 AS MATERIALIZED (SELECT source, vertex FROM lvl0)",
    ]
    for d in range(1, D + 1):
        p = d - 1
        parts.append(
            f"lvl{d} AS MATERIALIZED ("
            f" SELECT l.source, e.dst AS vertex,"
            f"        CAST(sum(l.sigma) AS BIGINT) AS sigma"
            f" FROM lvl{p} l JOIN e ON e.src = l.vertex"
            f" WHERE NOT EXISTS (SELECT 1 FROM vis{p} v"
            f"   WHERE v.source = l.source AND v.vertex = e.dst)"
            f" GROUP BY l.source, e.dst)")
        parts.append(
            f"vis{d} AS MATERIALIZED (SELECT source, vertex FROM vis{p}"
            f" UNION ALL SELECT source, vertex FROM lvl{d})")
    parts.append(
        f"del{D} AS MATERIALIZED (SELECT source, vertex, sigma,"
        f" CAST(0.0 AS DOUBLE) AS delta FROM lvl{D})")
    for d in range(D - 1, -1, -1):
        parts.append(
            f"del{d} AS MATERIALIZED ("
            f" SELECT l.source, l.vertex, l.sigma,"
            f"   coalesce(sum(CAST(l.sigma AS DOUBLE) / w.sigma"
            f"                * (1.0 + w.delta)), 0.0) AS delta"
            f" FROM lvl{d} l"
            f" LEFT JOIN e ON e.src = l.vertex"
            f" LEFT JOIN del{d+1} w"
            f"   ON w.source = l.source AND w.vertex = e.dst"
            f" GROUP BY l.source, l.vertex, l.sigma)")
    alld = " UNION ALL ".join(
        f"SELECT source, vertex, delta FROM del{d}" for d in range(D + 1))
    parts.append(f"alld AS ({alld})")
    parts.append(
        "bc AS (SELECT vertex, sum(delta) AS betweenness FROM alld"
        " WHERE source <> vertex GROUP BY vertex)")
    parts.append(f"allv AS (SELECT DISTINCT vertex FROM vis{D})")
    return ",\n".join(parts) + (
        "\nSELECT a.vertex, coalesce(bc.betweenness, 0.0) AS betweenness"
        " FROM allv a LEFT JOIN bc ON bc.vertex = a.vertex")


def msf_sql(wedges_cte: str, rounds: int = 12) -> str:
    """Unrolled Borůvka minimum spanning forest — exactly
    ``analytics.minimum_spanning_forest`` over the canonical undirected view
    (src<dst, self-loops dropped, parallel edges collapsed to min w).

    The strict (w, src, dst) total order makes the MSF UNIQUE, so ANY
    correct MST algorithm under that order returns the engine's forest;
    this unrolls classic Borůvka: per round, per-component minimum cross
    edge under the total order (window rank), union into the forest,
    components recomputed as the min-reachable-id fixpoint over forest
    edges (one recursive CTE per round — DuckDB allows several recursive
    CTEs in one WITH RECURSIVE list). ``rounds`` must be ≥ ⌈log2(V)⌉
    (component count at least halves per round); extra rounds are no-ops
    at the fixpoint. Returns the forest (src, dst, w)."""
    parts = [
        f"WITH RECURSIVE we AS MATERIALIZED ({wedges_cte})",
        "ce AS MATERIALIZED (SELECT least(src, dst) AS src,"
        " greatest(src, dst) AS dst, min(w) AS w FROM we"
        " WHERE src <> dst GROUP BY 1, 2)",
        "v AS MATERIALIZED (SELECT src AS vertex FROM ce UNION SELECT dst FROM ce)",
        "f0(src, dst, w) AS (SELECT CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),"
        " CAST(NULL AS DOUBLE) WHERE 1 = 0)",
    ]
    for r in range(rounds):
        parts.append(
            f"fu{r} AS (SELECT src AS a, dst AS b FROM f{r}"
            f" UNION ALL SELECT dst, src FROM f{r})")
        parts.append(
            f"reach{r}(vertex, m) AS ("
            f" SELECT vertex, vertex FROM v"
            f" UNION"
            f" SELECT fu.b, c.m FROM reach{r} c JOIN fu{r} fu ON fu.a = c.vertex"
            f" WHERE c.m < fu.b)")
        parts.append(
            f"comp{r} AS MATERIALIZED (SELECT vertex, min(m) AS comp"
            f" FROM reach{r} GROUP BY vertex)")
        parts.append(
            f"tag{r} AS (SELECT e.src, e.dst, e.w, cs.comp AS ca, cd.comp AS cb"
            f" FROM ce e JOIN comp{r} cs ON cs.vertex = e.src"
            f" JOIN comp{r} cd ON cd.vertex = e.dst WHERE cs.comp <> cd.comp)")
        parts.append(
            f"pick{r} AS (SELECT src, dst, w FROM ("
            f"   SELECT comp, src, dst, w, row_number() OVER ("
            f"     PARTITION BY comp ORDER BY w, src, dst) AS rn"
            f"   FROM (SELECT ca AS comp, src, dst, w FROM tag{r}"
            f"         UNION ALL SELECT cb, src, dst, w FROM tag{r}))"
            f" WHERE rn = 1)")
        parts.append(
            f"f{r+1} AS MATERIALIZED (SELECT DISTINCT src, dst, w FROM"
            f" (SELECT src, dst, w FROM f{r}"
            f"  UNION ALL SELECT src, dst, w FROM pick{r}))")
    return ",\n".join(parts) + f"\nSELECT src, dst, w FROM f{rounds}"


def _mis_priority_sql(vexpr: str, salt: int) -> str:
    """SQL mirror of ``rounds.mis_priority`` — the same 52-bit two-lane
    quadratic hash in pure BIGINT arithmetic (every intermediate < 2^62)."""
    lanes = []
    for a, b, c, d in ((1000003, 999983, 12345, 2654435),
                       (1000033, 999979, 54321, 7654321)):
        # CASTs force BIGINT: DuckDB narrows `BIGINT % INT32` to INT32 and
        # the t*t product would overflow
        t = (f"CAST(((({vexpr} & 2147483647) * {a}"
             f" + (({vexpr} >> 31) & 2147483647) * {b} + {c}) % 2147483647"
             f" + {salt * d}) % 2147483647 AS BIGINT)")
        lanes.append(f"CAST((({t}) * ({t})) % 2147483647 AS BIGINT)")
    return f"(({lanes[0]}) * 2097152 + ({lanes[1]}) % 2097152)"


def mis_sql(edges_cte: str, rounds: int = 24) -> str:
    """Unrolled Luby maximal independent set (``rounds.MISProgram``): per
    round, an undecided vertex with priority strictly below the min over
    its undecided neighbors joins the set; it and its neighbors leave the
    undecided pool. Priorities are the literal integers the engine
    computes (see ``_mis_priority_sql``), so selection order — and hence
    the final set — is identical. ``rounds`` must cover convergence (the
    engine runs to zero undecided; extra unrolled rounds are no-ops on an
    empty pool)."""
    parts = [
        f"WITH e AS MATERIALIZED ({edges_cte})",
        "und AS MATERIALIZED (SELECT src, dst FROM e UNION SELECT dst, src FROM e)",
        "u0 AS MATERIALIZED (SELECT DISTINCT src AS vertex FROM und)",
    ]
    for r in range(rounds):
        p_dst = _mis_priority_sql("n.dst", r)
        p_own = _mis_priority_sql("a.vertex", r)
        parts.append(
            f"nb{r} AS MATERIALIZED ("
            f" SELECT n.src AS vertex, min({p_dst}) AS mn"
            f" FROM und n JOIN u{r} a ON n.src = a.vertex"
            f" JOIN u{r} b ON n.dst = b.vertex GROUP BY n.src)")
        parts.append(
            f"sel{r} AS MATERIALIZED ("
            f" SELECT a.vertex FROM u{r} a LEFT JOIN nb{r} m ON a.vertex = m.vertex"
            f" WHERE m.mn IS NULL OR {p_own} < m.mn)")
        parts.append(
            f"u{r + 1} AS MATERIALIZED ("
            f" SELECT a.vertex FROM u{r} a"
            f" WHERE a.vertex NOT IN (SELECT vertex FROM sel{r})"
            f" AND a.vertex NOT IN ("
            f"   SELECT n.src FROM und n JOIN sel{r} s ON n.dst = s.vertex))")
    union = " UNION ALL ".join(f"SELECT vertex FROM sel{r}" for r in range(rounds))
    return ",\n".join(parts) + f"\nSELECT vertex FROM ({union})"


def coloring_sql(edges_cte: str, colors: int = 16, rounds: int = 6) -> str:
    """Unrolled Luby-per-color greedy coloring (``rounds.ColoringProgram``):
    ``colors`` color classes, each a FIXED schedule of ``rounds`` Luby
    rounds over the pool of still-uncolored vertices, priorities the
    literal integers the engine computes (``_mis_priority_sql`` with
    salt = color*64 + round). ``colors`` must cover the engine's actual
    class count (the engine raises past ``max_colors``; keep
    ``max_colors == colors`` so divergence is loud, never silent);
    ``rounds`` must equal the engine's ``rounds_per_color`` — parity holds
    for any value because both sides defer an unconverged class's leftovers
    identically."""
    parts = [
        f"WITH e AS MATERIALIZED ({edges_cte})",
        "und AS MATERIALIZED (SELECT src, dst FROM e UNION SELECT dst, src FROM e)",
        "p0 AS MATERIALIZED (SELECT DISTINCT src AS vertex FROM und)",
    ]
    sels = []
    for k in range(colors):
        parts.append(f"u{k}x0 AS MATERIALIZED (SELECT vertex FROM p{k})")
        for r in range(rounds):
            salt = k * 64 + r
            p_dst = _mis_priority_sql("n.dst", salt)
            p_own = _mis_priority_sql("a.vertex", salt)
            u, nb, sel = f"u{k}x{r}", f"nb{k}x{r}", f"sel{k}x{r}"
            parts.append(
                f"{nb} AS MATERIALIZED ("
                f" SELECT n.src AS vertex, min({p_dst}) AS mn"
                f" FROM und n JOIN {u} a ON n.src = a.vertex"
                f" JOIN {u} b ON n.dst = b.vertex GROUP BY n.src)")
            parts.append(
                f"{sel} AS MATERIALIZED ("
                f" SELECT a.vertex FROM {u} a LEFT JOIN {nb} m ON a.vertex = m.vertex"
                f" WHERE m.mn IS NULL OR {p_own} < m.mn)")
            parts.append(
                f"u{k}x{r + 1} AS MATERIALIZED ("
                f" SELECT a.vertex FROM {u} a"
                f" WHERE a.vertex NOT IN (SELECT vertex FROM {sel})"
                f" AND a.vertex NOT IN ("
                f"   SELECT n.src FROM und n JOIN {sel} s ON n.dst = s.vertex))")
            sels.append(f"SELECT vertex, {k} AS c FROM {sel}")
        picked = " UNION ALL ".join(
            f"SELECT vertex FROM sel{k}x{r}" for r in range(rounds))
        parts.append(
            f"p{k + 1} AS MATERIALIZED ("
            f" SELECT vertex FROM p{k}"
            f" WHERE vertex NOT IN ({picked}))")
    union = " UNION ALL ".join(sels)
    return (",\n".join(parts)
            + f"\nSELECT vertex, CAST(c AS BIGINT) AS color FROM ({union})")


# ---------------------------------------------------------------------------
# Hash-sketch oracles over ``documents`` (simhash / rolling fingerprint /
# MinHash-LSH).  All three are exact value mirrors: the engine's per-token
# 64-bit hash is the first 8 md5 bytes little-endian (``textops._token_
# hashes``), which is the literal integer DuckDB's ``md5_number_upper()``
# returns, and every downstream mix (polynomial shingle fold, splitmix64)
# is re-expressed in HUGEINT arithmetic mod 2^64.
# ---------------------------------------------------------------------------

_M64 = str(1 << 64)
_TOK_CTES = (
    r"toks AS MATERIALIZED (SELECT doc_id,"
    r" regexp_split_to_array(trim(text), '\s+') AS t FROM documents),"
    # a trimmed-empty text splits to [''] — the engine's zero-token case
    r" nemp AS MATERIALIZED (SELECT doc_id, t FROM toks"
    r" WHERE NOT (len(t) = 1 AND t[1] = '')),"
    r" emp AS (SELECT doc_id FROM toks WHERE len(t) = 1 AND t[1] = '')"
)


def _tok_hash_sql(token_expr: str) -> str:
    """The engine's per-token hash: first 8 md5 bytes little-endian."""
    return f"md5_number_upper({token_expr})::HUGEINT"


def _signed64_sql(uexpr: str) -> str:
    """Reinterpret a HUGEINT in [0, 2^64) as its int64 two's-complement."""
    return (f"CAST(CASE WHEN ({uexpr}) >= (1::HUGEINT << 63)"
            f" THEN ({uexpr}) - (1::HUGEINT << 64) ELSE ({uexpr}) END AS BIGINT)")


def _poly_fold_sql(token_exprs: list[str], base: int) -> str:
    """``acc = acc * base + hash(tok)  (mod 2^64)`` left fold, starting at 0
    (``textops._shingle_hashes`` / ``rolling_fingerprint``); ``base`` < 2^41
    keeps every intermediate < 2^105, inside HUGEINT."""
    acc = _tok_hash_sql(token_exprs[0])
    for tok in token_exprs[1:]:
        acc = f"((({acc}) * {base} + {_tok_hash_sql(tok)}) % {_M64})"
    return acc


def _splitmix64_sql(inner_sql: str, cols: str, x: str, out: str) -> str:
    """Wrap ``inner_sql`` (producing columns ``cols`` plus HUGEINT column
    ``x`` in [0, 2^64)) in nested SELECTs computing ``out = splitmix64(x)``
    (``hashing.splitmix64``, Steele et al. OOPSLA'14) — 64-bit multiplies
    split into 32-bit limbs so no intermediate leaves HUGEINT range."""
    G = 0x9E3779B97F4A7C15
    C1, C2 = 0xBF58476D1CE4E5B9, 0x94D049BB133111EB

    def mul64(c: int) -> str:
        cl, ch = c & 0xFFFFFFFF, c >> 32
        return (f"((yl * {cl} + ((yl * {ch} + yh * {cl}) % 4294967296)"
                f" * 4294967296) % {_M64})")

    q = f"SELECT {cols}, (({x}) + {G}) % {_M64} AS z0 FROM ({inner_sql})"
    q = f"SELECT {cols}, xor(z0, z0 >> 30) AS y1 FROM ({q})"
    q = f"SELECT {cols}, y1 % 4294967296 AS yl, y1 >> 32 AS yh FROM ({q})"
    q = f"SELECT {cols}, {mul64(C1)} AS z1 FROM ({q})"
    q = f"SELECT {cols}, xor(z1, z1 >> 27) AS y2 FROM ({q})"
    q = f"SELECT {cols}, y2 % 4294967296 AS yl, y2 >> 32 AS yh FROM ({q})"
    q = f"SELECT {cols}, {mul64(C2)} AS z2 FROM ({q})"
    return f"SELECT {cols}, xor(z2, z2 >> 31) AS {out} FROM ({q})"


def simhash_sql() -> str:
    """``textops.simhash`` mirror: 64-bit SimHash (Charikar'02) per doc —
    per bit, count tokens (multiset) with the bit set; bit b of the output
    is set iff ``2*ones > n``; empty docs hash to 0."""
    return f"""
        WITH {_TOK_CTES},
        th AS MATERIALIZED (SELECT doc_id, {_tok_hash_sql('u.tok')} AS h
              FROM nemp, unnest(t) AS u(tok)),
        bits AS (SELECT doc_id, bs.b AS b,
                        sum(CASE WHEN (h >> bs.b) % 2 = 1 THEN 1 ELSE 0 END) AS ones,
                        count(*) AS n
                 FROM th CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS b) bs
                 GROUP BY 1, 2),
        sig AS (SELECT doc_id,
                       sum(CASE WHEN 2 * ones > n THEN (1::HUGEINT << b)
                                ELSE 0::HUGEINT END) AS uv
                FROM bits GROUP BY 1)
        SELECT doc_id, {_signed64_sql('uv')} AS simhash FROM sig
        UNION ALL SELECT doc_id, CAST(0 AS BIGINT) AS simhash FROM emp
    """


def rolling_fingerprint_sql(window: int = 8) -> str:
    """``textops.rolling_fingerprint`` mirror: min over ``w``-token windows
    (w = min(window, n)) of the polynomial rolling hash, base 1099511628211,
    mod 2^64; empty docs fingerprint 0."""
    B = 1099511628211
    full = _poly_fold_sql([f"t[u.i + {k}]" for k in range(window)], B)
    shorts = " ".join(
        f"WHEN {n} THEN {_poly_fold_sql([f't[{k + 1}]' for k in range(n)], B)}"
        for n in range(1, window))
    return f"""
        WITH {_TOK_CTES},
        win AS (
          SELECT doc_id, {full} AS acc
          FROM nemp, unnest(generate_series(1, len(t) - {window - 1})) AS u(i)
          WHERE len(t) >= {window}
          UNION ALL
          SELECT doc_id, CASE len(t) {shorts} END AS acc
          FROM nemp WHERE len(t) < {window}),
        mn AS (SELECT doc_id, min(acc) AS uv FROM win GROUP BY 1)
        SELECT doc_id, {_signed64_sql('uv')} AS fingerprint FROM mn
        UNION ALL SELECT doc_id, CAST(0 AS BIGINT) AS fingerprint FROM emp
    """


def minhash_pairs_sql(num_hashes: int = 64, bands: int = 16, shingle: int = 3,
                      threshold: float = 0.5, seed: int = 97) -> str:
    """``textops.minhash_lsh_pairs`` mirror: distinct word-``shingle``-gram
    polynomial hashes per doc; signature j = min over shingles of
    ``splitmix64(shingle_hash XOR salt_j)`` (salts the literal integers
    ``MinHashStage`` computes); candidates = pairs agreeing on any band of
    ``num_hashes/bands`` signature rows; verify = exact shingle Jaccard ≥
    ``threshold`` (union-empty pairs score 1.0, as the engine).

    One deliberate divergence: the engine folds each band into a 64-bit
    bucket key (splitmix64 chain) while this SQL joins on the band's
    signature LIST — identical candidates unless two different band
    signatures collide in the fold (~2^-64 per bucket pair; the MIS-oracle
    tie-probability stance)."""
    from cassovary_ray.hashing import splitmix64

    with np.errstate(over="ignore"):  # intentional mod-2^64 wraparound
        salts = splitmix64(
            np.arange(num_hashes, dtype=np.uint64)
            + np.uint64(seed) * np.uint64(0x9E3779B97F4A7C15))
    salt_rows = ", ".join(f"({j}, {int(s)}::HUGEINT)"
                          for j, s in enumerate(salts))
    r = num_hashes // bands
    B = 1000000007
    shfold = _poly_fold_sql([f"t[u.i + {k}]" for k in range(shingle)], B)
    mixed = _splitmix64_sql(
        "SELECT doc_id, j, xor(s, salt) AS x FROM sh CROSS JOIN salts",
        "doc_id, j", "x", "mx")
    return f"""
        WITH {_TOK_CTES},
        sh AS MATERIALIZED (
          SELECT DISTINCT doc_id, {shfold} AS s
          FROM nemp, unnest(generate_series(1, len(t) - {shingle - 1})) AS u(i)
          WHERE len(t) >= {shingle}
          UNION
          SELECT DISTINCT doc_id, {_tok_hash_sql('t[u.i]')} AS s
          FROM nemp, unnest(generate_series(1, len(t))) AS u(i)
          WHERE len(t) < {shingle}),
        salts(j, salt) AS (VALUES {salt_rows}),
        sig AS MATERIALIZED (
          SELECT doc_id, j, min(mx) AS v FROM ({mixed}) GROUP BY 1, 2
          UNION ALL
          SELECT doc_id, j, 0::HUGEINT AS v FROM emp CROSS JOIN salts),
        bk AS MATERIALIZED (
          SELECT doc_id, j // {r} AS band, array_agg(v ORDER BY j) AS key
          FROM sig GROUP BY 1, 2),
        cand AS MATERIALIZED (
          SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
          FROM bk x JOIN bk y
            ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id),
        sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
        inter AS (SELECT c.a, c.b, count(*) AS common
                  FROM cand c JOIN sh p ON p.doc_id = c.a
                              JOIN sh q ON q.doc_id = c.b AND q.s = p.s
                  GROUP BY 1, 2),
        scored AS (
          SELECT c.a, c.b,
                 CASE WHEN COALESCE(sa.sz, 0) + COALESCE(sb.sz, 0)
                           - COALESCE(i.common, 0) = 0 THEN 1.0
                      ELSE CAST(COALESCE(i.common, 0) AS DOUBLE)
                           / (COALESCE(sa.sz, 0) + COALESCE(sb.sz, 0)
                              - COALESCE(i.common, 0)) END AS jaccard
          FROM cand c
          LEFT JOIN inter i ON i.a = c.a AND i.b = c.b
          LEFT JOIN sizes sa ON sa.doc_id = c.a
          LEFT JOIN sizes sb ON sb.doc_id = c.b)
        SELECT a, b, jaccard FROM scored WHERE jaccard >= {threshold}
    """


def triangles_approx_sql(edges_cte: str, sample_prob: float, seed: int) -> str:
    """``analytics.triangle_count_approx`` mirror: the DOULION edge coin is
    ``counter_rng_uniform(seed, min, max) = (splitmix64(min ^ splitmix64(max
    ^ seed)) >> 11) / 2^53``, replayed here with the in-SQL splitmix64 chain
    (:func:`_splitmix64_sql` — the walk-oracle precomputes its uniforms
    instead because they don't depend on data; the edge coin does). Keep
    iff u < p, count triangles of the thinned graph with the exact
    ``graph_triangles`` join, wedges exactly from full degrees; every float
    derivation is expression-identical to the engine (IEEE-correctly-rounded
    division and sqrt on equal inputs), so the gate hash-matches."""
    p = float(sample_prob)
    p3 = p * p * p
    p5 = p3 * p * p
    inv3 = 1.0 / p3 - 1.0
    inv1 = 1.0 / p - 1.0
    inner0 = "SELECT u, v, xor(CAST(v AS HUGEINT), " f"{seed}) AS x FROM und"
    q1 = _splitmix64_sql(inner0, "u, v", "x", "k1")
    inner1 = f"SELECT u, v, xor(CAST(u AS HUGEINT), k1) AS x FROM ({q1})"
    q2 = _splitmix64_sql(inner1, "u, v", "x", "k2")
    return f"""
        WITH e AS ({edges_cte}),
        und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
                FROM e WHERE src <> dst),
        samp AS MATERIALIZED (SELECT u, v FROM ({q2})
                 WHERE (k2 >> 11) / 9007199254740992.0 < {p!r}),
        tl AS MATERIALIZED (SELECT a.u AS x, a.v AS y, b.v AS z
              FROM samp a JOIN samp b ON b.u = a.v
              JOIN samp c ON c.u = a.u AND c.v = b.v),
        tri AS (SELECT count(*) AS t FROM tl),
        -- k = pairs of sampled triangles sharing an edge (per-edge C(c,2))
        te AS (SELECT x AS p, y AS q FROM tl
               UNION ALL SELECT y, z FROM tl
               UNION ALL SELECT x, z FROM tl),
        ec AS (SELECT p, q, count(*) AS c FROM te GROUP BY 1, 2),
        kk AS (SELECT CAST(coalesce(sum(c * (c - 1) // 2), 0) AS BIGINT) AS k
               FROM ec),
        deg AS (SELECT vtx, count(*) AS d FROM (
                    SELECT u AS vtx FROM und UNION ALL SELECT v FROM und)
                GROUP BY 1),
        wdg AS (SELECT CAST(sum(d * (d - 1) // 2) AS BIGINT) AS wedges
                FROM deg)
        SELECT t AS triangles_sampled,
               t / {p3!r} AS triangles_est,
               sqrt((t / {p3!r}) * {inv3!r}
                    + 2.0 * (k / {p5!r}) * {inv1!r}) AS stderr_est,
               wedges,
               CASE WHEN wedges > 0 THEN 3.0 * (t / {p3!r}) / wedges
                    ELSE 0.0 END AS transitivity_est
        FROM tri, kk, wdg
    """


def walk_visits_sql(edges_cte: str, starts: list[int], num_steps: int,
                    reset_prob: float, seed: int) -> str:
    """``ShardedGraph.random_walks`` mirror — the Monte-Carlo walk is
    deterministic: every uniform is ``counter_rng_uniform(seed, wid, step)``
    = ``(splitmix64(wid ^ splitmix64(step_key ^ seed)) >> 11) / 2^53``, a
    pure function of (seed, walker, step) independent of the graph, so the
    3136 53-bit integers are precomputed here and embedded as BIGINT
    literals (the LSH-kNN projection-literal policy); the division by 2^53
    and the ``trunc(u * deg)`` neighbor pick are the literal same double
    ops on both sides.  Neighbor k = ``row_number() OVER (PARTITION BY src
    ORDER BY dst) - 1`` matches the engine's canonical ``lexsort((dst,
    src))`` CSR order (``engine.walk_build``).  Per step: reset to start on
    u_reset < reset_prob or a dangling vertex, else the trunc(u_nbr·deg)-th
    out-neighbor (multiset); visits counted at steps 0..num_steps-1."""
    from cassovary_ray.hashing import splitmix64

    wid = np.arange(len(starts), dtype=np.uint64)
    u_rows = []
    for t in range(num_steps - 1):
        kr = np.uint64(int(splitmix64(np.uint64(2 * t) ^ np.uint64(seed))))
        kn = np.uint64(int(splitmix64(np.uint64(2 * t + 1) ^ np.uint64(seed))))
        with np.errstate(over="ignore"):
            ur = splitmix64(wid ^ kr) >> np.uint64(11)
            un = splitmix64(wid ^ kn) >> np.uint64(11)
        u_rows.extend(f"({int(w)}, {t}, {int(r)}, {int(n)})"
                      for w, r, n in zip(wid, ur, un))
    start_rows = ", ".join(f"({i}, {int(s)})" for i, s in enumerate(starts))
    T = "9007199254740992.0"  # 2^53
    parts = [
        f"WITH e AS MATERIALIZED ({edges_cte})",
        "verts AS (SELECT src AS v FROM e UNION SELECT dst FROM e)",
        "deg AS MATERIALIZED (SELECT src, count(*) AS deg FROM e GROUP BY 1)",
        "adj AS MATERIALIZED (SELECT src, dst, row_number()"
        " OVER (PARTITION BY src ORDER BY dst) - 1 AS k FROM e)",
        f"u(wid, t, ur, un) AS (VALUES {', '.join(u_rows)})",
        f"s0 AS (SELECT wid, st AS start, st AS cur FROM (VALUES {start_rows})"
        " w(wid, st) WHERE st IN (SELECT v FROM verts))",
    ]
    for t in range(num_steps - 1):
        parts.append(
            f"s{t + 1} AS MATERIALIZED ("
            f" SELECT s.wid, s.start,"
            f" CASE WHEN u.ur / {T} < {reset_prob!r}"
            f"       OR COALESCE(d.deg, 0) = 0 THEN s.start"
            f"      ELSE a.dst END AS cur"
            f" FROM s{t} s"
            f" JOIN u ON u.wid = s.wid AND u.t = {t}"
            f" LEFT JOIN deg d ON d.src = s.cur"
            f" LEFT JOIN adj a ON a.src = s.cur AND a.k ="
            f"  LEAST(CAST(floor((u.un / {T})"
            f"        * GREATEST(COALESCE(d.deg, 0), 1)) AS BIGINT),"
            f"        COALESCE(d.deg, 0) - 1))")
    vis = " UNION ALL ".join(f"SELECT cur FROM s{t}" for t in range(num_steps))
    return (",\n".join(parts)
            + f"\nSELECT cur AS vertex, count(*) AS visits FROM ({vis})"
            " GROUP BY 1")


def walk_corpus_sql(edges_cte: str, walks_per_vertex: int, walk_length: int,
                    seed: int) -> str:
    """``ShardedGraph.walk_corpus(output='long')`` mirror (reset_prob=0.0
    corpora — resets only on dangling vertices): ``walks_per_vertex``
    sweeps, each seeding one walker at EVERY vertex (walker_id = start
    vertex) with RNG seed ``seed + sweep``.  Unlike :func:`walk_visits_sql`
    the uniforms depend on vertex IDS (data), so splitmix64 runs IN SQL:
    u_nbr(wid, step) = ``(splitmix64(wid XOR L) >> 11) / 2^53`` with
    ``L = splitmix64((2·step+1) XOR (seed+sweep))`` a precomputed literal.
    Neighbor selection and trace semantics as :func:`walk_visits_sql`;
    emits (walker_id, walk, step, vertex) for steps 0..walk_length-1."""
    from cassovary_ray.hashing import splitmix64

    T = "9007199254740992.0"  # 2^53
    parts = [
        f"WITH e AS MATERIALIZED ({edges_cte})",
        "verts AS MATERIALIZED (SELECT DISTINCT src AS v FROM"
        " (SELECT src FROM e UNION ALL SELECT dst FROM e) t(src))",
        "deg AS MATERIALIZED (SELECT src, count(*) AS deg FROM e GROUP BY 1)",
        "adj AS MATERIALIZED (SELECT src, dst, row_number()"
        " OVER (PARTITION BY src ORDER BY dst) - 1 AS k FROM e)",
    ]
    outs = []
    for k in range(walks_per_vertex):
        parts.append(f"s{k}x0 AS (SELECT v AS wid, v AS start, v AS cur"
                     " FROM verts)")
        for t in range(walk_length - 1):
            L = int(splitmix64(np.uint64(2 * t + 1) ^ np.uint64(seed + k)))
            mixed = _splitmix64_sql(
                f"SELECT s.wid, s.start, s.cur, COALESCE(d.deg, 0) AS dg,"
                f" xor(s.wid::HUGEINT, {L}::HUGEINT) AS x"
                f" FROM s{k}x{t} s LEFT JOIN deg d ON d.src = s.cur",
                "wid, start, cur, dg", "x", "mx")
            parts.append(
                f"s{k}x{t + 1} AS MATERIALIZED ("
                f" SELECT u.wid, u.start,"
                f" CASE WHEN u.dg = 0 THEN u.start ELSE a.dst END AS cur"
                f" FROM ({mixed}) u"
                f" LEFT JOIN adj a ON a.src = u.cur AND a.k ="
                f"  LEAST(CAST(floor(((u.mx >> 11) / {T})"
                f"        * GREATEST(u.dg, 1)) AS BIGINT), u.dg - 1))")
        outs.extend(
            f"SELECT wid AS walker_id, CAST({k} AS BIGINT) AS walk,"
            f" CAST({t} AS BIGINT) AS step, cur AS vertex FROM s{k}x{t}"
            for t in range(walk_length))
    return (",\n".join(parts) + "\nSELECT walker_id, walk, step, vertex FROM ("
            + " UNION ALL ".join(outs) + ")")


def skipgram_sql(edges_cte: str, walks_per_vertex: int, walk_length: int,
                 seed: int, window: int = 2) -> str:
    """``textops.skipgram_pairs(walk_corpus(output='sequences'))`` mirror:
    the walk corpus is deterministic (see :func:`walk_corpus_sql`), and the
    pair generation is a pure transform — for every within-walk offset
    d ∈ [1, window] emit (center, context) in BOTH directions, then count.
    Output ``(center, context, n)``."""
    corpus = walk_corpus_sql(edges_cte, walks_per_vertex, walk_length, seed)
    head, final = corpus.rsplit("\n", 1)
    return (head + ",\ncorpus AS MATERIALIZED (" + final + "),"
            "\npr AS (SELECT c1.vertex AS center, c2.vertex AS context"
            " FROM corpus c1 JOIN corpus c2"
            " ON c1.walker_id = c2.walker_id AND c1.walk = c2.walk"
            f" AND c2.step - c1.step BETWEEN 1 AND {window}"
            " UNION ALL SELECT c2.vertex AS center, c1.vertex AS context"
            " FROM corpus c1 JOIN corpus c2"
            " ON c1.walker_id = c2.walker_id AND c1.walk = c2.walk"
            f" AND c2.step - c1.step BETWEEN 1 AND {window})"
            "\nSELECT center, context, count(*) AS n FROM pr GROUP BY 1, 2")


def _hyperball_scaffold(edges_cte: str, b: int, seed: int,
                        max_distance: int):
    """Shared CTE scaffolding for the HyperBall oracles: ``e``, ``verts``,
    the unrolled ball relations ``r0..r{max_distance}``
    (R_{t+1} = R_t \u222a R_t\u2218E, pure set algebra), and ``mh(mm, j, rho)`` \u2014
    each vertex's HLL register (index, rank) from
    ``engine.anf_init_hll``'s splitmix64(vertex ^ seed) hash, rank via the
    engine's exact shift-cascade bit-length. Returns (parts, m, alpha,
    rho_max)."""
    m = 1 << b
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    rho_max = 64 - b + 1
    parts = [
        f"WITH e AS MATERIALIZED ({edges_cte})",
        "verts AS MATERIALIZED (SELECT DISTINCT src AS v FROM"
        " (SELECT src FROM e UNION ALL SELECT dst FROM e) t(src))",
        "r0 AS (SELECT v AS mm, v AS v FROM verts)",
    ]
    for t in range(max_distance):
        parts.append(
            f"r{t + 1} AS MATERIALIZED (SELECT DISTINCT mm, v FROM ("
            f" SELECT mm, v FROM r{t}"
            f" UNION ALL"
            f" SELECT r.mm, e.dst AS v FROM r{t} r JOIN e ON e.src = r.v))")
    mixed = _splitmix64_sql(
        f"SELECT mm, xor(mm::HUGEINT, {seed}::HUGEINT) AS x"
        " FROM (SELECT DISTINCT mm FROM verts t(mm))",
        "mm", "x", "mx")
    # leading-zero rank of w = (h << b) mod 2^64 via the engine's shift
    # cascade (bit length bl; rho = 64 - bl + 1; w == 0 -> rho_max)
    q = (f"SELECT mm, mx >> {64 - b} AS j,"
         f" (mx << {b}) % {_M64} AS w, 0 AS bl FROM ({mixed})")
    for s in (32, 16, 8, 4, 2, 1):
        q = (f"SELECT mm, j, CASE WHEN w >= (1::HUGEINT << {s})"
             f" THEN w >> {s} ELSE w END AS w,"
             f" bl + CASE WHEN w >= (1::HUGEINT << {s}) THEN {s} ELSE 0 END"
             f" AS bl FROM ({q})")
    parts.append(
        f"mh AS MATERIALIZED (SELECT mm, j,"
        f" CASE WHEN w = 0 AND bl = 0 THEN {rho_max}"
        f" ELSE 64 - (bl + w) + 1 END AS rho FROM ({q}))")
    return parts, m, alpha, rho_max


def _hll_ball_blocks(tag: str, ball_rel: str, m: int, alpha: float,
                     rho_max: int) -> tuple[list[str], str]:
    """CTE blocks turning ball relation ``ball_rel(mm, v)`` into per-vertex
    HLL estimates: ``regs{tag}`` (max rank per register), ``cnts{tag}``
    (register-value counts), ``est{tag}``. The indicator sum replays
    ``engine.hll_estimates``'s fixed ascending-k left-associated fold \u2014
    identical doubles \u2014 and the returned SELECT yields (v, ball) with the
    small-range linear-counting branch (``ln`` may differ by \u22641 ulp of
    libm)."""
    blocks = [
        f"regs{tag} AS MATERIALIZED (SELECT bb.v, mh.j, max(mh.rho) AS r"
        f" FROM {ball_rel} bb JOIN mh ON mh.mm = bb.mm GROUP BY 1, 2)",
    ]
    csel = ", ".join(
        f"sum(CASE WHEN r = {k} THEN 1 ELSE 0 END) AS c{k}"
        for k in range(1, rho_max + 1))
    blocks.append(f"cnts{tag} AS (SELECT v, count(*) AS nocc, {csel}"
                  f" FROM regs{tag} GROUP BY 1)")
    inv = f"(({m} - nocc) * 1.0)"
    for k in range(1, rho_max + 1):
        inv = f"({inv} + c{k} * {2.0 ** -k!r})"
    blocks.append(f"est{tag} AS (SELECT v, ({m} - nocc) AS z,"
                  f" {alpha!r} * {m} * {m} / {inv} AS raw FROM cnts{tag})")
    sel = (f"SELECT v, CASE WHEN raw <= {2.5 * m!r} AND z > 0"
           f" THEN {m} * ln({m} / z) ELSE raw END AS ball FROM est{tag}")
    return blocks, sel


def hyperball_sql(edges_cte: str, b: int = 6, seed: int = 1,
                  max_distance: int = 4) -> str:
    """``ShardedGraph.neighborhood_function(mode='hll') \u2192 anf_ball_sizes``
    mirror: per-vertex HyperBall in-ball HLL estimates at distance
    ``max_distance`` (Boldi-Rosa-Vigna HyperBall; registers from
    ``engine.anf_init_hll``'s splitmix64(vertex ^ seed) hash).

    Exactness: ball membership is set algebra (unrolled relation
    R_{t+1} = R_t \u222a R_t\u2218E); register j / rank rho are integer bit ops; the
    HLL indicator sum mirrors ``engine.hll_estimates``'s fixed ascending-k
    count fold as one left-associated expression \u2014 identical doubles, not
    approximations. The linear-counting branch's ``ln`` may differ by 1 ulp
    of libm (far below the gate's 9-dp rounding)."""
    parts, m, alpha, rho_max = _hyperball_scaffold(edges_cte, b, seed,
                                                   max_distance)
    blocks, sel = _hll_ball_blocks("", f"r{max_distance}", m, alpha, rho_max)
    parts.extend(blocks)
    return (",\n".join(parts)
            + "\n" + sel.replace("SELECT v,", "SELECT v AS vertex,", 1))


def anf_hll_sql(edges_cte: str, b: int = 6, seed: int = 1,
                max_distance: int = 4) -> str:
    """``ShardedGraph.neighborhood_function(mode='hll')`` mirror: the
    neighborhood function N(t) for t = 0..max_distance as the sum of
    per-vertex HyperBall estimates, floor-quantized to the engine's fixed
    2^-20 grid (``engine.ANF_HLL_QUANT``) so the sum is exact integer
    arithmetic \u2014 identical to the engine's arbitrary-precision fold
    regardless of partitioning or summation order. Each t reuses the
    shared scaffold's ball relation r{t} and the hll fold of
    :func:`hyperball_sql`."""
    parts, m, alpha, rho_max = _hyperball_scaffold(edges_cte, b, seed,
                                                   max_distance)
    quant = repr(float(1 << 20))
    selects = []
    for t in range(max_distance + 1):
        blocks, sel = _hll_ball_blocks(f"_t{t}", f"r{t}", m, alpha, rho_max)
        parts.extend(blocks)
        selects.append(
            f"SELECT {t}::BIGINT AS distance,"
            f" CAST(sum(CAST(floor(ball * {quant}) AS HUGEINT)) AS DOUBLE)"
            f" / {quant} AS reachable_pairs FROM ({sel}) b{t}")
    return ",\n".join(parts) + "\n" + "\nUNION ALL ".join(selects)


def node2vec_visits_sql(edges_cte: str, starts: list[int], num_steps: int,
                        p: float, q: float, reset_prob: float,
                        seed: int) -> str:
    """``ShardedGraph.node2vec_walks`` mirror (Grover & Leskovec 2016
    second-order biased walks → visit counts).  Everything is
    deterministic: the four per-step uniforms are pure functions of
    (seed, walker, step) (embedded as 53-bit literals, the
    :func:`walk_visits_sql` policy), candidates are N(cur) in the canonical
    (src, dst) order with multiplicity, class weights ``n_ret/p + n_in·1.0
    + n_out/q`` are the literal same float expression, and the k-th
    candidate of the drawn class is picked by a row_number within
    (walker, class).  State per step is (wid, start, cur, prev) with
    prev = -1 after a reset/start (first-order steps sample uniformly).
    Visits counted at steps 0..num_steps-1."""
    from cassovary_ray.hashing import splitmix64

    wid = np.arange(len(starts), dtype=np.uint64)
    u_rows = []
    for t in range(num_steps - 1):
        ks = [np.uint64(int(splitmix64(np.uint64(4 * t + i) ^ np.uint64(seed))))
              for i in range(4)]
        with np.errstate(over="ignore"):
            us = [splitmix64(wid ^ k) >> np.uint64(11) for k in ks]
        u_rows.extend(
            f"({int(w)}, {t}, {int(a)}, {int(b)}, {int(c)}, {int(d)})"
            for w, a, b, c, d in zip(wid, *us))
    start_rows = ", ".join(f"({i}, {int(s)})" for i, s in enumerate(starts))
    T = "9007199254740992.0"  # 2^53
    parts = [
        f"WITH e AS MATERIALIZED ({edges_cte})",
        "verts AS (SELECT src AS v FROM e UNION SELECT dst FROM e)",
        "deg AS MATERIALIZED (SELECT src, count(*) AS deg FROM e GROUP BY 1)",
        "adj AS MATERIALIZED (SELECT src, dst, row_number()"
        " OVER (PARTITION BY src ORDER BY dst) - 1 AS k FROM e)",
        f"uu(wid, t, ur, un, uc, ui) AS (VALUES {', '.join(u_rows)})",
        f"s0 AS (SELECT wid, st AS start, st AS cur, CAST(-1 AS BIGINT)"
        f" AS prev FROM (VALUES {start_rows}) w(wid, st)"
        " WHERE st IN (SELECT v FROM verts))",
    ]
    for t in range(num_steps - 1):
        # d: state + degree + uniforms + reset/first-order flags
        parts.append(
            f"d{t} AS MATERIALIZED ("
            f" SELECT s.wid, s.start, s.cur, s.prev, COALESCE(g.deg, 0) AS dg,"
            f" u.ur / {T} < {reset_prob!r} OR COALESCE(g.deg, 0) = 0 AS rst,"
            f" u.un, u.uc, u.ui"
            f" FROM s{t} s JOIN uu u ON u.wid = s.wid AND u.t = {t}"
            f" LEFT JOIN deg g ON g.src = s.cur)")
        # cl: per-candidate class rows for second-order walkers
        parts.append(
            f"cl{t} AS MATERIALIZED ("
            f" SELECT d.wid, a.k, a.dst,"
            f" CASE WHEN a.dst = d.prev THEN 0"
            f"      WHEN EXISTS (SELECT 1 FROM e pe"
            f"                   WHERE pe.src = d.prev AND pe.dst = a.dst)"
            f"      THEN 1 ELSE 2 END AS cls"
            f" FROM d{t} d JOIN adj a ON a.src = d.cur"
            f" WHERE NOT d.rst AND d.prev >= 0)")
        # cn: the drawn class + in-class index per second-order walker
        parts.append(
            f"cn{t} AS MATERIALIZED ("
            f" SELECT wid, cls2 AS cls,"
            f" LEAST(CAST(floor(ui2 * GREATEST(CASE cls2 WHEN 0 THEN n0"
            f"  WHEN 1 THEN n1 ELSE n2 END, 1)) AS BIGINT),"
            f"  CASE cls2 WHEN 0 THEN n0 WHEN 1 THEN n1 ELSE n2 END - 1)"
            f" AS kk FROM ("
            f"  SELECT wid, ui2, n0, n1, n2,"
            f"  CASE WHEN tv < n0 / {p!r} THEN 0"
            f"       WHEN tv < n0 / {p!r} + n1 THEN 1 ELSE 2 END AS cls2"
            f"  FROM ("
            f"   SELECT c.wid,"
            f"   sum(CASE WHEN cls = 0 THEN 1 ELSE 0 END) AS n0,"
            f"   sum(CASE WHEN cls = 1 THEN 1 ELSE 0 END) AS n1,"
            f"   sum(CASE WHEN cls = 2 THEN 1 ELSE 0 END) AS n2,"
            f"   any_value(d.uc) / {T}"
            f"    * (sum(CASE WHEN cls = 0 THEN 1 ELSE 0 END) / {p!r}"
            f"       + sum(CASE WHEN cls = 1 THEN 1 ELSE 0 END) * 1.0"
            f"       + sum(CASE WHEN cls = 2 THEN 1 ELSE 0 END) / {q!r})"
            f"    AS tv,"
            f"   any_value(d.ui) / {T} AS ui2"
            f"   FROM cl{t} c JOIN d{t} d ON d.wid = c.wid GROUP BY c.wid)))")
        # next state: first-order (reset/no-prev) pick uniform; else class pick
        parts.append(
            f"s{t + 1} AS MATERIALIZED ("
            f" SELECT d.wid, d.start,"
            f"  CASE WHEN d.rst THEN d.start ELSE a.dst END AS cur,"
            f"  CASE WHEN d.rst THEN CAST(-1 AS BIGINT) ELSE d.cur END AS prev"
            f" FROM d{t} d LEFT JOIN adj a ON a.src = d.cur AND a.k ="
            f"  LEAST(CAST(floor((d.un / {T}) * GREATEST(d.dg, 1)) AS BIGINT),"
            f"        d.dg - 1)"
            f" WHERE d.rst OR d.prev < 0"
            f" UNION ALL"
            f" SELECT d.wid, d.start, pick.dst AS cur, d.cur AS prev"
            f" FROM d{t} d JOIN cn{t} n ON n.wid = d.wid"
            f" JOIN (SELECT wid, cls, dst, row_number() OVER"
            f"       (PARTITION BY wid, cls ORDER BY k) - 1 AS r"
            f"       FROM cl{t}) pick"
            f"  ON pick.wid = d.wid AND pick.cls = n.cls AND pick.r = n.kk"
            f" WHERE NOT d.rst AND d.prev >= 0)")
    vis = " UNION ALL ".join(f"SELECT cur FROM s{t}" for t in range(num_steps))
    return (",\n".join(parts)
            + f"\nSELECT cur AS vertex, count(*) AS visits FROM ({vis})"
            " GROUP BY 1")


def count_min_sql(depth: int = 4, width: int = 256, seed: int = 7,
                  key_col: str = "user_id", table: str = "events") -> str:
    """``events.count_min_counts`` mirror (Cormode & Muthukrishnan 2005):
    the sketch is rebuilt in SQL — per-(row, cell) sums of exact key counts
    — and the estimate is the min over the depth rows. Pure integer
    arithmetic end to end; the salts are the literal
    ``events._cm_salts(depth, seed)`` values and the cell hash replays
    ``splitmix64(key ⊕ salt) mod width`` in HUGEINT limbs."""
    from cassovary_ray.events import _cm_salts

    salts = _cm_salts(depth, seed)
    salt_rows = ", ".join(f"({j}, {int(s)}::HUGEINT)"
                          for j, s in enumerate(salts))
    mixed = _splitmix64_sql(
        f"SELECT {key_col}, j, xor({key_col}::HUGEINT, salt) AS x"
        " FROM keys CROSS JOIN salts",
        f"{key_col}, j", "x", "mx")
    return f"""
        WITH keys AS MATERIALIZED (
            SELECT {key_col}, CAST(count(*) AS BIGINT) AS n_exact
            FROM {table} GROUP BY 1),
        salts(j, salt) AS (VALUES {salt_rows}),
        hx AS MATERIALIZED (
            SELECT {key_col}, j, CAST(mx % {width} AS BIGINT) AS k
            FROM ({mixed})),
        sketch AS (
            SELECT h.j, h.k, CAST(sum(kk.n_exact) AS BIGINT) AS cnt
            FROM hx h JOIN keys kk USING ({key_col}) GROUP BY 1, 2),
        est AS (
            SELECT h.{key_col}, CAST(min(s.cnt) AS BIGINT) AS cm_estimate
            FROM hx h JOIN sketch s USING (j, k) GROUP BY 1)
        SELECT k.{key_col}, k.n_exact, e.cm_estimate
        FROM keys k JOIN est e USING ({key_col})
    """
