"""Link-graph analysis over (src, dst) edge frames — the URL/host
centrality stage of crawl curation (Common Crawl publishes exactly
this: host- and domain-level PageRank/harmonic ranks computed from
the crawl's link graph, used as a quality prior for URL selection).
Composes with the rest of the pipeline: `sources/warc.read_warc` +
`operators/html` link extraction produce edges; `similarity.
knn_graph` emits a (src, dst, cosine) frame that feeds the same
operators.

Design for 100 TB: every step is an equi-join / aggregation keyed on
node ids — no adjacency matrices, no driver-side graph.  PageRank
power iteration materializes its node-sized rank frame per superstep
(`localCheckpoint` — the same lineage-truncation pattern as
`dedup.connected_components`); callers should `persist()` the edge
frame across iterations (the operator caches it by default).

No counterpart in the reference (a geospatial engine); the operator
family follows the published formulation (Page et al. 1999, with
uniform teleport and dangling-mass redistribution).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degrees(edges: DataFrame, src_col: str = "src",
            dst_col: str = "dst") -> DataFrame:
    """(node, out_degree, in_degree) over an edge list — one
    aggregation per direction and a full-outer merge; isolated
    directions coalesce to 0."""
    out = (edges.groupBy(F.col(src_col).alias("node"))
           .agg(F.count("*").alias("out_degree")))
    inn = (edges.groupBy(F.col(dst_col).alias("node"))
           .agg(F.count("*").alias("in_degree")))
    return (out.join(inn, "node", "full")
            .select("node",
                    F.coalesce("out_degree", F.lit(0)).cast("long")
                    .alias("out_degree"),
                    F.coalesce("in_degree", F.lit(0)).cast("long")
                    .alias("in_degree")))


def pagerank(edges: DataFrame, src_col: str = "src",
             dst_col: str = "dst", iters: int = 10,
             damping: float = 0.85,
             dedup_edges: bool = True) -> DataFrame:
    """PageRank by power iteration: returns (node, pagerank) over
    every node appearing as a source or destination.

    ``pr'(v) = (1 - d)/N + d * (sum over in-edges u->v of
    pr(u)/out(u) + dangling_mass/N)`` — uniform teleport, dangling
    (sink) mass redistributed uniformly, so each iteration preserves
    total mass 1.  ``dedup_edges`` (default) collapses duplicate
    (src, dst) pairs first — the standard graph form; pass False to
    weight by link multiplicity.

    Ranks QUANTIZE to 12 decimals after every iteration, making the
    whole trajectory reproducible across engines (the SQL oracle
    unrolls the same updates); quantization error is orders below
    the teleport floor.

    Distributed shape: one rank frame of N rows re-derived per
    superstep through two aggregations (contributions shuffle on the
    destination, dangling mass is a 1-row broadcast) and
    ``localCheckpoint``-materialized so the plan does not deepen with
    ``iters``; the edge and out-degree frames are cached once and
    reused by every iteration.  Node count N is the one driver-side
    scalar (a count job at call time)."""
    d = float(damping)
    e = edges.select(F.col(src_col).alias("_s"),
                     F.col(dst_col).alias("_t"))
    if dedup_edges:
        e = e.distinct()
    e = e.cache()
    nodes = (e.select(F.col("_s").alias("node"))
             .union(e.select(F.col("_t").alias("node")))
             .distinct().cache())
    n = nodes.count()
    if n == 0:
        return nodes.select("node", F.lit(0.0).alias("pagerank"))
    outd = e.groupBy("_s").agg(F.count("*").alias("_od")).cache()
    pr = nodes.select(
        "node", F.round(F.lit(1.0) / F.lit(float(n)), 12)
        .alias("pagerank")).localCheckpoint()
    for _ in range(int(iters)):
        ranked = pr.join(outd, pr["node"] == outd["_s"], "left")
        dangling = (ranked.filter(F.col("_od").isNull())
                    .agg(F.coalesce(F.sum("pagerank"), F.lit(0.0))
                         .alias("_dm")))
        contrib = (e.join(pr, e["_s"] == pr["node"])
                   .join(outd, "_s")
                   .groupBy(F.col("_t").alias("node"))
                   .agg(F.sum(F.col("pagerank") / F.col("_od"))
                        .alias("_c")))
        pr = (nodes.join(contrib, "node", "left")
              .crossJoin(F.broadcast(dangling))
              .select(
                  "node",
                  F.round(
                      F.lit(1.0 - d) / F.lit(float(n))
                      + F.lit(d) * (F.coalesce(F.col("_c"), F.lit(0.0))
                                    + F.col("_dm") / F.lit(float(n))),
                      12).alias("pagerank"))
              .localCheckpoint())
    return pr


def hits(edges: DataFrame, src_col: str = "src",
         dst_col: str = "dst", iters: int = 10,
         dedup_edges: bool = True) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999): returns
    (node, authority, hub) over every node appearing as a source or
    destination — the complement of :func:`pagerank` for crawl-seed
    and directory-page discovery (a high-hub page links to many
    high-authority pages; CC-style seed curation ranks both).

    Per iteration, the standard mutual-reinforcement updates:
    ``auth'(v) = Σ over in-edges u→v of hub(u)`` then ``hub'(v) =
    Σ over out-edges v→w of auth'(w)`` (the NEW authorities — the
    textbook Gauss-Seidel-style ordering), each vector L2-normalized
    after its update.  Scores QUANTIZE to 12 decimals after every
    sum and normalization, so the trajectory reproduces across
    engines and the SQL oracle can unroll the identical updates
    (the :func:`pagerank` convention).  ``dedup_edges`` as in
    :func:`pagerank`.

    Distributed shape: two aggregations per iteration (contributions
    shuffle on the receiving node; each L2 norm is a 1-row broadcast),
    auth/hub frames are node-sized and ``localCheckpoint``-materialized
    per superstep so the plan does not deepen with ``iters``; the edge
    frame is cached once.  No matrices, no driver-side graph — only a
    0-row emptiness probe at call time."""
    e = edges.select(F.col(src_col).alias("_s"),
                     F.col(dst_col).alias("_t"))
    if dedup_edges:
        e = e.distinct()
    e = e.cache()
    nodes = (e.select(F.col("_s").alias("node"))
             .union(e.select(F.col("_t").alias("node")))
             .distinct().cache())
    if nodes.isEmpty():
        return nodes.select("node", F.lit(0.0).alias("authority"),
                            F.lit(0.0).alias("hub"))
    # iteration 1's authority update reads hubs alone (the
    # Gauss-Seidel ordering above); auth still needs a frame so
    # iters=0 returns the initial (1.0, 1.0) vectors like pagerank
    # returns its initialized ranks
    hub = nodes.select("node", F.lit(1.0).alias("hub")).localCheckpoint()
    auth = nodes.select("node", F.lit(1.0).alias("authority"))

    def _normalized(raw, col):
        """nodes left-join raw sums, L2-normalize, quantize."""
        norm = raw.agg(F.round(
            F.sqrt(F.sum(F.col(col) * F.col(col))), 12).alias("_n"))
        return (nodes.join(raw, "node", "left")
                .crossJoin(F.broadcast(norm))
                .select("node",
                        F.round(
                            F.when(F.col("_n") > 0,
                                   F.coalesce(F.col(col), F.lit(0.0))
                                   / F.col("_n"))
                            .otherwise(F.lit(0.0)), 12).alias(col))
                .localCheckpoint())

    for _ in range(int(iters)):
        araw = (e.join(hub, e["_s"] == hub["node"])
                .groupBy(F.col("_t").alias("node"))
                .agg(F.round(F.sum("hub"), 12).alias("authority")))
        auth = _normalized(araw, "authority")
        hraw = (e.join(auth, e["_t"] == auth["node"])
                .groupBy(F.col("_s").alias("node"))
                .agg(F.round(F.sum("authority"), 12).alias("hub")))
        hub = _normalized(hraw, "hub")
    return auth.join(hub, "node")
