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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from ..barrier import plan_barrier


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
        .alias("pagerank")).transform(plan_barrier)
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
              .transform(plan_barrier))
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
    hub = nodes.select("node", F.lit(1.0).alias("hub")).transform(plan_barrier)
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
                .transform(plan_barrier))

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


def harmonic_centrality(edges: DataFrame, src_col: str = "src",
                        dst_col: str = "dst", max_dist: int = 6,
                        p: int = 10, mode: str = "in") -> DataFrame:
    """Approximate harmonic centrality via HyperBall (Boldi & Vigna
    2013) — the OTHER rank Common Crawl publishes for hosts alongside
    PageRank: ``H(v) = Σ over u != v with d(u,v) < ∞ of 1/d(u,v)``,
    rewarding nodes many others reach in few hops, robust to rank
    sinks.  Exact computation is all-pairs shortest paths; HyperBall
    is the published web-scale algorithm, and it composes directly
    with this module's portable HLL machinery: the ball
    ``B_t(v)`` (nodes within distance t) is an HLL register frame,
    and one superstep is ``B_t(v) = B_{t-1}(v) ∪ ⋃ B_{t-1}(u)`` over
    the in-edges (u, v) — an edge equi-join + a max-merge
    aggregation.  ``H(v) ≈ Σ_t (|B_t| - |B_{t-1}|) / t`` up to
    ``max_dist`` (CC caps the radius the same way; contributions
    beyond it are below 1/max_dist each).

    Engine-portable by construction: registers come from the 60-bit
    md5 hash of the node id, ball counts round to integers through
    `sketches.hll_estimate`, and the per-step accumulation
    ``round(h + (c_t - c_{t-1}) / t, 12)`` is the same left-
    associated IEEE arithmetic in Spark and the SQL oracle, so the
    whole trajectory replays bit-exactly (the `pagerank` convention).

    ``mode='in'`` (default) measures distances ALONG incoming paths
    (the host-ranking form: who can reach me); ``'out'`` reverses.
    Duplicate edges cannot change distances — the edge frame dedups.

    Distributed shape: per superstep one register-frame equi-join on
    the edge list + one map-side-combined max-merge + one estimate
    aggregation, every frame node-sized × ≤2^p rows and
    ``localCheckpoint``-materialized; a 1-row growth probe stops
    early at the REGISTER fixed point: register rows and total rho
    are each strictly monotone under max-merge, so an unchanged
    (count, Σrho) pair proves no register changed — then every later
    superstep is the identity and every later increment is exactly 0,
    so early exit can never change the result.  (Probing the estimate
    sum instead would be unsound: it is not strictly monotone at the
    estimator's branch boundary.)"""
    from .sketches import hll_estimate, hll_registers

    if mode not in ("in", "out"):
        raise ValueError(f"mode must be 'in' or 'out', got {mode!r}")
    a, b = (src_col, dst_col) if mode == "in" else (dst_col, src_col)
    e = (edges.select(F.col(a).alias("_s"), F.col(b).alias("_t"))
         .distinct().cache())
    nodes = (e.select(F.col("_s").alias("node"))
             .union(e.select(F.col("_t").alias("node")))
             .distinct().cache())
    if nodes.isEmpty():
        return nodes.select("node", F.lit(0.0).alias("harmonic"))
    regs = (hll_registers(nodes, "node", p, by=["node"])
            .transform(plan_barrier))
    prev = hll_estimate(regs, p, ["node"], "_c").transform(plan_barrier)
    harm = nodes.select("node", F.lit(0.0).alias("harmonic"))

    def _state(r):
        row = r.agg(F.count("*").alias("_k"),
                    F.sum("hll_rho").alias("_r")).head()
        return (row["_k"], row["_r"])

    state = _state(regs)
    for d in range(1, int(max_dist) + 1):
        contrib = (e.join(regs, e["_s"] == regs["node"])
                   .select(F.col("_t").alias("node"), "hll_idx",
                           "hll_rho"))
        regs = (regs.select("node", "hll_idx", "hll_rho")
                .unionByName(contrib)
                .groupBy("node", "hll_idx")
                .agg(F.max("hll_rho").alias("hll_rho"))
                .transform(plan_barrier))
        ct = hll_estimate(regs, p, ["node"], "_ct").transform(plan_barrier)
        harm = (harm.join(prev, "node").join(ct, "node")
                .select("node",
                        F.round(F.col("harmonic")
                                + (F.col("_ct") - F.col("_c"))
                                .cast("double") / F.lit(float(d)),
                                12).alias("harmonic"))
                .transform(plan_barrier))
        prev = ct.withColumnRenamed("_ct", "_c")
        nstate = _state(regs)
        if nstate == state:
            break
        state = nstate
    return harm


def triangles(edges: DataFrame, src_col: str = "src",
              dst_col: str = "dst") -> DataFrame:
    """EXACT per-node triangle counts over the undirected simple view
    of an edge list — the link-farm / community-density signal next
    to `label_propagation` (a host whose neighbors interlink is a
    site family or a ring; Common Crawl-scale webgraph studies report
    triangle/clustering statistics for exactly this).  Returns
    (node, degree, triangles) for every node of the simple graph;
    self-loops drop, duplicate/reverse edges collapse.

    Distributed shape — the degree-ordered orientation (Cohen 2009 /
    Suri & Vassilvitskii 2011, the published MapReduce form): each
    undirected edge orients from the lower (degree, node) endpoint to
    the higher, so every triangle closes at exactly ONE wedge and
    per-source out-degrees are O(√m)-bounded — the wedge self-join
    does Σ outdeg(u)² ≤ O(m^1.5) work instead of Σ deg(v)² (a hub of
    degree d never generates d² wedges; its edges point INTO it).
    Three equi-joins + one aggregation, all keyed on node ids; no
    driver-side graph, the only scalars are none at all."""
    e = (edges.select(F.col(src_col).alias("_s"),
                      F.col(dst_col).alias("_t"))
         .filter(F.col("_s") != F.col("_t")))
    pairs = (e.select(F.least("_s", "_t").alias("_a"),
                      F.greatest("_s", "_t").alias("_b"))
             .distinct().cache())
    deg, triples = _triangle_triples(pairs)
    tri = (triples
           .select(F.explode(F.array("u", "v1", "v2")).alias("node"))
           .groupBy("node").agg(F.count("*").alias("triangles")))
    return (deg.join(tri, "node", "left")
            .select("node", F.col("degree").cast("long").alias("degree"),
                    F.coalesce("triangles", F.lit(0)).cast("long")
                    .alias("triangles")))


def _triangle_triples(pairs: DataFrame) \
        -> tuple[DataFrame, DataFrame]:
    """(degree frame, triangle triples (u, v1, v2)) over a CANONICAL
    (_a < _b) distinct pair frame — the degree-ordered-orientation
    core shared by `triangles` and `k_truss`: every triangle closes
    at exactly one wedge, per-source out-degrees O(√m)-bounded."""
    deg = (pairs.select(F.col("_a").alias("node"))
           .unionAll(pairs.select(F.col("_b").alias("node")))
           .groupBy("node").agg(F.count("*").alias("degree"))
           .cache())
    da = deg.select(F.col("node").alias("_a"),
                    F.col("degree").alias("_da"))
    db = deg.select(F.col("node").alias("_b"),
                    F.col("degree").alias("_db"))
    ranked = pairs.join(da, "_a").join(db, "_b")
    a_lower = ((F.col("_da") < F.col("_db"))
               | ((F.col("_da") == F.col("_db"))
                  & (F.col("_a") < F.col("_b"))))
    o = (ranked.select(
        F.when(a_lower, F.col("_a")).otherwise(F.col("_b")).alias("u"),
        F.when(a_lower, F.col("_b")).otherwise(F.col("_a")).alias("v"),
        F.when(a_lower, F.col("_db")).otherwise(F.col("_da"))
        .alias("dv")).cache())
    o1 = o.select(F.col("u"), F.col("v").alias("v1"),
                  F.col("dv").alias("d1"))
    o2 = o.select(F.col("u"), F.col("v").alias("v2"),
                  F.col("dv").alias("d2"))
    wedges = (o1.join(o2, "u")
              .filter((F.col("d1") < F.col("d2"))
                      | ((F.col("d1") == F.col("d2"))
                         & (F.col("v1") < F.col("v2")))))
    closing = o.select(F.col("v").alias("v2"),
                       F.col("u").alias("v1"))
    return deg, wedges.join(closing, ["v1", "v2"]) \
        .select("u", "v1", "v2")


def k_truss(edges: DataFrame, k: int = 3, src_col: str = "src",
            dst_col: str = "dst", max_iters: int = 20) -> DataFrame:
    """k-truss edge peeling (Cohen 2008) — the EDGE-density
    decomposition next to `core_numbers`' node one: the k-truss is
    the maximal subgraph where every edge sits in >= k-2 triangles
    WITHIN the subgraph (k=3 keeps any triangle edge; a link ring's
    mutually-citing clique survives large k while organic links
    peel away).  Per round: recount per-edge triangle support over
    the surviving canonical edge set (the `triangles` wedge pipeline,
    O(m^1.5)), drop every under-supported edge SIMULTANEOUSLY (the
    standard parallel peeling — same fixed point as sequential),
    stop at the fixed point or after ``max_iters`` rounds (the
    intermediate state is then a deterministic superset of the
    truss).  Returns surviving (a, b, support) with support
    self-consistent in the final state.  Peeling is idempotent at
    the fixed point, so a replay that unrolls MORE rounds returns
    the identical frame — the oracle convention shared with
    `core_numbers`."""
    if int(k) < 3:
        raise ValueError("k must be >= 3 (k-2 triangles per edge)")
    need = int(k) - 2
    e = (edges.select(F.col(src_col).alias("_s"),
                      F.col(dst_col).alias("_t"))
         .filter(F.col("_s") != F.col("_t")))
    cur = (e.select(F.least("_s", "_t").alias("_a"),
                    F.greatest("_s", "_t").alias("_b"))
           .distinct().transform(plan_barrier))

    def _support(pairs):
        _, triples = _triangle_triples(pairs)
        sup = (triples.select(
                   F.least("u", "v1").alias("_a"),
                   F.greatest("u", "v1").alias("_b"))
               .unionAll(triples.select(
                   F.least("u", "v2").alias("_a"),
                   F.greatest("u", "v2").alias("_b")))
               .unionAll(triples.select(
                   F.least("v1", "v2").alias("_a"),
                   F.greatest("v1", "v2").alias("_b")))
               .groupBy("_a", "_b").agg(F.count("*").alias("_c")))
        return (pairs.join(sup, ["_a", "_b"], "left")
                .select(F.col("_a").alias("a"),
                        F.col("_b").alias("b"),
                        F.coalesce("_c", F.lit(0)).cast("long")
                        .alias("support")))

    for _ in range(int(max_iters)):
        sup = _support(cur).transform(plan_barrier)
        if sup.filter(F.col("support") < need).isEmpty():
            return sup
        cur = (sup.filter(F.col("support") >= need)
               .select(F.col("a").alias("_a"), F.col("b").alias("_b"))
               .transform(plan_barrier))
    return _support(cur)


def clustering_coefficient(edges: DataFrame, src_col: str = "src",
                           dst_col: str = "dst") -> DataFrame:
    """Local clustering coefficient from exact triangle counts:
    ``c(v) = 2·tri(v) / (deg(v)·(deg(v)-1))`` over the undirected
    simple graph (degree-1 nodes score 0.0).  Integer inputs → one
    IEEE division quantized to 12 decimals, so the SQL oracle replays
    it exactly.  Returns (node, degree, triangles, clustering)."""
    t = triangles(edges, src_col, dst_col)
    d = F.col("degree").cast("double")
    return t.select(
        "node", "degree", "triangles",
        F.when(F.col("degree") < 2, F.lit(0.0))
        .otherwise(F.round(F.lit(2.0)
                           * F.col("triangles").cast("double")
                           / (d * (d - F.lit(1.0))), 12))
        .alias("clustering"))


def link_prediction_scores(edges: DataFrame, candidates: DataFrame,
                           src_col: str = "src",
                           dst_col: str = "dst",
                           u_col: str = "u",
                           v_col: str = "v") -> DataFrame:
    """Classic link-prediction scores for a CANDIDATE pair frame
    (Liben-Nowell & Kleinberg 2003) — "which hosts will link next /
    which mirror pairs are we missing": per (u, v) candidate, the
    common-neighbor count, Jaccard overlap of neighborhoods, and
    Adamic-Adar ``Σ_{w ∈ N(u)∩N(v)} 1/ln(deg w)`` over the undirected
    simple graph.  Self-pairs raise — their neighborhood overlap is
    meaningless.

    Candidates are REQUIRED rather than enumerated: scoring all
    2-hop pairs is Σ_w deg(w)² — a hub explosion no cap fixes
    honestly.  Callers bring the pairs a recall stage produced
    (LSH buckets, top-k retrieval, editorial lists), and the cost is
    two |candidates|-keyed equi-joins against the adjacency plus one
    midpoint join — linear in candidate adjacency volume.

    Determinism: counts are exact integers; Jaccard is one quantized
    division; Adamic-Adar sums ``round(1/ln(d_w), 12)`` terms (each
    quantized BEFORE the sum, then the sum quantized — the
    order-robust double-sum convention) — degree-1 midpoints cannot
    occur (a common neighbor has degree >= 2).  Returns
    (u, v, common_neighbors, jaccard, adamic_adar)."""
    e = (edges.select(F.col(src_col).alias("_s"),
                      F.col(dst_col).alias("_t"))
         .filter(F.col("_s") != F.col("_t")))
    und = (e.unionAll(e.select(F.col("_t").alias("_s"),
                               F.col("_s").alias("_t")))
           .distinct().cache())
    deg = (und.groupBy(F.col("_s").alias("node"))
           .agg(F.count("*").cast("long").alias("_deg")))
    cand = (candidates.select(F.col(u_col).alias("u"),
                              F.col(v_col).alias("v")).distinct())
    bad = cand.filter(F.col("u") == F.col("v"))
    if bad.limit(1).count() > 0:
        raise ValueError("link_prediction_scores: candidate frame "
                         "contains self-pairs (u == v)")
    nu = und.select(F.col("_s").alias("u"), F.col("_t").alias("_w"))
    nv = und.select(F.col("_s").alias("v"), F.col("_t").alias("_w"))
    common = (cand.join(nu, "u").join(nv, ["v", "_w"])
              .join(deg.select(F.col("node").alias("_w"),
                               F.col("_deg").alias("_dw")), "_w")
              .groupBy("u", "v")
              .agg(F.count("*").cast("long").alias("common_neighbors"),
                   F.round(F.sum(F.round(
                       F.lit(1.0) / F.log(F.col("_dw").cast("double")),
                       12)), 12).alias("adamic_adar")))
    du = deg.select(F.col("node").alias("u"),
                    F.col("_deg").alias("_du"))
    dv = deg.select(F.col("node").alias("v"),
                    F.col("_deg").alias("_dv"))
    return (cand.join(du, "u", "left").join(dv, "v", "left")
            .join(common, ["u", "v"], "left")
            .select(
                "u", "v",
                F.coalesce("common_neighbors", F.lit(0)).cast("long")
                .alias("common_neighbors"),
                F.when(
                    (F.coalesce("_du", F.lit(0))
                     + F.coalesce("_dv", F.lit(0))
                     - F.coalesce("common_neighbors", F.lit(0))) == 0,
                    F.lit(0.0))
                .otherwise(F.round(
                    F.coalesce("common_neighbors", F.lit(0))
                    .cast("double")
                    / (F.coalesce("_du", F.lit(0))
                       + F.coalesce("_dv", F.lit(0))
                       - F.coalesce("common_neighbors", F.lit(0)))
                    .cast("double"), 12)).alias("jaccard"),
                F.coalesce("adamic_adar", F.lit(0.0))
                .alias("adamic_adar")))


def graph_summary(edges: DataFrame, src_col: str = "src",
                  dst_col: str = "dst") -> DataFrame:
    """One-row webgraph data card — the headline numbers crawl-graph
    releases publish: node/edge counts, RECIPROCITY (fraction of
    directed edges whose reverse also exists — mutual-link density,
    a link-scheme signal), density, degree extremes, and global
    TRANSITIVITY ``3·triangles / open-or-closed wedges`` (how
    clustered the graph is overall — the complement of the per-node
    `clustering_coefficient`).  Every statistic is a ratio of exact
    integers with one quantized division, so the SQL oracle recounts
    them method-free.

    Distributed shape: the directed dedup + a self-join on the
    reversed pair (reciprocity), the `triangles` pipeline (wedge
    bound O(m^1.5)), and two aggregations — nothing driver-side."""
    d = (edges.select(F.col(src_col).alias("_s"),
                      F.col(dst_col).alias("_t"))
         .filter(F.col("_s") != F.col("_t")).distinct().cache())
    rev = d.select(F.col("_t").alias("_s"), F.col("_s").alias("_t"))
    recip = d.join(rev, ["_s", "_t"], "left_semi") \
        .agg(F.count("*").alias("_r"))
    dstats = (d.agg(F.count("*").alias("_m_dir"))
              .crossJoin(F.broadcast(recip)))
    t = triangles(d, "_s", "_t")
    tstats = t.agg(
        F.count("*").cast("long").alias("n_nodes"),
        (F.sum("degree") / F.lit(2)).cast("long").alias("m_edges"),
        (F.sum("triangles") / F.lit(3)).cast("long")
        .alias("n_triangles"),
        F.sum(F.col("degree") * (F.col("degree") - F.lit(1)))
        .cast("long").alias("_wedges2"),
        F.max("degree").cast("long").alias("max_degree"))
    return (tstats.crossJoin(F.broadcast(dstats)).select(
        "n_nodes", "m_edges",
        F.col("_m_dir").cast("long").alias("m_directed"),
        "n_triangles", "max_degree",
        F.round(F.col("_r").cast("double")
                / F.col("_m_dir").cast("double"), 12)
        .alias("reciprocity"),
        F.round(F.lit(2.0) * F.col("m_edges").cast("double")
                / (F.col("n_nodes").cast("double")
                   * (F.col("n_nodes").cast("double") - F.lit(1.0))),
                12).alias("density"),
        F.when(F.col("_wedges2") == 0, F.lit(0.0))
        .otherwise(F.round(
            F.lit(6.0) * F.col("n_triangles").cast("double")
            / F.col("_wedges2").cast("double"), 12))
        .alias("transitivity")))


def degree_assortativity(edges: DataFrame, src_col: str = "src",
                         dst_col: str = "dst") -> DataFrame:
    """Degree assortativity coefficient (Newman 2002) of the
    undirected simple graph — the one-number mixing summary webgraph
    studies report (the web is famously DISassortative: hubs link to
    leaves, r < 0; a link farm's clique pushes r up).  Pearson
    correlation of end-point degrees over the SYMMETRIZED edge list;
    with identical marginals the formula reduces to
    ``r = (M·Σxy − Σx·Σy) / (M·Σx² − (Σx)²)`` — every sum an exact
    integer, so the only float is one quantized division and the SQL
    oracle replays it bit-exactly.  Returns one row
    (m_edges, assortativity); degenerate graphs (all degrees equal —
    zero variance) return NULL assortativity, the convention for an
    undefined correlation.

    Distributed shape: one canonical-pair dedup + one degree
    aggregation + two broadcast-degree joins + ONE map-side-combined
    sum pass.  Sums are exact longs — correct while
    ``Σ_v deg(v)³ < 2^63`` (any host-level graph; a graph past that
    overflows to NULL rather than silently drifting)."""
    e = (edges.select(F.col(src_col).alias("_s"),
                      F.col(dst_col).alias("_t"))
         .filter(F.col("_s") != F.col("_t")))
    pairs = (e.select(F.least("_s", "_t").alias("_a"),
                      F.greatest("_s", "_t").alias("_b"))
             .distinct())
    both = (pairs.unionAll(pairs.select(F.col("_b").alias("_a"),
                                        F.col("_a").alias("_b")))
            .cache())
    deg = (both.groupBy(F.col("_a").alias("node"))
           .agg(F.count("*").cast("long").alias("_d")))
    da = F.broadcast(deg.select(F.col("node").alias("_a"),
                                F.col("_d").alias("_x")))
    db = F.broadcast(deg.select(F.col("node").alias("_b"),
                                F.col("_d").alias("_y")))
    s = (both.join(da, "_a").join(db, "_b")
         .agg(F.count("*").alias("_m"),
              F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
              F.sum("_x").alias("_sx"),
              F.sum(F.col("_x") * F.col("_x")).alias("_sxx")))
    num = F.col("_m") * F.col("_sxy") - F.col("_sx") * F.col("_sx")
    den = F.col("_m") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    return s.select(
        (F.col("_m") / F.lit(2)).cast("long").alias("m_edges"),
        F.when(den == 0, F.lit(None).cast("double"))
        .otherwise(F.round(num.cast("double") / den.cast("double"),
                           12)).alias("assortativity"))


def core_numbers(edges: DataFrame, src_col: str = "src",
                 dst_col: str = "dst", iters: int = 10) -> DataFrame:
    """k-core decomposition by the h-index iteration (Lü, Chen, Ren,
    Zhang, Zhang & Zhou, PNAS 2016): coreness — the largest k such
    that a node belongs to a subgraph where every member has >= k
    neighbors inside it — is THE robust density rank of webgraph
    curation (degree is gameable by one spam hub; coreness requires a
    mutually-dense neighborhood).  Returns (node, core) over the
    undirected simple view after ``iters`` supersteps of
    ``c(v) <- H({c(u) : u ~ v})`` initialized at degree, where H is
    the h-index; the sequence is pointwise non-increasing and reaches
    the exact coreness at the fixed point (the paper's theorem), so
    finite ``iters`` gives a deterministic upper bound that pytest
    pins to the exact peeling on converged graphs.  A 1-row probe
    stops early at the fixed point — sound because the sequence is
    monotone, so an unchanged Σc + count means every later superstep
    is the identity.

    Distributed shape: per superstep one edge equi-join + TWO
    map-side-combined aggregations and one window over the
    (node, value) HISTOGRAM — the h-index computes from value counts
    (``h = max over v of min(v, #neighbors with c >= v)``), so a
    10M-degree hub contributes at most |distinct values| rows to its
    window partition instead of 10M (the skew-free two-stage shape);
    core frames are node-sized and localCheckpoint-materialized."""
    e = (edges.select(F.col(src_col).alias("_a"),
                      F.col(dst_col).alias("_b"))
         .filter(F.col("_a") != F.col("_b")))
    und = (e.unionAll(e.select(F.col("_b").alias("_a"),
                               F.col("_a").alias("_b")))
           .distinct().cache())
    core = (und.groupBy(F.col("_a").alias("node"))
            .agg(F.count("*").cast("long").alias("core"))
            .transform(plan_barrier))

    def _state(c):
        row = c.agg(F.count("*").alias("_n"),
                    F.sum("core").alias("_s")).head()
        return (row["_n"], row["_s"])

    state = _state(core)
    for _ in range(int(iters)):
        hist = (und.join(core, und["_b"] == core["node"])
                .groupBy(F.col("_a").alias("node"),
                         F.col("core").alias("_v"))
                .agg(F.count("*").alias("_c")))
        w = (Window.partitionBy("node")
             .orderBy(F.col("_v").desc())
             .rowsBetween(Window.unboundedPreceding,
                          Window.currentRow))
        core = (hist.withColumn("_ge", F.sum("_c").over(w))
                .groupBy("node")
                .agg(F.max(F.least(F.col("_v"), F.col("_ge")))
                     .cast("long").alias("core"))
                .transform(plan_barrier))
        nstate = _state(core)
        if nstate == state:
            break
        state = nstate
    return core


def neighbourhood_function(edges: DataFrame, src_col: str = "src",
                           dst_col: str = "dst", max_dist: int = 16,
                           p: int = 10,
                           mode: str = "out") -> DataFrame:
    """HyperANF neighbourhood function (Boldi, Rosa & Vigna, WWW
    2011) — the distance-distribution summary Common Crawl-scale
    graph studies report: ``N(t) = |{(u, v) : d(u, v) <= t}|``,
    estimated as ``Σ_v |B_t(v)|`` with the same HLL ball frames as
    :func:`harmonic_centrality` (N(0) = node count, N(∞) = reachable
    pairs).  Returns one row per radius, ``(t, n_pairs)``, for
    t = 0..T where T is the ball fixed point (or ``max_dist``, the
    cap CC-style studies use; if the cap hits first the tail of the
    distribution is truncated, not extrapolated).

    ``mode='out'`` (default — the paper's form) grows balls of nodes
    REACHABLE FROM v; ``'in'`` grows who-can-reach-me balls.  Both
    count the same pairs (Σ_v |{u: d(v,u)<=t}| = Σ_v |{u: d(u,v)<=t}|),
    so N(t) and the effective diameter are mode-invariant up to
    per-node sketch error; the knob matters only if a caller reuses
    the per-node balls.

    Engine-portable by the `harmonic_centrality` construction:
    registers from the 60-bit md5 hash, integer ball counts through
    `sketches.hll_estimate`, so the SQL oracle replays the trajectory
    bit-exactly.

    Distributed shape: identical to `harmonic_centrality` — per
    superstep one edge equi-join + one map-side-combined max-merge +
    one estimate aggregation over node-sized × ≤2^p register frames,
    ``localCheckpoint``-materialized, with the same sound register
    fixed-point early stop; the per-radius output is ONE aggregate row
    per superstep (Σ of per-node counts), so the result frame is at
    most ``max_dist + 1`` rows regardless of graph size."""
    from .sketches import hll_estimate, hll_registers

    if mode not in ("in", "out"):
        raise ValueError(f"mode must be 'in' or 'out', got {mode!r}")
    a, b = (src_col, dst_col) if mode == "in" else (dst_col, src_col)
    e = (edges.select(F.col(a).alias("_s"), F.col(b).alias("_t"))
         .distinct().cache())
    nodes = (e.select(F.col("_s").alias("node"))
             .union(e.select(F.col("_t").alias("node")))
             .distinct().cache())
    spark = edges.sparkSession
    if nodes.isEmpty():
        return spark.createDataFrame([], "t int, n_pairs long")
    regs = (hll_registers(nodes, "node", p, by=["node"])
            .transform(plan_barrier))

    def _n(ball_counts, t):
        return (ball_counts.agg(F.sum("_ct").cast("long")
                                .alias("n_pairs"))
                .select(F.lit(int(t)).cast("int").alias("t"),
                        "n_pairs"))

    ct = hll_estimate(regs, p, ["node"], "_ct").transform(plan_barrier)
    nf = _n(ct, 0)

    def _state(r):
        row = r.agg(F.count("*").alias("_k"),
                    F.sum("hll_rho").alias("_r")).head()
        return (row["_k"], row["_r"])

    state = _state(regs)
    for d in range(1, int(max_dist) + 1):
        contrib = (e.join(regs, e["_s"] == regs["node"])
                   .select(F.col("_t").alias("node"), "hll_idx",
                           "hll_rho"))
        regs = (regs.select("node", "hll_idx", "hll_rho")
                .unionByName(contrib)
                .groupBy("node", "hll_idx")
                .agg(F.max("hll_rho").alias("hll_rho"))
                .transform(plan_barrier))
        ct = hll_estimate(regs, p, ["node"], "_ct").transform(plan_barrier)
        nf = nf.unionByName(_n(ct, d))
        nstate = _state(regs)
        if nstate == state:
            break
        state = nstate
    return nf


def effective_diameter(edges: DataFrame | None = None,
                       src_col: str = "src", dst_col: str = "dst",
                       alpha: float = 0.9, max_dist: int = 16,
                       p: int = 10, mode: str = "out",
                       nf: DataFrame | None = None) -> DataFrame:
    """Interpolated effective diameter at fraction ``alpha`` (HyperANF
    §5): the smallest ``t`` such that ``N(t) >= alpha · N(∞)``, with
    the standard linear interpolation between the bracketing radii —
    ``t-1 + (alpha·N(∞) - N(t-1)) / (N(t) - N(t-1))`` — so the value
    moves continuously as the distribution shifts.  ``N(∞)`` is the
    last computed radius: exact when the neighbourhood function
    reached its fixed point, the capped CC convention otherwise.

    Pass ``nf=`` to reuse a :func:`neighbourhood_function` frame (it
    is at most ``max_dist + 1`` rows); otherwise ``edges`` is
    required and the function is computed here.  Returns one row
    ``(effective_diameter, reachable_pairs)``; the empty graph
    returns zero rows.  All-double arithmetic quantized to 12
    decimals, replayable in SQL (the `pagerank` convention)."""
    if nf is None:
        if edges is None:
            raise ValueError("effective_diameter needs edges= or nf=")
        nf = neighbourhood_function(edges, src_col, dst_col,
                                    max_dist=max_dist, p=p, mode=mode)
    tot = nf.agg(F.max("n_pairs").alias("_nmax"))
    w = Window.orderBy("t")
    staged = (nf.crossJoin(F.broadcast(tot))
              .withColumn("_target",
                          F.round(F.lit(float(alpha))
                                  * F.col("_nmax").cast("double"), 12))
              .withColumn("_prev", F.lag("n_pairs").over(w)))
    hit = (staged.filter(F.col("n_pairs").cast("double")
                         >= F.col("_target"))
           .orderBy("t").limit(1))
    return hit.select(
        F.when(F.col("t") == 0, F.lit(0.0))
        .otherwise(F.round(
            (F.col("t") - F.lit(1)).cast("double")
            + (F.col("_target") - F.col("_prev").cast("double"))
            / (F.col("n_pairs") - F.col("_prev")).cast("double"),
            12)).alias("effective_diameter"),
        F.col("_nmax").alias("reachable_pairs"))


def trustrank(edges: DataFrame, seeds: DataFrame,
              src_col: str = "src", dst_col: str = "dst",
              seed_col: str = "node", iters: int = 10,
              damping: float = 0.85,
              dedup_edges: bool = True) -> DataFrame:
    """TrustRank (Gyöngyi, Garcia-Molina & Pedersen, VLDB 2004) — the
    spam-demotion rank of crawl curation: personalized PageRank whose
    teleport AND dangling-mass redistribution are restricted to a
    trusted seed set, so trust flows outward from vetted hosts and
    pages unreachable from any seed score exactly 0 (a link farm
    cannot bootstrap itself the way it can under uniform teleport).

    With ``s(v) = 1/|seeds∩nodes|`` for seeds (0 otherwise):
    ``tr0 = s``; ``tr'(v) = (1-d)·s(v) + d·(Σ over in-edges u→v of
    tr(u)/out(u) + dangling_mass·s(v))`` — mass-conserving like
    `pagerank`, quantized to 12 decimals per superstep so the SQL
    oracle unrolls the identical updates.  Seeds not present in the
    graph are ignored; an empty effective seed set raises (a uniform
    fallback would silently compute plain PageRank).

    Distributed shape: identical to `pagerank` — two aggregations per
    superstep around the cached edge/out-degree frames, the seed
    vector materialized once, rank frames node-sized and
    ``localCheckpoint``-materialized."""
    d = float(damping)
    e = edges.select(F.col(src_col).alias("_u"),
                     F.col(dst_col).alias("_v"))
    if dedup_edges:
        e = e.distinct()
    e = e.cache()
    nodes = (e.select(F.col("_u").alias("node"))
             .union(e.select(F.col("_v").alias("node")))
             .distinct().cache())
    if nodes.isEmpty():
        return nodes.select("node", F.lit(0.0).alias("trustrank"))
    sn = (nodes.join(seeds.select(F.col(seed_col).alias("node"))
                     .distinct(), "node", "left_semi").cache())
    ns = sn.count()
    if ns == 0:
        raise ValueError("trustrank: no seed is a node of the graph "
                         "— a uniform fallback would silently be "
                         "plain pagerank")
    svec = (nodes.join(sn.withColumn("_is", F.lit(1.0)), "node",
                       "left")
            .select("node",
                    F.round(F.coalesce(F.col("_is"), F.lit(0.0))
                            / F.lit(float(ns)), 12).alias("_s"))
            .transform(plan_barrier))
    outd = e.groupBy("_u").agg(F.count("*").alias("_od")).cache()
    tr = svec.select("node", F.col("_s").alias("trustrank"))
    for _ in range(int(iters)):
        ranked = tr.join(outd, tr["node"] == outd["_u"], "left")
        dangling = (ranked.filter(F.col("_od").isNull())
                    .agg(F.coalesce(F.sum("trustrank"), F.lit(0.0))
                         .alias("_dm")))
        contrib = (e.join(tr, e["_u"] == tr["node"])
                   .join(outd, "_u")
                   .groupBy(F.col("_v").alias("node"))
                   .agg(F.sum(F.col("trustrank") / F.col("_od"))
                        .alias("_c")))
        tr = (svec.join(contrib, "node", "left")
              .crossJoin(F.broadcast(dangling))
              .select(
                  "node",
                  F.round(
                      F.lit(1.0 - d) * F.col("_s")
                      + F.lit(d) * (F.coalesce(F.col("_c"),
                                               F.lit(0.0))
                                    + F.col("_dm") * F.col("_s")),
                      12).alias("trustrank"))
              .transform(plan_barrier))
    return tr


def label_propagation(edges: DataFrame, src_col: str = "src",
                      dst_col: str = "dst", iters: int = 5,
                      include_self: bool = True) -> DataFrame:
    """Community detection by synchronous label propagation
    (Raghavan et al. 2007) — the host-clustering complement of
    `dedup.connected_components`: CC merges anything touching, LPA
    finds DENSER groups (mirror clusters, site families, link rings)
    because a node adopts the label most frequent among its
    neighbors, not any label it can reach.  Returns (node, label)
    after ``iters`` supersteps over the UNDIRECTED view of the edge
    list; labels start as node ids.

    Deterministic spec (the oracle unrolls it): per superstep every
    node's new label is the most frequent among its neighbors'
    current labels (plus its own when ``include_self`` — the damping
    that prevents the classic two-coloring oscillation of synchronous
    LPA on bipartite structures), ties broken by SMALLEST label.
    Isolated behavior cannot occur (every node of an edge list has a
    neighbor); duplicate edges dedup (multiplicity is not a vote).

    Distributed shape: per superstep one label join + one
    (node, label) vote count + the two-stage skew-free rank-1
    selection (`pq_topk`'s pattern — a hub's votes never funnel
    through one task), label frames node-sized and
    ``localCheckpoint``-materialized.  No driver-side graph."""
    und = (edges.select(F.col(src_col).alias("_a"),
                        F.col(dst_col).alias("_b"))
           .unionAll(edges.select(F.col(dst_col).alias("_a"),
                                  F.col(src_col).alias("_b")))
           .distinct().filter(F.col("_a") != F.col("_b")).cache())
    nodes = und.select(F.col("_a").alias("node")).distinct().cache()
    labels = nodes.select("node", F.col("node").alias("label")) \
        .transform(plan_barrier)
    for _ in range(int(iters)):
        votes = (und.join(labels, und["_b"] == labels["node"])
                 .select(F.col("_a").alias("node"), "label"))
        if include_self:
            votes = votes.unionAll(labels.select("node", "label"))
        counts = (votes.groupBy("node", "label")
                  .agg(F.count("*").alias("_c")))
        w_local = Window.partitionBy("node", "_pid") \
            .orderBy(F.desc("_c"), F.asc("label"))
        local = (counts.withColumn("_pid", F.spark_partition_id())
                 .withColumn("_lr", F.row_number().over(w_local))
                 .filter(F.col("_lr") == 1).drop("_pid", "_lr"))
        w = Window.partitionBy("node").orderBy(F.desc("_c"),
                                               F.asc("label"))
        labels = (local.withColumn("_r", F.row_number().over(w))
                  .filter(F.col("_r") == 1)
                  .select("node", "label").transform(plan_barrier))
    return labels


def _simple_directed(edges: DataFrame, src_col: str,
                     dst_col: str) -> DataFrame:
    """Deduped self-loop-free directed view as (_a, _b)."""
    return (edges.select(F.col(src_col).alias("_a"),
                         F.col(dst_col).alias("_b"))
            .filter(F.col("_a").isNotNull() & F.col("_b").isNotNull()
                    & (F.col("_a") != F.col("_b")))
            .distinct())


def _warn_cap(helper: str, iters: int) -> None:
    """A propagation loop exhausted its safety cap without observing
    convergence — the result may be a truncated fixpoint.  Warn
    loudly (r15 verdict: silent under-peeling is the failure mode;
    the caps exist for runaway protection, not as unroll counts)."""
    import warnings
    warnings.warn(
        f"{helper} hit its iteration safety cap ({iters}) before "
        "convergence; the returned frame may be short of the "
        "fixpoint.  Raise the cap — converged runs break early, so "
        "a higher cap costs nothing.", UserWarning, stacklevel=3)


def _propagate_min(nodes: DataFrame, e: DataFrame,
                   iters: int) -> DataFrame:
    """Forward min-label fixpoint: color(v) = min node id over
    {v} ∪ {u : u reaches v} along edge direction, computed by
    synchronous supersteps of ``color(v) <- min(color(v), min over
    in-neighbors' color)``.  Monotone non-increasing and idempotent
    at the fixed point, so a fixed unroll past convergence equals
    the fixpoint (the `core_numbers` convention).  The early-stop
    probe below (an xxhash64 state sum — type-agnostic, so string
    node ids work) is PROBABILISTIC, not sound in the strict sense:
    a sum collision between two distinct color states would stop
    propagation one superstep early (r15 advice).  With 64-bit
    per-row hashes summed exactly in decimal the collision odds per
    probe are ~2^-64 — negligible against cluster-hardware error
    rates, and the (count, sum) pair must collide simultaneously —
    but callers needing a certificate should set ``iters`` to a
    proven bound instead.  Per superstep: one edge equi-join +
    one map-side-combined min aggregation; the color frame is
    node-sized and localCheckpoint-materialized every step."""
    color = nodes.select("node", F.col("node").alias("_color")) \
        .transform(plan_barrier)

    def _state(c):
        return c.agg(F.count("*").alias("_n"),
                     # decimal sum: exact and overflow-free under
                     # ANSI mode (a raw long sum of 64-bit hashes
                     # overflows)
                     F.sum(F.xxhash64("node", "_color")
                           .cast("decimal(20,0)")).alias("_h")).head()

    st = _state(color)
    converged = False
    for _ in range(int(iters)):
        prop = (e.join(color, e["_a"] == color["node"])
                .select(F.col("_b").alias("node"), "_color"))
        color = (color.unionAll(prop)
                 .groupBy("node").agg(F.min("_color").alias("_color"))
                 .transform(plan_barrier))
        nst = _state(color)
        if (nst["_n"], nst["_h"]) == (st["_n"], st["_h"]):
            converged = True
            break
        st = nst
    if not converged:
        _warn_cap("_propagate_min", iters)
    return color


def _propagate_flag(seed: DataFrame, e: DataFrame, iters: int,
                    forward: bool) -> DataFrame:
    """Reachability closure of ``seed`` (a (node) frame) along edge
    direction (``forward=True``: nodes reachable FROM the seed) or
    against it (nodes that REACH the seed).  Monotone growing set,
    idempotent at the fixed point; early-stops on an unchanged
    count.  Per superstep one equi-join + distinct; frames stay
    node-sized and localCheckpoint-materialized."""
    frm, to = ("_a", "_b") if forward else ("_b", "_a")
    reach = seed.select("node").distinct().transform(plan_barrier)
    n = reach.count()
    converged = False
    for _ in range(int(iters)):
        step = (e.join(reach, e[frm] == reach["node"])
                .select(F.col(to).alias("node")))
        reach = reach.unionAll(step).distinct().transform(plan_barrier)
        nn = reach.count()
        if nn == n:
            converged = True
            break
        n = nn
    if not converged:
        _warn_cap("_propagate_flag", iters)
    return reach


def strongly_connected_components(edges: DataFrame,
                                  src_col: str = "src",
                                  dst_col: str = "dst",
                                  rounds: int = 20,
                                  prop_iters: int = 40) -> DataFrame:
    """Strongly connected components of a DIRECTED edge list by the
    coloring / forward-backward peeling algorithm (Orzan 2004; the
    FW-BW-Trim family of Slota et al.) — the directed counterpart of
    `dedup.connected_components`, and the prerequisite of the Broder
    et al. (2000) bowtie crawl-graph card (`bowtie_summary`).
    Returns (node, scc) where ``scc`` is the smallest node id in the
    component.

    Per peeling round: (1) forward min-label propagation to the
    fixpoint — color(v) = min id over nodes reaching v; (2) every
    node whose color IS its own id roots a component, and membership
    propagates BACKWARD within the color class (v joins component c
    when some out-neighbor in color class c is already a member —
    exactly the nodes that reach the root inside its color class,
    i.e. the root's SCC); (3) found components peel off and the
    remainder repeats.  Every propagation is monotone and idempotent
    at its fixed point, so an oracle that unrolls the same block
    structure unconditionally returns the identical frame whether
    the engine early-stopped or not (the `core_numbers` convention).
    Each round removes at least the component of the smallest
    remaining node, and the loop runs UNTIL NO NODES REMAIN —
    ``rounds`` is a SAFETY CAP, not an unroll count (r15 verdict #1:
    the former ``rounds=3`` default silently under-peeled graphs
    whose condensation has more than 3 peel levels).  Converged
    graphs pay nothing extra (the empty-remainder break fires);
    if the cap IS hit with nodes left over, those nodes report
    themselves (``scc = node``; deterministic, replicable) and a
    ``UserWarning`` names the leftover count so the truncation is
    never silent.  Pytest pins DEFAULT-argument exactness against
    brute-force Tarjan on a 6-peel-level chained-cycle graph.

    Distributed shape (100 TB): supersteps are single equi-joins +
    map-side-combined min aggregations on node-sized frames,
    localCheckpoint-materialized every step; edges peel via
    left_anti joins and re-materialize per round.  No driver-side
    graph, no all-pairs anywhere."""
    e = _simple_directed(edges, src_col, dst_col).transform(plan_barrier)
    rem_nodes = (e.select(F.col("_a").alias("node"))
                 .unionAll(e.select(F.col("_b").alias("node")))
                 .distinct().transform(plan_barrier))
    spark = edges.sparkSession
    assigned = spark.createDataFrame(
        [], rem_nodes.select(
            "node", F.col("node").alias("scc")).schema)
    for _ in range(int(rounds)):
        if rem_nodes.isEmpty():
            break
        color = _propagate_min(rem_nodes, e, prop_iters)
        member = (color.filter(F.col("node") == F.col("_color"))
                  .select("node", F.col("_color").alias("scc"))
                  .transform(plan_barrier))
        m = member.count()
        converged = False
        for _ in range(int(prop_iters)):
            # v joins component c when an out-neighbor already in c
            # shares v's color class
            step = (e.join(member, e["_b"] == member["node"])
                    .select(F.col("_a").alias("node"), "scc")
                    .join(color, "node")
                    .filter(F.col("_color") == F.col("scc"))
                    .select("node", "scc"))
            member = member.unionAll(step).distinct() \
                .transform(plan_barrier)
            nm = member.count()
            if nm == m:
                converged = True
                break
            m = nm
        if not converged:
            _warn_cap("scc backward membership", prop_iters)
        assigned = assigned.unionAll(member)
        rem_nodes = rem_nodes.join(member, "node", "left_anti") \
            .transform(plan_barrier)
        e = (e.join(member, e["_a"] == member["node"], "left_anti")
             .join(member, e["_b"] == member["node"], "left_anti")
             .transform(plan_barrier))
    if not rem_nodes.isEmpty():
        import warnings
        warnings.warn(
            f"strongly_connected_components hit the rounds={rounds} "
            f"safety cap with {rem_nodes.count()} nodes unpeeled; "
            "they report scc = node.  Raise `rounds` (converged "
            "graphs break early, so a higher cap is free).",
            UserWarning, stacklevel=2)
    return assigned.unionAll(
        rem_nodes.select("node", F.col("node").alias("scc")))


def bowtie_summary(edges: DataFrame, src_col: str = "src",
                   dst_col: str = "dst", rounds: int = 20,
                   prop_iters: int = 40) -> DataFrame:
    """The Broder et al. (2000) bowtie decomposition of a directed
    graph — THE standard crawl-graph summary card: node counts per
    region relative to the LARGEST strongly connected component
    (ties on size broken by smallest component id).  Returns
    (region, n_nodes) with regions ``CORE`` (the largest SCC),
    ``IN`` (reaches the core, not in it), ``OUT`` (reachable from
    the core, not in it), ``TUBE`` (on an IN→OUT path that avoids
    the core), ``TENDRIL`` (hangs off IN or leads into OUT without
    crossing), ``DISCONNECTED`` (everything else).

    Built entirely from monotone reachability closures around
    `strongly_connected_components`: forward/backward closures of
    the core give OUT/IN; the forward closure of IN and the backward
    closure of OUT classify tubes and tendrils.  All propagation is
    idempotent at the fixed point (unroll-replicable oracle, the
    `core_numbers` convention); every frame is node-sized,
    localCheckpoint-materialized, joined on node ids only."""
    e = _simple_directed(edges, src_col, dst_col).transform(plan_barrier)
    scc = strongly_connected_components(
        edges, src_col, dst_col, rounds=rounds,
        prop_iters=prop_iters).transform(plan_barrier)
    top = (scc.groupBy("scc").agg(F.count("*").alias("_n"))
           .orderBy(F.desc("_n"), F.asc("scc")).limit(1))
    core = scc.join(F.broadcast(top), "scc").select("node") \
        .transform(plan_barrier)
    fwd = _propagate_flag(core, e, prop_iters, forward=True)
    bwd = _propagate_flag(core, e, prop_iters, forward=False)
    in_ = bwd.join(core, "node", "left_anti").transform(plan_barrier)
    out = fwd.join(core, "node", "left_anti").transform(plan_barrier)
    f_in = _propagate_flag(in_, e, prop_iters, forward=True)
    b_out = _propagate_flag(out, e, prop_iters, forward=False)
    nodes = scc.select("node")
    flags = (nodes
             .join(core.withColumn("_core", F.lit(1)), "node", "left")
             .join(in_.withColumn("_in", F.lit(1)), "node", "left")
             .join(out.withColumn("_out", F.lit(1)), "node", "left")
             .join(f_in.withColumn("_fin", F.lit(1)), "node", "left")
             .join(b_out.withColumn("_bout", F.lit(1)), "node",
                   "left"))
    region = (F.when(F.col("_core") == 1, F.lit("CORE"))
              .when(F.col("_in") == 1, F.lit("IN"))
              .when(F.col("_out") == 1, F.lit("OUT"))
              .when((F.col("_fin") == 1) & (F.col("_bout") == 1),
                    F.lit("TUBE"))
              .when((F.col("_fin") == 1) | (F.col("_bout") == 1),
                    F.lit("TENDRIL"))
              .otherwise(F.lit("DISCONNECTED")))
    return (flags.select(region.alias("region"))
            .groupBy("region")
            .agg(F.count("*").cast("long").alias("n_nodes")))


def random_walks(edges: DataFrame, src_col: str = "src",
                 dst_col: str = "dst", walk_len: int = 4,
                 walks_per_node: int = 2, seed: int = 0,
                 independent: bool = False) -> DataFrame:
    """Deterministic pseudorandom walks over a directed edge list —
    the corpus-generation stage of DeepWalk/node2vec-style graph
    embeddings (Perozzi et al. 2014): every node starts
    ``walks_per_node`` walks of up to ``walk_len`` steps; a walk
    that reaches a sink terminates early.  Returns
    (start, copy, path array<node>) with ``path[0] = start``.
    "Random" choices come from the module's portable 60-bit md5
    hash, so the walks are a pure function of (graph, seed) and an
    engine replica reproduces them exactly (argmin via a total-order
    (hash, dst) struct min — even a hash collision breaks ties
    deterministically on the smaller destination).

    Two transition modes — the 100-TB design choice:

    - default (``independent=False``, hub-safe): the step-``t``
      transition of copy ``c`` at node ``v`` is
      ``argmin over out(v) of hash(seed,c,t,v,dst)`` — a TRANSITION
      TABLE computed as one map-side-combined min-aggregation over
      the EDGE frame per step, then one node-keyed equi-join.  A
      10M-degree hub costs one partial-agg pass, never a per-walk
      scan.  Walks sharing (copy, step, node) then share their next
      hop — the documented bias of table-driven walks (suffixes
      merge); ``walks_per_node`` copies restore diversity.
    - ``independent=True`` (exact per-walk choices): the hash salts
      on the walk's OWN identity (start, copy), so co-located walks
      diverge like true independent walks; cost is a per-step join
      that fans each walk out by deg(cur) before its min-combine —
      Σ deg along the walk, the price every exact sampler pays
      without per-node alias tables.  Use for modest graphs or
      analysis; the default for web-scale corpus generation.

    Per step: one aggregation + one join; the walk frame is
    (nodes × walks_per_node)-sized and localCheckpoint-materialized
    (the `pagerank` superstep convention)."""
    from .dedup import portable_hash

    e = _simple_directed(edges, src_col, dst_col).cache()
    nodes = (e.select(F.col("_a").alias("node"))
             .unionAll(e.select(F.col("_b").alias("node")))
             .distinct())
    copies = F.explode(
        F.sequence(F.lit(0), F.lit(int(walks_per_node) - 1)))
    walks = (nodes.select(F.col("node").alias("start"),
                          copies.alias("copy"))
             .select("start", "copy",
                     F.array("start").alias("path"),
                     F.col("start").alias("_cur"),
                     F.lit(True).alias("_alive"))
             .transform(plan_barrier))
    for t in range(1, int(walk_len) + 1):
        if independent:
            key = F.concat_ws(":", F.lit(int(seed)), F.col("start"),
                              F.col("copy"), F.lit(t), F.col("_b"))
            step = (walks.filter("_alive")
                    .join(e, walks["_cur"] == e["_a"])
                    .withColumn("_h", portable_hash(key))
                    .groupBy("start", "copy")
                    .agg(F.min(F.struct("_h", "_b"))["_b"]
                         .alias("_next")))
            nxt = walks.join(step, ["start", "copy"], "left")
        else:
            trans = (e.select(
                "_a", "_b",
                F.explode(F.sequence(
                    F.lit(0), F.lit(int(walks_per_node) - 1)))
                .alias("copy"))
                .withColumn("_h", portable_hash(F.concat_ws(
                    ":", F.lit(int(seed)), F.col("copy"), F.lit(t),
                    F.col("_a"), F.col("_b"))))
                .groupBy("_a", "copy")
                .agg(F.min(F.struct("_h", "_b"))["_b"]
                     .alias("_next")))
            nxt = walks.join(
                trans, (walks["_cur"] == trans["_a"])
                & (walks["copy"] == trans["copy"]), "left") \
                .drop(trans["copy"]).drop("_a")
        walks = (nxt.select(
            "start", "copy",
            F.when(F.col("_alive") & F.col("_next").isNotNull(),
                   F.concat("path", F.array("_next")))
            .otherwise(F.col("path")).alias("path"),
            F.coalesce("_next", "_cur").alias("_cur"),
            (F.col("_alive") & F.col("_next").isNotNull())
            .alias("_alive"))
            .transform(plan_barrier))
    return walks.select("start", "copy", "path")


def walk_cooccurrence(walks: DataFrame, window: int = 2,
                      path_col: str = "path") -> DataFrame:
    """Skip-gram co-occurrence counts from a walk frame — the step
    between `random_walks` and an embedding trainer (DeepWalk's
    corpus IS these windowed pairs; they also feed `collocations`-
    style PMI directly).  Returns (a, b, n_cooccur) with a < b
    (canonical undirected pairs), counting each ordered
    within-``window`` pair occurrence once.

    Pure explode + aggregation: each path of length L emits at most
    L·window pairs map-side, the count is one map-side-combined
    aggregation keyed on the pair — no joins, no driver state."""
    if int(window) < 1:
        raise ValueError(f"window must be >= 1, got {window} — a "
                         "0-window inner sequence would DESCEND "
                         "(Spark sequence(a, b) with a > b)")
    p = F.col(path_col)
    n = F.size(p)
    # i stops at n-1: Spark's sequence(a, b) DESCENDS when a > b
    # (the train_bpe pair guard), so the inner start i+1 must never
    # exceed its end
    pairs = F.flatten(F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.transform(
            F.sequence(i + 1, F.least(i + F.lit(int(window)), n)),
            lambda j: F.struct(
                F.least(F.element_at(p, i.cast("int")),
                        F.element_at(p, j.cast("int"))).alias("a"),
                F.greatest(F.element_at(p, i.cast("int")),
                           F.element_at(p, j.cast("int")))
                .alias("b")))))
    return (walks.filter(n >= 2)
            .select(F.explode(pairs).alias("_p"))
            .select("_p.a", "_p.b")
            .filter(F.col("a") != F.col("b"))
            .groupBy("a", "b")
            .agg(F.count("*").cast("long").alias("n_cooccur")))


def modularity(edges: DataFrame, communities: DataFrame,
               src_col: str = "src", dst_col: str = "dst",
               node_col: str = "node",
               label_col: str = "label") -> DataFrame:
    """Newman modularity of a node partition (Newman & Girvan 2004)
    — THE published quality number for a community assignment, the
    natural audit of `label_propagation` / `connected_components`
    output: per community c, ``q_contrib = m_c/m - (D_c/(2m))²``
    (intra-edge fraction minus the random-graph expectation); the
    partition's Q is the sum over communities (between -1/2 and 1).
    Computed over the UNDIRECTED simple view (duplicate/reverse
    edges collapse, self-loops drop — `label_propagation`'s own
    graph).  Nodes missing from ``communities`` default to their own
    singleton label (coalesce — robust to partial labelings).

    Returns one row per community:
    (label, n_nodes, intra_edges, degree_sum, q_contrib) with
    ``q_contrib`` rounded to 12 (every input an exact integer, the
    two divisions single IEEE ops — engine-portable).

    Distributed shape: one canonical-pair distinct + a node-degree
    aggregation + two label joins on the edge frame + one
    community-keyed aggregation — all node/edge-sized, the only
    broadcast the 1-row edge count."""
    und = (edges.select(F.least(F.col(src_col), F.col(dst_col))
                        .alias("_a"),
                        F.greatest(F.col(src_col), F.col(dst_col))
                        .alias("_b"))
           .filter(F.col("_a").isNotNull() & F.col("_b").isNotNull()
                   & (F.col("_a") != F.col("_b")))
           .distinct().cache())
    # min-label per node: a duplicate-node communities frame (e.g. a
    # unioned labeling) must not fan the degree join out — smallest
    # label wins, deterministically
    lab = (communities.select(F.col(node_col).alias("_n"),
                              F.col(label_col).alias("_l"))
           .groupBy("_n").agg(F.min("_l").alias("_l")))
    deg = (und.select(F.col("_a").alias("_n"))
           .unionAll(und.select(F.col("_b").alias("_n")))
           .groupBy("_n").agg(F.count("*").alias("_deg")))
    node_lab = (deg.join(lab, "_n", "left")
                .select("_n", "_deg",
                        F.coalesce("_l", F.col("_n")).alias("_l")))
    m1 = und.agg(F.count("*").alias("_m"))
    la = node_lab.select(F.col("_n").alias("_a"),
                         F.col("_l").alias("_la"))
    lb = node_lab.select(F.col("_n").alias("_b"),
                         F.col("_l").alias("_lb"))
    intra = (und.join(la, "_a").join(lb, "_b")
             .filter(F.col("_la") == F.col("_lb"))
             .groupBy(F.col("_la").alias("_l"))
             .agg(F.count("*").alias("_mc")))
    per = (node_lab.groupBy("_l")
           .agg(F.count("*").alias("n_nodes"),
                F.sum("_deg").alias("degree_sum"))
           .join(intra, "_l", "left")
           .withColumn("_mc", F.coalesce("_mc", F.lit(0)))
           .crossJoin(F.broadcast(m1)))
    # x*x, not pow(x, 2): pow routes through libm in some engines
    # (1-ulp divergence risk); multiplication is IEEE-exact-rounded
    # identically everywhere
    dfrac = F.col("degree_sum") / (F.lit(2) * F.col("_m"))
    q = (F.col("_mc") / F.col("_m")) - (dfrac * dfrac)
    return per.select(
        F.col("_l").alias("label"),
        F.col("n_nodes").cast("long").alias("n_nodes"),
        F.col("_mc").cast("long").alias("intra_edges"),
        F.col("degree_sum").cast("long").alias("degree_sum"),
        F.round(q, 12).alias("q_contrib"))


def ppmi_scores(pairs: DataFrame, a_col: str = "a",
                b_col: str = "b",
                count_col: str = "n_cooccur") -> DataFrame:
    """Positive pointwise mutual information over a co-occurrence
    pair frame — the bridge from `walk_cooccurrence` to embeddings
    (Levy & Goldberg 2014: SGNS implicitly factorizes the
    PMI-shifted matrix; PPMI is the count-only stand-in every
    count-based embedding pipeline publishes):
    ``ppmi = max(0, ln(c_ab · T / (c_a · c_b)))`` with T the total
    pair mass and the node marginals summed over the pairs
    containing the node.  Works on ANY (a, b, count) frame —
    directed skip-gram pairs or `walk_cooccurrence`'s canonical
    undirected ones.

    Quantized ``round(ln(...), 12)`` AFTER the single division of
    exact integer products (the pagerank convention), so an oracle
    replays it bit-exactly.  Returns (a, b, count, ppmi).

    Distributed shape: one explode + map-side-combined marginal
    aggregation (node-sized), two marginal equi-joins back onto the
    pair frame, the 1-row total broadcast — no corpus-sized state,
    no Python."""
    c = F.col(count_col)
    p = pairs.select(F.col(a_col).alias("a"),
                     F.col(b_col).alias("b"), c.alias("_c"))
    marg = (p.select(F.col("a").alias("_n"), "_c")
            .unionAll(p.select(F.col("b").alias("_n"), "_c"))
            .groupBy("_n").agg(F.sum("_c").alias("_cm")))
    tot = p.agg(F.sum("_c").alias("_t"))
    ma = marg.select(F.col("_n").alias("a"), F.col("_cm").alias("_ca"))
    mb = marg.select(F.col("_n").alias("b"), F.col("_cm").alias("_cb"))
    out = (p.join(ma, "a").join(mb, "b")
           .crossJoin(F.broadcast(tot)))
    # cast BEFORE multiplying: c·T as BIGINT overflows under ANSI at
    # corpus scale (T ~ 1e12); double products round identically in
    # every IEEE engine, so the oracle replays bit-exact
    ratio = ((F.col("_c").cast("double") * F.col("_t").cast("double"))
             / (F.col("_ca").cast("double")
                * F.col("_cb").cast("double")))
    return out.select(
        "a", "b", F.col("_c").cast("long").alias(count_col),
        F.greatest(F.lit(0.0), F.round(F.log(ratio), 12))
        .alias("ppmi"))


def _n2v_multiplicities(p, q, max_multiplicity: int):
    """node2vec (1/p, 1, 1/q) bias weights as INTEGER multiplicities
    (m_return, m_near, m_far) — the smallest integer scaling of the
    three rationals.  ``p``/``q`` parse through ``Fraction(str(.))``
    so decimal literals are exact (0.5 is 1/2, not the binary float);
    irreducible scalings past ``max_multiplicity`` raise rather than
    silently approximate."""
    from fractions import Fraction
    from math import lcm

    try:
        fp, fq = Fraction(str(p)), Fraction(str(q))
    except (ValueError, ZeroDivisionError) as ex:
        raise ValueError(f"p/q must be positive rationals, got "
                         f"p={p!r} q={q!r}") from ex
    if fp <= 0 or fq <= 0:
        raise ValueError(f"p/q must be positive, got p={p} q={q}")
    ws = [1 / fp, Fraction(1), 1 / fq]
    scale = lcm(*(w.denominator for w in ws))
    ms = [int(w * scale) for w in ws]
    if max(ms) > int(max_multiplicity):
        raise ValueError(
            f"p={p} q={q} need candidate multiplicities {ms} > "
            f"max_multiplicity={max_multiplicity}; use simpler "
            "rationals (the race fan-out is linear in the "
            "multiplicity)")
    return ms


def node2vec_walks(edges: DataFrame, src_col: str = "src",
                   dst_col: str = "dst", p=1, q=1,
                   walk_len: int = 4, walks_per_node: int = 2,
                   seed: int = 0, independent: bool = False,
                   max_multiplicity: int = 64) -> DataFrame:
    """(p, q)-biased second-order walks (node2vec, Grover & Leskovec
    KDD 2016) — the standard upgrade of `random_walks`' uniform
    transitions: stepping from ``prev`` through ``cur``, a candidate
    ``x`` weighs ``1/p`` if ``x == prev`` (return), ``1`` if the edge
    ``prev -> x`` exists (the directed reading of d(prev, x) = 1),
    else ``1/q`` (explore).  Low ``q`` pushes outward (DFS-like
    structural equivalence), low ``p`` keeps walks local (BFS-like
    homophily).  Step 1 has no ``prev`` and is uniform over out-edges
    with `random_walks`' EXACT table-mode hash key, so a (p=1, q=1)
    step 1 reproduces the DeepWalk table's first hop.  Returns
    (start, copy, path) like `random_walks`; feed `walk_cooccurrence`
    for the training corpus.

    Weighted sampling WITHOUT doubles — the integer-multiplicity
    race: weights scale to the smallest integer multiplicities
    (`_n2v_multiplicities`); each candidate enters the hash argmin
    once per multiplicity unit (replica index salted into the key),
    and P(argmin lands in x's replicas) = m(x)/Σm EXACTLY (iid
    symmetry).  Every choice stays a pure function of (graph, seed) —
    portable-md5 + (hash, dst) total order, engine-replicable with no
    transcendentals and no rounding anywhere.

    Distributed shape (100 TB): the step-``t`` table aggregates the
    WEDGE frame (prev -> cur -> cand, built by two edge self-joins +
    one left-join near-classification) — Σ indeg·outdeg rows × Σm
    fan-out, node2vec's own published preprocessing cost (its alias
    tables are per-edge-pair too); the aggregation is a map-side-
    combined min keyed on (prev, cur, copy), so no single key
    explodes (a d-degree hub contributes d² wedge rows but spread
    over d² distinct keys).  Walk frames stay (nodes ×
    walks_per_node)-sized, localCheckpoint'd per superstep; walks
    sharing (copy, step, prev, cur) share their hop — the same
    documented table-mode bias as `random_walks`, second order.

    ``independent=True`` restores exact per-walk independence (the
    paper's own sampler): the race salts on the walk's (start, copy)
    identity, so co-located walks diverge; cost is the per-step walk
    × out-edge fan-out (Σ deg along the walk × Σm) instead of the
    shared tables — the same exactness-vs-cost trade `random_walks`
    documents."""
    from .dedup import portable_hash

    mr, mn, mf = _n2v_multiplicities(p, q, max_multiplicity)
    e = _simple_directed(edges, src_col, dst_col).cache()
    nodes = (e.select(F.col("_a").alias("node"))
             .unionAll(e.select(F.col("_b").alias("node")))
             .distinct())
    copies = F.explode(
        F.sequence(F.lit(0), F.lit(int(walks_per_node) - 1)))
    walks = (nodes.select(F.col("node").alias("start"),
                          copies.alias("copy"))
             .select("start", "copy",
                     F.array("start").alias("path"),
                     F.col("start").alias("_prev"),
                     F.col("start").alias("_cur"),
                     F.lit(True).alias("_alive"))
             .transform(plan_barrier))
    # wedge frame prev -> cur -> cand with the near-flag (is there a
    # prev -> cand edge?), reused by every step >= 2 (table mode
    # only — independent mode fans candidates per walk instead)
    wedge = None if independent else (
        e.select(F.col("_a").alias("_p"),
                      F.col("_b").alias("_a"))
             .join(e, "_a")
             .join(e.select(F.col("_a").alias("_p"),
                            F.col("_b").alias("_b"),
                            F.lit(1).alias("_n1")),
                   ["_p", "_b"], "left")
             .withColumn("_m", F.when(F.col("_b") == F.col("_p"),
                                      F.lit(mr))
                         .when(F.col("_n1").isNotNull(), F.lit(mn))
                         .otherwise(F.lit(mf)))
             .drop("_n1").cache())
    for t in range(1, int(walk_len) + 1):
        if independent and t == 1:
            # uniform first hop, walk-identity salt —
            # random_walks' independent key verbatim
            key = F.concat_ws(":", F.lit(int(seed)), F.col("start"),
                              F.col("copy"), F.lit(t), F.col("_b"))
            step = (walks.filter("_alive")
                    .join(e, walks["_cur"] == e["_a"])
                    .withColumn("_h", portable_hash(key))
                    .groupBy("start", "copy")
                    .agg(F.min(F.struct("_h", "_b"))["_b"]
                         .alias("_next")))
            nxt = walks.join(step, ["start", "copy"], "left")
        elif independent:
            # per-walk (p, q) race: candidates fan out of the walk's
            # own (prev, cur) and the multiplicity replicas salt on
            # (start, copy) — exact second-order independence
            nearf = e.select(F.col("_a").alias("_np"),
                             F.col("_b").alias("_nb"),
                             F.lit(1).alias("_n1"))
            cand = (walks.filter("_alive")
                    .join(e, walks["_cur"] == e["_a"])
                    .join(nearf, (F.col("_prev") == F.col("_np"))
                          & (F.col("_b") == F.col("_nb")), "left")
                    .withColumn("_m", F.when(
                        F.col("_b") == F.col("_prev"), F.lit(mr))
                        .when(F.col("_n1").isNotNull(), F.lit(mn))
                        .otherwise(F.lit(mf)))
                    .select("start", "copy", "_b",
                            F.explode(F.sequence(F.lit(1),
                                                 F.col("_m")))
                            .alias("_r")))
            step = (cand.withColumn("_h", portable_hash(F.concat_ws(
                ":", F.lit(int(seed)), F.col("start"), F.col("copy"),
                F.lit(t), F.col("_b"), F.col("_r"))))
                .groupBy("start", "copy")
                .agg(F.min(F.struct("_h", "_b"))["_b"]
                     .alias("_next")))
            nxt = walks.join(step, ["start", "copy"], "left")
        elif t == 1:
            # uniform first hop — random_walks' table key verbatim
            trans = (e.select(
                "_a", "_b",
                F.explode(F.sequence(
                    F.lit(0), F.lit(int(walks_per_node) - 1)))
                .alias("copy"))
                .withColumn("_h", portable_hash(F.concat_ws(
                    ":", F.lit(int(seed)), F.col("copy"), F.lit(t),
                    F.col("_a"), F.col("_b"))))
                .groupBy("_a", "copy")
                .agg(F.min(F.struct("_h", "_b"))["_b"]
                     .alias("_next")))
            nxt = walks.join(
                trans, (walks["_cur"] == trans["_a"])
                & (walks["copy"] == trans["copy"]), "left") \
                .drop(trans["copy"]).drop("_a")
        else:
            trans = (wedge.select(
                "_p", "_a", "_b",
                F.explode(F.sequence(
                    F.lit(0), F.lit(int(walks_per_node) - 1)))
                .alias("copy"), "_m")
                .select("_p", "_a", "_b", "copy",
                        F.explode(F.sequence(F.lit(1), F.col("_m")))
                        .alias("_r"))
                .withColumn("_h", portable_hash(F.concat_ws(
                    ":", F.lit(int(seed)), F.col("copy"), F.lit(t),
                    F.col("_p"), F.col("_a"), F.col("_b"),
                    F.col("_r"))))
                .groupBy("_p", "_a", "copy")
                .agg(F.min(F.struct("_h", "_b"))["_b"]
                     .alias("_next")))
            nxt = walks.join(
                trans, (walks["_prev"] == trans["_p"])
                & (walks["_cur"] == trans["_a"])
                & (walks["copy"] == trans["copy"]), "left") \
                .drop(trans["copy"]).drop("_p").drop("_a")
        walks = (nxt.select(
            "start", "copy",
            F.when(F.col("_alive") & F.col("_next").isNotNull(),
                   F.concat("path", F.array("_next")))
            .otherwise(F.col("path")).alias("path"),
            F.when(F.col("_alive") & F.col("_next").isNotNull(),
                   F.col("_cur")).otherwise(F.col("_prev"))
            .alias("_prev"),
            F.coalesce("_next", "_cur").alias("_cur"),
            (F.col("_alive") & F.col("_next").isNotNull())
            .alias("_alive"))
            .transform(plan_barrier))
    return walks.select("start", "copy", "path")
