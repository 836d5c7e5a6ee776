"""The WEBGRAPH pass — crawl-graph analytics end-to-end in the
shapes that survive a 100 TB link table, composed from the graph
operator family:

    pagerank / trustrank      host authority (12-decimal quantized
                              supersteps — replicable anywhere)
    strongly_connected_components + bowtie_summary
                              the Broder et al. crawl card
                              (peel-to-completion defaults, r16)
    label_propagation + modularity
                              site families / link rings, with the
                              published partition-quality audit
    node2vec_walks → walk_cooccurrence → ppmi_scores
                              the graph-embedding corpus: (p, q)-
                              biased walks (integer-multiplicity
                              race, no RNG), skip-gram pairs, PPMI

The host graph here derives deterministically from the documents
table (doc_id arithmetic — every run identical); a real deployment
feeds `wat_links` / `html_links` output instead, unchanged.

Run:  python examples/webgraph_pipeline.py [sf_dir]
(defaults to /root/testdata/sf0.001; prints each table)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def run_webgraph(spark: SparkSession, sf_dir: str) -> dict:
    from dask_geopandas_spark.operators.graph import (
        bowtie_summary, label_propagation, modularity,
        node2vec_walks, pagerank, ppmi_scores,
        strongly_connected_components, walk_cooccurrence)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # deterministic 40-host link graph from doc arithmetic (stand-in
    # for wat_links/html_links output): ring + chord + family links
    h = F.col("doc_id") % 40
    edges = (docs.select(h.alias("src"), ((h + 1) % 40).alias("dst"))
             .unionAll(docs.select(h.alias("src"),
                                   ((h + 7) % 40).alias("dst")))
             .unionAll(docs.select(h.alias("src"),
                                   ((h * 3 + 2) % 40).alias("dst")))
             .distinct())

    out = {}
    pr = pagerank(edges, iters=8)
    out["pagerank"] = pr
    out["n_hosts"] = pr.count()

    scc = strongly_connected_components(edges)
    out["n_sccs"] = scc.select("scc").distinct().count()
    out["bowtie"] = bowtie_summary(edges)

    comm = label_propagation(edges, iters=4)
    mod = modularity(edges, comm)
    out["communities"] = mod
    out["modularity_q"] = sum(
        r["q_contrib"] for r in mod.collect())

    walks = node2vec_walks(edges, p=1, q=0.5, walk_len=5,
                           walks_per_node=2, seed=0)
    co = walk_cooccurrence(walks, window=2)
    out["ppmi"] = ppmi_scores(co)
    out["n_walks"] = walks.count()
    out["n_pairs"] = co.count()
    return out


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    s = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false").getOrCreate())
    res = run_webgraph(s, sf)
    for name in ("pagerank", "bowtie", "communities", "ppmi"):
        print(f"== {name}")
        res[name].show(10, truncate=False)
    print({k: v for k, v in res.items()
           if not hasattr(v, "show")})
    s.stop()
