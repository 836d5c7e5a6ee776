"""Geospatial tour — the reference's workflow, Spark-first.

    read points → reproject → spatial join vs polygons → dissolve
    → overlay → write Hilbert-sorted GeoParquet → windowed .cx read-back

Run:  python examples/geospatial_tour.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def run_tour(spark: SparkSession, sf_dir: str):
    import dask_geopandas_spark as dgs
    from dask_geopandas_spark.functions import core as FX

    out = {}
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    pts = dgs.points_from_xy(
        cust.withColumn("px", (F.col("c_custkey") % 347 - 173) + F.lit(0.25))
            .withColumn("py", (F.col("c_custkey") % 163 - 81) + F.lit(0.5)),
        "px", "py", crs="EPSG:4326")

    # reproject (native math for point layers), then back
    merc = pts.to_crs("EPSG:3857")
    out["reprojected"] = merc.count()

    # polygon layer from nation "territories"
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
    boxes = dgs.boxes_from_bounds(
        nat.withColumn("x0", (F.col("n_nationkey") * 13 % 300 - 150).cast("double"))
           .withColumn("y0", (F.col("n_nationkey") * 7 % 140 - 70).cast("double"))
           .withColumn("x1", F.col("x0") + (F.col("n_nationkey") % 11 + 8))
           .withColumn("y1", F.col("y0") + (F.col("n_nationkey") % 7 + 6)),
        "x0", "y0", "x1", "y1", crs="EPSG:4326")

    # spatial join + dissolve
    joined = pts.sjoin(boxes, predicate="intersects", strategy="broadcast")
    out["sjoin_matches"] = joined.count()
    dissolved = boxes.dissolve(by="n_regionkey")
    out["dissolved_regions"] = dissolved.count()

    # overlay: territory pieces clipped by a coarse grid
    grid = dgs.boxes_from_bounds(
        spark.range(4).withColumn("gx0", (F.col("id") % 2) * 150.0 - 150)
             .withColumn("gy0", (F.col("id") / 2).cast("int") * 70.0 - 70)
             .withColumn("gx1", F.col("gx0") + 150).withColumn("gy1", F.col("gy0") + 70),
        "gx0", "gy0", "gx1", "gy1", crs="EPSG:4326")
    pieces = boxes.overlay(grid, how="intersection")
    out["overlay_pieces"] = pieces.count()

    # Hilbert-sorted GeoParquet round-trip with a windowed read
    tmp = tempfile.mkdtemp()
    try:
        pts.to_parquet(tmp, spatial_sort=True, spatial_sort_level=12)
        back = dgs.read_parquet(spark, tmp)
        window = back.cx(xmin=-60, ymin=-45, xmax=60, ymax=45)
        out["windowed_readback"] = window.count()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # interchange formats (r5): ship the territory layer as KML, read
    # it back pure-Python (no GDAL anywhere in the tour)
    tmp = tempfile.mkdtemp()
    try:
        slim = dgs.GeoDataFrame(
            boxes.df.select(F.col("n_name").alias("nm"),
                            boxes.geometry_column),
            boxes.geometry_column, crs="EPSG:4326")
        dgs.to_kml(slim, tmp, name_col="nm")
        out["kml_readback"] = dgs.read_kml(spark, tmp).df.count()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # layout once, join many (r7): persist both layers bucketed by the
    # SAME explicit Hilbert boundaries — every later session gets
    # bbox-pruned reads (static PartitionFilter from driver-side
    # interval math) and spatial joins that equi-join on the bucket id
    # instead of planning a fresh grid shuffle per join
    from dask_geopandas_spark.sources import (read_spatial_bucketed,
                                              write_spatial_bucketed)

    tmp_p, tmp_b = tempfile.mkdtemp(), tempfile.mkdtemp()
    try:
        tb = (-180.0, -90.0, 180.0, 90.0)
        bounds = [i * (4 ** 12) // 8 for i in range(1, 8)]
        write_spatial_bucketed(pts, tmp_p, by="hilbert", level=12,
                               boundaries=bounds, total_bounds=tb)
        write_spatial_bucketed(boxes, tmp_b, by="hilbert", level=12,
                               boundaries=bounds, total_bounds=tb,
                               replicate=True)  # the join layout
        pts_l = read_spatial_bucketed(spark, tmp_p)
        boxes_l = read_spatial_bucketed(spark, tmp_b)
        cob = pts_l.sjoin(boxes_l, predicate="intersects",
                          strategy="cobucket")
        out["cobucket_matches"] = cob.df.count()
        # a window read touches only its buckets of the stored layout
        out["pruned_readback"] = read_spatial_bucketed(
            spark, tmp_p, bbox=(-60, -45, 60, 45)).cx(
            xmin=-60, ymin=-45, xmax=60, ymax=45).count()
    finally:
        shutil.rmtree(tmp_p, ignore_errors=True)
        shutil.rmtree(tmp_b, ignore_errors=True)
    return out


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    for name, n in run_tour(spark, sf).items():
        print(f"{name:>18}: {n}")
    spark.stop()
