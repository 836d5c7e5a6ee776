"""Distributed ``overlay`` — set-theoretic combination of two layers
(beyond-reference: dask-geopandas implements no overlay, see
doc/source/docs/reference/geodataframe.rst; geopandas users get
``geopandas.overlay(df1, df2, how=...)`` and this operator restores
that surface on Spark).  Any left-layer geometry type works against
polygon right layers (polygon pieces via the boolean kernel, line
pieces via split-and-classify clipping, point pieces via containment —
the setops dispatcher handles each combo); line×line intersections
reduce to crossing points, per the setops contract.

Semantics follow geopandas: the result contains one row per output
*piece* —

* ``intersection``          — l∩r pieces, attributes from both sides
* ``difference``            — l minus the union of every intersecting r
* ``symmetric_difference``  — both one-sided differences
* ``union``                 — intersection pieces + both differences
* ``identity``              — intersection pieces + left difference

Plan shape (100-TB view): candidate pairs come from the same
bbox-equi-join machinery as ``sjoin`` (broadcast for a small right
side, PBSM grid cells otherwise — never a cartesian); the exact
geometry work is the round-3 pure-numpy boolean kernel
(geometry/booleans.py) running Arrow-batched per candidate pair.  The
difference legs aggregate each feature's overlappers with one
``collect_list`` groupBy (bounded by candidates-per-feature, the same
bound any overlay algorithm carries) and subtract their union in a
single kernel call.  Features with no candidates bypass Python
entirely on the difference path (passthrough via a native left join).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, BinaryType
from ..barrier import plan_barrier

from ..geometry import booleans as B
from ..geometry import setops as SO
from ..geometry import wkb as W
from .sjoin import (_bbox_overlap, _cobucket_check, _cobucket_meta,
                    _grid_join, _is_small, _scan_free_bounds,
                    _suffix_collisions, _union_bounds_job)

_HOWS = ("intersection", "difference", "symmetric_difference", "union",
         "identity")


# ----------------------------------------------------------------------
# kernel UDFs
# ----------------------------------------------------------------------
def _nonempty(blob) -> bool:
    return blob is not None and blob != SO._EMPTY_GC


#: base WKB type id -> topological dimension (Point/MultiPoint 0,
#: Line* 1, Polygon* 2, else -1 — GeometryCollection and the null
#: sentinel both map to -1), the geopandas keep_geom_type classing
_TYPE_DIM = {W.POINT: 0, W.MULTIPOINT: 0,
             W.LINESTRING: 1, W.MULTILINESTRING: 1,
             W.POLYGON: 2, W.MULTIPOLYGON: 2}


def _pair_intersection_udf(keep_geom_type: bool = False):
    """Exact piece per candidate pair via the setops dispatcher
    (geometry/setops.py intersection_one) — handles every type combo:
    polygon×polygon through the boolean kernel, line×polygon via
    split-and-classify clipping, point×polygon via containment, with
    the box interval fast path intact.

    ``keep_geom_type=True`` folds geopandas' dimension filter INTO the
    kernel call (pieces of lower dimension than their left input
    return NULL): the r16 plan evaluated the piece once for the
    SQL-side dim filter and then RE-RAN the whole kernel for every
    downstream projection over the piece (guide §4.4's
    filter-duplicates-the-UDF shape) plus two st_geometrytype UDF
    passes just to classify it.  One batched parse of the (small)
    output pieces replaces all of that.  The UDF is marked
    non-deterministic (it is pure — the marker only STOPS the
    optimizer from duplicating the expression across the filter and
    the projection, guide §4.4)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(BinaryType())
    def _inter(lg: pd.Series, rg: pd.Series) -> pd.Series:
        La = W.parse_wkb(list(lg))
        Ra = W.parse_wkb(list(rg))
        out = []
        for i in range(La.n):
            piece = SO.intersection_one(La, i, Ra, i)
            out.append(piece if _nonempty(piece) else None)
        if keep_geom_type:
            Pa = W.parse_wkb(out)
            for i in range(La.n):
                if out[i] is None:
                    continue
                if (_TYPE_DIM.get(int(Pa.types[i]), -1)
                        != _TYPE_DIM.get(int(La.types[i]), -1)):
                    out[i] = None
        return pd.Series(out, dtype=object)

    return _inter.asNondeterministic()


def _diff_union_udf():
    """Left geometry minus the UNION of its overlappers: the right
    polygons merge through the n-ary union kernel into ONE subtrahend
    (so overlapping subtrahends never double-subtract), then one
    difference_one dispatch — polygons through the boolean kernel,
    lines via keep-outside clipping, points via containment."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(BinaryType())
    def _diff(lg: pd.Series, others: pd.Series) -> pd.Series:
        La = W.parse_wkb(list(lg))
        out = []
        for i in range(La.n):
            blobs = others.iloc[i]
            if blobs is None or len(blobs) == 0:
                out.append(lg.iloc[i])
                continue
            Bb = W.parse_wkb([bytes(b) for b in blobs])
            merged = B.union_polygons(
                [SO.geom_rings(Bb, j) for j in range(Bb.n)])
            if not merged:
                out.append(lg.iloc[i])
                continue
            Ub = W.parse_wkb([SO.kernel_polys_wkb(merged)])
            res = SO.difference_one(La, i, Ub, 0)
            out.append(res if _nonempty(res) else None)
        return pd.Series(out, dtype=object)

    # non-deterministic: pure function, but the marker stops the
    # optimizer from RE-EVALUATING the kernel above the isNotNull
    # filter for every downstream projection (guide §4.4)
    return _diff.asNondeterministic()


# ----------------------------------------------------------------------
# candidate pairs
# ----------------------------------------------------------------------
def _candidate_pairs(lg, rg, ldf: DataFrame, rdf: DataFrame,
                     lbbox_j: str, rbbox_j: str, strategy: str,
                     grid_level: int, total_bounds,
                     cob_cols=None) -> DataFrame:
    if strategy == "auto":
        # cobucket was already claimed by the caller when available
        strategy = "broadcast" if _is_small(rdf) else "grid"
    if strategy == "cobucket":
        # both sides pre-bucketed with identical boundaries
        # (spatial_shuffle(boundaries=)): the equi-join on the bucket
        # id reuses the layout-time hash partitioning — NO Exchange at
        # the join, the same layout-once-join-many path sjoin gained in
        # r7.  A candidate pair meeting in several shared buckets is
        # kept only in the smallest one (both-replicated case), so each
        # pair surfaces exactly once — the invariant every overlay leg
        # (piece emission, per-row overlapper aggregation) relies on.
        l_bucket, r_bucket, l_arr, r_arr = cob_cols
        pairs = (ldf.join(rdf, F.col(l_bucket) == F.col(r_bucket),
                          "inner")
                 .filter(_bbox_overlap(lbbox_j, rbbox_j)))
        if l_arr and r_arr:
            pairs = pairs.filter(
                F.col(l_bucket) == F.array_min(
                    F.array_intersect(F.col(l_arr), F.col(r_arr))))
        return pairs
    if strategy == "broadcast":
        return ldf.join(F.broadcast(rdf),
                        on=_bbox_overlap(lbbox_j, rbbox_j), how="inner")
    if strategy == "grid":
        if total_bounds is not None:
            tb = tuple(float(v) for v in total_bounds)
        elif (tb := _scan_free_bounds(lg, rg)) is not None:
            pass
        else:
            tb = _union_bounds_job(lg, rg)
        return _grid_join(ldf, rdf, lbbox_j, rbbox_j, tb, grid_level,
                          l_single=False, r_single=False)
    raise ValueError(f"unknown strategy {strategy!r}")


def _difference_leg(df: DataFrame, row_id: str, geom: str,
                    pairs: DataFrame, other_geom: str) -> DataFrame:
    """df minus the union of its bbox-overlapping counterparts.

    Rows with no candidates are SPLIT OFF before the kernel UDF and
    unioned back untouched — a ``when(...).otherwise(udf)`` would not
    achieve this (Spark extracts pandas UDFs into an unconditional
    projection, so the UDF would still run over every row)."""
    cand = (pairs.groupBy(row_id)
            .agg(F.collect_list(other_geom).alias("_ov_others")))
    joined = df.join(cand, on=row_id, how="left")
    untouched = joined.filter(F.col("_ov_others").isNull()) \
        .drop("_ov_others")
    diff = _diff_union_udf()
    clipped = (joined.filter(F.col("_ov_others").isNotNull())
               .withColumn(geom, diff(F.col(geom), F.col("_ov_others")))
               .filter(F.col(geom).isNotNull())
               .drop("_ov_others"))
    return untouched.unionByName(clipped)


# ----------------------------------------------------------------------
# public operator
# ----------------------------------------------------------------------
def overlay(left, right, how: str = "intersection", strategy: str = "auto",
            grid_level: int = 7, total_bounds=None,
            keep_geom_type: bool = True,
            lsuffix: str = "_left", rsuffix: str = "_right"):
    """Set-theoretic overlay of two GeoDataFrames (geopandas
    ``overlay`` parity; beyond the reference's operator set).  Output
    geometry column keeps the left layer's name; attribute columns from
    the side a piece lacks are NULL (difference legs).

    The candidate-pair join is referenced by each leg the chosen
    ``how`` needs (up to three for 'union').  Multi-leg hows lazily
    ``localCheckpoint`` the decorated inputs and the candidate set
    (r16 optimization round): the bbox/geometry decoration is an
    opaque Python stage Spark cannot dedupe across legs, so the r15
    recompute-per-leg shape re-scanned and re-decoded both layers up
    to ~14× for 'union' — guide §8's decode-once rule; the persist
    is bounded by input + candidate size (disk-spilling), strictly
    cheaper than the repeated full decodes at any scale.
    Single-leg hows keep the straight-line plan."""
    from ..core import GeoDataFrame

    if how not in _HOWS:
        raise ValueError(f"how must be one of {_HOWS}")

    lg = left.with_bbox()
    rg = right.with_bbox()
    lgeom, rgeom = lg.geometry_column, rg.geometry_column
    lbbox, rbbox = lg.bbox_column, rg.bbox_column
    ldf, rdf = _suffix_collisions(lg.df, rg.df, lsuffix, rsuffix)

    shared = set(lg.df.columns) & set(rg.df.columns)
    lgeom_j = f"{lgeom}{lsuffix}" if lgeom in shared else lgeom
    rgeom_j = f"{rgeom}{rsuffix}" if rgeom in shared else rgeom
    lbbox_j = f"{lbbox}{lsuffix}" if lbbox in shared else lbbox
    rbbox_j = f"{rbbox}{rsuffix}" if rbbox in shared else rbbox

    # ---- co-bucketed layouts (spatial_shuffle(boundaries=)) --------
    # the same auto-detection sjoin gained in r7: when both sides carry
    # compatible bucket metadata the candidate join reuses the stored
    # layout (equi-join on the bucket id, no Exchange); replicated
    # frames REQUIRE it (their replicas are only deduped here)
    lmeta, rmeta = _cobucket_meta(lg), _cobucket_meta(rg)
    cob_err = _cobucket_check(lmeta, rmeta)
    replicated = bool((lmeta or {}).get("dgs_cobucket_replicated")
                      or (rmeta or {}).get("dgs_cobucket_replicated"))
    if strategy == "auto" and cob_err is None:
        strategy = "cobucket"
    if replicated and strategy != "cobucket":
        raise ValueError(
            "a spatial_shuffle(replicate=True) frame carries one row "
            "per overlapping bucket; only strategy='cobucket' dedups "
            f"those replicas in overlay — got strategy={strategy!r}"
            + (f" (cobucket unavailable: {cob_err})" if cob_err else ""))
    if strategy == "cobucket" and cob_err:
        raise ValueError(f"strategy='cobucket': {cob_err}")

    l_bucket = ("_spatial_bucket" + lsuffix
                if "_spatial_bucket" in shared else "_spatial_bucket")
    r_bucket = ("_spatial_bucket" + rsuffix
                if "_spatial_bucket" in shared else "_spatial_bucket")
    l_arr = (("_spatial_buckets" + lsuffix
              if "_spatial_buckets" in shared else "_spatial_buckets")
             if "_spatial_buckets" in lg.df.columns else None)
    r_arr = (("_spatial_buckets" + rsuffix
              if "_spatial_buckets" in shared else "_spatial_buckets")
             if "_spatial_buckets" in rg.df.columns else None)
    l_help = [c for c in (l_bucket, l_arr)
              if c and c in ldf.columns] if strategy == "cobucket" else []
    r_help = [c for c in (r_bucket, r_arr)
              if c and c in rdf.columns] if strategy == "cobucket" else []

    lrow, rrow = "_ov_left_row", "_ov_right_row"
    # content hashes (not mono-ids): the frames appear in several plan
    # subtrees; hashes stay aligned across re-evaluations (same
    # reasoning as sjoin's left/anti path).  Bucket helper columns are
    # EXCLUDED — replicas of one row differ only in them and must share
    # a hash so the difference legs aggregate across replicas.
    ldf = ldf.withColumn(lrow, F.xxhash64(
        *[F.col(c) for c in ldf.columns if c not in l_help]))
    rdf = rdf.withColumn(rrow, F.xxhash64(
        *[F.col(c) for c in rdf.columns if c not in r_help]))

    # Multi-leg hows reference the decorated inputs and the candidate
    # join from several plan subtrees; the bbox decoration and (for
    # WKB layers) the geometry parse are OPAQUE Python stages Spark
    # cannot dedupe across subtrees, so each leg re-scanned and
    # re-decoded both layers (the r16-before 'union' plan held 28
    # parquet scans and 64 ArrowEvalPython nodes for TWO inputs).
    # Guide §8: decode once, decide on the proxy — lazily
    # localCheckpoint the decorated frames (and, when more than one
    # leg consumes it, the candidate set), which bounds the persist
    # by input + candidate size and cuts every repeat decode.  The
    # single-leg hows keep the straight-line plan (no barrier).
    multi_leg = how != "intersection"
    if multi_leg:
        ldf = ldf.transform(plan_barrier)
        rdf = rdf.transform(plan_barrier)

    pairs = _candidate_pairs(lg, rg, ldf, rdf, lbbox_j, rbbox_j,
                             strategy, grid_level, total_bounds,
                             cob_cols=(l_bucket, r_bucket, l_arr, r_arr))
    if how in ("union", "identity", "symmetric_difference"):
        pairs = pairs.transform(plan_barrier)

    # difference legs need ONE row per original feature: drop replicas
    # (keep the copy living in its smallest bucket — every row has one)
    ldf_base, rdf_base = ldf, rdf
    if strategy == "cobucket":
        if l_arr and l_arr in ldf.columns:
            ldf_base = ldf.filter(
                F.col(l_bucket) == F.array_min(F.col(l_arr)))
        if r_arr and r_arr in rdf.columns:
            rdf_base = rdf.filter(
                F.col(r_bucket) == F.array_min(F.col(r_arr)))

    legs = []
    lcols = [c for c in ldf.columns
             if c not in (lbbox_j, lrow) and c not in l_help]
    rcols = [c for c in rdf.columns
             if c not in (rbbox_j, rgeom_j, rrow) and c not in r_help]
    if how in ("intersection", "union", "identity"):
        if (getattr(left, "envelope_exact", False)
                and getattr(right, "envelope_exact", False)):
            # rectangle × rectangle: the piece IS the bbox overlap —
            # clipped corners + one vectorized box-WKB construction,
            # no per-pair kernel call (positive-area pieces only,
            # matching the kernel's area semantics)
            from ..functions.core import st_make_box

            gx0 = F.greatest(F.col(f"{lbbox_j}.minx"),
                             F.col(f"{rbbox_j}.minx"))
            gy0 = F.greatest(F.col(f"{lbbox_j}.miny"),
                             F.col(f"{rbbox_j}.miny"))
            gx1 = F.least(F.col(f"{lbbox_j}.maxx"),
                          F.col(f"{rbbox_j}.maxx"))
            gy1 = F.least(F.col(f"{lbbox_j}.maxy"),
                          F.col(f"{rbbox_j}.maxy"))
            piece = (pairs.filter((gx0 < gx1) & (gy0 < gy1))
                     .withColumn(lgeom_j, st_make_box(gx0, gy0, gx1, gy1)))
        else:
            # keep_geom_type=True (geopandas default: drop pieces of
            # lower dimension than their left input, e.g. the crossing
            # POINTS of a line×line pair) runs INSIDE the kernel UDF —
            # the r15/r16 SQL-side dim filter made the optimizer
            # re-evaluate the kernel above the filter for every
            # downstream projection (guide §4.4) and paid two extra
            # st_geometrytype Python passes
            inter = _pair_intersection_udf(keep_geom_type=keep_geom_type)
            piece = pairs.withColumn("_ov_piece", inter(F.col(lgeom_j),
                                                        F.col(rgeom_j)))
            piece = piece.filter(F.col("_ov_piece").isNotNull())
            piece = piece.withColumn(lgeom_j, F.col("_ov_piece")) \
                .drop("_ov_piece")
        legs.append(piece.select(
            *[c for c in lcols if c != lgeom_j], *rcols, lgeom_j))
    if how in ("difference", "symmetric_difference", "union", "identity"):
        ldiff = _difference_leg(ldf_base, lrow, lgeom_j, pairs, rgeom_j)
        legs.append(ldiff.select(
            *[c for c in lcols if c != lgeom_j], lgeom_j))
    if how in ("symmetric_difference", "union"):
        rdiff = _difference_leg(rdf_base, rrow, rgeom_j, pairs, lgeom_j)
        # right-difference pieces adopt the left geometry column name so
        # every leg shares one schema
        rdiff = rdiff.withColumnRenamed(rgeom_j, lgeom_j)
        legs.append(rdiff.select(*rcols, lgeom_j))

    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg, allowMissingColumns=True)
    # uniform column order: left attrs, right attrs, geometry — limited
    # to what the chosen `how` produces (pure difference carries only
    # left attributes, matching geopandas)
    present = set(out.columns)
    attrs = [c for c in ([c for c in lcols if c != lgeom_j]
                         + [c for c in rcols if c not in lcols])
             if c in present]
    out = out.select(*attrs, lgeom_j)
    # geopandas.overlay keeps the geometry column under the LEFT layer's
    # original name even when both sides were suffixed for the join (the
    # common both-named-'geometry' case); restore it unless an attribute
    # column took that name, and key the CRS map by the final name so
    # res.crs resolves (previously it was keyed by the pre-suffix name).
    out_geom = lgeom_j
    if lgeom_j != lgeom and lgeom not in attrs:
        out = out.withColumnRenamed(lgeom_j, lgeom)
        out_geom = lgeom
    crs_map = {out_geom: getattr(left, "_crs", {}).get(lgeom)}
    return GeoDataFrame(out, out_geom, crs_map=crs_map)
