"""Distributed spatial join: the engine's flagship operator.

Re-expresses ``rsgislib.vectorutils.perform_spatial_join`` (reference:
python/rsgislib/vectorutils/__init__.py:2159-2223 — geopandas ``sjoin`` with
``how in {left, right, inner}`` and ``op in {intersects, within,
contains}``) as a two-phase Spark plan:

1. **candidate generation** — both sides are keyed by integer grid cells
   (``geo.cellindex``): points get ``cell_of_point``; bbox geometries get
   their ``polyfill`` covering exploded to one row per cell.  The join is a
   plain equi-join on ``cell`` so Catalyst gets a hash/broadcast/sort-merge
   join with all its machinery (AQE, DPP).  The rtree of the reference is
   replaced by this key — the "spatial pushdown".

2. **exact refinement** — a deterministic geometry predicate over the
   candidate pairs.  For the bbox fast path this is pure Catalyst column
   comparisons (reference envelope semantics, geometrytools.py:82-123:
   *strict* inequalities for bbox-bbox intersects/contains; point-in-bbox
   uses the half-open ``min <= p < max`` convention so every point maps to
   exactly one cell-sized slot).  For general polygons the refinement is a
   vectorized ray-casting PIP (``geo.geometry``) in an Arrow pandas UDF.

Scale levers (SURVEY.md §4.2):

* small zone layers are broadcast (`broadcast=True`, the default) — no
  shuffle of the big side at all;
* big-big joins use sort-merge on ``cell`` with optional **explicit
  salting**: the probe side adds ``salt = pmod(xxhash64(id), n_salt)``,
  the build side explodes all ``n_salt`` values per cell.  This splits a
  single hot cell (AQE skew-join cannot split one key) — the megacity
  cell in the synthetic world is exactly that case.

Like geopandas sjoin, the output keeps base-side rows/geometry plus the
joined side's attributes and an ``index_right`` column; ``how='left'``
keeps unmatched base rows with null attributes, ``how='right'`` keeps all
join rows, ``inner`` only matches.  An empty result is an empty DataFrame
(the reference's "no output file written" materialization rule,
vectorutils/__init__.py:2219-2223, belongs to the sink layer).
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from ..geo.cellindex import DEFAULT_RES, _RES_SHIFT, _X_SHIFT, cell_sql_expr

__all__ = [
    "with_point_cell",
    "with_bbox_cells",
    "spatial_join",
    "spatial_join_poly",
    "vec_intersects_vec",
    "vec_predicate_vec",
    "spatial_select",
    "JOIN_OPS",
    "JOIN_HOWS",
]

JOIN_OPS = ("intersects", "within", "contains")
JOIN_HOWS = ("left", "right", "inner")


def with_point_cell(df: DataFrame, lon: str = "lon", lat: str = "lat",
                    res: int = DEFAULT_RES, out: str = "cell") -> DataFrame:
    """Assign the containing grid cell — pure Catalyst arithmetic (no UDF)."""
    return df.withColumn(out, F.expr(cell_sql_expr(lon, lat, res)))


def _axis_idx(expr: str, origin: float, extent: float, n: int) -> Column:
    c = F.floor((F.expr(expr) + F.lit(origin)) / F.lit(extent) * F.lit(float(n)))
    return F.least(F.greatest(c, F.lit(0)), F.lit(n - 1)).cast("long")


def with_bbox_cells(df: DataFrame, xmin: str, xmax: str, ymin: str, ymax: str,
                    res: int = DEFAULT_RES, out: str = "cell") -> DataFrame:
    """Explode each bbox row to one row per covering cell (polyfill).

    Implemented with ``sequence``/``explode`` so it stays JVM-side; the
    covering includes boundary cells (candidate superset — refinement
    removes false positives).
    """
    n = 1 << res
    nx0 = _axis_idx(xmin, 180.0, 360.0, n)
    nx1 = _axis_idx(xmax, 180.0, 360.0, n)
    ny0 = _axis_idx(ymin, 90.0, 180.0, n)
    ny1 = _axis_idx(ymax, 90.0, 180.0, n)
    return (
        df.withColumn("_nx", F.explode(F.sequence(nx0, nx1)))
        .withColumn("_ny", F.explode(F.sequence(ny0, ny1)))
        .withColumn(
            out,
            F.lit(res).cast("long") * F.lit(_RES_SHIFT)
            + F.col("_nx") * F.lit(_X_SHIFT) + F.col("_ny"),
        )
        .drop("_nx", "_ny")
    )


def _point_in_bbox(lon: str, lat: str, bxmin: str, bxmax: str,
                   bymin: str, bymax: str) -> Column:
    """Half-open point-in-bbox: min <= p < max (one slot per point)."""
    return (
        (F.col(lon) >= F.col(bxmin)) & (F.col(lon) < F.col(bxmax))
        & (F.col(lat) >= F.col(bymin)) & (F.col(lat) < F.col(bymax))
    )


def _bbox_intersects(a: Iterable[str], b: Iterable[str]) -> Column:
    """Strict bbox-bbox overlap (geometrytools.py:82-102)."""
    axmin, axmax, aymin, aymax = a
    bxmin, bxmax, bymin, bymax = b
    return (
        (F.col(axmax) > F.col(bxmin)) & (F.col(bxmax) > F.col(axmin))
        & (F.col(aymax) > F.col(bymin)) & (F.col(bymax) > F.col(aymin))
    )


def _bbox_contains(a: Iterable[str], b: Iterable[str]) -> Column:
    """Strict a-contains-b (geometrytools.py:104-123)."""
    axmin, axmax, aymin, aymax = a
    bxmin, bxmax, bymin, bymax = b
    return (
        (F.col(axmin) < F.col(bxmin)) & (F.col(axmax) > F.col(bxmax))
        & (F.col(aymin) < F.col(bymin)) & (F.col(aymax) > F.col(bymax))
    )


def spatial_join(
    base: DataFrame,
    join: DataFrame,
    *,
    how: str = "inner",
    op: str = "within",
    base_geom: str = "point",          # 'point' | 'bbox'
    base_cols=("lon", "lat"),           # point cols or bbox cols (4)
    join_bbox=("zxmin", "zxmax", "zymin", "zymax"),
    base_key: str = "image_id",
    join_key: str = "zone_id",
    res: int = DEFAULT_RES,
    broadcast: bool = True,
    n_salt: int | None = None,
) -> DataFrame:
    """Spatial join of a big base layer against a (bbox-geometry) join layer.

    Validation mirrors the reference (vectorutils/__init__.py:2196-2199).
    Output = base columns + join attribute columns + ``index_right``
    (= matched ``join_key``), geopandas-style.
    """
    if how not in JOIN_HOWS + ("semi",):
        raise ValueError("The join_how specified is not valid.")
    if op not in JOIN_OPS:
        raise ValueError("The join_op specified is not valid.")

    # geopandas sjoin suffixing: attribute columns present on BOTH sides
    # keep the base's name and the join side gains ``_right`` (geopandas
    # lsuffix/rsuffix defaults with lsuffix applied only on true clashes;
    # our base keeps its column so only the right side renames).
    clash = (set(base.columns) & set(join.columns)) - {join_key}
    if clash:
        join = join.select(*[
            F.col(c).alias(f"{c}_right") if c in clash else F.col(c)
            for c in join.columns
        ])
        join_bbox = tuple(f"{c}_right" if c in clash else c
                          for c in join_bbox)

    # --- candidate keying ------------------------------------------------
    if base_geom == "point":
        lon, lat = base_cols
        keyed_base = with_point_cell(base, lon, lat, res)
    elif base_geom == "bbox":
        keyed_base = with_bbox_cells(base, *base_cols, res=res)
    else:
        raise ValueError(f"unknown base_geom {base_geom!r}")

    keyed_join = with_bbox_cells(join, *join_bbox, res=res)

    # --- exact predicate -------------------------------------------------
    if base_geom == "point":
        lon, lat = base_cols
        # for a point, within == intersects; contains never holds for a
        # non-degenerate polygon — mirror geopandas' row-wise predicate.
        if op in ("within", "intersects"):
            pred = _point_in_bbox(lon, lat, *join_bbox)
        else:  # contains
            pred = F.lit(False)
    else:
        if op == "intersects":
            pred = _bbox_intersects(base_cols, join_bbox)
        elif op == "within":
            pred = _bbox_contains(join_bbox, base_cols)
        else:  # contains
            pred = _bbox_contains(base_cols, join_bbox)

    join_attrs = [c for c in join.columns if c != join_key]

    # --- join strategy ---------------------------------------------------
    if broadcast:
        matched = (
            keyed_base.join(F.broadcast(keyed_join), "cell", "inner")
            .where(pred)
        )
    elif n_salt:
        # explicit hot-cell salting: probe side one salt value, build side
        # replicated n_salt times -> a hot cell splits into n_salt tasks.
        salted_base = keyed_base.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col(base_key)), F.lit(n_salt))
        )
        salted_join = keyed_join.withColumn(
            "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
        )
        matched = (
            salted_base.join(salted_join, ["cell", "_salt"], "inner")
            .where(pred)
            .drop("_salt")
        )
    else:
        matched = keyed_base.join(keyed_join, "cell", "inner").where(pred)

    # bbox bases can match a zone through several shared cells -> dedupe
    # pairs; point bases sit in exactly one cell so pairs are unique.
    if base_geom == "bbox":
        matched = matched.dropDuplicates([base_key, join_key])

    matched = matched.drop("cell").withColumn("index_right", F.col(join_key))

    if how == "inner":
        return matched
    if how == "semi":
        # spatial semi-join: base rows with >= 1 match, each exactly once
        # (spatial_select_gp's sjoin + dedupe-on-FID, vectorutils:1562-1615).
        return base.join(matched.select(base_key).distinct(),
                         base_key, "left_semi")
    if how == "left":
        attach = matched.select(base_key, "index_right", *join_attrs)
        return base.join(attach, base_key, "left")
    # right: keep every join row, attach matched base rows
    attach = matched.select(*base.columns, "index_right")
    return join.withColumn("index_right", F.col(join_key)).join(
        attach, "index_right", "left"
    )


_POLY_PAIR_SCHEMA = "image_id string, poly_id long"


def spatial_join_poly(
    points: DataFrame,
    polys: DataFrame,
    *,
    point_key: str = "image_id",
    lon: str = "lon",
    lat: str = "lat",
    poly_key: str = "poly_id",
    verts_col: str = "verts",
    res: int = DEFAULT_RES,
) -> DataFrame:
    """Point-in-POLYGON join for general (non-bbox) polygon layers.

    The general-geometry path of ``perform_spatial_join``: candidate
    generation is the same cell equi-join (polygon bboxes polyfilled to
    cells), refinement is the vectorized ray-casting PIP of
    ``geo.geometry.points_in_polygon`` run over Arrow batches with
    ``mapInPandas`` on the candidates' EXISTING partitioning — each
    batch vectorizes per polygon-within-batch, so no shuffle is spent
    on refinement and a continent-sized hot polygon's candidates stay
    spread across however many tasks produced them (the per-point PIP
    test is row-independent, so any partitioning is correct).

    ``polys`` needs (poly_key, verts_col = array<array<double>> ring
    vertices, pxmin/pxmax/pymin/pymax bbox columns).  Output: matched
    (point_key, poly_key) pairs.
    """
    import pandas as pd

    from ..geo.geometry import points_in_polygon

    keyed_pts = with_point_cell(
        points.select(F.col(point_key), F.col(lon), F.col(lat)),
        lon, lat, res)
    keyed_polys = with_bbox_cells(
        polys.select(poly_key, verts_col, "pxmin", "pxmax", "pymin", "pymax"),
        "pxmin", "pxmax", "pymin", "pymax", res=res)
    cand = (
        keyed_pts.join(F.broadcast(keyed_polys), "cell", "inner")
        .where((F.col(lon) >= F.col("pxmin")) & (F.col(lon) < F.col("pxmax"))
               & (F.col(lat) >= F.col("pymin")) & (F.col(lat) < F.col("pymax")))
        .select(point_key, lon, lat, poly_key, verts_col)
    )

    def refine(it):
        for pdf in it:
            kept = []
            for _pk, grp in pdf.groupby(poly_key, sort=False):
                poly = np.asarray([list(v) for v in grp[verts_col].iloc[0]],
                                  dtype=np.float64)
                inside = points_in_polygon(grp[lon].to_numpy(),
                                           grp[lat].to_numpy(), poly)
                kept.append(grp.loc[inside, [point_key, poly_key]])
            if kept:
                out = pd.concat(kept, ignore_index=True)
            else:
                out = pd.DataFrame({point_key: [], poly_key: []})
            yield out.rename(columns={point_key: "image_id",
                                      poly_key: "poly_id"})

    return cand.mapInPandas(refine, _POLY_PAIR_SCHEMA)


def spatial_select(base: DataFrame, roi: DataFrame, **kw) -> DataFrame:
    """Spatial semi-join: base features intersecting >= 1 ROI feature.

    Reference: ``spatial_select_gp`` (vectorutils/__init__.py:1562-1615) —
    inner sjoin then dedupe on a temp FID; and the slow-path
    ``spatial_select`` (:2565-2610).  Here it is a ``left_semi`` join on
    the cell key + exact refinement, so the base side is never duplicated
    and no join-side attributes are shuffled at all.
    """
    kw.setdefault("op", "intersects")
    return spatial_join(base, roi, how="semi", **kw)


def vec_predicate_vec(
    polys_a: DataFrame,
    polys_b: DataFrame,
    *,
    predicate: str = "intersects",
    a_key: str = "poly_id",
    b_key: str = "poly_id",
    verts_col: str = "verts",
    exclude_same_key: bool = False,
    res: int = 5,
    broadcast: bool = False,
) -> DataFrame:
    """Layer-vs-layer polygon boolean join family (``vec_*_vec``).

    Reference: the exists-join family ``vec_intersects_vec`` /
    ``vec_within_vec`` / ``vec_contains_vec`` / ``vec_overlaps_vec`` /
    ``vec_touches_vec`` / ``vec_crosses_vec`` (python/rsgislib/
    vectorgeoms/__init__.py:2608, 2675, 2746 et seq.) — for every A
    feature, whether (and how many) B features satisfy the predicate.

    Scale shape: candidate pairs come from a grid-CELL equi-join
    (coarse ``res``, one row per covered cell — the same key as every
    other join here, so Catalyst gets hash/sort-merge + AQE skew
    handling at ANY layer size; set ``broadcast=True`` only to force
    the hint for a provably tiny B layer — by default AQE's runtime
    size statistics make that call), refined by an INCLUSIVE bbox test
    (touching bboxes stay candidates — required for ``touches``), then
    the exact predicate runs VECTORIZED over each Arrow batch
    (``geo.geometry.poly_pair_predicate``: pad-to-max-verts tensors,
    no per-pair Python loop) on the candidates' existing partitioning —
    no shuffle is spent on refinement.

    Both layers need (key, verts array<array<double>>, pxmin/pxmax/
    pymin/pymax).  Output: one row per A feature — (a_key, n_match,
    any_match), zeros kept.  The output key column keeps ``polys_a``'s
    key name AND type (string keys work; nothing is coerced).
    """
    from pyspark.sql.types import LongType, StructField, StructType

    from ..geo.geometry import PAIR_PREDICATES, poly_pair_predicate

    if predicate not in PAIR_PREDICATES:
        raise ValueError(f"unknown pair predicate {predicate!r}")

    key_field = polys_a.schema[a_key]
    out_schema = StructType([
        StructField("akey", key_field.dataType, True),
        StructField("hit", LongType(), True),
    ])

    a = with_bbox_cells(
        polys_a.select(F.col(a_key).alias("akey"),
                       F.col(verts_col).alias("av"),
                       F.col("pxmin").alias("_axmin"),
                       F.col("pxmax").alias("_axmax"),
                       F.col("pymin").alias("_aymin"),
                       F.col("pymax").alias("_aymax")),
        "_axmin", "_axmax", "_aymin", "_aymax", res=res)
    b = with_bbox_cells(
        polys_b.select(F.col(b_key).alias("bkey"),
                       F.col(verts_col).alias("bv"),
                       F.col("pxmin").alias("_bxmin"),
                       F.col("pxmax").alias("_bxmax"),
                       F.col("pymin").alias("_bymin"),
                       F.col("pymax").alias("_bymax")),
        "_bxmin", "_bxmax", "_bymin", "_bymax", res=res)
    if broadcast:
        b = F.broadcast(b)
    # inclusive bbox prefilter: touching bboxes remain candidates
    cand = (
        a.join(b, "cell", "inner")
        .where((F.col("_axmax") >= F.col("_bxmin"))
               & (F.col("_bxmax") >= F.col("_axmin"))
               & (F.col("_aymax") >= F.col("_bymin"))
               & (F.col("_bymax") >= F.col("_aymin")))
    )
    if exclude_same_key:
        cand = cand.where(F.col("akey") != F.col("bkey"))
    cand = cand.dropDuplicates(["akey", "bkey"]).select("akey", "av", "bv")

    def refine(it):
        for pdf in it:
            if len(pdf) == 0:
                yield pd.DataFrame({"akey": pdf["akey"],
                                    "hit": pd.Series([], dtype="int64")})
                continue
            hits = poly_pair_predicate(list(pdf["av"]), list(pdf["bv"]),
                                       predicate)
            yield pd.DataFrame({"akey": pdf["akey"].to_numpy(),
                                "hit": hits.astype("int64")})

    agg = (
        cand.mapInPandas(refine, out_schema)
        .groupBy("akey").agg(F.sum("hit").alias("n_match"))
    )
    return (
        polys_a.select(F.col(a_key).alias("akey"))
        .join(agg, "akey", "left")
        .fillna({"n_match": 0})
        .withColumn("any_match", F.col("n_match") > 0)
        .withColumnRenamed("akey", a_key)
    )


def vec_intersects_vec(
    polys_a: DataFrame,
    polys_b: DataFrame,
    *,
    a_key: str = "poly_id",
    b_key: str = "poly_id",
    verts_col: str = "verts",
    exclude_same_key: bool = False,
) -> DataFrame:
    """``vec_intersects_vec`` — kept as the predicate family's front door.

    Output: one row per A feature — (a_key, n_intersecting,
    any_intersects), zeros kept.  See :func:`vec_predicate_vec`.
    """
    out = vec_predicate_vec(polys_a, polys_b, predicate="intersects",
                            a_key=a_key, b_key=b_key, verts_col=verts_col,
                            exclude_same_key=exclude_same_key)
    return out.withColumnRenamed("n_match", "n_intersecting") \
        .withColumnRenamed("any_match", "any_intersects")
