"""Geometry transforms: polyline, explode-multi, hole removal, simplify.

Re-expresses the reference's vectorgeoms transform family as pure
Catalyst array expressions over ``array<array<double>>`` ring vertices
(multi-geometries / ring sets are one nesting level deeper):

* polygon -> polyline (exterior ring as a closed line) —
  vectorgeoms/__init__.py:20 (``convert_polygon_to_polyline``);
* explode multi -> single parts — :1609 ``explode_vec_lyr`` /
  :1675 ``explode_vec_files`` (geopandas ``explode``);
* delete holes below an area threshold — :1885
  ``delete_polygon_holes`` (exterior ring always kept);
* simplify — :1797 ``simplify_geometries``; shapely ``simplify`` is
  Douglas–Peucker, replicated here as the one-pass variant (drop every
  vertex whose perpendicular distance to its neighbour chord is below
  ``tolerance``) so the transform stays a single Catalyst expression;
  for collinear-vertex removal (tolerance -> 0) the two are identical.

All expressions emit both Spark-SQL and DuckDB dialects (the overlay
module's pattern) so outputs are oracle-checkable; coordinates flow
through identical IEEE-double arithmetic in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["ring_area2_sql", "ring_centroid_sql", "simplify_ring_sql",
           "poly_to_polyline",
           "explode_multi", "delete_holes", "simplify_polys",
           "shift_xy"]


def _d(dialect: str):
    if dialect == "spark":
        return dict(tf="transform", flt="filter", size="size",
                    seq="sequence(1, {n})",
                    el="element_at({a}, {i})",
                    summ=("aggregate({l}, CAST(0.0 AS DOUBLE), "
                          "(_acc, _x) -> _acc + _x)"))
    if dialect == "duckdb":
        return dict(tf="list_transform", flt="list_filter", size="len",
                    seq="generate_series(1, {n})",
                    el="list_extract({a}, {i})",
                    summ="list_sum({l})")
    raise ValueError(dialect)


def ring_area2_sql(dialect: str, ring: str) -> str:
    """2x the SIGNED shoelace area of a ring expression (open form)."""
    d = _d(dialect)
    el = d["el"]

    def c(i: str, ax: int) -> str:
        return el.format(a=f"({el.format(a='_r0', i=i)})", i=ax)

    nxt = f"(_k % {d['size']}(_r0)) + 1"
    term = (f"{c('_k', 1)} * {c(nxt, 2)} - {c(nxt, 1)} * {c('_k', 2)}")
    inner = (f"{d['summ'].format(l=d['tf'] + '(' + d['seq'].format(n=d['size'] + '(_r0)') + ', _k -> ' + term + ')')}")
    # bind the ring expression once (single-element transform LET)
    if dialect == "spark":
        return (f"element_at(transform(array({ring}), _r0 -> {inner}), 1)")
    return f"list_extract(list_transform([{ring}], _r0 -> {inner}), 1)"


def ring_centroid_sql(dialect: str, ring: str, axis: int) -> str:
    """Area (shoelace) centroid coordinate of a ring expression.

    C_axis = sum((c_k + c_nxt) * cross_k) / (3 * sum(cross_k)) with
    cross_k = x_k*y_nxt - x_nxt*y_k — the shapely ``geom.centroid``
    semantics of calc_poly_centroids (vectorgeoms/__init__.py:1066).
    Element-order list sums + one division: identical IEEE doubles in
    both engines (same fold pattern as :func:`ring_area2_sql`).
    """
    d = _d(dialect)
    el = d["el"]

    def c(i: str, ax: int) -> str:
        return el.format(a=f"({el.format(a='_r0', i=i)})", i=ax)

    nxt = f"(_k % {d['size']}(_r0)) + 1"
    cross = f"({c('_k', 1)} * {c(nxt, 2)} - {c(nxt, 1)} * {c('_k', 2)})"
    num_t = f"({c('_k', axis)} + {c(nxt, axis)}) * {cross}"

    def fold(term: str) -> str:
        return d["summ"].format(
            l=d["tf"] + "(" + d["seq"].format(n=d["size"] + "(_r0)")
            + ", _k -> " + term + ")")

    inner = f"({fold(num_t)}) / (3.0 * ({fold(cross)}))"
    if dialect == "spark":
        return f"element_at(transform(array({ring}), _r0 -> {inner}), 1)"
    return f"list_extract(list_transform([{ring}], _r0 -> {inner}), 1)"


def simplify_ring_sql(dialect: str, ring: str, tol: float) -> str:
    """One-pass vertex decimation: drop v_i when its perpendicular
    distance to the chord (v_prev, v_next) is <= tol (squared form —
    no sqrt, identical doubles in both engines)."""
    d = _d(dialect)
    el = d["el"]
    size = d["size"]

    def c(i: str, ax: int) -> str:
        return el.format(a=f"({el.format(a='_r1', i=i)})", i=ax)

    prev = f"(CASE WHEN _k = 1 THEN {size}(_r1) ELSE _k - 1 END)"
    nxt = f"((_k % {size}(_r1)) + 1)"
    cross = (f"(({c(nxt, 1)} - {c(prev, 1)}) * ({c('_k', 2)} - {c(prev, 2)})"
             f" - ({c(nxt, 2)} - {c(prev, 2)}) * ({c('_k', 1)} - {c(prev, 1)}))")
    len2 = (f"(({c(nxt, 1)} - {c(prev, 1)}) * ({c(nxt, 1)} - {c(prev, 1)})"
            f" + ({c(nxt, 2)} - {c(prev, 2)}) * ({c(nxt, 2)} - {c(prev, 2)}))")
    keep = f"{cross} * {cross} > {tol} * {tol} * {len2}"
    if dialect == "spark":
        kept = (f"filter(transform(sequence(1, size(_r1)), _k -> "
                f"IF({keep}, element_at(_r1, _k), NULL)), _p -> _p IS NOT NULL)")
        return f"element_at(transform(array({ring}), _r1 -> {kept}), 1)"
    kept = (f"list_filter(list_transform(generate_series(1, len(_r1)), _k -> "
            f"CASE WHEN {keep} THEN list_extract(_r1, _k) END), _p -> _p IS NOT NULL)")
    return f"list_extract(list_transform([{ring}], _r1 -> {kept}), 1)"


def poly_to_polyline(polys: DataFrame, poly_key: str = "poly_id",
                     verts_col: str = "verts") -> DataFrame:
    """Exterior ring as a CLOSED polyline: n+1 vertex rows per polygon
    (last point repeats the first — the LineString closure rule)."""
    closed = (f"concat({verts_col}, array(element_at({verts_col}, 1)))")
    out = polys.select(
        F.col(poly_key).alias("poly_id"),
        F.posexplode(F.expr(closed)).alias("v_idx0", "_v"))
    return out.select(
        "poly_id", (F.col("v_idx0") + 1).cast("long").alias("v_idx"),
        F.element_at("_v", 1).alias("vx"), F.element_at("_v", 2).alias("vy"))


def explode_multi(multis: DataFrame, key: str = "geom_id",
                  parts_col: str = "parts") -> DataFrame:
    """Multi-geometry -> one row per single-part geometry with summary.

    ``parts_col``: array of rings.  Output: (geom_id, part_idx,
    n_verts, area) — geopandas ``explode`` row semantics with the
    per-part shoelace area attached.
    """
    out = multis.select(
        F.col(key).alias("geom_id"),
        F.posexplode(F.col(parts_col)).alias("part_idx0", "_ring"))
    area2 = ring_area2_sql("spark", "_ring")
    return out.select(
        "geom_id", (F.col("part_idx0") + 1).cast("long").alias("part_idx"),
        F.size("_ring").cast("long").alias("n_verts"),
        (F.abs(F.expr(area2)) / 2.0).alias("area"))


def delete_holes(polys: DataFrame, key: str = "geom_id",
                 rings_col: str = "rings",
                 area_thres: float | None = None) -> DataFrame:
    """Drop interior rings (holes) below ``area_thres``.

    ``rings_col``: array of rings, element 1 = exterior (always kept);
    ``area_thres=None`` drops every hole (the reference default).
    Output: (geom_id, ring_idx, n_verts, area) rows for KEPT rings,
    ring_idx renumbered 1..k in original order.
    """
    out = polys.select(
        F.col(key).alias("geom_id"),
        F.posexplode(F.col(rings_col)).alias("ring_idx0", "_ring"))
    area2 = ring_area2_sql("spark", "_ring")
    out = out.withColumn("area", F.abs(F.expr(area2)) / 2.0)
    keep = (F.col("ring_idx0") == 0)
    if area_thres is not None:
        keep = keep | (F.col("area") >= float(area_thres))
    from pyspark.sql import Window
    w = Window.partitionBy("geom_id").orderBy("ring_idx0")
    return (
        out.where(keep)
        .withColumn("ring_idx", F.row_number().over(w).cast("long"))
        .select("geom_id", "ring_idx",
                F.size("_ring").cast("long").alias("n_verts"), "area")
    )


def simplify_polys(polys: DataFrame, tolerance: float,
                   poly_key: str = "poly_id",
                   verts_col: str = "verts") -> DataFrame:
    """simplify_geometries (one-pass decimation): vertex rows out."""
    simplified = simplify_ring_sql("spark", verts_col, float(tolerance))
    out = polys.select(
        F.col(poly_key).alias("poly_id"),
        F.posexplode(F.expr(simplified)).alias("v_idx0", "_v"))
    return out.select(
        "poly_id", (F.col("v_idx0") + 1).cast("long").alias("v_idx"),
        F.element_at("_v", 1).alias("vx"), F.element_at("_v", 2).alias("vy"))


def shift_xy(df: DataFrame, dx: float, dy: float,
             lon: str = "lon", lat: str = "lat",
             x_out: str = "sx", y_out: str = "sy") -> DataFrame:
    """``shiftxy_vec_lyr`` (vectorgeoms/__init__.py:3022): translate a
    layer by (dx, dy) — plain column arithmetic."""
    return df.withColumn(x_out, F.col(lon) + F.lit(float(dx))) \
        .withColumn(y_out, F.col(lat) + F.lit(float(dy)))
