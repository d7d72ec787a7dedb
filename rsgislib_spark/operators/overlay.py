"""Polygon overlay with GEOMETRY output — pure Catalyst.

Re-expresses the reference's geometric-overlay family
(``vec_lyr_intersection_gp`` and friends, python/rsgislib/vectorgeoms/
__init__.py:1137-1401 — geopandas ``overlay(how=...)``) for the
engine's dominant overlay case: clipping a polygon layer by an
axis-aligned rectangle layer (grid cells, tile footprints, zone boxes —
``how='intersection'``).

The clip is Sutherland–Hodgman against the rect's four half-planes,
UNROLLED into Spark SQL higher-order array functions (``transform`` /
``flatten`` / ``element_at`` over ``array<array<double>>`` vertices) —
no UDF, whole plan JVM-side, and the identical formula emits a DuckDB
dialect twin so the output vertices are oracle-checkable bit-for-bit
(every intersection point is the same IEEE-double expression in both
engines).

Scale shape: candidate pairs via the usual bbox broadcast join; the
clip itself is per-row column math (zero shuffle).  Arbitrary convex
clip polygons reduce to the same pass-per-edge unrolling; concave
clips need the general Weiler–Atherton walk, which the reference
itself delegates to GEOS.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["clip_rect_expr_sql", "overlay_intersection_rect"]

_SIDES = ("xmin", "xmax", "ymin", "ymax")


def _clip_pass(dialect: str, verts: str, side: str, bound: str,
               k: int) -> str:
    """One Sutherland–Hodgman half-plane pass as a SQL expression.

    ``verts``: expression of type array<array<double>> (vertex = [x,y]);
    ``side``: which half-plane; ``bound``: SQL expression for the clip
    coordinate; ``k``: unique pass index (lambda names must not shadow
    across chained passes).  The vertex list is bound ONCE via a
    single-element ``transform`` (a poor man's LET), so chaining passes
    grows the expression linearly, not exponentially.
    """
    if dialect == "spark":
        tf, size_fn = "transform", "size"
        seq = "sequence(1, {n})"
        el = "element_at({a}, {i})"
        arr = "array({items})"
        empty = "CAST(array() AS array<array<double>>)"
    elif dialect == "duckdb":
        tf, size_fn = "list_transform", "len"
        seq = "generate_series(1, {n})"
        el = "list_extract({a}, {i})"
        arr = "[{items}]"
        empty = "CAST([] AS DOUBLE[][])"
    else:
        raise ValueError(dialect)

    v, i = f"_v{k}", f"_i{k}"
    axis = 1 if side in ("xmin", "xmax") else 2
    oax = 2 if axis == 1 else 1
    cmp_op = ">=" if side in ("xmin", "ymin") else "<="

    cur = el.format(a=v, i=i)
    prev = el.format(
        a=v, i=f"CASE WHEN {i} = 1 THEN {size_fn}({v}) ELSE {i} - 1 END")

    def coord(pt: str, ax: int) -> str:
        return el.format(a=f"({pt})", i=ax)

    def ins(pt: str) -> str:
        return f"{coord(pt, axis)} {cmp_op} ({bound})"

    # segment prev->cur crossing the clip line axis = bound:
    # t = (bound - prev_axis) / (cur_axis - prev_axis);
    # other = prev_oax + t * (cur_oax - prev_oax)
    t = (f"((({bound}) - {coord(prev, axis)})"
         f" / ({coord(cur, axis)} - {coord(prev, axis)}))")
    other = (f"({coord(prev, oax)} + {t}"
             f" * ({coord(cur, oax)} - {coord(prev, oax)}))")
    ipt = arr.format(items=f"({bound}), {other}" if axis == 1
                     else f"{other}, ({bound})")

    body = (f"CASE "
            f"WHEN {ins(cur)} AND {ins(prev)} THEN {arr.format(items=cur)} "
            f"WHEN {ins(cur)} THEN {arr.format(items=f'{ipt}, {cur}')} "
            f"WHEN {ins(prev)} THEN {arr.format(items=ipt)} "
            f"ELSE {empty} END")
    per_edges = (f"flatten({tf}({seq.format(n=f'{size_fn}({v})')}, "
                 f"{i} -> {body}))")
    guarded = (f"CASE WHEN {size_fn}({v}) >= 3 THEN {per_edges} "
               f"ELSE {empty} END")
    # bind the (possibly deeply nested) verts expression once
    return (f"flatten({tf}({arr.format(items=verts)}, "
            f"{v} -> {guarded}))")


def clip_rect_expr_sql(dialect: str, verts: str, xmin: str, xmax: str,
                       ymin: str, ymax: str) -> str:
    """Full rect clip: four chained half-plane passes (SH order)."""
    e = verts
    for k, (side, bound) in enumerate(zip(_SIDES, (xmin, xmax, ymin, ymax))):
        e = _clip_pass(dialect, e, side, bound, k)
    return e


def overlay_intersection_rect(
    polys: DataFrame,
    rects: DataFrame,
    *,
    poly_key: str = "poly_id",
    verts_col: str = "verts",
    rect_key: str = "rect_id",
    res: int = 5,
) -> DataFrame:
    """``vec_lyr_intersection_gp`` for a rect clip layer, vertex rows out.

    ``polys``: (poly_key, verts array<array<double>>, pxmin/pxmax/
    pymin/pymax); ``rects``: (rect_key, rxmin/rxmax/rymin/rymax).
    Output: one row per clipped-polygon vertex
    (poly_id, rect_id, v_idx, vx, vy) — pairs whose intersection is
    empty (or degenerate, < 3 vertices) produce no rows, matching
    geopandas ``overlay`` dropping empty geometries.
    """
    # candidate generation on the grid-cell key (equi-join Catalyst can
    # hash/sort-merge at any layer size), bbox-refined — a raw bbox
    # predicate would force a nested-loop join that only works while
    # the clip layer broadcasts.  The cell res must be COARSE relative
    # to the clip rects: polyfilling a rect explodes one row per
    # covered cell, so fine cells square the row count (measured: the
    # default res-12 grid blew a 432-rect layer into 5.6 M exploded
    # rows and a 10 s join on 25 polygons; res 5 covers each in 1-4).
    from .spatial_join import with_bbox_cells

    pc = with_bbox_cells(polys, "pxmin", "pxmax", "pymin", "pymax",
                         res=res)
    rc = with_bbox_cells(rects, "rxmin", "rxmax", "rymin", "rymax",
                         res=res)
    cand = (
        pc.join(F.broadcast(rc), "cell", "inner")
        .where((F.col("pxmax") > F.col("rxmin"))
               & (F.col("rxmax") > F.col("pxmin"))
               & (F.col("pymax") > F.col("rymin"))
               & (F.col("rymax") > F.col("pymin")))
        .dropDuplicates([poly_key, rect_key])
    )
    clipped = clip_rect_expr_sql("spark", verts_col,
                                 "rxmin", "rxmax", "rymin", "rymax")
    out = cand.select(
        F.col(poly_key).alias("poly_id"),
        F.col(rect_key).alias("rect_id"),
        # degenerate (< 3 vertex) results drop; the single-element
        # transform binds the big clip expression once (LET)
        F.posexplode(F.expr(
            f"flatten(transform(array({clipped}), _f -> "
            f"CASE WHEN size(_f) >= 3 THEN _f "
            f"ELSE CAST(array() AS array<array<double>>) END))"
        )).alias("v_idx0", "_v"),
    )
    return out.select(
        "poly_id", "rect_id",
        (F.col("v_idx0") + 1).cast("long").alias("v_idx"),
        F.element_at("_v", 1).alias("vx"),
        F.element_at("_v", 2).alias("vy"),
    )
