"""Line-geometry operators (reference ``vectorgeoms``).

* ``closest_line_intersection`` (vectorgeoms/__init__.py:432),
  ``line_intersection_range`` (:626) and
  ``scnd_line_intersection_range`` (:833): each input line (a start
  point + a fixed direction) is intersected with every polygon-object
  boundary; outputs are the intersection closest to the start, the
  closest..furthest range, and the second-closest.
* ``get_pt_on_line`` (:154) and ``find_pt_to_side`` (:206) /
  ``create_orthg_lines`` (:270): point at a distance along a vector,
  and the right-/left-hand perpendicular offset point.

Spark-first shape: the object layer is a small dims table (zone rects
-> 4 boundary edges each), so the candidate pairing is a broadcast
nested-loop join with the segment-intersection predicate evaluated in
Catalyst — no shuffle except the per-line top-k aggregation, which is
a map-side-combinable groupBy.  At 10^12 lines the plan is scan ->
broadcast join -> partial agg; nothing accumulates on the driver.

Determinism: intersection parameters are single divisions of pinned
product-difference trees on identical doubles; closest/furthest are
min/max over the bit-identical ``t`` values; the trig chains of
get_pt_on_line / find_pt_to_side are replaced by their ALGEBRAIC
identities (cos(atan(dy/dx)) = |dx|/L etc. — derivation in the query
docstrings), so every branch collapses to ``p1 + dist*(dx/L, dy/L)``
and ``p1 + d12*u + len*n`` with one sqrt each (lesson 19).  The SAME
generated expression text runs in Spark (F.expr) and DuckDB.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: fixed line direction (exact small ints keep the cross products
#: integer-weighted): q = p + (DX, DY)
DX, DY = 41, 17


def edge_stack_expr() -> str:
    """The 4 boundary edges of a zone rect as a stack() expression."""
    return ("stack(4, "
            "0, zxmin, zymin, zxmax, zymin, "
            "1, zxmax, zymin, zxmax, zymax, "
            "2, zxmax, zymax, zxmin, zymax, "
            "3, zxmin, zymax, zxmin, zymin) "
            "AS (edge_idx, ax, ay, bx, by)")


def edge_union_sql(zones: str = "zones") -> str:
    """DuckDB twin of :func:`edge_stack_expr` (no stack() there)."""
    rows = [("0", "zxmin", "zymin", "zxmax", "zymin"),
            ("1", "zxmax", "zymin", "zxmax", "zymax"),
            ("2", "zxmax", "zymax", "zxmin", "zymax"),
            ("3", "zxmin", "zymax", "zxmin", "zymin")]
    parts = [f"SELECT zone_id, CAST({i} AS BIGINT) AS edge_idx, "
             f"{ax} AS ax, {ay} AS ay, {bx} AS bx, {by} AS by "
             f"FROM {zones}" for i, ax, ay, bx, by in rows]
    return " UNION ALL ".join(parts)


def t_expr(px: str = "qlon", py: str = "qlat") -> str:
    """Line parameter t of the segment-segment intersection (shared
    text; den is never 0: the direction is never axis-parallel while
    rect edges always are)."""
    den = (f"(CAST({DX} AS DOUBLE) * (by - ay) "
           f"- CAST({DY} AS DOUBLE) * (bx - ax))")
    num = f"((ax - {px}) * (by - ay) - (ay - {py}) * (bx - ax))"
    return f"({num} / {den})"


def u_expr(px: str = "qlon", py: str = "qlat") -> str:
    den = (f"(CAST({DX} AS DOUBLE) * (by - ay) "
           f"- CAST({DY} AS DOUBLE) * (bx - ax))")
    num = (f"((ax - {px}) * CAST({DY} AS DOUBLE) "
           f"- (ay - {py}) * CAST({DX} AS DOUBLE))")
    return f"({num} / {den})"


def line_zone_intersections(lines: DataFrame,
                            zones: DataFrame) -> DataFrame:
    """Per line: hit count, closest/furthest/second-closest boundary
    intersections with the zone-rect layer (columns qid, qlon, qlat).

    Output: qid, n_hits, t_min, t_scnd, t_max, cx, cy, fx, fy
    (second-closest sentinel -1 when only one hit).  Lines with no
    hit are dropped (the reference writes no output feature).
    """
    edges = zones.selectExpr(edge_stack_expr())
    t, u = t_expr(), u_expr()
    hits = (
        lines.crossJoin(F.broadcast(edges))  # bounded: |zones|*4 edge rows
        .selectExpr("qid", "qlon", "qlat", f"{t} AS t", f"{u} AS u")
        .where("t >= CAST(0 AS DOUBLE) AND t <= CAST(1 AS DOUBLE) "
               "AND u >= CAST(0 AS DOUBLE) AND u <= CAST(1 AS DOUBLE)")
    )
    agg = hits.groupBy("qid", "qlon", "qlat").agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.min("t").alias("t_min"), F.max("t").alias("t_max"))
    scnd = (
        hits.join(agg.select("qid", "t_min"), "qid")
        .where("t > t_min").groupBy("qid")
        .agg(F.min("t").alias("t_scnd_raw"))
    )
    out = agg.join(scnd, "qid", "left")
    return out.selectExpr(
        "qid", "n_hits", "t_min",
        "coalesce(t_scnd_raw, CAST(-1 AS DOUBLE)) AS t_scnd", "t_max",
        f"qlon + t_min * CAST({DX} AS DOUBLE) AS cx",
        f"qlat + t_min * CAST({DY} AS DOUBLE) AS cy",
        f"qlon + t_max * CAST({DX} AS DOUBLE) AS fx",
        f"qlat + t_max * CAST({DY} AS DOUBLE) AS fy")


def line_project_exprs(px: str = "qlon", py: str = "qlat",
                       dist: float = 5.0, length: float = 3.0) -> dict:
    """Shared-text expressions for get_pt_on_line / find_pt_to_side.

    Geometry (per point): p2 = (-px/2, py - 30) — a direction that
    varies per row; pt = the midpoint of p1..p2.  Algebraic forms (see
    module doc): on-line point = p1 + dist*(dx/L, dy/L); side points =
    start + d12*u + len*n with n the right-hand normal (dy,-dx)/L and
    the left-hand variant swapping start/end (the reference's branch
    ladder reduces to exactly these — each branch only re-derives the
    sign of cos/sin(atan(dy/dx))).
    """
    dx = f"((CAST(0 AS DOUBLE) - {px}) / CAST(2 AS DOUBLE) - {px})"
    dy = "(CAST(-30 AS DOUBLE))"
    ln = f"sqrt({dx} * {dx} + {dy} * {dy})"
    d = f"CAST({dist!r} AS DOUBLE)"
    w = f"CAST({length!r} AS DOUBLE)"
    half = f"({ln} * CAST(0.5 AS DOUBLE))"  # |p1 -> midpoint|
    return {
        "ox": f"({px} + {d} * ({dx} / {ln}))",
        "oy": f"({py} + {d} * ({dy} / {ln}))",
        # right-hand from start p1
        "rx": f"({px} + {half} * ({dx} / {ln}) + {w} * ({dy} / {ln}))",
        "ry": f"({py} + {half} * ({dy} / {ln}) - {w} * ({dx} / {ln}))",
        # left-hand: start/end swapped -> start p2, direction -d
        "lx": (f"(({px} + {dx}) + {half} * (CAST(0 AS DOUBLE) - {dx}) "
               f"/ {ln} + {w} * (CAST(0 AS DOUBLE) - {dy}) / {ln})"),
        "ly": (f"(({py} + {dy}) + {half} * (CAST(0 AS DOUBLE) - {dy}) "
               f"/ {ln} - {w} * (CAST(0 AS DOUBLE) - {dx}) / {ln})"),
    }
