"""vectorutils.check_validate_geometries — polygon-ring validation.

Reference (python/src/vectorutils.cpp:247 binding;
src/cmds/RSGISCmdVectorUtils.cpp:295 ``executeCheckValidateGeometries``;
kernel src/vec/RSGISCopyCheckPolygons.cpp:34 →
src/vec/RSGISVectorUtils.cpp:180 ``checkCloseOGRPolygon``): copy each
polygon feature to the output layer, treating a feature as an ERROR
(dropped, optionally printed) when its exterior ring has fewer than 4
stored points; surviving rings are rebuilt with every input point and
then the first point appended again.  (The reference guards the append
with ``if(pt != pt0)`` — a POINTER comparison between two distinct
heap objects, so it is always true and the closing point is appended
unconditionally; the faithful output ring therefore always has
``n_in + 1`` points.  Cited so the parity choice is auditable.)

Engine extension: an ``is_simple`` flag — the OGC ring-simplicity test
the reference leaves to downstream GDAL — computed with EXACT integer
orientation/cross-product arithmetic (coords are integers by
construction), so both engines agree bit-for-bit: a ring is simple iff
no two non-adjacent edges intersect (proper crossing, collinear
overlap, or vertex touch).

The checked layer is a deterministic synthetic ring table keyed by
``customer.c_custkey`` (TESTDATA convention: derive vector layers from
the relational tables): feature k has ``m = 3 + k % 4`` distinct
vertices at ``x_i = (k*31 + i*i*7) % 1000``, ``y_i = (k*17 + i*13) %
1000``; every 5th feature arrives pre-closed (the first point stored
again at the end).  Only ``m = 3`` un-pre-closed features fail the
< 4 points check, mirroring the reference's error path.

Scale shape: pure Catalyst SQL — vertex explode (<= 7 rows/feature),
ring-edge self-join on consecutive index, non-adjacent pair join
(<= 15 pairs/feature), one groupBy(fid).  Linear in features, no
global shuffle beyond the final aggregation; whole-stage codegen
integer ops throughout.
"""

__all__ = ["ring_check_sql"]

#: exact integer orientation of point (px,py) w.r.t. segment a->b
_ORIENT = ("(({bx} - {ax}) * ({py} - {ay}) - "
           "({by} - {ay}) * ({px} - {ax}))")


def _on_seg(ax, ay, bx, by, px, py):
    """Collinear point-on-segment bbox test (exact ints)."""
    return (f"({px} >= least({ax}, {bx}) AND {px} <= greatest({ax}, {bx})"
            f" AND {py} >= least({ay}, {by})"
            f" AND {py} <= greatest({ay}, {by}))")


def _seg_intersect() -> str:
    """Segments p (p1->p2) and q (q1->q2) intersect — proper crossing
    or any collinear/endpoint touch (classic exact orientation test)."""
    o1 = _ORIENT.format(ax="p1x", ay="p1y", bx="p2x", by="p2y",
                        px="q1x", py="q1y")
    o2 = _ORIENT.format(ax="p1x", ay="p1y", bx="p2x", by="p2y",
                        px="q2x", py="q2y")
    o3 = _ORIENT.format(ax="q1x", ay="q1y", bx="q2x", by="q2y",
                        px="p1x", py="p1y")
    o4 = _ORIENT.format(ax="q1x", ay="q1y", bx="q2x", by="q2y",
                        px="p2x", py="p2y")
    touch = " OR ".join([
        f"({o1} = 0 AND {_on_seg('p1x','p1y','p2x','p2y','q1x','q1y')})",
        f"({o2} = 0 AND {_on_seg('p1x','p1y','p2x','p2y','q2x','q2y')})",
        f"({o3} = 0 AND {_on_seg('q1x','q1y','q2x','q2y','p1x','p1y')})",
        f"({o4} = 0 AND {_on_seg('q1x','q1y','q2x','q2y','p2x','p2y')})",
    ])
    return (f"(({o1}) * ({o2}) < 0 AND ({o3}) * ({o4}) < 0) OR {touch}")


def ring_check_sql(dialect: str = "spark",
                   customer: str = "customer") -> str:
    """Full portable SELECT: one row per feature with
    (fid, n_pts_in, valid, n_pts_out, is_simple)."""
    if dialect == "spark":
        vtx = ("SELECT fid, m, pre_closed, i FROM meta "
               "LATERAL VIEW explode(sequence(0, m - 1)) t AS i")
    else:
        vtx = ("SELECT fid, m, pre_closed, "
               "unnest(generate_series(0, m - 1)) AS i FROM meta")
    return f"""
WITH f AS (SELECT CAST(c_custkey AS BIGINT) AS fid FROM {customer}),
meta AS (SELECT fid, 3 + fid % 4 AS m,
                CASE WHEN fid % 5 = 0 THEN 1 ELSE 0 END AS pre_closed
         FROM f),
vi AS ({vtx}),
v AS (SELECT fid, m, pre_closed, i,
             (fid * 31 + i * i * 7) % 1000 AS x,
             (fid * 17 + i * 13) % 1000 AS y
      FROM vi),
e AS (SELECT a.fid, a.m, a.i,
             a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2
      FROM v a JOIN v b
        ON b.fid = a.fid AND b.i = (a.i + 1) % a.m),
pr AS (SELECT p.fid,
              p.x1 AS p1x, p.y1 AS p1y, p.x2 AS p2x, p.y2 AS p2y,
              q.x1 AS q1x, q.y1 AS q1y, q.x2 AS q2x, q.y2 AS q2y
       FROM e p JOIN e q
         ON q.fid = p.fid AND q.i > p.i
        AND q.i <> p.i + 1 AND NOT (p.i = 0 AND q.i = p.m - 1)),
x AS (SELECT fid,
             max(CASE WHEN {_seg_intersect()} THEN 1 ELSE 0 END)
               AS any_x
      FROM pr GROUP BY fid)
SELECT m.fid,
       CAST(m.m + m.pre_closed AS BIGINT) AS n_pts_in,
       CAST(CASE WHEN m.m + m.pre_closed >= 4 THEN 1 ELSE 0 END
            AS BIGINT) AS valid,
       CAST(CASE WHEN m.m + m.pre_closed >= 4
                 THEN m.m + m.pre_closed + 1 END AS BIGINT) AS n_pts_out,
       CAST(CASE WHEN m.m + m.pre_closed >= 4
                 THEN 1 - coalesce(x.any_x, 0) END AS BIGINT)
         AS is_simple
FROM meta m LEFT JOIN x ON x.fid = m.fid
""".strip()
