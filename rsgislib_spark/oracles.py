"""DuckDB oracle SQL for every query in ``rsgislib_spark.queries``.

The driver runs these against the same parquet tables (views ``region
nation customer supplier part orders lineitem events documents
embeddings``) and compares row count / schema / order-insensitive value
hash with the Spark result.  The synthetic images/zones/query-points
layers are reconstructed *inside the SQL* from ``part``/``nation``/
``supplier`` using the identical arithmetic the engine uses
(``rsgislib_spark.synth``) — the oracle shares formulas, not code paths:
Spark evaluates them in Catalyst/JVM, DuckDB in its own vectorized engine.
Pixel-level oracles never decode bytes; they recompute the closed-form
pixel value v(id, x, y) over ``generate_series``.
"""

from __future__ import annotations

from . import synth
from .geo.cellindex import cell_sql_expr

__all__ = ["ORACLES"]

_IMG = synth.images_sql("duckdb")
_IMGF = synth.footprint_sql(_IMG)
_ZONES = synth.zones_sql("duckdb")
_QPTS = synth.qpoints_sql("duckdb")

_PREFIX = f"WITH img AS ({_IMG}), imgf AS ({_IMGF}), zones AS ({_ZONES}), qpts AS ({_QPTS})"

_CELL = cell_sql_expr("lon", "lat")

_PIP = ("i.lon >= z.zxmin AND i.lon < z.zxmax AND "
        "i.lat >= z.zymin AND i.lat < z.zymax")

ORACLES = {}

ORACLES["cell_encode"] = f"""
{_PREFIX}
SELECT {_CELL} AS cell, count(*) AS n_images,
       min(id) AS min_id, max(id) AS max_id
FROM img GROUP BY 1
"""

ORACLES["sjoin_inner_within"] = f"""
{_PREFIX}
SELECT i.image_id, z.zone_id, z.zname, i.lon, i.lat
FROM img i JOIN zones z ON {_PIP}
"""

ORACLES["zone_point_counts"] = f"""
{_PREFIX}
SELECT z.zone_id, z.zname, count(i.image_id) AS n_pts
FROM zones z LEFT JOIN img i ON {_PIP}
GROUP BY z.zone_id, z.zname
"""

_TW, _TH = 48, 32
ORACLES["tile_specs"] = f"""
{_PREFIX},
g AS (
  SELECT image_id, CAST(w AS BIGINT) AS w, CAST(h AS BIGINT) AS h,
         CAST(w // {_TW} AS BIGINT) AS numx, CAST(h // {_TH} AS BIGINT) AS numy,
         CAST(w % {_TW} AS BIGINT) AS remx, CAST(h % {_TH} AS BIGINT) AS remy
  FROM img),
gg AS (
  SELECT *, numx + CASE WHEN remx > 0 THEN 1 ELSE 0 END AS cols,
            numy + CASE WHEN remy > 0 THEN 1 ELSE 0 END AS rows_
  FROM g),
t AS (
  SELECT *, unnest(generate_series(0, cols * rows_ - 1)) AS tile_idx FROM gg)
SELECT image_id, tile_idx,
  tile_idx % cols AS tile_x,
  tile_idx // cols AS tile_y,
  (tile_idx % cols) * {_TW} AS txmin,
  least((tile_idx % cols) * {_TW}
        + CASE WHEN tile_idx % cols < numx THEN {_TW} ELSE remx END, w) AS txmax,
  (tile_idx // cols) * {_TH} AS tymin,
  least((tile_idx // cols) * {_TH}
        + CASE WHEN tile_idx // cols < numy THEN {_TH} ELSE remy END, h) AS tymax,
  concat(image_id, '_tile', tile_idx) AS tile_name,
  concat('x', tile_idx % cols + 1, 'y', tile_idx // cols + 1) AS tile_name_mc
FROM t
"""

ORACLES["knn_closest"] = f"""
{_PREFIX},
d AS (
  SELECT q.qid, q.qlon, q.qlat, i.image_id, i.lon, i.lat,
         sqrt((q.qlon - i.lon) * (q.qlon - i.lon)
              + (q.qlat - i.lat) * (q.qlat - i.lat)) AS dist,
         row_number() OVER (
           PARTITION BY q.qid
           ORDER BY sqrt((q.qlon - i.lon) * (q.qlon - i.lon)
                         + (q.qlat - i.lat) * (q.qlat - i.lat))) AS rn
  FROM qpts q CROSS JOIN img i)
SELECT qid, qlon, qlat, image_id AS match_image_id,
       lon AS x_match, lat AS y_match, dist AS dist_match
FROM d WHERE rn = 1
"""

ORACLES["npts_radius"] = f"""
{_PREFIX}
SELECT a.image_id, count(*) - 1 AS n_pts_r
FROM img a JOIN img b
  ON sqrt((a.lon - b.lon) * (a.lon - b.lon)
          + (a.lat - b.lat) * (a.lat - b.lat)) <= 0.2
GROUP BY a.image_id
"""

_PMAX = synth.pmax_sql("fmt")
_PXV = synth.pixel_value_sql("id", "x", "y", "fmt")

ORACLES["pixel_stats"] = f"""
{_PREFIX},
xs AS (SELECT image_id, id, h, fmt,
              unnest(generate_series(0, w - 1)) AS x
       FROM img WHERE id % 7 = 0),
px AS (SELECT image_id, {_PXV} AS v
       FROM (SELECT *, unnest(generate_series(0, h - 1)) AS y FROM xs))
SELECT image_id, count(*) AS n_pix, CAST(sum(v) AS BIGINT) AS sum_pix,
       CAST(min(v) AS BIGINT) AS min_pix, CAST(max(v) AS BIGINT) AS max_pix,
       CAST(sum(v) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_pix
FROM px GROUP BY image_id
"""

def _px_cte(mod: int = 7, cols: str = "") -> str:
    """Per-pixel CTE over the id%mod image subset (closed-form values)."""
    return f"""
xs AS (SELECT image_id, id, w, h, fmt{cols},
              unnest(generate_series(0, w - 1)) AS x
       FROM img WHERE id % {mod} = 0),
pxy AS (SELECT *, unnest(generate_series(0, h - 1)) AS y FROM xs)
""".strip()


ORACLES["band_math"] = f"""
{_PREFIX},
{_px_cte()},
px AS (SELECT image_id,
              CASE WHEN {_PXV} > 128 THEN 2 * {_PXV} + 1 ELSE 0 END AS o
       FROM pxy)
SELECT image_id, count(*) AS n_pix,
       CAST(sum(o) AS BIGINT) AS sum_pix,
       CAST(min(o) AS BIGINT) AS min_pix,
       CAST(max(o) AS BIGINT) AS max_pix
FROM px GROUP BY image_id
"""

ORACLES["mask_img"] = f"""
{_PREFIX},
{_px_cte()},
px AS (SELECT image_id, {_PXV} AS v FROM pxy)
SELECT image_id, count(*) AS n_pix,
       CAST(sum(CASE WHEN v IN (0, 1, 2, 3) THEN 1 ELSE 0 END) AS BIGINT)
         AS n_masked,
       CAST(sum(CASE WHEN v IN (0, 1, 2, 3) THEN 255 ELSE v END) AS BIGINT)
         AS sum_pix,
       CAST(min(CASE WHEN v IN (0, 1, 2, 3) THEN 255 ELSE v END) AS BIGINT)
         AS min_pix,
       CAST(max(CASE WHEN v IN (0, 1, 2, 3) THEN 255 ELSE v END) AS BIGINT)
         AS max_pix
FROM px GROUP BY image_id
"""


def _pxv_at(dx: int, dy: int) -> str:
    xs = f"(x + {dx})" if dx else "x"
    ys = f"(y + {dy})" if dy else "y"
    return synth.pixel_value_sql("id", xs, ys, "fmt")


_MEAN3_S = " + ".join(_pxv_at(dx, dy) for dy in (-1, 0, 1) for dx in (-1, 0, 1))
_SOBEL_S = (f"({_pxv_at(1, -1)} + 2 * {_pxv_at(1, 0)} + {_pxv_at(1, 1)}"
            f" - {_pxv_at(-1, -1)} - 2 * {_pxv_at(-1, 0)} - {_pxv_at(-1, 1)})")


def _conv_oracle(term: str, mod: int = 19) -> str:
    return f"""
{_PREFIX},
xs AS (SELECT image_id, id, w, h, fmt,
              unnest(generate_series(1, w - 2)) AS x
       FROM img WHERE id % {mod} = 0),
pxy AS (SELECT *, unnest(generate_series(1, h - 2)) AS y FROM xs),
c AS (SELECT image_id, {term} AS s FROM pxy)
SELECT image_id, count(*) AS n_interior,
       CAST(sum(s) AS BIGINT) AS sum_conv,
       CAST(min(s) AS BIGINT) AS min_conv,
       CAST(max(s) AS BIGINT) AS max_conv
FROM c GROUP BY image_id
"""


ORACLES["filter_mean3"] = _conv_oracle(f"({_MEAN3_S})")
ORACLES["filter_sobel"] = _conv_oracle(f"abs({_SOBEL_S})")

_PXV2 = synth.pixel_value_sql("id", "(w - 1 - x)", "y", "fmt")

ORACLES["ndvi_index"] = f"""
{_PREFIX},
{_px_cte()},
px AS (SELECT image_id,
              CAST(floor((({_PXV2} - {_PXV}) * 1000000.0)
                         / ({_PXV2} + {_PXV} + 1)) AS BIGINT) AS o
       FROM pxy)
SELECT image_id, count(*) AS n_pix,
       CAST(sum(o) AS BIGINT) AS sum_idx,
       CAST(min(o) AS BIGINT) AS min_idx,
       CAST(max(o) AS BIGINT) AS max_idx
FROM px GROUP BY image_id
"""

ORACLES["pxl_value_counts"] = f"""
{_PREFIX},
{_px_cte()},
px AS (SELECT image_id, {_PXV} AS v FROM pxy)
SELECT CAST(v AS BIGINT) AS val, count(*) AS n
FROM px WHERE v < 40 GROUP BY v
"""

ORACLES["img_histogram"] = f"""
{_PREFIX},
{_px_cte()},
px AS (SELECT image_id, {_PXV} AS v FROM pxy)
SELECT CAST(v // 64 AS BIGINT) AS bin, count(*) AS n
FROM px GROUP BY 1
"""

ORACLES["band_percentiles"] = f"""
{_PREFIX},
{_px_cte()},
px AS (SELECT image_id, {_PXV} AS v FROM pxy),
hist AS (SELECT v, count(*) AS n FROM px GROUP BY v),
c AS (SELECT v, sum(n) OVER (ORDER BY v) AS cum, sum(n) OVER () AS total
      FROM hist),
ps AS (SELECT unnest([0.25, 0.5, 0.75, 0.9]) AS p)
SELECT p, CAST(min(v) AS BIGINT) AS value
FROM c, ps WHERE cum >= ceil(p * total) GROUP BY p
"""

ORACLES["zonal_stats"] = f"""
{_PREFIX},
xs AS (SELECT image_id, id, h, fmt, xmin, ymax,
              unnest(generate_series(0, w - 1)) AS x
       FROM imgf WHERE id % 7 = 0),
px AS (SELECT image_id,
              xmin + (x + 0.5) * {synth.IMG_RES_DEG} AS cx,
              ymax - (y + 0.5) * {synth.IMG_RES_DEG} AS cy,
              {_PXV} AS v
       FROM (SELECT *, unnest(generate_series(0, h - 1)) AS y FROM xs)),
j AS (SELECT z.zone_id, p.v
      FROM px p JOIN zones z
        ON p.cx >= z.zxmin AND p.cx < z.zxmax
       AND p.cy >= z.zymin AND p.cy < z.zymax),
s AS (SELECT zone_id,
             CAST(count(*) AS DOUBLE) AS n_pix,
             CAST(CAST(sum(v) AS BIGINT) AS DOUBLE) AS sum_pix,
             CAST(min(v) AS DOUBLE) AS min_pix,
             CAST(max(v) AS DOUBLE) AS max_pix,
             CAST(CAST(sum(v) AS BIGINT) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS mean_pix,
             sqrt(CAST(CAST(sum(v * v) AS BIGINT) AS DOUBLE)
                    / CAST(count(*) AS DOUBLE)
                  - (CAST(CAST(sum(v) AS BIGINT) AS DOUBLE)
                       / CAST(count(*) AS DOUBLE))
                    * (CAST(CAST(sum(v) AS BIGINT) AS DOUBLE)
                       / CAST(count(*) AS DOUBLE))) AS stddev_pix,
             CAST(median(v) AS DOUBLE) AS median_pix
      FROM j GROUP BY zone_id)
SELECT z.zone_id, z.zname,
       coalesce(s.n_pix, -9999.0) AS n_pix,
       coalesce(s.sum_pix, -9999.0) AS sum_pix,
       coalesce(s.min_pix, -9999.0) AS min_pix,
       coalesce(s.max_pix, -9999.0) AS max_pix,
       coalesce(s.mean_pix, -9999.0) AS mean_pix,
       coalesce(s.stddev_pix, -9999.0) AS stddev_pix,
       coalesce(s.median_pix, -9999.0) AS median_pix
FROM zones z LEFT JOIN s ON z.zone_id = s.zone_id
"""

ORACLES["sjoin_left_intersects"] = f"""
{_PREFIX}
SELECT i.image_id, i.lon, i.lat, z.zone_id AS index_right, z.zname
FROM img i LEFT JOIN zones z ON {_PIP}
"""

ORACLES["sjoin_right_within"] = f"""
{_PREFIX}
SELECT z.zone_id, z.zname, i.image_id
FROM zones z LEFT JOIN img i ON {_PIP}
"""

_BBOX_X = ("i.xmax > z.zxmin AND z.zxmax > i.xmin AND "
           "i.ymax > z.zymin AND z.zymax > i.ymin")

ORACLES["sjoin_bbox_intersects"] = f"""
{_PREFIX}
SELECT i.image_id, z.zone_id, z.zname
FROM imgf i JOIN zones z ON {_BBOX_X}
"""

ORACLES["spatial_select"] = f"""
{_PREFIX}
SELECT i.image_id, i.lon, i.lat
FROM imgf i
WHERE EXISTS (SELECT 1 FROM zones z WHERE {_BBOX_X})
"""

ORACLES["zone_geom_cols"] = f"""
{_PREFIX}
SELECT zone_id,
       zxmax - zxmin AS g_width, zymax - zymin AS g_height,
       (zxmax - zxmin) * (zymax - zymin) AS g_area,
       (zxmin + zxmax) / 2.0 AS g_cx, (zymin + zymax) / 2.0 AS g_cy,
       zxmin - 0.25 AS b_xmin, zxmax + 0.25 AS b_xmax,
       zymin - 0.25 AS b_ymin, zymax + 0.25 AS b_ymax
FROM zones
"""

ORACLES["grid_gen"] = """
SELECT gid AS grid_id, gid % 36 AS gx, gid // 36 AS gy,
       -180.0 + (gid % 36) * 10.0 AS gxmin,
       least(-180.0 + (gid % 36 + 1) * 10.0, 180.0) AS gxmax,
       -60.0 + (gid // 36) * 10.0 AS gymin,
       least(-60.0 + (gid // 36 + 1) * 10.0, 60.0) AS gymax,
       (-180.0 + (gid % 36) * 10.0
        + least(-180.0 + (gid % 36 + 1) * 10.0, 180.0)) / 2.0 AS g_cx,
       (-60.0 + (gid // 36) * 10.0
        + least(-60.0 + (gid // 36 + 1) * 10.0, 60.0)) / 2.0 AS g_cy
FROM (SELECT unnest(generate_series(0, 431)) AS gid)
"""

ORACLES["reproj_utm"] = f"""
{_PREFIX}
SELECT qid, (qlon - 9.0) * 111320.0 + 500000.0 AS utm_x,
       (qlat - 0.0) * 111320.0 AS utm_y
FROM qpts
"""

ORACLES["caption_replace"] = f"""
{_PREFIX}
SELECT image_id, replace(caption, 'megacity', 'dense city') AS caption2
FROM img
"""

ORACLES["rank_layer"] = f"""
{_PREFIX}
SELECT image_id, h,
       row_number() OVER (ORDER BY h DESC, id) AS fid
FROM img
"""

ORACLES["merge_layers"] = f"""
{_PREFIX}
SELECT zone_id, zname, zxmin, CAST(NULL AS DOUBLE) AS zymax
FROM zones WHERE zone_id < 13
UNION ALL
SELECT zone_id, zname, CAST(NULL AS DOUBLE) AS zxmin, zymax
FROM zones WHERE zone_id >= 13
"""

_PXSRC = synth.pixel_value_sql("id", "sx", "sy", "fmt")

ORACLES["mosaic_window"] = f"""
{_PREFIX},
gx AS (SELECT unnest(generate_series(0, 59)) AS px),
gy AS (SELECT unnest(generate_series(0, 59)) AS py),
grid AS (SELECT px, py, 10.0 + (px + 0.5) * 0.001 AS cx,
                45.0 + (py + 0.5) * 0.001 AS cy
         FROM gx, gy),
j AS (SELECT g.px, g.py, i.id, i.fmt,
             least(CAST(floor((g.cx - i.xmin) / 0.001) AS BIGINT),
                   i.w - 1) AS sx,
             least(CAST(floor((i.ymax - g.cy) / 0.001) AS BIGINT),
                   i.h - 1) AS sy
      FROM grid g JOIN imgf i
        ON i.id % 5 = 0
       AND g.cx >= i.xmin AND g.cx < i.xmax
       AND g.cy > i.ymin AND g.cy <= i.ymax),
v AS (SELECT px, py, id, {_PXSRC} AS v FROM j)
SELECT px, py, count(*) AS n_imgs,
       max(id * 2048 + v) % 2048 AS v_last,
       min(v) AS v_min, max(v) AS v_max,
       max(v * 1099511627776 + id) % 1099511627776 AS idx_max
FROM v GROUP BY px, py
"""

ORACLES["attr_filter"] = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
FROM orders WHERE o_orderstatus = 'F' AND o_totalprice > 100000.0
"""

ORACLES["value_counts"] = """
SELECT c_mktsegment, count(*) AS n_feats FROM customer GROUP BY c_mktsegment
"""

ORACLES["dedup_exact"] = """
SELECT md5(text) AS text_md5, count(*) AS n_dup, min(doc_id) AS rep_doc_id
FROM documents GROUP BY md5(text)
"""

ORACLES["recode_region"] = """
SELECT r_name, count(*) AS n_customers
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""

ORACLES["topk_largest"] = f"""
{_PREFIX}
SELECT image_id, w, h, CAST(w AS BIGINT) * h AS area
FROM img ORDER BY area DESC, id LIMIT 20
"""

ORACLES["events_hourly"] = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*) AS n_events, count(DISTINCT user_id) AS n_users,
       min(value) AS min_value, max(value) AS max_value
FROM events GROUP BY 1, 2
"""
