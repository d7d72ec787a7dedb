"""Web-mercator tile grid math (slippy XYZ / TMS / quadkey).

Reference (tools/maputils + tools/utils web-tile helpers):
``get_web_mercator_xy`` / ``get_xy_mercator_lonlat``,
``get_tile_for_point``, ``get_tiles``, ``get_tile_bbox`` /
``xy_mercator_bounds``, ``get_tile_tl_lonlat``,
``convert_between_tms_xyz`` / ``flip_xyz_tms_tiles``,
``get_quadkey_for_tile_path`` / ``get_tile_path_from_quadkey``
(/root/reference/python/rsgislib/tools/utils.py /
``tools/__init__`` re-exports).

Determinism: the spherical mercator forward
``my = R * atanh(sin(lat))`` is built ENTIRELY from the pinned
cross-engine primitives — polynomial sin (transverse_mercator._SIN_C),
the detmath ln tree for ``atanh(s) = 0.5*ln((1+s)/(1-s))`` — so both
engines evaluate the identical IEEE tree and every downstream floor /
tile index / quadkey digit is bit-exact.  Tile X, TMS flip, quadkey
interleave and the tile bbox in mercator metres are exact integer /
dyadic arithmetic.  Latitudes must be inside the web-mercator validity
window (callers remap into [-85, 85), the reference's
``truncate_lng_lat`` clamp at +-85.051).
"""
from __future__ import annotations

import math

from ..functions.detmath import ln_steps
from .transverse_mercator import StepBuilder, _SIN_C, _horner, dlit

R_MERC = 6378137.0                      # spherical web-mercator radius
_PI_R = math.pi * R_MERC                # half-world extent in metres


def webmerc_tile_steps(lon: str, lat: str, zoom: int):
    """Chained column steps computing, per point:

    mx, my (EPSG:3857 metres), tx, ty (XYZ tile at ``zoom``),
    tms_y, qk_num (base-4 quadkey as an integer), lon_tl (tile
    top-left longitude), bxmin/bxmax/bymin/bymax (tile bbox, mercator
    metres).  Returns ``(steps, finals)`` for
    ``operators.vector._apply_expr_steps`` (Spark) or
    :func:`webmerc_tile_sql` (DuckDB inline).
    """
    n = 1 << zoom
    b = StepBuilder("wm")
    lat_r = b.add(f"(({lat}) * {dlit(math.pi / 180.0)})")
    x2 = f"({lat_r} * {lat_r})"
    s = b.add(f"({lat_r} * {_horner(x2, _SIN_C)})")
    arg = b.add(f"((CAST(1 AS DOUBLE) + {s}) / (CAST(1 AS DOUBLE) - {s}))")
    # |lat| < 85.1 deg -> s in (-0.9963, 0.9963) -> arg in (2^-10, 2^10)
    for name, expr in ln_steps(arg, "wmln", lo=-10, hi=10):
        b.steps.append((name, expr))
    my = b.add(f"({dlit(R_MERC * 0.5)} * wmln)")
    mx = b.add(f"(({lon}) * {dlit(_PI_R / 180.0)})")
    tx = b.add(
        f"(greatest(CAST(0 AS BIGINT), least(CAST({n - 1} AS BIGINT), "
        f"CAST(floor((({lon}) + CAST(180 AS DOUBLE)) "
        f"/ CAST(360 AS DOUBLE) * CAST({n} AS DOUBLE)) AS BIGINT))))")
    u = b.add(f"({my} * {dlit(1.0 / _PI_R)})")
    ty = b.add(
        f"(greatest(CAST(0 AS BIGINT), least(CAST({n - 1} AS BIGINT), "
        f"CAST(floor((CAST(1 AS DOUBLE) - {u}) * CAST(0.5 AS DOUBLE) "
        f"* CAST({n} AS DOUBLE)) AS BIGINT))))")
    # Morton interleave: quadkey digit j (from LSB) = x_j + 2*y_j.
    # Bit j is extracted with % comparisons only — portable SQL (Spark
    # has no // operator, DuckDB no infix div).
    def bit(col: str, j: int) -> str:
        return (f"(CASE WHEN ({col} % {1 << (j + 1)}) >= {1 << j} "
                f"THEN 1 ELSE 0 END)")

    qk = " + ".join(
        f"({bit(tx, j)} + 2 * {bit(ty, j)}) * CAST({4 ** j} AS BIGINT)"
        for j in range(zoom))
    step = 2.0 * _PI_R / n              # exact: pi*R * 2^(1-zoom)
    finals = {
        "mx": mx, "my": my, "tx": tx, "ty": ty,
        "tms_y": f"(CAST({n - 1} AS BIGINT) - {ty})",
        "qk_num": f"({qk})",
        "lon_tl": (f"(CAST({tx} AS DOUBLE) / CAST({n} AS DOUBLE) "
                   f"* CAST(360 AS DOUBLE) - CAST(180 AS DOUBLE))"),
        "bxmin": (f"(CAST({tx} AS DOUBLE) * {dlit(step)} "
                  f"- {dlit(_PI_R)})"),
        "bxmax": (f"((CAST({tx} AS DOUBLE) + CAST(1 AS DOUBLE)) "
                  f"* {dlit(step)} - {dlit(_PI_R)})"),
        "bymax": (f"({dlit(_PI_R)} - CAST({ty} AS DOUBLE) "
                  f"* {dlit(step)})"),
        "bymin": (f"({dlit(_PI_R)} - (CAST({ty} AS DOUBLE) "
                  f"+ CAST(1 AS DOUBLE)) * {dlit(step)})"),
    }
    return b.steps, finals


def webmerc_tile_sql(inner: str, lon: str, lat: str, zoom: int):
    """DuckDB twin: wrap SELECT ``inner`` with the step projections.

    Returns ``(sql, finals)`` — callers project ``finals[k]`` (plus any
    passthrough keys) from the returned ``sql``.
    """
    steps, finals = webmerc_tile_steps(lon, lat, zoom)
    sql = inner
    for name, expr in steps:
        sql = f"SELECT *, {expr} AS {name} FROM ({sql})"
    return sql, finals
