"""tools.utm zone helpers as portable SQL expression text.

Re-expresses the reference's UTM zone arithmetic
(/root/reference/python/rsgislib/tools/utm.py) as engine-portable
CASE/floor ladders shared verbatim between Catalyst and the DuckDB
oracles:

* ``latlon_to_zone_number`` (utm.py:400-428) — the Norway (32V) and
  Svalbard (31X/33X/35X/37X) exception ladder, first-match order
  preserved, default ``int((lon+180)/6) + 1``;
* ``latitude_to_zone_letter`` (utm.py:383-397) —
  ``ZONE_LETTERS[int(lat+80) >> 3]`` for lat in [-80, 84], the
  reference's 21-char table with I/O skipped and X doubled;
* ``epsg_for_utm`` (utm.py:63-85) — 32600/32700 + zone by hemisphere;
* ``zone_number_to_central_longitude`` (utm.py:473-481);
* ``check_valid_zone`` (utm.py:149-181);
* ``split_wgs84_bbox_utm_zones`` (utm.py:107-146) — corner zones,
  then one clipped bbox per spanned zone;
* ``latlon_to_mode_utm_zone_number`` (utm.py:469-...) — modal zone,
  smallest value on ties (numpy/scipy mode convention).

Everything here is exact double comparisons + integer arithmetic (one
IEEE division per point for the default zone), so results are
bit-identical across engines with no quantization needed.
"""

from __future__ import annotations

ZONE_LETTERS = "CDEFGHJKLMNPQRSTUVWXX"

__all__ = ["ZONE_LETTERS", "zone_number_expr", "zone_letter_idx_expr",
           "zone_exprs"]


def zone_number_expr(lon: str, lat: str) -> str:
    """latlon_to_zone_number as one CASE ladder (reference order)."""
    return f"""(CASE
  WHEN {lat} >= CAST(56 AS DOUBLE) AND {lat} < CAST(64 AS DOUBLE)
   AND {lon} >= CAST(3 AS DOUBLE) AND {lon} < CAST(12 AS DOUBLE)
  THEN 32
  WHEN {lat} >= CAST(72 AS DOUBLE) AND {lat} <= CAST(84 AS DOUBLE)
   AND {lon} >= CAST(0 AS DOUBLE) AND {lon} < CAST(9 AS DOUBLE)
  THEN 31
  WHEN {lat} >= CAST(72 AS DOUBLE) AND {lat} <= CAST(84 AS DOUBLE)
   AND {lon} >= CAST(0 AS DOUBLE) AND {lon} < CAST(21 AS DOUBLE)
  THEN 33
  WHEN {lat} >= CAST(72 AS DOUBLE) AND {lat} <= CAST(84 AS DOUBLE)
   AND {lon} >= CAST(0 AS DOUBLE) AND {lon} < CAST(33 AS DOUBLE)
  THEN 35
  WHEN {lat} >= CAST(72 AS DOUBLE) AND {lat} <= CAST(84 AS DOUBLE)
   AND {lon} >= CAST(0 AS DOUBLE) AND {lon} < CAST(42 AS DOUBLE)
  THEN 37
  ELSE CAST(floor(({lon} + CAST(180 AS DOUBLE)) / CAST(6 AS DOUBLE))
            AS BIGINT) + 1
END)""".replace("\n", " ")


def zone_letter_idx_expr(lat: str) -> str:
    """int(lat+80) >> 3 inside [-80, 84], else -1.

    ``floor(floor(lat+80)/8) == floor((lat+80)/8)`` for lat+80 >= 0,
    and /8 is an exact power-of-two division — no double rounding, and
    no ``//`` operator (Spark SQL has no integer-div token; ``div``
    vs DuckDB ``//`` would split the shared text).
    """
    return (f"(CASE WHEN {lat} >= CAST(-80 AS DOUBLE)"
            f" AND {lat} <= CAST(84 AS DOUBLE)"
            f" THEN CAST(floor(({lat} + CAST(80 AS DOUBLE))"
            f" / CAST(8 AS DOUBLE)) AS BIGINT)"
            f" ELSE -1 END)")


def zone_exprs(lon: str, lat: str) -> dict:
    """Full per-point column set (zone/letter/epsg/central/valid)."""
    zn = zone_number_expr(lon, lat)
    li = zone_letter_idx_expr(lat)
    return {
        "zone": f"CAST({zn} AS BIGINT)",
        "letter_idx": f"CAST({li} AS BIGINT)",
        "zone_letter": (f"(CASE WHEN {li} >= 0 THEN"
                        f" substring('{ZONE_LETTERS}',"
                        f" CAST({li} AS INT) + 1, 1)"
                        f" ELSE '-' END)"),
        "epsg": (f"CAST(32000 + (CASE WHEN {lat} >= CAST(0 AS DOUBLE)"
                 f" THEN 600 ELSE 700 END) + {zn} AS BIGINT)"),
        "central_lon": f"CAST(({zn} - 1) * 6 - 180 + 3 AS BIGINT)",
        "valid_zone": (f"CAST(CASE WHEN {zn} >= 1 AND {zn} <= 60"
                       f" AND {li} >= 0 THEN 1 ELSE 0 END AS BIGINT)"),
    }
