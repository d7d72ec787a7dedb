"""rsgislib_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Re-expresses the query/data-processing capabilities of RSGISLib (the Remote
Sensing & GIS Software Library, reference at /root/reference) as an idiomatic
Spark engine over a table of geotagged image+caption rows:

    (image_id string, bytes binary, w int, h int, fmt string,
     caption string, phash long)

Design (see SURVEY.md):
  * all compute is DataFrame ops + Arrow-vectorized pandas UDFs — no
    per-row Python UDFs anywhere;
  * spatial indexing via an integer grid cell index (H3-role, see
    ``geo.cellindex``) used as an equi-join key so Catalyst handles
    pushdown/pruning; exact geometry refinement is vectorized numpy;
  * tile grids replicate rsgislib ``create_tiles`` ordering byte-exactly
    (reference: src/cmds/RSGISCmdImageUtils.cpp:262-836);
  * aggregation designs are partial+final so they scale to 10^12 rows.
"""

__version__ = "0.1.0"

# Aggregate type names mirroring rsgislib SUMTYPE_* constants
# (reference: python/rsgislib/__init__.py:168-177).
SUMTYPE_MODE = "mode"
SUMTYPE_MEAN = "mean"
SUMTYPE_MEDIAN = "median"
SUMTYPE_MIN = "min"
SUMTYPE_MAX = "max"
SUMTYPE_STDDEV = "stddev"
SUMTYPE_COUNT = "count"
SUMTYPE_RANGE = "range"
SUMTYPE_SUM = "sum"
