"""Transcription checks: extent-on-grid snaps vs the reference Python
math (tools/geometrytools.py:331/385), CQV vs numpy percentiles, and
overlay-identity coverage invariants.
"""
import math
import os
import sys

import duckdb
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rsgislib_spark.geo.bbox import (extent_on_grid_sql,
                                     extent_whole_num_grid_sql)

BOXES = [(-3.7, 12.2, -9.13, 4.06), (0.0, 1.0, 0.0, 1.0),
         (-40.0, -12.5, 2.25, 15.75), (5.125, 5.875, -0.0625, 0.03125)]
GRID = 0.25


def _ref_extent_on_grid(b, grid, full_contain):
    """Transliteration of find_extent_on_grid (geometrytools.py:350)."""
    xmin, xmax, ymin, ymax = b
    xf, yc = int(math.floor(xmin)), int(math.ceil(ymax))
    xo = xf + math.floor((xmin - xf) / grid) * grid
    yo = yc - math.floor((yc - ymax) / grid) * grid
    rnd = math.ceil if full_contain else math.floor
    return (xo, xo + rnd((xmax - xo) / grid) * grid,
            yo - rnd(abs(yo - ymin) / grid) * grid, yo)


def _ref_whole_num(b, grid, full_contain):
    xmin, xmax, ymin, ymax = b
    xo = math.floor(xmin / grid) * grid
    yo = math.floor(ymin / grid) * grid
    rnd = math.ceil if full_contain else math.floor
    return (xo, xo + rnd((xmax - xo) / grid) * grid,
            yo, yo + rnd(abs(ymax - yo) / grid) * grid)


@pytest.mark.parametrize("full", [True, False])
def test_extent_on_grid_matches_reference(full):
    con = duckdb.connect()
    for b in BOXES:
        e = extent_on_grid_sql(*(repr(v) for v in b), GRID, full)
        got = con.sql("SELECT " + ", ".join(
            e[k] for k in ("gxmin", "gxmax", "gymin", "gymax"))).fetchone()
        ref = _ref_extent_on_grid(b, GRID, full)
        assert got == pytest.approx(ref, abs=0), (b, full)
        # snapped box contains (grows) / is contained by (shrinks) input
        if full:
            assert got[0] <= b[0] and got[1] >= b[1]
            assert got[2] <= b[2] and got[3] >= b[3]
        # bounds are on the floor/ceil-anchored lattice
        assert abs((got[1] - got[0]) / GRID
                   - round((got[1] - got[0]) / GRID)) < 1e-9


def test_whole_num_grid_matches_reference():
    con = duckdb.connect()
    for b in BOXES:
        e = extent_whole_num_grid_sql(*(repr(v) for v in b), GRID, True)
        got = con.sql("SELECT " + ", ".join(
            e[k] for k in ("wxmin", "wxmax", "wymin", "wymax"))).fetchone()
        assert got == pytest.approx(_ref_whole_num(b, GRID, True), abs=0)
        assert got[0] % GRID == 0 and got[2] % GRID == 0


def test_cqv_matches_numpy():
    rng = [float(x) for x in range(1, 101)]
    q1, q3 = np.percentile(rng, 25), np.percentile(rng, 75)
    cqv = (q3 - q1) / (q3 + q1)
    con = duckdb.connect()
    got = con.sql(
        "SELECT quantile_cont(v, 0.25), quantile_cont(v, 0.75) "
        "FROM (SELECT unnest(range(1, 101)) :: DOUBLE AS v)").fetchone()
    assert got == (q1, q3)
    assert 0.25 <= cqv <= 0.75  # this predictor would be kept


def test_overlay_identity_coverage_is_layer_a(spark_session=None):
    """identity = union minus the B-only pieces; every part lies inside
    its source A rect and parts of one A rect do not overlap."""
    from pyspark.sql import Row, SparkSession
    from rsgislib_spark.operators.overlay import rect_identity, rect_union

    spark = (SparkSession.builder.master("local[2]")
             .config("spark.sql.shuffle.partitions", "2")
             .config("spark.ui.enabled", "false").getOrCreate())
    a = spark.createDataFrame([
        Row(a_id=1, axmin=0.0, axmax=10.0, aymin=0.0, aymax=10.0),
        Row(a_id=2, axmin=20.0, axmax=25.0, aymin=0.0, aymax=5.0)])
    b = spark.createDataFrame([
        Row(b_id=7, bxmin=5.0, bxmax=15.0, bymin=-5.0, bymax=5.0)])
    ident = rect_identity(a, b).collect()
    uni = rect_union(a, b).collect()
    assert {r.kind for r in ident} <= {"int", "a"}
    assert [r for r in uni if r.kind == "b"]  # union does have B pieces
    assert len(ident) == len([r for r in uni if r.kind != "b"])
    # total identity area == total A area (coverage preserved, no overlap)
    area = sum((r.rxmax - r.rxmin) * (r.rymax - r.rymin) for r in ident)
    a_area = 10.0 * 10.0 + 5.0 * 5.0
    assert abs(area - a_area) < 1e-9
    # untouched A rect 2 survives whole
    solo = [r for r in ident if r.a_id == 2]
    assert len(solo) == 1 and solo[0].kind == "a"
