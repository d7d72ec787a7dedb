"""Catalyst tile-grid arithmetic vs the pure-python reference oracle
(geo.tilegrid replicates RSGISCmdImageUtils.cpp / stdimgblockiter.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZES = [(128, 97), (48, 32), (95, 33), (96, 64), (33, 35), (129, 129)]


def _df(spark):
    rows = [("i%d" % k, w, h) for k, (w, h) in enumerate(SIZES)]
    return spark.createDataFrame(rows, "image_id string, w int, h int"), rows


def test_offset_grid_matches_reference_oracle(spark):
    from rsgislib_spark.geo.tilegrid import tile_specs
    from rsgislib_spark.operators.tiling import tile_spec_offset_df

    df, rows = _df(spark)
    got = {}
    for r in tile_spec_offset_df(df, 48, 32).collect():
        got.setdefault(r.image_id, []).append(
            (r.tile_idx, (r.txmin, r.txmax, r.tymin, r.tymax)))
    for name, w, h in rows:
        ref = tile_specs(w, h, 48, 32, offset=True)
        assert [t[1] for t in sorted(got[name])] == ref, (name, w, h)


def test_overlap_grid_matches_reference_oracle(spark):
    from rsgislib_spark.geo.tilegrid import tile_specs
    from rsgislib_spark.operators.tiling import tile_spec_df

    df, rows = _df(spark)
    got = {}
    for r in tile_spec_df(df, 48, 32, overlap=8).collect():
        got.setdefault(r.image_id, []).append(
            (r.tile_idx, (r.txmin, r.txmax, r.tymin, r.tymax)))
    for name, w, h in rows:
        ref = tile_specs(w, h, 48, 32, overlap=8)
        assert [t[1] for t in sorted(got[name])] == ref, (name, w, h)


def test_block_iter_full_size_blocks(spark):
    """Every block is full-size whenever the image can hold one."""
    from rsgislib_spark.operators.tiling import block_iter_specs

    df, rows = _df(spark)
    for r in block_iter_specs(df, 48, 48).collect():
        w = dict((n, (ww, hh)) for n, ww, hh in rows)[r.image_id]
        if w[0] >= 48:
            assert r.bxmax - r.bxmin == 48
        if w[1] >= 48:
            assert r.bymax - r.bymin == 48
        assert 0 <= r.bxmin and r.bxmax <= w[0]
        assert 0 <= r.bymin and r.bymax <= w[1]
