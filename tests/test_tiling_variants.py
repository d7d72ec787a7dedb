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


def test_halo_tiled_convolution_equals_whole_image(spark, sf_dir):
    """Window ops over overlap-tiles == whole-image windows (§2.6 halo).

    3x3 mean-sum over each tile's interior, tiles cut with overlap=1:
    summing valid contributions per tile must reproduce the whole-image
    interior convolution sum exactly (no seam loss, no double count).
    """
    import numpy as np

    from rsgislib_spark import synth
    from rsgislib_spark.functions import codec
    from rsgislib_spark.geo.tilegrid import tile_specs
    from rsgislib_spark.operators.tiling import tile_pixels

    img = synth.synth_images(spark, sf_dir, with_bytes=True,
                             with_footprint=False).where("id % 97 = 0")
    meta = {r.image_id: (r.id, r.w, r.h, r.fmt)
            for r in img.select("image_id", "id", "w", "h", "fmt").collect()}
    tiles = tile_pixels(img, 48, 32, overlap=1, encode=True).collect()

    def conv_sum(plane):
        a = plane.astype(np.int64)
        h, w = a.shape
        acc = np.zeros((h - 2, w - 2), dtype=np.int64)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                acc += a[1 + dy:h - 1 + dy, 1 + dx:w - 1 + dx]
        return acc

    got = {}
    for t in tiles:
        iid, w, h, fmt = meta[t.image_id]
        # recover this tile's un-expanded window from the grid oracle
        spec = tile_specs(w, h, 48, 32, overlap=0)[t.tile_idx]
        halo = tile_specs(w, h, 48, 32, overlap=1)[t.tile_idx]
        arr = codec.decode_image(bytes(t.bytes), t.tile_w, t.tile_h, t.fmt)
        c = conv_sum(arr)
        # tile-local coords of the un-expanded window's interior pixels
        x0 = spec[0] - halo[0]
        y0 = spec[2] - halo[2]
        # interior pixels of the IMAGE covered by this tile's core
        gx0, gx1 = max(spec[0], 1), min(spec[1], w - 1)
        gy0, gy1 = max(spec[2], 1), min(spec[3], h - 1)
        if gx1 <= gx0 or gy1 <= gy0:
            continue
        # conv output indexing: conv[y-1, x-1] corresponds to pixel (x, y)
        sub = c[gy0 - halo[2] - 1:gy1 - halo[2] - 1,
                gx0 - halo[0] - 1:gx1 - halo[0] - 1]
        got[t.image_id] = got.get(t.image_id, 0) + int(sub.sum())

    for image_id, (iid, w, h, fmt) in meta.items():
        plane = synth.pixel_array(int(iid), int(w), int(h), str(fmt))
        assert got[image_id] == int(conv_sum(plane).sum()), image_id


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
