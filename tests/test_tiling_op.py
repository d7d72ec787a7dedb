"""Distributed tiling operator vs the pure-python tile-grid oracle."""

import numpy as np
import pytest

from rsgislib_spark import synth
from rsgislib_spark.geo.tilegrid import tile_specs
from rsgislib_spark.operators.tiling import tile_pixels, tile_spec_df


@pytest.fixture(scope="module")
def images(spark, sf_dir):
    return synth.synth_images(spark, sf_dir, with_bytes=False)


def test_tile_spec_df_matches_kernel(images):
    out = tile_spec_df(images, 48, 32, overlap=0).select(
        "image_id", "w", "h", "tile_idx", "txmin", "txmax", "tymin", "tymax",
        "tile_name", "tile_name_mc",
    ).toPandas()
    for (iid, w, h), grp in out.groupby(["image_id", "w", "h"]):
        grp = grp.sort_values("tile_idx")
        exp = tile_specs(int(w), int(h), 48, 32)
        got = list(zip(grp.txmin, grp.txmax, grp.tymin, grp.tymax))
        assert [tuple(map(int, t)) for t in got] == exp, iid
        assert grp.tile_name.iloc[0] == f"{iid}_tile0"


def test_tile_spec_df_overlap_matches_kernel(images):
    sub = images.limit(40)
    out = tile_spec_df(sub, 30, 30, overlap=5).select(
        "image_id", "w", "h", "tile_idx", "txmin", "txmax", "tymin", "tymax"
    ).toPandas()
    for (iid, w, h), grp in out.groupby(["image_id", "w", "h"]):
        grp = grp.sort_values("tile_idx")
        exp = tile_specs(int(w), int(h), 30, 30, overlap=5)
        got = [tuple(map(int, t)) for t in
               zip(grp.txmin, grp.txmax, grp.tymin, grp.tymax)]
        assert got == exp, iid


def test_tile_pixels_checksums_and_content(spark, sf_dir):
    imgs = synth.synth_images(spark, sf_dir, with_bytes=True).limit(25)
    tiles = tile_pixels(imgs, 40, 40, overlap=0).toPandas()
    meta = imgs.select("image_id", "id", "w", "h", "fmt").toPandas() \
        .set_index("image_id")
    from rsgislib_spark.functions import codec

    for _, t in tiles.iterrows():
        m = meta.loc[t.image_id]
        full = synth.pixel_array(int(m["id"]), int(m.w), int(m.h), m.fmt)
        xmin, xmax, ymin, ymax = tile_specs(int(m.w), int(m.h), 40, 40)[t.tile_idx]
        exp = full[ymin:ymax, xmin:xmax]
        assert int(exp.astype(np.int64).sum()) == int(t.checksum)
        got = codec.decode_image(bytes(t["bytes"]), t.tile_w, t.tile_h, t.fmt)
        assert np.array_equal(got, exp)
    # every image fully tiled: per-image checksum sums equal whole-image sums
    per_img = tiles.groupby("image_id").checksum.sum()
    for iid, s in per_img.items():
        m = meta.loc[iid]
        full = synth.pixel_array(int(m["id"]), int(m.w), int(m.h), m.fmt)
        assert int(full.astype(np.int64).sum()) == int(s)


def test_tile_checksums_fused_equals_two_stage(spark, sf_dir):
    """The fused synth->decode->tile stage (both modes) is row-for-row
    identical to tile_pixels(attach_bytes(meta)) — fusion removes the
    inter-stage Arrow round-trip, never changes a value."""
    from pyspark.sql import functions as F

    from rsgislib_spark.operators.tiling import tile_checksums_fused

    meta = synth.synth_images(spark, sf_dir, with_footprint=False) \
        .select("id", "image_id", "w", "h", "fmt").limit(40)
    two = tile_pixels(synth.attach_bytes(meta), 48, 32, encode=False) \
        .select("image_id", "tile_idx", "tile_name", "tile_w", "tile_h",
                "fmt", "checksum")
    fused = tile_checksums_fused(meta, 48, 32)
    assert two.exceptAll(fused).count() == 0
    assert fused.exceptAll(two).count() == 0
    roll = tile_checksums_fused(meta, 48, 32, rollup="image")
    agg = two.groupBy("image_id").agg(
        F.count(F.lit(1)).alias("n_tiles"),
        F.sum("checksum").alias("pix_sum"))
    assert agg.exceptAll(roll).count() == 0
    assert roll.exceptAll(agg).count() == 0
