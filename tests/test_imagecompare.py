"""are_imgs_equal semantics: self-compare is exact, pair proportions are
well-formed, and the kernel counts match a numpy recomputation."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from rsgislib_spark import synth
from rsgislib_spark.operators.imagestats import imgs_equal_stats


def _pairs(spark, sf_dir, shift):
    m = synth.synth_images(spark, sf_dir, with_footprint=False) \
        .where("id % 13 = 0").select("id", "image_id", "w", "h", "fmt")
    cm = synth.synth_images(spark, sf_dir, with_footprint=False) \
        .select(F.col("id").alias("cmp_id"),
                F.col("image_id").alias("cmp_image_id"),
                F.col("fmt").alias("cmp_fmt"))
    pm = m.join(cm, m.id + shift == cm.cmp_id).repartition(4)
    ref = synth.attach_bytes(pm) \
        .withColumnRenamed("bytes", "ref_bytes") \
        .withColumnRenamed("id", "ref_id") \
        .withColumnRenamed("fmt", "ref_fmt") \
        .withColumnRenamed("cmp_id", "id") \
        .withColumnRenamed("cmp_fmt", "fmt")
    return synth.attach_bytes(ref) \
        .withColumnRenamed("bytes", "cmp_bytes") \
        .withColumnRenamed("fmt", "cmp_fmt") \
        .withColumnRenamed("ref_bytes", "bytes") \
        .withColumnRenamed("ref_fmt", "fmt")


def test_self_compare_is_exact(spark, sf_dir):
    out = imgs_equal_stats(_pairs(spark, sf_dir, 0),
                           flt_dif=0.0001).toPandas()
    assert len(out) > 0
    assert (out["n_eq"] == out["n_px"]).all()      # identical images


def test_pair_compare_matches_numpy(spark, sf_dir):
    out = imgs_equal_stats(_pairs(spark, sf_dir, 97),
                           flt_dif=100.0).toPandas()
    assert len(out) > 0
    assert ((out["n_eq"] >= 0) & (out["n_eq"] <= out["n_px"])).all()
    meta = synth.synth_images(spark, sf_dir, with_footprint=False) \
        .select("id", "image_id", "w", "h", "fmt").toPandas() \
        .set_index("image_id")
    for _, r in out.head(20).iterrows():
        a_m = meta.loc[r["image_id"]]
        b_m = meta.loc[r["cmp_image_id"]]
        assert (a_m["w"], a_m["h"]) == (b_m["w"], b_m["h"])  # 97-stride grid
        a = synth.pixel_array(int(a_m["id"]), int(a_m["w"]), int(a_m["h"]),
                              str(a_m["fmt"])).astype(np.int64)
        b = synth.pixel_array(int(b_m["id"]), int(b_m["w"]), int(b_m["h"]),
                              str(b_m["fmt"])).astype(np.int64)
        assert r["n_eq"] == int((np.abs(a - b) < 100.0).sum())


def _offset_argmin_numpy(img_id, w, h, fmt, search=3):
    """Independent transcription of the MSD argmin search (same
    plant/perturbation world as find_image_offset_stats)."""
    ref = synth.pixel_array(img_id, w, h, fmt).astype(np.int64)
    sx, sy = img_id % 5 - 2, img_id % 7 - 3
    xs = np.arange(w, dtype=np.int64)[None, :]
    ys = np.arange(h, dtype=np.int64)[:, None]
    fx, fy = xs - sx, ys - sy
    fvalid = (fx >= 0) & (fx < w) & (fy >= 0) & (fy < h)
    flt = np.zeros((h, w), dtype=np.int64)
    flt[fvalid] = ref[np.broadcast_to(fy, (h, w))[fvalid],
                      np.broadcast_to(fx, (h, w))[fvalid]]
    flt = flt + (xs * ys) % 3
    best = None
    for dy in range(-search, search + 1):
        for dx in range(-search, search + 1):
            rx, ry = xs - dx, ys - dy
            val = fvalid & (rx >= 0) & (rx < w) & (ry >= 0) & (ry < h)
            n = int(val.sum())
            if n == 0:
                continue
            d = ref[np.broadcast_to(ry, (h, w))[val],
                    np.broadcast_to(rx, (h, w))[val]] - flt[val]
            key = (int((d * d).sum()) / n, dy, dx)
            if best is None or key < best[0]:
                best = (key, dx, dy)
    return best[1], best[2]


def test_find_image_offset(spark, sf_dir):
    """Registration returns the exact MSD argmin (parity with an
    independent numpy transcription) and recovers the planted shift on
    the overwhelming majority of images.  The modular-linear synth
    plane is near-self-similar under shifts with 7*dx+13*dy = +-1, so
    a rare image can have a true argmin below the planted shift — the
    operator must find THAT, not the plant (observed: img_627)."""
    from rsgislib_spark import synth as _synth
    from rsgislib_spark.operators.imagemath import find_image_offset_stats

    meta = synth.synth_images(spark, sf_dir,
                              with_footprint=False).where("id % 19 = 0")
    img = synth.attach_bytes(meta.repartition(4))
    out = find_image_offset_stats(img, search=3).toPandas()
    assert len(out) > 0
    recovered = ((out["found_dx"] == out["planted_dx"])
                 & (out["found_dy"] == out["planted_dy"]))
    assert recovered.mean() >= 0.9
    # exact argmin parity with the independent transcription,
    # including every non-recovered image
    meta_pd = synth.synth_images(spark, sf_dir, with_footprint=False) \
        .select("id", "image_id", "w", "h", "fmt").toPandas() \
        .set_index("image_id")
    check = pd.concat([out[~recovered],
                       out[recovered].head(10)])
    for _, r in check.iterrows():
        m = meta_pd.loc[r["image_id"]]
        bdx, bdy = _offset_argmin_numpy(int(m["id"]), int(m["w"]),
                                        int(m["h"]), str(m["fmt"]))
        assert (r["found_dx"], r["found_dy"]) == (bdx, bdy)
    # the perturbation makes the minimum nonzero: mean of ((x*y)%3)^2
    assert (out["sum_sq"] > 0).all()
    assert (out["msd"] < 3.0).all()
    # planted shifts cover multiple distinct values (non-vacuous)
    assert out["planted_dx"].nunique() > 1
    assert out["planted_dy"].nunique() > 1


def test_mask_val_prob(spark, sf_dir):
    """Value-probability plane: means bounded by 1, rescaled >= raw,
    mask non-vacuous (neither empty nor all pixels)."""
    import numpy as np
    from rsgislib_spark import synth
    from rsgislib_spark.operators.imagemath import mask_val_prob_stats

    meta = synth.synth_images(spark, sf_dir,
                              with_footprint=False).where("id % 19 = 0")
    img = synth.attach_bytes(meta.repartition(4))
    out = mask_val_prob_stats(img, mask_thres=512).toPandas()
    assert len(out) > 0
    ok = out["n_mask"] > 0
    assert ok.any()
    assert (out.loc[ok, "mean_prob"] <= 1.0).all()
    assert (out.loc[ok, "mean_resc"] <= 1.0).all()
    assert (out.loc[ok, "mean_resc"] >= out.loc[ok, "mean_prob"]).all()
    assert (out.loc[ok, "n_distinct"] > 1).any()
    assert np.allclose(out.loc[ok, "mean_prob"],
                       out.loc[ok, "sum_cnt_sq"]
                       / (out.loc[ok, "n_mask"] ** 2))


def test_pan_sharpen_hcs(spark, sf_dir):
    """HCS pan-sharpen: telescoped transform equals the reference's
    atan/trig chain to float precision; clamp branch non-vacuous."""
    import numpy as np
    from rsgislib_spark import synth
    from rsgislib_spark.functions import codec
    from rsgislib_spark.operators.imagemath import pan_sharpen_hcs_stats

    meta = synth.synth_images(spark, sf_dir,
                              with_footprint=False).where("id % 19 = 0")
    img = synth.attach_bytes(meta.repartition(4))
    out = pan_sharpen_hcs_stats(img).toPandas()
    assert len(out) > 0
    ok = out["n_valid"] > 0
    assert (out.loc[ok, "sd_pan"] > 0).all()
    # intensity preservation: out0^2 + out1^2 == iAdj^2 == pSq (>=0)
    # via the trig chain — check the telescoped form agrees with the
    # explicit atan/cos/sin evaluation on one image
    r = img.select("image_id", "bytes", "w", "h", "fmt").limit(1).collect()[0]
    a = codec.decode_image(bytes(r["bytes"]), r["w"], r["h"],
                           r["fmt"]).astype(np.int64)
    v1, v2 = (a // 32).ravel(), (a[:, ::-1] // 32).ravel()
    sel = v1 > 0
    b0, b1 = float(v1[sel][0]), float(v2[sel][0])
    # reference phi_0 = atan(sqrt(sum_{j>=0} b_j^2)/b_0), the sum
    # including b_0 once (RSGISPanSharpen.cpp:57 loop from j=i)
    phi = np.arctan(np.sqrt(b0 * b0 + b1 * b1) / b0)
    got = out[out["image_id"] == r["image_id"]].iloc[0]
    if got["out0"] != 0:
        ratio_t = np.cos(phi) / np.sin(phi)
        ratio_e = got["out0"] / got["out1"]
        assert abs(ratio_t - ratio_e) < 1e-9
