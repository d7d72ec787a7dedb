"""RAT enrichment invariants (find_neighbours / mode / percentiles /
collapse_rat) — structural checks independent of the DuckDB parity gate."""

import numpy as np
import pandas as pd
import pytest

from rsgislib_spark import synth
from rsgislib_spark.operators.rastergis import (_clump_mode,
                                                _clump_neighbours,
                                                _clump_percentiles,
                                                collapse_rat, rat_table)
from rsgislib_spark.operators.rasterize import label_components


def _clump_images(spark, sf_dir):
    meta = synth.synth_images(spark, sf_dir,
                              with_footprint=False).where("id % 19 = 0")
    return synth.attach_bytes(meta.repartition(4))


def _sample_rat(spark, sf_dir):
    return rat_table(_clump_images(spark, sf_dir), quant=128).toPandas()


def test_neighbour_symmetry_numpy():
    rng = np.random.RandomState(3)
    lab = label_components(rng.rand(40, 37) > 0.45)
    n = int(lab.max())
    nn, mn, mx = _clump_neighbours(lab, n)
    # rebuild the full neighbour sets brute-force and check symmetry
    sets = {c: set() for c in range(1, n + 1)}
    h, w = lab.shape
    for y in range(h):
        for x in range(w):
            c = lab[y, x]
            if c == 0:
                continue
            for dy, dx in ((0, 1), (1, 0)):
                yy, xx = y + dy, x + dx
                if yy < h and xx < w and lab[yy, xx] not in (0, c):
                    sets[c].add(int(lab[yy, xx]))
                    sets[int(lab[yy, xx])].add(int(c))
    for c in range(1, n + 1):
        assert nn[c] == len(sets[c])
        for b in sets[c]:
            assert c in sets[b]          # find_neighbours symmetry
        assert mn[c] == (min(sets[c]) if sets[c] else 0)
        assert mx[c] == (max(sets[c]) if sets[c] else 0)


def test_mode_and_percentile_bounds():
    rng = np.random.RandomState(11)
    ls = rng.randint(1, 9, 4000).astype(np.int64)
    vs = rng.randint(0, 50, 4000).astype(np.int64)
    n = int(ls.max())
    mode = _clump_mode(ls, vs, n)
    p25, p50, p75 = _clump_percentiles(ls, vs, n)
    for c in range(1, n + 1):
        cv = vs[ls == c]
        assert mode[c] in cv
        assert (cv == mode[c]).sum() == max(
            np.bincount(cv).max(), 0)
        assert cv.min() <= p25[c - 1] <= p50[c - 1] <= p75[c - 1] <= cv.max()
        assert p50[c - 1] == np.sort(cv)[(len(cv) * 50 + 99) // 100 - 1]


def test_rat_table_spark(spark, sf_dir):
    rat = _sample_rat(spark, sf_dir)
    assert len(rat) > 0
    # clump ids dense per image
    for _, g in rat.groupby("image_id"):
        assert sorted(g["clump_id"]) == list(range(1, len(g) + 1))
    # neighbour ids always reference existing clumps of the same image
    nz = rat[rat["n_neigh"] > 0]
    mx = rat.groupby("image_id")["clump_id"].max()
    for _, r in nz.iterrows():
        assert 1 <= r["min_neigh"] <= r["max_neigh"] <= mx[r["image_id"]]
        assert r["min_neigh"] != r["clump_id"]
        assert r["max_neigh"] != r["clump_id"]
    # percentile ordering
    assert (rat["p25"] <= rat["p50"]).all()
    assert (rat["p50"] <= rat["p75"]).all()
    # segment values live inside their quantization band
    assert (rat["p75"] // 128 == rat["p25"] // 128).all()
    assert (rat["mode_val"] // 128 == rat["p50"] // 128).all()
    # segmentation labels every pixel: neighbours are non-vacuous
    assert rat["n_neigh"].sum() > 0


def test_collapse_rat_dense(spark, sf_dir):
    img = _clump_images(spark, sf_dir)
    out = collapse_rat(rat_table(img, quant=128), min_pix=8).toPandas()
    assert (out["n_pix"] >= 8).all()
    for _, g in out.groupby("image_id"):
        g = g.sort_values("clump_id")
        assert list(g["new_id"]) == list(range(1, len(g) + 1))
        # original relative order preserved
        assert g["clump_id"].is_monotonic_increasing


def test_merge_small_clumps(spark, sf_dir):
    from rsgislib_spark.operators.rastergis import merge_small_clumps

    img = _clump_images(spark, sf_dir)
    out = merge_small_clumps(img, quant=128, min_pix=8).toPandas()
    rat = _sample_rat(spark, sf_dir).set_index(["image_id", "clump_id"])
    assert len(out) > 0
    moved = out[out["new_label"] != out["clump_id"]]
    kept = out[out["new_label"] == out["clump_id"]]
    assert len(moved) > 0
    # only small clumps move, and only into genuinely larger-or-equal
    # 4-neighbourhood targets that exist
    sizes = out.set_index(["image_id", "clump_id"])["n_pix"]
    for _, r in moved.iterrows():
        assert r["n_pix"] < 8
        key = (r["image_id"], r["clump_id"])
        tgt = (r["image_id"], r["new_label"])
        assert tgt in sizes.index
        # the target is among the clump's neighbours
        nb = rat.loc[key]
        assert nb["min_neigh"] <= r["new_label"] <= nb["max_neigh"]
    # large clumps never move; small isolated clumps keep their label
    for _, r in kept.iterrows():
        key = (r["image_id"], r["clump_id"])
        assert r["n_pix"] >= 8 or rat.loc[key]["n_neigh"] == 0
