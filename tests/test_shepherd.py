"""Shepherd segmentation invariants (kmeans_values determinism vs a
brute-force reference; segment lattice structure)."""

import numpy as np

from rsgislib_spark import synth
from rsgislib_spark.operators.segmentation import (kmeans_values,
                                                   shepherd_segments)


def _kmeans_brute(vals, k=4, iters=6):
    """Literal per-element restatement of the documented contract."""
    vals = vals.astype(np.int64).ravel()
    vmin, vmax = int(vals.min()), int(vals.max())
    c = [vmin + ((vmax - vmin) * (2 * j + 1)) // (2 * k) for j in range(k)]
    for _ in range(iters):
        sums = [0] * k
        ns = [0] * k
        for v in vals:
            j = min(range(k), key=lambda j: (abs(int(v) - c[j]), j))
            sums[j] += int(v)
            ns[j] += 1
        c = [sums[j] // ns[j] if ns[j] else c[j] for j in range(k)]
    cls = np.array([min(range(k), key=lambda j: (abs(int(v) - c[j]), j))
                    for v in vals])
    return np.array(c), cls


def test_kmeans_matches_bruteforce():
    rng = np.random.RandomState(7)
    for trial in range(5):
        vals = rng.randint(0, 1024, size=400)
        c1, a1 = kmeans_values(vals, k=4, iters=6)
        c2, a2 = _kmeans_brute(vals, k=4, iters=6)
        assert list(c1) == list(c2)
        assert (a1 == a2).all()


def test_kmeans_constant_plane():
    c, cls = kmeans_values(np.full(64, 5), k=4, iters=6)
    # degenerate range: all centres collapse to the single value, all
    # pixels land in class 0 (smallest-index tie rule)
    assert (cls == 0).all()
    assert c[0] == 5


def test_shepherd_segments_lattice(spark, sf_dir):
    meta = synth.synth_images(spark, sf_dir,
                              with_footprint=False).where("id % 19 = 0")
    img = synth.attach_bytes(meta.repartition(4))
    out = shepherd_segments(img, k=4, iters=6).toPandas()
    assert len(out) > 0
    assert set(out["cls"]) <= {0, 1, 2, 3}
    area = {r["image_id"]: r["w"] * r["h"]
            for r in meta.select("image_id", "w", "h").collect()}
    for image_id, g in out.groupby("image_id"):
        # ids dense from 1, sizes sum to the whole plane (every pixel
        # is labeled — segmentation, not a threshold mask)
        assert sorted(g["seg_id"]) == list(range(1, len(g) + 1))
        assert g["n_pix"].sum() == area[image_id]
    # multi-segment images exist and segments of >1 class appear
    multi = out.groupby("image_id")["seg_id"].max()
    assert (multi > 1).any()
    assert out["cls"].nunique() > 1


def test_eliminate_reaches_fixpoint(spark, sf_dir):
    from rsgislib_spark.operators.segmentation import eliminate_small_segments

    meta = synth.synth_images(spark, sf_dir,
                              with_footprint=False).where("id % 19 = 0")
    img = synth.attach_bytes(meta.repartition(4))

    def run(r):
        return eliminate_small_segments(img, quant=128, min_pix=200,
                                        rounds=r).toPandas() \
            .sort_values(["image_id", "seg_id"]).reset_index(drop=True)

    r3, r5 = run(3), run(5)
    # sizes only grow, so the BSP rounds reach a fixpoint; 3 suffice here
    assert r3.equals(r5)
    assert (r3["new_label"] != r3["seg_id"]).any()
    # new_size is exactly the summed pixel count of the merged group
    gsz = r3.groupby(["image_id", "new_label"])["n_pix"].sum()
    for _, row in r3.iterrows():
        assert row["new_size"] == gsz[(row["image_id"], row["new_label"])]
    # total pixel mass is conserved per image
    tot = r3.groupby("image_id")
    assert (tot["n_pix"].sum() == tot.apply(
        lambda g: g.drop_duplicates("new_label")["new_size"].sum())).all()
