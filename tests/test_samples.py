"""Extracted-sample family invariants (chip extraction, hash split,
finite filter) — structural checks beyond the DuckDB parity gate."""

import numpy as np
from pyspark.sql import functions as F

from rsgislib_spark import synth
from rsgislib_spark.session import load_tables
from rsgislib_spark.sources.samples import (chip_extract,
                                            finite_sample_filter,
                                            hash_split)


def _imgs(spark, sf_dir, mod=7):
    meta = synth.synth_images(spark, sf_dir,
                              with_footprint=False).where(f"id % {mod} = 0")
    return synth.attach_bytes(meta.repartition(4))


def test_chip_centres_and_bounds(spark, sf_dir):
    chips = chip_extract(_imgs(spark, sf_dir), mask_value=42,
                         half=3).toPandas()
    assert len(chips) > 0
    meta = synth.synth_images(spark, sf_dir, with_footprint=False) \
        .where("id % 7 = 0").select("image_id", "id", "w", "h",
                                    "fmt").toPandas().set_index("image_id")
    for _, r in chips.iterrows():
        m = meta.loc[r["image_id"]]
        plane = synth.pixel_array(int(m["id"]), int(m["w"]), int(m["h"]),
                                  str(m["fmt"])).astype(np.int64)
        cy, cx = int(r["cy"]), int(r["cx"])
        assert plane[cy, cx] == 42                 # centre is the mask hit
        win = plane[cy - 3:cy + 4, cx - 3:cx + 4]
        assert win.shape == (7, 7)                 # never a partial chip
        assert r["chip_sum"] == win.sum()
        assert r["chip_min"] == win.min()
        assert r["chip_max"] == win.max()
    # every interior mask hit is extracted (none silently dropped)
    n_expected = 0
    for _, m in meta.iterrows():
        plane = synth.pixel_array(int(m["id"]), int(m["w"]), int(m["h"]),
                                  str(m["fmt"])).astype(np.int64)
        n_expected += int((plane[3:-3, 3:-3] == 42).sum())
    assert len(chips) == n_expected


def test_hash_split_partitions(spark, sf_dir):
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    out = hash_split(emb, "vec_id")
    total = emb.count()
    parts = dict(out.groupBy("split").count().collect())
    assert parts.get("p1", 0) + parts.get("p2", 0) == total
    assert parts.get("p1", 0) > parts.get("p2", 0)   # ~80/20
    # determinism: same assignment on re-evaluation
    a = {r["vec_id"]: r["split"] for r in out.select("vec_id",
                                                     "split").collect()}
    b = {r["vec_id"]: r["split"] for r in
         hash_split(emb, "vec_id").select("vec_id", "split").collect()}
    assert a == b


def test_finite_filter_drops_only_injected(spark, sf_dir):
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    corrupted = emb.withColumn(
        "vars",
        F.expr("""transform(embedding, (x, i) ->
                  CASE WHEN vec_id % 17 = 0 AND i = 0
                       THEN cast('NaN' as double)
                       WHEN vec_id % 23 = 0 AND i = 1
                       THEN cast('Infinity' as double)
                       ELSE cast(x as double) END)"""))
    kept = finite_sample_filter(corrupted, "vars").select("vec_id").toPandas()
    ids = set(kept["vec_id"])
    all_ids = {r["vec_id"] for r in emb.select("vec_id").collect()}
    dropped = all_ids - ids
    assert dropped == {i for i in all_ids if i % 17 == 0 or i % 23 == 0}
    # the ANY-limit gates never drop an all-finite synthetic row whose
    # vector straddles the limits
    n_gated = finite_sample_filter(corrupted, "vars", lower=0.0,
                                   upper=0.5).count()
    assert 0 < n_gated <= len(ids)
