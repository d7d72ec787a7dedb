"""dedup_clusters structural invariants: transitive closure over
near-dup pairs, canonical = min doc_id, sizes consistent."""

import pyspark.sql.functions as F

from rsgislib_spark.operators import textops as tx


def _docs(spark):
    base = ("the quick brown fox jumps over the lazy dog near the river "
            "bank today and tomorrow morning with light rain expected "
            "across the northern hills")
    words = base.split()
    # chain: d0 ~ d1 ~ d2.  At threshold 0.8 the direct d0-d2 pair is
    # EXCLUDED (jaccard 0.769) while d0-d1 (0.917) and d1-d2 (0.840)
    # pass — so d2 joining d0's cluster proves transitive closure, not
    # a direct pair
    d0 = " ".join(words)
    d1 = " ".join(words[:-1] + ["valleys"])
    d2 = " ".join([words[0], "slow"] + words[2:-1] + ["valleys"])
    # an isolated singleton and an exact duplicate pair
    d3 = "completely different content about spark catalyst optimizer internals"
    d4 = d0
    rows = [(i, t) for i, t in enumerate([d0, d1, d2, d3, d4])]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_transitive_clusters(spark):
    docs = _docs(spark)
    out = tx.dedup_clusters(docs, threshold=0.8, rounds=4).toPandas() \
        .set_index("doc_id").sort_index()
    # the chain 0-1-2 plus the exact dup 4 all collapse onto min id 0
    assert set(out.loc[[0, 1, 2, 4], "cluster_id"]) == {0}
    assert (out.loc[[0, 1, 2, 4], "cluster_size"] == 4).all()
    # singleton keeps itself
    assert out.loc[3, "cluster_id"] == 3
    assert out.loc[3, "cluster_size"] == 1
    # canonical iff cluster owner
    assert (out["is_canonical"] == (out.index == out["cluster_id"])).all()


def test_cluster_sizes_partition_corpus(spark):
    docs = _docs(spark)
    out = tx.dedup_clusters(docs, threshold=0.8, rounds=4).toPandas()
    # sizes per cluster_id agree with the actual member count
    counts = out.groupby("cluster_id").size()
    for _, r in out.iterrows():
        assert r["cluster_size"] == counts[r["cluster_id"]]
    assert len(out) == 5
