"""Results must be bit-identical across cluster sizes / partitionings.

The scaling protocol compares the same job at N and 4N parallelism — that
comparison is only meaningful because results don't depend on the
partitioning.  This test computes order-insensitive checksums of
representative queries in the session under test (local[8]) and in a
SEPARATE process at local[3] with different shuffle partitioning, and
requires exact equality (the engine's no-float-accumulation doctrine)."""

import hashlib
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

QUERIES = ["cell_encode", "sjoin_inner_within", "zonal_stats",
           "minhash_lsh", "embed_topk", "pixel_trend",
           # round-2 operators with nontrivial merge/encoding logic
           "zonal_stats_hybrid", "zonal_weighted", "composite_max_ndvi",
           "overlay_intersection", "knn_closest", "clump_stats",
           "reproj_utm"]

_SCRIPT = r"""
import hashlib, json, sys
sys.path.insert(0, {root!r})
from rsgislib_spark.session import get_spark
from rsgislib_spark.queries import QUERIES
spark = get_spark(app="invariance", master="local[3]", shuffle_partitions=5)
spark.sparkContext.setLogLevel("ERROR")
out = {{}}
for name in {queries!r}:
    df = QUERIES[name](spark, {sf_dir!r})
    rows = sorted(tuple(str(v) for v in r) for r in df.collect())
    out[name] = hashlib.md5(repr(rows).encode()).hexdigest()
print("CHECKSUMS " + json.dumps(out))
spark.stop()
"""


def _checksum(df):
    rows = sorted(tuple(str(v) for v in r) for r in df.collect())
    return hashlib.md5(repr(rows).encode()).hexdigest()


def test_results_invariant_across_parallelism(spark, sf_dir):
    from rsgislib_spark.queries import QUERIES as Q

    local = {name: _checksum(Q[name](spark, sf_dir)) for name in QUERIES}

    script = _SCRIPT.format(root=ROOT, queries=QUERIES, sf_dir=sf_dir)
    res = subprocess.run([sys.executable, "-c", script],
                         capture_output=True, text=True, timeout=600)
    line = [ln for ln in res.stdout.splitlines()
            if ln.startswith("CHECKSUMS ")]
    assert line, res.stderr[-2000:]
    import json
    other = json.loads(line[0][len("CHECKSUMS "):])
    assert other == local
