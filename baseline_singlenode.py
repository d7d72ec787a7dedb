#!/usr/bin/env python
"""Single-node baseline in the REFERENCE's execution model.

The reference parallelizes with ``multiprocessing.Pool(n_cores).map``
over items (imageutils/__init__.py:2677-2680) — plain numpy, no engine.
This script runs the SAME flagship semantics as ``bench.py`` (synthesize
payloads for zone-matched images -> tile 48x32 -> checksum) in that
model over the same deterministic input, giving the apples-to-apples
single-node comparison BENCH.md reports (the reference repo itself
publishes no numbers — SURVEY.md §6).

    python baseline_singlenode.py [sf_dir] [n_procs]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

import duckdb
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rsgislib_spark import synth                      # noqa: E402
from rsgislib_spark.functions import codec            # noqa: E402
from rsgislib_spark.geo.tilegrid import tile_specs    # noqa: E402


def _load_rows(sf_dir: str):
    """Image metadata + zone match flags via DuckDB (same formulas)."""
    con = duckdb.connect()
    con.sql(f"CREATE VIEW part AS SELECT * FROM "
            f"read_parquet('{sf_dir}/part.parquet')")
    con.sql(f"CREATE VIEW nation AS SELECT * FROM "
            f"read_parquet('{sf_dir}/nation.parquet')")
    img = synth.images_sql("duckdb")
    zones = synth.zones_sql("duckdb")
    rows = con.sql(f"""
        WITH img AS ({img}), zones AS ({zones})
        SELECT DISTINCT i.id, i.w, i.h, i.fmt
        FROM img i JOIN zones z
          ON i.lon >= z.zxmin AND i.lon < z.zxmax
         AND i.lat >= z.zymin AND i.lat < z.zymax
    """).fetchall()
    n_total = con.sql("SELECT count(*) FROM part").fetchone()[0]
    return rows, n_total


def _work(row):
    img_id, w, h, fmt = int(row[0]), int(row[1]), int(row[2]), str(row[3])
    # same work as the engine's pipeline: encode payload (the scan-side
    # materialization), decode, slice every tile, checksum
    arr = synth.pixel_array(img_id, w, h, fmt)
    buf = codec.encode_image(arr, fmt)
    arr2 = codec.decode_image(buf, w, h, fmt)
    total = 0
    n_tiles = 0
    for (x0, x1, y0, y1) in tile_specs(w, h, 48, 32):
        total += int(arr2[y0:y1, x0:x1].astype(np.int64).sum())
        n_tiles += 1
    return n_tiles, total


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_procs = int(sys.argv[2]) if len(sys.argv) > 2 else (os.cpu_count() or 8)
    replicate = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    rows, n_total = _load_rows(sf_dir)
    rows = rows * replicate            # same k-fold volume as bench.py
    n_total *= replicate
    with mp.Pool(n_procs) as pool:         # warmup: fork + import cost
        pool.map(_work, rows[: n_procs * 2])
    t0 = time.perf_counter()
    with mp.Pool(n_procs) as pool:
        out = pool.map(_work, rows, chunksize=64)
    sec = time.perf_counter() - t0
    print(json.dumps({
        "model": "reference-style multiprocessing.Pool single node",
        "n_procs": n_procs,
        "n_images_total": n_total,
        "n_images_matched": len(rows),
        "n_tiles": int(sum(r[0] for r in out)),
        "pix_sum": int(sum(r[1] for r in out)),
        "sec": round(sec, 3),
        "images_per_sec": round(n_total / sec, 1),
    }))


if __name__ == "__main__":
    main()
