"""Distributed tiling: ``create_tiles`` / ``create_tiles_multi_core``.

The reference computes a vector of tile envelopes then copies pixels per
envelope in a single process (reference: src/cmds/RSGISCmdImageUtils.cpp:
262-836 — grid math; :804-826 — per-envelope copy via RSGISCopyImage).
Here the *tile-spec generation is pure Catalyst column arithmetic* — no
UDF, no shuffle: ``explode(sequence(...))`` fans each image row out to its
tiles, and every window coordinate is derived from ``(w, h, tile_idx)``
with the reference's exact remainder/overlap/clamp rules (the pure-python
oracle for this arithmetic lives in ``geo.tilegrid`` and is unit-tested
against the reference's documented 931x947@200 => 25-tile case,
python_tests/test_imageutils.py:643-655).

Pixel materialization is a separate, optional Arrow stage
(``tile_pixels``): decode ``bytes`` once per image inside ``mapInPandas``,
slice every tile window out of the numpy plane, re-encode.  Because the
specs stage is plan-only, queries that need only tile *assignments*
(counts, windows, names — most catalog operations) never touch pixels and
never pay the decode.

Tile identity: ``tile_idx`` = creation order (row-major including the
remainder column/row — ``{base}_tile{i}`` 0-based, RSGISCmdImageUtils.cpp:
809-811), and the multi-core naming ``x{i}y{j}`` 1-based
(imageutils/__init__.py:2640-2672).  Both are explicit columns — never
derived from partition order (SURVEY.md §4.2 determinism rule).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (BinaryType, IntegerType, LongType, StringType,
                               StructField, StructType)

from ..functions import codec

__all__ = ["tile_spec_df", "tile_spec_offset_df", "block_iter_specs",
           "tile_pixels", "tile_checksums_fused", "TILE_PIXEL_SCHEMA"]


def tile_spec_df(images: DataFrame, width: int, height: int,
                 overlap: int = 0, img_w: str = "w", img_h: str = "h") -> DataFrame:
    """Fan each image row out to its tile windows (Catalyst-only).

    Adds: n_tiles_x/y (full tiles), cols/rows (incl. remainder), tile_idx,
    tile_x, tile_y, tile_name, txmin/txmax/tymin/tymax (half-open pixel
    window, overlap-expanded and clamped), tile_name_mc (multi-core name).
    """
    tw, th, ov = int(width), int(height), int(overlap)
    w, h = F.col(img_w), F.col(img_h)

    num_x = (w / tw).cast("int")          # floor for positive ints
    num_y = (h / th).cast("int")
    rem_x = w - num_x * tw
    rem_y = h - num_y * th
    cols = num_x + F.when(rem_x > 0, 1).otherwise(0)
    rows = num_y + F.when(rem_y > 0, 1).otherwise(0)

    df = (
        images
        .withColumn("_numx", num_x).withColumn("_numy", num_y)
        .withColumn("_remx", rem_x).withColumn("_remy", rem_y)
        .withColumn("_cols", cols).withColumn("_rows", rows)
        .withColumn("tile_idx",
                    F.explode(F.sequence(F.lit(0), F.col("_cols") * F.col("_rows") - 1)))
        .withColumn("tile_x", F.col("tile_idx") % F.col("_cols"))
        .withColumn("tile_y", (F.col("tile_idx") / F.col("_cols")).cast("int"))
    )

    t_w = F.when(F.col("tile_x") < F.col("_numx"), tw).otherwise(F.col("_remx"))
    t_h = F.when(F.col("tile_y") < F.col("_numy"), th).otherwise(F.col("_remy"))
    x0 = F.col("tile_x") * tw
    y0 = F.col("tile_y") * th

    df = (
        df.withColumn("txmin", F.greatest(x0 - ov, F.lit(0)))
        .withColumn("txmax", F.least(x0 + t_w + ov, w))
        .withColumn("tymin", F.greatest(y0 - ov, F.lit(0)))
        .withColumn("tymax", F.least(y0 + t_h + ov, h))
        .withColumn("tile_name",
                    F.concat(F.col("image_id"), F.lit("_tile"), F.col("tile_idx")))
        .withColumn("tile_name_mc",
                    F.concat(F.lit("x"), F.col("tile_x") + 1,
                             F.lit("y"), F.col("tile_y") + 1))
        .drop("_numx", "_numy", "_remx", "_remy", "_cols", "_rows")
    )
    return df


def tile_spec_offset_df(images: DataFrame, width: int, height: int,
                        overlap: int = 0, img_w: str = "w",
                        img_h: str = "h") -> DataFrame:
    """Half-tile-offset tiling grid (``offsetTiling``) — Catalyst-only.

    Reference: RSGISCmdImageUtils.cpp:305-535.  Layout per axis: one
    leading half tile, ``num`` full tiles, then a remainder tile whenever
    ``rem = size - num*width > 0`` (the reference computes the remainder
    from the *full* image size, so it overshoots and clamps — including
    the zero-width degenerate window on exact fits, replicated here).
    Requires width/height >= 2 so the half offset is nonzero.
    """
    tw, th, ov = int(width), int(height), int(overlap)
    if tw < 2 or th < 2:
        raise ValueError("offset tiling needs width/height >= 2")
    xo, yo = tw // 2, th // 2
    w, h = F.col(img_w), F.col(img_h)

    # F.floor (not a bare int cast) so images narrower than the half
    # offset give num = -1 exactly like the python/DuckDB floor-division
    # oracles, instead of truncating toward zero and emitting a spurious
    # degenerate tile.
    num_x = F.floor((w - xo) / tw).cast("int")
    num_y = F.floor((h - yo) / th).cast("int")
    rem_x = w - num_x * tw
    rem_y = h - num_y * th
    cols = F.lit(1) + num_x + F.when(rem_x > 0, 1).otherwise(0)
    rows = F.lit(1) + num_y + F.when(rem_y > 0, 1).otherwise(0)

    df = (
        images
        .withColumn("_numx", num_x).withColumn("_numy", num_y)
        .withColumn("_remx", rem_x).withColumn("_remy", rem_y)
        .withColumn("_cols", cols).withColumn("_rows", rows)
        .withColumn("tile_idx",
                    F.explode(F.sequence(F.lit(0),
                                         F.col("_cols") * F.col("_rows") - 1)))
        .withColumn("tile_x", F.col("tile_idx") % F.col("_cols"))
        .withColumn("tile_y", (F.col("tile_idx") / F.col("_cols")).cast("int"))
    )
    tx, ty = F.col("tile_x"), F.col("tile_y")
    c_x = F.when(tx == 0, 0).otherwise(xo + (tx - 1) * tw)
    c_y = F.when(ty == 0, 0).otherwise(yo + (ty - 1) * th)
    t_w = F.when(tx == 0, xo).otherwise(
        F.when(tx <= F.col("_numx"), tw).otherwise(F.col("_remx")))
    t_h = F.when(ty == 0, yo).otherwise(
        F.when(ty <= F.col("_numy"), th).otherwise(F.col("_remy")))
    return (
        df.withColumn("txmin", F.greatest(c_x - ov, F.lit(0)))
        .withColumn("txmax", F.least(c_x + t_w + ov, w))
        .withColumn("tymin", F.greatest(c_y - ov, F.lit(0)))
        .withColumn("tymax", F.least(c_y + t_h + ov, h))
        .withColumn("tile_name",
                    F.concat(F.col("image_id"), F.lit("_tile"),
                             F.col("tile_idx")))
        .drop("_numx", "_numy", "_remx", "_remy", "_cols", "_rows")
    )


def block_iter_specs(images: DataFrame, block_w: int, block_h: int,
                     img_w: str = "w", img_h: str = "h") -> DataFrame:
    """StdImgBlockIter grid: end blocks re-read SHIFTED to full size.

    Reference: python/rsgislib/imageutils/stdimgblockiter.py:214-288 —
    every block is exactly (block_w, block_h); the last block per axis
    starts at ``size - block`` (clamped to 0), overlapping its
    predecessor instead of shrinking.  The rule that matters for ML
    feeds (fixed tensor shapes) — replicated as pure Catalyst columns.
    """
    bw, bh = int(block_w), int(block_h)
    w, h = F.col(img_w), F.col(img_h)
    cols = F.ceil(w / F.lit(bw)).cast("int")
    rows = F.ceil(h / F.lit(bh)).cast("int")
    df = (
        images
        .withColumn("_cols", cols).withColumn("_rows", rows)
        .withColumn("block_idx",
                    F.explode(F.sequence(F.lit(0),
                                         F.col("_cols") * F.col("_rows") - 1)))
        .withColumn("block_x", F.col("block_idx") % F.col("_cols"))
        .withColumn("block_y", (F.col("block_idx") / F.col("_cols")).cast("int"))
    )
    x0 = F.greatest(F.least(F.col("block_x") * bw, w - bw), F.lit(0))
    y0 = F.greatest(F.least(F.col("block_y") * bh, h - bh), F.lit(0))
    return (
        df.withColumn("bxmin", x0)
        .withColumn("bxmax", F.least(x0 + bw, w))
        .withColumn("bymin", y0)
        .withColumn("bymax", F.least(y0 + bh, h))
        .drop("_cols", "_rows")
    )


TILE_PIXEL_SCHEMA = StructType([
    StructField("image_id", StringType()),
    StructField("tile_idx", IntegerType()),
    StructField("tile_name", StringType()),
    StructField("tile_w", IntegerType()),
    StructField("tile_h", IntegerType()),
    StructField("fmt", StringType()),
    StructField("bytes", BinaryType()),
    StructField("checksum", LongType()),
])


def tile_pixels(images: DataFrame, width: int, height: int,
                overlap: int = 0, encode: bool = True) -> DataFrame:
    """Materialize tile pixel payloads: one output row per tile.

    ``images`` must carry (image_id, bytes, w, h, fmt).  Each input image
    is decoded once; all its tile windows are sliced from the same numpy
    plane (the reference re-reads the file per envelope — here the decode
    amortizes).  ``checksum`` = int64 sum of the tile's pixel values, the
    cheap content fingerprint used by parity tests and lineage records.
    Set ``encode=False`` to skip re-encoding (checksum-only scans).
    """
    tw, th, ov = int(width), int(height), int(overlap)

    def gen(iterator):
        from ..geo.tilegrid import tile_specs

        for pdf in iterator:
            out = {k: [] for k in ("image_id", "tile_idx", "tile_name",
                                   "tile_w", "tile_h", "fmt", "bytes",
                                   "checksum")}
            for image_id, buf, w, h, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                arr = codec.decode_image(bytes(buf), int(w), int(h), str(fmt))
                for idx, (xmin, xmax, ymin, ymax) in enumerate(
                    tile_specs(int(w), int(h), tw, th, ov)
                ):
                    tile = arr[ymin:ymax, xmin:xmax]
                    out["image_id"].append(image_id)
                    out["tile_idx"].append(idx)
                    out["tile_name"].append(f"{image_id}_tile{idx}")
                    out["tile_w"].append(tile.shape[1])
                    out["tile_h"].append(tile.shape[0])
                    out["fmt"].append(str(fmt))
                    out["bytes"].append(
                        codec.encode_image(tile, str(fmt)) if encode else b""
                    )
                    out["checksum"].append(int(tile.astype(np.int64).sum()))
            yield pd.DataFrame(out)

    cols = [c for c in ("image_id", "bytes", "w", "h", "fmt") if c in images.columns]
    return images.select(*cols).mapInPandas(gen, schema=TILE_PIXEL_SCHEMA)


def tile_checksums_fused(meta: DataFrame, width: int, height: int,
                         overlap: int = 0,
                         rollup: str | None = None) -> DataFrame:
    """Fused payload-synth -> decode -> tile-checksum in ONE Arrow stage.

    Identical per-image semantics to
    ``tile_pixels(synth.attach_bytes(meta), encode=False)`` — the full
    encode + decode + slice + checksum work happens for every image —
    but the payload bytes never cross the Python<->JVM Arrow channel
    between two separate mapInPandas stages.  Chained Python stages in
    one Spark task each pay a full Arrow round-trip of their columns
    (and silently run a SECOND Python worker per task, masking true
    core cost); fusing is the Python-stage analog of whole-stage
    codegen — and the plan shape a real deployment gets when the
    decode UDF reads payloads directly from storage inside the scan
    stage instead of routing them through the JVM.

    ``rollup="image"`` additionally pushes the per-image combine into
    the same stage (map-side partial aggregation, the hand analog of
    Catalyst's partial_sum before an Exchange): output is one row per
    image ``(image_id, n_tiles, pix_sum)`` instead of one per tile —
    at 48x32 tiles that is ~7x fewer Arrow rows with no information
    the flagship rollup ever used.  Input needs metadata only:
    (id, image_id, w, h, fmt).
    """
    from .. import synth
    from ..geo.tilegrid import tile_specs

    tw, th, ov = int(width), int(height), int(overlap)

    if rollup == "image":
        schema = StructType([
            StructField("image_id", StringType()),
            StructField("n_tiles", LongType()),
            StructField("pix_sum", LongType()),
        ])

        def gen(iterator):
            for pdf in iterator:
                m = len(pdf)
                ids = pdf["id"].to_numpy()
                ws = pdf["w"].to_numpy()
                hs = pdf["h"].to_numpy()
                fmts = pdf["fmt"].to_numpy()
                n_out = np.zeros(m, np.int64)
                s_out = np.zeros(m, np.int64)
                for i in range(m):
                    w, h, fmt = int(ws[i]), int(hs[i]), str(fmts[i])
                    arr = synth.pixel_array(int(ids[i]), w, h, fmt)
                    buf = codec.encode_image(arr, fmt)
                    plane = codec.decode_image(buf, w, h, fmt) \
                        .astype(np.int64)
                    n, tot = 0, 0
                    for (xmin, xmax, ymin, ymax) in tile_specs(
                            w, h, tw, th, ov):
                        tot += int(plane[ymin:ymax, xmin:xmax].sum())
                        n += 1
                    n_out[i] = n
                    s_out[i] = tot
                yield pd.DataFrame({"image_id": pdf["image_id"],
                                    "n_tiles": n_out, "pix_sum": s_out})

        return meta.select("id", "image_id", "w", "h", "fmt") \
            .mapInPandas(gen, schema=schema)

    schema = StructType([
        StructField("image_id", StringType()),
        StructField("tile_idx", IntegerType()),
        StructField("tile_name", StringType()),
        StructField("tile_w", IntegerType()),
        StructField("tile_h", IntegerType()),
        StructField("fmt", StringType()),
        StructField("checksum", LongType()),
    ])

    def gen(iterator):
        for pdf in iterator:
            out = {k: [] for k in ("image_id", "tile_idx", "tile_name",
                                   "tile_w", "tile_h", "fmt", "checksum")}
            for img_id, image_id, w, h, fmt in zip(
                pdf["id"], pdf["image_id"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                w, h, fmt = int(w), int(h), str(fmt)
                arr = synth.pixel_array(int(img_id), w, h, fmt)
                buf = codec.encode_image(arr, fmt)
                plane = codec.decode_image(buf, w, h, fmt)
                for idx, (xmin, xmax, ymin, ymax) in enumerate(
                    tile_specs(w, h, tw, th, ov)
                ):
                    tile = plane[ymin:ymax, xmin:xmax]
                    out["image_id"].append(image_id)
                    out["tile_idx"].append(idx)
                    out["tile_name"].append(f"{image_id}_tile{idx}")
                    out["tile_w"].append(tile.shape[1])
                    out["tile_h"].append(tile.shape[0])
                    out["fmt"].append(fmt)
                    out["checksum"].append(int(tile.astype(np.int64).sum()))
            yield pd.DataFrame(out)

    return meta.select("id", "image_id", "w", "h", "fmt") \
        .mapInPandas(gen, schema=schema)
