"""Checkpoint/resume lineage protocol, streaming append mode, multimodal
stub behaviour."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def test_run_resumable_idempotent(spark, sf_dir, tmp_path):
    from rsgislib_spark import synth
    from rsgislib_spark.plans.lineage import completed_cells, run_resumable

    img = synth.synth_images(spark, sf_dir, with_footprint=False)
    out = str(tmp_path / "job")

    def process(df):
        return df.select("cell", "image_id", "phash")

    n1 = run_resumable(img, out, process)
    assert n1 > 0
    # re-run on identical input: every cell has lineage -> nothing to do
    n2 = run_resumable(img, out, process)
    assert n2 == 0
    # data completeness: one output row per input row, none duplicated
    data = spark.read.parquet(os.path.join(out, "data"))
    assert data.count() == img.count()
    assert data.select("image_id").distinct().count() == img.count()
    assert completed_cells(spark, os.path.join(out, "lineage")).count() == n1


def test_run_resumable_processes_only_missing(spark, sf_dir, tmp_path):
    """Killing a run midway = some cells done; resume does the rest."""
    from rsgislib_spark import synth
    from rsgislib_spark.operators.spatial_join import with_point_cell
    from rsgislib_spark.plans.lineage import run_resumable

    img = synth.synth_images(spark, sf_dir, with_footprint=False)
    keyed = with_point_cell(img)
    cells = sorted(r.cell for r in keyed.select("cell").distinct().collect())
    half = set(cells[: len(cells) // 2])
    part1 = keyed.where(F.col("cell").isin([int(c) for c in half])).drop("cell")
    out = str(tmp_path / "job")

    def process(df):
        return df.select("cell", "image_id", "phash")

    n1 = run_resumable(part1, out, process)
    assert n1 == len(half)
    n2 = run_resumable(img, out, process)          # full input resumes
    assert n1 + n2 == len(cells)
    data = spark.read.parquet(os.path.join(out, "data"))
    assert data.count() == img.count()


def test_stream_append_withholds_open_windows(spark, sf_dir):
    from rsgislib_spark.streaming.events import (
        stream_hourly_counts, stream_hourly_counts_append)

    full = stream_hourly_counts(spark, sf_dir)
    appended = stream_hourly_counts_append(spark, sf_dir, watermark="2 hours")
    n_full = full.select("hour").distinct().count()
    n_app = appended.select("hour").distinct().count()
    # append emits only finalized windows: never more than complete mode,
    # and the trailing (still-open) windows are withheld
    assert 0 < n_app < n_full
    # emitted window counts agree with the batch truth
    fkey = {(r.hour, r.event_type): r.n_events for r in full.collect()}
    for r in appended.collect():
        assert fkey[(r.hour, r.event_type)] == r.n_events


def test_stateful_stream_sessionize_matches_batch(spark, sf_dir):
    """applyInPandasWithState sessionization == batch window-fn oracle."""
    from rsgislib_spark.streaming.events import (sessionize_batch,
                                                 sessionize_stream)

    events = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    batch = {r.user_id: (r.n_sessions, r.n_events)
             for r in sessionize_batch(events).collect()}
    stream = {r.user_id: (r.n_sessions, r.n_events)
              for r in sessionize_stream(spark, sf_dir).collect()}
    assert stream == batch and batch


def test_stateful_sessionize_across_micro_batches(spark, sf_dir, tmp_path):
    """State must carry correctly across REAL micro-batches: the events
    table is re-laid-out as three time-ordered files replayed with
    maxFilesPerTrigger=1; the final per-user state must equal the batch
    oracle (update-mode emits one row per touched batch — the final row
    has the maxima)."""
    import time

    from pyspark.sql import functions as F

    from rsgislib_spark.streaming.events import (sessionize_batch,
                                                 sessionize_stream)

    events = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    qs = events.approxQuantile("event_id", [0.33, 0.66], 0.0)
    chunks_dir = str(tmp_path / "event_chunks")
    os.makedirs(chunks_dir)
    bounds = [(None, qs[0]), (qs[0], qs[1]), (qs[1], None)]
    ordered = events.orderBy("ts").withColumn(
        "rk", F.row_number().over(__import__("pyspark").sql.Window
                                  .orderBy("ts", "event_id")))
    n = ordered.count()
    for i in range(3):
        lo, hi = i * n // 3, (i + 1) * n // 3
        part = ordered.where((F.col("rk") > lo) & (F.col("rk") <= hi)) \
            .drop("rk")
        part.toPandas().to_parquet(
            os.path.join(chunks_dir, f"chunk_{i}.parquet"),
            coerce_timestamps="us", allow_truncated_timestamps=True)
        time.sleep(1.1)   # distinct mtimes -> oldest-first replay order

    out = sessionize_stream(spark, chunks_dir, max_files_per_trigger=1)
    final = {r.user_id: (r.n_sessions, r.n_events)
             for r in out.groupBy("user_id")
             .agg(F.max("n_sessions").alias("n_sessions"),
                  F.max("n_events").alias("n_events")).collect()}
    ref = {r.user_id: (r.n_sessions, r.n_events)
           for r in sessionize_batch(events).collect()}
    assert final == ref
    # and state really did cross batches: some users span >= 2 chunks
    multi = out.groupBy("user_id").count().where("count >= 2").count()
    assert multi > 0


def test_multimodal_decode_stub_raises(spark):
    from rsgislib_spark.sources.multimodal import decode_media

    with pytest.raises(NotImplementedError):
        decode_media(b"\x00" * 16, 2, 2, "mp4")
    with pytest.raises(NotImplementedError):
        decode_media(b"\x00" * 16, 2, 2, "wav")


def test_resize_roundtrip_bytes(spark, sf_dir):
    """Resized payloads re-encode/decode losslessly (png path included)."""
    import numpy as np

    from rsgislib_spark import synth
    from rsgislib_spark.functions import codec
    from rsgislib_spark.sources.multimodal import resize_nn

    img = synth.synth_images(spark, sf_dir, with_bytes=True,
                             with_footprint=False).where("id % 97 = 0")
    rows = resize_nn(img, 16, 16, encode=True).collect()
    assert rows
    for r in rows:
        arr = codec.decode_image(bytes(r.bytes), 16, 16, r.fmt)
        assert arr.shape == (16, 16)
        assert int(arr.astype(np.int64).sum()) == r.sum_pix


def test_tws_sessionize_gated_or_matches_batch(spark, sf_dir):
    """transformWithStateInPandas variant: runs (and matches the batch
    oracle) where protobuf exists; raises the documented gate error
    here (sandbox ships without google.protobuf)."""
    from rsgislib_spark.streaming.events import (sessionize_batch,
                                                 sessionize_stream_tws,
                                                 tws_available)

    if not tws_available():
        with pytest.raises(NotImplementedError):
            sessionize_stream_tws(spark, sf_dir)
        return
    events = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ref = {r.user_id: (r.n_sessions, r.n_events)
           for r in sessionize_batch(events).collect()}
    got = {r.user_id: (r.n_sessions, r.n_events)
           for r in sessionize_stream_tws(spark, sf_dir).collect()}
    assert got == ref


def test_stream_dedup_replayed_batches_exactly_once(spark, sf_dir, tmp_path):
    """dropDuplicatesWithinWatermark: the same event file replayed in a
    LATER micro-batch must be fully suppressed by cross-batch dedup
    state — output equals the distinct event set, exactly once."""
    import time

    from rsgislib_spark.streaming.events import stream_dedup

    events = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    sub = events.orderBy("event_id").limit(400).toPandas()
    replay_dir = str(tmp_path / "replayed")
    os.makedirs(replay_dir)
    for i in range(2):  # identical content, two files -> two batches
        sub.to_parquet(os.path.join(replay_dir, f"delivery_{i}.parquet"),
                       coerce_timestamps="us",
                       allow_truncated_timestamps=True)
        time.sleep(1.1)

    out = stream_dedup(spark, replay_dir, max_files_per_trigger=1)
    got = out.collect()
    assert len(got) == 400                      # 800 delivered, 400 emitted
    assert len({r.event_id for r in got}) == 400


def test_season_trend_fit(spark, sf_dir):
    """Season-trend OLS: coefficients agree with numpy lstsq on the
    same quantized regressor; harmonic table is a true cosine."""
    import numpy as np

    from rsgislib_spark.operators.timeseries import (harmonic_table,
                                                     season_trend_fit)

    tbl = dict(harmonic_table())
    assert tbl[1] == 128 and min(tbl.values()) == -128
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = season_trend_fit(ev).toPandas()
    assert len(out) > 0
    pdf = ev.toPandas()
    pdf["doy"] = pdf["ts"].dt.dayofyear
    pdf["cq"] = pdf["doy"].map(tbl)
    pdf["vc"] = (pdf["value"] * 100).round()
    for _, r in out.iterrows():
        g = pdf[pdf["event_type"] == r["event_type"]]
        A = np.stack([np.ones(len(g)), g["cq"].to_numpy(float)], axis=1)
        sol, *_ = np.linalg.lstsq(A, g["vc"].to_numpy(float), rcond=None)
        assert abs(r["a_cents"] - sol[0]) < 1e-6
        assert abs(r["b_cents"] - sol[1]) < 1e-9
        assert r["n"] == len(g)
