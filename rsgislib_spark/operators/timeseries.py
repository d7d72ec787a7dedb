"""Season-trend (harmonic) model fitting over event time series.

Reference: rsgislib.timeseries.modelfitting (get_ST_model_coeffs /
fit_ols_model, python/rsgislib/timeseries/modelfitting.py:60-163): the
Zhu et al. (2015) season-trend family fits OLS coefficients on harmonic
terms cos/sin(2*pi*k*t / 365.25).  The reference evaluates libm cos/sin
per observation — engine-dependent in the last ulp — so this engine
pins the harmonic regressor as a QUANTIZED INTEGER day-of-year table
(round(128 * cos(2*pi*(doy-1)/365.25)), 366 rows) computed once in
Python and shared VERBATIM with the DuckDB oracle (the same trick as
the Lanczos resample weights).  The normal equations of the
one-harmonic model  y ~ a + b*cq(doy)  are then 2x2 integer Cramer:
every sum < 2^60 at the bench scales, and a/b are one IEEE division
each.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

__all__ = ["harmonic_table", "season_trend_fit"]


def harmonic_table(scale: int = 128) -> list[tuple[int, int]]:
    """(doy, round(scale*cos(2*pi*(doy-1)/365.25))) for doy 1..366."""
    return [(d, round(scale * math.cos(2.0 * math.pi * (d - 1) / 365.25)))
            for d in range(1, 367)]


def season_trend_fit(events: DataFrame) -> DataFrame:
    """Per event_type one-harmonic OLS over value cents vs day-of-year.

    Output: n, sum_y, sum_xy (exact ints pinning the inputs) and the
    OLS coefficients a_cents (intercept) and b_cents (harmonic
    amplitude), each one IEEE division of exact integers:
    b = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2), a = (Sy - b_num/det... ) —
    emitted in the numerically pinned Cramer form
    a = (Sxx*Sy - Sx*Sxy) / det.
    """
    spark = events.sparkSession
    tbl = spark.createDataFrame(harmonic_table(), "doy int, cq long")
    e = events.select(
        "event_type",
        F.dayofyear("ts").alias("doy"),
        F.round(F.col("value") * F.lit(100.0)).cast("long").alias("vc"))
    j = e.join(F.broadcast(tbl), "doy")
    g = j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cq").alias("sx"),
        F.sum(F.col("cq") * F.col("cq")).alias("sxx"),
        F.sum("vc").alias("sy"),
        F.sum(F.col("cq") * F.col("vc")).alias("sxy"))
    det = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    bnum = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    anum = F.col("sxx") * F.col("sy") - F.col("sx") * F.col("sxy")
    return g.select(
        "event_type", "n", "sy", "sxy",
        (anum.cast("double") / det.cast("double")).alias("a_cents"),
        (bnum.cast("double") / det.cast("double")).alias("b_cents"))


#: predict_for_date target days-of-year (mid-season sample dates)
PREDICT_DOYS = (15, 105, 196, 288)


def season_trend_predict(events: DataFrame) -> DataFrame:
    """timeseries.modelfitting.gen_prediction / predict_for_date
    (python/rsgislib/timeseries/modelfitting.py:394-470): evaluate the
    fitted season-trend model at target dates — intercept + slope term
    + sum of coeff * harmonic.  One-harmonic engine model (the same
    quantized-cos regressor the fit used): pred = a + b * cq(doy), one
    pinned multiply-add of the fitted doubles per (event_type, date),
    identical IEEE ops in both engines."""
    fit = season_trend_fit(events)
    spark = events.sparkSession
    tbl = spark.createDataFrame(
        [(d, c) for d, c in harmonic_table() if d in PREDICT_DOYS],
        "doy int, cq long")
    p = fit.crossJoin(F.broadcast(tbl))
    return p.select(
        "event_type", F.col("doy").cast("long").alias("doy"),
        (F.col("a_cents")
         + F.col("b_cents") * F.col("cq").cast("double"))
        .alias("pred_cents"))
