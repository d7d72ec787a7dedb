"""Cross-CRS warp (resample_img_to_match) — operators/warp.py.

Covers the three claims the operator rests on:

1. the numpy evaluation of the generated SQL text is bit-identical to
   DuckDB evaluating the same text (the engine/oracle parity mechanism);
2. the inverse series really inverts the forward projection (independent
   Newton inversion as ground truth — no pyproj needed);
3. warping a synthetic linear plane recovers the plane within kernel
   tolerance (bilinear reproduces a linear function exactly up to
   quantization), OSGB (EPSG:27700) and UTM (EPSG:32632).
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

from rsgislib_spark.functions import codec
from rsgislib_spark.operators.warp import (QUANT, np_eval_sql, run_steps_np,
                                           warp_exprs, warp_img_stats)

OUT_W, OUT_H, OUT_RES = 24, 18, 150.0


def _px_env(img_steps, px_steps, lon, lat, K):
    env = run_steps_np(img_steps, {"lon": np.asarray(lon, float),
                                   "lat": np.asarray(lat, float)})
    n = len(lon)
    penv = run_steps_np(px_steps, {
        "k": np.tile(np.arange(K, dtype=np.int64), n),
        "rlon": np.repeat(env["rlon"], K),
        "rlat": np.repeat(env["rlat"], K),
        "__wgox": np.repeat(env["__wgox"], K),
        "__wgoy": np.repeat(env["__wgoy"], K),
    })
    return env, penv


@pytest.mark.parametrize("kernel,outs", [
    ("nn", ["__wsx", "__wsy"]),
    ("bilinear", ["__wi0", "__wj0", "__wfx", "__wfy"]),
])
def test_px_chain_matches_duckdb_bitexact(kernel, outs):
    img_steps, px_steps, _ = warp_exprs(27700, OUT_W, OUT_H, OUT_RES, kernel)
    rng = np.random.RandomState(11)
    lon = -180.0 + 360.0 * rng.rand(40)
    lat = -60.0 + 120.0 * rng.rand(40)
    K = OUT_W * OUT_H
    _, penv = _px_env(img_steps, px_steps, lon, lat, K)

    con = duckdb.connect()
    con.register("base", pd.DataFrame({"lon": lon, "lat": lat}))
    s = "SELECT lon, lat FROM base"
    for name, expr in img_steps:
        s = f"SELECT *, {expr} AS {name} FROM ({s})"
    s = f"SELECT *, unnest(generate_series(0, {K - 1})) AS k FROM ({s})"
    for name, expr in px_steps:
        s = f"SELECT *, {expr} AS {name} FROM ({s})"
    cols = ", ".join(outs)
    r = con.execute(f"SELECT {cols} FROM ({s}) ORDER BY lon, k").fetchnumpy()
    order = np.lexsort((np.tile(np.arange(K), len(lon)),
                        np.repeat(lon, K)))
    for c in outs:
        assert np.array_equal(r[c], penv[c][order]), c


@pytest.mark.parametrize("epsg", [27700, 32632])
def test_inverse_recovers_forward_newton(epsg):
    """Newton-invert the FORWARD series numerically as independent truth;
    the shipped inverse series must agree within its truncation error."""
    from rsgislib_spark.geo.transverse_mercator import (epsg_tm_params,
                                                        tm_forward_steps,
                                                        tm_inverse_steps)
    from rsgislib_spark.operators.warp import WARP_WINDOWS

    p = epsg_tm_params(epsg)
    lon0, lon_span, lat0, lat_span = WARP_WINDOWS[epsg]
    fs, fe, fn = tm_forward_steps("lon", "lat", p)
    ivs, il, ia = tm_inverse_steps("e", "n", p)

    def fwd(lon, lat):
        env = run_steps_np(fs, {"lon": lon, "lat": lat})
        return np_eval_sql(fe, env), np_eval_sql(fn, env)

    rng = np.random.RandomState(3)
    lon = lon0 + lon_span * rng.rand(200)
    lat = lat0 + min(lat_span, 15.0) * rng.rand(200)
    E, N = fwd(lon, lat)
    env = run_steps_np(ivs, {"e": E, "n": N})
    lon_s, lat_s = np_eval_sql(il, env), np_eval_sql(ia, env)

    # Newton (secant via finite differences) from the series answer
    glon, glat = lon_s.copy(), lat_s.copy()
    for _ in range(8):
        Eg, Ng = fwd(glon, glat)
        d = 1e-7
        dEx = (fwd(glon + d, glat)[0] - Eg) / d
        dNy = (fwd(glon, glat + d)[1] - Ng) / d
        glon = glon - (Eg - E) / dEx
        glat = glat - (Ng - N) / dNy
    Ec, Nc = fwd(glon, glat)
    assert np.abs(Ec - E).max() < 1e-6 and np.abs(Nc - N).max() < 1e-6
    # series truncation bound: a few metres at window edge
    assert np.abs(lon_s - glon).max() < 6e-5   # deg  (~4 m)
    assert np.abs(lat_s - glat).max() < 1e-5   # deg  (~1 m)


def test_bilinear_recovers_plane():
    """Bilinear warp of v(x,y) = a + b*x + c*y recovers the plane at the
    inverse-mapped sample coordinate EXACTLY (up to 2^-20 quantization):
    the 'warp a synthetic plane and recover it' criterion."""
    img_steps, px_steps, extras = warp_exprs(27700, OUT_W, OUT_H, OUT_RES,
                                             "bilinear")
    a, b, c = 100.0, 3.0, 2.0
    w = h = 100
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    plane = (a + b * x + c * y).astype(np.int64)  # integer plane

    K = OUT_W * OUT_H
    _, penv = _px_env(img_steps, px_steps, [10.0], [50.0], K)
    i0, j0 = penv["__wi0"], penv["__wj0"]
    fx, fy = penv["__wfx"], penv["__wfy"]
    ok = (i0 >= 0) & (i0 <= w - 2) & (j0 >= 0) & (j0 <= h - 2)
    # the out grid is centred on the image ANCHOR = its top-left corner,
    # so roughly the lower-right quadrant of the grid is interior
    assert ok.sum() > K // 8, "some of the grid must be interior"
    assert ok.sum() < K, "and some of it outside (nodata branch)"
    ii, jj = i0[ok].astype(int), j0[ok].astype(int)
    venv = {"v00": plane[jj, ii].astype(float),
            "v10": plane[jj, ii + 1].astype(float),
            "v01": plane[jj + 1, ii].astype(float),
            "v11": plane[jj + 1, ii + 1].astype(float),
            "__wfx": fx[ok], "__wfy": fy[ok]}
    got = np_eval_sql(extras["interp"], venv)
    want = a + b * (penv["__wsxf"][ok] - 0.5) + c * (penv["__wsyf"][ok] - 0.5)
    assert np.abs(got - want).max() < 4.0 / QUANT


def test_warp_img_stats_spark_plane(spark):
    """End-to-end Arrow plumbing: encoded plane images through
    warp_img_stats match the same aggregates computed directly."""
    from pyspark.sql.types import (BinaryType, DoubleType, IntegerType,
                                   StringType, StructField, StructType)

    img_steps, px_steps, _ = warp_exprs(27700, OUT_W, OUT_H, OUT_RES, "nn")
    K = OUT_W * OUT_H
    w = h = 64
    rows, planes, lons, lats = [], [], [], []
    for i in range(5):
        x = np.arange(w)[None, :]
        y = np.arange(h)[:, None]
        plane = ((50 + i) + 2 * x + 3 * y).astype(np.uint16)
        buf = codec.encode_image(plane, "raw16")
        lon, lat = 10.0 + 0.01 * i, 50.0 + 0.01 * i
        rows.append((f"p{i}", bytearray(buf), w, h, "raw16", lon, lat))
        planes.append(plane.astype(np.int64))
        lons.append(lon)
        lats.append(lat)
    schema = StructType([
        StructField("image_id", StringType()),
        StructField("bytes", BinaryType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("fmt", StringType()),
        StructField("lon", DoubleType()),
        StructField("lat", DoubleType()),
    ])
    df = spark.createDataFrame(rows, schema)
    got = {r["image_id"]: r for r in
           warp_img_stats(df, kernel="nn").collect()}
    assert len(got) == 5

    _, penv = _px_env(img_steps, px_steps, lons, lats, K)
    kw = np.arange(K, dtype=np.int64) + 1
    for i in range(5):
        sl = slice(i * K, (i + 1) * K)
        sx, sy = penv["__wsx"][sl], penv["__wsy"][sl]
        ok = (sx >= 0) & (sx <= w - 1) & (sy >= 0) & (sy <= h - 1)
        v = planes[i][sy[ok].astype(int), sx[ok].astype(int)]
        r = got[f"p{i}"]
        assert r["n_valid"] == int(ok.sum())
        assert r["sum_warp"] == int(v.sum())
        assert r["chk_warp"] == int((kw[ok] * (v + 1)).sum())
        assert r["min_warp"] == int(v.min())
        assert r["max_warp"] == int(v.max())
