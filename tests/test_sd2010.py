"""SD2010 standardised reflectance + the acos degree step."""

import numpy as np

from rsgislib_spark.operators.elevation import acos_deg_np, acos_deg_sql


def test_acos_poly_accuracy():
    x = np.linspace(-1.0, 1.0, 4001)
    err = np.abs(acos_deg_np(x) - np.degrees(np.arccos(x)))
    assert err.max() < 2e-6  # A&S 4.4.46 bound, in degrees


def test_acos_clamps_out_of_range():
    x = np.array([1.0 + 1e-15, -1.0 - 1e-15, 1.5, -1.5])
    got = acos_deg_np(x)
    assert np.allclose(got, [0.0, 180.0, 0.0, 180.0], atol=1e-5)
    assert np.isfinite(got).all()


def test_acos_sql_matches_np_bitexact():
    import duckdb
    import pandas as pd

    x = np.linspace(-1.0, 1.0, 1001)
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"x": x}))
    r = con.execute(f"SELECT {acos_deg_sql('x')} AS d FROM t").fetchnumpy()
    assert np.array_equal(r["d"], acos_deg_np(x))


def test_sd2010_both_branches_populated(spark, sf_dir):
    from rsgislib_spark.queries import QUERIES

    pdf = QUERIES["sref_sd2010"](spark, sf_dir).toPandas()
    assert len(pdf) > 0
    assert (pdf.n_shade > 0).any(), "shade branch must populate"
    assert ((pdf.n_pix - pdf.n_shade) > 0).any(), "lit branch must populate"
    # shade pixels emit 0.0 => any shaded image has min quantized 0
    shaded = pdf[pdf.n_shade > 0]
    assert (shaded.min_sd_q == 0).all()
    # lit pixels clamp at >= 1.0 * 2^20 when scale > 99
    full_lit = pdf[pdf.n_shade == 0]
    if len(full_lit):
        assert (full_lit.min_sd_q >= 1048576).all()
