"""Tmask planted-outlier recall: the RLM screening catches the
synthetic cloud spikes / shadow dips and leaves clean steps mostly
unflagged."""

from rsgislib_spark.operators.tmask import tmask_stats, TMASK_T
from rsgislib_spark.queries import _px_images


def test_tmask_recall(spark, sf_dir):
    out = tmask_stats(_px_images(spark, sf_dir, mod=53)).toPandas()
    assert len(out) > 0
    assert (out.n_planted > 0).all()          # anomalies planted
    assert (out.n_planted < TMASK_T).all()    # ...but not everywhere
    # recall: the robust fit flags the planted anomalies
    assert out.n_hits.sum() >= 0.8 * out.n_planted.sum()
    # precision: false flags are a small minority of clean steps
    false_flags = (out.n_flagged - out.n_hits).sum()
    clean = (TMASK_T * len(out)) - out.n_planted.sum()
    assert false_flags <= 0.2 * clean
