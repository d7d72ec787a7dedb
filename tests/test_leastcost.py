"""Least-cost-path invariants: the oracle's 48-round relaxation bound
has margin on this corpus, and the optimal node set is sane."""

import numpy as np

from rsgislib_spark.functions import codec
from rsgislib_spark.operators.leastcost import (LCP_ROUNDS, block_costs,
                                                dijkstra_grid,
                                                least_cost_path_stats,
                                                _OFFS)
from rsgislib_spark.queries import _px_images


def _bellman_rounds(c, sy, sx):
    """Rounds of synchronous relaxation until fixpoint (the oracle's
    unroll model); returns (dist, rounds_to_converge)."""
    gh, gw = c.shape
    INF = np.int64(1) << 62
    d = np.full((gh, gw), INF, dtype=np.int64)
    d[sy, sx] = 0
    for r in range(1, 10 * (gh + gw)):
        nd = d.copy()
        for dy, dx, dd in _OFFS:
            ys0, ys1 = max(0, -dy), min(gh, gh - dy)
            xs0, xs1 = max(0, -dx), min(gw, gw - dx)
            src = d[ys0 + dy:ys1 + dy, xs0 + dx:xs1 + dx]
            w = dd * (c[ys0 + dy:ys1 + dy, xs0 + dx:xs1 + dx]
                      + c[ys0:ys1, xs0:xs1])
            cand = np.where(src < INF, src + w, INF)
            nd[ys0:ys1, xs0:xs1] = np.minimum(nd[ys0:ys1, xs0:xs1],
                                              cand)
        if (nd == d).all():
            return d, r - 1
        d = nd
    raise AssertionError("no fixpoint")


def test_relaxation_converges_with_margin(spark, sf_dir):
    pdf = _px_images(spark, sf_dir, mod=53) \
        .select("image_id", "bytes", "w", "h", "fmt").toPandas()
    assert len(pdf) > 0
    worst = 0
    for _, r in pdf.iterrows():
        v = codec.decode_image(bytes(r["bytes"]), int(r.w), int(r.h),
                               str(r.fmt)).astype(np.int64)
        c = block_costs(v)
        gh, gw = c.shape
        ds, k1 = _bellman_rounds(c, 0, 0)
        dt, k2 = _bellman_rounds(c, gh - 1, gw - 1)
        worst = max(worst, k1, k2)
        # synchronous relaxation fixpoint == Dijkstra
        assert (ds == dijkstra_grid(c, 0, 0)).all()
        assert (dt == dijkstra_grid(c, gh - 1, gw - 1)).all()
    # the oracle's unroll count has real margin on this corpus
    assert worst <= LCP_ROUNDS - 8, worst


def test_opt_set_contains_endpoints(spark, sf_dir):
    out = least_cost_path_stats(_px_images(spark, sf_dir, mod=53)) \
        .toPandas()
    assert len(out) > 0
    assert (out.total_cost > 0).all()
    # endpoints always on the optimal set; a path has >= max(gw,gh) nodes
    assert (out.n_opt >= np.maximum(out.gw, out.gh)).all()
    assert (out.n_opt <= out.gw * out.gh).all()
