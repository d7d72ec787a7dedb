"""kNN and radius-count joins on the cell index.

Re-expresses:

* ``match_closest_vec_pts`` (reference: python/rsgislib/vectorutils/
  __init__.py:3359-3473) — 1-NN point->point match.  The reference builds
  the full O(n*m) distance matrix; here the match side is keyed by grid
  cell and each base point probes an expanding square of rings
  (k-ring candidate join -> window-min), doubling the ring radius until
  the best candidate distance is provably smaller than any unexplored
  cell could offer.  Distances are planar euclidean in coordinate units,
  exactly ``calc_pt_distance`` (tools/geometrytools.py:592).  Ties raise,
  as the reference does (vectorutils/__init__.py:3430-3434); output
  columns default to ``x_match / y_match / dist_match`` and ``tolerance``
  filters matches ``dist < tolerance`` (strict, :3464).

* ``calc_npts_in_radius`` (reference: python/rsgislib/vectorattrs/
  __init__.py:997-1049) — per-point count of same-layer points within an
  inclusive radius, minus self (KDTree ``query_ball_point`` semantics).
  Implemented as a cell-ring-bounded self-equi-join: each point explodes
  its (2K+1)^2 neighbour cells (pure Catalyst ``sequence``/``explode``
  with longitude wrap via pmod), joins back on cell, filters
  ``dist <= radius``, aggregates.  No UDF anywhere; the shuffle key is
  the cell, so density hot-spots parallelize across their neighbour
  cells and AQE handles residual skew.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F

from ..geo.cellindex import DEFAULT_RES, _X_SHIFT

__all__ = ["match_closest_points", "npts_in_radius"]


class TieError(RuntimeError):
    """Multiple equally-near matches (the reference raises here too)."""


def _dist(ax, ay, bx, by):
    dx = ax - bx
    dy = ay - by
    return F.sqrt(dx * dx + dy * dy)


def _cell_parts(lon, lat, res: int):
    n = 1 << res
    nx = F.least(F.greatest(F.floor((lon + F.lit(180.0)) / F.lit(360.0)
                                    * F.lit(float(n))), F.lit(0.0)),
                 F.lit(float(n - 1))).cast("long")
    ny = F.least(F.greatest(F.floor((lat + F.lit(90.0)) / F.lit(180.0)
                                    * F.lit(float(n))), F.lit(0.0)),
                 F.lit(float(n - 1))).cast("long")
    return nx, ny


def match_closest_points(
    base: DataFrame,
    match: DataFrame,
    *,
    base_key: str = "qid",
    base_lon: str = "qlon",
    base_lat: str = "qlat",
    match_key: str = "image_id",
    match_lon: str = "lon",
    match_lat: str = "lat",
    res: int = DEFAULT_RES,
    tolerance: float | None = None,
    check_ties: bool = True,
    out_x_col: str = "x_match",
    out_y_col: str = "y_match",
    out_dist_col: str = "dist_match",
) -> DataFrame:
    """Exact 1-NN of every base point into the match layer.

    Iterative doubling: at round i the candidate set is the k_i-ring of
    the base point's cell (k_1 = 1, doubling).  The best candidate at
    distance d is final once ``d < k_i * cell_height_deg`` — every
    unexplored cell (Chebyshev distance > k_i) lies fully beyond that
    bound — or once the ring covers the whole grid.  Each round is a
    hash equi-join on cell; the match side is keyed once and reused.

    Returns ``base`` columns + match coordinates/key/distance.  Raises
    :class:`TieError` when a base point has two equally-near matches.
    """
    n = 1 << res
    cell_h = 180.0 / n

    m_nx, m_ny = _cell_parts(F.col(match_lon), F.col(match_lat), res)
    keyed_match = match.select(
        F.col(match_key).alias("_mkey"),
        F.col(match_lon).alias("_mlon"),
        F.col(match_lat).alias("_mlat"),
        (m_nx * F.lit(_X_SHIFT) + m_ny).alias("_mxy"),
    ).cache()

    b_nx, b_ny = _cell_parts(F.col(base_lon), F.col(base_lat), res)
    pending = base.select(
        F.col(base_key).alias("_bkey"),
        F.col(base_lon).alias("_blon"),
        F.col(base_lat).alias("_blat"),
        b_nx.alias("_bnx"), b_ny.alias("_bny"),
    )

    out_parts = []
    k = 1
    while True:
        probe = (
            pending
            .withColumn("_rx", F.explode(F.sequence(F.col("_bnx") - k,
                                                    F.col("_bnx") + k)))
            .withColumn("_ry", F.explode(F.sequence(F.col("_bny") - k,
                                                    F.col("_bny") + k)))
            .where((F.col("_ry") >= 0) & (F.col("_ry") < n))
            .withColumn("_mxy",
                        F.pmod(F.col("_rx"), F.lit(n)) * F.lit(_X_SHIFT)
                        + F.col("_ry"))
            .drop("_rx", "_ry")
        )
        cand = probe.join(keyed_match, "_mxy", "inner").withColumn(
            "_d", _dist(F.col("_blon"), F.col("_blat"),
                        F.col("_mlon"), F.col("_mlat"))
        )
        w = Window.partitionBy("_bkey")
        best = (
            cand.withColumn("_mind", F.min("_d").over(w))
            .where(F.col("_d") == F.col("_mind"))
            .withColumn("_nbest", F.count(F.lit(1)).over(w))
        )
        # unexplored cells are > k rings away -> any point there is at
        # distance >= k * cell_h; a best below that bound is provably 1-NN.
        done_cond = (F.col("_mind") < F.lit(k * cell_h)) | F.lit(k >= n)
        resolved = best.where(done_cond).cache()

        if check_ties:
            ties = resolved.where(F.col("_nbest") > 1).limit(1).count()
            if ties:
                raise TieError(
                    "Multiple features found - don't know what to do with that!"
                )
        out_parts.append(
            resolved.select("_bkey", "_mkey", "_mlon", "_mlat", "_d")
        )
        pending = pending.join(resolved.select("_bkey"), "_bkey", "left_anti")
        if k >= n or pending.limit(1).count() == 0:
            break
        k *= 2

    matched = out_parts[0]
    for p in out_parts[1:]:
        matched = matched.unionByName(p)
    matched = matched.select(
        F.col("_bkey").alias(base_key),
        F.col("_mkey").alias("match_" + match_key),
        F.col("_mlon").alias(out_x_col),
        F.col("_mlat").alias(out_y_col),
        F.col("_d").alias(out_dist_col),
    )
    out = base.join(matched, base_key, "left")
    if tolerance is not None:
        out = out.where(F.col(out_dist_col) < tolerance)
    return out


def npts_in_radius(
    points: DataFrame,
    radius: float,
    *,
    key: str = "image_id",
    lon: str = "lon",
    lat: str = "lat",
    res: int = DEFAULT_RES,
    out_col: str = "n_pts_r",
) -> DataFrame:
    """Same-layer inclusive radius count minus self (calc_npts_in_radius).

    K = ceil(radius / cell_height) rings bound the search; all arithmetic
    is Catalyst columns (no UDF).  Output = input columns + ``out_col``.
    """
    n = 1 << res
    cell_h = 180.0 / n
    K = max(1, int(math.ceil(radius / cell_h)) + 1)

    p_nx, p_ny = _cell_parts(F.col(lon), F.col(lat), res)
    keyed = points.select(
        F.col(key).alias("_k"), F.col(lon).alias("_lon"),
        F.col(lat).alias("_lat"),
        (p_nx * F.lit(_X_SHIFT) + p_ny).alias("_xy"),
    )
    probe = (
        points.select(
            F.col(key).alias("_bk"), F.col(lon).alias("_blon"),
            F.col(lat).alias("_blat"), p_nx.alias("_bnx"), p_ny.alias("_bny"),
        )
        .withColumn("_rx", F.explode(F.sequence(F.col("_bnx") - K,
                                                F.col("_bnx") + K)))
        .withColumn("_ry", F.explode(F.sequence(F.col("_bny") - K,
                                                F.col("_bny") + K)))
        .where((F.col("_ry") >= 0) & (F.col("_ry") < n))
        .withColumn("_xy", F.pmod(F.col("_rx"), F.lit(n)) * F.lit(_X_SHIFT)
                    + F.col("_ry"))
        .drop("_rx", "_ry", "_bnx", "_bny")
    )
    counts = (
        probe.join(keyed, "_xy", "inner")
        .where(_dist(F.col("_blon"), F.col("_blat"),
                     F.col("_lon"), F.col("_lat")) <= radius)
        .groupBy("_bk")
        .agg((F.count(F.lit(1)) - 1).alias(out_col))
        .withColumnRenamed("_bk", key)
    )
    return points.join(counts, key, "left").fillna({out_col: 0})
