"""kNN and radius-count joins on the cell index.

Re-expresses:

* ``match_closest_vec_pts`` (reference: python/rsgislib/vectorutils/
  __init__.py:3359-3473) — 1-NN point->point match.  The reference builds
  the full O(n*m) distance matrix; here a *density-adaptive two-phase
  plan*: (1) pick a coarse grid resolution where the expected 1-NN
  distance fits inside one cell (cell height ~ 3x the Poisson-expected
  NN distance from the match-layer count), join base->match on the 3x3
  coarse-cell ring (a single hash equi-join; ~tens of candidates per
  base point at any density), and accept a best candidate at distance
  ``d < coarse_cell_height`` — every unexplored cell lies provably
  farther; (2) unresolved stragglers ESCALATE through coarser levels
  (res - 3, res - 6, ...) with the same 3x3-ring invariant, ending at
  a terminal BOUNDED brute force: the doubly-exponentially-shrunk
  straggler set is broadcast against the match table scanned in place
  (a terminal ring join would funnel the same rows through the tiny
  grid's few cell keys — measured hot-task stragglers), so the ladder
  is exact with no unbounded or hot-keyed join anywhere — a
  pathological distribution (heavy clustering + empty oceans) just
  climbs a couple of extra rungs, each a small equi-join over the
  surviving stragglers.  All rungs are lazy — one
  union'd plan, no per-rung driver actions.  Distances are planar
  euclidean in
  coordinate units, exactly ``calc_pt_distance`` (tools/geometrytools.
  py:592).  Ties raise, as the reference does (vectorutils/__init__.py:
  3430-3434); output columns default to ``x_match / y_match /
  dist_match`` and ``tolerance`` filters matches ``dist < tolerance``
  (strict, :3464).

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
from collections import deque

from pyspark.sql import DataFrame, Window, functions as F

from ..geo.cellindex import DEFAULT_RES, _X_SHIFT

__all__ = ["match_closest_points", "knn_classify", "npts_in_radius",
           "release_cached"]


class TieError(RuntimeError):
    """Multiple equally-near matches (the reference raises here too)."""


#: bounded LRU of per-call cached intermediates (ADVICE r2: a long-
#: lived session issuing many kNN calls must not accumulate cached
#: blocks).  Eager unpersist tied to the returned DataFrame's lifetime
#: does NOT work: callers derive `.select(...)` and drop the original,
#: which would release the caches BEFORE the lazy plan executes and
#: trigger full rung-recompute storms (measured 3x slowdowns).  A small
#: LRU keeps the most recent calls' caches hot and evicts older ones —
#: evicted frames are safe to unpersist (Spark just recomputes if some
#: straggler plan still references them).
_CACHE_LRU: deque = deque()
_CACHE_LRU_LIMIT = 6


def _register_cached(frames) -> None:
    _CACHE_LRU.append(list(frames))
    while len(_CACHE_LRU) > _CACHE_LRU_LIMIT:
        for f in _CACHE_LRU.popleft():
            try:
                f.unpersist()
            except Exception:
                pass


def release_cached() -> None:
    """Unpersist every registered kNN intermediate (explicit cleanup)."""
    while _CACHE_LRU:
        for f in _CACHE_LRU.popleft():
            try:
                f.unpersist()
            except Exception:
                pass


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
    match_count: int | None = None,
    out_x_col: str = "x_match",
    out_y_col: str = "y_match",
    out_dist_col: str = "dist_match",
) -> DataFrame:
    """Exact 1-NN of every base point into the match layer.

    Escalation ladder: a 3x3-ring candidate join at a density-chosen
    coarse resolution (a best candidate at ``d < cell_height`` is
    provably the true 1-NN — no unexplored cell can be nearer), then
    the same join at successively coarser levels for the stragglers;
    the terminal level broadcasts the shrunken straggler set against
    the full match table (bounded brute force, evenly spread), so the
    result is exact with no unbounded or hot-keyed join.  Every rung
    is lazy — no driver-side iteration.

    ``match_count`` seeds the density heuristic; pass it when known to
    avoid the one metadata-only ``count()`` action (a wrong value only
    shifts work between rungs, never changes the result).

    Returns ``base`` columns + match coordinates/key/distance.  Raises
    :class:`TieError` when a base point has two equally-near matches
    (skip with ``check_ties=False`` to avoid the validation action).
    """
    # ---- density-adaptive coarse resolution ------------------------------
    # Poisson-expected NN distance ~ 0.5 / sqrt(m / world_area); make the
    # coarse cell ~3x that so the first rung resolves the vast majority.
    if match_count is None:
        match_count = match.count()
    exp_nn = 0.5 / math.sqrt(max(match_count, 1) / (360.0 * 180.0))
    res_c = int(max(1, min(res,
                           math.floor(math.log2(180.0 / (3.0 * exp_nn))))))
    # rung resolutions: res_c, res_c-3, ... (step 3 = 8x cell area per
    # rung, so straggler populations collapse fast), ending at a
    # TERMINAL rung of res <= 3 (grid <= 8x8) whose ring radius is the
    # full grid (K = n-1, deduped) — provably global coverage, at most
    # (2n-1)^2 <= 225 probe cells per surviving straggler.  Typical
    # densities need exactly 2 rungs.
    non_term = list(range(res_c, 3, -3))
    rungs = non_term + [max(non_term[-1] - 3 if non_term else res_c, 0)]

    # key both layers ONCE at the finest rung resolution; every coarser
    # rung's cell id is an exact shiftright (power-of-2 grids nest), so
    # no rung re-derives cells from coordinates or re-scans the inputs.
    # The persisted projections are key + 2 doubles + 2 ints — at
    # extreme scale swap persist() for a re-scan of the pruned columns.
    b_nx, b_ny = _cell_parts(F.col(base_lon), F.col(base_lat), res_c)
    keyed_base = base.select(
        F.col(base_key).alias("_bkey"),
        F.col(base_lon).alias("_blon"),
        F.col(base_lat).alias("_blat"),
        b_nx.alias("_bnx"), b_ny.alias("_bny"),
    ).persist()
    m_nx, m_ny = _cell_parts(F.col(match_lon), F.col(match_lat), res_c)
    keyed_match = match.select(
        F.col(match_key).alias("_mkey"),
        F.col(match_lon).alias("_mlon"),
        F.col(match_lat).alias("_mlat"),
        m_nx.alias("_mnx"), m_ny.alias("_mny"),
    ).persist()

    def _best(cand):
        """Top-1 per base key as a partial-aggregating groupBy.

        Deliberately NOT a window function: a window shuffles every
        candidate of a key to one task and sorts (the megacity hot cell
        makes that a straggler); min/max of ordered structs combine
        map-side, so only one row per (partition, key) crosses the
        shuffle regardless of candidate skew.  Tie detection: the
        smallest and largest match key at the minimum distance differ
        iff >= 2 distinct equally-near matches exist (idempotent, so
        ring-wrap duplicate candidates cannot false-trigger it).
        """
        ag = cand.groupBy("_bkey").agg(
            F.min(F.struct(F.col("_d"), F.col("_mkey"),
                           F.col("_mlon"), F.col("_mlat"))).alias("_a"),
            F.max(F.struct((-F.col("_d")).alias("_nd"),
                           F.col("_mkey").alias("_k"))).alias("_z"),
        )
        return ag.select(
            "_bkey",
            F.col("_a._mkey").alias("_mkey"),
            F.col("_a._mlon").alias("_mlon"),
            F.col("_a._mlat").alias("_mlat"),
            F.col("_a._d").alias("_d"),
            F.col("_a._d").alias("_mind"),
            F.when(F.col("_z._k") != F.col("_a._mkey"), F.lit(2))
            .otherwise(F.lit(1)).alias("_nbest"),
        )

    pending = keyed_base
    resolved_parts = []
    for r in rungs:
        n = 1 << r
        cell_h = 180.0 / n
        terminal = (r == rungs[-1])
        shift = res_c - r

        if terminal:
            # bounded brute force for the stragglers: a terminal ring
            # join would funnel |pending| x |match| rows through the
            # <= 4x4 grid's handful of cell keys (a few hot tasks);
            # broadcast the provably-small side instead and scan the
            # other in place — same row volume, even spread, no
            # shuffle, provably global.  After >= 1 ring rung the
            # straggler set has shrunk doubly-exponentially (broadcast
            # pending); a ladder that STARTS terminal means the match
            # layer itself is tiny (res_c <= 3 ⇔ ~hundreds of points),
            # so broadcast the match side and keep the base in place.
            if len(rungs) > 1:
                cand = keyed_match.crossJoin(F.broadcast(
                    pending.select("_bkey", "_blon", "_blat")))
            else:
                cand = pending.select("_bkey", "_blon", "_blat") \
                    .crossJoin(F.broadcast(keyed_match))
            cand = cand.withColumn(
                "_d", _dist(F.col("_blon"), F.col("_blat"),
                            F.col("_mlon"), F.col("_mlat")))
        else:
            rb_nx = F.shiftright(F.col("_bnx"), shift)
            rb_ny = F.shiftright(F.col("_bny"), shift)
            probe = (
                pending
                .withColumn("_rx",
                            F.explode(F.sequence(rb_nx - 1, rb_nx + 1)))
                .withColumn("_ry",
                            F.explode(F.sequence(rb_ny - 1, rb_ny + 1)))
                .where((F.col("_ry") >= 0) & (F.col("_ry") < n))
                .withColumn("_mxy",
                            F.pmod(F.col("_rx"), F.lit(n)) * F.lit(_X_SHIFT)
                            + F.col("_ry"))
                .drop("_rx", "_ry")
            )
            # (longitude wrap can duplicate ring cells when the ring
            # spans the grid; the duplicated candidates are harmless —
            # _best's min/max aggs are idempotent — so no dedup
            # exchange is spent on them)
            rung_match = keyed_match.withColumn(
                "_mxy",
                F.shiftright(F.col("_mnx"), shift) * F.lit(_X_SHIFT)
                + F.shiftright(F.col("_mny"), shift))
            cand = probe.join(rung_match, "_mxy", "inner").withColumn(
                "_d", _dist(F.col("_blon"), F.col("_blat"),
                            F.col("_mlon"), F.col("_mlat"))
            )
        best = _best(cand)
        # any unexplored cell is >= cell_h away, so a best below that
        # bound is the global 1-NN; the terminal ring explored everything
        resolved = best if terminal else best.where(
            F.col("_mind") < F.lit(cell_h))
        # persist: each rung's result feeds BOTH the final union and the
        # next rung's anti-join — without this the union branch would
        # recompute every earlier rung (O(rungs^2) subplan blowup)
        resolved = resolved.select("_bkey", "_mkey", "_mlon", "_mlat",
                                   "_d", "_nbest").persist()
        resolved_parts.append(resolved)
        if terminal:
            break
        pending = pending.join(resolved.select("_bkey"), "_bkey",
                               "left_anti")

    matched = resolved_parts[0]
    for part in resolved_parts[1:]:
        matched = matched.unionByName(part)

    cached_final = []
    if check_ties:
        # cache only when the tie probe adds a second consumer
        matched = matched.cache()
        cached_final.append(matched)
        if matched.where(F.col("_nbest") > 1).limit(1).count():
            raise TieError(
                "Multiple features found - don't know what to do with that!"
            )
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
    _register_cached([keyed_base, keyed_match, *resolved_parts,
                      *cached_final])
    return out


def knn_classify(
    base: DataFrame,
    match: DataFrame,
    *,
    k: int = 5,
    base_key: str = "qid",
    base_lon: str = "qlon",
    base_lat: str = "qlat",
    match_key: str = "id",
    match_lon: str = "lon",
    match_lat: str = "lat",
    class_col: str = "cls",
    res: int = DEFAULT_RES,
    match_count: int | None = None,
    n_salt: int = 16,
) -> DataFrame:
    """TRUE k-NN majority-vote classifier (``apply_rat_knn``, k > 1).

    Reference: ``apply_rat_knn`` (python/src/rastergis.cpp method
    table) — classify each base point by majority vote of its k nearest
    match points.  The 1-NN escalation ladder generalizes: at each rung
    a base point RESOLVES when its k-th best candidate distance is
    provably inside the explored ring (``d_k < cell_height`` — every
    unexplored cell lies at least one full cell away, so all k true
    nearest neighbours have been seen); stragglers escalate to coarser
    rungs, and the terminal rung probes the whole grid.  No cross join
    and no per-key window sort at any skew: top-k per key is a
    two-level TOURNAMENT — per (key, salt-of-neighbour) partial top-k
    (bounded lists), then a re-aggregation of ≤ ``n_salt`` partials —
    so a megacity cell's candidates spread over ``n_salt`` groups.
    Ring-wrap duplicate candidates are removed by ``array_distinct``
    (identical structs).  Ties: neighbour order is (distance,
    match_key); vote ties pick the smallest class (deterministic, SQL-
    oracle-matching).  Output: (base_key, pred_cls, n_votes).

    ``match_key`` must order identically in Spark and SQL (use a
    numeric key); ``match_count`` as in :func:`match_closest_points`.
    """
    if match_count is None:
        match_count = match.count()
    # coarse rung sized so the first ring holds ~k candidates; ceil
    # (not floor): the next-finer grid quarters the candidate volume
    # and the k-th-NN distance concentrates tighter than the 1-NN, so
    # a ~2.5x cell/exp_nn margin still resolves the vast majority
    # (measured at sf0.1: res 4 -> 2.2M candidates, res 5 -> ~550k)
    exp_nn = 0.5 * math.sqrt(max(k, 1)) / math.sqrt(
        max(match_count, 1) / (360.0 * 180.0))
    res_c = int(max(1, min(res,
                           math.ceil(math.log2(180.0 / (3.0 * exp_nn))))))
    non_term = list(range(res_c, 3, -3))
    rungs = non_term + [max(non_term[-1] - 3 if non_term else res_c, 0)]

    b_nx, b_ny = _cell_parts(F.col(base_lon), F.col(base_lat), res_c)
    keyed_base = base.select(
        F.col(base_key).alias("_bkey"),
        F.col(base_lon).alias("_blon"),
        F.col(base_lat).alias("_blat"),
        b_nx.alias("_bnx"), b_ny.alias("_bny"),
    ).persist()
    m_nx, m_ny = _cell_parts(F.col(match_lon), F.col(match_lat), res_c)
    keyed_match = match.select(
        F.col(match_key).alias("_mkey"),
        F.col(class_col).alias("_cls"),
        F.col(match_lon).alias("_mlon"),
        F.col(match_lat).alias("_mlat"),
        m_nx.alias("_mnx"), m_ny.alias("_mny"),
    ).persist()

    def _topk(cand):
        part = cand.groupBy(
            "_bkey", F.pmod(F.xxhash64(F.col("_mkey")), F.lit(n_salt))
            .alias("_sg")
        ).agg(F.expr(
            f"slice(array_sort(array_distinct("
            f"collect_list(struct(_d, _mkey, _cls)))), 1, {k})"
        ).alias("_p"))
        return part.groupBy("_bkey").agg(F.expr(
            f"slice(array_sort(array_distinct(flatten(collect_list(_p)))),"
            f" 1, {k})"
        ).alias("_t"))

    pending = keyed_base
    resolved_parts = []
    for r in rungs:
        n = 1 << r
        cell_h = 180.0 / n
        terminal = (r == rungs[-1])
        shift = res_c - r

        if terminal:
            # bounded brute force for the stragglers: at the terminal
            # rung the grid is <= 4x4, so a ring join funnels
            # |pending| x |match| rows through a handful of hot cell
            # keys (measured: the whole stage on 2-4 tasks, 8-41 s
            # swings).  Broadcast the provably-small side instead (the
            # doubly-exponentially-shrunk stragglers; or, for a ladder
            # that STARTS terminal — possible only when the match
            # layer is ~hundreds of points — the match side) and scan
            # the other in place: even spread, no shuffle, no hot key.
            if len(rungs) > 1:
                cand = keyed_match.crossJoin(
                    F.broadcast(pending.select("_bkey", "_blon", "_blat")))
            else:
                cand = pending.select("_bkey", "_blon", "_blat") \
                    .crossJoin(F.broadcast(keyed_match))
            cand = cand.withColumn(
                "_d", _dist(F.col("_blon"), F.col("_blat"),
                            F.col("_mlon"), F.col("_mlat")))
        else:
            rb_nx = F.shiftright(F.col("_bnx"), shift)
            rb_ny = F.shiftright(F.col("_bny"), shift)
            probe = (
                pending
                .withColumn("_rx",
                            F.explode(F.sequence(rb_nx - 1, rb_nx + 1)))
                .withColumn("_ry",
                            F.explode(F.sequence(rb_ny - 1, rb_ny + 1)))
                .where((F.col("_ry") >= 0) & (F.col("_ry") < n))
                .withColumn("_mxy",
                            F.pmod(F.col("_rx"), F.lit(n)) * F.lit(_X_SHIFT)
                            + F.col("_ry"))
                .drop("_rx", "_ry")
            )
            rung_match = keyed_match.withColumn(
                "_mxy",
                F.shiftright(F.col("_mnx"), shift) * F.lit(_X_SHIFT)
                + F.shiftright(F.col("_mny"), shift))
            cand = probe.join(rung_match, "_mxy", "inner").withColumn(
                "_d", _dist(F.col("_blon"), F.col("_blat"),
                            F.col("_mlon"), F.col("_mlat")))
        top = _topk(cand)
        resolved = top if terminal else top.where(
            (F.size("_t") >= k)
            & (F.element_at("_t", k)["_d"] < F.lit(cell_h)))
        resolved = resolved.persist()
        resolved_parts.append(resolved)
        if terminal:
            break
        pending = pending.join(resolved.select("_bkey"), "_bkey",
                               "left_anti")

    topk = resolved_parts[0]
    for part in resolved_parts[1:]:
        topk = topk.unionByName(part)

    votes = (
        topk.select("_bkey", F.explode("_t").alias("_nb"))
        .groupBy("_bkey", F.col("_nb._cls").alias("_c"))
        .agg(F.count(F.lit(1)).alias("_n"))
        .groupBy("_bkey")
        .agg(F.max(F.struct(F.col("_n"), (-F.col("_c")).alias("_negc")))
             .alias("_w"))
        .select(F.col("_bkey").alias(base_key),
                (-F.col("_w._negc")).alias("pred_cls"),
                F.col("_w._n").alias("n_votes"))
    )
    _register_cached([keyed_base, keyed_match, *resolved_parts])
    return votes


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
