"""Round-7 batch 12 — conformal intervals, embedding outlier scoring,
behavioral burstiness, and rolling regression:

- ``ml_conformal_interval``: split-conformal prediction intervals per
  order-priority group (α=0.1) — the distribution-free uncertainty
  calibration modern ML serving uses, with the residual quantile made
  EXACT by working on |n·y − Σy| integers.
- ``embedding_knn_outlier``: mean cosine distance to the 5 nearest
  neighbors, top-50 most isolated vectors — the kNN-distance outlier
  score corpus curation uses to surface mis-embedded / off-manifold
  documents before they poison clustering and dedup.
- ``events_burstiness``: per-event-type interarrival statistics with
  the Goh-Barabási burstiness index B = (σ−μ)/(σ+μ) and CV — tells
  Poisson-like traffic (B≈0) from bursty machine/retry traffic (B→1),
  the first-pass behavioral signature on an event stream.
- ``ts_rolling_regression``: exact 7-day rolling OLS slope of daily
  revenue — the local-trend detector that complements the global
  Theil-Sen slope, with every rolling moment an exact integer.

Determinism: conformal ranks order exact integers; kNN distances are
9-dp-rounded block-GEMM cosines merged by value; burstiness moments
are exact integer-microsecond sums; rolling-regression slopes are one
division of exact decimal window sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_etl_sample_spark.operators.similarity import (
    _dot_sql,
    _self_grid,
    _unpack,
)
from python_etl_sample_spark.registry import query
from python_etl_sample_spark.sources import table

_PCENTS = "CAST(round(o_totalprice * 100) AS BIGINT)"
_VCENTS = "CAST(round(value * 100) AS BIGINT)"
_DEC38 = "decimal(38,0)"


# ---------------------------------------------------------------------------
# ml_conformal_interval
# ---------------------------------------------------------------------------

_CONF_ALPHA = "0.1"


@query(
    "ml_conformal_interval",
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey, o_orderpriority AS grp, {_PCENTS} AS cents
      FROM orders
    ),
    g AS (
      SELECT grp, COUNT(*) AS n_g,
             SUM(CAST(cents AS DECIMAL(38,0))) AS s_g
      FROM base GROUP BY grp
    ),
    res AS (
      SELECT b.grp, g.n_g, g.s_g,
             ABS(CAST(b.cents AS DECIMAL(38,0)) * g.n_g - g.s_g) AS r2,
             ROW_NUMBER() OVER (
               PARTITION BY b.grp
               ORDER BY ABS(CAST(b.cents AS DECIMAL(38,0)) * g.n_g - g.s_g),
                        b.o_orderkey) AS rn
      FROM base b JOIN g ON g.grp = b.grp
    ),
    q AS (
      SELECT grp, MAX(n_g) AS n_g, MAX(s_g) AS s_g,
             MAX(CASE WHEN rn = CAST(ceil((n_g + 1)
                                          * (1.0 - {_CONF_ALPHA}))
                                     AS BIGINT)
                      THEN r2 END) AS r2_hat
      FROM res GROUP BY grp
    ),
    cov AS (
      SELECT r.grp, SUM(CASE WHEN r.r2 <= q.r2_hat THEN 1 ELSE 0 END)
               AS n_covered
      FROM res r JOIN q ON q.grp = r.grp
      GROUP BY r.grp
    )
    SELECT q.grp AS priority, CAST(q.n_g AS BIGINT) AS n_rows,
           round(CAST(q.s_g AS DOUBLE) / q.n_g / 100.0, 6) AS point_pred,
           round(CAST(q.r2_hat AS DOUBLE) / q.n_g / 100.0, 6) AS q_hat,
           round(CAST(cov.n_covered AS DOUBLE) / q.n_g, 6) AS coverage
    FROM q JOIN cov ON cov.grp = q.grp
    """,
)
def ml_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals (α = 0.1) for order value
    per priority group: the point prediction is the group mean, the
    interval half-width q̂ is the ⌈(n+1)(1−α)⌉-th smallest absolute
    residual (the conformal quantile that guarantees ≥ 90% marginal
    coverage, Vovk/Angelopoulos), and the empirical coverage of
    mean ± q̂ is reported as the audit column. Distribution-free — the
    uncertainty layer a serving stack wraps around ANY point model.

    Exactness trick: rank |y − ȳ_g| by the integer |n_g·y − Σ_g|
    (multiplying through by n_g preserves the within-group order and
    keeps every compared quantity an exact integer — no float
    ordering anywhere); q̂ divides that integer once at the end.

    Scale: group stats are one groupBy to k rows; the residual rank
    is a window PARTITIONED by group (parallel across groups — the
    same shuffle any grouped rank pays); coverage is a second k-row
    aggregate. At 100 TB with many groups this is two shuffles on the
    group key, nothing global."""
    o = table(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        F.col("o_orderpriority").alias("grp"),
        F.expr(_PCENTS).alias("cents"),
    )
    g = base.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum(F.col("cents").cast(_DEC38)).alias("s_g"),
    )
    r2 = F.abs(F.col("cents").cast(_DEC38) * F.col("n_g") - F.col("s_g"))
    wr = Window.partitionBy("grp").orderBy(
        F.abs(F.col("cents").cast(_DEC38) * F.col("n_g") - F.col("s_g")),
        F.col("o_orderkey"),
    )
    res = base.join(F.broadcast(g), "grp").select(
        "grp",
        "n_g",
        "s_g",
        r2.alias("r2"),
        F.row_number().over(wr).alias("rn"),
    )
    alpha = float(_CONF_ALPHA)
    qrank = F.ceil((F.col("n_g") + 1) * (1.0 - alpha)).cast("bigint")
    q = res.groupBy("grp").agg(
        F.max("n_g").alias("n_g"),
        F.max("s_g").alias("s_g"),
        F.max(F.when(F.col("rn") == qrank, F.col("r2"))).alias("r2_hat"),
    )
    cov = (
        res.join(q.select("grp", "r2_hat"), "grp")
        .groupBy("grp")
        .agg(
            F.sum(
                F.when(F.col("r2") <= F.col("r2_hat"), 1).otherwise(0)
            ).alias("n_covered")
        )
    )
    return q.join(cov, "grp").select(
        F.col("grp").alias("priority"),
        F.col("n_g").cast("long").alias("n_rows"),
        F.round(F.col("s_g").cast("double") / F.col("n_g") / 100.0, 6).alias(
            "point_pred"
        ),
        F.round(
            F.col("r2_hat").cast("double") / F.col("n_g") / 100.0, 6
        ).alias("q_hat"),
        F.round(F.col("n_covered").cast("double") / F.col("n_g"), 6).alias(
            "coverage"
        ),
    )


# ---------------------------------------------------------------------------
# embedding_knn_outlier
# ---------------------------------------------------------------------------

_KNN_K = 5
_OUT_TOPK = 50


@query(
    "embedding_knn_outlier",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding,
             sqrt({_dot_sql('embedding', 'embedding')}) AS nrm
      FROM embeddings
    ),
    p AS (
      SELECT a.vec_id,
             round({_dot_sql('a.embedding', 'b.embedding')}
                   / (a.nrm * b.nrm), 9) AS sim,
             b.vec_id AS other_id
      FROM v a JOIN v b ON a.vec_id <> b.vec_id
    ),
    t AS (
      SELECT vec_id, sim,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY sim DESC, other_id) AS rn
      FROM p
    ),
    k AS (
      SELECT vec_id,
             round(1.0 - CAST(SUM(CAST(sim AS DECIMAL(28,12))) AS DOUBLE)
                         / COUNT(*), 6) AS knn_mean_dist
      FROM t WHERE rn <= {_KNN_K} GROUP BY vec_id
    )
    SELECT vec_id, knn_mean_dist, CAST(rnk AS BIGINT) AS rnk
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY knn_mean_dist DESC, vec_id)
                    AS rnk
          FROM k)
    WHERE rnk <= {_OUT_TOPK}
    """,
)
def embedding_knn_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN-distance outlier score over the embedding corpus: for each
    vector, the mean cosine distance to its 5 nearest neighbors; the
    top-50 most isolated vectors are reported. The standard
    density-based outlier screen a curation pipeline runs on
    embeddings — off-manifold vectors (encoding failures, garbage
    docs, adversarial content) have no close neighbors and float to
    the top, BEFORE they distort k-means centroids or semantic-dedup
    thresholds.

    Plan: the same block-partitioned GEMM grid as the exact cosine
    family (similarity.py — one shuffle to pack blocks, the nb² cell
    grid via equi-join, NumPy GEMM per cell, no cartesian): each cell
    emits its per-vector top-5 block-local sims (k·nb rows per
    vector, constant), and one groupBy merges block-local top-5s into
    the global top-5 — valid because the global top-k is contained in
    the union of per-block top-ks. At 100 TB the ANN tier
    (sim_ann_lsh / IVF) replaces the exact grid; this operator is the
    exact reference the ANN recall is measured against.

    Determinism: sims are 9-dp-rounded doubles from index-ordered
    dot products; the top-5 MEAN is tie-independent (boundary ties
    share the same sim value, so the sum over any 5 tied choices is
    equal); the final rank breaks ties on vec_id."""
    import numpy as np
    import pandas as pd

    grid = _self_grid(spark, sf_dir)
    k = _KNN_K

    def block_topk(batches):
        for pdf in batches:
            for qcell, ccell in zip(pdf["qrows"], pdf["crows"]):
                q_ids, q_mat, q_norms = _unpack(qcell)
                c_ids, c_mat, c_norms = _unpack(ccell)
                sims = np.round(
                    (q_mat @ c_mat.T) / np.outer(q_norms, c_norms), 9
                )
                sims[q_ids[:, None] == c_ids[None, :]] = -2.0  # mask self
                kk = min(k, sims.shape[1])
                idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
                rows = np.repeat(q_ids, kk)
                vals = np.take_along_axis(sims, idx, axis=1).ravel()
                keep = vals > -2.0
                if keep.any():
                    yield pd.DataFrame(
                        {"vec_id": rows[keep], "sim": vals[keep]}
                    )

    block_hits = grid.mapInPandas(block_topk, "vec_id bigint, sim double")
    topk = block_hits.groupBy("vec_id").agg(
        F.slice(
            F.sort_array(F.collect_list("sim"), asc=False), 1, k
        ).alias("top")
    )
    scored = topk.select(
        "vec_id",
        F.round(
            1.0
            - F.aggregate(
                F.col("top"),
                F.lit(0).cast("decimal(28,12)"),
                lambda acc, x: (acc + x.cast("decimal(28,12)")).cast(
                    "decimal(28,12)"
                ),
            ).cast("double")
            / F.size("top"),
            6,
        ).alias("knn_mean_dist"),
    )
    top = scored.orderBy(
        F.desc("knn_mean_dist"), F.asc("vec_id")
    ).limit(_OUT_TOPK)
    # bounded-window: ranking the LIMIT-50 frame (query constant).
    w = Window.orderBy(F.desc("knn_mean_dist"), F.asc("vec_id"))
    return top.select(
        "vec_id",
        "knn_mean_dist",
        F.row_number().over(w).cast("long").alias("rnk"),
    )


# ---------------------------------------------------------------------------
# events_burstiness
# ---------------------------------------------------------------------------


@query(
    "events_burstiness",
    oracle="""
    WITH seq AS (
      SELECT event_type,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY event_type ORDER BY ts, event_id) AS gap
      FROM events
    ),
    g AS (SELECT event_type, gap FROM seq WHERE gap IS NOT NULL),
    m AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(gap AS DECIMAL(38,0))) AS DOUBLE) AS s,
             CAST(SUM(CAST(gap AS DECIMAL(38,0)) * gap) AS DOUBLE) AS ssq
      FROM g GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_gaps,
           round((s / n) / 1000000.0, 6) AS mean_gap_sec,
           round(sqrt(GREATEST((ssq - s * (s / n)) / n, 0)) / (s / n), 6) AS cv,
           round((sqrt(GREATEST((ssq - s * (s / n)) / n, 0)) - (s / n))
                 / (sqrt(GREATEST((ssq - s * (s / n)) / n, 0)) + (s / n)), 6)
             AS burstiness
    FROM m WHERE n >= 2 AND s > 0
    """,
)
def events_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interarrival-time signature per event type: gap count, mean gap,
    coefficient of variation σ/μ, and the Goh-Barabási burstiness
    index B = (σ−μ)/(σ+μ) ∈ (−1, 1). A memoryless Poisson stream has
    CV ≈ 1 and B ≈ 0; periodic heartbeats push B → −1; human/bursty
    retry traffic pushes B → +1. The behavioral fingerprint run before
    any rate-based alerting — it tells which event types even HAVE a
    stable rate (and is the diagnostic behind the sessionize gap
    threshold).

    Scale: one window PARTITIONED by event type (the per-entity
    sequence shuffle), then a per-type aggregate with map-side
    combine — two shuffles on the type key, nothing global.

    Determinism: gaps are exact integer microseconds (epoch_us on
    both engines) under the total (ts, event_id) order; all moments
    are exact decimal sums cast to double once; σ, CV, and B combine
    them with mirrored parenthesization, rounded at 6 dp."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    seq = ev.select(
        "event_type", (us - F.lag(us).over(w)).alias("gap")
    ).filter(F.col("gap").isNotNull())
    gd = F.col("gap").cast(_DEC38)
    m = seq.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(gd).cast("double").alias("s"),
        F.sum(gd * F.col("gap")).cast("double").alias("ssq"),
    )
    mu = F.col("s") / F.col("n")
    # GREATEST-guard (ADVICE r7): near-constant series can round the
    # variance to a tiny negative; DuckDB sqrt raises where Spark NaNs
    sig = F.sqrt(
        F.greatest((F.col("ssq") - F.col("s") * mu) / F.col("n"), F.lit(0.0))
    )
    return m.filter((F.col("n") >= 2) & (F.col("s") > 0)).select(
        "event_type",
        F.col("n").cast("long").alias("n_gaps"),
        F.round(mu / 1000000.0, 6).alias("mean_gap_sec"),
        F.round(sig / mu, 6).alias("cv"),
        F.round((sig - mu) / (sig + mu), 6).alias("burstiness"),
    )


# ---------------------------------------------------------------------------
# ts_rolling_regression
# ---------------------------------------------------------------------------

_ROLL_W = 7


@query(
    "ts_rolling_regression",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
             SUM({_VCENTS}) AS y
      FROM events GROUP BY 1, 2
    ),
    w AS (
      SELECT day,
             COUNT(*) OVER win AS k,
             SUM(CAST(x AS DECIMAL(38,0))) OVER win AS sx,
             SUM(CAST(y AS DECIMAL(38,0))) OVER win AS sy,
             SUM(CAST(x AS DECIMAL(38,0)) * x) OVER win AS sxx,
             SUM(CAST(x AS DECIMAL(38,0)) * y) OVER win AS sxy
      FROM daily
      WINDOW win AS (ORDER BY day
                     ROWS BETWEEN {_ROLL_W - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT CAST(day AS TIMESTAMP) AS day,
           round(CAST({_ROLL_W} * sxy - sx * sy AS DOUBLE)
                 / CAST({_ROLL_W} * sxx - sx * sx AS DOUBLE) / 100.0, 6)
             AS slope_per_day
    FROM w WHERE k = {_ROLL_W}
    """,
)
def ts_rolling_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 7-day rolling OLS slope of daily revenue (currency units
    per day): for each day with a full 7-row trailing window, the
    closed-form slope (kΣxy − ΣxΣy)/(kΣx² − (Σx)²) over (epoch-day,
    revenue) pairs. The LOCAL trend detector — the global Theil-Sen
    (stats_theil_sen_trend) gives one robust slope for the whole
    series; this shows where the trend turns, the signal a
    capacity/alerting pipeline actually consumes.

    Determinism: all four rolling moments are exact integer sums in
    38-digit decimals over the sliding ROWS frame; the slope is ONE
    division of exact integers (k is a constant), rounded at 6 dp.

    Scale: the only data-sized work is the daily rollup groupBy; the
    sliding window runs over the CALENDAR-BOUNDED daily frame (the
    repo's ts_* contract — a century of days is 36.5k rows), with the
    denominator never zero on a full window (7 distinct x values)."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.expr("CAST(ts AS DATE)").alias("day"),
        F.datediff(F.expr("CAST(ts AS DATE)"), F.lit("1970-01-01"))
        .cast("bigint")
        .alias("x"),
    ).agg(F.sum(F.expr(_VCENTS)).alias("y"))
    xd = F.col("x").cast(_DEC38)
    yd = F.col("y").cast(_DEC38)
    # bounded-window: sliding frame over the calendar-bounded daily
    # rollup (≤ tens of thousands of rows for decades of data); the
    # prefix-sum kernel cannot express a trailing ROWS frame.
    win = Window.orderBy("day").rowsBetween(-(_ROLL_W - 1), 0)
    w = daily.select(
        "day",
        F.count(F.lit(1)).over(win).alias("k"),
        F.sum(xd).over(win).alias("sx"),
        F.sum(yd).over(win).alias("sy"),
        F.sum(xd * F.col("x")).over(win).alias("sxx"),
        F.sum(xd * F.col("y")).over(win).alias("sxy"),
    )
    kk = F.lit(_ROLL_W)
    return w.filter(F.col("k") == _ROLL_W).select(
        F.col("day").cast("timestamp_ntz").alias("day"),
        F.round(
            (kk * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / (kk * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
            / 100.0,
            6,
        ).alias("slope_per_day"),
    )
