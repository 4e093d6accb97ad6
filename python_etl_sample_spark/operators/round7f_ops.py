"""Round-7 batch 6 — iterative anomaly removal, incremental-ingest
dedup, central-DP release, and theta-sketch set operations:

- ``ts_anomaly_esd``: generalized ESD — 3 unrolled rounds of
  max-|z| detection with removal between rounds, over the
  calendar-bounded daily-revenue series.
- ``dedup_incremental_batch``: the PRODUCTION dedup mode — a new
  ingest batch checked against the existing corpus by content hash
  (hash-join of 32-byte digests, not documents).
- ``anon_dp_geometric_histogram``: ε = ln 3 central-DP count release
  via the truncated two-sided geometric mechanism with an exact
  integer inverse-CDF on a deterministic hash coin — the central
  sibling of anon_ldp_frequency.
- ``sketch_theta_intersection``: theta-sketch set intersection
  (DataSketches' KMV-theta family) between event-type audiences, with
  the exact intersection alongside — mergeable set operations beyond
  sketch_kmv_distinct's single-set estimate.

Determinism: ESD statistics are closed forms of exact cents moments;
the DP noise is pure integer arithmetic on a sha256-derived coin; the
theta estimator is one double division of exact integers, rounded; all
per-round removals tie-break on the day key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_etl_sample_spark.registry import query
from python_etl_sample_spark.sources import table

_OCENTS = "CAST(round(o_totalprice * 100) AS BIGINT)"


# ---------------------------------------------------------------------------
# ts_anomaly_esd
# ---------------------------------------------------------------------------

_ESD_ROUNDS = 3


def _esd_round_sql(prev: str, r: int) -> str:
    """One unrolled ESD round: moments of the surviving frame, the
    max-|z| day (ties by day), and the frame minus that day."""
    return f"""
    m{r} AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(cents) AS DOUBLE) AS s,
             CAST(SUM(CAST(cents AS DECIMAL(38,0)) * cents) AS DOUBLE) AS ss
      FROM {prev}
    ),
    z{r} AS (
      SELECT p.day, p.cents,
             ABS(p.cents - m.s / m.n)
               / sqrt((m.n * m.ss - m.s * m.s) / (m.n * (m.n - 1.0))) AS z
      FROM {prev} p CROSS JOIN m{r} m
    ),
    pick{r} AS (
      SELECT day, cents, z FROM z{r} ORDER BY z DESC, day LIMIT 1
    ),
    d{r} AS (
      SELECT p.day, p.cents FROM {prev} p
      WHERE p.day <> (SELECT day FROM pick{r})
    )"""


@query(
    "ts_anomaly_esd",
    oracle=f"""
    WITH d0 AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             SUM({_OCENTS}) AS cents
      FROM orders GROUP BY 1
    ),
    {",".join(_esd_round_sql(f"d{r - 1}", r) for r in range(1, _ESD_ROUNDS + 1))}
    SELECT * FROM (
      SELECT 1 AS round_no, CAST(day AS TIMESTAMP) AS day,
             round(cents / 100.0, 2) AS revenue, round(z, 6) AS z
      FROM pick1
      UNION ALL
      SELECT 2, CAST(day AS TIMESTAMP), round(cents / 100.0, 2), round(z, 6)
      FROM pick2
      UNION ALL
      SELECT 3, CAST(day AS TIMESTAMP), round(cents / 100.0, 2), round(z, 6)
      FROM pick3
    )
    """,
)
def ts_anomaly_esd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generalized ESD anomaly extraction on daily revenue: three
    unrolled rounds of (recompute mean/std on the surviving series →
    take the max-|z| day, ties by day → remove it) — the iterative
    estimator that finds masked outliers a single z-pass misses
    (stats_zscore_outliers is the one-shot sibling; after one extreme
    day inflates σ, round two sees what it hid).

    Determinism: each round's mean and sample variance are closed
    forms of exact integer cents moments (38-digit decimal for the
    square sum), so z is a deterministic double expression; the argmax
    is an ORDER BY (z DESC, day) LIMIT 1 total order.

    Scale: the frame is CALENDAR-bounded daily revenue; each round is
    a 1-row moment reduction + a TakeOrdered(1) + one filter — three
    rounds of constant-size work after the single orders groupBy."""
    o = table(spark, sf_dir, "orders")
    # persist the calendar-bounded daily frame (~2.4k rows): the three
    # unrolled rounds reference it along 2 branches each (moments +
    # anti-join), so without a materialization barrier the orders
    # scan + groupBy re-evaluates once per branch — the r14 plan audit
    # counted 39 exchanges for what is one data-sized aggregation
    # (guide §2.1: remove repeated shuffles of the same frame)
    cur = (
        o.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.sum(F.expr(_OCENTS)).alias("cents"))
        .persist()
    )
    picks = []
    for r in range(1, _ESD_ROUNDS + 1):
        m = cur.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").cast("double").alias("s"),
            F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents"))
            .cast("double")
            .alias("ss"),
        )
        z = (
            F.abs(F.col("cents") - F.col("s") / F.col("n"))
            / F.sqrt(
                (F.col("n") * F.col("ss") - F.col("s") * F.col("s"))
                / (F.col("n") * (F.col("n") - 1.0))
            )
        )
        zed = cur.crossJoin(F.broadcast(m)).select("day", "cents", z.alias("z"))
        # each pick (1 row) and survivor frame feeds every later round
        # along multiple branches — pin them so round r's work is one
        # moment pass + one TakeOrdered over the cached survivors, not
        # a re-evaluation of the whole prior-round cascade
        pick = zed.orderBy(F.desc("z"), F.asc("day")).limit(1).persist()
        picks.append(
            pick.select(
                F.lit(r).alias("round_no"),
                F.col("day").cast("timestamp_ntz").alias("day"),
                F.round(F.col("cents") / 100.0, 2).alias("revenue"),
                F.round("z", 6).alias("z"),
            )
        )
        cur = cur.join(
            F.broadcast(pick.select(F.col("day").alias("bad"))),
            cur.day == F.col("bad"),
            "left_anti",
        ).persist()
    out = picks[0]
    for p in picks[1:]:
        out = out.unionAll(p)
    return out


# ---------------------------------------------------------------------------
# dedup_incremental_batch
# ---------------------------------------------------------------------------

@query(
    "dedup_incremental_batch",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, sha256(lower(trim(text))) AS ch FROM documents
      WHERE doc_id % 5 <> 0
    ),
    batch AS (
      SELECT doc_id, lang, sha256(lower(trim(text))) AS ch FROM documents
      WHERE doc_id % 5 = 0
    ),
    hit AS (
      SELECT b.doc_id, MIN(c.doc_id) AS dup_of
      FROM batch b JOIN corpus c ON c.ch = b.ch
      GROUP BY b.doc_id
    )
    SELECT b.doc_id, b.lang,
           CAST(h.doc_id IS NOT NULL AS INT) AS is_dup,
           h.dup_of
    FROM batch b LEFT JOIN hit h ON h.doc_id = b.doc_id
    """,
)
def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup — the mode a production corpus actually
    runs (dedup_exact is the full-corpus backfill): a new batch (docs
    with doc_id % 5 = 0, standing in for today's crawl) is checked
    against the EXISTING corpus by content hash; each batch doc gets an
    is_dup flag and the smallest matching corpus doc id.

    Scale: both sides reduce to 32-byte sha256 digests before the
    equi-join — the join shuffles hashes, never documents, and the
    corpus side of a real deployment is a pre-computed hash index read
    from storage, so the daily cost is |batch| hashing + one hash
    join. MIN(dup_of) makes the attribution deterministic under
    many-to-many hash matches."""
    d = table(spark, sf_dir, "documents")
    hashed = d.select(
        "doc_id", "lang", F.sha2(F.lower(F.trim(F.col("text"))), 256).alias("ch")
    )
    corpus = hashed.filter(F.col("doc_id") % 5 != 0).select(
        F.col("doc_id").alias("cid"), "ch"
    )
    batch = hashed.filter(F.col("doc_id") % 5 == 0)
    hit = (
        batch.join(corpus, "ch")
        .groupBy("doc_id")
        .agg(F.min("cid").alias("dup_of"))
    )
    return (
        batch.join(hit, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            F.col("dup_of").isNotNull().cast("int").alias("is_dup"),
            "dup_of",
        )
    )


# ---------------------------------------------------------------------------
# anon_dp_geometric_histogram
# ---------------------------------------------------------------------------

#: ε = ln 3 ⇒ α = e^−ε = 1/3; the truncated (|k| ≤ 3) two-sided
#: geometric puts mass {27, 9, 9, 3, 3, 1, 1}/54 on {0, ±1, ±2, ±3}
#: (the untruncated tail's 1/54 folds into k = 0 — documented bias,
#: standard for bounded-noise count release). Thresholds are exact
#: 54ths, so the coin comparison is pure integer arithmetic.
_DP_M = 1000003


@query(
    "anon_dp_geometric_histogram",
    oracle=f"""
    WITH tru AS (
      SELECT event_type, COUNT(*) AS true_n FROM events GROUP BY event_type
    ),
    coin AS (
      SELECT event_type, true_n,
             CAST(('0x' || substr(sha256(event_type), 1, 12)) AS BIGINT)
               % {_DP_M} AS u
      FROM tru
    ),
    noised AS (
      SELECT event_type, true_n,
             CASE WHEN 54 * u < 28 * {_DP_M} THEN 0
                  WHEN 54 * u < 37 * {_DP_M} THEN 1
                  WHEN 54 * u < 46 * {_DP_M} THEN -1
                  WHEN 54 * u < 49 * {_DP_M} THEN 2
                  WHEN 54 * u < 52 * {_DP_M} THEN -2
                  WHEN 54 * u < 53 * {_DP_M} THEN 3
                  ELSE -3 END AS noise_k
      FROM coin
    )
    SELECT event_type, true_n, noise_k,
           GREATEST(true_n + noise_k, 0) AS released_n
    FROM noised
    """,
)
def anon_dp_geometric_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Central-DP histogram release at ε = ln 3: per-event-type counts
    plus truncated two-sided geometric noise (the discrete Laplace a
    count release actually uses — integer noise for integer counts),
    clamped at zero. The companion of anon_ldp_frequency from the
    trusted-curator side of the privacy spectrum.

    The noise draw is an exact integer inverse-CDF: the mechanism's
    probabilities at α = 1/3 truncated to |k| ≤ 3 are exact 54ths
    ({{27+1, 9, 9, 3, 3, 1, 1}}/54 with the tail folded into k = 0), so
    ``54·u < c·M`` comparisons on a sha256-derived coin decide the draw
    with no float anywhere. Deterministic across engines and runs —
    the release is replayable, which is what makes it hash-checkable
    (a production system would swap the coin for a sealed RNG; the
    MECHANISM — sensitivity-1 counts + geometric noise + clamp — is
    what this operator demonstrates).

    Scale: one map-side-combined groupBy to |event_types| rows; the
    noise is per-CATEGORY, so everything after the count is constant
    work."""
    ev = table(spark, sf_dir, "events")
    tru = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("true_n"))
    u = (
        F.conv(F.substring(F.sha2(F.col("event_type"), 256), 1, 12), 16, 10)
        .cast("bigint")
        % _DP_M
    )
    m = _DP_M
    noise = (
        F.when(54 * u < 28 * m, 0)
        .when(54 * u < 37 * m, 1)
        .when(54 * u < 46 * m, -1)
        .when(54 * u < 49 * m, 2)
        .when(54 * u < 52 * m, -2)
        .when(54 * u < 53 * m, 3)
        .otherwise(-3)
    )
    return tru.select(
        "event_type",
        "true_n",
        noise.alias("noise_k"),
        F.greatest(F.col("true_n") + noise, F.lit(0)).alias("released_n"),
    )


# ---------------------------------------------------------------------------
# sketch_theta_intersection
# ---------------------------------------------------------------------------

_TH_K = 64
_TH_SPACE = float(1 << 48)


@query(
    "sketch_theta_intersection",
    oracle=f"""
    WITH hv AS (
      SELECT DISTINCT event_type,
             user_id,
             CAST(('0x' || substr(sha256(CAST(user_id AS VARCHAR)), 1, 12))
                  AS BIGINT) AS h
      FROM events
    ),
    ranked AS (
      SELECT event_type, h,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS r
      FROM hv
    ),
    theta AS (
      -- unsaturated sketches (< k hashes) keep theta = full space:
      -- the estimate degrades to the exact sample intersection
      SELECT event_type,
             COALESCE(MAX(CASE WHEN r = {_TH_K} THEN h END),
                      CAST({_TH_SPACE!r} AS BIGINT)) AS th
      FROM ranked GROUP BY event_type
    ),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             LEAST(ta.th, tb.th) AS theta_ab
      FROM (SELECT DISTINCT event_type FROM events) a
      JOIN (SELECT DISTINCT event_type FROM events) b
        ON a.event_type < b.event_type
      JOIN theta ta ON ta.event_type = a.event_type
      JOIN theta tb ON tb.event_type = b.event_type
    ),
    inter_sample AS (
      SELECT p.type_a, p.type_b, p.theta_ab, COUNT(*) AS n_below
      FROM pairs p
      JOIN hv x ON x.event_type = p.type_a AND x.h < p.theta_ab
      JOIN hv y ON y.event_type = p.type_b AND y.h = x.h
      GROUP BY p.type_a, p.type_b, p.theta_ab
    ),
    exact AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             COUNT(DISTINCT a.user_id) AS n_exact
      FROM (SELECT DISTINCT event_type, user_id FROM events) a
      JOIN (SELECT DISTINCT event_type, user_id FROM events) b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT e.type_a, e.type_b, e.n_exact,
           COALESCE(i.n_below, 0) AS n_sample,
           round(COALESCE(i.n_below, 0) * {_TH_SPACE!r} / i.theta_ab, 6)
             AS theta_est
    FROM exact e
    LEFT JOIN inter_sample i
      ON i.type_a = e.type_a AND i.type_b = e.type_b
    """,
)
def sketch_theta_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch audience intersection (the DataSketches KMV-theta
    family): per event type keep the {_TH_K} smallest 48-bit user
    hashes; for each type pair, θ_AB = min(θ_A, θ_B) and the
    intersection estimate is |{{h < θ_AB in both samples}}| · 2⁴⁸ / θ_AB
    — SET OPERATIONS on mergeable sketches, which the single-set
    sketch_kmv_distinct cannot express. Exact intersection counts ride
    along so the estimator's error is inspectable at fixture scale.

    Determinism: the hash family is the audited sha256-prefix bigint;
    θ and the sample membership are exact integers; the estimate is one
    double division, rounded 6 dp.

    Scale: sketches are (type, 64 hashes) — constant per type; the
    pair expansion is |types|² rows of constants; only the EXACT
    baseline (fixture-scale instrumentation) touches the full
    (type, user) frame, and a production deployment drops it — the
    sketch path never rescans raw events after the one dedup-shuffle."""
    from python_etl_sample_spark.operators.round6b_ops import _spark_hexhash

    ev = table(spark, sf_dir, "events")
    # r14 (guide §2.3): dedup (type, user) FIRST, hash after — the
    # sha256 family runs once per distinct pair instead of once per
    # event, and the same distinct subtree feeds hv AND the exact
    # baseline's du below (runtime exchange reuse scans events once).
    # Identical rows: h is a pure function of user_id, so distinct
    # before or after hashing is the same set.
    du = ev.select("event_type", "user_id").distinct()
    hv = du.select(
        "event_type", "user_id", _spark_hexhash(F.col("user_id"), 12).alias("h")
    )
    w = Window.partitionBy("event_type").orderBy("h")
    theta = (
        hv.select("event_type", "h", F.row_number().over(w).alias("r"))
        .groupBy("event_type")
        .agg(
            F.coalesce(
                F.max(F.when(F.col("r") == _TH_K, F.col("h"))),
                F.lit(int(_TH_SPACE)).cast("bigint"),
            ).alias("th")
        )
    )
    types = ev.select("event_type").distinct()
    pairs = (
        types.select(F.col("event_type").alias("type_a"))
        .join(
            types.select(F.col("event_type").alias("type_b")),
            F.col("type_a") < F.col("type_b"),
        )
        .join(
            F.broadcast(theta.select(F.col("event_type").alias("type_a"),
                                     F.col("th").alias("th_a"))),
            "type_a",
        )
        .join(
            F.broadcast(theta.select(F.col("event_type").alias("type_b"),
                                     F.col("th").alias("th_b"))),
            "type_b",
        )
        .select(
            "type_a", "type_b", F.least("th_a", "th_b").alias("theta_ab")
        )
    )
    xa = hv.select(F.col("event_type").alias("type_a"), "h")
    xb = hv.select(F.col("event_type").alias("type_b"), "h")
    inter_sample = (
        pairs.join(xa, "type_a")
        .filter(F.col("h") < F.col("theta_ab"))
        .join(xb, ["type_b", "h"])
        .groupBy("type_a", "type_b", "theta_ab")
        .agg(F.count(F.lit(1)).alias("n_below"))
    )
    exact = (
        du.select(F.col("event_type").alias("type_a"), "user_id")
        .join(
            du.select(F.col("event_type").alias("type_b"), "user_id"),
            "user_id",
        )
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count_distinct("user_id").alias("n_exact"))
    )
    return (
        exact.join(inter_sample, ["type_a", "type_b"], "left")
        .select(
            "type_a",
            "type_b",
            "n_exact",
            F.coalesce("n_below", F.lit(0)).alias("n_sample"),
            F.round(
                F.coalesce("n_below", F.lit(0)) * _TH_SPACE / F.col("theta_ab"),
                6,
            ).alias("theta_est"),
        )
    )
