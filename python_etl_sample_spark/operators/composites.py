"""Composite warehouse patterns round 4: QUALIFY-style latest-row
dedup, existence-flag enrichment, deterministic A/B lift, chi-square
independence, half-life EWMA, vocabulary coverage, URL parsing, and
calendar bucketing.

Each is a pattern users reach for daily in warehouse SQL, expressed as
the Spark plan that survives scale — window dedup instead of
self-joins, conditional aggregates instead of repeated scans, exact
integer/decimal sums wherever a float would make the answer
partition-order-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_etl_sample_spark.functions.determinism import dsum, dsum_sql
from python_etl_sample_spark.functions.total_order import attach_global_order
from python_etl_sample_spark.registry import query
from python_etl_sample_spark.sources import table


@query(
    "win_qualify_latest",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC)
               AS rn
      FROM orders
    )
    SELECT o_custkey, o_orderkey AS latest_orderkey,
           o_orderdate AS latest_orderdate, o_totalprice AS latest_totalprice
    FROM ranked WHERE rn = 1
    """,
)
def win_qualify_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-row-per-key dedup — the QUALIFY ROW_NUMBER() = 1 idiom —
    keeping each customer's most recent order ((date, key) DESC makes
    same-day ties deterministic). This is CDC compaction, "current
    state" views, and dedup-by-recency in one shape.

    Scale: one shuffle on the key, one in-partition sort, rows stream
    through the rank filter with no buffering beyond the sort — strictly
    better than the max-date self-join rewrite, which shuffles twice and
    breaks on ties."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("latest_orderkey"),
            F.col("o_orderdate").alias("latest_orderdate"),
            F.col("o_totalprice").alias("latest_totalprice"),
        )
    )


@query(
    "join_existence_flags",
    oracle="""
    WITH flags AS (
      SELECT c.c_custkey, c.c_mktsegment,
             CASE WHEN EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_custkey = c.c_custkey)
                  THEN 1 ELSE 0 END AS has_orders,
             CASE WHEN EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_custkey = c.c_custkey
                                AND o.o_orderpriority = '1-URGENT')
                  THEN 1 ELSE 0 END AS has_urgent
      FROM customer c
    )
    SELECT c_mktsegment, COUNT(*) AS n_customers,
           CAST(SUM(has_orders) AS BIGINT) AS n_with_orders,
           CAST(SUM(has_urgent) AS BIGINT) AS n_with_urgent
    FROM flags GROUP BY c_mktsegment
    """,
)
def join_existence_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-360 enrichment: EXISTS predicates materialized as flag
    columns (any orders? any urgent orders?), rolled up per segment.

    Instead of two correlated EXISTS probes (two semi-joins over the
    same table), ONE pass over orders pre-aggregates both flags per
    customer — max of a conditional — and a single left join attaches
    them; missing customers coalesce to 0. Scale: orders is scanned
    once, shuffled once on custkey; the flag frame is one row per
    customer with two ints."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    flags = o.groupBy("o_custkey").agg(
        F.max(F.lit(1)).alias("has_orders_raw"),
        F.max(
            F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
        ).alias("has_urgent_raw"),
    )
    return (
        c.join(flags, c.c_custkey == flags.o_custkey, "left")
        .select(
            "c_mktsegment",
            F.coalesce("has_orders_raw", F.lit(0)).alias("has_orders"),
            F.coalesce("has_urgent_raw", F.lit(0)).alias("has_urgent"),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("has_orders").cast("bigint").alias("n_with_orders"),
            F.sum("has_urgent").cast("bigint").alias("n_with_urgent"),
        )
    )


@query(
    "events_ab_lift",
    oracle=f"""
    WITH assigned AS (
      SELECT event_type, value,
             CASE WHEN ((user_id % 3221225473) * 2654435761) % 100 < 50
                  THEN 'A' ELSE 'B' END AS variant
      FROM events
    ), agg AS (
      SELECT event_type, variant, COUNT(*) AS n,
             {dsum_sql('value')} AS sv
      FROM assigned GROUP BY event_type, variant
    )
    SELECT a.event_type,
           a.n AS n_a, b.n AS n_b,
           ROUND(a.sv / a.n, 6) AS mean_a,
           ROUND(b.sv / b.n, 6) AS mean_b,
           ROUND((b.sv / b.n) / (a.sv / a.n) - 1.0, 6) AS rel_lift
    FROM agg a JOIN agg b
      ON a.event_type = b.event_type AND a.variant = 'A' AND b.variant = 'B'
    """,
)
def events_ab_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users split 50/50 by a deterministic
    multiplicative hash (Knuth's 2654435761 — reproducible across
    engines and reruns, unlike rand(seed)), then per-event-type sample
    sizes, means, and relative lift of B over A. The id is masked to
    <100000 before multiplying so the product provably fits int64 in
    BOTH engines: Spark wraps silently on bigint overflow (non-ANSI)
    while DuckDB raises — an engine-divergence trap, not a math one.

    All means divide exact decimal sums by exact counts once, in
    double, rounded — so the lift is hash-stable. Scale: one map-only
    assignment, one combined groupBy; the A×B pivot join runs on the
    10-row aggregate frame."""
    ev = table(spark, sf_dir, "events")
    assigned = ev.select(
        "event_type",
        "value",
        F.when(((F.col("user_id") % 3221225473) * 2654435761) % 100 < 50, "A")
        .otherwise("B")
        .alias("variant"),
    )
    agg = assigned.groupBy("event_type", "variant").agg(
        F.count(F.lit(1)).alias("n"), dsum("value").alias("sv")
    )
    a = agg.filter(F.col("variant") == "A").alias("a")
    b = agg.filter(F.col("variant") == "B").alias("b")
    mean_a = F.col("a.sv") / F.col("a.n")
    mean_b = F.col("b.sv") / F.col("b.n")
    return a.join(b, F.col("a.event_type") == F.col("b.event_type")).select(
        F.col("a.event_type").alias("event_type"),
        F.col("a.n").alias("n_a"),
        F.col("b.n").alias("n_b"),
        F.round(mean_a, 6).alias("mean_a"),
        F.round(mean_b, 6).alias("mean_b"),
        F.round(mean_b / mean_a - 1.0, 6).alias("rel_lift"),
    )


_CHI2_SQL = """
    WITH joined AS (
      SELECT c.c_mktsegment AS seg, r.r_name AS region
      FROM customer c
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
    ), obs AS (
      SELECT seg, region, CAST(COUNT(*) AS DOUBLE) AS o
      FROM joined GROUP BY seg, region
    ), margins AS (
      SELECT seg, region, o,
             SUM(o) OVER (PARTITION BY seg) AS row_tot,
             SUM(o) OVER (PARTITION BY region) AS col_tot,
             SUM(o) OVER () AS n
      FROM obs
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(ROUND(SUM(CAST((o - row_tot * col_tot / n)
                               * (o - row_tot * col_tot / n)
                               / (row_tot * col_tot / n)
                          AS DECIMAL(28,6))), 6) AS DOUBLE) AS chi2
    FROM margins
"""


@query("stats_chi2_independence", oracle=_CHI2_SQL)
def stats_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between market segment and
    region: Σ (O−E)²/E over the 5×5 contingency table, E from the
    margin products — the categorical-association screen of a feature-
    correlation audit.

    Every O and margin is an exact count; each cell's statistic is a
    fixed double expression (associativity mirrored in the oracle)
    cast to decimal before the final 25-term sum, so the total is
    order-free. Scale: one shuffle builds the contingency table; the
    window margins run over 25 rows. The output decimal is rounded and
    kept as decimal — both engines hash '123.456700' identically."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    joined = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(F.col("c_mktsegment").alias("seg"), F.col("r_name").alias("region"))
    )
    obs = joined.groupBy("seg", "region").agg(
        F.count(F.lit(1)).cast("double").alias("o")
    )
    n_tot = obs.agg(F.sum("o").alias("n"))
    m = obs.select(
        "o",
        F.sum("o").over(Window.partitionBy("seg")).alias("row_tot"),
        F.sum("o").over(Window.partitionBy("region")).alias("col_tot"),
    ).crossJoin(F.broadcast(n_tot))
    e = F.col("row_tot") * F.col("col_tot") / F.col("n")
    cell = (F.col("o") - e) * (F.col("o") - e) / e
    return m.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.round(F.sum(cell.cast("decimal(28,6)")), 6)
        .cast("double")
        .alias("chi2"),
    )


@query(
    "ts_ewma_halflife",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ), pairs AS (
      SELECT cur.user_id, cur.event_id, cur.rn,
             CAST(power(2, 19 - (cur.rn - past.rn)) AS BIGINT) AS w,
             past.value AS v
      FROM seq cur JOIN seq past
        ON cur.user_id = past.user_id
       AND past.rn BETWEEN cur.rn - 19 AND cur.rn
    )
    SELECT user_id, event_id,
           ROUND({dsum_sql('w * v')}
                 / CAST(SUM(w) AS DOUBLE), 6) AS ewma
    FROM pairs
    WHERE rn >= 20
    GROUP BY user_id, event_id
    """,
)
def ts_ewma_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing EWMA (half-life = 1 step, window = 20 events) of each
    user's value stream — the smoothing every monitoring/feature
    pipeline applies. Weights are the geometric 0.5^k scaled by 2¹⁹
    into EXACT int64 values 2^(19−k): the weight sum is pure integer
    arithmetic, and each weighted term is one double product cast to
    decimal. (Raw 0.5^k weights fail subtly: 0.0078125 = 0.5⁷ sits
    exactly on the 6-decimal half-way point, where Spark's HALF_UP and
    DuckDB's round-half-even decimal casts disagree — measured, not
    theoretical. An e-folding decay like 0.9^k would differ in libm
    ulps instead. Powers of two dodge both traps.)

    EWMA's recurrence looks inherently sequential; bounding the window
    at 20 (0.5²⁰ < 1e-6 — past terms are sub-rounding noise) turns it
    into a banded self-join on row offset: ≤20× row amplification,
    shuffled once on user_id, no recursion. Rows before the 20th are
    suppressed (warm-up period). At 100 TB the band join keys on
    (user_id, rn div 20) blocks to cap amplification skew."""
    ev = table(spark, sf_dir, "events")
    w_seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_id",
        "value",
        F.row_number().over(w_seq).alias("rn"),
    )
    cur, past = seq.alias("cur"), seq.alias("past")
    pairs = cur.join(
        past,
        (F.col("cur.user_id") == F.col("past.user_id"))
        & (F.col("past.rn") >= F.col("cur.rn") - 19)
        & (F.col("past.rn") <= F.col("cur.rn")),
    ).select(
        F.col("cur.user_id").alias("user_id"),
        F.col("cur.event_id").alias("event_id"),
        F.col("cur.rn").alias("rn"),
        F.pow(F.lit(2.0), F.lit(19) - (F.col("cur.rn") - F.col("past.rn")))
        .cast("bigint")
        .alias("w"),
        F.col("past.value").alias("v"),
    )
    return (
        pairs.filter(F.col("rn") >= 20)
        .groupBy("user_id", "event_id")
        .agg(
            F.round(
                dsum(F.col("w") * F.col("v"))
                / F.sum("w").cast("double"),
                6,
            ).alias("ewma")
        )
    )


@query(
    "text_vocab_coverage",
    oracle="""
    WITH counts AS (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ), freq AS (
      SELECT token, COUNT(*) AS c FROM counts GROUP BY token
    ), ranked AS (
      SELECT c,
             ROW_NUMBER() OVER (ORDER BY c DESC, token) AS r,
             SUM(c) OVER (ORDER BY c DESC, token
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(c) OVER () AS tot
      FROM freq
    )
    SELECT CAST(MIN(CASE WHEN cum * 2 >= tot THEN r END) AS BIGINT)
             AS vocab_50pct,
           CAST(MIN(CASE WHEN cum * 10 >= tot * 9 THEN r END) AS BIGINT)
             AS vocab_90pct,
           CAST(MIN(CASE WHEN cum * 100 >= tot * 99 THEN r END) AS BIGINT)
             AS vocab_99pct,
           CAST(MAX(r) AS BIGINT) AS vocab_full
    FROM ranked
    """,
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: the smallest top-k vocabularies that
    cover 50% / 90% / 99% of all corpus tokens — the number that sizes
    a tokenizer's vocab. Computed from the cumulative token-frequency
    share over the (count DESC, token ASC) rank order.

    The coverage compares are pure integer arithmetic (cum·2 ≥ tot
    etc.) — no float share ever exists, so there is nothing to round.
    Scale: one shuffle to count tokens; rank and the cumulative count
    come from the range-partitioned exact total order
    (functions/total_order.py) — the vocabulary grows with the corpus
    (Heaps' law), so no partitionless window is allowed here."""
    d = table(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = freq.agg(F.sum("c").alias("tot"))
    ranked = attach_global_order(
        freq,
        [F.desc("c"), F.asc("token")],
        rn="r",
        cumsums=[("c", "cum")],
    ).crossJoin(F.broadcast(tot))
    return ranked.agg(
        F.min(F.when(F.col("cum") * 2 >= F.col("tot"), F.col("r")))
        .cast("bigint")
        .alias("vocab_50pct"),
        F.min(F.when(F.col("cum") * 10 >= F.col("tot") * 9, F.col("r")))
        .cast("bigint")
        .alias("vocab_90pct"),
        F.min(F.when(F.col("cum") * 100 >= F.col("tot") * 99, F.col("r")))
        .cast("bigint")
        .alias("vocab_99pct"),
        F.max("r").cast("bigint").alias("vocab_full"),
    )


@query(
    "fn_url_parse",
    oracle="""
    WITH urls AS (
      SELECT doc_id,
             'https://' || source || '.corpus.example/docs/'
               || CAST(doc_id AS VARCHAR) || '?lang=' || lang AS url
      FROM documents
    )
    SELECT doc_id,
           regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, 'lang=([a-z]+)', 1) AS lang_param
    FROM urls
    """,
)
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition — host, path, and one query parameter — via
    Spark's dedicated ``parse_url`` expression (a first-class URL
    parser; the oracle mirrors it with anchored regexes, which is all
    DuckDB offers). Web-crawl corpora filter and group on exactly these
    pieces (per-host dedup, path-pattern filters, param stripping).

    The URLs are synthesized from fixture columns so the op is
    self-contained. Map-only; codegen'd JVM expression, no UDF."""
    d = table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".corpus.example/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )


@query(
    "fn_calendar_buckets",
    oracle="""
    SELECT CAST(date_part('quarter', o_orderdate) AS INTEGER) AS quarter,
           CAST(date_part('week', o_orderdate) AS INTEGER) AS iso_week,
           CAST(date_part('dow', o_orderdate) AS INTEGER) AS dow_sun0,
           COUNT(*) AS n_orders
    FROM orders
    WHERE date_part('year', o_orderdate) = 2000
    GROUP BY 1, 2, 3
    """,
)
def fn_calendar_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar bucketing: orders of year 2000 grouped by quarter, ISO
    week, and day-of-week — the reporting dimensions every date
    hierarchy needs beyond fn_date's scalar conversions.

    Convention traps pinned here: Spark's dayofweek is 1=Sunday while
    DuckDB's dow is 0=Sunday (shifted to match); both engines' week =
    ISO week-of-year (verified — early-January dates can land in week
    52 of the prior ISO year, and both engines agree). Map-only +
    one small combine."""
    o = table(spark, sf_dir, "orders")
    return (
        o.filter(F.year("o_orderdate") == 2000)
        .groupBy(
            F.quarter("o_orderdate").alias("quarter"),
            F.weekofyear("o_orderdate").alias("iso_week"),
            (F.dayofweek("o_orderdate") - 1).alias("dow_sun0"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
