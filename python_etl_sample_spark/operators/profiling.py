"""Dataset profiling + corpus-analytics operators.

Column profiling, histogram binning, exact-moment correlation, cohort
retention, top-supplier selection, and corpus mixing weights — the
"understand and steer the dataset" layer that sits beside the query
operators in a training-data pipeline.

Engine-parity notes (see functions/determinism.py): every float that
reaches the hashed output is either (a) a decimal-exact sum cast to
double inside the cast-parity domain, or (b) a derived ratio computed
with MIRRORED IEEE association in both engines and rounded to 6 dp —
the same scheme agg_stats uses for its moments, because product-sums
like Σxy exceed the |sum|·10^scale < 2^53 exact-cast bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_etl_sample_spark.functions.determinism import dsum, dsum_sql
from python_etl_sample_spark.registry import query
from python_etl_sample_spark.sources import table


@query(
    "data_profile",
    oracle="""
    SELECT 'o_orderkey' AS column_name,
           COUNT(*) - COUNT(o_orderkey) AS n_nulls,
           COUNT(DISTINCT o_orderkey) AS n_distinct,
           CAST(MIN(o_orderkey) AS VARCHAR) AS min_v,
           CAST(MAX(o_orderkey) AS VARCHAR) AS max_v
    FROM orders
    UNION ALL
    SELECT 'o_custkey', COUNT(*) - COUNT(o_custkey),
           COUNT(DISTINCT o_custkey),
           CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', COUNT(*) - COUNT(o_orderstatus),
           COUNT(DISTINCT o_orderstatus), MIN(o_orderstatus), MAX(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', COUNT(*) - COUNT(o_orderpriority),
           COUNT(DISTINCT o_orderpriority), MIN(o_orderpriority), MAX(o_orderpriority)
    FROM orders
    """,
)
def data_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile (null count, cardinality, min/max) over four
    orders columns, one row per column.

    Scale / r14 reshape (guide §2.4): the single 4-distinct aggregate
    planned as ONE Expand×5 of the 4-column scan — every row
    replicated five ways, shuffled once per gid lane, and the whole
    thing a single serial two-phase aggregate. Four independent
    single-distinct aggregates (one column each, unioned) measure 2×
    faster even run back-to-back, and as one union job the four narrow
    subtrees run concurrently: each scan prunes to its ONE column,
    each partial-distinct shuffles only that column's values. At
    100 TB the union-of-scans shape assumes a COLUMNAR source with
    working column pruning and concurrent subtree scheduling (ADVICE
    r14) — each subtree reads one column, so four subtrees read the
    same bytes as the one Expand scan; on a row-oriented source or a
    serial scheduler it would be a 4× scan regression, and the
    documented fallback is the single-pass approx_count_distinct
    shape (see agg_approx_distinct), which collapses the profile back
    to one scan. Min/max computed natively then cast to string,
    so the profile row is type-uniform without lexicographic
    artifacts."""
    o = table(spark, sf_dir, "orders")

    def col_profile(c: str) -> DataFrame:
        return o.agg(
            (F.count(F.lit(1)) - F.count(F.col(c))).alias("n_nulls"),
            F.countDistinct(F.col(c)).alias("n_distinct"),
            F.min(F.col(c)).cast("string").alias("min_v"),
            F.max(F.col(c)).cast("string").alias("max_v"),
        ).select(
            F.lit(c).alias("column_name"),
            "n_nulls",
            "n_distinct",
            "min_v",
            "max_v",
        )

    parts = [
        col_profile(c)
        for c in ("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


@query(
    "agg_histogram",
    oracle=f"""
    SELECT CAST(FLOOR(l_extendedprice / 5000.0) AS INTEGER) AS bin,
           CAST(FLOOR(l_extendedprice / 5000.0) AS INTEGER) * 5000.0 AS bin_lo,
           COUNT(*) AS n,
           {dsum_sql('l_extendedprice')} AS sum_price
    FROM lineitem
    GROUP BY 1, 2
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of lineitem price (5000-wide bins).

    Parity: the bin key is floor(double / 5000.0) — one correctly-
    rounded IEEE division + floor, bit-identical in both engines; the
    2-dp fixture prices never land within an ulp of a bin edge. bin_lo
    is int*5000.0, exact. Scale: a histogram is just a groupBy on a
    derived dense key — map-side combine leaves ~21 groups to shuffle
    regardless of input size."""
    li = table(spark, sf_dir, "lineitem")
    bin_col = F.floor(F.col("l_extendedprice") / F.lit(5000.0)).cast("int")
    return (
        li.groupBy(bin_col.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("l_extendedprice").alias("sum_price"),
        )
        .select(
            "bin",
            (F.col("bin") * F.lit(5000.0)).alias("bin_lo"),
            "n",
            "sum_price",
        )
    )


# exact product-sum casts: DECIMAL(19,6) forces int128 in DuckDB and the
# multiply lands on DECIMAL(38,12) in BOTH engines (Spark: 19+19+1 = 39
# capped to 38 keeps scale 12 under allowPrecisionLoss; verified by the
# parity suite). Fixture values (qty ≤ 51, price ≤ 1.1e5, disc ≤ 0.1, all
# ≤ 2 dp) make every product exact at ≤ 4 dp, far inside 38 digits.
_D19 = "DECIMAL(19,6)"


def _corr_sql(x: str, y: str) -> str:
    """Pearson corr from exact decimal moment sums, double-combined with
    the exact association mirrored by ``_corr_col``, rounded to 6 dp."""
    n = "CAST(COUNT(*) AS DOUBLE)"
    sx = f"CAST(SUM(CAST({x} AS {_D19})) AS DOUBLE)"
    sy = f"CAST(SUM(CAST({y} AS {_D19})) AS DOUBLE)"
    sxy = f"CAST(SUM(CAST({x} AS {_D19}) * CAST({y} AS {_D19})) AS DOUBLE)"
    sxx = f"CAST(SUM(CAST({x} AS {_D19}) * CAST({x} AS {_D19})) AS DOUBLE)"
    syy = f"CAST(SUM(CAST({y} AS {_D19}) * CAST({y} AS {_D19})) AS DOUBLE)"
    return (
        f"ROUND(({n} * {sxy} - {sx} * {sy}) / "
        f"(SQRT({n} * {sxx} - {sx} * {sx}) * SQRT({n} * {syy} - {sy} * {sy})), 6)"
    )


def _corr_col(x: str, y: str) -> F.Column:
    d19 = lambda c: F.col(c).cast(_D19)  # noqa: E731
    n = F.count(F.lit(1)).cast("double")
    sx = F.sum(d19(x)).cast("double")
    sy = F.sum(d19(y)).cast("double")
    sxy = F.sum(d19(x) * d19(y)).cast("double")
    sxx = F.sum(d19(x) * d19(x)).cast("double")
    syy = F.sum(d19(y) * d19(y)).cast("double")
    return F.round(
        (n * sxy - sx * sy)
        / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)),
        6,
    )


@query(
    "stats_corr_matrix",
    oracle=f"""
    SELECT {_corr_sql('l_quantity', 'l_extendedprice')} AS corr_qty_price,
           {_corr_sql('l_quantity', 'l_discount')} AS corr_qty_disc,
           {_corr_sql('l_extendedprice', 'l_discount')} AS corr_price_disc
    FROM lineitem
    """,
)
def stats_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation of quantity / price / discount in
    ONE aggregate pass over exact decimal moment sums.

    Why not F.corr: its streaming-covariance accumulation is float-
    order-dependent, so Spark and DuckDB would disagree in the last
    bits. Here all six moment sums are exact decimals (order-free);
    the corr formula then combines them in double with the association
    mirrored textually in the oracle. Σxy ≈ 8e10 exceeds the exact
    decimal→double cast bound (determinism.py), so the derived value is
    rounded to 6 dp — the agg_stats precedent. Scale: map-side partial
    aggregation of 6 sums; one single-row reduce. No second pass, no
    driver math."""
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        _corr_col("l_quantity", "l_extendedprice").alias("corr_qty_price"),
        _corr_col("l_quantity", "l_discount").alias("corr_qty_disc"),
        _corr_col("l_extendedprice", "l_discount").alias("corr_price_disc"),
    )


@query(
    "events_retention_cohort",
    oracle="""
    WITH firsts AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_d
      FROM events GROUP BY user_id
    ), act AS (
      SELECT DISTINCT e.user_id, f.cohort_d,
             datediff('day', f.cohort_d, CAST(e.ts AS DATE)) AS day_offset
      FROM events e JOIN firsts f USING (user_id)
    )
    SELECT CAST(cohort_d AS TIMESTAMP) AS cohort_day, day_offset,
           COUNT(*) AS n_users
    FROM act GROUP BY cohort_d, day_offset
    """,
)
def events_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users bucketed by first-activity day; for each
    (cohort, day-offset) cell, how many distinct users were active.

    Scale: first-activity is a groupBy(user_id) — ONE shuffle on
    user_id; the activity join reuses that partitioning (equi join on
    user_id, no re-shuffle under AQE); the distinct collapses
    (user, cohort, offset) map-side before the final small-key
    aggregate. The cohort matrix is O(days²) rows regardless of event
    volume."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("d")
    )
    firsts = ev.groupBy("user_id").agg(F.min("d").alias("cohort_d"))
    act = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_d",
            F.datediff(F.col("d"), F.col("cohort_d")).alias("day_offset"),
        )
        .distinct()
    )
    return act.groupBy("cohort_d", "day_offset").agg(
        F.count(F.lit(1)).alias("n_users")
    ).select(
        F.col("cohort_d").cast("timestamp_ntz").alias("cohort_day"),
        "day_offset",
        "n_users",
    )


@query(
    "q_top_suppliers",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey,
             {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.revenue
    FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
    WHERE r.revenue = (SELECT MAX(revenue) FROM rev)
    """,
)
def q_top_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q15-shaped: the supplier(s) with maximum revenue over one
    quarter (ties kept, like the spec's view-based formulation).

    Parity: revenue is a dsum (exact decimal), so the max-equality
    filter compares doubles that are bit-identical across engines.
    Scale: the quarter filter pushes to the parquet scan; per-supplier
    revenue is one shuffled aggregate; the global max is a one-row
    broadcast joined back — no window over an unpartitioned frame, no
    second shuffle of the revenue table."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    revenue = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    rev = li.groupBy("l_suppkey").agg(dsum(revenue).alias("revenue"))
    top = rev.agg(F.max("revenue").alias("max_rev"))
    s = table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(top), F.col("revenue") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "revenue")
    )


@query(
    "corpus_mix_weights",
    oracle="""
    WITH per AS (
      SELECT lang, source, COUNT(*) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS n_chars
      FROM documents GROUP BY lang, source
    ), tot AS (
      SELECT COUNT(*) AS k, CAST(SUM(n_chars) AS BIGINT) AS total_chars FROM per
    )
    SELECT p.lang, p.source, p.n_docs, p.n_chars,
           ROUND((1.0 / t.k) /
                 (CAST(p.n_chars AS DOUBLE) / CAST(t.total_chars AS DOUBLE)),
                 6) AS weight
    FROM per p CROSS JOIN tot t
    """,
)
def corpus_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixing weights for corpus resampling: per (lang, source)
    domain, the up/down-sampling factor that would equalize the char
    budget across domains — weight = uniform share / actual share.

    The LLM-pipeline use: feed these weights to a sampler (sample_split)
    to rebalance a crawl whose domains are power-law sized. Parity: the
    char sums are exact bigints; the weight is two IEEE divisions with
    mirrored association, rounded to 6 dp. Scale: one groupBy over the
    corpus (map-side combined to ~domains rows), a one-row totals frame
    broadcast back — no second scan of the documents."""
    d = table(spark, sf_dir, "documents")
    per = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("n_chars")
    )
    tot = per.agg(
        F.count(F.lit(1)).alias("k"), F.sum("n_chars").alias("total_chars")
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "lang",
        "source",
        "n_docs",
        "n_chars",
        F.round(
            (F.lit(1.0) / F.col("k"))
            / (
                F.col("n_chars").cast("double")
                / F.col("total_chars").cast("double")
            ),
            6,
        ).alias("weight"),
    )


def _skew_sql(tbl: str, col: str) -> str:
    """Per-key distribution metrics for one join-key column."""
    return f"""
    SELECT '{col}' AS key_column,
           CAST(SUM(c) AS BIGINT) AS n_rows,
           COUNT(*) AS n_keys,
           CAST(MAX(c) AS BIGINT) AS max_key_rows,
           ROUND(CAST(MAX(c) AS DOUBLE) * COUNT(*) / SUM(c), 6)
             AS skew_ratio,
           ROUND(quantile_cont(c, 0.99), 6) AS p99_key_rows
    FROM (SELECT {col}, COUNT(*) AS c FROM {tbl} GROUP BY {col})
    """


@query(
    "dq_skew_report",
    oracle=" UNION ALL ".join(
        [
            _skew_sql("lineitem", "l_partkey"),
            _skew_sql("lineitem", "l_suppkey"),
            _skew_sql("orders", "o_custkey"),
        ]
    ),
)
def dq_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostics — the operability report that decides
    WHICH mitigation a 100 TB join needs before it runs: per key column,
    the row count, distinct-key count, hottest key's row count, the
    skew ratio (max/mean keys-per-row — 1.0 is perfectly even), and the
    exact p99 of rows-per-key.

    skew_ratio ≈ 1 → plain shuffle join; tens → AQE skew splitting
    suffices; hundreds+ → salt the key (join_skew_salted is the
    companion operator). Each column is ONE partial-agg groupBy over
    the fact table followed by a handful-of-rows aggregate; the three
    reports union into a single frame. The ratio is computed
    max·n_keys/n_rows (integer products first, one double division)
    and mirrored textually in the oracle; p99 uses the shared
    interpolated-percentile definition over per-key counts."""

    def one(tbl: str, col: str) -> DataFrame:
        per_key = (
            table(spark, sf_dir, tbl)
            .groupBy(col)
            .agg(F.count(F.lit(1)).alias("c"))
        )
        return per_key.agg(
            F.lit(col).alias("key_column"),
            F.sum("c").alias("n_rows"),
            F.count(F.lit(1)).alias("n_keys"),
            F.max("c").alias("max_key_rows"),
            F.round(
                F.max("c").cast("double") * F.count(F.lit(1)) / F.sum("c"), 6
            ).alias("skew_ratio"),
            F.round(F.expr("percentile(c, 0.99)"), 6).alias("p99_key_rows"),
        )

    return (
        one("lineitem", "l_partkey")
        .unionAll(one("lineitem", "l_suppkey"))
        .unionAll(one("orders", "o_custkey"))
    )
