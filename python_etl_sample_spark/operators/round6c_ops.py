"""Round-6 third batch: l-diversity (the privacy audit k-anonymity
alone can't give), synchronous label propagation communities, the
two-sample Kolmogorov-Smirnov drift test (the nonparametric complement
to stats_psi_drift's binned PSI), and lagged cross-correlation between
two daily revenue series.

Parity strategy as usual: exact integer counting everywhere possible,
decimal-routed sums for money, one final double expression rounded at
6 dp; label propagation is made deterministic by the (count DESC,
label ASC) tie-break, the same rule in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_etl_sample_spark.functions.determinism import dsum_sql
from python_etl_sample_spark.operators.graph_analytics import (
    _EDGES_SQL,
    _copurchase_edges,
)
from python_etl_sample_spark.registry import query
from python_etl_sample_spark.sources import table

#: l-diversity thresholds: a QI class whose sensitive attribute shows
#: fewer than l distinct values leaks that attribute even when k-anon
#: passes (homogeneity attack).
_LDIV_LS = (2, 3)

#: synchronous label-propagation rounds (unrolled — every round is one
#: join + one argmax, and 3 rounds stabilize the fixture graph's small
#: communities; the CC kernel is the escape hatch for deep convergence)
_LPA_ROUNDS = 3


@query(
    "anon_l_diversity",
    oracle=f"""
    WITH classes AS (
      SELECT c_nationkey,
             CAST(FLOOR(c_acctbal / 500) AS BIGINT) AS bal_band,
             COUNT(*) AS cnt,
             COUNT(DISTINCT c_mktsegment) AS n_sensitive
      FROM customer
      GROUP BY c_nationkey, CAST(FLOOR(c_acctbal / 500) AS BIGINT)
    ),
    ls AS (SELECT UNNEST([{", ".join(map(str, _LDIV_LS))}]) AS l)
    SELECT l AS l_threshold,
           (SELECT COUNT(*) FROM classes) AS n_classes,
           (SELECT MIN(n_sensitive) FROM classes) AS min_diversity,
           COUNT(CASE WHEN n_sensitive < l THEN 1 END) AS n_classes_below,
           COALESCE(CAST(SUM(CASE WHEN n_sensitive < l THEN cnt END)
                         AS BIGINT), 0) AS n_rows_at_risk
    FROM ls CROSS JOIN classes
    GROUP BY l
    """,
)
def anon_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit over QI classes (nation, balance band of 500)
    with market segment as the SENSITIVE attribute: a class can satisfy
    k-anonymity yet still leak — if all 10 people in it share one
    segment, knowing the QI reveals the segment (homogeneity attack).
    Reports, per l ∈ {2, 3}, the classes whose sensitive attribute has
    fewer than l distinct values and the rows inside them.

    Exact integer counting throughout; COUNT(DISTINCT) per class is the
    only two-phase aggregate. Complements anon_k_anonymity_report —
    same report shape, orthogonal privacy property. Scale: one shuffle
    on the QI tuple, thresholds broadcast over the bounded class
    frame."""
    c = table(spark, sf_dir, "customer")
    classes = c.groupBy(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 500).cast("bigint").alias("bal_band"),
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.count_distinct("c_mktsegment").alias("n_sensitive"),
    )
    totals = classes.agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.min("n_sensitive").alias("min_diversity"),
    )
    ls = spark.createDataFrame([(v,) for v in _LDIV_LS], "l int")
    return (
        F.broadcast(ls)
        .crossJoin(classes)
        .groupBy(F.col("l").alias("l_threshold"))
        .agg(
            F.count(F.when(F.col("n_sensitive") < F.col("l"), 1)).alias(
                "n_classes_below"
            ),
            F.coalesce(
                F.sum(F.when(F.col("n_sensitive") < F.col("l"), F.col("cnt"))),
                F.lit(0),
            )
            .cast("bigint")
            .alias("n_rows_at_risk"),
        )
        .crossJoin(F.broadcast(totals))
        .select(
            "l_threshold",
            "n_classes",
            "min_diversity",
            "n_classes_below",
            "n_rows_at_risk",
        )
    )


def _lpa_round_sql(prev: str, out: str) -> str:
    """One synchronous LPA round in SQL: count neighbor labels, keep the
    (count DESC, label ASC) winner per node."""
    return f"""
    cnt_{out} AS (
      SELECT s.src AS node, l.label, COUNT(*) AS c
      FROM sym s JOIN {prev} l ON l.node = s.dst
      GROUP BY s.src, l.label
    ),
    {out} AS (
      SELECT node, label FROM (
        SELECT node, label,
               ROW_NUMBER() OVER (PARTITION BY node
                                  ORDER BY c DESC, label) AS rn
        FROM cnt_{out}
      ) WHERE rn = 1
    )"""


@query(
    "graph_label_propagation",
    oracle=f"""
    WITH {_EDGES_SQL},
    sym AS (
      SELECT u AS src, v AS dst FROM edges
      UNION ALL SELECT v, u FROM edges
    ),
    l0 AS (SELECT DISTINCT src AS node, src AS label FROM sym),
    {",".join(_lpa_round_sql(f"l{i}", f"l{i + 1}") for i in range(_LPA_ROUNDS))}
    SELECT label AS community,
           COUNT(*) AS n_members,
           CAST(MIN(node) AS BIGINT) AS min_member,
           CAST(MAX(node) AS BIGINT) AS max_member
    FROM l{_LPA_ROUNDS}
    GROUP BY label
    """,
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label-propagation community detection on the 1995
    co-purchase graph, {_LPA_ROUNDS} unrolled rounds: every node starts
    as its own label and each round adopts its neighborhood's plurality
    label with the (count DESC, label ASC) tie-break — the rule that
    makes plain LPA (normally run-to-run unstable) fully DETERMINISTIC,
    so the oracle replays it exactly.

    Per round: one edges⋈labels shuffle join, one (node, label) count,
    one per-node argmax window — the Pregel superstep shape shared with
    PageRank/BFS here, and like them the unrolled plan dedupes the
    repeated edge derivation via runtime exchange reuse. At 100 TB
    labels and edges co-partition on node id so each superstep is a
    co-located join; rounds stay bounded (LPA converges in few rounds
    or oscillates — capping rounds IS the algorithm)."""
    labels = _lpa_fit(spark, sf_dir)
    return labels.groupBy(F.col("label").alias("community")).agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min("node").cast("bigint").alias("min_member"),
        F.max("node").cast("bigint").alias("max_member"),
    )


def _lpa_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic LPA fit (node, label) after the fixed rounds —
    shared by graph_label_propagation and the modularity scorer
    (round7g_ops), so both consume the identical communities."""
    edges = _copurchase_edges(spark, sf_dir)
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    # lazy checkpoints per round — graph_bfs_hops' measured rule
    # (round7c_ops.py): the unrolled multi-round lineage re-plans the
    # whole edge derivation under every round's subtree and under each
    # CONSUMER of the returned labels (the modularity scorer joins the
    # fit three times); cutting it here floored label-prop 1.83 → 1.69 s
    # and modularity 2.53 → 2.12 s at sf0.1 with identical hashes
    sym = sym.select(F.col("u").alias("src"), F.col("v").alias("dst")).localCheckpoint(
        eager=False
    )
    labels = sym.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(_LPA_ROUNDS):
        # plurality via mode(label, deterministic=true): Spark 4's
        # deterministic mode returns the most frequent value with the
        # LOWEST value winning ties — exactly LPA's (count DESC,
        # label ASC) rule — as ONE partial-aggregable aggregate, so
        # each superstep is a single shuffle by node. The round-11
        # max-struct form needed two shuffles per round (count by
        # (node, label), then argmax by node); round-12 interleaved
        # probe on the modularity consumer at sf0.1: two-shuffle
        # 3.29 s vs mode 2.55 s warm-min, labels bit-identical. The
        # oracle replays plurality semantics (row_number over
        # count DESC, label ASC), so no SQL change was needed. The
        # partial maps mode ships are bounded by per-node distinct
        # neighbor labels — at cluster scale the same co-partitioned
        # superstep shape, one exchange instead of two.
        labels = (
            sym.join(labels, sym.dst == labels.node)
            .groupBy(F.col("src").alias("node"))
            .agg(F.expr("mode(label, true)").alias("label"))
            .localCheckpoint(eager=False)
        )
    return labels


@query(
    "stats_ks_two_sample",
    oracle="""
    WITH tagged AS (
      SELECT o_orderpriority AS priority, o_totalprice AS price,
             CASE WHEN o_orderdate < TIMESTAMP '1998-01-01' THEN 'a'
                  ELSE 'b' END AS period
      FROM orders
      WHERE o_orderdate < TIMESTAMP '1998-01-01'
         OR o_orderdate >= TIMESTAMP '1999-01-01'
    ),
    pts AS (
      SELECT priority, price,
             COUNT(*) FILTER (period = 'a') AS ca,
             COUNT(*) FILTER (period = 'b') AS cb
      FROM tagged GROUP BY priority, price
    ),
    cum AS (
      SELECT priority, price,
             SUM(ca) OVER w AS cuma,
             SUM(cb) OVER w AS cumb,
             SUM(ca) OVER (PARTITION BY priority) AS na,
             SUM(cb) OVER (PARTITION BY priority) AS nb
      FROM pts
      WINDOW w AS (PARTITION BY priority ORDER BY price
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT priority,
           CAST(MAX(na) AS BIGINT) AS n_before,
           CAST(MAX(nb) AS BIGINT) AS n_after,
           ROUND(MAX(ABS(CAST(cuma AS DOUBLE) / NULLIF(na, 0)
                         - CAST(cumb AS DOUBLE) / NULLIF(nb, 0))), 6)
             AS ks_d
    FROM cum GROUP BY priority
    """,
)
def stats_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic per order priority
    between the 1995-97 and 1999-2001 eras: D = sup over the pooled
    support of |ECDF_before − ECDF_after| — the binning-free drift test
    (stats_psi_drift's PSI depends on the bin grid; KS does not).

    The ECDFs are evaluated at every distinct price via a cumulative
    window over the (priority, price) count frame — tied prices
    collapse into one support point FIRST, so both cumulative counts
    include the full tie group (the right-continuous ECDF value).
    Every D candidate is |exact-int/exact-int − exact-int/exact-int|;
    max of such doubles is order-independent, rounded only for
    display. Scale: one (priority, price) shuffle, then a window
    PARTITIONED by priority (never global), then a ≤groups rollup."""
    o = table(spark, sf_dir, "orders")
    tagged = o.filter(
        (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        | (F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp_ntz"))
    ).select(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_totalprice").alias("price"),
        F.when(
            F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"), "a"
        )
        .otherwise("b")
        .alias("period"),
    )
    pts = tagged.groupBy("priority", "price").agg(
        F.count(F.when(F.col("period") == "a", 1)).alias("ca"),
        F.count(F.when(F.col("period") == "b", 1)).alias("cb"),
    )
    wcum = (
        Window.partitionBy("priority")
        .orderBy("price")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("priority")
    cum = pts.select(
        "priority",
        F.sum("ca").over(wcum).alias("cuma"),
        F.sum("cb").over(wcum).alias("cumb"),
        F.sum("ca").over(wall).alias("na"),
        F.sum("cb").over(wall).alias("nb"),
    )
    return cum.groupBy("priority").agg(
        F.max("na").cast("bigint").alias("n_before"),
        F.max("nb").cast("bigint").alias("n_after"),
        F.round(
            F.max(
                F.abs(
                    F.col("cuma").cast("double")
                    / F.when(F.col("na") > 0, F.col("na"))
                    - F.col("cumb").cast("double")
                    / F.when(F.col("nb") > 0, F.col("nb"))
                )
            ),
            6,
        ).alias("ks_d"),
    )


#: cross-correlation lags (days): revenue leads/trails comparison
_XCORR_LAGS = (-3, -2, -1, 0, 1, 2, 3)


@query(
    "ts_cross_correlation",
    oracle=f"""
    WITH daily AS (
      SELECT c.c_mktsegment AS seg,
             CAST(o.o_orderdate AS DATE) AS day,
             {dsum_sql('o.o_totalprice')} AS rev
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
      GROUP BY 1, 2
    ),
    x AS (SELECT day, rev FROM daily WHERE seg = 'BUILDING'),
    y AS (SELECT day, rev FROM daily WHERE seg = 'AUTOMOBILE'),
    lags AS (SELECT UNNEST([{", ".join(map(str, _XCORR_LAGS))}]) AS lag),
    pairs AS (
      SELECT l.lag, x.rev AS xv, y.rev AS yv
      FROM lags l
      JOIN x ON TRUE
      JOIN y ON y.day = x.day + CAST(l.lag || ' days' AS INTERVAL)
    ),
    m AS (
      SELECT lag, COUNT(*) AS n,
             {dsum_sql('xv')} AS sx, {dsum_sql('yv')} AS sy,
             {dsum_sql('xv * yv')} AS sxy,
             {dsum_sql('xv * xv')} AS sxx, {dsum_sql('yv * yv')} AS syy
      FROM pairs GROUP BY lag
    )
    SELECT lag, CAST(n AS BIGINT) AS n_days,
           ROUND((n * sxy - sx * sy)
                 / NULLIF(sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
                          0.0), 6) AS xcorr
    FROM m
    """,
)
def ts_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lagged cross-correlation between the BUILDING and AUTOMOBILE segments'
    daily revenue series, lags −3..+3 days — does one segment's demand
    lead the other's? Pearson r at each lag from the five moment sums,
    the single-pass moment-method every stats op here uses.

    The daily revenues are decimal-exact sums; their products are
    doubles but each moment sum re-routes through decimal, so every r
    is a fixed arithmetic expression over exact sums — deterministic in
    both engines, rounded at 6 dp. The lag join is an equi-join on
    (day + lag), never a range scan. Scale: daily frame is
    days×segments rows (bounded, thousands), so after the one
    (seg, day) aggregate of orders everything is broadcast-sized; the
    moment pass shuffles 7 lag groups."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    daily = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .filter(F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderdate").cast("date").alias("day"),
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(28,6)")).cast("double").alias("rev"))
    )
    x = daily.filter(F.col("seg") == "BUILDING").select(
        F.col("day").alias("xday"), F.col("rev").alias("xv")
    )
    y = daily.filter(F.col("seg") == "AUTOMOBILE").select(
        F.col("day").alias("yday"), F.col("rev").alias("yv")
    )
    lags = spark.createDataFrame([(v,) for v in _XCORR_LAGS], "lag int")
    pairs = (
        x.crossJoin(F.broadcast(lags))
        .join(y, F.col("yday") == F.date_add(F.col("xday"), F.col("lag")))
        .select("lag", "xv", "yv")
    )
    dec = "decimal(28,6)"
    m = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("xv").cast(dec)).cast("double").alias("sx"),
        F.sum(F.col("yv").cast(dec)).cast("double").alias("sy"),
        F.sum((F.col("xv") * F.col("yv")).cast(dec)).cast("double").alias("sxy"),
        F.sum((F.col("xv") * F.col("xv")).cast(dec)).cast("double").alias("sxx"),
        F.sum((F.col("yv") * F.col("yv")).cast(dec)).cast("double").alias("syy"),
    )
    n = F.col("n")
    # zero-variance guard: a constant series makes the denominator 0 —
    # Spark doubles would give NaN/Inf where DuckDB's NULLIF gives NULL,
    # so both sides agree on NULL (tests/test_ansi_edges class)
    _den = F.sqrt(
        (n * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (n * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return m.select(
        "lag",
        n.cast("bigint").alias("n_days"),
        F.round(
            F.when(
                _den != 0.0,
                (n * F.col("sxy") - F.col("sx") * F.col("sy")) / _den,
            ),
            6,
        ).alias("xcorr"),
    )
