"""Round-6 second batch: the mergeable-sketch tier beyond HLL
(Count-Min frequency, K-minimum-values distinct), distribution-drift
monitoring (PSI), and supervised featurization (smoothed target
encoding).

Engine parity strategy: both sketches are DETERMINISTIC functions of
the data given their hash functions, and the hash functions (sha256
hex prefixes, the ``features_hashing_trick`` idiom — Spark
``conv(substr(sha2(...),...),16,10)`` ≡ DuckDB
``CAST('0x'||substr(sha256(...),...) AS BIGINT)``) are computable in
BOTH engines — so the oracle recomputes the ESTIMATES themselves and
the driver hash compares them exactly. No probabilistic tolerance
flags needed (contrast sketch_hll_mergeable, whose engine-internal
sketch forces an exact-count + in-tolerance-flag contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_etl_sample_spark.registry import query
from python_etl_sample_spark.sources import table

#: Count-Min geometry: depth 4 independent hash rows, width 256 —
#: small enough that collisions are OBSERVABLE at sf0.1 (1.5k users
#: over 256 buckets), so the estimate genuinely over-counts somewhere
#: and the parity check exercises the min-over-rows logic.
_CMS_DEPTH = 4
_CMS_WIDTH = 256

#: KMV: k smallest 48-bit hashes; 12 hex sha256 digits < 2^48 parse
#: exactly in both engines' int64.
_KMV_K = 64
_KMV_SPACE = float(1 << 48)

#: PSI: equal-width bins over o_totalprice (fixture max ~500k) and
#: Laplace +1 smoothing so empty bins never hit ln(0).
_PSI_BINS = 10
_PSI_WIDTH = 50000.0

#: target encoding smoothing pseudo-count
_TE_M = 50


def _spark_hexhash(col, nhex: int, salt=None):
    """First ``nhex`` hex digits of sha256 as a bigint — engine-identical
    with the DuckDB twin in the oracles below."""
    s = col.cast("string") if salt is None else F.concat(col.cast("string"), salt)
    return F.conv(F.substring(F.sha2(s, 256), 1, nhex), 16, 10).cast("bigint")


@query(
    "sketch_cms_frequency",
    oracle=f"""
    WITH ev AS (SELECT user_id FROM events),
    exact AS (
      SELECT user_id, COUNT(*) AS n_exact FROM ev GROUP BY user_id
    ),
    hashed AS (
      SELECT user_id, d.d,
             CAST(('0x' || substr(sha256(CAST(user_id AS VARCHAR)
                                         || ':' || CAST(d.d AS VARCHAR)),
                                  1, 6)) AS BIGINT) % {_CMS_WIDTH} AS bucket
      FROM ev, (SELECT UNNEST(range(0, {_CMS_DEPTH})) AS d) AS d
    ),
    cells AS (
      SELECT d, bucket, COUNT(*) AS cell
      FROM hashed GROUP BY d, bucket
    ),
    probes AS (
      SELECT e.user_id, e.n_exact, d.d,
             CAST(('0x' || substr(sha256(CAST(e.user_id AS VARCHAR)
                                         || ':' || CAST(d.d AS VARCHAR)),
                                  1, 6)) AS BIGINT) % {_CMS_WIDTH} AS bucket
      FROM exact e, (SELECT UNNEST(range(0, {_CMS_DEPTH})) AS d) AS d
    )
    SELECT p.user_id,
           MAX(p.n_exact) AS n_exact,
           CAST(MIN(c.cell) AS BIGINT) AS cms_est,
           CASE WHEN CAST(MIN(c.cell) AS BIGINT) > MAX(p.n_exact)
                THEN 1 ELSE 0 END AS overcounted
    FROM probes p
    JOIN cells c ON c.d = p.d AND c.bucket = p.bucket
    GROUP BY p.user_id
    """,
)
def sketch_cms_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min Sketch frequency estimation over event users: depth-4
    width-256 counter array built in ONE distributed pass (a
    (row, bucket) groupBy — each array cell is an ordinary aggregate
    group), probed with min-over-rows. CMS never undercounts
    (est ≥ exact always — tests pin it); the ``overcounted`` flag marks
    users whose estimate collided upward.

    r14 reshape (guide §2.3 "aggregate before you shuffle"): the cell
    hash depends only on (user_id, d), so the per-user exact counts —
    needed anyway for the probe side — are aggregated FIRST and each
    (d, bucket) cell is the SUM of its users' counts, identical to
    counting raw events there. sha256 evaluations drop from
    depth×|events| to depth×|users| and the cells shuffle carries
    per-user partials instead of raw event rows. Mergeability is
    unchanged (cells are still sums — shards union via the same
    groupBy), and at 100 TB the event-sized pass is the one that
    matters. Plan: one event-sized shuffle (the user rollup, shared by
    build and probe sides) + tiny (d, bucket) aggregates; nothing
    holds the 1024-cell array in one place — it IS a DataFrame."""
    ev = table(spark, sf_dir, "events").select("user_id")
    depths = F.explode(F.array(*[F.lit(d) for d in range(_CMS_DEPTH)])).alias("d")
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_exact"))
    hashed = exact.select("user_id", "n_exact", depths).withColumn(
        "bucket",
        _spark_hexhash(
            F.col("user_id"), 6, salt=F.concat(F.lit(":"), F.col("d").cast("string"))
        )
        % _CMS_WIDTH,
    )
    cells = hashed.groupBy("d", "bucket").agg(F.sum("n_exact").alias("cell"))
    probes = exact.select("user_id", "n_exact", depths).withColumn(
        "bucket",
        _spark_hexhash(
            F.col("user_id"), 6, salt=F.concat(F.lit(":"), F.col("d").cast("string"))
        )
        % _CMS_WIDTH,
    )
    return (
        probes.join(cells, ["d", "bucket"])
        .groupBy("user_id")
        .agg(
            F.max("n_exact").alias("n_exact"),
            F.min("cell").cast("bigint").alias("cms_est"),
        )
        .withColumn(
            "overcounted",
            F.when(F.col("cms_est") > F.col("n_exact"), 1).otherwise(0),
        )
    )


@query(
    "sketch_kmv_distinct",
    oracle=f"""
    WITH hv AS (
      SELECT DISTINCT event_type,
             CAST(('0x' || substr(sha256(CAST(user_id AS VARCHAR)), 1, 12))
                  AS BIGINT) AS h
      FROM events
    ),
    ranked AS (
      SELECT event_type, h,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS r,
             COUNT(*) OVER (PARTITION BY event_type) AS n_hashes
      FROM hv
    ),
    kth AS (
      SELECT event_type, MAX(n_hashes) AS n_hashes,
             MAX(CASE WHEN r = {_KMV_K} THEN h END) AS kth_h
      FROM ranked GROUP BY event_type
    ),
    exact AS (
      SELECT event_type, COUNT(DISTINCT user_id) AS n_exact FROM events
      GROUP BY event_type
    )
    SELECT e.event_type, e.n_exact,
           ROUND(CASE WHEN k.n_hashes < {_KMV_K}
                      THEN CAST(e.n_exact AS DOUBLE)
                      ELSE ({_KMV_K} - 1) * {_KMV_SPACE!r} / k.kth_h
                 END, 6) AS kmv_est
    FROM exact e JOIN kth k ON e.event_type = k.event_type
    """,
)
def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct-count sketch per event type: hash every
    user to 48 bits, keep the {_KMV_K} smallest distinct hashes, estimate
    distinct = (k−1)·2⁴⁸ / kth-smallest-hash (Bar-Yossef et al.; the
    Theta/KMV family DataSketches ships). Falls back to the exact count
    when fewer than k distinct hashes exist (exercised at sf0.001).

    MERGEABLE by the k-smallest identity: the k smallest of a union is
    the k smallest of the per-shard k-smallest sets — so shards keep 64
    hashes each, the union re-sorts 64·shards values, and no shard ever
    sees another's raw users. The estimate is a pure function of the
    data (no RNG, no engine sketch internals), so the oracle recomputes
    it bit-for-bit: one deterministic double division, rounded.
    Plan: dedup-shuffle on (type, hash), then a per-type window over ≤
    distinct-users rows; at 100 TB the dedup pre-aggregates map-side
    and the window input is already k-truncatable per partition."""
    ev = table(spark, sf_dir, "events")
    # r14 (guide §2.3): dedup the 8-byte (type, user) pairs FIRST, hash
    # after — sha256 runs once per distinct pair, not once per event.
    # The second distinct keeps the original (type, h)-level dedup
    # semantics exactly (it collapses only 48-bit hash collisions, and
    # runs over the already-tiny distinct frame).
    hv = (
        ev.select("event_type", "user_id")
        .distinct()
        .select("event_type", _spark_hexhash(F.col("user_id"), 12).alias("h"))
        .distinct()
    )
    w = Window.partitionBy("event_type").orderBy("h")
    ranked = hv.select(
        "event_type",
        "h",
        F.row_number().over(w).alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n_hashes"),
    )
    kth = ranked.groupBy("event_type").agg(
        F.max("n_hashes").alias("n_hashes"),
        F.max(F.when(F.col("r") == _KMV_K, F.col("h"))).alias("kth_h"),
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_exact")
    )
    return exact.join(kth, "event_type").select(
        "event_type",
        "n_exact",
        F.round(
            F.when(
                F.col("n_hashes") < _KMV_K, F.col("n_exact").cast("double")
            ).otherwise(F.lit((_KMV_K - 1) * _KMV_SPACE) / F.col("kth_h")),
            6,
        ).alias("kmv_est"),
    )


@query(
    "stats_psi_drift",
    oracle=f"""
    WITH binned AS (
      SELECT o_orderpriority AS priority,
             CASE WHEN o_orderdate < TIMESTAMP '1998-01-01' THEN 'a'
                  WHEN o_orderdate >= TIMESTAMP '1999-01-01' THEN 'b'
             END AS period,
             LEAST({_PSI_BINS - 1},
                   CAST(floor(o_totalprice / {_PSI_WIDTH!r}) AS INTEGER))
               AS bin
      FROM orders
      WHERE o_orderdate < TIMESTAMP '1998-01-01'
         OR o_orderdate >= TIMESTAMP '1999-01-01'
    ),
    grid AS (
      SELECT p.priority, b.bin
      FROM (SELECT DISTINCT priority FROM binned) p,
           (SELECT UNNEST(range(0, {_PSI_BINS})) AS bin) b
    ),
    counts AS (
      SELECT g.priority, g.bin,
             COUNT(*) FILTER (x.period = 'a') AS ca,
             COUNT(*) FILTER (x.period = 'b') AS cb
      FROM grid g
      LEFT JOIN binned x ON x.priority = g.priority AND x.bin = g.bin
      GROUP BY g.priority, g.bin
    ),
    tot AS (
      SELECT priority, SUM(ca) AS na, SUM(cb) AS nb FROM counts
      GROUP BY priority
    )
    SELECT c.priority,
           CAST(MAX(t.na) AS BIGINT) AS n_before,
           CAST(MAX(t.nb) AS BIGINT) AS n_after,
           ROUND(SUM(
             (CAST(c.cb + 1 AS DOUBLE) / (t.nb + {_PSI_BINS})
              - CAST(c.ca + 1 AS DOUBLE) / (t.na + {_PSI_BINS}))
             * ln((CAST(c.cb + 1 AS DOUBLE) / (t.nb + {_PSI_BINS}))
                  / (CAST(c.ca + 1 AS DOUBLE) / (t.na + {_PSI_BINS})))
           ), 6) AS psi
    FROM counts c JOIN tot t ON c.priority = t.priority
    GROUP BY c.priority
    """,
)
def stats_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per order priority between the
    1995-97 and 1999-2001 periods — THE production drift monitor for
    scored distributions (PSI < 0.1 stable, > 0.25 action). Equal-width
    o_totalprice bins with Laplace +1 smoothing so empty bins
    contribute a finite, engine-exact term instead of ln(0); a dense
    (priority × bin) grid keeps the bin set identical in both engines
    even when a bin is empty on one side only.

    Parity: bin ids are exact integer floors; smoothed shares are one
    double division each; ln of a ratio of such shares is the
    PMI-precedented ln-parity surface (text_collocations_pmi), and the
    final sum is ≤ {_PSI_BINS} terms per group, rounded at 6 dp.
    Plan: one scan, one (priority, bin) count shuffle, a broadcast of
    the 50-cell grid, and a ≤50-row final rollup — scale-free above the
    first aggregate."""
    o = table(spark, sf_dir, "orders")
    binned = (
        o.filter(
            (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
            | (F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp_ntz"))
        )
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.when(
                F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"),
                "a",
            )
            .otherwise("b")
            .alias("period"),
            F.least(
                F.lit(_PSI_BINS - 1),
                F.floor(F.col("o_totalprice") / _PSI_WIDTH).cast("int"),
            ).alias("bin"),
        )
    )
    counts = binned.groupBy("priority", "bin").agg(
        F.count(F.when(F.col("period") == "a", 1)).alias("ca"),
        F.count(F.when(F.col("period") == "b", 1)).alias("cb"),
    )
    grid = (
        binned.select("priority")
        .distinct()
        .crossJoin(
            F.broadcast(
                spark.range(_PSI_BINS).select(F.col("id").cast("int").alias("bin"))
            )
        )
    )
    dense = (
        grid.join(counts, ["priority", "bin"], "left")
        .fillna(0, subset=["ca", "cb"])
    )
    tot = dense.groupBy("priority").agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb")
    )
    pa = (F.col("ca") + 1).cast("double") / (F.col("na") + _PSI_BINS)
    pb = (F.col("cb") + 1).cast("double") / (F.col("nb") + _PSI_BINS)
    return (
        dense.join(tot, "priority")
        .groupBy("priority")
        .agg(
            F.max("na").alias("n_before"),
            F.max("nb").alias("n_after"),
            F.round(F.sum((pb - pa) * F.log(pb / pa)), 6).alias("psi"),
        )
    )


@query(
    "features_target_encoding",
    oracle=f"""
    WITH g AS (
      SELECT CAST(COUNT(*) FILTER (l_returnflag = 'R') AS DOUBLE)
             / COUNT(*) AS gmean
      FROM lineitem
    )
    SELECT p.p_brand,
           COUNT(*) AS n_lines,
           CAST(COUNT(*) FILTER (l.l_returnflag = 'R') AS BIGINT) AS n_returns,
           ROUND((COUNT(*) FILTER (l.l_returnflag = 'R')
                  + {_TE_M} * MAX(g.gmean))
                 / (COUNT(*) + {_TE_M}), 6) AS brand_return_encoding
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    CROSS JOIN g
    GROUP BY p.p_brand
    """,
)
def features_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed target (mean) encoding of part brand against the
    return-flag target — the high-cardinality-categorical featurization
    that replaces one-hot at scale: enc = (hits + m·global)/(n + m),
    m = {_TE_M}, shrinking rare brands toward the global return rate
    (empirical-Bayes smoothing, the Micci-Barreca scheme).

    Everything left of the final division is integer-exact (counts;
    the global rate is one exact-int division attached by a 1-row
    broadcast), so the encoding is one deterministic double expression
    per brand, rounded. Plan: broadcast part join, single (brand)
    aggregate; the global-rate pass shares the lineitem scan. At
    100 TB: identical — target encoding is a groupBy, which is why it
    scales where one-hot and learned embeddings need a vocabulary
    build."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    g = li.agg(
        (
            F.count(F.when(F.col("l_returnflag") == "R", 1)).cast("double")
            / F.count(F.lit(1))
        ).alias("gmean")
    )
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).crossJoin(
        F.broadcast(g)
    )
    hits = F.count(F.when(F.col("l_returnflag") == "R", 1))
    return joined.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_lines"),
        hits.cast("bigint").alias("n_returns"),
        F.round(
            (hits + _TE_M * F.max("gmean")) / (F.count(F.lit(1)) + _TE_M), 6
        ).alias("brand_return_encoding"),
    )
