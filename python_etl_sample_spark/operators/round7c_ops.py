"""Round-7 batch 3 — behavioral-model and privacy-mechanism operators:

- ``events_markov_kstep``: 4-step transition probabilities P⁴ of the
  first-order user-behavior Markov chain (events_transition_matrix is
  P¹) via unrolled sparse matrix powers over the domain-bounded
  (state, state) pair table.
- ``anon_ldp_frequency``: local-differential-privacy frequency
  estimation by k-ary randomized response (ε = ln 3) with a
  deterministic integer-hash coin and the exact closed-form debiasing
  the integer parameters admit — the LDP member of the privacy tier
  next to k-anonymity / l-diversity.

Determinism: transition probabilities start from exact integer counts
(one IEEE division each); each matrix-multiply term is rounded at 12 dp
and decimal-summed over the ≤|states| intermediate states; the
randomized-response coin is pure int64 hash arithmetic (a scanned site
of the tests/test_ansi_edges.py overflow sweep) and the estimator is
integer until a single final division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_etl_sample_spark.functions.determinism import DEC, dsum_sql
from python_etl_sample_spark.registry import query
from python_etl_sample_spark.sources import table


# ---------------------------------------------------------------------------
# events_markov_kstep
# ---------------------------------------------------------------------------

_MK_STEPS = 4

_MK_P1 = """
    nxt AS (
      SELECT event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    cnt AS (
      SELECT event_type, next_type, COUNT(*) AS n
      FROM nxt WHERE next_type IS NOT NULL
      GROUP BY event_type, next_type
    ),
    p1 AS (
      SELECT event_type AS a, next_type AS b,
             n * 1.0 / SUM(n) OVER (PARTITION BY event_type) AS p
      FROM cnt
    )"""


def _mk_oracle() -> str:
    parts = [_MK_P1]
    for s in range(2, _MK_STEPS + 1):
        parts.append(f"""
    p{s} AS (
      SELECT x.a, y.b, {dsum_sql('round(x.p * y.p, 12)')} AS p
      FROM p{s - 1} x JOIN p1 y ON y.a = x.b
      GROUP BY x.a, y.b
    )""")
    return f"""WITH {",".join(parts)}
    SELECT a AS event_type, b AS next_type,
           round(p, 6) AS p{_MK_STEPS}
    FROM p{_MK_STEPS}"""


@query("events_markov_kstep", oracle=_mk_oracle())
def events_markov_kstep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-step behavior forecast: (P⁴)[a,b] — the probability a user in
    state ``a`` is in state ``b`` four interactions later — computed by
    unrolled sparse multiplies of the first-order transition matrix
    (``events_transition_matrix`` is P¹; this is the planning horizon
    a campaign system actually asks about).

    Determinism: P¹ entries are exact-int counts with one IEEE
    division; every multiply term is rounded at 12 dp and decimal-
    summed over the intermediate state (order-independent), so each
    power is bit-identical in both engines; output rounded 6 dp.

    Scale: the raw-event work is ONE user-partitioned lag shuffle +
    one map-side-combined count (identical to P¹); every multiply
    joins (state, state) tables whose size is |event_types|² — domain-
    bounded, broadcast-joined, constant cost no matter the corpus."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cnt = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wt = Window.partitionBy("event_type")
    # persist the |types|²-bounded P¹ (≤25 rows): the unrolled powers
    # reference it once per step, and without a barrier each reference
    # re-evaluates the data-sized lag window + count (r14 plan audit:
    # 15 exchanges)
    p1 = cnt.select(
        F.col("event_type").alias("a"),
        F.col("next_type").alias("b"),
        (F.col("n") * 1.0 / F.sum("n").over(wt)).alias("p"),
    ).persist()
    pk = p1
    for _ in range(_MK_STEPS - 1):
        x = pk.select(F.col("a"), F.col("b").alias("m"), F.col("p").alias("px"))
        y = p1.select(
            F.col("a").alias("m"), F.col("b"), F.col("p").alias("py")
        )
        pk = (
            x.join(F.broadcast(y), "m")
            .groupBy("a", "b")
            .agg(
                F.sum(F.round(F.col("px") * F.col("py"), 12).cast(DEC))
                .cast("double")
                .alias("p")
            )
        )
    return pk.select(
        F.col("a").alias("event_type"),
        F.col("b").alias("next_type"),
        F.round("p", 6).alias(f"p{_MK_STEPS}"),
    )


# ---------------------------------------------------------------------------
# anon_ldp_frequency
# ---------------------------------------------------------------------------

#: fixed alphabet of the randomized response (sorted event types);
#: index order is part of the mechanism's definition in BOTH engines
_LDP_CATS = ("click", "error", "purchase", "signup", "view")
_LDP_D = len(_LDP_CATS)
#: ε = ln 3 ⇒ keep-probability p = e^ε/(e^ε+d−1) = 3/7 — the integer
#: threshold u·7 < 3·M makes the coin exact (no float compare)
_LDP_M = 1000003

_LDP_CASE_IDX = "CASE event_type " + " ".join(
    f"WHEN '{c}' THEN {i}" for i, c in enumerate(_LDP_CATS)
) + " END"
_LDP_CASE_CAT = "CASE r " + " ".join(
    f"WHEN {i} THEN '{c}'" for i, c in enumerate(_LDP_CATS)
) + " END"


@query(
    "anon_ldp_frequency",
    oracle=f"""
    WITH base AS (
      SELECT {_LDP_CASE_IDX} AS t,
             ((event_id % 3221225473) * 2654435761) % {_LDP_M} AS u
      FROM events
    ),
    reported AS (
      SELECT CASE WHEN u * 7 < 3 * {_LDP_M} THEN t
                  WHEN u % {_LDP_D - 1} < t THEN u % {_LDP_D - 1}
                  ELSE u % {_LDP_D - 1} + 1 END AS r
      FROM base
    ),
    obs AS (
      SELECT {_LDP_CASE_CAT} AS event_type, COUNT(*) AS observed_n
      FROM reported GROUP BY r
    ),
    tru AS (
      SELECT event_type, COUNT(*) AS true_n FROM events GROUP BY event_type
    ),
    tot AS (SELECT COUNT(*) AS n FROM events)
    SELECT o.event_type, t.true_n, o.observed_n,
           round((7 * o.observed_n - (SELECT n FROM tot)) / 2.0, 2)
             AS estimated_n
    FROM obs o JOIN tru t USING (event_type)
    """,
)
def anon_ldp_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-differential-privacy frequency release: k-ary randomized
    response over event_type at ε = ln 3 — each event keeps its true
    category with probability 3/7, else reports one of the other 4
    uniformly — then the unbiased frequency estimator
    n̂_c = (obs_c − N·q)/(p − q), which the integer parameters reduce
    to (7·obs_c − N)/2 exactly. true_n rides along so the release
    error is inspectable at fixture scale.

    Determinism: the coin is the repo's audited multiplicative hash of
    event_id (a scanned site of the ansi-edges overflow sweep); the
    keep/flip decision is the INTEGER comparison u·7 < 3M and the flip
    target u mod (d−1) skip-mapped over the alphabet — no float enters
    until the single final division by 2.

    Scale (r14 reshape, guide §1.2): ONE map-side-combined groupBy on
    (true category, reported category) — ≤ d² = 25 groups — feeds the
    observed rollup, the true rollup AND the total, replacing three
    separate passes over events; no shuffle carries more than
    (category pair, count). The mechanism itself is embarrassingly
    map-only, exactly how LDP collection behaves on-device at fleet
    scale."""
    ev = table(spark, sf_dir, "events")
    t = F.expr(_LDP_CASE_IDX)
    u = ((F.col("event_id") % 3221225473) * 2654435761) % _LDP_M
    base = ev.select("event_type", t.alias("t"), u.alias("u"))
    r = (
        F.when(F.col("u") * 7 < 3 * _LDP_M, F.col("t"))
        .when(F.col("u") % (_LDP_D - 1) < F.col("t"), F.col("u") % (_LDP_D - 1))
        .otherwise(F.col("u") % (_LDP_D - 1) + 1)
    )
    cnt = (
        base.select("event_type", r.alias("r"))
        .groupBy("event_type", "r")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    obs = (
        cnt.groupBy("r")
        .agg(F.sum("c").alias("observed_n"))
        .select(F.expr(_LDP_CASE_CAT).alias("event_type"), "observed_n")
    )
    tru = cnt.groupBy("event_type").agg(F.sum("c").alias("true_n"))
    tot = cnt.agg(F.sum("c").alias("n"))
    return (
        obs.join(tru, "event_type")
        .crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "true_n",
            "observed_n",
            F.round((7 * F.col("observed_n") - F.col("n")) / 2.0, 2).alias(
                "estimated_n"
            ),
        )
    )


# ---------------------------------------------------------------------------
# graph_harmonic_centrality
# ---------------------------------------------------------------------------

_HC_ROUNDS = 3
_HC_INF = 999
_HC_SEEDS = 10


def _hc_round_sql(prev: str, cur: str) -> str:
    """One per-seed BFS relaxation (sentinel-integer arithmetic keyed
    by (seed, node) — the landmark generalization of _bfs_round_sql)."""
    return f"""
    {cur} AS MATERIALIZED (
      SELECT p.seed, p.node,
             LEAST(p.dist, COALESCE(m.nbr_min + 1, {_HC_INF})) AS dist
      FROM {prev} p
      LEFT JOIN (
        SELECT q.seed, e.dst AS node, MIN(q.dist) AS nbr_min
        FROM dir e JOIN {prev} q ON q.node = e.src AND q.dist < {_HC_INF}
        GROUP BY q.seed, e.dst
      ) m ON m.seed = p.seed AND m.node = p.node
      UNION ALL
      SELECT m.seed, m.node, m.nbr_min + 1 AS dist
      FROM (
        SELECT q.seed, e.dst AS node, MIN(q.dist) AS nbr_min
        FROM dir e JOIN {prev} q ON q.node = e.src AND q.dist < {_HC_INF}
        GROUP BY q.seed, e.dst
      ) m
      LEFT JOIN {prev} p ON p.seed = m.seed AND p.node = m.node
      WHERE p.node IS NULL
    )"""


_HC_EDGES_SQL = """
    li AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
      WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1996-01-01'
    ),
    edges AS MATERIALIZED (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    deg AS (
      SELECT node, COUNT(*) AS deg FROM (
        SELECT u AS node FROM edges UNION ALL SELECT v AS node FROM edges
      ) GROUP BY node
    ),
    dir AS MATERIALIZED (
      SELECT u AS src, v AS dst FROM edges
      UNION ALL
      SELECT v AS src, u AS dst FROM edges
    )
"""


@query(
    "graph_harmonic_centrality",
    oracle=f"""
    WITH {_HC_EDGES_SQL},
    seeds AS (
      SELECT node FROM deg ORDER BY deg DESC, node LIMIT {_HC_SEEDS}
    ),
    h0 AS (
      SELECT node AS seed, node, 0 AS dist FROM seeds
    ),
    {_hc_round_sql("h0", "h1")},
    {_hc_round_sql("h1", "h2")},
    {_hc_round_sql("h2", "h3")}
    SELECT seed,
           CAST(COUNT(*) FILTER (WHERE dist = 1) AS BIGINT) AS reached_1,
           CAST(COUNT(*) FILTER (WHERE dist = 2) AS BIGINT) AS reached_2,
           CAST(COUNT(*) FILTER (WHERE dist = 3) AS BIGINT) AS reached_3,
           round(COUNT(*) FILTER (WHERE dist = 1)
                 + COUNT(*) FILTER (WHERE dist = 2) / 2.0
                 + COUNT(*) FILTER (WHERE dist = 3) / 3.0, 6) AS harmonic3
    FROM h{_HC_ROUNDS}
    WHERE dist BETWEEN 1 AND {_HC_ROUNDS}
    GROUP BY seed
    """,
)
def graph_harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Landmark harmonic centrality: for the {_HC_SEEDS} highest-degree
    parts of the co-purchase graph, H₃(s) = Σ_{{d(s,v)≤3}} 1/d(s,v) —
    the bounded-radius closeness variant used to rank hub influence
    (harmonic handles disconnected graphs where closeness breaks).

    Per-seed exact hop distances come from a (seed, node)-keyed BSP
    relaxation — the landmark generalization of graph_bfs_hops' merged
    multi-source form (which computes MIN over seeds and so cannot
    produce per-seed terms). Integer sentinel arithmetic end to end;
    the only float ops are the two harmonic divisions on exact counts.

    Scale: the state frame is |seeds|·|reached| rows — landmarks are a
    CHOSEN constant (10 here), so state is a bounded multiple of the
    node set, the textbook trade of landmark/hyperball centrality
    families. Each round: one frontier⋈edges equi-join on src, one
    (seed, dst) partial-agg MIN shuffle, one merge join. Lineage is cut
    per round with lazy localCheckpoint — graph_bfs_hops' measured rule
    for multiplicative self-reference (its docstring records 5.8 s →
    2.6 s at sf0.1)."""
    from python_etl_sample_spark.operators.graph_analytics import (
        _copurchase_edges,
    )

    edges = _copurchase_edges(spark, sf_dir).localCheckpoint(eager=False)
    dir_edges = edges.select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    ).unionAll(edges.select(F.col("v").alias("src"), F.col("u").alias("dst")))
    deg = dir_edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    seeds = (
        deg.orderBy(F.desc("deg"), F.asc("node"))
        .limit(_HC_SEEDS)
        .select("node")
    )
    state = seeds.select(
        F.col("node").alias("seed"), F.col("node"), F.lit(0).alias("dist")
    )
    for _ in range(_HC_ROUNDS):
        nbr = (
            state.filter(F.col("dist") < _HC_INF)
            .join(dir_edges, state.node == dir_edges.src)
            .groupBy("seed", F.col("dst").alias("node"))
            .agg(F.min("dist").alias("nbr_min"))
        )
        state = (
            state.join(nbr, ["seed", "node"], "full")
            .select(
                "seed",
                "node",
                F.least(
                    F.coalesce(F.col("dist"), F.lit(_HC_INF)),
                    F.coalesce(F.col("nbr_min") + 1, F.lit(_HC_INF)),
                ).alias("dist"),
            )
            .localCheckpoint(eager=False)
        )
    return (
        state.filter(
            (F.col("dist") >= 1) & (F.col("dist") <= _HC_ROUNDS)
        )
        .groupBy("seed")
        .agg(
            F.count(F.when(F.col("dist") == 1, 1)).alias("reached_1"),
            F.count(F.when(F.col("dist") == 2, 1)).alias("reached_2"),
            F.count(F.when(F.col("dist") == 3, 1)).alias("reached_3"),
            F.round(
                F.count(F.when(F.col("dist") == 1, 1))
                + F.count(F.when(F.col("dist") == 2, 1)) / 2.0
                + F.count(F.when(F.col("dist") == 3, 1)) / 3.0,
                6,
            ).alias("harmonic3"),
        )
    )
