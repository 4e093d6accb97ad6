"""Round-7 batch 5 — experimentation, resampling inference, keyword
extraction, and video shot detection:

- ``events_uplift_cuped``: CUPED variance-reduced A/B readout — the
  modern experimentation estimator (pre-period covariate adjustment)
  on top of events_ab_lift's deterministic hash split.
- ``stats_permutation_test``: randomization test for the urgent-vs-rest
  order-value gap with B = 32 deterministic hash reassignments — the
  label-shuffling sibling of stats_bootstrap_poisson_ci.
- ``text_rake_keywords``: RAKE keyword extraction (stopword-delimited
  phrases, degree/frequency word scores) — the classic unsupervised
  keyphrase scorer over the documents corpus.
- ``multimodal_shot_boundary``: consecutive-frame delta over the real
  concatenated-PPM streams of multimodal_frame_sample, flagging cuts —
  the shot-segmentation step of a video curation pipeline.

Determinism: CUPED/permutation statistics are closed-form expressions
of exact integer (cents) moment sums — wide-decimal accumulators, one
double conversion, identical parenthesization in both engines; RAKE
word scores are rational doubles rounded at 6 dp and phrase scores are
decimal sums of those rounded terms; shot deltas are integer pixel
arithmetic divided once.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_etl_sample_spark.functions.determinism import DEC, dsum_sql
from python_etl_sample_spark.registry import query
from python_etl_sample_spark.sources import table

_VCENTS = "CAST(round(value * 100) AS BIGINT)"
_OCENTS = "CAST(round(o_totalprice * 100) AS BIGINT)"
#: wide-decimal accumulator for products of cents sums (int64-safe
#: far beyond 100 TB row counts)
_DEC38 = "decimal(38,0)"


# ---------------------------------------------------------------------------
# events_uplift_cuped
# ---------------------------------------------------------------------------

_CUPED_SPLIT = "2024-01-16"


@query(
    "events_uplift_cuped",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             CASE WHEN ((user_id % 3221225473) * 2654435761) % 100 < 50
                  THEN 'A' ELSE 'B' END AS arm,
             SUM(CASE WHEN ts < TIMESTAMP '{_CUPED_SPLIT}'
                      THEN {_VCENTS} ELSE 0 END) AS x,
             SUM(CASE WHEN ts >= TIMESTAMP '{_CUPED_SPLIT}'
                      THEN {_VCENTS} ELSE 0 END) AS y
      FROM events GROUP BY user_id
    ),
    pool AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x AS DECIMAL(38,0)) * y) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(y AS DECIMAL(38,0)) * y) AS DOUBLE) AS syy
      FROM per_user
    ),
    arms AS (
      SELECT arm, COUNT(*) AS n_users,
             CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS ax,
             CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS ay
      FROM per_user GROUP BY arm
    )
    SELECT a.arm, CAST(a.n_users AS BIGINT) AS n_users,
           round(a.ay / a.n_users / 100.0, 6) AS mean_y,
           round((a.ay / a.n_users
                  - ((p.n * p.sxy - p.sx * p.sy)
                     / (p.n * p.sxx - p.sx * p.sx))
                    * (a.ax / a.n_users - p.sx / p.n)) / 100.0, 6)
             AS mean_y_adj,
           round((p.n * p.sxy - p.sx * p.sy)
                 / (p.n * p.sxx - p.sx * p.sx), 6) AS theta,
           round(((p.n * p.sxy - p.sx * p.sy)
                  * (p.n * p.sxy - p.sx * p.sy))
                 / ((p.n * p.sxx - p.sx * p.sx)
                    * (p.n * p.syy - p.sy * p.sy)), 6) AS var_reduction
    FROM arms a CROSS JOIN pool p
    """,
)
def events_uplift_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced A/B readout: users split by the
    events_ab_lift hash; X = pre-period spend (before {_CUPED_SPLIT}),
    Y = post-period spend; θ = cov(X,Y)/var(X) POOLED across arms (the
    standard choice — arm-specific θ leaks outcome information); the
    adjusted arm mean is mean_Y − θ·(mean_X_arm − mean_X_pool), and
    var_reduction = corr(X,Y)² is the fraction of outcome variance the
    covariate removes — the quantity that decides whether the
    experiment can be shortened.

    Every statistic is a CLOSED FORM over exact integer-cents moment
    sums (Σx, Σy, Σxy, Σxx, Σyy in 38-digit decimal accumulators —
    int64-safe at any corpus scale), converted to double once and
    combined with identical parenthesization in both engines; no
    per-row float accumulates anywhere.

    Scale: one groupBy(user) with map-side combine (the only data-
    sized shuffle), then a 1-row pooled reduction and a 2-row arm
    frame joined by broadcast."""
    ev = table(spark, sf_dir, "events")
    split = F.lit(_CUPED_SPLIT).cast("timestamp_ntz")
    per_user = ev.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("ts") < split, F.expr(_VCENTS)).otherwise(0)
        ).alias("x"),
        F.sum(
            F.when(F.col("ts") >= split, F.expr(_VCENTS)).otherwise(0)
        ).alias("y"),
    ).select(
        F.when(
            ((F.col("user_id") % 3221225473) * 2654435761) % 100 < 50, "A"
        )
        .otherwise("B")
        .alias("arm"),
        "x",
        "y",
    )
    xd = F.col("x").cast(_DEC38)
    yd = F.col("y").cast(_DEC38)
    pool = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).cast("double").alias("sx"),
        F.sum(yd).cast("double").alias("sy"),
        F.sum(xd * F.col("y")).cast("double").alias("sxy"),
        F.sum(xd * F.col("x")).cast("double").alias("sxx"),
        F.sum(yd * F.col("y")).cast("double").alias("syy"),
    )
    arms = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(xd).cast("double").alias("ax"),
        F.sum(yd).cast("double").alias("ay"),
    )
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    theta = cov / varx
    return arms.crossJoin(F.broadcast(pool)).select(
        "arm",
        F.col("n_users").cast("long").alias("n_users"),
        F.round(F.col("ay") / F.col("n_users") / 100.0, 6).alias("mean_y"),
        F.round(
            (
                F.col("ay") / F.col("n_users")
                - theta
                * (F.col("ax") / F.col("n_users") - F.col("sx") / F.col("n"))
            )
            / 100.0,
            6,
        ).alias("mean_y_adj"),
        F.round(theta, 6).alias("theta"),
        F.round((cov * cov) / (varx * vary), 6).alias("var_reduction"),
    )


# ---------------------------------------------------------------------------
# stats_permutation_test
# ---------------------------------------------------------------------------

_PT_B = 32


@query(
    "stats_permutation_test",
    oracle=f"""
    WITH base AS (
      SELECT {_OCENTS} AS cents,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS grp,
             o_orderkey AS k
      FROM orders
    ),
    obs AS (
      SELECT ABS(CAST(SUM(CASE WHEN grp = 1 THEN cents END) AS DOUBLE)
                 / COUNT(CASE WHEN grp = 1 THEN 1 END)
                 - CAST(SUM(CASE WHEN grp = 0 THEN cents END) AS DOUBLE)
                 / COUNT(CASE WHEN grp = 0 THEN 1 END)) / 100.0 AS t_obs
      FROM base
    ),
    draws AS (
      SELECT b.b,
             CAST((((k % 3221225473) * 2654435761 + b.b * 2246822519)
                   % 1000003) % 2 AS INT) AS g,
             cents
      FROM base CROSS JOIN (SELECT UNNEST(range(0, {_PT_B})) AS b) b
    ),
    stats AS (
      SELECT b,
             ABS(CAST(SUM(CASE WHEN g = 1 THEN cents END) AS DOUBLE)
                 / COUNT(CASE WHEN g = 1 THEN 1 END)
                 - CAST(SUM(CASE WHEN g = 0 THEN cents END) AS DOUBLE)
                 / COUNT(CASE WHEN g = 0 THEN 1 END)) / 100.0 AS t_b
      FROM draws GROUP BY b
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM base) AS n_rows,
           {_PT_B} AS n_resamples,
           round((SELECT t_obs FROM obs), 6) AS t_obs,
           CAST(SUM(CASE WHEN t_b >= (SELECT t_obs FROM obs)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_ge,
           round((1.0 + SUM(CASE WHEN t_b >= (SELECT t_obs FROM obs)
                            THEN 1 ELSE 0 END)) / (1.0 + {_PT_B}), 6)
             AS p_value
    FROM stats
    """,
)
def stats_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Randomization test for the urgent-vs-rest mean order value gap:
    T = |mean(urgent) − mean(rest)|, compared against {_PT_B}
    deterministic hash reassignments of the group label (the audited
    mix of o_orderkey with the resample index as the second-hash term —
    the bootstrap operator's exact machinery pointed at labels instead
    of weights; the mix reduces mod the odd prime 1000003 BEFORE the
    final mod 2 — both multipliers are odd, so a direct mod 2 would
    collapse every resample to key-parity ⊕ b and the test would be a
    single split in disguise). p = (1 + #{{T_b ≥ T_obs}})/(1 + B), the standard
    add-one randomization p-value. Bernoulli label reassignment (not a
    size-preserving permutation) — the variant that needs no global
    shuffle, which is WHY it is the cluster-scale form; stated here so
    nobody mistakes it for an exact permutation.

    Determinism: every statistic is |exact-int sum / exact count −
    exact-int sum / exact count| — two IEEE divisions and a subtract on
    identical operands in both engines, so even the ≥ comparisons are
    bit-stable.

    Scale: the ×{_PT_B} expansion is map-side (explode + combine);
    reducer state is 2·{_PT_B} partial sums. Same shape as the Poisson
    bootstrap at similarity scale."""
    o = table(spark, sf_dir, "orders")
    base = o.select(
        F.expr(_OCENTS).alias("cents"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        )
        .otherwise(0)
        .alias("grp"),
        F.col("o_orderkey").alias("k"),
    )

    def gap(df: DataFrame, grp: str, part) -> DataFrame:
        return df.groupBy(*part).agg(
            (
                F.abs(
                    F.sum(F.when(F.col(grp) == 1, F.col("cents"))).cast(
                        "double"
                    )
                    / F.count(F.when(F.col(grp) == 1, 1))
                    - F.sum(F.when(F.col(grp) == 0, F.col("cents"))).cast(
                        "double"
                    )
                    / F.count(F.when(F.col(grp) == 0, 1))
                )
                / 100.0
            ).alias("t")
        )

    obs = gap(base, "grp", [])
    n_rows = base.agg(F.count(F.lit(1)).alias("n_rows"))
    draws = base.select(
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(_PT_B - 1))).alias("b"),
        F.col("k"),
    ).select(
        "b",
        "cents",
        (
            (
                ((F.col("k") % 3221225473) * 2654435761
                 + F.col("b") * 2246822519)
                % 1000003
            )
            % 2
        )
        .cast("int")
        .alias("g"),
    )
    stats = gap(draws, "g", ["b"])
    return (
        stats.crossJoin(F.broadcast(obs.select(F.col("t").alias("t_obs"))))
        .agg(
            F.lit(_PT_B).alias("n_resamples"),
            F.round(F.max("t_obs"), 6).alias("t_obs"),
            F.sum(F.when(F.col("t") >= F.col("t_obs"), 1).otherwise(0))
            .cast("long")
            .alias("n_ge"),
            F.round(
                (
                    1.0
                    + F.sum(
                        F.when(F.col("t") >= F.col("t_obs"), 1).otherwise(0)
                    )
                )
                / (1.0 + _PT_B),
                6,
            ).alias("p_value"),
        )
        .crossJoin(F.broadcast(n_rows))
        .select("n_rows", "n_resamples", "t_obs", "n_ge", "p_value")
    )


# ---------------------------------------------------------------------------
# text_rake_keywords
# ---------------------------------------------------------------------------

_RAKE_STOP = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")
_RAKE_STOP_SQL = "('" + "', '".join(_RAKE_STOP) + "')"
_RAKE_TOPK = 10


@query(
    "text_rake_keywords",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(text), '\\s+') AS t
      FROM documents
    ),
    tok AS (
      SELECT doc_id, t[CAST(u.i AS INT) + 1] AS token,
             CAST(u.i + 1 AS BIGINT) AS pos
      FROM toks, UNNEST(range(0, len(t))) AS u(i)
      WHERE t[CAST(u.i AS INT) + 1] <> ''
    ),
    content AS (
      SELECT doc_id, token, pos,
             pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos)
               AS grp
      FROM tok WHERE token NOT IN {_RAKE_STOP_SQL}
    ),
    phrases AS (
      SELECT doc_id, grp, MIN(pos) AS start_pos, COUNT(*) AS n_words
      FROM content GROUP BY doc_id, grp
    ),
    word_stats AS (
      SELECT c.token,
             COUNT(*) AS freq,
             SUM(p.n_words) AS degree
      FROM content c
      JOIN phrases p ON p.doc_id = c.doc_id AND p.grp = c.grp
      GROUP BY c.token
    ),
    scored AS (
      SELECT c.doc_id, c.grp,
             MIN(p.start_pos) AS start_pos,
             MIN(p.n_words) AS n_words,
             string_agg(c.token, ' ' ORDER BY c.pos) AS phrase,
             {dsum_sql('round(w.degree * 1.0 / w.freq, 6)')} AS score
      FROM content c
      JOIN phrases p ON p.doc_id = c.doc_id AND p.grp = c.grp
      JOIN word_stats w ON w.token = c.token
      GROUP BY c.doc_id, c.grp
    )
    SELECT doc_id, phrase, CAST(n_words AS BIGINT) AS n_words,
           round(score, 6) AS score
    FROM scored
    ORDER BY score DESC, doc_id, start_pos
    LIMIT {_RAKE_TOPK}
    """,
)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction: phrases are maximal stopword-free token
    runs (the gaps-and-islands grouping pos − row_number); each word
    scores degree/freq where degree sums the lengths of every phrase
    containing it; a phrase scores the sum of its words' scores. Top-10
    phrases corpus-wide, ties broken (doc_id, start_pos).

    Determinism: freq/degree are exact integers; each word score is one
    IEEE division rounded at 6 dp; phrase scores are order-independent
    decimal sums of those rounded terms; the top-k order is total.

    Scale: tokenization is map-only; the islands grouping is a window
    PARTITIONED BY doc (parallel across documents — no global order);
    word_stats is one (token) groupBy, broadcast back; the final top-10
    is TakeOrdered, not a global sort."""
    d = table(spark, sf_dir, "documents")
    tok = (
        d.select(
            "doc_id",
            F.posexplode(F.split(F.lower(F.col("text")), r"\s+")).alias(
                "p0", "token"
            ),
        )
        .filter(F.col("token") != "")
        .select("doc_id", "token", (F.col("p0") + 1).cast("long").alias("pos"))
    )
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    # persist (r14): content feeds the phrase islands and both scoring
    # joins, phrases feeds word_stats and the phrase assembly — without
    # barriers the tokenize + islands window re-evaluates 3x
    content = (
        tok.filter(~F.col("token").isin(*_RAKE_STOP))
        .withColumn("grp", F.col("pos") - F.row_number().over(w_doc))
        .persist()
    )
    phrases = content.groupBy("doc_id", "grp").agg(
        F.min("pos").alias("start_pos"), F.count(F.lit(1)).alias("n_words")
    ).persist()
    word_stats = (
        content.join(phrases, ["doc_id", "grp"])
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("freq"),
            F.sum("n_words").alias("degree"),
        )
    )
    scored = (
        content.join(phrases, ["doc_id", "grp"])
        .join(F.broadcast(word_stats), "token")
        .groupBy("doc_id", "grp")
        .agg(
            F.min("start_pos").alias("start_pos"),
            F.min("n_words").alias("n_words"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "token"))
                    ),
                    lambda s: s["token"],
                ),
            ).alias("phrase"),
            F.sum(
                F.round(F.col("degree") * 1.0 / F.col("freq"), 6).cast(DEC)
            )
            .cast("double")
            .alias("score"),
        )
    )
    return (
        scored.orderBy(F.desc("score"), F.asc("doc_id"), F.asc("start_pos"))
        .limit(_RAKE_TOPK)
        .select(
            "doc_id",
            "phrase",
            F.col("n_words").cast("long").alias("n_words"),
            F.round("score", 6).alias("score"),
        )
    )


# ---------------------------------------------------------------------------
# multimodal_shot_boundary
# ---------------------------------------------------------------------------

_SB_CUT = 40.0  # mean |Δred| per pixel above this = shot cut


@query(
    "multimodal_shot_boundary",
    oracle=f"""
    WITH f AS (
      SELECT doc_id, text,
             2 + doc_id % 7 AS n_frames,
             4 + doc_id % 5 AS w,
             3 + doc_id % 4 AS h,
             greatest(length(text), 1) AS L
      FROM documents
    ), pairs AS (
      SELECT doc_id, text, w, h, L,
             UNNEST(range(1, n_frames)) AS fno
      FROM f WHERE n_frames >= 2
    )
    SELECT doc_id,
           CAST(fno AS INT) AS frame_no,
           round(
             list_aggregate(
               list_transform(range(0, w*h),
                 j -> CASE WHEN length(text) = 0 THEN 0
                      ELSE abs(unicode(text[CAST((3*j + fno) % L AS INT) + 1])
                               % 256
                               - unicode(text[CAST((3*j + fno - 1) % L AS INT)
                                              + 1]) % 256) END),
               'sum') / CAST(w*h AS DOUBLE), 6) AS delta_r,
           CAST(list_aggregate(
               list_transform(range(0, w*h),
                 j -> CASE WHEN length(text) = 0 THEN 0
                      ELSE abs(unicode(text[CAST((3*j + fno) % L AS INT) + 1])
                               % 256
                               - unicode(text[CAST((3*j + fno - 1) % L AS INT)
                                              + 1]) % 256) END),
               'sum') / CAST(w*h AS DOUBLE) > {_SB_CUT} AS INT) AS is_cut
    FROM pairs
    """,
)
def multimodal_shot_boundary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary detection over the same real concatenated-PPM
    streams multimodal_frame_sample decodes: for every consecutive
    frame pair, the mean absolute red-channel delta per pixel, flagged
    as a cut above {_SB_CUT} — the shot-segmentation step a video
    curation pipeline runs before per-shot sampling.

    The mapInPandas worker decodes the REAL container (walks P6
    headers, diffs decoded pixel buffers); the oracle recomputes the
    expected deltas from the generative definition of the frames
    (text char codes rolled by frame index) with list arithmetic — a
    header slip, off-by-one frame index, or wrong channel stride
    breaks the hash. Deltas are integer sums divided once (no 6-dp tie
    is reachable: w·h has only {{2,3,5,7}} factors — the frame_sample
    note).

    Scale: map-only, no shuffle; payloads stay columnar binary; one
    output row per frame PAIR (n_frames−1 per doc)."""
    import pandas as pd  # noqa: F401 (worker-side import)

    from python_etl_sample_spark.operators.multimodal import (
        encode_ppm,
        encode_ppm_stream,
        iter_ppm_frames,
    )

    d = table(spark, sf_dir, "documents").select("doc_id", "text")

    def diff_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        out = {k: [] for k in ("doc_id", "frame_no", "delta_r", "is_cut")}
        for pdf in batches:
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                n_frames = 2 + int(doc_id) % 7
                w, h = 4 + int(doc_id) % 5, 3 + int(doc_id) % 4
                src = text or "\x00"
                L = len(src)
                need = w * h * 3
                frames = [
                    encode_ppm(
                        w,
                        h,
                        bytes(ord(src[(i + f) % L]) % 256 for i in range(need)),
                    )
                    for f in range(n_frames)
                ]
                decoded = [
                    rgb for (_, _, rgb) in iter_ppm_frames(
                        encode_ppm_stream(frames)
                    )
                ]
                for fno in range(1, len(decoded)):
                    prev_r = decoded[fno - 1][0::3]
                    cur_r = decoded[fno][0::3]
                    sdiff = sum(
                        abs(a - b) for a, b in zip(cur_r, prev_r)
                    )
                    delta = round(sdiff / (w * h), 6)
                    out["doc_id"].append(int(doc_id))
                    out["frame_no"].append(fno)
                    out["delta_r"].append(delta)
                    out["is_cut"].append(int(delta > _SB_CUT))
        yield pd.DataFrame(out)

    return d.mapInPandas(
        diff_batches,
        "doc_id bigint, frame_no int, delta_r double, is_cut int",
    )
