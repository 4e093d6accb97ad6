"""Round-7 batch-15 invariants (operators/round7o_ops.py): Friedman
against the textbook no-tie formula and hand-ranked blocks, balanced
downsampling's exact-balance and determinism guarantees."""

from __future__ import annotations

import datetime as dt

from python_etl_sample_spark.registry import REGISTRY, load_all_operators

load_all_operators()

SF_DIR = "/root/testdata/sf0.001"

_D = dt.datetime

_EV_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string,"
    " value double, props string"
)
_ORD_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string,"
    " o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string"
)


def _write(spark, tmpdir, name, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        f"{tmpdir}/{name}.parquet"
    )


# ---------------------------------------------------------------------------
# stats_friedman
# ---------------------------------------------------------------------------


def _block_events(blocks):
    """blocks: list of {type: cents} per day -> events rows."""
    base = _D(2024, 8, 1)
    rows, eid = [], 0
    for d, day in enumerate(blocks):
        for et, cents in day.items():
            eid += 1
            rows.append(
                (eid, base + dt.timedelta(days=d), 1, et, cents / 100.0, "{}")
            )
    return rows


def test_friedman_textbook_no_ties(spark, tmp_path):
    """Three treatments, four complete blocks with a consistent
    ordering a < b < c in every block: rank sums are 4, 8, 12 and the
    no-tie Friedman formula gives χ² = 12/(4·3·4)·(16+64+144) − 3·4·4
    = 8 — the maximal value for b=4, k=3."""
    blocks = [
        {"a": 100 + d, "b": 200 + d, "c": 300 + d} for d in range(4)
    ]
    _write(spark, tmp_path, "events", _block_events(blocks), _EV_SCHEMA)
    r = REGISTRY["stats_friedman"].fn(spark, str(tmp_path)).collect()[0]
    assert (r["n_blocks"], r["n_treatments"], r["df"]) == (4, 3, 2)
    assert abs(r["chi2"] - 8.0) < 1e-9


def test_friedman_no_treatment_effect_is_near_zero(spark, tmp_path):
    """Orderings that rotate across blocks cancel: every treatment
    gets each rank once over k blocks → all rank sums equal → χ² = 0."""
    vals = [100, 200, 300]
    blocks = []
    for rot in range(3):
        blocks.append(
            {t: vals[(i + rot) % 3] for i, t in enumerate(("a", "b", "c"))}
        )
    _write(spark, tmp_path, "events", _block_events(blocks), _EV_SCHEMA)
    r = REGISTRY["stats_friedman"].fn(spark, str(tmp_path)).collect()[0]
    assert r["chi2"] == 0.0


def test_friedman_all_tied_blocks_are_null(spark, tmp_path):
    """Every treatment equal in every block → zero denominator →
    NULL, not an error."""
    blocks = [{"a": 100, "b": 100, "c": 100} for _ in range(3)]
    _write(spark, tmp_path, "events", _block_events(blocks), _EV_SCHEMA)
    r = REGISTRY["stats_friedman"].fn(spark, str(tmp_path)).collect()[0]
    assert r["chi2"] is None


def test_friedman_missing_cell_ranks_as_zero(spark, tmp_path):
    """A type absent on a day fills as zero revenue and takes the low
    rank — the complete-block semantics the docstring pins. With b=2,
    k=2 and type b missing on day 2, ranks are a=1,b=2 then a=2,b=1 →
    equal rank sums → χ² = 0."""
    blocks = [{"a": 100, "b": 200}, {"a": 100}]
    _write(spark, tmp_path, "events", _block_events(blocks), _EV_SCHEMA)
    r = REGISTRY["stats_friedman"].fn(spark, str(tmp_path)).collect()[0]
    assert (r["n_blocks"], r["n_treatments"]) == (2, 2)
    assert r["chi2"] == 0.0


def test_friedman_fixture_bounds(spark):
    """χ² ≥ 0 and df = k−1 at fixture scale."""
    r = REGISTRY["stats_friedman"].fn(spark, SF_DIR).collect()[0]
    assert r["chi2"] >= 0.0
    assert r["df"] == r["n_treatments"] - 1
    assert r["n_blocks"] > 1


# ---------------------------------------------------------------------------
# sample_balanced_downsample
# ---------------------------------------------------------------------------


def test_balanced_sample_is_exactly_balanced(spark):
    """Both classes appear exactly min(n0, n1) times, and every kept
    key belongs to its reported class."""
    from collections import Counter

    from python_etl_sample_spark.sources import table

    import pyspark.sql.functions as F

    rows = REGISTRY["sample_balanced_downsample"].fn(spark, SF_DIR).collect()
    by_label = Counter(r["label"] for r in rows)
    o = table(spark, SF_DIR, "orders")
    full = Counter(
        r[0]
        for r in o.select(
            F.expr(
                "CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')"
                " THEN 1 ELSE 0 END"
            )
        ).collect()
    )
    m = min(full.values())
    assert by_label[0] == m and by_label[1] == m
    # label correctness on a sample of keys
    truth = {
        r["o_orderkey"]: (
            1 if r["o_orderpriority"] in ("1-URGENT", "2-HIGH") else 0
        )
        for r in o.select("o_orderkey", "o_orderpriority").collect()
    }
    for r in rows:
        assert truth[r["o_orderkey"]] == r["label"]


def test_balanced_sample_matches_hash_order_reference(spark):
    """The kept minority-class set is ALL of the minority class, and
    the kept majority rows are exactly the m lowest by
    (hash, orderkey) — recomputed in pure Python."""
    from python_etl_sample_spark.sources import table

    o = table(spark, SF_DIR, "orders")
    rows = o.select("o_orderkey", "o_orderpriority").collect()
    classes = {0: [], 1: []}
    for r in rows:
        y = 1 if r["o_orderpriority"] in ("1-URGENT", "2-HIGH") else 0
        k = r["o_orderkey"]
        h = ((k % 3221225473) * 2654435761) % 1000003
        classes[y].append((h, k))
    m = min(len(v) for v in classes.values())
    want = set()
    for y, v in classes.items():
        want |= {k for _, k in sorted(v)[:m]}
    got = {
        r["o_orderkey"]
        for r in REGISTRY["sample_balanced_downsample"].fn(spark, SF_DIR).collect()
    }
    assert got == want


def test_balanced_sample_deterministic_across_runs(spark):
    """Two executions return the identical key set (hash order, no
    RNG state)."""
    fn = REGISTRY["sample_balanced_downsample"].fn
    a = {r["o_orderkey"] for r in fn(spark, SF_DIR).collect()}
    b = {r["o_orderkey"] for r in fn(spark, SF_DIR).collect()}
    assert a == b


def test_balanced_sample_skewed_input(spark, tmp_path):
    """A 9:1 skew keeps all of the minority and exactly that many of
    the majority."""
    rows = [
        (i + 1, 1, "O", 100.0 + i, _D(2024, 1, 1),
         "1-URGENT" if i < 2 else "5-LOW")
        for i in range(20)
    ]
    _write(spark, tmp_path, "orders", rows, _ORD_SCHEMA)
    got = REGISTRY["sample_balanced_downsample"].fn(spark, str(tmp_path)).collect()
    from collections import Counter

    c = Counter(r["label"] for r in got)
    assert c[1] == 2 and c[0] == 2
    assert {r["o_orderkey"] for r in got if r["label"] == 1} == {1, 2}
