"""Round-6 operator semantics against independent pure-Python
references, on randomized synthetic fixtures written as parquet (the
queries read `<sf_dir>/events.parquet` etc., so each test materializes
its own tiny table and runs the REAL registered query over it)."""

from __future__ import annotations

import datetime as dt
import random

import pytest

from python_etl_sample_spark.registry import REGISTRY, load_all_operators

load_all_operators()

SF_DIR = "/root/testdata/sf0.001"
_EPOCH = dt.datetime(2024, 1, 1)


def _write_events(spark, tmpdir, rows):
    df = spark.createDataFrame(
        [
            (int(eid), int(uid), _EPOCH + dt.timedelta(seconds=int(off)), etype)
            for eid, uid, off, etype in rows
        ],
        "event_id long, user_id long, ts timestamp_ntz, event_type string",
    )
    df.write.mode("overwrite").parquet(f"{tmpdir}/events.parquet")
    return str(tmpdir)


def test_interval_merge_matches_python_reference(spark, tmp_path):
    """fn_intervals_overlap_merge vs a sweep-line reference, on events
    engineered to hit the edges: exact-touch boundaries (prev end ==
    next start merges, `>=` is inclusive), duplicate timestamps, fully
    nested holds, and isolated points."""
    rng = random.Random(66)
    rows = []
    eid = 0
    for uid in range(1, 8):
        base = rng.randrange(0, 3600)
        for _ in range(rng.randrange(1, 25)):
            # cluster offsets so overlaps, exact touches (multiples of
            # 600 s), and gaps all occur
            off = base + rng.choice(
                [0, 1, 599, 600, 601, 1200, 5000, 5001, 9000]
            ) + rng.randrange(0, 3) * 600
            rows.append((eid, uid, off, "view"))
            eid += 1
    sf = _write_events(spark, tmp_path, rows)

    hold = 600
    want = {}
    by_user: dict[int, list[int]] = {}
    for e, u, off, _ in rows:
        by_user.setdefault(u, []).append(off)
    for u, offs in by_user.items():
        offs.sort()
        islands = []
        for s in offs:
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], s + hold)
                islands[-1][2] += 1
            else:
                islands.append([s, s + hold, 1])
        want[u] = (
            len(islands),
            sum(i[2] for i in islands),
            sum(i[1] - i[0] for i in islands),
        )

    got = {
        r["user_id"]: (r["n_merged"], r["n_raw"], r["covered_s"])
        for r in REGISTRY["fn_intervals_overlap_merge"].fn(spark, sf).collect()
    }
    assert got == want


def test_asof_tolerance_gates_stale_clicks(spark, tmp_path):
    """join_asof_tolerance: a click exactly at the 24 h boundary still
    matches (<=); one second past it does not; a purchase with no prior
    click matches nothing; the latest of several clicks wins."""
    day = 24 * 3600
    rows = [
        # uid 1: click at t=0, purchase at exactly t=day  -> matched
        (1, 1, 0, "click"),
        (2, 1, day, "purchase"),
        # uid 2: click at t=0, purchase at day+1           -> stale
        (3, 2, 0, "click"),
        (4, 2, day + 1, "purchase"),
        # uid 3: purchase with no click at all             -> unmatched
        (5, 3, 50, "purchase"),
        # uid 4: two clicks; the LATER one is credited
        (6, 4, 10, "click"),
        (7, 4, 500, "click"),
        (8, 4, 900, "purchase"),
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {
        r["event_id"]: (r["matched"], r["click_ts_within"])
        for r in REGISTRY["join_asof_tolerance"].fn(spark, sf).collect()
    }
    assert got[2][0] == 1 and got[2][1] == _EPOCH
    assert got[4] == (0, None)
    assert got[5] == (0, None)
    assert got[8][0] == 1
    assert got[8][1] == _EPOCH + dt.timedelta(seconds=500)


def test_gdpr_cascade_counts_are_consistent(spark):
    """etl_gdpr_delete_propagation on the real fixture: the cascade is
    internally consistent — deleted orders belong only to deleted
    customers, deleted lineitems only to deleted orders (recomputed
    here via independent joins)."""
    import pyspark.sql.functions as F

    from python_etl_sample_spark.sources import table

    rep = {
        r["table_name"]: (r["n_rows"], r["n_deleted"])
        for r in REGISTRY["etl_gdpr_delete_propagation"].fn(spark, SF_DIR).collect()
    }
    cust = table(spark, SF_DIR, "customer")
    orders = table(spark, SF_DIR, "orders")
    li = table(spark, SF_DIR, "lineitem")
    keys = cust.filter(F.col("c_custkey") % 97 == 0)
    assert rep["customer"][1] == keys.count()
    del_orders = orders.join(
        keys, orders.o_custkey == keys.c_custkey, "left_semi"
    )
    assert rep["orders"][1] == del_orders.count()
    assert rep["lineitem"][1] == li.join(
        del_orders, li.l_orderkey == del_orders.o_orderkey, "left_semi"
    ).count()
    assert rep["customer"][0] == cust.count()


def test_ri_sweep_is_clean_and_breaks_on_orphans(spark, tmp_path):
    """dq_referential_integrity: all six edges report zero orphans on
    the healthy fixture (that IS the hash-pinned contract), and the
    count columns are internally consistent."""
    rows = REGISTRY["dq_referential_integrity"].fn(spark, SF_DIR).collect()
    assert len(rows) == 6
    for r in rows:
        assert r["n_orphans"] == 0, r["fk_edge"]
        assert r["n_missing_keys"] == 0, r["fk_edge"]
        assert r["n_child_rows"] > 0, r["fk_edge"]
