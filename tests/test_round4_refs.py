"""Independent reference checks for round-4 composite operators: each
distributed result is recomputed by a brute-force pure-Python replay of
the SAME semantics on collected fixture rows — a third implementation
(after Spark and DuckDB) that shares no engine with either.
"""

from __future__ import annotations

from collections import defaultdict

from python_etl_sample_spark.registry import REGISTRY, load_all_operators
from python_etl_sample_spark.sources import table

load_all_operators()

SF_DIR = "/root/testdata/sf0.001"


def test_skyline_matches_bruteforce_dominance(spark):
    parts = [
        (int(r["p_partkey"]), float(r["p_retailprice"]), int(r["p_size"]))
        for r in table(spark, SF_DIR, "part")
        .select("p_partkey", "p_retailprice", "p_size")
        .collect()
    ]
    expected = {
        k
        for k, price, size in parts
        if not any(
            q_price < price and q_size > size for _, q_price, q_size in parts
        )
    }
    got = {
        int(r["p_partkey"])
        for r in REGISTRY["skyline_pareto"].fn(spark, SF_DIR).collect()
    }
    assert got == expected


def test_ewma_matches_naive_loop(spark):
    rows = sorted(
        (
            (int(r["user_id"]), r["ts"], int(r["event_id"]), float(r["value"]))
            for r in table(spark, SF_DIR, "events")
            .select("user_id", "ts", "event_id", "value")
            .collect()
        ),
        key=lambda t: (t[0], t[1], t[2]),
    )
    by_user: dict[int, list[tuple[int, float]]] = defaultdict(list)
    for uid, _, eid, val in rows:
        by_user[uid].append((eid, val))
    expected = {}
    for uid, seq in by_user.items():
        for idx in range(19, len(seq)):
            window = seq[idx - 19 : idx + 1]  # trailing 20, oldest first
            num = den = 0.0
            for k, (_, v) in enumerate(reversed(window)):  # k = age
                w = float(2 ** (19 - k))
                num += w * v
                den += w
            expected[(uid, seq[idx][0])] = round(num / den, 4)
    got = {
        (int(r["user_id"]), int(r["event_id"])): round(float(r["ewma"]), 4)
        for r in REGISTRY["ts_ewma_halflife"].fn(spark, SF_DIR).collect()
    }
    assert set(got) == set(expected)
    # compare at 4 dp: the reference accumulates floats naively while the
    # engine sums exactly; agreement to 1e-4 on unit-scale values pins
    # the semantics without demanding the reference replicate decimals
    for key, val in expected.items():
        assert abs(got[key] - val) <= 1.5e-4, (key, got[key], val)


def test_merge_upsert_matches_dict_replay(spark):
    base = {
        int(r["o_orderkey"]): (str(r["o_orderstatus"]), float(r["o_totalprice"]))
        for r in table(spark, SF_DIR, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .collect()
    }
    state = dict(base)
    for k, (status, price) in base.items():
        if k % 10 == 0:
            state[k] = (status, price * 1.1)
    for k in list(state):
        if k % 97 == 0:
            del state[k]
    for k, (status, price) in base.items():
        if k % 1000 == 1:
            state[k + 10000000] = (status, price)
    expected: dict[str, tuple[int, float]] = {}
    for status, price in state.values():
        n, s = expected.get(status, (0, 0.0))
        expected[status] = (n + 1, s + price)
    got = {
        str(r["o_orderstatus"]): (int(r["n_orders"]), float(r["total_price"]))
        for r in REGISTRY["etl_merge_upsert"].fn(spark, SF_DIR).collect()
    }
    assert set(got) == set(expected)
    for status, (n, s) in expected.items():
        gn, gs = got[status]
        assert gn == n
        assert abs(gs - s) < 1e-3, (status, gs, s)
