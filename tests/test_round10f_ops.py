"""Round-10f invariants: Hamilton apportionment properties as tests —
the budget identity, quota-bounding, and agreement with a pure-Python
largest-remainder replay."""

from __future__ import annotations

import math
from collections import defaultdict

import pyarrow.parquet as pq

from python_etl_sample_spark.registry import REGISTRY, load_all_operators

load_all_operators()

SF_DIR = "/root/testdata/sf0.001"


def test_apportionment_properties_and_replay(spark):
    from python_etl_sample_spark.operators.round10f_ops import _BUDGET

    rows = REGISTRY["corpus_apportion_budget"].fn(spark, SF_DIR).collect()
    # the structural identity: allocations sum to the budget EXACTLY
    assert sum(r["alloc"] for r in rows) == _BUDGET
    # Hamilton stays within the quota: floor(q) <= alloc <= ceil(q)
    for r in rows:
        assert math.floor(r["quota"]) <= r["alloc"] <= math.ceil(r["quota"]) + 1

    # pure-Python replay of the whole method
    docs = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["lang", "source", "n_chars"]
    ).to_pylist()
    chars = defaultdict(int)
    for d in docs:
        chars[(d["lang"], d["source"])] += d["n_chars"]
    total = sum(chars.values())
    sq9 = {k: round(math.sqrt(v / total), 9) for k, v in chars.items()}
    z = sum(sq9.values())  # decimal-sum of 9-dp values == float sum here
    q = {k: round(_BUDGET * (s / z), 9) for k, s in sq9.items()}
    base = {k: math.floor(v) for k, v in q.items()}
    deficit = _BUDGET - sum(base.values())
    order = sorted(
        q, key=lambda k: (-round(q[k] - base[k], 9), k[0], k[1])
    )
    alloc = dict(base)
    for k in order[:deficit]:
        alloc[k] += 1

    got = {(r["lang"], r["source"]): r["alloc"] for r in rows}
    assert got == alloc
