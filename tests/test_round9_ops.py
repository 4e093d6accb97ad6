"""Round-9 invariants (operators/round9_ops.py): the persisted
per-shard KLL sketch rollup — stored-merge ≡ direct global sketch
(VERDICT r8 item 7), recomputed independently in pure Python."""

from __future__ import annotations

import glob
import os

import duckdb

from python_etl_sample_spark.registry import REGISTRY, load_all_operators
from python_etl_sample_spark.scratch import scratch_path

load_all_operators()

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_01 = "/root/testdata/sf0.01"


def _orders(sf_dir: str) -> list[tuple[int, int, int]]:
    """(ym, cents, key) rows straight from parquet, no Spark."""
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT),
               CAST(round(o_totalprice * 100) AS BIGINT),
               o_orderkey
        FROM read_parquet('{sf_dir}/orders.parquet')
        """
    ).fetchall()
    con.close()
    return [(r[0], r[1], r[2]) for r in rows]


def _level(n: int, budget: int) -> int:
    lev = 0
    while n > budget * (1 << lev):
        lev += 1
    return lev


def _hash(k: int) -> int:
    return (k % 3221225473) * 2654435761


def test_kll_rollup_merge_equals_direct(spark):
    """The headline identity: the rollup of stored per-month sketches
    must produce EXACTLY the direct global sketch — equal estimates at
    every reported quantile and a key-set symmetric difference of 0,
    read from the query's own output columns. Checked at sf0.01 where
    the global level is ≥ 1 (a real recompaction) while monthly shards
    sit at level 0 — the rollup genuinely drops rows."""
    rows = (
        REGISTRY["sketch_kll_partitioned_rollup"].fn(spark, SF_DIR_01).collect()
    )
    assert len(rows) == 3
    for r in rows:
        assert r["glevel"] >= 1
        assert r["set_diff"] == 0
        assert r["est_cents"] == r["direct_est_cents"]


def test_kll_rollup_matches_pure_python_replay(spark):
    """Full pure-Python replay at sf0.01: shard levels, shard keep
    sets, global level from shard metadata, recompaction, and the
    rank-target estimates must all equal the query's output — no Spark
    or DuckDB on the checking side."""
    data = _orders(SF_DIR_01)
    n_by_ym: dict[int, int] = {}
    for ym, _, _ in data:
        n_by_ym[ym] = n_by_ym.get(ym, 0) + 1
    lev_by_ym = {ym: _level(n, 512) for ym, n in n_by_ym.items()}
    stored = [
        (ym, c, k)
        for ym, c, k in data
        if _hash(k) % (1 << lev_by_ym[ym]) == 0
    ]
    # global level derives from shard metadata (sum of shard n), which
    # equals the true total — every shard keeps its metadata rows
    n = sum(n_by_ym.values())
    glev = _level(n, 512)
    merged = sorted(
        (c, k) for _, c, k in stored if _hash(k) % (1 << glev) == 0
    )
    direct = sorted(
        (c, k) for _, c, k in data if _hash(k) % (1 << glev) == 0
    )
    assert merged == direct  # the lossless-merge identity itself
    rows = {
        int(round(r["quantile"] * 100)): r
        for r in REGISTRY["sketch_kll_partitioned_rollup"]
        .fn(spark, SF_DIR_01)
        .collect()
    }
    assert set(rows) == {50, 95, 99}
    kept = len(merged)
    for qn, r in rows.items():
        assert r["n_rows"] == n
        assert r["glevel"] == glev
        assert r["kept"] == kept
        assert r["est_cents"] == merged[(kept * qn + 99) // 100 - 1][0]


def test_kll_rollup_sketch_files_are_shard_partitioned(spark):
    """The storage contract: the staged sketch lands as ONE parquet
    partition directory per month shard (ym=... layout), so a 100 TB
    reader can prune to any shard subset without touching the rest."""
    REGISTRY["sketch_kll_partitioned_rollup"].fn(spark, SF_DIR).collect()
    path = scratch_path("kll_rollup", SF_DIR)
    shards = sorted(
        os.path.basename(d)
        for d in glob.glob(os.path.join(path, "data", "ym=*"))
        if os.path.isdir(d)
    )
    expected = sorted({f"ym={ym}" for ym, _, _ in _orders(SF_DIR)})
    assert shards == expected
    # r9 ADVICE item 1: shard metadata is persisted unconditionally as
    # its own frame — one (ym, n_s, lev) row per shard regardless of
    # whether the shard kept any data rows
    meta = spark.read.parquet(os.path.join(path, "meta"))
    meta_rows = {r["ym"]: (r["n_s"], r["lev"]) for r in meta.collect()}
    from collections import Counter

    true_ns = Counter(ym for ym, _, _ in _orders(SF_DIR))
    assert set(meta_rows) == set(true_ns)
    for ym, n_s in true_ns.items():
        assert meta_rows[ym][0] == n_s
