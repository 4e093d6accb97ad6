"""Physical-plan hygiene checks (SURVEY.md §4): the properties that
make operators survive 100 TB must be visible in the executed plan —
not assumed. A regression that silently drops pushdown or broadcast
still passes value checks; these tests pin the plan shape.
"""

from __future__ import annotations

import pytest

from python_etl_sample_spark.plans import explain_formatted
from python_etl_sample_spark.registry import REGISTRY, load_all_operators

load_all_operators()

SF_DIR = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    return explain_formatted(REGISTRY[name].fn(spark, SF_DIR))


def test_column_pruning_reaches_scan(spark):
    plan = plan_of(spark, "scan_projected")
    assert "ReadSchema" in plan
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "p_partkey" in read_schema and "p_retailprice" in read_schema
    assert "p_name" not in read_schema, "unprojected column leaked into the scan"


def test_filter_pushdown_reaches_parquet(spark):
    plan = plan_of(spark, "filter_pred")
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed, "no PushedFilters in scan"
    assert "l_quantity" in pushed[0], f"quantity bound not pushed: {pushed[0]}"


def test_small_dims_broadcast(spark):
    plan = plan_of(spark, "join_broadcast")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, "dimension join degraded to sort-merge"


def test_topk_fuses_to_take_ordered(spark):
    plan = plan_of(spark, "topk")
    assert "TakeOrderedAndProject" in plan, "orderBy+limit did not fuse"


def test_partial_aggregation_before_shuffle(spark):
    plan = plan_of(spark, "agg_groupby")
    assert plan.count("HashAggregate") >= 2, "no map-side partial aggregation"


def test_whole_stage_codegen_active(spark):
    plan = plan_of(spark, "project_derive")
    assert "[codegen id :" in plan, "no whole-stage codegen span in plan"


def test_partition_pruning_on_partitioned_sink(spark):
    plan = plan_of(spark, "sink_partitioned")
    assert "PartitionFilters" in plan, "partition column filter not pruning directories"


def test_semi_anti_stay_joins(spark):
    for name, op in [("join_semi", "Semi"), ("join_anti", "Anti")]:
        plan = plan_of(spark, name)
        assert op.lower() in plan.lower(), f"{name} lost its {op}-join form"


@pytest.mark.parametrize(
    "name",
    sorted(
        n
        for n, spec in REGISTRY.items()
        if n not in {"stream_demo_tumbling", "stream_demo_stateful"}  # streaming sinks, not plan checks
    ),
)
def test_no_cartesian_products(spark, name):
    """No query may degrade to an unconstrained cross join — the shape
    that cannot survive scale. (Intentional tiny broadcasts — the
    1-row watermark cutoff and the corpus-size scalar in tf-idf — are
    broadcast nested loops over 1 row, which is fine; true
    CartesianProduct of two big sides is not.)"""
    plan = plan_of(spark, name)
    assert "CartesianProduct" not in plan, f"{name} plans a CartesianProduct"


def test_no_driver_materialization_in_similarity_kernels():
    """The exact GEMM kernels must be block-partitioned, never built
    from a driver-collected corpus: round 1 shipped the corpus via
    toPandas() at query-build time, which is a driver-side bottleneck
    at 100 TB. Pin the fix at the source level — no driver-side
    collection primitive may appear in the similarity module."""
    import inspect

    from python_etl_sample_spark.operators import similarity

    src = inspect.getsource(similarity)
    # round 11 removed the last exemption: sim_ann_ivf's quantizer is
    # now the shared _km_fit (whose own bounded k-row collects are
    # pinned in round7_ops), so the module is entirely collect-free.
    for forbidden in ("toPandas(", ".collect(", ".toLocalIterator("):
        assert forbidden not in src, f"driver materialization via {forbidden}"


def test_queries_yield_driver_rotation_order():
    """The driver records correctness rows in queries() order and the
    artifact caps at 50 entries — rounds 1-2 banked 69 of 102 queries, so
    round 3 yields DRIVER_ORDER (never-recorded queries first; see
    COVERAGE.md §"Driver-artifact rotation")."""
    from python_etl_sample_spark.api import queries
    from python_etl_sample_spark.registry import DRIVER_ORDER, SURVEY_ORDER

    names = list(queries())
    assert len(SURVEY_ORDER) == 69
    assert names == list(DRIVER_ORDER)


def test_bucketed_join_has_no_exchange(spark):
    """With broadcast disabled (as at real scale, where both facts are
    huge), the bucketed tables must sort-merge with ZERO exchanges —
    the shuffle was paid once at write time."""
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(spark, "join_bucketed")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, "bucketed join still shuffles"


def test_gemm_grids_pin_their_parallelism(spark):
    """The packed GEMM grids are tiny in bytes but heavy in compute, so
    AQE's byte-based coalescing would fold them onto one task (measured
    3-6x slowdowns). A user-specified repartition count (REPARTITION_BY_NUM,
    exempt from coalescing) must stay in every grid consumer's plan."""
    from python_etl_sample_spark.operators import similarity

    sf = "/root/testdata/sf0.001"
    for fn in (
        similarity.sim_cosine_topk,
        similarity.sim_knn_per_query,
        similarity.dedup_embedding_cosine,
        similarity.dedup_embedding_ann,
    ):
        plan = fn(spark, sf)._jdf.queryExecution().executedPlan().toString()
        assert "REPARTITION_BY_NUM" in plan, f"{fn.__name__} lost its AQE-proof repartition"


def test_subqueries_decorrelate_to_hash_joins(spark):
    """Catalyst must rewrite every correlated subquery into a join —
    per-outer-row re-execution (BroadcastNestedLoopJoin over a big
    side, or a surviving correlated predicate) is the shape that dies
    at scale. Also pins the NOT IN query to the null-aware anti join
    (the `true` build flag), since losing it silently changes NULL
    semantics AND plan shape."""
    for name in (
        "subquery_exists",
        "subquery_in_having",
        "subquery_scalar_correlated",
        "subquery_not_exists_inactive",
        "join_lateral_topk",
        "subquery_not_in_null_aware",
    ):
        plan = plan_of(spark, name)
        assert "BroadcastNestedLoopJoin" not in plan, f"{name} nested-loops"
        assert "CartesianProduct" not in plan, f"{name} goes cartesian"
    naaj = (
        REGISTRY["subquery_not_in_null_aware"]
        .fn(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftAnti, BuildRight, true" in naaj, "NOT IN lost its null-aware anti join"


def test_cbo_stats_feed_the_planner(spark):
    """plan_cbo_multiway's whole point: ANALYZE'd statistics must reach
    the optimizer. Pins (a) cost-mode logical plan carries rowCount=
    for the analyzed relations, (b) the dimension side still broadcasts
    (CBO must not degrade the star to sort-merge against tiny dims)."""
    from python_etl_sample_spark.operators.cbo import cbo_star_frame

    df = cbo_star_frame(spark, SF_DIR)
    assert spark.conf.get("spark.sql.cbo.enabled") == "true"
    assert spark.conf.get("spark.sql.cbo.joinReorder.enabled") == "true"
    cost = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "cost"
    )
    stats_lines = [ln for ln in cost.splitlines() if "rowCount=" in ln]
    assert stats_lines, "cost explain has no rowCount statistics at all"
    # every analyzed base relation contributes a row count; nation at
    # sf0.001 has exactly 25 rows and ANALYZE ran FOR ALL COLUMNS
    assert any("rowCount=25" in ln for ln in stats_lines), (
        "nation's ANALYZE'd rowCount=25 missing from cost plan:\n"
        + "\n".join(stats_lines[:10])
    )
    phys = explain_formatted(df)
    assert "BroadcastHashJoin" in phys, "star lost its dim broadcasts under CBO"


def test_chunking_is_map_only(spark):
    """text_chunk_fixed_overlap must stay a zero-shuffle codegen pass —
    sequence+explode+substring never justifies an exchange."""
    plan = plan_of(spark, "text_chunk_fixed_overlap")
    assert "Exchange" not in plan, "chunking plan acquired a shuffle:\n" + plan
    assert "[codegen id :" in plan


def test_snapshot_diff_single_full_outer_join(spark):
    """etl_snapshot_diff: exactly one join, and it is the full outer
    hash/sort-merge reconciliation join — no fallback to BNLJ."""
    plan = plan_of(spark, "etl_snapshot_diff")
    joins = [
        ln
        for ln in plan.splitlines()
        if "Join" in ln and "codegen" not in ln.lower()
    ]
    assert any("FullOuter" in ln for ln in joins), plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_reservoir_sample_single_window_shuffle(spark):
    """sample_reservoir_per_key: one hash-partition exchange on the key
    feeds both the rank window and the rollup (same partitioning)."""
    import re

    plan = plan_of(spark, "sample_reservoir_per_key")
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges == 1, f"expected 1 key exchange, saw {n_exchanges}:\n{plan}"
    assert "hashpartitioning(user_id" in plan, plan


def test_sessionize_single_shuffle(spark):
    """events_sessionize: ONE hash exchange on user_id serves the lag
    window, the session-numbering running sum, AND the per-session
    rollup — Spark recognizes hash(user_id) as a valid clustering for
    groupBy(user_id, session_idx), so no second shuffle appears. This
    is the plan shape that makes sessionization linear at 100 TB."""
    import re

    plan = plan_of(spark, "events_sessionize")
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges == 1, f"expected 1 exchange, saw {n_exchanges}:\n{plan}"
    assert "hashpartitioning(user_id" in plan, plan
    assert "Join" not in plan, "sessionization must never self-join:\n" + plan


def test_max_concurrent_is_join_free_sweep(spark):
    """events_max_concurrent: the sweep line must stay a UNION ALL +
    a range-partitioned prefix sum — the naive count-overlaps
    formulation is a range SELF-join of the event frame, the shape this
    operator exists to avoid. The total-order kernel's offset joins are
    broadcast-only over the partition-count-sized totals frame; any
    SortMergeJoin would mean the event frame itself is being joined."""
    plan = plan_of(spark, "events_max_concurrent")
    assert "Union" in plan, plan
    assert "rangepartitioning" in plan, "sweep lost its range shuffle:\n" + plan
    assert "SortMergeJoin" not in plan, (
        "sweep degraded to a data-frame join:\n" + plan
    )


def test_basket_pairs_broadcast_dims(spark):
    """basket_brand_pairs_lift (r14 shape): the per-basket pair
    expansion is a groupBy(l_orderkey) + double posexplode over the
    sorted per-order brand set — NO self-join of the basket frame at
    all — and the brand lookup plus both marginal frames broadcast.
    A SortMergeJoin/ShuffledHashJoin reappearing would mean the pair
    expansion regressed to the pre-r14 self-join (two shuffles of the
    same frame); a missing Generate would mean the explode expansion
    was lost."""
    plan = plan_of(spark, "basket_brand_pairs_lift")
    assert "BroadcastHashJoin" in plan, plan
    assert "Generate" in plan, "posexplode pair expansion missing:\n" + plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, (
        "pair expansion regressed to a shuffle self-join:\n" + plan
    )


def test_bloom_runtime_filter_injected(spark):
    """join_bloom_runtime's whole point: under the (scoped) injection
    confs, the optimized plan must carry the Bloom build aggregate
    (bloom_filter_agg over the dimension keys) and the might_contain
    probe on the fact side — proof the fact rows are pruned BEFORE the
    shuffle, not after the join."""
    from python_etl_sample_spark.operators.scale_ops5 import (
        _BLOOM_CONFS,
        bloom_join_frame,
    )

    old = {k: spark.conf.get(k, None) for k in _BLOOM_CONFS}
    for k, v in _BLOOM_CONFS.items():
        spark.conf.set(k, v)
    try:
        plan = (
            bloom_join_frame(spark, SF_DIR)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
    finally:
        for k, v in old.items():
            spark.conf.unset(k) if v is None else spark.conf.set(k, v)
    assert "bloom_filter_agg" in plan, "no Bloom build in plan:\n" + plan
    assert "might_contain" in plan, "no Bloom probe on fact side:\n" + plan
    # and the probe hashes the fact-side join key
    probe = [ln for ln in plan.splitlines() if "might_contain" in ln]
    assert any("l_orderkey" in ln for ln in probe), probe


def test_zorder_buckets_are_2d_tiles(spark):
    """etl_zorder_clustering: 1024 consecutive Z-codes tile a 32x32
    square of the 256x256 (custkey, day-of-year) grid, so every
    bucket's bounding box is mathematically <= 1024 cells — 64x
    tighter than the 256-wide stripe a lexicographic sort gives its
    second column. This inequality IS the data-skipping guarantee."""
    rows = REGISTRY["etl_zorder_clustering"].fn(spark, SF_DIR).collect()
    assert rows, "no buckets"
    for r in rows:
        assert r.n_orders > 0
        assert r.bbox_area <= 1024, (
            f"bucket {r.bucket} bbox {r.bbox_area} exceeds the 32x32 tile"
        )


def test_zorder_files_disjoint_ranges(spark):
    """The written clustered layout (repartitionByRange + sort on the
    Z-value) must give every file a DISJOINT Z-range — the physical
    property parquet min/max skipping needs. Verified from the actual
    files via the _metadata column."""
    from pyspark.sql import functions as F

    from python_etl_sample_spark.scratch import scratch_path

    REGISTRY["etl_zorder_clustering"].fn(spark, SF_DIR).collect()  # stages
    path = scratch_path("zorder/orders_clustered", SF_DIR)
    per_file = (
        spark.read.parquet(path)
        .groupBy(F.col("_metadata.file_path").alias("f"))
        .agg(F.min("zval").alias("lo"), F.max("zval").alias("hi"))
        .collect()
    )
    assert len(per_file) > 1, "clustered write produced a single file"
    spans = sorted((r.lo, r.hi) for r in per_file)
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, f"file Z-ranges overlap: ({lo1},{hi1}) vs ({lo2},{hi2})"


def test_dpp_prunes_fact_partitions(spark):
    """join_dpp_partitioned: the fact scan must carry a dynamicpruning
    subquery on ship_month — directory pruning driven by the dim's
    runtime rows, the layout-based twin of the Bloom runtime filter."""
    df = REGISTRY["join_dpp_partitioned"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), (
        "no dynamic partition pruning subquery in plan:\n" + plan
    )
    assert "ship_month" in plan


def test_salted_distinct_two_phase(spark):
    """agg_skew_salted_distinct: phase 1 must shuffle on
    (event_type, salt) — 16x reduce parallelism on hot keys — and
    phase 2 on event_type alone; the distinct never funnels a hot key
    through a single reducer in one step."""
    import re

    plan = plan_of(spark, "agg_skew_salted_distinct")
    assert "hashpartitioning(event_type" in plan
    # the salt column is inlined as _groupingexpression in the exchange
    salted = [
        ln for ln in plan.splitlines()
        if re.search(r"hashpartitioning\(event_type#\d+, (_groupingexpression|salt)", ln)
    ]
    assert salted, "no (event_type, salt) exchange — salting lost:\n" + plan


def test_hinted_strategies_all_survive(spark):
    """join_hinted_strategies: the three hints must reach the physical
    plan as three DIFFERENT join operators in one query — broadcast,
    sort-merge, and shuffled-hash — not collapse to the size-based
    default."""
    plan = plan_of(spark, "join_hinted_strategies")
    for op in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin"):
        assert op in plan, f"{op} missing — hint not honored:\n" + plan


def test_ivm_merge_never_rescans_base(spark):
    """etl_incremental_rollup_merge: the merge plan may scan the events
    fixture ONLY for the delta day (pushed filter) — history comes from
    the compact rollup parquet. O(delta), not O(history)."""
    df = REGISTRY["etl_incremental_rollup_merge"].fn(spark, SF_DIR)
    plan = explain_formatted(df)
    scans = [ln for ln in plan.splitlines() if "Location:" in ln]
    ev_scans = [ln for ln in scans if "events.parquet" in ln]
    rollup_scans = [ln for ln in scans if "events_rollup_base" in ln]
    assert len(ev_scans) == 1, f"events fixture scanned {len(ev_scans)}x:\n{plan}"
    assert rollup_scans, "merge plan lost the materialized rollup scan:\n" + plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln and "ts" in ln]
    assert pushed, "delta-day filter not pushed to the events scan:\n" + plan


def test_no_unpartitioned_window_without_justification():
    """VERDICT r5 item 2: a Window.orderBy(...) with no partitionBy (or
    an argument-less Window.partitionBy()) funnels every row through
    ONE task. Every such construction in the package must either live
    in functions/total_order.py (the distributed replacement itself) or
    carry a `# bounded-window:` justification comment within the six
    preceding lines explaining why the frame cannot grow with data
    volume (calendar/domain-bounded) and why the prefix-sum kernel
    cannot express it (sliding frame, lag, float association)."""
    import re
    from pathlib import Path

    pkg = Path(__file__).resolve().parents[1] / "python_etl_sample_spark"
    pat = re.compile(r"Window\.orderBy\(|Window\.partitionBy\(\)")
    offenders = []
    for path in sorted(pkg.rglob("*.py")):
        if path.name == "total_order.py":
            continue
        lines = path.read_text().splitlines()
        for i, ln in enumerate(lines):
            if not pat.search(ln) or ln.lstrip().startswith("#"):
                continue
            context = "\n".join(lines[max(0, i - 6): i])
            if "# bounded-window:" not in context:
                offenders.append(f"{path}:{i + 1}: {ln.strip()}")
    assert not offenders, (
        "unjustified single-task window(s):\n" + "\n".join(offenders)
    )


def test_exact_total_order_plans_are_range_partitioned(spark):
    """sort_multi and agg_equi_depth_histogram (VERDICT r5 'weak' item)
    must plan a rangepartitioning exchange — the distributed total
    order — and every Window in their plans must be partitioned (the
    kernel's per-range row_number), never the single-task global form."""
    import re

    for name in ("sort_multi", "agg_equi_depth_histogram"):
        plan = plan_of(spark, name)
        assert "rangepartitioning" in plan, name + " lost its range shuffle:\n" + plan
        # an UNpartitioned Window prints Arguments: [fns], [], [sort...]
        # — the empty middle list is the single-task spec. Sole allowed
        # occurrence: the kernel's offsets prefix, ordered by its
        # internal __to_pid key — that frame is ≤ shuffle.partitions
        # rows (config-bounded), a constant-size reduction.
        lines = plan.splitlines()
        for i, ln in enumerate(lines):
            if re.match(r"\(\d+\) Window", ln.strip()):
                args = next(
                    l for l in lines[i:] if l.strip().startswith("Arguments:")
                )
                assert not re.search(r"\], \[\], \[(?!__to_pid)", args), (
                    name + " plans a single-task window:\n" + args
                )


# ---------------------------------------------------------------------------
# construction-time plan capture (VERDICT r8 item 6)
# ---------------------------------------------------------------------------

import contextlib


@contextlib.contextmanager
def _capture_eager_plans():
    """Record the physical plan of every DataFrame a driver-side ACTION
    executes while the block runs. Joins executed during query
    CONSTRUCTION (k-means fit loops, CC-kernel rounds, IVF quantizer
    builds, eager checkpoints) never appear in the returned frame's
    explain output, so tools/plan_audit.py and test_no_cartesian_products
    are blind to them — this hook closes that audit gap by intercepting
    the action methods the kernels use."""
    # patch the CLASSIC implementation class: in PySpark 4 the public
    # pyspark.sql.DataFrame is the abstract API whose action methods the
    # classic (non-Connect) subclass overrides, so patching the base
    # class would never be reached at call time
    from pyspark.sql.classic.dataframe import DataFrame

    from pyspark.sql.readwriter import DataFrameWriter

    captured: list[tuple[str, str]] = []
    # r9 ADVICE item 3: first/take/head/toLocalIterator added so a
    # kernel that materializes through any of them can't slip past the
    # cartesian audit (head delegates to take in the classic impl, but
    # patching both is free and robust to that changing)
    names = (
        "collect",
        "count",
        "isEmpty",
        "localCheckpoint",
        "toPandas",
        "first",
        "take",
        "head",
        "toLocalIterator",
    )
    originals = {n: getattr(DataFrame, n) for n in names}
    # staged WRITES (scratch.py) are construction-time actions too —
    # capture the written frame's plan via the writer's formats
    w_names = ("parquet", "csv", "json", "orc", "save")
    w_originals = {n: getattr(DataFrameWriter, n) for n in w_names}

    def _snap(df, label):
        try:
            plan = df._jdf.queryExecution().executedPlan().toString()
            captured.append((label, plan))
        except Exception:
            pass  # never let the audit hook break the kernel itself

    def _wrap(name, fn):
        def wrapped(self, *a, **kw):
            _snap(self, name)
            return fn(self, *a, **kw)

        return wrapped

    def _wrap_writer(name, fn):
        def wrapped(self, *a, **kw):
            _snap(self._df, f"write.{name}")
            return fn(self, *a, **kw)

        return wrapped

    for n, fn in originals.items():
        setattr(DataFrame, n, _wrap(n, fn))
    for n, fn in w_originals.items():
        setattr(DataFrameWriter, n, _wrap_writer(n, fn))
    try:
        yield captured
    finally:
        for n, fn in originals.items():
            setattr(DataFrame, n, fn)
        for n, fn in w_originals.items():
            setattr(DataFrameWriter, n, fn)


def _bnlj_build_subtrees(plan: str) -> list[str]:
    """Extract the BUILD-side subtree text of every
    BroadcastNestedLoopJoin in a physical-plan tree string. Children of
    a node sit 3 columns further right; a node's subtree ends at the
    first line whose branch marker returns to its column or left."""
    lines = plan.splitlines()

    def col(ln: str) -> int:
        return max(ln.rfind("+- "), ln.rfind(":- "))

    out = []
    for i, ln in enumerate(lines):
        if "BroadcastNestedLoopJoin" not in ln:
            continue
        c = col(ln)
        child_col = 0 if c < 0 else c + 3
        children, end = [], len(lines)
        for j in range(i + 1, len(lines)):
            cj = col(lines[j])
            if cj <= c:
                end = j
                break
            if cj == child_col:
                children.append(j)
        if len(children) < 2:
            continue  # single-child wrapper (e.g. AQE stage) — skip
        bounds = children + [end]
        k = -2 if "BuildRight" in ln else 0
        out.append("\n".join(lines[bounds[k]: bounds[k + 1]]))
    return out


#: build-side shapes that stay CONSTANT at any corpus size, so a
#: nested-loop broadcast over them is a scalar subquery, not a scale
#: hazard: a global aggregate (1 row), a driver-literal table, a
#: spark.range constant grid, or a reuse of one of those exchanges
_BOUNDED_BUILD_MARKERS = (
    "HashAggregate(keys=[]",
    "LocalTableScan",
    "Range (",
    "ReusedExchange",
)


#: queries that execute Spark jobs while BUILDING their result frame.
#: Every name here must capture at least one action (else the hook has
#: gone stale and the pin is vacuous) and no captured plan may contain
#: a CartesianProduct or a non-scalar BroadcastNestedLoopJoin.
EAGER_KERNEL_QUERIES = sorted(
    [
        "spatial_hotspot_clusters",  # tile union-find + CC residue kernel
        "dedup_cluster_keeper",  # pointer-jump CC over near-dup pairs
        "cluster_kmeans_lloyd",  # Lloyd fit loop (collects seeds/centroids)
        "dedup_semantic_cluster",  # _km_fit consumer
        "cluster_silhouette",  # _km_fit consumer
        "embedding_pca_power",  # power iteration over 64x64 covariance
        "sim_ann_ivf",  # coarse-quantizer build (bounded collect)
        "sketch_kll_partitioned_rollup",  # staged shard-sketch write
    ]
)


@pytest.mark.parametrize("name", EAGER_KERNEL_QUERIES)
def test_eager_kernel_plans_stay_equi_join(spark, name):
    """Generalizes the hotspot-only pin (test_round7n_ops.py): every
    intermediate plan an eager kernel executes at construction must be
    free of CartesianProduct, and any BroadcastNestedLoopJoin it plans
    must build over a constant-size frame (scalar aggregate, literal
    table, constant range) — the legitimate scalar-subquery shape —
    never over a data-sized side. The session memo and scratch staging
    are cleared first so a previously-run test cannot hide the kernel."""
    from python_etl_sample_spark import cache, scratch

    cache.release_all()
    scratch._staged.clear()  # force staged writes to re-run under the hook
    with _capture_eager_plans() as captured:
        REGISTRY[name].fn(spark, SF_DIR)
    assert captured, f"{name} captured no construction-time action"
    for action, plan in captured:
        assert "CartesianProduct" not in plan, (
            f"{name}: construction-time {action} plans a CartesianProduct:\n"
            + plan
        )
        for build in _bnlj_build_subtrees(plan):
            assert any(m in build for m in _BOUNDED_BUILD_MARKERS), (
                f"{name}: construction-time {action} plans a "
                f"BroadcastNestedLoopJoin over a data-sized build side:\n"
                + build
            )


def test_bnlj_build_subtree_parser_flags_data_sized_builds(spark):
    """Self-test of the parser behind the eager-kernel pin: it must
    (a) FLAG a BroadcastNestedLoopJoin whose build side is a data-sized
    scan and (b) PASS the scalar-aggregate broadcast shape — otherwise
    test_eager_kernel_plans_stay_equi_join could rot into a vacuous
    always-pass without anything noticing."""
    from pyspark.sql import functions as F

    big1 = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    big2 = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    bad = big1.crossJoin(F.broadcast(big2))
    subs = _bnlj_build_subtrees(
        bad._jdf.queryExecution().executedPlan().toString()
    )
    assert len(subs) == 1, "data-sized BNLJ build not extracted"
    assert not any(m in subs[0] for m in _BOUNDED_BUILD_MARKERS), (
        "data-sized build side wrongly classified as bounded:\n" + subs[0]
    )
    ok = big1.crossJoin(
        F.broadcast(big2.agg(F.count(F.lit(1)).alias("n")))
    )
    subs2 = _bnlj_build_subtrees(
        ok._jdf.queryExecution().executedPlan().toString()
    )
    assert subs2, "scalar-broadcast BNLJ build not extracted"
    assert all(
        any(m in s for m in _BOUNDED_BUILD_MARKERS) for s in subs2
    ), "scalar aggregate build side wrongly flagged"
