"""Independent reference checks for the round-5 late additions (graph
analytics, two-sample inference, journey analytics): each distributed
result is recomputed by a brute-force pure-Python replay of the SAME
semantics on collected fixture rows — a third implementation that
shares no engine with Spark or DuckDB."""

from __future__ import annotations

import math
from collections import defaultdict
from itertools import combinations

from python_etl_sample_spark.registry import REGISTRY, load_all_operators
from python_etl_sample_spark.sources import table

load_all_operators()

SF_DIR = "/root/testdata/sf0.001"

_PR_SCALE = 1_000_000_000_000_000


def _edges_python(spark):
    """The co-purchase edge set, rebuilt by a naive per-order loop."""
    rows = (
        table(spark, SF_DIR, "lineitem")
        .selectExpr("l_orderkey", "l_partkey", "year(l_shipdate) AS y")
        .collect()
    )
    parts_by_order: dict[int, set[int]] = defaultdict(set)
    for r in rows:
        if r["y"] == 1995:
            parts_by_order[int(r["l_orderkey"])].add(int(r["l_partkey"]))
    edges: set[tuple[int, int]] = set()
    for parts in parts_by_order.values():
        for u, v in combinations(sorted(parts), 2):
            edges.add((u, v))
    return edges


def test_triangle_count_matches_bruteforce(spark):
    """graph_triangle_count vs exhaustive neighbor-set intersection:
    for every canonical edge (u, v), common neighbors with id > v close
    a triangle counted exactly once."""
    edges = _edges_python(spark)
    adj: dict[int, set[int]] = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    tris = 0
    for u, v in edges:
        tris += sum(1 for w in adj[u] & adj[v] if w > v)
    wedges = sum(len(n) * (len(n) - 1) // 2 for n in adj.values())
    row = REGISTRY["graph_triangle_count"].fn(spark, SF_DIR).collect()[0]
    assert int(row["n_nodes"]) == len(adj)
    assert int(row["n_edges"]) == len(edges)
    assert int(row["n_wedges"]) == wedges
    assert int(row["n_triangles"]) == tris
    if wedges:
        # abs_tol 1e-6: Spark/DuckDB round HALF_UP, Python rounds
        # half-to-even — they differ by one ulp-of-rounding on exact ties
        assert math.isclose(
            float(row["global_clustering"]), 3.0 * tris / wedges, abs_tol=1e-6
        )


def test_pagerank_matches_integer_simulation(spark):
    """graph_pagerank vs a dict-based replay of the exact scaled-integer
    recurrence — every node's rank must be BIT-equal, not just close."""
    edges = _edges_python(spark)
    adj: dict[int, list[int]] = defaultdict(list)
    for u, v in edges:
        adj[u].append(v)
        adj[v].append(u)
    n = len(adj)
    rank = {x: _PR_SCALE // n for x in adj}
    base = 15 * _PR_SCALE // (100 * n)
    for _ in range(5):
        contrib: dict[int, int] = defaultdict(int)
        for x, neigh in adj.items():
            share = rank[x] // len(neigh)
            for y in neigh:
                contrib[y] += share
        rank = {x: base + (85 * contrib[x]) // 100 for x in adj}
    got = {
        int(r["part_id"]): (int(r["degree"]), int(r["rank_scaled"]))
        for r in REGISTRY["graph_pagerank"].fn(spark, SF_DIR).collect()
    }
    assert set(got) == set(adj)
    for x in adj:
        assert got[x] == (len(adj[x]), rank[x]), f"node {x}"


def _order_cents(spark):
    rows = (
        table(spark, SF_DIR, "orders")
        .selectExpr("o_orderpriority AS grp", "CAST(round(o_totalprice*100) AS BIGINT) AS cents")
        .collect()
    )
    groups: dict[str, list[int]] = defaultdict(list)
    for r in rows:
        if r["grp"] in ("1-URGENT", "5-LOW"):
            groups[r["grp"]].append(int(r["cents"]))
    return groups


def test_welch_ttest_matches_python_formula(spark):
    """stats_ttest_welch vs the textbook formula over exact cents."""
    g = _order_cents(spark)
    stats = {}
    for k, xs in g.items():
        nk = len(xs)
        s1, s2 = sum(xs), sum(x * x for x in xs)
        mean = s1 / 100.0 / nk
        var = (s2 - (s1 * s1) / nk) / (nk - 1) / 10000.0
        stats[k] = (nk, mean, var)
    na, ma, va = stats["1-URGENT"]
    nb, mb, vb = stats["5-LOW"]
    se2 = va / na + vb / nb
    t = (ma - mb) / math.sqrt(se2)
    df = se2 * se2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
    row = REGISTRY["stats_ttest_welch"].fn(spark, SF_DIR).collect()[0]
    assert (int(row["n_urgent"]), int(row["n_low"])) == (na, nb)
    assert math.isclose(float(row["mean_urgent"]), round(ma, 6), abs_tol=1e-6)
    assert math.isclose(float(row["t_stat"]), round(t, 6), abs_tol=1e-5)
    assert math.isclose(float(row["welch_df"]), round(df, 6), rel_tol=1e-9)


def test_rank_sum_matches_python_ranks(spark):
    """stats_rank_sum_u vs average-rank bookkeeping over the pooled
    sample, exact in doubled rank units."""
    g = _order_cents(spark)
    pooled = sorted(
        [(c, "1-URGENT") for c in g["1-URGENT"]]
        + [(c, "5-LOW") for c in g["5-LOW"]]
    )
    # doubled average rank per value
    two_rank: dict[int, int] = {}
    i = 0
    while i < len(pooled):
        j = i
        while j < len(pooled) and pooled[j][0] == pooled[i][0]:
            j += 1
        # ranks i+1..j (1-based); doubled average = (i+1 + j)
        two_rank[pooled[i][0]] = (i + 1) + j
        i = j
    two_sum = sum(two_rank[c] for c in g["1-URGENT"])
    na, nb = len(g["1-URGENT"]), len(g["5-LOW"])
    u2 = two_sum - 2 * (na * (na + 1) // 2)
    z = (two_sum / 2 - na * (na + 1) / 2.0 - na * nb / 2.0) / math.sqrt(
        na * nb * (na + nb + 1) / 12.0
    )
    row = REGISTRY["stats_rank_sum_u"].fn(spark, SF_DIR).collect()[0]
    assert (int(row["n_urgent"]), int(row["n_low"])) == (na, nb)
    assert int(row["u2_urgent"]) == u2
    assert math.isclose(float(row["z_approx"]), round(z, 6), abs_tol=1e-6)


def test_rfm_segments_partition_customers(spark):
    """events_rfm_segmentation invariants vs a pure-Python quintile
    replay: segment counts must sum to |customers|, every score in 1-5,
    and the marginal distribution of each score must match NTILE's
    ceil/floor split exactly."""
    rows = (
        table(spark, SF_DIR, "orders")
        .selectExpr("o_custkey", "o_orderdate", "CAST(round(o_totalprice*100) AS BIGINT) c")
        .collect()
    )
    per_cust: dict[int, list] = defaultdict(list)
    for r in rows:
        per_cust[int(r["o_custkey"])].append((r["o_orderdate"], int(r["c"])))
    n = len(per_cust)
    got = REGISTRY["events_rfm_segmentation"].fn(spark, SF_DIR).collect()
    assert sum(int(r["n_customers"]) for r in got) == n
    for r in got:
        assert 1 <= int(r["r_score"]) <= 5
        assert 1 <= int(r["f_score"]) <= 5
        assert 1 <= int(r["m_score"]) <= 5
    # NTILE marginal: first (n mod 5) tiles hold ceil(n/5), rest floor
    expect = defaultdict(int)
    for tile in range(1, 6):
        expect[tile] = n // 5 + (1 if tile <= n % 5 else 0)
    for col in ("r_score", "f_score", "m_score"):
        marg = defaultdict(int)
        for r in got:
            marg[int(r[col])] += int(r["n_customers"])
        assert marg == expect, f"{col} marginal {dict(marg)} != {dict(expect)}"


def test_position_weighted_attribution_replay(spark):
    """attribution_position_weighted vs a per-user journey loop in
    exact micro-units."""
    rows = (
        table(spark, SF_DIR, "events")
        .select("user_id", "event_type", "ts", "event_id")
        .collect()
    )
    first_purchase: dict[int, object] = {}
    for r in rows:
        if r["event_type"] == "purchase":
            u = int(r["user_id"])
            if u not in first_purchase or r["ts"] < first_purchase[u]:
                first_purchase[u] = r["ts"]
    journeys: dict[int, list] = defaultdict(list)
    for r in rows:
        u = int(r["user_id"])
        if (
            r["event_type"] in ("click", "view")
            and u in first_purchase
            and r["ts"] < first_purchase[u]
        ):
            journeys[u].append((r["ts"], int(r["event_id"]), r["event_type"]))
    credit: dict[str, int] = defaultdict(int)
    touches: dict[str, int] = defaultdict(int)
    for u, js in journeys.items():
        js.sort()
        k = len(js)
        for pos, (_, _, typ) in enumerate(js, start=1):
            if k == 1:
                m = 1000000
            elif k == 2:
                m = 500000
            elif pos in (1, k):
                m = 400000
            else:
                m = 200000 // (k - 2)
            credit[typ] += m
            touches[typ] += 1
    got = {
        r["event_type"]: (int(r["n_touches"]), int(r["credit_micro"]))
        for r in REGISTRY["attribution_position_weighted"].fn(spark, SF_DIR).collect()
    }
    assert got == {t: (touches[t], credit[t]) for t in credit}


def test_interpolation_matches_python_series(spark):
    """ts_resample_interpolate vs a per-series Python walk: observed
    days keep their sums, interior gaps take the straight line, edges
    stay None."""
    rows = (
        table(spark, SF_DIR, "events")
        .selectExpr(
            "event_type",
            "datediff(CAST(ts AS DATE), DATE'1970-01-01') AS d",
            "value",
        )
        .collect()
    )
    daily: dict[str, dict[int, float]] = defaultdict(lambda: defaultdict(float))
    for r in rows:
        if r["event_type"] in ("purchase", "signup"):
            daily[r["event_type"]][int(r["d"])] += float(r["value"])
    all_days = [d for s in daily.values() for d in s]
    d0, d1 = min(all_days), max(all_days)
    expect: dict[tuple[str, int], object] = {}
    for typ, series in daily.items():
        obs_days = sorted(series)
        for d in range(d0, d1 + 1):
            if d in series:
                expect[(typ, d)] = round(series[d], 6)
            else:
                prev = max((x for x in obs_days if x < d), default=None)
                nxt = min((x for x in obs_days if x > d), default=None)
                if prev is None or nxt is None:
                    expect[(typ, d)] = None
                else:
                    y = series[prev] + (series[nxt] - series[prev]) * (
                        d - prev
                    ) / (nxt - prev)
                    expect[(typ, d)] = round(y, 6)
    got = REGISTRY["ts_resample_interpolate"].fn(spark, SF_DIR).collect()
    assert len(got) == len(expect)
    for r in got:
        key = (r["event_type"], int(r["day_num"]))
        want = expect[key]
        if want is None:
            assert r["value_filled"] is None, key
        else:
            assert math.isclose(float(r["value_filled"]), want, abs_tol=2e-6), key
        assert int(r["interpolated"]) == (
            0 if int(r["day_num"]) in daily[r["event_type"]] else 1
        )


def test_spatial_grid_join_matches_allpairs(spark):
    """spatial_grid_join vs brute-force all-pairs distances — proves the
    3×3 cell neighborhood loses no in-radius pair (completeness of the
    bucketing, the property the grid must never trade away)."""
    R2 = 500 * 500
    cust = {
        int(r["c_custkey"]): (
            (int(r["c_custkey"]) % 100000) * 2654435761 % 10000,
            (int(r["c_custkey"]) % 100000) * 2246822519 % 10000,
        )
        for r in table(spark, SF_DIR, "customer").select("c_custkey").collect()
    }
    sup = {
        int(r["s_suppkey"]): (
            (int(r["s_suppkey"]) % 100000) * 2654435761 % 10000,
            (int(r["s_suppkey"]) % 100000) * 2246822519 % 10000,
        )
        for r in table(spark, SF_DIR, "supplier").select("s_suppkey").collect()
    }
    expect = {}
    for c, (cx, cy) in cust.items():
        d2s = [
            (cx - sx) ** 2 + (cy - sy) ** 2
            for sx, sy in sup.values()
            if (cx - sx) ** 2 + (cy - sy) ** 2 <= R2
        ]
        expect[c] = (len(d2s), min(d2s) if d2s else None)
    got = {
        int(r["c_custkey"]): (
            int(r["n_nearby"]),
            None if r["min_dist2"] is None else int(r["min_dist2"]),
        )
        for r in REGISTRY["spatial_grid_join"].fn(spark, SF_DIR).collect()
    }
    assert got == expect


def test_copurchase_scan_pushes_ship_year_range(spark):
    """The co-purchase graph's 1995 filter must reach the parquet scan
    as a pushed range predicate (a year() call would not) — the
    difference between pruning row groups at the source and scanning
    the full fact table at 100 TB."""
    from python_etl_sample_spark.plans import explain_formatted

    for name in ("graph_triangle_count", "graph_pagerank"):
        plan = explain_formatted(REGISTRY[name].fn(spark, SF_DIR))
        assert "GreaterThanOrEqual(l_shipdate" in plan, name
        assert "LessThan(l_shipdate" in plan, name


def test_pagerank_runtime_reuses_repeated_subtrees(spark):
    """The unrolled five-round lineage re-plans the edge/degree
    subtrees many times STATICALLY, but execution must dedupe them via
    ReuseExchange — the property that makes the single-job unrolled
    form beat a localCheckpoint-per-round variant (measured 0.24 s vs
    2.2 s warm at sf0.1). If this pin breaks, the checkpoint variant
    becomes the right implementation again."""
    df = REGISTRY["graph_pagerank"].fn(spark, SF_DIR)
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in executed


def test_seasonal_naive_eval_matches_python(spark):
    """ts_seasonal_naive_eval vs a dict-based month-lag replay."""
    rows = (
        table(spark, SF_DIR, "orders")
        .selectExpr(
            "year(o_orderdate) AS y",
            "month(o_orderdate) AS m",
            "CAST(round(o_totalprice*100) AS BIGINT) AS c",
        )
        .collect()
    )
    monthly: dict[int, int] = defaultdict(int)
    for r in rows:
        monthly[int(r["y"]) * 100 + int(r["m"])] += int(r["c"])
    per_year: dict[int, list[float]] = defaultdict(list)
    for mk, rev in monthly.items():
        if mk - 100 in monthly:
            per_year[mk // 100].append(abs(rev - monthly[mk - 100]) / rev)
    got = {
        int(r["yr"]): (int(r["n_months"]), float(r["mape"]), float(r["worst_ape"]))
        for r in REGISTRY["ts_seasonal_naive_eval"].fn(spark, SF_DIR).collect()
    }
    assert set(got) == set(per_year)
    for y, apes in per_year.items():
        n, mape, worst = got[y]
        assert n == len(apes)
        assert math.isclose(mape, sum(apes) / len(apes), abs_tol=2e-6)
        assert math.isclose(worst, max(apes), abs_tol=2e-6)


def test_skew_report_matches_python_counts(spark):
    """dq_skew_report vs Counter-based per-key tallies (integer fields
    exactly; ratios within rounding)."""
    from collections import Counter

    specs = [
        ("lineitem", "l_partkey"),
        ("lineitem", "l_suppkey"),
        ("orders", "o_custkey"),
    ]
    got = {
        r["key_column"]: r
        for r in REGISTRY["dq_skew_report"].fn(spark, SF_DIR).collect()
    }
    for tbl, col in specs:
        counts = Counter(
            int(r[col]) for r in table(spark, SF_DIR, tbl).select(col).collect()
        )
        r = got[col]
        assert int(r["n_rows"]) == sum(counts.values())
        assert int(r["n_keys"]) == len(counts)
        assert int(r["max_key_rows"]) == max(counts.values())
        assert math.isclose(
            float(r["skew_ratio"]),
            max(counts.values()) * len(counts) / sum(counts.values()),
            abs_tol=2e-6,
        )


def test_feature_hashing_matches_python_sha(spark):
    """features_hashing_trick vs hashlib-based bucket replay — pins the
    cross-engine hex-parse agreement (Spark conv vs DuckDB 0x-cast vs
    Python int(,16))."""
    import hashlib

    from collections import Counter

    toks = []
    for r in table(spark, SF_DIR, "documents").select("text").collect():
        toks += [t for t in r["text"].lower().split() if t]
    per_bucket_occ: Counter = Counter()
    per_bucket_vocab: dict[int, set] = defaultdict(set)
    for t in toks:
        b = int(hashlib.sha256(t.encode()).hexdigest()[:6], 16) % 128
        per_bucket_occ[b] += 1
        per_bucket_vocab[b].add(t)
    got = {
        int(r["bucket"]): (
            int(r["n_occurrences"]),
            int(r["n_distinct_tokens"]),
            int(r["has_collision"]),
        )
        for r in REGISTRY["features_hashing_trick"].fn(spark, SF_DIR).collect()
    }
    assert got == {
        b: (per_bucket_occ[b], len(v), 1 if len(v) > 1 else 0)
        for b, v in per_bucket_vocab.items()
    }


def test_kaplan_meier_matches_python_estimator(spark):
    """customer_survival_km vs a textbook KM loop over collected
    order histories (right-censoring at the 90-day horizon)."""
    rows = (
        table(spark, SF_DIR, "orders")
        .selectExpr("o_custkey", "CAST(o_orderdate AS DATE) AS d")
        .collect()
    )
    per_cust: dict[int, list] = defaultdict(list)
    for r in rows:
        per_cust[int(r["o_custkey"])].append(r["d"])
    max_d = max(d for ds in per_cust.values() for d in ds)
    lifetimes = []
    for ds in per_cust.values():
        dur = (max(ds) - min(ds)).days
        churned = (max_d - max(ds)).days > 90
        lifetimes.append((dur, churned))
    n_total = len(lifetimes)
    from collections import Counter

    leavers = Counter(d for d, _ in lifetimes)
    churns = Counter(d for d, ch in lifetimes if ch)
    surv, at_risk, curve = 1.0, n_total, {}
    for t in sorted(leavers):
        d = churns.get(t, 0)
        if at_risk > 0 and d:
            surv *= 1.0 - d / at_risk
        curve[t] = (at_risk, d, leavers[t] - d, surv)
        at_risk -= leavers[t]
    got = {
        int(r["duration_days"]): r
        for r in REGISTRY["customer_survival_km"].fn(spark, SF_DIR).collect()
    }
    assert set(got) == set(curve)
    for t, (n, d, c, s) in curve.items():
        r = got[t]
        assert (int(r["n_at_risk"]), int(r["n_churned"]), int(r["n_censored"])) == (
            n,
            d,
            c,
        ), t
        assert math.isclose(float(r["survival"]), s, abs_tol=2e-6), t


def test_bfs_hops_matches_python_bfs(spark):
    """graph_bfs_hops vs a deque BFS from the same top-10-degree seed
    set, bounded to four hops."""
    from collections import Counter, deque

    edges = _edges_python(spark)
    adj: dict[int, set[int]] = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    seeds = sorted(adj, key=lambda x: (-len(adj[x]), x))[:10]
    dist = {s: 0 for s in seeds}
    dq = deque(seeds)
    while dq:
        x = dq.popleft()
        if dist[x] >= 4:
            continue
        for y in adj[x]:
            if y not in dist:
                dist[y] = dist[x] + 1
                dq.append(y)
    levels = Counter(dist.values())
    got = {
        int(r["hops"]): (
            int(r["n_parts"]),
            int(r["min_part"]),
            int(r["max_part"]),
        )
        for r in REGISTRY["graph_bfs_hops"].fn(spark, SF_DIR).collect()
    }
    expect = {}
    for h in levels:
        nodes = [x for x, d in dist.items() if d == h]
        expect[h] = (len(nodes), min(nodes), max(nodes))
    assert got == expect


def test_rolling_distinct_matches_python_windows(spark):
    """win_rolling_distinct_users vs a direct per-day set scan over the
    deduped (user, day) frame."""
    rows = (
        table(spark, SF_DIR, "events")
        .selectExpr("user_id", "datediff(CAST(ts AS DATE), DATE'1970-01-01') AS d")
        .collect()
    )
    user_days = {(int(r["user_id"]), int(r["d"])) for r in rows}
    days = [d for _, d in user_days]
    d0, d1 = min(days), max(days)
    got = {
        int(r["day_num"]): int(r["active_7d"])
        for r in REGISTRY["win_rolling_distinct_users"].fn(spark, SF_DIR).collect()
    }
    expect = {}
    for d in range(d0, d1 + 1):
        users = {u for (u, ud) in user_days if d - 6 <= ud <= d}
        if users:
            expect[d] = len(users)
    assert got == expect


def test_multivariate_ols_matches_numpy_lstsq(spark):
    """stats_ols_multivariate vs numpy's least-squares solve on the
    collected design matrix — an INDEPENDENT solver (QR-based), not the
    normal-equations formula, so agreement validates the math, not just
    the transcription."""
    import numpy as np

    rows = (
        table(spark, SF_DIR, "lineitem")
        .selectExpr("l_quantity q", "l_discount d", "l_extendedprice y")
        .collect()
    )
    X = np.array([[1.0, float(r["q"]), float(r["d"])] for r in rows])
    y = np.array([float(r["y"]) for r in rows])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    pred = X @ beta
    ss_res = float(((y - pred) ** 2).sum())
    ss_tot = float(((y - y.mean()) ** 2).sum())
    r2 = 1.0 - ss_res / ss_tot
    row = REGISTRY["stats_ols_multivariate"].fn(spark, SF_DIR).collect()[0]
    assert int(row["n"]) == len(rows)
    assert math.isclose(float(row["intercept"]), beta[0], rel_tol=1e-6)
    assert math.isclose(float(row["beta_qty"]), beta[1], rel_tol=1e-6)
    assert math.isclose(float(row["beta_disc"]), beta[2], rel_tol=1e-5)
    assert math.isclose(float(row["r2"]), r2, abs_tol=1e-5)


def test_sliding_median_matches_python(spark):
    """win_sliding_median vs statistics.median over explicit 7-element
    trailing slices of the per-type daily series."""
    import statistics

    rows = (
        table(spark, SF_DIR, "events")
        .selectExpr(
            "event_type",
            "datediff(CAST(ts AS DATE), DATE'1970-01-01') AS d",
            "value",
        )
        .collect()
    )
    daily: dict[str, dict[int, float]] = defaultdict(lambda: defaultdict(float))
    for r in rows:
        daily[r["event_type"]][int(r["d"])] += float(r["value"])
    got = {
        (r["event_type"], int(r["day_num"])): (
            float(r["rev"]),
            float(r["median_7d"]),
        )
        for r in REGISTRY["win_sliding_median"].fn(spark, SF_DIR).collect()
    }
    n_expected = 0
    for typ, series in daily.items():
        days = sorted(series)
        for i, d in enumerate(days):
            frame = [series[x] for x in days[max(0, i - 6) : i + 1]]
            med = statistics.median(frame)
            rev, got_med = got[(typ, d)]
            assert math.isclose(rev, series[d], abs_tol=2e-6), (typ, d)
            assert math.isclose(got_med, med, abs_tol=2e-6), (typ, d)
            n_expected += 1
    assert len(got) == n_expected


def test_pmi_collocations_match_python(spark):
    """text_collocations_pmi vs a Counter-based bigram/unigram PMI
    replay with the same min-count floor and tie-broken top-20."""
    from collections import Counter

    uni: Counter = Counter()
    big: Counter = Counter()
    n_big = 0
    for r in table(spark, SF_DIR, "documents").select("text").collect():
        toks = [t for t in r["text"].lower().split() if t]
        uni.update(toks)
        big.update(zip(toks, toks[1:]))
        n_big += max(0, len(toks) - 1)
    n_uni = sum(uni.values())
    scored = []
    for (w1, w2), c in big.items():
        if c >= 5:
            pmi = math.log(
                (c / n_big) / ((uni[w1] / n_uni) * (uni[w2] / n_uni))
            )
            scored.append((-pmi, w1, w2, c))
    scored.sort()
    expect = [
        (w1, w2, c, round(-negpmi, 6)) for negpmi, w1, w2, c in scored[:20]
    ]
    got = [
        (r["w1"], r["w2"], int(r["pair_count"]), float(r["pmi"]))
        for r in REGISTRY["text_collocations_pmi"].fn(spark, SF_DIR).collect()
    ]
    assert len(got) == len(expect)
    for g, e in zip(sorted(got), sorted(expect)):
        assert g[:3] == e[:3]
        assert math.isclose(g[3], e[3], abs_tol=2e-6)


def test_gini_lorenz_matches_python(spark):
    """stats_gini_lorenz vs a sorted-list Gini/Lorenz replay."""
    rows = (
        table(spark, SF_DIR, "orders")
        .selectExpr("o_custkey", "CAST(round(o_totalprice*100) AS BIGINT) c")
        .collect()
    )
    rev: dict[int, int] = defaultdict(int)
    for r in rows:
        rev[int(r["o_custkey"])] += int(r["c"])
    xs = [v for _, v in sorted(rev.items(), key=lambda kv: (kv[1], kv[0]))]
    n, total = len(xs), sum(xs)
    gini = 2.0 * sum((i + 1) * x for i, x in enumerate(xs)) / (n * total) - (
        n + 1.0
    ) / n
    got = {
        int(r["decile"]): (float(r["cum_revenue_share"]), float(r["gini"]))
        for r in REGISTRY["stats_gini_lorenz"].fn(spark, SF_DIR).collect()
    }
    cum = 0
    expect_share = {}
    for i, x in enumerate(xs):
        cum += x
        d = (i * 10) // n + 1
        expect_share[d] = cum / total
    assert set(got) == set(expect_share)
    for d, share in expect_share.items():
        assert math.isclose(got[d][0], share, abs_tol=2e-6), d
        assert math.isclose(got[d][1], gini, abs_tol=2e-6)


def test_benford_screen_matches_python(spark):
    """stats_benford_first_digit vs str()-based digit tallies and the
    log10 law."""
    from collections import Counter

    rows = (
        table(spark, SF_DIR, "orders")
        .selectExpr("CAST(round(o_totalprice*100) AS BIGINT) c")
        .collect()
    )
    digits = Counter(int(str(int(r["c"]))[0]) for r in rows if int(r["c"]) > 0)
    n = sum(digits.values())
    got = {
        int(r["first_digit"]): r
        for r in REGISTRY["stats_benford_first_digit"].fn(spark, SF_DIR).collect()
    }
    assert set(got) == set(digits)
    for d, c in digits.items():
        r = got[d]
        assert int(r["n_observed"]) == c
        assert math.isclose(float(r["observed_freq"]), c / n, abs_tol=2e-6)
        assert math.isclose(
            float(r["benford_freq"]), math.log10(1 + 1 / d), abs_tol=2e-6
        )


def test_ratio_to_report_shares_sum_to_one(spark):
    """win_ratio_to_report vs Python tallies: shares must rebuild from
    exact per-nation sums, region shares sum to 1 within each region,
    global shares to 1 overall."""
    rows = REGISTRY["win_ratio_to_report"].fn(spark, SF_DIR).collect()
    by_region: dict[str, float] = defaultdict(float)
    total = 0.0
    for r in rows:
        by_region[r["region"]] += float(r["share_of_region"])
        total += float(r["share_of_total"])
    for region, s in by_region.items():
        assert math.isclose(s, 1.0, abs_tol=1e-4), region
    assert math.isclose(total, 1.0, abs_tol=1e-4)
    # cross-check one nation against a direct recount
    o = (
        table(spark, SF_DIR, "orders")
        .selectExpr("o_custkey", "CAST(round(o_totalprice*100) AS BIGINT) c")
        .collect()
    )
    cust_nation = {
        int(r["c_custkey"]): int(r["c_nationkey"])
        for r in table(spark, SF_DIR, "customer").collect()
    }
    nation_name = {
        int(r["n_nationkey"]): r["n_name"]
        for r in table(spark, SF_DIR, "nation").collect()
    }
    rev: dict[str, int] = defaultdict(int)
    for r in o:
        rev[nation_name[cust_nation[int(r["o_custkey"])]]] += int(r["c"])
    got = {r["nation"]: float(r["revenue"]) for r in rows}
    for nation, cents in rev.items():
        assert math.isclose(got[nation], cents / 100.0, abs_tol=0.01), nation


def test_dau_wau_mau_matches_python_sets(spark):
    """events_dau_wau_mau vs direct set arithmetic on (user, day)."""
    rows = (
        table(spark, SF_DIR, "events")
        .selectExpr("user_id", "datediff(CAST(ts AS DATE), DATE'1970-01-01') d")
        .collect()
    )
    user_days = {(int(r["user_id"]), int(r["d"])) for r in rows}
    days = [d for _, d in user_days]
    d0, d1 = min(days), max(days)
    got = {
        int(r["day_num"]): (int(r["dau"]), int(r["wau"]), int(r["mau"]))
        for r in REGISTRY["events_dau_wau_mau"].fn(spark, SF_DIR).collect()
    }
    expect = {}
    for d in range(d0 + 29, d1 + 1):
        dau = {u for (u, ud) in user_days if ud == d}
        wau = {u for (u, ud) in user_days if d - 6 <= ud <= d}
        mau = {u for (u, ud) in user_days if d - 29 <= ud <= d}
        expect[d] = (len(dau), len(wau), len(mau))
    assert got == expect


def test_nested_struct_ops_matches_python(spark):
    """fn_nested_struct_ops vs per-order Python list processing with
    the same full-struct sort."""
    rows = (
        table(spark, SF_DIR, "lineitem")
        .selectExpr(
            "l_orderkey",
            "l_linenumber",
            "CAST(l_quantity AS BIGINT) q",
            "CAST(round(l_extendedprice*100) AS BIGINT) pc",
        )
        .collect()
    )
    orders: dict[int, list] = defaultdict(list)
    for r in rows:
        orders[int(r["l_orderkey"])].append(
            (int(r["l_linenumber"]), int(r["q"]), int(r["pc"]))
        )
    got = {
        int(r["l_orderkey"]): (
            int(r["n_lines"]),
            int(r["first_line_qty"]),
            int(r["n_big_lines"]),
            int(r["total_cents"]),
        )
        for r in REGISTRY["fn_nested_struct_ops"].fn(spark, SF_DIR).collect()
    }
    for ok, lines in orders.items():
        lines.sort()
        expect = (
            len(lines),
            lines[0][1],
            sum(1 for _, q, _pc in lines if q > 25),
            sum(pc for _, _q, pc in lines),
        )
        assert got[ok] == expect, ok
    assert len(got) == len(orders)


def test_cohort_ltv_matches_python(spark):
    """events_cohort_ltv vs a dict-based cohort accumulation."""
    rows = (
        table(spark, SF_DIR, "orders")
        .selectExpr(
            "o_custkey",
            "year(o_orderdate)*12 + month(o_orderdate) AS m",
            "CAST(round(o_totalprice*100) AS BIGINT) c",
        )
        .collect()
    )
    first_m: dict[int, int] = {}
    for r in rows:
        u, m = int(r["o_custkey"]), int(r["m"])
        first_m[u] = min(first_m.get(u, m), m)
    size: dict[int, int] = defaultdict(int)
    for u, m in first_m.items():
        size[m] += 1
    rev: dict[tuple[int, int], int] = defaultdict(int)
    for r in rows:
        u, m, c = int(r["o_custkey"]), int(r["m"]), int(r["c"])
        rev[(first_m[u], m - first_m[u])] += c
    got = {
        (int(r["cohort_month"]), int(r["age_months"])): (
            int(r["n_customers"]),
            float(r["cum_ltv_per_customer"]),
        )
        for r in REGISTRY["events_cohort_ltv"].fn(spark, SF_DIR).collect()
    }
    for cohort in size:
        cum = 0
        ages = sorted(a for (cm, a) in rev if cm == cohort)
        for a in ages:
            cum += rev[(cohort, a)]
            if a <= 12:
                n, ltv = got[(cohort, a)]
                assert n == size[cohort]
                assert math.isclose(
                    ltv, cum / 100.0 / size[cohort], abs_tol=2e-6
                ), (cohort, a)


def test_poisson_bootstrap_matches_python_hash_replay(spark):
    """stats_bootstrap_poisson_ci vs an exact integer-hash replay of
    the weight draws and resample means."""
    MOD, T, B = 1000003, (367879, 735758, 919698, 981011, 996340), 32
    KEYMOD = 3221225473
    rows = (
        table(spark, SF_DIR, "orders")
        .selectExpr("o_orderkey", "CAST(round(o_totalprice*100) AS BIGINT) c")
        .collect()
    )
    data = [(int(r["o_orderkey"]), int(r["c"])) for r in rows]
    means = []
    for b in range(B):
        swc = sw = 0
        for okey, c in data:
            u = ((okey % KEYMOD) * 2654435761 + b * 2246822519) % MOD
            w = sum(1 for t in T if u >= t) if u >= T[0] else 0
            swc += w * c
            sw += w
        if sw > 0:
            means.append(swc / sw / 100.0)
    means.sort()
    row = REGISTRY["stats_bootstrap_poisson_ci"].fn(spark, SF_DIR).collect()[0]
    assert int(row["n_resamples"]) == len(means)
    point = sum(c for _, c in data) / len(data) / 100.0
    assert math.isclose(float(row["point_mean"]), point, abs_tol=1e-5)
    # CI must bracket the point estimate and sit inside the resample range
    assert means[0] - 1e-6 <= float(row["ci_lo"]) <= float(row["ci_hi"]) <= means[-1] + 1e-6
    lo_q = statistics_quantile(means, 0.025)
    hi_q = statistics_quantile(means, 0.975)
    assert math.isclose(float(row["ci_lo"]), lo_q, abs_tol=1e-5)
    assert math.isclose(float(row["ci_hi"]), hi_q, abs_tol=1e-5)


def statistics_quantile(xs, q):
    """Linear interpolation at rank q*(n-1) — the shared engine definition."""
    n = len(xs)
    pos = q * (n - 1)
    lo = int(pos)
    frac = pos - lo
    return xs[lo] if lo + 1 >= n else xs[lo] + (xs[lo + 1] - xs[lo]) * frac


def test_kcore_peel_matches_python(spark):
    """graph_kcore_peel vs an iterative Python peel on the same edges."""
    edges = _edges_python(spark)
    nodes = {x for e in edges for x in e}
    counts = [len(nodes)]
    cur = set(nodes)
    for _ in range(4):
        kept = [(u, v) for u, v in edges if u in cur and v in cur]
        deg: dict[int, int] = defaultdict(int)
        for u, v in kept:
            deg[u] += 1
            deg[v] += 1
        cur = {x for x, d in deg.items() if d >= 3}
        counts.append(len(cur))
    got = {
        int(r["round"]): int(r["n_nodes"])
        for r in REGISTRY["graph_kcore_peel"].fn(spark, SF_DIR).collect()
    }
    assert got == dict(enumerate(counts))
