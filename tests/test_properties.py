"""Property-based tests (hypothesis): the pure-Python codec kernels are
total on their encode domains, and the determinism layer's core claim —
decimal-accumulated float sums are exact and partitioning-invariant —
holds for arbitrary money-like inputs, not just the fixture values.
"""

from __future__ import annotations

from decimal import Decimal

from hypothesis import given, settings, strategies as st

from python_etl_sample_spark.operators.multimodal import (
    decode_image,
    decode_wav,
    encode_bmp,
    encode_ppm,
    encode_ppm_stream,
    encode_wav,
    iter_ppm_frames,
)

dims = st.tuples(st.integers(1, 24), st.integers(1, 24))


@given(dims, st.binary(min_size=0, max_size=64))
def test_bmp_roundtrip(wh, seed):
    w, h = wh
    pixels = (seed or b"\x00") * (w * h * 3 // max(1, len(seed or b"\x00")) + 1)
    payload = encode_bmp(w, h, pixels)
    assert decode_image(payload) == (w, h, 3)


@given(dims, st.binary(min_size=0, max_size=64))
def test_ppm_roundtrip(wh, seed):
    w, h = wh
    pixels = (seed or b"\x00") * (w * h * 3 // max(1, len(seed or b"\x00")) + 1)
    payload = encode_ppm(w, h, pixels)
    assert decode_image(payload) == (w, h, 3)


@given(st.lists(st.tuples(dims, st.binary(min_size=1, max_size=16)), min_size=1, max_size=6))
def test_ppm_stream_recovers_every_frame(frames_spec):
    frames, want = [], []
    for (w, h), seed in frames_spec:
        px = (seed * (w * h * 3 // len(seed) + 1))[: w * h * 3]
        frames.append(encode_ppm(w, h, px))
        want.append((w, h, px))
    got = list(iter_ppm_frames(encode_ppm_stream(frames)))
    assert got == want


@given(
    st.integers(8000, 48000),
    st.binary(min_size=2, max_size=256).filter(lambda b: len(b) % 2 == 0),
)
def test_wav_roundtrip(rate, pcm):
    rate_out, channels, bits, pcm_out = decode_wav(encode_wav(rate, pcm))
    assert (rate_out, channels, bits) == (rate, 1, 16)
    assert pcm_out == pcm


# money-like values: 2 decimal places, magnitudes like the fixtures'
money = st.integers(-10_000_000, 10_000_000).map(lambda c: c / 100.0)


@settings(max_examples=8, deadline=None)
@given(st.lists(money, min_size=1, max_size=200))
def test_dsum_is_exact_and_partitioning_invariant(spark, values):
    from python_etl_sample_spark.functions.determinism import dsum

    df = spark.createDataFrame([(v,) for v in values], "v double")
    one = df.repartition(1).agg(dsum("v").alias("s")).collect()[0]["s"]
    many = df.repartition(7).agg(dsum("v").alias("s")).collect()[0]["s"]
    exact = float(sum(Decimal(f"{v:.2f}") for v in values))
    assert one == many == exact


def test_cc_kernels_agree_on_random_graphs(spark):
    """The two connected-components formulations in
    functions/components.py (pointer-jumped hash-min — the shipped
    kernel — and large-star/small-star contraction) must label random
    graphs identically, and identically to a pure-Python union-find.
    Graph shapes chosen to cover the adversarial cases: chains (worst
    diameter), stars (the near-dup shape), and sparse random."""
    import random

    from python_etl_sample_spark.functions.components import (
        pointer_jump_components,
        star_contract_components,
    )

    rng = random.Random(421)
    cases = []
    # chain of 33, a 12-star, and three sparse G(n, m) graphs
    cases.append([(i, i + 1) for i in range(33)])
    cases.append([(50, 50 + i) for i in range(1, 13)])
    for n, m in ((40, 25), (60, 70), (25, 5)):
        cases.append(
            [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        )
    for edges_py in cases:
        edges_py = [e for e in edges_py if e[0] != e[1]]
        if not edges_py:
            continue
        # union-find ground truth
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges_py:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {x: find(x) for x in parent}

        edges = spark.createDataFrame(edges_py, "src int, dst int")
        n_nodes = len(want)
        got_pj = {
            r["node"]: r["lab"]
            for r in pointer_jump_components(edges, n_bound=n_nodes).collect()
        }
        got_star = {
            r["node"]: r["lab"]
            for r in star_contract_components(edges, n_bound=n_nodes).collect()
        }
        assert got_pj == want, "pointer-jump kernel diverged from union-find"
        assert got_star == want, "star-contract kernel diverged from union-find"
