"""HyperLogLog approximate-distinct sketch (stages/sketches.py): accuracy
vs ground truth, determinism across block structure, mergeability, and the
token-level convenience vs the exact distinct-term count."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from uci_searchengine_ray.stages import sketches


def test_register_math_known_values():
    # all-zero suffix → rho cap 64-p+1; suffix with top bit set → rho 1
    p = 12
    h = np.array([0, 1 << 51], dtype=np.uint64)  # idx 0 both
    regs = sketches._registers_from_hashes(h, p)
    assert regs[0] == 64 - p + 1  # zero suffix hits the cap
    h2 = np.array([np.uint64(1) << np.uint64(63 - p)], dtype=np.uint64)
    # suffix's top bit set → one leading zero? top bit of the 52-bit
    # suffix is bit 51; 1<<51 has rho 1
    regs2 = sketches._registers_from_hashes(
        np.array([np.uint64(1) << np.uint64(51)], dtype=np.uint64), p
    )
    assert regs2[0] == 1


def test_accuracy_and_merge():
    rng = np.random.default_rng(0)
    vals = rng.choice(10_000_000, size=120_000, replace=False)[:100_000]
    h = sketches.mix64(vals.astype(np.uint64))
    regs = sketches._registers_from_hashes(h, 12)
    est = sketches._estimate(regs)
    assert abs(est - 100_000) / 100_000 < 0.05  # 3×RSE ≈ 4.8%
    # union of halves == whole (elementwise max merge)
    r1 = sketches._registers_from_hashes(h[:50_000], 12)
    r2 = sketches._registers_from_hashes(h[50_000:], 12)
    merged = sketches.merge_registers([r1.tobytes(), r2.tobytes()])
    assert np.array_equal(merged, regs)


def test_dataset_sketch_deterministic_across_blocks(ray_session):
    import ray.data

    rng = np.random.default_rng(1)
    vals = [f"v{int(x)}" for x in rng.integers(0, 50_000, size=80_000)]
    truth = len(set(vals))
    tbl = pa.table({"v": pa.array(vals, pa.string())})
    a = sketches.approx_distinct(
        ray.data.from_arrow(tbl), "v", num_buckets=4
    )
    b = sketches.approx_distinct(
        ray.data.from_arrow(tbl).repartition(17), "v", num_buckets=4
    )
    assert a == b  # max-merge is order/block-structure independent
    assert abs(a - truth) / truth < 0.05


def test_approx_distinct_tokens_vs_exact(ray_session):
    from uci_searchengine_ray.pipelines import analysis

    sf = "/root/testdata/sf0.01"
    exact = analysis.term_stats(sf).count()
    approx = analysis.approx_distinct_tokens(sf)
    assert abs(approx - exact) / exact < 0.05, (approx, exact)


def test_heavy_hitters_vs_exact(ray_session):
    """Count-min heavy hitters: top-10 by estimated occurrence count must
    overlap the exact cf top-10 ≥ 80%, with one-sided estimates
    (est ≥ true count, over-count bounded by eps·N)."""
    from uci_searchengine_ray.pipelines import analysis

    sf = "/root/testdata/sf0.01"
    approx = analysis.approx_top_terms(sf, k=10).to_pandas()
    exact = (
        analysis.term_stats(sf)
        .to_pandas()
        .sort_values(["cf", "term"], ascending=[False, True])
        .head(10)
    )
    overlap = len(set(approx["term"]) & set(exact["term"]))
    assert overlap >= 8, (sorted(approx["term"]), sorted(exact["term"]))
    truth = dict(zip(exact["term"], exact["cf"]))
    n_total = int(analysis.term_stats(sf).to_pandas()["cf"].sum())
    eps_bound = 2 * n_total / (1 << 14) + 1
    for t, est in zip(approx["term"], approx["est_count"]):
        if t in truth:
            assert est >= truth[t]                 # never under
            assert est <= truth[t] + eps_bound     # bounded over
