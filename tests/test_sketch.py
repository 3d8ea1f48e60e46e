"""HyperLogLog sketch (ops.sketch): exact register parity + estimate
accuracy + merge-by-max property."""
import hashlib

import numpy as np
import pandas as pd
import pytest

from wtes_ray.ops import sketch as SK


def _brute_registers(keys, salt="hll"):
    regs = {}
    for k in set(str(k) for k in keys):
        h = int.from_bytes(
            hashlib.md5(f"{salt}:{k}".encode()).digest()[8:16], "little")
        b = h >> 52
        rem = h & ((1 << 52) - 1)
        rank = 53 - rem.bit_length() if rem else 53
        regs[b] = max(regs.get(b, 0), rank)
    return regs


@pytest.fixture(scope="module")
def keyed_ds(ray_session):
    import ray.data

    rng = np.random.RandomState(11)
    keys = rng.randint(0, 30_000, size=80_000)   # dups galore
    return (ray.data.from_pandas(pd.DataFrame({"k": keys})).repartition(8),
            keys)


def test_hll_registers_match_bruteforce(keyed_ds):
    ds, keys = keyed_ds
    got = SK.hll_registers(ds, "k").to_pandas()
    want = _brute_registers(keys)
    assert dict(zip(got["bucket"], got["register"])) == want


def test_hll_estimate_within_rse(keyed_ds):
    ds, keys = keyed_ds
    true = len(set(keys))
    est = SK.approx_distinct(ds, "k")
    # p=12 → rse ≈ 1.04/sqrt(4096) = 1.6%; allow 4 sigma
    assert abs(est - true) / true < 0.065


def test_hll_duplicates_and_merge_property(ray_session):
    import ray.data

    a = pd.DataFrame({"k": list(range(500))})
    dup = pd.DataFrame({"k": list(range(500)) * 3})
    ra = SK.hll_registers(ray.data.from_pandas(a), "k").to_pandas()
    rd_ = SK.hll_registers(ray.data.from_pandas(dup), "k").to_pandas()
    # duplicates cannot move any register
    pd.testing.assert_frame_equal(
        ra.sort_values("bucket").reset_index(drop=True),
        rd_.sort_values("bucket").reset_index(drop=True))
    # union sketch == elementwise max of the two half sketches
    b = pd.DataFrame({"k": list(range(400, 900))})
    rb = SK.hll_registers(ray.data.from_pandas(b), "k").to_pandas()
    ru = SK.hll_registers(
        ray.data.from_pandas(pd.concat([a, b])), "k").to_pandas()
    merged = pd.concat([ra, rb]).groupby("bucket", as_index=False) \
        .max().sort_values("bucket").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        ru.sort_values("bucket").reset_index(drop=True), merged)
    # small-range correction path: estimate of 900 keys is close
    assert abs(SK.hll_estimate(ru) - 900) / 900 < 0.065


def test_grouped_hll_matches_per_group_ungrouped(ray_session):
    """Per-group registers/estimates == running the ungrouped sketch on
    each group's slice — grouping must not change the arithmetic."""
    import ray.data

    rng = np.random.RandomState(7)
    df = pd.DataFrame({"g": rng.choice(["a", "b", "c"], size=6_000),
                       "k": rng.randint(0, 2_000, size=6_000)})
    ds = ray.data.from_pandas(df).repartition(6)
    got = SK.grouped_approx_distinct(ds, "g", "k")
    for grp, sub in df.groupby("g"):
        solo = SK.approx_distinct(ray.data.from_pandas(sub[["k"]]), "k")
        assert got.loc[got["g"] == grp, "approx"].iloc[0] == solo


def test_cms_counts_exact_for_heavy_and_one_sided(ray_session):
    import ray.data

    keys = ["hot"] * 500 + [f"cold{i}" for i in range(300)]
    ds = ray.data.from_pandas(pd.DataFrame({"k": keys})).repartition(4)
    counters = SK.cms_counters(ds, "k", width=256, depth=4).to_pandas()
    # total per depth row == N (counts are exact occurrence counts)
    assert (counters.groupby("d")["cnt"].sum() == len(keys)).all()
    est = SK.cms_estimate(counters, ["hot", "cold7", "absent"], width=256,
                          depth=4)
    assert est["hot"] >= 500            # never undercounts
    assert est["cold7"] >= 1
    assert est["hot"] <= 500 + 300      # bounded by collisions
    # absent keys may collide, but min-over-depth keeps them small
    assert est["absent"] <= 300


def test_bloom_no_false_negatives(ray_session):
    import ray.data

    present = [f"k{i}" for i in range(400)]
    ds = ray.data.from_pandas(pd.DataFrame({"k": present})).repartition(4)
    bits = set(SK.bloom_bits(ds, "k").to_pandas()["bit"])
    got = SK.bloom_contains(bits, present)
    assert got.all()                    # zero false negatives
    absent = [f"miss{i}" for i in range(400)]
    fp = SK.bloom_contains(bits, absent).mean()
    # m=32768, k=4, n=400 → theoretical fp ~ (1-exp(-kn/m))^k ≈ 5e-6
    assert fp < 0.01


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def skewed_ds(ray_session):
    import ray.data

    rng = np.random.RandomState(7)
    keys = (rng.zipf(1.3, 120_000) % 3000).astype(np.int64)
    return (ray.data.from_pandas(pd.DataFrame({"k": keys})).repartition(8),
            keys)


def test_mg_summary_superset_guarantee(skewed_ds):
    """Mergeable-summaries bound: stored <= true <= stored + E, and every
    key with true count > E survives truncation — at a k small enough
    that every block genuinely truncates."""
    ds, keys = skewed_ds
    summary, e_bound = SK.mg_summary(ds, "k", k=64)
    assert e_bound > 0          # truncation actually exercised
    true = pd.Series(keys).value_counts()
    stored = dict(zip(summary["k"], summary["cnt_lb"]))
    for key, t in true.items():
        if t > e_bound:
            assert key in stored
        if key in stored:
            assert stored[key] <= t <= stored[key] + e_bound


def test_heavy_hitters_exact(skewed_ds):
    ds, keys = skewed_ds
    _, e_bound = SK.mg_summary(ds, "k", k=64)
    thr = e_bound + 40
    got = SK.heavy_hitters(ds, "k", threshold=thr, k=64)
    true = pd.Series(keys).value_counts()
    want = true[true >= thr].sort_index()
    assert list(got["k"]) == list(want.index)
    assert list(got["n"]) == list(want.values)


def test_heavy_hitters_rejects_uncertifiable_threshold(skewed_ds):
    ds, _ = skewed_ds
    _, e_bound = SK.mg_summary(ds, "k", k=64)
    with pytest.raises(ValueError, match="error bound"):
        SK.heavy_hitters(ds, "k", threshold=e_bound, k=64)


def test_heavy_hitters_string_keys(ray_session):
    """Key-type agnostic (the extraction corpus keys are string URLs)."""
    import ray.data

    df = pd.DataFrame({"k": ["a"] * 30 + ["b"] * 10 + ["c"] * 3})
    ds = ray.data.from_pandas(df).repartition(3)
    got = SK.heavy_hitters(ds, "k", threshold=10)
    assert list(got["k"]) == ["a", "b"]
    assert list(got["n"]) == [30, 10]


def test_heavy_hitters_empty_when_threshold_unreachable(ray_session):
    import pandas as pd
    import ray.data as rd

    from wtes_ray.ops.sketch import heavy_hitters

    ds = rd.from_pandas(pd.DataFrame({"k": ["a", "b", "c", "a"]}))
    out = heavy_hitters(ds, "k", threshold=3)
    assert list(out.columns) == ["k", "n"] and len(out) == 0
