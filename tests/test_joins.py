"""Bucketed hash join (ops/joins.py): parity with pandas merge for every
join mode, int and string keys, multiple buckets, and the per-bucket
prepare hooks that finish partial aggregates."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from wtes_ray.ops.joins import bucketed_hash_join


def _left_df(n=200):
    rng = np.random.RandomState(3)
    return pd.DataFrame({
        "k": rng.randint(0, 60, size=n).astype("int64"),
        "v": rng.standard_normal(n),
    })


def _right_df():
    # keys 40..79: overlaps half the left key space, half unmatched each way
    return pd.DataFrame({
        "k": np.arange(40, 80, dtype="int64"),
        "w": [f"w{i}" for i in range(40, 80)],
    })


def _ds(df, blocks=4):
    return rd.from_pandas(df).repartition(blocks)


@pytest.mark.parametrize("how", ["inner", "left", "semi", "anti"])
def test_join_modes_match_pandas(ray_session, how):
    l, r = _left_df(), _right_df()
    got = bucketed_hash_join(_ds(l), _ds(r), "k", how=how,
                             num_buckets=7).to_pandas()
    if how == "inner" or how == "left":
        want = l.merge(r, on="k", how=how)
    elif how == "semi":
        want = l[l["k"].isin(set(r["k"]))]
    else:
        want = l[~l["k"].isin(set(r["k"]))]
    sort_cols = [c for c in ("k", "v", "w") if c in want.columns]
    got = got.sort_values(sort_cols).reset_index(drop=True)
    want = want.sort_values(sort_cols).reset_index(drop=True)
    if how == "left":
        # left join null-pads unmatched right columns; normalize the two
        # null spellings (None vs NaN) before the frame compare — pandas
        # is deprecating their implicit equivalence
        for c in want.columns:
            if want[c].isna().any() or got[c].isna().any():
                got[c] = got[c].where(got[c].notna(), np.nan)
                want[c] = want[c].where(want[c].notna(), np.nan)
    pd.testing.assert_frame_equal(got[want.columns], want,
                                  check_dtype=(how != "left"))


def test_string_keys(ray_session):
    l = pd.DataFrame({"k": [f"u{i % 9}" for i in range(50)],
                      "v": np.arange(50)})
    r = pd.DataFrame({"k": [f"u{i}" for i in range(5)],
                      "lab": [f"L{i}" for i in range(5)]})
    got = bucketed_hash_join(_ds(l, 3), _ds(r, 2), "k",
                             num_buckets=4).to_pandas()
    want = l.merge(r, on="k")
    got = got.sort_values(["k", "v"]).reset_index(drop=True)
    want = want.sort_values(["k", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_prepare_hooks_finish_partial_aggregates(ray_session):
    # left arrives as per-block PARTIAL sums; the bucket co-locates all
    # partials of a key, left_prepare finishes the reduction before merge
    l = pd.DataFrame({"k": [1, 1, 2, 2, 3, 3] * 4,
                      "rev": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0] * 4})
    r = pd.DataFrame({"k": [1, 2, 9], "name": ["a", "b", "z"]})
    got = bucketed_hash_join(
        _ds(l, 6), _ds(r, 1), "k", num_buckets=3,
        left_prepare=lambda d: d.groupby("k", as_index=False)["rev"].sum(),
        right_prepare=lambda d: d.drop_duplicates("k"),
    ).to_pandas().sort_values("k").reset_index(drop=True)
    want = pd.DataFrame({"k": [1, 2], "rev": [12.0, 28.0],
                         "name": ["a", "b"]})
    pd.testing.assert_frame_equal(got[["k", "rev", "name"]], want)


def test_collision_and_type_errors(ray_session):
    l = _ds(pd.DataFrame({"k": [1], "v": [1.0]}), 1)
    r_shared = _ds(pd.DataFrame({"k": [1], "v": [2.0]}), 1)
    with pytest.raises(ValueError, match="collision"):
        bucketed_hash_join(l, r_shared, "k")
    r_str = _ds(pd.DataFrame({"k": ["1"], "w": [2.0]}), 1)
    with pytest.raises(TypeError, match="mismatch"):
        bucketed_hash_join(l, r_str, "k")
    with pytest.raises(ValueError, match="how"):
        bucketed_hash_join(l, _ds(pd.DataFrame({"k": [1], "w": [1.0]}), 1),
                           "k", how="outer")


def test_timestamp_payload_survives(ray_session):
    # null-padding a timestamp column through the union must round-trip
    l = pd.DataFrame({"k": np.arange(10, dtype="int64"),
                      "v": np.arange(10.0)})
    r = pd.DataFrame({"k": np.arange(0, 10, 2, dtype="int64"),
                      "ts": pd.date_range("2024-01-01", periods=5,
                                          freq="D").astype("datetime64[us]")})
    got = bucketed_hash_join(_ds(l, 2), _ds(r, 2), "k",
                             num_buckets=3).to_pandas()
    want = l.merge(r, on="k")
    got = got.sort_values("k").reset_index(drop=True)
    want = want.sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns], want)


@pytest.mark.parametrize("how", ["inner", "left", "semi", "anti"])
def test_arrow_bucket_impl_matches_pandas_impl(ray_session, how):
    """bucket_impl='arrow' (Acero per-bucket join, zero pandas) must give
    the same ROW SET as the default pandas body for every mode —
    including an empty-ish bucket count and left-join null padding."""
    l, r = _left_df(), _right_df()
    a = bucketed_hash_join(_ds(l), _ds(r), "k", how=how, num_buckets=7,
                           bucket_impl="arrow").to_pandas()
    b = bucketed_hash_join(_ds(l), _ds(r), "k", how=how,
                           num_buckets=7).to_pandas()
    sort_cols = [c for c in ("k", "v", "w") if c in a.columns]
    a = a.sort_values(sort_cols).reset_index(drop=True)
    b = b.sort_values(sort_cols).reset_index(drop=True)
    for c in b.columns:
        if a[c].isna().any() or b[c].isna().any():
            a[c] = a[c].where(a[c].notna(), np.nan)
            b[c] = b[c].where(b[c].notna(), np.nan)
    pd.testing.assert_frame_equal(a[b.columns], b, check_dtype=False)


def test_arrow_bucket_impl_keeps_int_types_on_left_join(ray_session):
    """The arrow body's advantage over pandas merge: unmatched left rows
    null-pad INT right columns as Arrow nulls in the pinned int type —
    no float64 promotion anywhere."""
    l = pd.DataFrame({"k": np.arange(6, dtype="int64")})
    r = pd.DataFrame({"k": np.arange(3, dtype="int64"),
                      "n": np.arange(100, 103, dtype="int64")})
    out = bucketed_hash_join(_ds(l, 2), _ds(r, 2), "k", how="left",
                             num_buckets=3, bucket_impl="arrow")
    sch = out.schema()
    assert dict(zip(sch.names, sch.types))["n"] == pa.int64()
    df = out.to_pandas().sort_values("k")
    assert df["n"].isna().sum() == 3


# ---------------------------------------------------------------------------
# global_asof_join
# ---------------------------------------------------------------------------

def test_global_asof_matches_merge_asof_reference(ray_session):
    import ray.data as rd

    from wtes_ray.ops.joins import global_asof_join

    rng = np.random.RandomState(11)
    # sparse right side so many buckets are right-empty → carry-in must
    # cross bucket boundaries; left keys both before and after all rights
    lk = np.sort(rng.choice(np.arange(0, 100_000), 400, replace=False))
    rk = np.sort(rng.choice(np.arange(5_000, 60_000), 25, replace=False))
    left = pd.DataFrame({"lid": np.arange(400, dtype=np.int64),
                         "k": lk.astype(np.int64)})
    right = pd.DataFrame({"k": rk.astype(np.int64),
                          "v": rng.rand(25)})
    got = global_asof_join(
        rd.from_pandas(left), rd.from_pandas(right),
        left_on="k", right_on="k", value_col="v",
        num_buckets=32).to_pandas().sort_values("lid").reset_index(drop=True)
    want = pd.merge_asof(left, right, on="k", direction="backward")
    assert got["lid"].tolist() == want["lid"].tolist()
    np.testing.assert_allclose(got["v"], want["v"])  # NaN == NaN here
    # left rows before the first right row really are unmatched
    assert got.loc[got["k"] < rk[0], "v"].isna().all()
    # exact-timestamp matches are included
    exact = got.loc[got["k"].isin(set(rk)), ["k", "v"]]
    if len(exact):
        m = right.set_index("k")["v"]
        assert (exact["v"].to_numpy() ==
                m.loc[exact["k"]].to_numpy()).all()


def test_global_asof_timestamp_keys(ray_session):
    import ray.data as rd

    from wtes_ray.ops.joins import global_asof_join

    t0 = pd.Timestamp("2025-01-01")
    left = pd.DataFrame({
        "lid": np.arange(6, dtype=np.int64),
        "ts": [t0 + pd.Timedelta(minutes=m) for m in (0, 5, 10, 15, 20, 25)]})
    right = pd.DataFrame({
        "ts": [t0 + pd.Timedelta(minutes=m) for m in (4, 15)],
        "v": [1.5, 2.5]})
    got = global_asof_join(
        rd.from_pandas(left), rd.from_pandas(right),
        left_on="ts", right_on="ts", value_col="v",
        num_buckets=4).to_pandas().sort_values("lid")
    vals = got["v"].tolist()
    assert np.isnan(vals[0])                 # before first tick
    assert vals[1] == 1.5 and vals[2] == 1.5
    assert vals[3] == 2.5                    # exact match at 15min
    assert vals[4] == 2.5 and vals[5] == 2.5


def test_global_asof_empty_right(ray_session):
    import ray.data as rd

    from wtes_ray.ops.joins import global_asof_join

    left = pd.DataFrame({"lid": [0, 1], "k": np.int64([3, 9])})
    right = pd.DataFrame({"k": pd.Series([], dtype="int64"),
                          "v": pd.Series([], dtype="float64")})
    got = global_asof_join(
        rd.from_pandas(left), rd.from_pandas(right),
        left_on="k", right_on="k", value_col="v").to_pandas()
    assert len(got) == 2 and got["v"].isna().all()


def test_bloom_semi_prefilter_no_false_negatives(ray_session):
    import ray.data as rd

    from wtes_ray.ops.joins import bloom_semi_prefilter

    rng = np.random.default_rng(3)
    big = pd.DataFrame({"k": rng.integers(0, 10_000, size=20_000),
                        "v": np.arange(20_000)})
    keys = pd.DataFrame({"k": np.arange(0, 10_000, 97)})  # ~104 members
    out = bloom_semi_prefilter(
        rd.from_pandas(big).repartition(4), "k",
        rd.from_pandas(keys), "k", m_bits=1 << 14).to_pandas()
    member = big["k"].isin(set(keys["k"]))
    # every true match survives (no false negatives)
    assert set(big.loc[member, "v"]) <= set(out["v"])
    # and the filter actually filtered (fp rate far below 50%)
    assert len(out) < 0.5 * len(big)


def test_join_output_blocks_contain_complete_key_groups(ray_session):
    """The q21/per-group-finish contract: bucketed_hash_join's output
    blocks are its hash buckets, so EVERY key's rows live in exactly one
    block — a map_batches(batch_size=None) over the join output may
    legally finish per-key logic without another exchange."""
    import pyarrow as pa
    import ray

    rng = np.random.RandomState(5)
    left = pd.DataFrame({"k": rng.randint(0, 300, size=3000),
                         "v": np.arange(3000)})
    right = pd.DataFrame({"k": np.arange(300), "w": np.arange(300) * 10})
    out = bucketed_hash_join(
        rd.from_pandas(left).repartition(7),
        rd.from_pandas(right).repartition(3), "k", num_buckets=16)
    blocks = [pa.Table.from_pandas(b) if not isinstance(b, pa.Table) else b
              for b in ray.get(out.to_arrow_refs())]
    # Ray's groupby.map_groups may emit EMPTY (even schemaless) blocks for
    # sort partitions that received no groups — they carry no keys, so they
    # cannot violate the co-partition contract; skip them
    blocks = [b for b in blocks if b.num_rows > 0]
    seen = {}
    for i, b in enumerate(blocks):
        for k in set(b["k"].to_pylist()):
            assert seen.setdefault(k, i) == i, \
                f"key {k} split across blocks {seen[k]} and {i}"
    # and nothing was lost
    assert sum(b.num_rows for b in blocks) == len(left)


def test_join_survives_empty_pandas_blocks_and_pins_types(ray_session):
    """Regression: a pandas map stage whose task output is EMPTY emits a
    schemaless empty pandas block (Ray forwards empty blocks around
    UDFs); the sort reduce then normalizes partitions to their most
    prevalent block type, which can drag a partition through pandas —
    padded int64 degrades to float64 and all-null string to null-type,
    which the Acero body used to reject ('Data type null is not
    supported in join non-key field'). The join must survive and return
    the PINNED output types."""
    import pyarrow as pa

    left = rd.from_pandas(pd.DataFrame(
        {"k": np.arange(1000, dtype=np.int64),
         "x": np.arange(1000, dtype=np.int64)})).repartition(8)
    rsrc = rd.from_pandas(pd.DataFrame(
        {"k": np.arange(50, dtype=np.int64),
         "g": np.arange(50, dtype=np.int64)})).repartition(8)
    lut = {i: f"n{i}" for i in range(10)}

    def side(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"k": df["k"], "name": df["g"].map(lut)})
        return out[out["name"].notna()]   # most task outputs are EMPTY

    right = rsrc.map_batches(side, batch_format="pandas")
    for how, want_rows in (("inner", 10), ("left", 1000),
                           ("semi", 10), ("anti", 990)):
        out = bucketed_hash_join(
            left, right, "k", how=how, num_buckets=8,
            left_schema=pa.schema([("k", pa.int64()), ("x", pa.int64())]),
            right_schema=pa.schema([("k", pa.int64()),
                                    ("name", pa.string())]))
        df = out.to_pandas()
        assert len(df) == want_rows, (how, len(df))
        assert df["x"].dtype == np.int64, (how, df.dtypes)
        if how == "inner":
            assert sorted(df["name"]) == sorted(lut.values())
