"""Distributed sketches: approximate distinct counting (HyperLogLog).

The register build is EXACT and content-addressed — hashes come from the
same md5 ≡ DuckDB ``md5_number_lower`` convention as the curation family
(``'<salt>:' || CAST(key AS VARCHAR)``), so the full register table is
reproducible in oracle SQL bit-for-bit (integer ranks via binary-string
length — no float log2 on either side). Only the final cardinality
ESTIMATE involves floats, and it is a pure driver-side function of the
integer registers.

Scale shape: each batch reduces its keys to per-bucket partial maxima
(≤ m rows per block — m = 2^p registers, never one row per key), the
exchange is a tiny ``groupby(bucket).max``, and merging two sketches is
an elementwise max — unions across datasets/days are free. At p=12,
m = 4096 registers ≈ 1.6% relative standard error regardless of corpus
size; the whole sketch is ~32 KB.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Max

from .curate import _key_u64

HLL_P = 12                      # 2^12 = 4096 registers
_M = 1 << HLL_P
_REM_BITS = 64 - HLL_P          # 52 — floats never touch these ints


def hll_registers(ds: ray.data.Dataset, key_col: str, *,
                  salt: str = "hll") -> ray.data.Dataset:
    """(bucket, register) rows for the observed buckets: bucket = the
    key hash's top ``HLL_P`` bits, register = max over keys of
    (1 + leading-zero count of the remaining 52 bits) — all integer
    arithmetic (``bit_length``, mirrored in SQL as ``length(bin(rem))``).
    Duplicate keys cannot move a register (max of identical ranks), so
    the output is a pure function of the DISTINCT key set."""

    def partial(batch: pa.Table) -> pa.Table:
        h = _key_u64(batch.column(key_col).to_pylist(), salt)
        bucket = (h >> np.uint64(_REM_BITS)).astype(np.int64)
        rem = h & np.uint64((1 << _REM_BITS) - 1)
        # rank = 52 - floor(log2(rem)) for rem>0 == 53 - bit_length(rem);
        # vectorized via the float exponent is UNSAFE near powers of two,
        # so take bit_length per value (ints are exact; ~0.1 µs each)
        rank = np.fromiter(
            (53 - int(r).bit_length() if r else 53 for r in rem),
            dtype=np.int64, count=len(rem))
        df = pd.DataFrame({"bucket": bucket, "register": rank})
        out = df.groupby("bucket", as_index=False)["register"].max()
        return pa.Table.from_pandas(out, preserve_index=False) \
            .replace_schema_metadata(None)

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("bucket").aggregate(Max("register",
                                         alias_name="register"))


def hll_estimate(registers: pd.DataFrame) -> float:
    """Standard HLL estimate from an observed-buckets register frame
    (absent buckets are zeros): alpha_m * m^2 / sum(2^-M_j), with the
    small-range linear-counting correction. Driver-side float math over
    the 4096 integer registers."""
    m = _M
    regs = np.zeros(m, dtype=np.int64)
    regs[registers["bucket"].to_numpy(np.int64)] = \
        registers["register"].to_numpy(np.int64)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.sum(regs == 0))
    if est <= 2.5 * m and zeros > 0:
        return float(m * math.log(m / zeros))
    return float(est)


def approx_distinct(ds: ray.data.Dataset, key_col: str, *,
                    salt: str = "hll") -> float:
    """Approximate COUNT(DISTINCT key_col) — the two-step composition."""
    return hll_estimate(hll_registers(ds, key_col, salt=salt).to_pandas())


# ---------------------------------------------------------------------------
# Count-min sketch (heavy hitters) and Bloom filter — like the HLL, their
# state is pure integers over the md5 hash convention, so the full counter
# table / bit set value-checks in oracle SQL.
# ---------------------------------------------------------------------------

def cms_counters(ds: ray.data.Dataset, key_col: str, *, width: int = 2048,
                 depth: int = 4, salt: str = "cms") -> ray.data.Dataset:
    """Count-min sketch counters as (d, bucket, cnt) rows — cnt is the
    EXACT number of key OCCURRENCES hashing to (row d, bucket), so the
    table is deterministic and SQL-reproducible. Per-batch partial
    counts bound the exchange at depth × width rows per block; two
    sketches merge by elementwise +. ~``depth × width`` ints of state
    estimate any key's frequency within ε·N (ε ≈ e/width) with
    one-sided error (never an undercount)."""

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_pylist()
        frames = []
        for d in range(depth):
            b = (_key_u64(keys, f"{salt}{d}") % np.uint64(width)) \
                .astype(np.int64)
            vc = pd.Series(b).value_counts(sort=False)
            frames.append(pd.DataFrame({
                "d": np.int64(d),
                "bucket": vc.index.to_numpy(np.int64),
                "cnt": vc.to_numpy(np.int64)}))
        out = pd.concat(frames, ignore_index=True)
        return pa.Table.from_pandas(out, preserve_index=False) \
            .replace_schema_metadata(None)

    from ray.data.aggregate import Sum
    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["d", "bucket"]).aggregate(Sum("cnt", alias_name="cnt"))


def cms_estimate(counters: pd.DataFrame, keys, *, width: int = 2048,
                 depth: int = 4, salt: str = "cms") -> pd.Series:
    """Point frequency estimates: min over depth rows of the key's
    counter. Driver-side over the (small) counter frame."""
    lut = {(int(r.d), int(r.bucket)): int(r.cnt)
           for r in counters.itertuples()}
    out = []
    for k in keys:
        # int() BEFORE the modulo: np.uint64 % python-int silently
        # promotes to float64 and corrupts high-bit hashes
        est = min(lut.get(
            (d, int(_key_u64([k], f"{salt}{d}")[0]) % width), 0)
            for d in range(depth))
        out.append(est)
    return pd.Series(out, index=list(keys), dtype=np.int64)


def bloom_bits(ds: ray.data.Dataset, key_col: str, *, m_bits: int = 1 << 15,
               k: int = 4, salt: str = "bloom") -> ray.data.Dataset:
    """Distributed Bloom-filter build (the reference's ST2 mechanism,
    re-expressed exact-checkable): the DISTINCT set-bit positions of the
    key set under ``k`` salted hash functions, one row per set bit.
    Per-batch partials emit each block's distinct bits (≤ m_bits rows),
    a groupby dedups across blocks; two filters union by set-union.
    Membership: a key is possibly-present iff ALL its k bits are set
    (no false negatives by construction)."""

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_pylist()
        bits = np.unique(np.concatenate([
            (_key_u64(keys, f"{salt}{i}") % np.uint64(m_bits))
            .astype(np.int64)
            for i in range(k)])) if keys else np.array([], dtype=np.int64)
        return pa.table({"bit": pa.array(bits, pa.int64())})

    from ray.data.aggregate import Count
    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("bit").aggregate(Count(alias_name="_n")) \
        .select_columns(["bit"])


def bloom_contains(bits: set, keys, *, m_bits: int = 1 << 15, k: int = 4,
                   salt: str = "bloom") -> pd.Series:
    """Membership test against a built filter's set-bit set."""
    out = [all(int(_key_u64([key], f"{salt}{i}")[0]) % m_bits in bits
               for i in range(k)) for key in keys]
    return pd.Series(out, index=list(keys), dtype=bool)


# ---------------------------------------------------------------------------
# Exact distributed heavy hitters via mergeable Misra-Gries summaries
# (Agarwal et al., "Mergeable Summaries", PODS'12) + a candidate recount.
# ---------------------------------------------------------------------------

def mg_summary(ds: ray.data.Dataset, key_col: str, *,
               k: int = 4096) -> tuple[pd.DataFrame, int]:
    """Pass 1 of exact heavy hitters: a merged Misra-Gries summary of
    size ≤ ``k`` PER BLOCK plus its total error bound ``E``.

    Each block reduces to its exact per-key counts, then truncates to an
    MG summary: with ``d`` = the (k+1)-th largest block count (0 when the
    block has ≤ k distinct keys), keep keys whose count exceeds ``d`` with
    stored count ``count − d``. Stored counts UNDERCOUNT the block by at
    most ``d``, so after the (tiny, ≤ k-rows-per-block) groupby-sum merge:

        stored(key) ≤ true(key) ≤ stored(key) + E,   E = Σ_blocks d

    and every key with true count > E appears in the summary — the
    superset guarantee :func:`heavy_hitters` builds on. The exchange
    carries ``min(k, distinct)`` rows per block, never one row per
    occurrence, regardless of corpus size.

    Returns ``(summary frame [key_col, cnt_lb], E)``."""

    def partial(batch: pa.Table) -> pa.Table:
        vc = pd.Series(batch.column(key_col).to_pandas()) \
            .value_counts(sort=True)
        if len(vc) > k:
            d = int(vc.iloc[k])
            vc = (vc.iloc[:k] - d)
            vc = vc[vc > 0]
        else:
            d = 0
        out = pd.DataFrame({key_col: vc.index.to_numpy(),
                            "cnt_lb": vc.to_numpy(np.int64),
                            "err": np.int64(0)})
        # one marker row per block carries the block's decrement; its key
        # slot reuses an arbitrary in-block key (cnt_lb=0, so it merges
        # inertly — emitted even when truncation empties the summary,
        # else E undercounts and the superset guarantee breaks)
        if d:
            marker = pd.DataFrame(
                {key_col: [batch.column(key_col)[0].as_py()],
                 "cnt_lb": np.array([0], np.int64),
                 "err": np.array([d], np.int64)})
            out = pd.concat([out, marker], ignore_index=True)
        return pa.Table.from_pandas(out, preserve_index=False) \
            .replace_schema_metadata(None)

    from ray.data.aggregate import Sum
    merged = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(key_col).aggregate(Sum("cnt_lb", alias_name="cnt_lb"),
                                    Sum("err", alias_name="err")) \
        .to_pandas()
    e_bound = int(merged["err"].sum())
    summary = merged[merged["cnt_lb"] > 0][[key_col, "cnt_lb"]] \
        .reset_index(drop=True)
    return summary, e_bound


def heavy_hitters(ds: ray.data.Dataset, key_col: str, *, threshold: int,
                  k: int = 4096) -> pd.DataFrame:
    """EXACT keys with ≥ ``threshold`` occurrences, in two bounded passes:
    (1) :func:`mg_summary` yields candidates (provable superset of every
    key with true count ≥ threshold, given threshold > E) pruned to those
    whose upper bound ``cnt_lb + E`` can still reach the threshold;
    (2) the candidate set is ``ray.put`` once and each block emits exact
    partial counts for CANDIDATE keys only → a candidates-sized
    groupby-sum → filter. Output counts are exact (SQL-oracle:
    ``GROUP BY key HAVING COUNT(*) ≥ threshold``), yet no pass ever
    shuffles more than ``min(k, |candidates|)`` rows per block.

    Raises when ``threshold ≤ E`` (the summary cannot certify the
    superset) — rerun with a larger ``k`` rather than silently
    degrading to a full-key shuffle."""
    summary, e_bound = mg_summary(ds, key_col, k=k)
    if threshold <= e_bound:
        raise ValueError(
            f"threshold {threshold} <= MG error bound {e_bound}; "
            f"increase k (now {k}) for the superset guarantee")
    cand = summary[summary["cnt_lb"] + e_bound >= threshold][key_col]
    if len(cand) == 0:
        # no key can reach the threshold: return the typed empty frame
        # directly — an empty Dataset to_pandas() drops columns (repo
        # gotcha), so never run the recount pipeline here
        return pd.DataFrame({key_col: summary[key_col].iloc[:0],
                             "n": pd.Series([], dtype=np.int64)})
    cand_ref = ray.put(frozenset(cand.tolist()))
    from .curate import _cached_get

    def recount(batch: pa.Table) -> pa.Table:
        keys = _cached_get(cand_ref)
        s = pd.Series(batch.column(key_col).to_pandas())
        vc = s[s.isin(keys)].value_counts(sort=False)
        return pa.Table.from_pandas(
            pd.DataFrame({key_col: vc.index.to_numpy(),
                          "n": vc.to_numpy(np.int64)}),
            preserve_index=False).replace_schema_metadata(None)

    from ray.data.aggregate import Sum
    out = ds.map_batches(recount, batch_format="pyarrow") \
        .groupby(key_col).aggregate(Sum("n", alias_name="n")).to_pandas()
    out["n"] = out["n"].astype(np.int64)
    return out[out["n"] >= threshold].sort_values(key_col) \
        .reset_index(drop=True)


def grouped_hll_registers(ds: ray.data.Dataset, group_col: str,
                          key_col: str, *,
                          salt: str = "hll") -> ray.data.Dataset:
    """Per-group HLL register tables — (group, bucket, register) rows for
    observed buckets, i.e. HLL as a MERGEABLE GROUPED AGGREGATE (the
    approx-COUNT-DISTINCT-GROUP-BY shape). Same integer register
    arithmetic as :func:`hll_registers`; partials reduce per
    (group, bucket) inside each block, one groupby-max finishes.
    ``group_col`` is dimension-like (the register table is G·m rows)."""

    def partial(batch: pd.DataFrame) -> pa.Table:
        h = _key_u64(batch[key_col].tolist(), salt)
        bucket = (h >> np.uint64(_REM_BITS)).astype(np.int64)
        rem = h & np.uint64((1 << _REM_BITS) - 1)
        rank = np.fromiter(
            (53 - int(r).bit_length() if r else 53 for r in rem),
            dtype=np.int64, count=len(rem))
        df = pd.DataFrame({group_col: batch[group_col].values,
                           "bucket": bucket, "register": rank})
        out = df.groupby([group_col, "bucket"],
                         as_index=False)["register"].max()
        return pa.Table.from_pandas(out, preserve_index=False) \
            .replace_schema_metadata(None)

    return ds.map_batches(partial, batch_format="pandas") \
        .groupby([group_col, "bucket"]) \
        .aggregate(Max("register", alias_name="register"))


def grouped_approx_distinct(ds: ray.data.Dataset, group_col: str,
                            key_col: str, *,
                            salt: str = "hll") -> pd.DataFrame:
    """Per-group approximate COUNT DISTINCT from the grouped registers —
    the standard estimate (alpha·m²/Σ2^-M_j, linear-counting correction)
    applied group-wise on the driver (G·m integer rows). Returns
    (group_col, approx) ordered by group."""
    regs = grouped_hll_registers(ds, group_col, key_col,
                                 salt=salt).to_pandas()
    out = []
    for grp, sub in regs.groupby(group_col):
        out.append((grp, hll_estimate(sub[["bucket", "register"]])))
    return pd.DataFrame(sorted(out), columns=[group_col, "approx"])


# ---------------------------------------------------------------------------
# KMV (k minimum values) distinct-count sketch
# ---------------------------------------------------------------------------

def kmv_minima(ds: ray.data.Dataset, key_col: str, *, k: int = 256,
               salt: str = "kmv") -> np.ndarray:
    """The ``k`` smallest DISTINCT key-hash values (uint64, ascending) —
    the KMV sketch state (Bar-Yossef et al.'s "distinct elements in a
    stream" estimator family).

    Mergeable the HLL way: each block contributes its own k-minima
    partial (duplicates collapse per block via np.unique first), the
    driver merge is bounded by blocks × k hashes — never corpus-sized.
    The state is a pure function of the DISTINCT key set, so two
    sketches merge by taking the k smallest of the union."""

    def partial(batch: pa.Table) -> pa.Table:
        h = np.unique(_key_u64(batch.column(key_col).to_pylist(), salt))
        return pa.table({"hv": pa.array(h[:k], pa.uint64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    merged = np.unique(parts["hv"].to_numpy(dtype=np.uint64))
    return merged[:k]


def kmv_estimate(minima: np.ndarray, k: int) -> tuple[int, float, float]:
    """(k_used, kth_frac, estimate): the classic (k−1)/R estimator with
    R = kth-smallest hash normalized into (0, 1]. Written as EXACTLY the
    float expression the SQL oracle uses — ``(k_used − 1) / (max(minima)
    / 2^64)`` — including when fewer than ``k`` distinct keys exist, so
    the two sides stay bit-comparable after rounding."""
    k_used = int(min(k, len(minima)))
    kth = float(minima[k_used - 1])
    kth_frac = kth / 18446744073709551616.0
    return k_used, kth_frac, (k_used - 1) / kth_frac
