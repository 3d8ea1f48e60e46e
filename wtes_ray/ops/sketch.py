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
