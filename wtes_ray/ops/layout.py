"""Z-order (Morton) layout clustering for two-dimensional read pruning.

The lakehouse multi-dimensional story: a fact table clustered by ONE
column prunes range reads on that column only; interleaving the bucket
bits of TWO columns into a Morton key and partitioning by the key lets a
2-D box predicate read only the cells the box covers. At 100 TB this is
a LAYOUT choice — the write is one streaming pass (each row's cell is a
pure function of its own values; no shuffle beyond the partitioned
write), and a box query opens only covered cell directories.

Bucketing is integer-exact: ``width = max_value // cells_per_dim + 1``
computed from one Max aggregate, ``bucket = value // width`` — the same
two integer divisions the SQL oracle runs, so cell ids match bit-exactly.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def morton2(xb: np.ndarray, yb: np.ndarray, bits: int) -> np.ndarray:
    """Interleave the low ``bits`` bits of two bucket arrays — x in the
    even positions, y in the odd — vectorized (one shift/mask pass per
    bit; bits is small)."""
    x = xb.astype(np.int64)
    y = yb.astype(np.int64)
    z = np.zeros(len(x), dtype=np.int64)
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def morton2_sql(x_expr: str, y_expr: str, bits: int) -> str:
    """The SAME interleave as :func:`morton2`, unrolled as integer SQL
    (``//`` and ``%`` — no floats anywhere)."""
    terms = []
    for i in range(bits):
        terms.append(f"(({x_expr}) // {1 << i} % 2) * {1 << (2 * i)}")
        terms.append(f"(({y_expr}) // {1 << i} % 2) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


def dim_width(ds: ray.data.Dataset, col: str, cells: int) -> int:
    """Integer bucket width putting ``col`` into ``cells`` buckets:
    ``max(col) // cells + 1`` (one Max aggregate — the only pre-pass)."""
    from ray.data.aggregate import Max
    mx = ds.aggregate(Max(col, alias_name="m"))["m"]
    return int(mx) // cells + 1


def zorder_write(ds: ray.data.Dataset, out_dir: str, *, x_col: str,
                 y_col: str, wx: int, wy: int, bits: int
                 ) -> None:
    """Cluster ``ds`` by the Morton cell of (x//wx, y//wy) and write one
    parquet directory per cell (``zcell=<id>``). Each row's cell is local
    arithmetic — the write is the only exchange."""
    def tag(t: pa.Table) -> pa.Table:
        x = t.column(x_col).to_numpy(zero_copy_only=False)
        y = t.column(y_col).to_numpy(zero_copy_only=False)
        z = morton2(x // wx, y // wy, bits)
        return t.append_column("zcell", pa.array(z, pa.int64()))

    ds.map_batches(tag, batch_format="pyarrow") \
        .write_parquet(out_dir, partition_cols=["zcell"])


def zorder_box_read(out_dir: str, *, xb_range: tuple[int, int],
                    yb_range: tuple[int, int], bits: int
                    ) -> ray.data.Dataset:
    """Read ONLY the cells covered by the bucket-space box
    ``[xb_range) × [yb_range)`` — files outside the cover never open.
    The cover is the exact cell enumeration (boxes are small in bucket
    space by construction; a BIGMIN walk replaces this at huge bits)."""
    cover = {int(z) for z in morton2(
        np.repeat(np.arange(*xb_range), yb_range[1] - yb_range[0]),
        np.tile(np.arange(*yb_range), xb_range[1] - xb_range[0]),
        bits)}

    def _cell(d: str) -> int:
        # Non-zcell / malformed directory names never match the cover.
        try:
            return int(d[6:])
        except ValueError:
            return -1

    files = [os.path.join(out_dir, d, f)
             for d in sorted(os.listdir(out_dir))
             if d.startswith("zcell=") and _cell(d) in cover
             for f in sorted(os.listdir(os.path.join(out_dir, d)))]
    if not files:
        # Empty cover (box misses every written cell): an empty dataset,
        # not a read_parquet([]) crash. Schema comes from any one cell.
        any_dir = next((d for d in sorted(os.listdir(out_dir))
                        if d.startswith("zcell=")), None)
        if any_dir is None:
            return ray.data.from_items([])
        sample = os.path.join(out_dir, any_dir,
                              sorted(os.listdir(os.path.join(out_dir,
                                                             any_dir)))[0])
        return ray.data.read_parquet([sample]).limit(0)
    return ray.data.read_parquet(files)
