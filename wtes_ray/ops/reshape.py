"""Reshape operators: pivot (long → wide) and unpivot (wide → long).

A pivot with a KNOWN categorical value set is conditional aggregation —
each block contributes one partial wide row per group (vectorized
crosstab), one group-keyed groupby sums the partials, and no row-level
data rides the exchange. That is the only pivot shape that scales: an
unknown value set needs a distinct-values pass first (do that explicitly,
then call this). The reference system materializes wide tag tables
per-record (tableExtractor.py builds per-page wide property rows); this
is the corpus-level equivalent.

Unpivot is embarrassingly parallel: each wide row melts independently
inside its block.
"""

from __future__ import annotations

import pandas as pd
import ray.data


def pivot_counts(ds: ray.data.Dataset, *, group_col: str, pivot_col: str,
                 values: list[str], prefix: str = "cnt_"
                 ) -> ray.data.Dataset:
    """Wide count table: one row per ``group_col`` value, one
    ``{prefix}{value}`` column per entry of ``values`` holding the number
    of input rows with that (group, value) pair. Rows whose pivot value is
    NOT in ``values`` are ignored (the caller fixed the value set).

    Scale shape: per-block ``pd.crosstab`` partials (≤ groups-in-block
    rows regardless of block size) → ONE groupby-sum over the group key.
    """
    from ray.data.aggregate import Sum as _Sum

    cols = [f"{prefix}{v}" for v in values]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ct = pd.crosstab(batch[group_col], batch[pivot_col])
        ct = ct.reindex(columns=values, fill_value=0)
        out = pd.DataFrame({group_col: ct.index.to_numpy()})
        for v, c in zip(values, cols):
            out[c] = ct[v].to_numpy("int64")
        return out

    return ds.map_batches(partial, batch_format="pandas") \
        .groupby(group_col) \
        .aggregate(*[_Sum(c, alias_name=c) for c in cols])


def unpivot(ds: ray.data.Dataset, *, id_col: str, value_cols: list[str],
            var_name: str = "variable", value_name: str = "value",
            strip_prefix: str = "") -> ray.data.Dataset:
    """Melt wide columns back to (id, variable, value) long rows — each
    block melts independently (``pd.melt`` per batch), output is
    ``len(value_cols)×`` the input rows. ``strip_prefix`` removes a pivot
    prefix (e.g. ``cnt_``) from the variable labels."""
    def melt(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.melt(id_vars=[id_col], value_vars=value_cols,
                         var_name=var_name, value_name=value_name)
        if strip_prefix:
            out[var_name] = out[var_name].str.removeprefix(strip_prefix)
        return out

    return ds.map_batches(melt, batch_format="pandas")
