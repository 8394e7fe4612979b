"""Adapter for pandas-style group/batch UDFs that keeps Ray's block
schemas clean.

Returning pandas frames from map_groups/map_batches makes Ray convert
them to Arrow blocks carrying the pandas metadata blob — whose
dict-valued entries break Ray's block-schema hashing ("Failed to hash
the schemas (for deduplication)") — and empty frames become schema-less
blocks ("RefBundle with a different schema"). Wrapping the UDF with
arrow_groups() runs it under batch_format="pyarrow": the group arrives
as an Arrow table, the pandas result is converted back once with the
metadata stripped, and empties keep their full typed schema.
"""
from __future__ import annotations

import pandas as pd
import pyarrow as pa


def arrow_groups(fn):
    """Wrap a pandas-in / pandas-out UDF for map_groups/map_batches with
    batch_format="pyarrow"."""

    def g(t: pa.Table) -> pa.Table:
        out = fn(t.to_pandas())
        if isinstance(out, pa.Table):
            return out.replace_schema_metadata(None)
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    g.__name__ = getattr(fn, "__name__", "arrow_groups")
    return g


def from_pandas_clean(df: pd.DataFrame) -> pa.Table:
    """pandas -> Arrow with the metadata blob stripped."""
    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)


def canon_int_keys(t: pa.Table, keys) -> pd.DataFrame:
    """to_pandas with NULL-STABLE integer key columns: pandas widens
    int64-with-nulls to float64, so the same key value hashes/sorts as
    1.0 in a null-bearing block and 1 in a null-free one — silently
    splitting a group (or a dedup key) across hash partitions. Integer
    keys (per the ARROW schema) that pandas widened convert to the
    nullable Int64 dtype, which hashes and sorts identically to int64
    for the same values — null-free blocks skip the copy entirely."""
    df = t.to_pandas()
    for c in keys:
        j = t.schema.get_field_index(c)
        if j >= 0 and pa.types.is_integer(t.schema.field(j).type) \
                and not pd.api.types.is_integer_dtype(df[c].dtype):
            df[c] = df[c].astype("Int64")
    return df


def restore_types(df: pd.DataFrame, in_sch: pa.Schema, only=None) -> pa.Table:
    """pandas -> Arrow, casting output columns back to the input field
    types pandas widened (the inverse of canon_int_keys' to_pandas).
    only: restrict restoration to these columns (None = all shared
    names). Metadata stripped."""
    out = pa.Table.from_pandas(df, preserve_index=False)
    for i, name in enumerate(out.column_names):
        if only is not None and name not in only:
            continue
        j = in_sch.get_field_index(name)
        if j >= 0 and out.schema.field(i).type != in_sch.field(j).type:
            out = out.set_column(
                i, name, out.column(i).cast(in_sch.field(j).type))
    return out.replace_schema_metadata(None)


def cents_half_away(v, scale: float = 100.0):
    """Quantize value*scale to integer 'cents' with round-HALF-AWAY-
    from-zero — the rounding rule of SQL ROUND (DuckDB/ANSI). np.rint /
    np.round are half-to-even, which flips any product that is exactly
    representable at .5 (e.g. 0.125*100 = 12.5 -> 12 vs SQL's 13), so
    every engine-side cents gate must share THIS rule with its oracle.
    """
    import numpy as np

    a = np.asarray(v, dtype=np.float64) * scale
    return np.copysign(np.floor(np.abs(a) + 0.5), a).astype(np.int64)
