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
