"""Internal helper: collision-proof temporary column names.

Operators that add-then-drop helper columns (`withColumn` overwrites
silently) must not destroy a user column that happens to share the name —
pick a name verified absent from the frame instead of hoping a dunder
prefix is enough.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["temp_col"]


def temp_col(df: DataFrame, base: str) -> str:
    """``base`` if unused in ``df``, else the first ``base_<i>`` that is."""
    cols = set(df.columns)
    if base not in cols:
        return base
    i = 1
    while f"{base}_{i}" in cols:
        i += 1
    return f"{base}_{i}"
