"""Apply a compiled schema to a DataFrame; split valid/quarantine; metrics.

The DataFrame analogue of `trafaret.check`: instead of raising a DataError
per bad value (trafaret/dataerror.py:4-63), every row carries an
``errors: array<struct<path,code,message>>`` column and "raise" becomes
"route rows where size(errors) > 0 to quarantine".
"""

from __future__ import annotations

from typing import Tuple as TupleT

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trafaret_spark.schema import Schema

__all__ = ["apply_schema", "split_valid", "validation_metrics", "is_valid_col"]


def apply_schema(df: DataFrame, schema: Schema, errors_col: str = "errors") -> DataFrame:
    """Run the vectorized validate+coerce stage: one wide Catalyst `select`
    (whole-stage codegen; zero Python in the hot path unless the schema
    contains `Call` guards)."""
    return schema.apply(df, errors_col=errors_col)


def is_valid_col(errors_col: str = "errors"):
    """Boolean validity mask — the engine's `is_valid`
    (trafaret/base.py:126-134)."""
    return F.size(F.col(errors_col)) == 0


def split_valid(validated: DataFrame, errors_col: str = "errors",
                keep_errors_on_valid: bool = False) -> TupleT[DataFrame, DataFrame]:
    """(valid, quarantine). Valid rows drop the errors column by default.

    Note: downstream of one shuffle both branches reuse the same scan; at
    scale prefer writing `validated` once (checkpoint) then filtering, which
    `pipeline.run` does.
    """
    valid = validated.filter(F.size(F.col(errors_col)) == 0)
    if not keep_errors_on_valid:
        valid = valid.drop(errors_col)
    quarantine = validated.filter(F.size(F.col(errors_col)) > 0)
    return valid, quarantine


def validation_metrics(validated: DataFrame, errors_col: str = "errors") -> DataFrame:
    """Per-(path, code) error counts + total/valid row counts, computed in one
    pass (exploded agg). Returns a small summary DataFrame:
    ``path, code, n_rows`` with a synthetic ('', '_total_') / ('', '_valid_')
    row pair for overall counts."""
    err = validated.select(F.explode_outer(errors_col).alias("e"))
    per_code = (err.filter(F.col("e").isNotNull())
                   .groupBy(F.col("e.path").alias("path"), F.col("e.code").alias("code"))
                   .agg(F.count(F.lit(1)).alias("n_rows")))
    totals = validated.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum((F.size(F.col(errors_col)) == 0).cast("long")).alias("valid"),
    ).select(F.expr(
        "stack(2, '', '_total_', total, '', '_valid_', valid) AS (path, code, n_rows)"))
    return per_code.unionByName(totals)
