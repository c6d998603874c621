"""Apply a compiled schema to a DataFrame; split valid/quarantine; metrics.

The DataFrame analogue of `trafaret.check`: instead of raising a DataError
per bad value (trafaret/dataerror.py:4-63), every row carries an
``errors: array<struct<path,code,message>>`` column and "raise" becomes
"route rows where size(errors) > 0 to quarantine".
"""

from __future__ import annotations

import functools
import inspect
from typing import Tuple as TupleT

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from trafaret_spark.schema import Key, Schema

__all__ = ["apply_schema", "split_valid", "validation_metrics", "is_valid_col",
           "errors_json", "errors_as_map", "guard", "GuardError",
           "catch", "catch_error", "extract_error", "ignore"]


def apply_schema(df: DataFrame, schema: Schema, errors_col: str = "errors",
                 context=None) -> DataFrame:
    """Run the vectorized validate+coerce stage: one wide Catalyst `select`
    (whole-stage codegen; zero Python in the hot path unless the schema
    contains `Call` guards). ``context`` reaches Call fns declaring a
    ``context`` kwarg (trafaret's check-time context, base.py:1354-1357) as
    a plan-time constant."""
    return schema.apply(df, errors_col=errors_col, context=context)


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


def errors_json(errors_col: str = "errors") -> Column:
    """JSON serialization of the per-row errors array — the engine's
    ``DataError.to_struct()`` (trafaret/dataerror.py:41-53): a
    machine-readable {path, code, message} list per row."""
    return F.to_json(F.col(errors_col))


def errors_as_map(errors_col: str = "errors") -> Column:
    """map<path, struct<code,message>> view of the errors array — the
    engine's ``DataError.as_dict()`` (trafaret/dataerror.py:55-63)."""
    e = F.col(errors_col)
    return F.map_from_entries(F.transform(
        e, lambda x: F.struct(
            x["path"].alias("key"),
            F.struct(x["code"].alias("code"),
                     x["message"].alias("message")).alias("value"))))


class GuardError(ValueError):
    """Raised by ``guard``-protected functions on invalid kwargs
    (trafaret/base.py:1421-1427). ``errors`` maps arg name → (code, message)."""

    def __init__(self, errors: dict):
        self.errors = errors
        super().__init__(str(errors))


def ignore(val):
    """Stub to drop a value from a coercion chain (trafaret/base.py:1505-1513:
    ``Int >> ignore``). Engine usage:
    ``ts.ToInt() >> ts.Call(ts.ignore, return_type="string")`` — when handed
    an Arrow batch (pd.Series) it speaks Call's vectorized
    ``(values, errors)`` protocol, nulling every value with no errors;
    called with a plain value it returns None like the reference stub."""
    import pandas as pd
    if isinstance(val, pd.Series):
        none = pd.Series([None] * len(val))
        return none, none.copy()
    return None


def catch(checker, *a, **kw):
    """Call ``checker`` and return the GuardError instead of raising
    (trafaret/base.py:1516-1524 ``catch``). Works with ``Guard.check``,
    ``guard``-decorated functions, and anything else raising GuardError."""
    try:
        return checker(*a, **kw)
    except GuardError as error:
        return error


catch_error = catch  # reference alias (trafaret/base.py:1527)


def extract_error(checker, *a, **kw):
    """Like :func:`catch` but flatten a failure to {path: message}
    (trafaret/base.py:1530-1537 — the reference returns
    ``DataError.as_dict()``)."""
    res = catch(checker, *a, **kw)
    if isinstance(res, GuardError):
        return {p: m for p, (_c, m) in res.errors.items()}
    return res


def guard(schema: Schema = None, **kw_guards):
    """Decorator validating/coercing function kwargs through a Schema
    (trafaret/base.py:1430-1502) — the driver-side configuration-validation
    surface (job params, not the data plane). Evaluates the compiled Column
    expressions on a one-row local-relation DataFrame: no job is launched
    (Catalyst folds a single-row LocalRelation on the driver), and the guard
    semantics are byte-identical to the data-plane stage because it IS the
    data-plane stage.

    >>> @guard(path=ts.String(), n=ts.ToInt(gte=1))
    ... def run(path, n="8"): ...
    """
    if schema is not None and kw_guards:
        raise RuntimeError("choose one way of initialization, schema or kwargs")
    sch = schema or Schema(*[Key(n, g) for n, g in kw_guards.items()],
                           extras="allow")

    def wrapper(fn):
        sig = inspect.signature(fn)

        @functools.wraps(fn)
        def decor(*args, **kwargs):
            bound = sig.bind(*args, **kwargs)
            bound.apply_defaults()
            call_args = dict(bound.arguments)
            spark = SparkSession.getActiveSession()
            if spark is None:
                raise RuntimeError("guard() needs an active SparkSession")
            df = spark.createDataFrame([tuple(call_args.values())],
                                       list(call_args))
            row = apply_schema(df, sch).collect()[0]
            errs = {e["path"]: (e["code"], e["message"]) for e in row["errors"]}
            if errs:
                raise GuardError(errs)
            converted = {k: v for k, v in row.asDict().items() if k != "errors"}
            return fn(**converted)

        decor.__doc__ = (f"guarded with {sch!r}\n\n" + (fn.__doc__ or ""))
        return decor

    return wrapper
