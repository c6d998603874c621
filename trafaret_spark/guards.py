"""Vectorized guards: trafaret check()/coerce semantics compiled to Spark Columns.

Every guard compiles, at plan time, to a pair of Column expressions over an
input column:

    Compiled(value, error, dtype, ...)
      value : the checked (original) or coerced value — mirrors the reference's
              check_value vs check_and_return split (trafaret/base.py:104-124):
              plain guards return the input unchanged, ``To*`` guards return
              the converted value.
      error : NULL when the row passes, else struct<code:string,message:string>
              with codes from the reference vocabulary (trafaret/codes.py).
      dtype : the Spark output type of ``value``.

Composition mirrors the reference algebra (trafaret/base.py:284-339):
  * ``a & b`` / ``a >> b``  — sequential pipe, fail fast (And),
  * ``a | b``               — ordered alternatives, first success (Or).

Everything here is a native Column expression (whole-stage codegen; no Python
in the executor hot path). The one sanctioned escape hatch is ``Call``, which
wraps a *pandas* (Arrow-batched) function — mirroring trafaret's ``Call``
(trafaret/base.py:1331-1366) — and is never row-at-a-time.

ANSI neutrality: compiled expressions run in the CALLER's session, which on
Spark 4 defaults to ``spark.sql.ansi.enabled=true``. Every fallible runtime
operation therefore uses the exception-free form — ``try_cast`` instead of
``cast`` for narrowing/parsing casts, ``try_to_timestamp`` instead of
``to_timestamp``, ``F.get`` instead of positional array indexing — and
wrong-dtype branches emit typed NULL literals rather than casting the
column (some cross-family casts are *analysis-time* errors under ANSI).
Failures become NULLs, NULLs become error structs: identical semantics
whether the session runs ANSI on or off.

Intentional semantic delta (documented in SURVEY.md §7): a DataFrame column
has exactly one Spark type, so ``Or`` resolves its branches to a common output
type at plan time (e.g. ``ToInt | ToFloat`` produces double), whereas the
reference returns Python values of per-row-varying type.
"""

from __future__ import annotations

import contextvars
import dataclasses
import inspect
import re
from typing import Callable as PyCallable, Optional, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from trafaret_spark import codes

__all__ = [
    "Compiled", "Guard", "PlanTimeError",
    "Any", "Null", "Atom", "Enum", "Bool", "ToBool",
    "Int", "ToInt", "Float", "ToFloat", "ToDecimal",
    "String", "Bytes", "AnyString", "ToBytes", "FromBytes",
    "Date", "ToDate", "DateTime", "ToDateTime", "DateTimeAny",
    "Regexp", "RegexpString",
    "Email", "URL", "Hex", "URLSafe", "IPv4", "IPv6", "IP", "MongoId",
    "List", "Tuple", "Mapping",
    "And", "Or", "OnError", "WithRepr", "Call", "Callable",
    "Type", "Subclass",
    "ensure_guard", "err_struct", "ERROR_ENTRY_TYPE", "let",
]


class PlanTimeError(TypeError):
    """Schema/type mismatch detectable at plan time (before any data moves)."""


# error entry carried per (row, column-path) in the final errors array
ERROR_ENTRY_TYPE = T.StructType([
    T.StructField("path", T.StringType()),
    T.StructField("code", T.StringType()),
    T.StructField("message", T.StringType()),
])

_ERR_TYPE = "struct<code:string,message:string>"

# check-time context for Call guards (trafaret/base.py:1354-1357): set by
# Schema.apply(context=...) around compilation; Call captures the current
# value into its Arrow kernel closure at compile time.
CALL_CONTEXT: contextvars.ContextVar = contextvars.ContextVar(
    "trafaret_spark_call_context", default=None)


def err_struct(code: str, message) -> Column:
    """struct<code,message> literal/column for a failed check."""
    msg = message if isinstance(message, Column) else F.lit(message)
    return F.struct(F.lit(code).alias("code"), msg.alias("message"))


def _null_err() -> Column:
    return F.lit(None).cast(_ERR_TYPE)


def let(expr: Column, body: PyCallable[[Column], Column]) -> Column:
    """Single-evaluation binding — Spark SQL's missing LET.

    Wraps ``expr`` in a one-element array and binds it to a higher-order-
    function lambda variable; every reference inside ``body`` is a cheap
    NamedLambdaVariable lookup instead of a *textual copy* of the expression
    tree. Without this, nested container guards re-inline their child
    compile per reference — exponential in nesting depth (a depth-3
    recursive schema produced an 11 MB expression and a driver OOM).
    """
    return F.element_at(F.transform(F.array(expr), body), 1)


@dataclasses.dataclass
class Compiled:
    value: Column
    error: Column          # struct<code,message> or NULL
    dtype: T.DataType
    # struct<v,e> single-expression form; containers set this so parents can
    # consume (value, error) through ONE reference (see `let`)
    packed: Optional[Column] = None

    def as_packed(self) -> Column:
        if self.packed is not None:
            return self.packed
        return F.struct(self.value.alias("v"), self.error.alias("e"))


_NUMERIC_TYPES = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)
_INTEGRAL_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def _is_numeric(dt: T.DataType) -> bool:
    return isinstance(dt, _NUMERIC_TYPES)


# output-dtype probe memo: probing (compiling against a NULL literal just to
# learn the output type) is otherwise re-run per nesting level — exponential
# Python time for recursive schemas. Keyed by guard identity + input dtype +
# a generation counter that Forward.provide bumps (a provide can change any
# downstream output type). Guard refs are pinned so ids stay stable.
_PROBE_MEMO: dict = {}
_PROBE_GEN = [0]


def probe_dtype(guard: "Guard", dtype: T.DataType) -> T.DataType:
    key = (id(guard), dtype.simpleString(), _PROBE_GEN[0])
    if key not in _PROBE_MEMO:
        _PROBE_MEMO[key] = (
            guard.compile(F.lit(None).cast(dtype), dtype).dtype, guard)
    return _PROBE_MEMO[key][0]


class Guard:
    """Base guard. Subclasses implement compile(col, dtype) -> Compiled."""

    # True when a NULL input is a *valid* value for this guard (Null, Any,
    # ToBool, Or-with-Null-branch). Otherwise NULL means "missing" and the
    # Key layer turns it into code 'required' (trafaret/base.py:982).
    accepts_null = False

    # Column type used by check(None)'s one-row probe DataFrame, so a bare
    # NULL is validated through the guard's NATURAL compile branch (a NULL
    # boolean for Bool, a NULL timestamp for DateTime, ...), matching what a
    # NULL in a typed column of a real table would see. Guards whose string
    # and typed branches could emit different codes override this; wrappers
    # (And/OnError/WithRepr) delegate via _null_probe_dtype().
    null_probe_dtype: T.DataType = T.StringType()

    def _null_probe_dtype(self) -> T.DataType:
        return self.null_probe_dtype

    def compile(self, col: Column, dtype: T.DataType) -> Compiled:
        raise NotImplementedError

    # ---- composition algebra (reference trafaret/base.py:145-149) ----
    def __and__(self, other) -> "And":
        return And(self, ensure_guard(other))

    def __rshift__(self, other) -> "And":
        return And(self, ensure_guard(other))

    def __or__(self, other) -> "Or":
        o = ensure_guard(other)
        if isinstance(self, Or):
            return Or(*self.guards, o)
        return Or(self, o)

    def describe(self) -> str:
        return type(self).__name__

    def __repr__(self) -> str:
        return f"<{self.describe()}>"

    # ---- driver-side single-value convenience (trafaret/base.py:126-143:
    # check / is_valid). The data plane is apply_schema; this runs the SAME
    # compiled Column stage on a one-row LocalRelation (Catalyst folds it
    # driver-side, no job) so the semantics are identical by construction.
    def check(self, value, spark=None, context=None):
        """Validate+coerce one value; raise GuardError on failure.
        ``context`` flows to Call guards (trafaret/base.py:1354-1357).

        ``check(None)`` probes through the guard's ``null_probe_dtype``
        column (boolean for Bool, long for Int, timestamp for DateTime, …;
        string for untyped guards), so a bare NULL takes the same compile
        branch a NULL in a typed table column would."""
        from pyspark.sql import SparkSession
        from trafaret_spark.schema import Key, Schema
        from trafaret_spark.validate import GuardError, apply_schema
        spark = spark or SparkSession.getActiveSession()
        if spark is None:
            raise PlanTimeError("Guard.check() needs an active SparkSession")
        if value is None:
            probe = T.StructType(
                [T.StructField("x", self._null_probe_dtype(), True)])
            df = spark.createDataFrame([(None,)], probe)
        else:
            df = spark.createDataFrame([(value,)], ["x"])
        row = apply_schema(df, Schema(Key("x", self)),
                           context=context).collect()[0]
        errs = {e["path"]: (e["code"], e["message"]) for e in row["errors"]}
        if errs:
            raise GuardError(errs)
        return row["x"]

    def is_valid(self, value, spark=None) -> bool:
        from trafaret_spark.validate import GuardError
        try:
            self.check(value, spark=spark)
            return True
        except GuardError:
            return False


def ensure_guard(x) -> Guard:
    """Lift a Guard class or literal into a Guard (cf. ensure_trafaret,
    trafaret/base.py:185-202)."""
    if isinstance(x, Guard):
        return x
    if isinstance(x, type) and issubclass(x, Guard):
        return x()
    raise PlanTimeError(f"cannot lift {x!r} into a Guard")


# --------------------------------------------------------------------------
# trivial guards
# --------------------------------------------------------------------------

class Any(Guard):
    """Pass-through (trafaret/base.py:269-280)."""
    accepts_null = True

    def compile(self, col, dtype):
        return Compiled(col, _null_err(), dtype)


class Null(Guard):
    """Exactly NULL (trafaret/base.py:342-360)."""
    accepts_null = True

    def compile(self, col, dtype):
        e = F.when(col.isNotNull(), err_struct(codes.IS_NOT_NULL, "value should be None"))
        return Compiled(F.lit(None).cast(dtype), e, dtype)


def _literal_comparable(dtype: T.DataType, value) -> bool:
    """True when `col <cmp> lit(value)` is coercion-free — mixed-family
    comparisons are exactly where ANSI injects throwing casts (string col vs
    int literal casts the column), and the reference's Python `==`/`in`
    never coerces across families anyway."""
    if isinstance(value, bool):
        return isinstance(dtype, T.BooleanType)
    if isinstance(value, (int, float)):
        return _is_numeric(dtype)
    if isinstance(value, str):
        return isinstance(dtype, T.StringType)
    if isinstance(value, bytes):
        return isinstance(dtype, T.BinaryType)
    return False


class Atom(Guard):
    """Exact literal equality (trafaret/base.py:435-457). A type-family
    mismatch is decided at plan time (Python `==` across families is always
    False in the reference) — also keeps ANSI from injecting throwing casts
    into the comparison."""

    def __init__(self, value):
        self.value = value

    def compile(self, col, dtype):
        err = err_struct(codes.IS_NOT_EXACTLY,
                         f"value is not exactly '{self.value}'")
        if not _literal_comparable(dtype, self.value):
            return Compiled(col, err, dtype)
        e = F.when(col.isNull() | (col != F.lit(self.value)), err)
        return Compiled(col, e, dtype)


class Enum(Guard):
    """Membership in a closed set (trafaret/base.py:1277-1305). Variants
    from a different type family than the column are pruned at plan time
    (Python `in` never coerces; ANSI `IN` would throw on the cast)."""

    def __init__(self, *variants):
        self.variants = list(variants)

    def compile(self, col, dtype):
        err = err_struct(codes.DOES_NOT_MATCH_ANY,
                         f"value doesn't match any variant of {self.variants!r}")
        usable = [v for v in self.variants if _literal_comparable(dtype, v)]
        if not usable:
            return Compiled(col, err, dtype)
        e = F.when(col.isNull() | ~col.isin(usable), err)
        return Compiled(col, e, dtype)


# --------------------------------------------------------------------------
# booleans
# --------------------------------------------------------------------------

class Bool(Guard):
    """Strict boolean (trafaret/base.py:363-386)."""

    null_probe_dtype = T.BooleanType()

    def compile(self, col, dtype):
        if isinstance(dtype, T.BooleanType):
            e = F.when(col.isNull(), err_struct(codes.IS_NOT_BOOL, "value should be True or False"))
            return Compiled(col, e, dtype)
        # non-boolean column: every non-null row fails the type check; the
        # value is a typed NULL (never a cast — string→boolean throws under
        # ANSI, array→boolean fails analysis)
        e = err_struct(codes.IS_NOT_BOOL, "value should be True or False")
        return Compiled(F.lit(None).cast("boolean"), e, T.BooleanType())


class ToBool(Guard):
    """Lexical boolean coercion; truth tables from trafaret/base.py:417-418.

    Mirrors ``str(value).strip().lower()`` dispatch — note the reference maps
    None -> 'none' -> False, so NULL is *accepted* and coerces to False.
    """
    accepts_null = True
    TRUE_VALUES = ("t", "true", "y", "yes", "on", "1", "1.0")
    FALSE_VALUES = ("false", "n", "no", "off", "0", "none", "0.0")

    def compile(self, col, dtype):
        if isinstance(dtype, T.BooleanType):
            return Compiled(F.coalesce(col, F.lit(False)), _null_err(), dtype)
        s = F.lower(F.trim(col.cast("string")))
        value = (
            F.when(col.isNull(), F.lit(False))
            .when(s.isin(*self.TRUE_VALUES), F.lit(True))
            .when(s.isin(*self.FALSE_VALUES), F.lit(False))
        )
        e = F.when(
            col.isNotNull() & ~s.isin(*(self.TRUE_VALUES + self.FALSE_VALUES)),
            err_struct(codes.IS_NOT_CONVERTIBLE_TO_BOOL, "value can't be converted to Bool"),
        )
        return Compiled(value, e, T.BooleanType())


# --------------------------------------------------------------------------
# numbers
# --------------------------------------------------------------------------

class _NumberMixin:
    """gte/lte/gt/lt bounds shared by Int/Float families
    (reference trafaret/numeric.py:112-125)."""

    def __init__(self, gte=None, lte=None, gt=None, lt=None):
        self.gte, self.lte, self.gt, self.lt = gte, lte, gt, lt

    def _bounds_error(self, num: Column) -> Column:
        e = F.lit(None).cast(_ERR_TYPE)
        if self.gte is not None:
            e = F.coalesce(e, F.when(num < self.gte, err_struct(
                codes.TOO_SMALL, f"value is less than {self.gte}")))
        if self.gt is not None:
            e = F.coalesce(e, F.when(num <= self.gt, err_struct(
                codes.TOO_SMALL, f"value should be greater than {self.gt}")))
        if self.lte is not None:
            e = F.coalesce(e, F.when(num > self.lte, err_struct(
                codes.TOO_BIG, f"value is greater than {self.lte}")))
        if self.lt is not None:
            e = F.coalesce(e, F.when(num >= self.lt, err_struct(
                codes.TOO_BIG, f"value should be less than {self.lt}")))
        return e

    def _bounds_repr(self) -> str:
        parts = [f"{k}={v}" for k, v in
                 (("gte", self.gte), ("lte", self.lte), ("gt", self.gt), ("lt", self.lt))
                 if v is not None]
        return f"({', '.join(parts)})" if parts else ""


# a string that Python int() accepts (reference Int rejects '1.0':
# tests/test_numeric.py:62-66)
_INT_RE = r"^\s*[+-]?\d+\s*$"


class Int(_NumberMixin, Guard):
    """Integer check: int, int-valued float, or int-string; non-integral
    floats and '1.0'-style strings rejected (trafaret/numeric.py:163-181)."""

    null_probe_dtype = T.LongType()

    coerce = False  # Int validates; ToInt returns the converted value

    def compile(self, col, dtype):
        if isinstance(dtype, _INTEGRAL_TYPES):
            num = col.cast("long")
            type_err = _null_err()
        elif isinstance(dtype, (T.FloatType, T.DoubleType, T.DecimalType)):
            # try_cast: a float outside long range nulls instead of the
            # ANSI overflow throw; the floor check flags non-integral, and
            # the null-probe flags integral values beyond int64 — mirroring
            # the string branch, where unbounded Python int succeeds but the
            # engine's long cannot (surfaced as an error, not a null-pass)
            num = col.try_cast("long")
            # NaN/±inf are "not an integer" (reference float-integrality
            # code, trafaret/numeric.py:177-181), NOT an int64-overflow;
            # the overflow probe comes before the floor check because
            # floor(double) returns long, so beyond int64 the floor
            # comparison itself is meaningless
            if isinstance(dtype, T.DecimalType):
                non_finite = F.lit(False)  # decimals have no NaN/inf
            else:
                non_finite = F.isnan(col) | (F.abs(col) == float("inf"))
            type_err = F.when(
                col.isNotNull() & non_finite,
                err_struct(codes.IS_NOT_INT, "value is not int"),
            ).when(
                col.isNotNull() & num.isNull(),
                err_struct(codes.IS_NOT_A_NUMBER, "value does not fit in int64"),
            ).when(
                col.isNotNull() & (col != F.floor(col)),
                err_struct(codes.IS_NOT_INT, "value is not int"),
            )
        elif isinstance(dtype, T.StringType):
            # int('1.0') raises ValueError → IS_NOT_A_NUMBER
            # (trafaret/numeric.py:103-110; tests/test_numeric.py:62-66)
            num = F.trim(col).try_cast("long")
            type_err = F.when(
                col.isNotNull() & ~col.rlike(_INT_RE),
                err_struct(codes.IS_NOT_A_NUMBER, "value can't be converted to int"),
            ).when(
                # digits but beyond int64: Python int is unbounded, the
                # engine's long is not — surfaced as an error, not a
                # null-pass. The O(1) octet_length pre-gate matters: only a
                # ≥19-digit string can overflow, and without the gate the
                # num.isNull() probe re-evaluates the trim+parse for EVERY
                # digit-string row (measured ~2.5 s per 154M rows)
                col.isNotNull() & (F.octet_length(col) >= 19) & num.isNull(),
                err_struct(codes.IS_NOT_A_NUMBER, "value does not fit in int64"),
            )
        elif isinstance(dtype, T.BooleanType):
            # bool is an int subtype in Python; the reference accepts it
            num = col.cast("long")
            type_err = _null_err()
        else:
            return Compiled(F.lit(None).cast("long"),
                            err_struct(codes.WRONG_TYPE, "value is not int"),
                            T.LongType())
        e = F.coalesce(type_err, self._bounds_error(num))
        if self.coerce:
            return Compiled(F.when(e.isNull(), num), e, T.LongType())
        return Compiled(col, e, dtype)

    def describe(self):
        return ("ToInt" if self.coerce else "Int") + self._bounds_repr()


class ToInt(Int):
    """Coercing Int (trafaret/numeric.py:184-186)."""
    coerce = True


class Float(_NumberMixin, Guard):
    """Real number or numeric string, with bounds
    (trafaret/numeric.py:55-152)."""

    null_probe_dtype = T.DoubleType()
    coerce = False

    def compile(self, col, dtype):
        if _is_numeric(dtype) or isinstance(dtype, T.BooleanType):
            num = col.cast("double")
            type_err = _null_err()
        elif isinstance(dtype, T.StringType):
            # try_cast: 'abc' nulls (→ error path) instead of the ANSI throw
            num = F.trim(col).try_cast("double")
            type_err = F.when(
                col.isNotNull() & num.isNull(),
                err_struct(codes.IS_NOT_A_NUMBER, "value can't be converted to float"),
            )
        else:
            return Compiled(F.lit(None).cast("double"),
                            err_struct(codes.WRONG_TYPE, "value is not float"),
                            T.DoubleType())
        e = F.coalesce(type_err, self._bounds_error(num))
        if self.coerce:
            return Compiled(F.when(e.isNull(), num), e, T.DoubleType())
        return Compiled(col, e, dtype)

    def describe(self):
        return ("ToFloat" if self.coerce else "Float") + self._bounds_repr()


class ToFloat(Float):
    """Coercing Float (trafaret/numeric.py:155-160)."""
    coerce = True


class ToDecimal(_NumberMixin, Guard):
    """Decimal coercion (trafaret/numeric.py:189-203)."""

    PRECISION, SCALE = 38, 18

    def compile(self, col, dtype):
        out = T.DecimalType(self.PRECISION, self.SCALE)
        if isinstance(dtype, T.StringType):
            num = F.trim(col).try_cast(out.simpleString())
        elif _is_numeric(dtype) or isinstance(dtype, T.BooleanType):
            # try_cast: precision overflow nulls (→ error) instead of the
            # ANSI NUMERIC_VALUE_OUT_OF_RANGE throw
            num = col.try_cast(out.simpleString())
        else:
            return Compiled(F.lit(None).cast(out),
                            err_struct(codes.INVALID_DECIMAL,
                                       "value can't be converted to Decimal"),
                            out)
        type_err = F.when(
            col.isNotNull() & num.isNull(),
            err_struct(codes.INVALID_DECIMAL, "value can't be converted to Decimal"),
        )
        e = F.coalesce(type_err, self._bounds_error(num.cast("double")))
        return Compiled(F.when(e.isNull(), num), e, out)


# --------------------------------------------------------------------------
# strings & bytes
# --------------------------------------------------------------------------

class String(Guard):
    """str with blank/length policy (trafaret/base.py:460-527)."""

    def __init__(self, allow_blank: bool = False,
                 min_length: Optional[int] = None,
                 max_length: Optional[int] = None):
        self.allow_blank = allow_blank
        self.min_length = min_length
        self.max_length = max_length

    def compile(self, col, dtype):
        if not isinstance(dtype, T.StringType):
            return Compiled(col.cast("string"),
                            err_struct(codes.IS_NOT_A_STRING, "value is not a string"),
                            T.StringType())
        e = _null_err()
        if not self.allow_blank:
            e = F.coalesce(e, F.when(
                col == "", err_struct(codes.EMPTY_STRING, "blank value is not allowed")))
        if self.min_length is not None:
            e = F.coalesce(e, F.when(
                F.length(col) < self.min_length,
                err_struct(codes.SHORT_STRING, f"String is shorter than {self.min_length} characters")))
        if self.max_length is not None:
            e = F.coalesce(e, F.when(
                F.length(col) > self.max_length,
                err_struct(codes.LONG_STRING, f"String is longer than {self.max_length} characters")))
        return Compiled(col, e, dtype)


class Bytes(String):
    """bytes with the String blank/length policy (trafaret/base.py:680-684:
    ``Bytes(String)`` with ``str_type = (bytes,)``)."""

    null_probe_dtype = T.BinaryType()

    def compile(self, col, dtype):
        if not isinstance(dtype, T.BinaryType):
            return Compiled(col, err_struct(
                codes.IS_NOT_A_BYTES_STRING, "value is not a bytes string"), dtype)
        e = _null_err()
        if not self.allow_blank:
            e = F.coalesce(e, F.when(
                F.length(col) == 0,
                err_struct(codes.EMPTY_STRING, "blank value is not allowed")))
        if self.min_length is not None:
            e = F.coalesce(e, F.when(
                F.length(col) < self.min_length,
                err_struct(codes.SHORT_STRING,
                           f"String is shorter than {self.min_length} characters")))
        if self.max_length is not None:
            e = F.coalesce(e, F.when(
                F.length(col) > self.max_length,
                err_struct(codes.LONG_STRING,
                           f"String is longer than {self.max_length} characters")))
        return Compiled(col, e, dtype)


class AnyString(String):
    """str OR bytes with the String policy (trafaret/base.py:715-716:
    ``str_type = (bytes, str)``). Dispatches on the column dtype at plan
    time — the one place the reference's per-value isinstance union becomes
    a static branch."""

    def compile(self, col, dtype):
        if isinstance(dtype, T.BinaryType):
            return Bytes(self.allow_blank, self.min_length,
                         self.max_length).compile(col, dtype)
        if isinstance(dtype, T.StringType):
            return super().compile(col, dtype)
        return Compiled(col, err_struct(
            codes.IS_NOT_A_STRING, "value is not a string"), dtype)


# charsets whose encodability is decidable with a cheap columnar predicate.
# The predicate gates F.encode so the unmappable rows surface as
# cannot_be_encoded errors instead of Spark 4's MALFORMED_CHARACTER_CODING
# throw (trafaret raises with that code: trafaret/base.py:704-709).
_ENCODABLE_PRED = {
    "us-ascii": lambda c: c.rlike(r"^[\x00-\x7F]*$"),
    "ascii": lambda c: c.rlike(r"^[\x00-\x7F]*$"),
    "iso-8859-1": lambda c: c.rlike(r"^[\x00-\x{FF}]*$"),
    "latin-1": lambda c: c.rlike(r"^[\x00-\x{FF}]*$"),
    "latin1": lambda c: c.rlike(r"^[\x00-\x{FF}]*$"),
    # every Spark string is valid unicode → always UTF-encodable
    "utf-8": lambda c: F.lit(True),
    "utf8": lambda c: F.lit(True),
    "utf-16": lambda c: F.lit(True),
    "utf-16be": lambda c: F.lit(True),
    "utf-16le": lambda c: F.lit(True),
}

_CHARSET_ALIAS = {"ascii": "US-ASCII", "us-ascii": "US-ASCII",
                  "latin-1": "ISO-8859-1", "latin1": "ISO-8859-1",
                  "iso-8859-1": "ISO-8859-1",
                  "utf8": "UTF-8", "utf-8": "UTF-8"}


class ToBytes(Guard):
    """Encode str -> bytes with codec-failure parity (trafaret/base.py:687-712:
    an unencodable value raises code ``cannot_be_encoded``).

    The encodability test runs as a columnar charset predicate BEFORE
    F.encode (lazily, inside a when-branch) — Spark 4's encode throws
    MALFORMED_CHARACTER_CODING on unmappable input in any ANSI mode, so the
    gate is correctness, not just parity. Charsets without a cheap predicate
    (exotic codecs) encode ungated — documented narrowing."""

    def __init__(self, encoding: str = "utf-8"):
        self.encoding = encoding
        self._pred = _ENCODABLE_PRED.get(encoding.lower())
        self._charset = _CHARSET_ALIAS.get(encoding.lower(), encoding)

    def compile(self, col, dtype):
        if isinstance(dtype, T.BinaryType):
            return Compiled(col, _null_err(), dtype)
        if not isinstance(dtype, T.StringType):
            return Compiled(F.lit(None).cast("binary"),
                            err_struct(codes.IS_NOT_A_STRING, "value is not a string"),
                            T.BinaryType())
        if self._pred is None:
            return Compiled(F.encode(col, self._charset), _null_err(),
                            T.BinaryType())
        ok = self._pred(col)
        e = F.when(col.isNotNull() & ~ok, err_struct(
            codes.CANNOT_BE_ENCODED, "value cannot be encoded"))
        value = F.when(col.isNotNull() & ok, F.encode(col, self._charset))
        return Compiled(value, e, T.BinaryType())


class FromBytes(Guard):
    """Decode bytes -> str with codec-failure parity (trafaret/base.py:719-743:
    undecodable bytes raise code ``cannot_be_decoded``).

    Decodability gates per charset: UTF-8 via the native ``is_valid_utf8``,
    US-ASCII via the Latin-1-total-decode + 7-bit regex trick, ISO-8859-1 is
    total. Gating is mandatory on Spark 4 (decode throws on malformed input
    in any ANSI mode)."""

    null_probe_dtype = T.BinaryType()

    def __init__(self, encoding: str = "utf-8"):
        self.encoding = encoding
        self._charset = _CHARSET_ALIAS.get(encoding.lower(), encoding)

    def _decodable(self, col: Column):
        cs = self._charset
        if cs == "UTF-8":
            return F.is_valid_utf8(col)
        if cs == "ISO-8859-1":
            return F.lit(True)  # Latin-1 decodes every byte sequence
        if cs == "US-ASCII":
            # all bytes < 0x80 ⟺ the (total) Latin-1 decode is 7-bit clean
            return F.decode(col, "ISO-8859-1").rlike(r"^[\x00-\x7F]*$")
        return None

    def compile(self, col, dtype):
        if not isinstance(dtype, T.BinaryType):
            return Compiled(F.lit(None).cast("string"),
                            err_struct(codes.IS_NOT_BYTES, "value is not a bytes string"),
                            T.StringType())
        ok = self._decodable(col)
        if ok is None:
            return Compiled(F.decode(col, self._charset), _null_err(),
                            T.StringType())
        e = F.when(col.isNotNull() & ~ok, err_struct(
            codes.CANNOT_BE_DECODED, "value cannot be decoded"))
        value = F.when(col.isNotNull() & ok, F.decode(col, self._charset))
        return Compiled(value, e, T.StringType())


# --------------------------------------------------------------------------
# dates & datetimes
# --------------------------------------------------------------------------

# variable-width tokens (M, not MM): strptime %m accepts both '3' and '03'
_STRPTIME_TO_SPARK = {
    "%Y": "y", "%y": "yy", "%m": "M", "%d": "d",
    "%H": "H", "%M": "m", "%S": "s", "%f": "SSSSSS",
    "%j": "D", "%p": "a", "%I": "h", "%z": "XX", "%%": "%",
}


def strptime_to_spark(fmt: str) -> str:
    """Translate a Python strptime format into a Spark datetime pattern."""
    out, i = [], 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            tok = fmt[i:i + 2]
            if tok not in _STRPTIME_TO_SPARK:
                raise PlanTimeError(f"unsupported strptime directive {tok!r}")
            out.append(_STRPTIME_TO_SPARK[tok])
            i += 2
        else:
            c = fmt[i]
            # quote pattern-letter literals for Spark's parser
            out.append(f"'{c}'" if c.isalpha() else c)
            i += 1
    return "".join(out)


class DateTime(Guard):
    """strptime-validated datetime (trafaret/base.py:610-662). Accepts native
    timestamp columns like the reference accepts datetime instances."""

    null_probe_dtype = T.TimestampType()
    coerce = False
    default_format = "%Y-%m-%d %H:%M:%S"
    _cast_to = "timestamp"
    _fail_code = codes.DOES_NOT_MATCH_FORMAT

    def __init__(self, format: Optional[str] = None):
        self.format = format or self.default_format
        self.spark_format = strptime_to_spark(self.format)

    def _parse(self, col: Column) -> Column:
        # try_to_timestamp: unparseable strings null into the error path
        # instead of ANSI's CANNOT_PARSE_TIMESTAMP throw
        return F.try_to_timestamp(col, F.lit(self.spark_format))

    def compile(self, col, dtype):
        out = T.TimestampType() if self._cast_to == "timestamp" else T.DateType()
        if isinstance(dtype, (T.TimestampType, T.DateType)):
            return Compiled(col.cast(self._cast_to) if self.coerce else col,
                            _null_err(),
                            out if self.coerce else dtype)
        if not isinstance(dtype, T.StringType):
            return Compiled(F.lit(None).cast(out),
                            err_struct(self._fail_code,
                                       f"value does not match format {self.format}"),
                            out)
        parsed = self._parse(col).cast(self._cast_to)
        e = F.when(
            col.isNotNull() & parsed.isNull(),
            err_struct(self._fail_code, f"value does not match format {self.format}"),
        )
        value = parsed if self.coerce else col
        return Compiled(value, e, out if self.coerce else dtype)


class ToDateTime(DateTime):
    """Coercing DateTime (trafaret/base.py:665-677)."""
    coerce = True


class Date(DateTime):
    """strptime-validated date (trafaret/base.py:530-588)."""

    null_probe_dtype = T.DateType()
    default_format = "%Y-%m-%d"
    _cast_to = "date"


class ToDate(Date):
    """Coercing Date (trafaret/base.py:591-607)."""
    coerce = True


class DateTimeAny(Guard):
    """Permissive multi-format datetime, the engine analogue of the contrib
    RFC-3339 DateTime (trafaret/contrib/rfc_3339.py:8-27, dateutil-based).

    Implemented as a coalesce cascade of to_timestamp formats — stays in
    whole-stage codegen instead of dropping to an Arrow UDF.
    """
    coerce = True
    FORMATS = (
        "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
        "yyyy-MM-dd'T'HH:mm:ssXXX",
        "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
        "yyyy-MM-dd'T'HH:mm:ss",
        "yyyy-MM-dd HH:mm:ss.SSSSSS",
        "yyyy-MM-dd HH:mm:ss",
        "yyyy-MM-dd HH:mm",
        "yyyy-MM-dd",
        "yyyy/MM/dd HH:mm:ss",
        "yyyy/MM/dd",
        "dd.MM.yyyy HH:mm:ss",
        "dd.MM.yyyy",
    )

    def compile(self, col, dtype):
        out = T.TimestampType()
        if isinstance(dtype, (T.TimestampType, T.DateType)):
            return Compiled(col.cast("timestamp"), _null_err(), out)
        if not isinstance(dtype, T.StringType):
            return Compiled(F.lit(None).cast(out),
                            err_struct(codes.NOT_DATETIME, "value is not datetime"), out)
        c = F.trim(col)
        # fast path: the native string→timestamp try_cast is a single
        # hand-written exception-free parser covering every ISO-8601-ish
        # shape ('T' or space, optional fraction, optional zone offset,
        # date-only). A to_timestamp(fmt) try-cascade costs a thrown-caught
        # exception per failed format per row — measured 2.7× slower on the
        # validation stage. The cast is pre-gated so partial dates like
        # '2020' / '2020-5' are rejected (dateutil resolves those against
        # *today* — non-deterministic by design). Gate cost discipline,
        # measured on 154M rows: a regex matcher costs ~2s, and even
        # F.length costs ~1.5s (it COUNTS CODEPOINTS — an O(bytes) scan per
        # call); octet_length is O(1) and instr stops at the first dash, so
        # this form prices at zero next to the cast itself. A year-month-day
        # prefix means ≥ 8 bytes with the first '-' at byte 5 — shorter /
        # other shapes are partial or non-ISO, and malformed survivors null
        # out in the try_cast anyway. Non-ISO shapes are gated behind cheap
        # charset probes so their formatter only runs on rows the cast
        # missed.
        parsed = F.coalesce(
            F.when((F.octet_length(c) >= 8) & (F.instr(c, "-") == 5),
                   c.try_cast("timestamp")),
            F.when(c.contains("/"),
                   F.coalesce(F.try_to_timestamp(c, F.lit("yyyy/MM/dd HH:mm:ss")),
                              F.try_to_timestamp(c, F.lit("yyyy/MM/dd")))),
            F.when(c.rlike(r"^\d{2}\.\d{2}\.\d{4}"),
                   F.coalesce(F.try_to_timestamp(c, F.lit("dd.MM.yyyy HH:mm:ss")),
                              F.try_to_timestamp(c, F.lit("dd.MM.yyyy")))),
        )
        e = F.when(col.isNotNull() & parsed.isNull(),
                   err_struct(codes.NOT_DATETIME, "value is not datetime"))
        return Compiled(parsed, e, out)


# --------------------------------------------------------------------------
# regex-domain strings (trafaret/regexp.py, trafaret/internet.py)
# --------------------------------------------------------------------------

class Regexp(Guard):
    """re.match semantics: anchored at start, value = matched group()
    (trafaret/regexp.py:29-31).

    ``return_match=True`` is the engine analogue of the reference's
    RegexpRaw (trafaret/regexp.py:7-26), which returns the Match object:
    a Match can't cross the JVM boundary, so the value becomes its struct
    projection ``struct<match:string, groups:array<string>>`` (group count
    fixed at plan time from the compiled pattern). Delta vs Python: a
    non-participating optional group is ``''`` (Spark regexp_extract), not
    None.
    """

    def __init__(self, pattern: str, return_match: bool = False):
        self.pattern = pattern
        self.return_match = return_match
        self._n_groups = re.compile(pattern).groups  # plan-time check too
        self._anchored = f"^(?:{pattern})"

    def compile(self, col, dtype):
        if not isinstance(dtype, T.StringType):
            return Compiled(col.cast("string"),
                            err_struct(codes.IS_NOT_A_STRING, "value is not a string"),
                            T.StringType())
        matched = col.rlike(self._anchored)
        e = F.when(col.isNull() | ~matched,
                   err_struct(codes.DOES_NOT_MATCH_RE, "does not match pattern"))
        if self.return_match:
            if self._n_groups:
                groups = F.array(*[F.regexp_extract(col, self._anchored, i + 1)
                                   for i in range(self._n_groups)])
            else:
                groups = F.array().cast("array<string>")
            value = F.when(matched, F.struct(
                F.regexp_extract(col, self._anchored, 0).alias("match"),
                groups.alias("groups")))
            out = T.StructType([
                T.StructField("match", T.StringType()),
                T.StructField("groups", T.ArrayType(T.StringType())),
            ])
            return Compiled(value, e, out)
        value = F.when(matched, F.regexp_extract(col, self._anchored, 0))
        return Compiled(value, e, dtype)


class RegexpRaw(Regexp):
    """Return the full match struct instead of group() — the reference's
    RegexpRaw (trafaret/regexp.py:7-26); see Regexp(return_match=True)."""

    def __init__(self, pattern: str):
        super().__init__(pattern, return_match=True)


class RegexpString(String):
    """String options + class-level regex + optional upper/lower
    normalization (trafaret/regexp.py:34-50)."""

    regex: str = ".*"
    str_method: Optional[str] = None  # 'upper' | 'lower'
    fail_code = codes.DOES_NOT_MATCH_RE
    fail_message = "does not match pattern"

    def _match(self, v: Column) -> Column:
        """Anchored match predicate; subclasses may prepend a cheap gate
        (codegen && short-circuits, so rows failing the gate never run
        the full regex — see IPv6)."""
        return v.rlike(f"^(?:{self.regex})$")

    def compile(self, col, dtype):
        base = super().compile(col, dtype)
        if not isinstance(dtype, T.StringType):
            return base
        v = base.value
        if self.str_method == "upper":
            v = F.upper(v)
        elif self.str_method == "lower":
            v = F.lower(v)
        e = F.coalesce(base.error, F.when(
            ~self._match(v),
            err_struct(self.fail_code, self.fail_message)))
        return Compiled(v, e, dtype)


# regex domains equivalent to the reference's (trafaret/internet.py:18-131);
# re-expressed for Java regex (rlike), same accepted language.
_EMAIL_RE = (
    r"(?i)[-!#$%&'*+/=?^_`{}|~0-9A-Z]+(\.[-!#$%&'*+/=?^_`{}|~0-9A-Z]+)*"
    r'|"([\x01-\x08\x0b\x0c\x0e-\x1f!#-\[\]-\x7f]|\\[\x01-\x09\x0b\x0c\x0e-\x7f])*"'
    r")@(?:[A-Z0-9](?:[A-Z0-9-]{0,61}[A-Z0-9])?\.)+[A-Z]{2,63}"
)
# simplified head|quoted form needs a wrapping group. Domain tail carries
# the reference's BOTH alternatives (internet.py:24) — the `[A-Z0-9-]{2,}`
# branch is what lets IDNA-encoded (xn--…) TLDs match:
_EMAIL_RE = (
    r"(?i)(?:[-!#$%&'*+/=?^_`{}|~0-9A-Z]+(?:\.[-!#$%&'*+/=?^_`{}|~0-9A-Z]+)*"
    r"|\"(?:[\x01-\x08\x0b\x0c\x0e-\x1f!#-\[\]-\x7f]|\\[\x01-\x09\x0b\x0c\x0e-\x7f])*\")"
    r"@(?:[A-Z0-9](?:[A-Z0-9-]{0,61}[A-Z0-9])?\.)+(?:[A-Z]{2,6}\.?|[A-Z0-9-]{2,}\.?)"
)
# NOT replicated from the reference email regex: the bare `[1.2.3.4]`
# SMTP-literal alternative (internet.py:26) — its anchoring accepts a
# plain bracketed IP with no local part as a "valid email" (documented
# delta; a name@[ip] form fails in the reference too).

_URL_RE = (
    r"(?i)(?:http|ftp)s?://"
    r"(?:\S+(?::\S*)?@)?"
    r"(?:(?:[A-Z0-9](?:[A-Z0-9-_]{0,61}[A-Z0-9])?\.)+(?:[A-Z]{2,6}\.?|[A-Z0-9-]{2,}\.?)"
    r"|localhost"
    r"|\d{1,3}(?:\.\d{1,3}){3})"
    r"(?::\d+)?"
    r"(?:/?|[/?]\S+)"
)


def _email_idna_kernel(s):
    """Arrow batch: IDNA-encode each candidate's domain (the part after
    the LAST '@', reference internet.py:31-36); un-encodable → None."""
    def enc(v):
        if v is None or "@" not in v:
            return None
        parts = v.split("@")
        try:
            parts[-1] = parts[-1].encode("idna").decode("ascii")
        except (UnicodeError, ValueError):
            return None
        return "@".join(parts)
    return s.map(enc)


def _url_idna_kernel(s):
    """Arrow batch: IDNA-encode each candidate URL's netloc (reference
    internet.py:80-83); un-splittable/un-encodable → None."""
    import urllib.parse as _up

    def enc(v):
        if v is None:
            return None
        try:
            scheme, netloc, path, query, fragment = _up.urlsplit(v)
            netloc = netloc.encode("idna").decode("ascii")
            return _up.urlunsplit((scheme, netloc, path, query, fragment))
        except (UnicodeError, ValueError):
            return None
    return s.map(enc)


def _compile_with_idna(guard, col, dtype, kernel):
    """Shared Email/URL idna=True compile: ASCII fast path untouched (one
    scan-side regex), and ONLY rows that (a) fail the plain regex and
    (b) contain non-ASCII are handed to the Arrow kernel (they arrive as
    the sole non-null inputs), mirroring the reference's
    `plain | (idna_encode & plain)` Or (internet.py:43,86-90). A row the
    kernel rescues coerces to its IDNA-encoded (ACE) form — the same
    output the reference's And chain produces."""
    policy = String.compile(guard, col, dtype)  # blank/length policy only
    v = policy.value
    anchored = f"^(?:{guard.regex})$"
    matches = v.rlike(anchored)
    needs = v.isNotNull() & ~matches & v.rlike(r"[^\x00-\x7F]")
    cand = F.pandas_udf(kernel, T.StringType())(F.when(needs, v))
    cand_ok = F.coalesce(cand.rlike(anchored), F.lit(False))
    value = F.when(F.coalesce(matches, F.lit(True)) | ~cand_ok, v) \
        .otherwise(cand)
    e = F.coalesce(policy.error, F.when(
        v.isNotNull() & ~matches & ~cand_ok,
        err_struct(guard.fail_code, guard.fail_message)))
    return Compiled(value, e, dtype)

_IPV4_RE = r"(?:(?:25[0-5]|2[0-4]\d|[01]?\d?\d)\.){3}(?:25[0-5]|2[0-4]\d|[01]?\d?\d)"
_HEX_SEG = r"[0-9A-Fa-f]{1,4}"
_IPV6_RE = (
    rf"(?:{_HEX_SEG}:){{7}}{_HEX_SEG}"
    rf"|(?:{_HEX_SEG}:){{1,7}}:"
    rf"|(?:{_HEX_SEG}:){{1,6}}:{_HEX_SEG}"
    rf"|(?:{_HEX_SEG}:){{1,5}}(?::{_HEX_SEG}){{1,2}}"
    rf"|(?:{_HEX_SEG}:){{1,4}}(?::{_HEX_SEG}){{1,3}}"
    rf"|(?:{_HEX_SEG}:){{1,3}}(?::{_HEX_SEG}){{1,4}}"
    rf"|(?:{_HEX_SEG}:){{1,2}}(?::{_HEX_SEG}){{1,5}}"
    rf"|{_HEX_SEG}:(?::{_HEX_SEG}){{1,6}}"
    rf"|:(?:(?::{_HEX_SEG}){{1,7}}|:)"
    rf"|::(?:ffff(?::0{{1,4}})?:)?{_IPV4_RE}"
    rf"|(?:{_HEX_SEG}:){{1,4}}:{_IPV4_RE}"
)


class Email(RegexpString):
    """RFC-ish email with length cap (trafaret/internet.py:42-49).

    ``idna=True`` adds the reference's unicode-domain fallback
    (internet.py:31-36,43): a value failing the plain regex with a
    non-ASCII domain is IDNA-encoded (Arrow batch, scan-side) and
    re-checked; on success it coerces to the ASCII (xn--…) form. Off by
    default — the opt-in adds an ArrowEvalPython stage to the plan, and
    the default path stays pure codegen."""
    regex = _EMAIL_RE
    fail_code = codes.IS_NOT_VALID_EMAIL
    fail_message = "value is not a valid email address"

    def __init__(self, allow_blank: bool = False, idna: bool = False):
        super().__init__(allow_blank=allow_blank, max_length=254)
        self.idna = idna

    def compile(self, col, dtype):
        if self.idna and isinstance(dtype, T.StringType):
            return _compile_with_idna(self, col, dtype, _email_idna_kernel)
        return super().compile(col, dtype)


class URL(RegexpString):
    """http/ftp(s) URL (trafaret/internet.py:69-91).

    ``idna=True`` mirrors the reference's decode_url_idna fallback
    (internet.py:80-90): non-ASCII-netloc candidates are IDNA-encoded in
    an Arrow batch and re-checked, coercing to the ACE form on success.
    Same plan trade-off as :class:`Email`."""
    regex = _URL_RE
    fail_code = codes.IS_NOT_VALID_URL
    fail_message = "value is not URL"

    def __init__(self, allow_blank: bool = False, idna: bool = False):
        super().__init__(allow_blank=allow_blank)
        self.idna = idna

    def compile(self, col, dtype):
        if self.idna and isinstance(dtype, T.StringType):
            return _compile_with_idna(self, col, dtype, _url_idna_kernel)
        return super().compile(col, dtype)


class Hex(RegexpString):
    """Lowercased hex string (trafaret/internet.py:52-57)."""
    regex = r"[0-9a-f]+"
    str_method = "lower"


class URLSafe(RegexpString):
    """URL-safe charset (trafaret/internet.py:60-64)."""
    regex = r"[a-zA-Z0-9._~-]+"


class IPv4(RegexpString):
    regex = _IPV4_RE
    fail_code = codes.IS_NOT_IPv4
    fail_message = "value is not IPv4 address"


class IPv6(RegexpString):
    regex = _IPV6_RE
    fail_code = codes.IS_NOT_IPv6
    fail_message = "value is not IPv6 address"

    def _match(self, v):
        # every IPv6 form contains ':' — the contains() gate short-circuits
        # the 11-branch alternation for the common mismatch (an IPv4 or
        # arbitrary string probing Or(IPv4, IPv6)): ~2.5× on the reject
        # path at 2M rows/8 cores
        return v.contains(":") & super()._match(v)


def IP() -> "Or":
    """IPv4 | IPv6 (trafaret/internet.py:130-131)."""
    return OnError(Or(IPv4(), IPv6()), "value is not IP address", code=codes.IS_NOT_IP)


# --------------------------------------------------------------------------
# containers
# --------------------------------------------------------------------------

class List(Guard):
    """Homogeneous array with length bounds and per-element validation
    (trafaret/base.py:788-884). Element errors are rolled up into one
    SOME_ELEMENTS_DID_NOT_MATCH entry whose message carries `idx: code`
    pairs (the reference nests a DataError per index)."""

    def __init__(self, elem, min_length: int = 0, max_length: Optional[int] = None):
        self.elem = ensure_guard(elem)
        self.min_length = min_length
        self.max_length = max_length

    def compile(self, col, dtype):
        if not isinstance(dtype, T.ArrayType):
            return Compiled(col, err_struct(codes.IS_NOT_A_LIST, "value is not a list"), dtype)
        elem_dt = dtype.elementType
        out_elem_dt = probe_dtype(self.elem, elem_dt)

        # the element compiles ONCE (as_packed), and every downstream
        # reference goes through `let` lambda variables — see `let`
        inner = F.transform(col, lambda x: self.elem.compile(x, elem_dt).as_packed())

        def build(P: Column) -> Column:
            values = F.transform(P, lambda p: p["v"])
            elem_errs = F.zip_with(
                P,
                F.sequence(F.lit(0), F.greatest(F.size(P) - 1, F.lit(0))),
                lambda p, i: F.when(p["e"].isNotNull(),
                                    F.concat(i.cast("string"), F.lit(": "),
                                             p["e"]["code"])),
            )
            bad = F.array_compact(elem_errs)
            e = _null_err()
            if self.min_length:
                e = F.coalesce(e, F.when(
                    F.size(P) < self.min_length,
                    err_struct(codes.TOO_SHORT,
                               f"list length is less than {self.min_length}")))
            if self.max_length is not None:
                e = F.coalesce(e, F.when(
                    F.size(P) > self.max_length,
                    err_struct(codes.TOO_LONG,
                               f"list length is greater than {self.max_length}")))
            e = F.coalesce(e, F.when(
                P.isNotNull() & (F.size(bad) > 0),
                err_struct(codes.SOME_ELEMENTS_DID_NOT_MATCH, F.concat_ws("; ", bad))))
            return F.struct(F.when(e.isNull(), values).alias("v"), e.alias("e"))

        packed = let(inner, build)
        return Compiled(packed["v"], packed["e"], T.ArrayType(out_elem_dt),
                        packed=packed)


class Tuple(Guard):
    """Fixed-arity heterogeneous sequence (trafaret/base.py:887-935).
    Over an array column: size==n + positional checks; over a struct column:
    field-wise checks."""

    def __init__(self, *guards):
        self.guards = [ensure_guard(g) for g in guards]

    def compile(self, col, dtype):
        n = len(self.guards)
        if isinstance(dtype, T.ArrayType):
            elem_dt = dtype.elementType
            # F.get, not col[i]: positional GetArrayItem throws
            # INVALID_ARRAY_INDEX under ANSI when the arity is short —
            # exactly the rows the bad_arity branch is meant to flag
            compiled = [g.compile(F.get(col, i), elem_dt)
                        for i, g in enumerate(self.guards)]
            out_elem = _common_type([c.dtype for c in compiled])
            # arity predicate bound into the let input — outer attribute
            # refs inside HOF lambdas resolve late (see schema.Key note)
            kids = F.struct(
                (col.isNull() | (F.size(col) != n)).alias("bad_arity"),
                *[c.as_packed().alias(f"k{i}") for i, c in enumerate(compiled)])

            def build(K: Column) -> Column:
                pos_errs = [
                    F.when(K[f"k{i}"]["e"].isNotNull(),
                           F.concat(F.lit(f"{i}: "), K[f"k{i}"]["e"]["code"]))
                    for i in range(n)
                ]
                bad = F.array_compact(F.array(*pos_errs))
                arity_err = F.when(K["bad_arity"], err_struct(
                    codes.TUPLE_LIKE, f"value must contain {n} items"))
                e = F.coalesce(arity_err, F.when(
                    F.size(bad) > 0,
                    err_struct(codes.SOME_ELEMENTS_DID_NOT_MATCH,
                               F.concat_ws("; ", bad))))
                value = F.when(e.isNull(), F.array(*[
                    K[f"k{i}"]["v"].cast(out_elem) for i in range(n)]))
                return F.struct(value.alias("v"), e.alias("e"))

            packed = let(kids, build)
            return Compiled(packed["v"], packed["e"], T.ArrayType(out_elem),
                            packed=packed)
        if isinstance(dtype, T.StructType):
            if len(dtype.fields) != n:
                return Compiled(col, err_struct(codes.TUPLE_LIKE, f"value must contain {n} items"), dtype)
            compiled = [g.compile(col[f.name], f.dataType)
                        for g, f in zip(self.guards, dtype.fields)]
            out = T.StructType([T.StructField(f.name, c.dtype)
                                for c, f in zip(compiled, dtype.fields)])
            kids = F.struct(col.isNull().alias("nil"),
                            *[c.as_packed().alias(f"k{i}")
                              for i, c in enumerate(compiled)])
            fields = [f.name for f in dtype.fields]

            def build(K: Column) -> Column:
                pos_errs = [
                    F.when(K[f"k{i}"]["e"].isNotNull(),
                           F.concat(F.lit(f"{i}: "), K[f"k{i}"]["e"]["code"]))
                    for i in range(n)
                ]
                bad = F.array_compact(F.array(*pos_errs))
                null_err = F.when(K["nil"], err_struct(
                    codes.TUPLE_LIKE, f"value must contain {n} items"))
                e = F.coalesce(null_err, F.when(F.size(bad) > 0, err_struct(
                    codes.SOME_ELEMENTS_DID_NOT_MATCH, F.concat_ws("; ", bad))))
                value = F.when(e.isNull(), F.struct(*[
                    K[f"k{i}"]["v"].alias(fields[i]) for i in range(n)]))
                return F.struct(value.alias("v"), e.alias("e"))

            packed = let(kids, build)
            return Compiled(packed["v"], packed["e"], out, packed=packed)
        return Compiled(col, err_struct(codes.TUPLE_LIKE, "value must be convertable to tuple"), dtype)


class Mapping(Guard):
    """Homogeneous map k/v validation (trafaret/base.py:1235-1274)."""

    def __init__(self, key, value):
        self.key = ensure_guard(key)
        self.value = ensure_guard(value)

    def compile(self, col, dtype):
        if not isinstance(dtype, T.MapType):
            return Compiled(col, err_struct(codes.IS_NOT_A_DICT, "value is not a dict"), dtype)
        kd, vd = dtype.keyType, dtype.valueType
        k_out = probe_dtype(self.key, kd)
        v_out = probe_dtype(self.value, vd)

        # one compile per k/v guard, entries packed once, all references
        # through `let` lambda variables
        def _pack(kv):
            return F.struct(kv["key"].cast("string").alias("ks"),
                            self.key.compile(kv["key"], kd).as_packed().alias("k"),
                            self.value.compile(kv["value"], vd).as_packed().alias("w"))

        inner = F.transform(F.map_entries(col), _pack)

        def build(P: Column) -> Column:
            bad = F.array_compact(F.transform(P, lambda p: F.coalesce(
                F.when(p["k"]["e"].isNotNull(),
                       F.concat(p["ks"], F.lit(": key: "), p["k"]["e"]["code"])),
                F.when(p["w"]["e"].isNotNull(),
                       F.concat(p["ks"], F.lit(": value: "), p["w"]["e"]["code"])),
            )))
            e = F.when(P.isNotNull() & (F.size(bad) > 0),
                       err_struct(codes.MAPPING_FAILED, F.concat_ws("; ", bad)))
            value = F.when(e.isNull(), F.map_from_arrays(
                F.transform(P, lambda p: p["k"]["v"]),
                F.transform(P, lambda p: p["w"]["v"]),
            ))
            return F.struct(value.alias("v"), e.alias("e"))

        packed = let(inner, build)
        return Compiled(packed["v"], packed["e"], T.MapType(k_out, v_out),
                        packed=packed)


# --------------------------------------------------------------------------
# composition
# --------------------------------------------------------------------------

class And(Guard):
    """Sequential pipe, fail fast (trafaret/base.py:320-339): run left,
    feed its *output* to right; right never sees a failed value."""

    def __init__(self, left, right):
        self.left = ensure_guard(left)
        self.right = ensure_guard(right)

    def _null_probe_dtype(self):
        return self.left._null_probe_dtype()

    @property
    def accepts_null(self):
        return self.left.accepts_null

    def compile(self, col, dtype):
        c1 = self.left.compile(col, dtype)
        # leaf children (no packed form) compose as plain codegen-able
        # expressions — duplication is a bounded constant. Only container
        # children (packed set) pay the HOF `let` (which drops that subtree
        # out of whole-stage codegen but keeps it single-copy).
        if c1.packed is None:
            c2 = self.right.compile(c1.value, c1.dtype)
            if c2.packed is None:
                error = F.coalesce(c1.error, c2.error)
                value = F.when(error.isNull(), c2.value)
                return Compiled(value, error, c2.dtype)
        out_dtype = probe_dtype(self.right, c1.dtype)

        def build1(p1: Column) -> Column:
            c2 = self.right.compile(p1["v"], c1.dtype)

            def build2(p2: Column) -> Column:
                error = F.coalesce(p1["e"], p2["e"])
                return F.struct(F.when(error.isNull(), p2["v"]).alias("v"),
                                error.alias("e"))

            return let(c2.as_packed(), build2)

        packed = let(c1.as_packed(), build1)
        return Compiled(packed["v"], packed["e"], out_dtype, packed=packed)

    def describe(self):
        return f"{self.left.describe()} & {self.right.describe()}"


def _common_type(dts: Sequence[T.DataType]) -> T.DataType:
    names = {dt.simpleString() for dt in dts}
    if len(names) == 1:
        return dts[0]
    if all(_is_numeric(dt) for dt in dts):
        if all(isinstance(dt, _INTEGRAL_TYPES) for dt in dts):
            return T.LongType()
        return T.DoubleType()
    if all(isinstance(dt, (T.DateType, T.TimestampType)) for dt in dts):
        return T.TimestampType()
    return T.StringType()


class Or(Guard):
    """Ordered alternatives: first success wins (trafaret/base.py:284-317).
    Branch order is semantic, not just perf — preserved via a when-chain.

    DOCUMENTED SEMANTIC DELTA vs the reference (SURVEY §7 risk list): a
    Spark column has ONE type, so every branch's output is cast to the
    widest common type (``_common_type``). ``Int() | Float()`` therefore
    yields double for int-branch winners too — the reference, validating
    Python objects row-by-row, returns the winning branch's own type
    (``int`` here). Value equality is preserved; branch-dependent *dtype*
    identity is not. When per-branch types must survive, validate into
    separate columns (e.g. two Keys) instead of one Or."""

    def __init__(self, *guards):
        self.guards = [ensure_guard(g) for g in guards]

    @property
    def accepts_null(self):
        return any(g.accepts_null for g in self.guards)

    def compile(self, col, dtype):
        compiled = [g.compile(col, dtype) for g in self.guards]
        out = _common_type([c.dtype for c in compiled])
        n = len(compiled)
        if all(c.packed is None for c in compiled):
            # leaf branches: plain when-chain, stays in codegen (see And)
            value = F.lit(None).cast(out)
            for c in reversed(compiled):
                value = F.when(c.error.isNull(), c.value.cast(out)).otherwise(value)
            all_fail = compiled[0].error.isNotNull()
            for c in compiled[1:]:
                all_fail = all_fail & c.error.isNotNull()
            msg = F.concat_ws("; ", *[
                F.concat(F.lit(f"{i}: "), c.error["code"])
                for i, c in enumerate(compiled)])
            e = F.when(all_fail, err_struct(codes.NOTHING_MATCH, msg))
            return Compiled(value, e, out)
        kids = F.struct(*[c.as_packed().alias(f"b{i}")
                          for i, c in enumerate(compiled)])

        def build(K: Column) -> Column:
            value = F.lit(None).cast(out)
            for i in reversed(range(n)):
                value = F.when(K[f"b{i}"]["e"].isNull(),
                               K[f"b{i}"]["v"].cast(out)).otherwise(value)
            all_fail = K["b0"]["e"].isNotNull()
            for i in range(1, n):
                all_fail = all_fail & K[f"b{i}"]["e"].isNotNull()
            msg = F.concat_ws("; ", *[
                F.concat(F.lit(f"{i}: "), K[f"b{i}"]["e"]["code"])
                for i in range(n)])
            e = F.when(all_fail, err_struct(codes.NOTHING_MATCH, msg))
            return F.struct(value.alias("v"), e.alias("e"))

        packed = let(kids, build)
        return Compiled(packed["v"], packed["e"], out, packed=packed)

    def describe(self):
        return " | ".join(g.describe() for g in self.guards)


class OnError(Guard):
    """Replace the message/code of an inner failure (trafaret/base.py:155-170)."""

    def _null_probe_dtype(self):
        return self.guard._null_probe_dtype()

    def __init__(self, guard, message: str, code: Optional[str] = None):
        self.guard = ensure_guard(guard)
        self.message = message
        self.code = code

    @property
    def accepts_null(self):
        return self.guard.accepts_null

    def compile(self, col, dtype):
        c = self.guard.compile(col, dtype)
        if c.packed is None:
            e = F.when(c.error.isNotNull(),
                       err_struct(self.code, self.message) if self.code
                       else F.struct(c.error["code"].alias("code"),
                                     F.lit(self.message).alias("message")))
            return Compiled(c.value, e, c.dtype)

        def build(p: Column) -> Column:
            e = F.when(p["e"].isNotNull(),
                       err_struct(self.code, self.message) if self.code
                       else F.struct(p["e"]["code"].alias("code"),
                                     F.lit(self.message).alias("message")))
            return F.struct(p["v"].alias("v"), e.alias("e"))

        packed = let(c.as_packed(), build)
        return Compiled(packed["v"], packed["e"], c.dtype, packed=packed)


class WithRepr(Guard):
    """Cosmetic repr override around an inner guard (trafaret/base.py:173-182)."""

    def _null_probe_dtype(self):
        return self.guard._null_probe_dtype()

    def __init__(self, guard, repr_: str):
        self.guard = ensure_guard(guard)
        self.repr_ = repr_

    @property
    def accepts_null(self):
        return self.guard.accepts_null

    def compile(self, col, dtype):
        return self.guard.compile(col, dtype)

    def describe(self):
        return self.repr_


class Callable(Guard):
    """Value-is-callable check (trafaret/base.py:1308-1328). No Spark column
    can hold a callable, so in the data plane this is a constant failure —
    kept for API parity; use it only in driver-side ``guard`` schemas where
    it is checked against real Python values at plan time."""

    def compile(self, col, dtype):
        return Compiled(col, err_struct(
            codes.IS_NOT_CALLABLE, "value is not callable"), dtype)


_PYTYPE_TO_SPARK = {
    int: _INTEGRAL_TYPES,
    float: (T.FloatType, T.DoubleType),
    str: (T.StringType,),
    bool: (T.BooleanType,),
    bytes: (T.BinaryType,),
    list: (T.ArrayType,),
    tuple: (T.ArrayType, T.StructType),
    dict: (T.MapType, T.StructType),
}


class Type(Guard):
    """isinstance check, decided from the column dtype at plan time
    (trafaret/base.py:249-266). Accepts a Python type (mapped to its Spark
    dtype family) or a ``pyspark.sql.types`` DataType class. Mismatch
    compiles to a constant per-row error — the whole column is the wrong
    type, so every row fails, mirroring the reference's per-value check."""

    failure_message = "value is not %s"
    code = codes.IS_NOT_INSTANCE

    def __class_getitem__(cls, type_):
        return cls(type_)

    def __init__(self, type_):
        self.type_ = type_
        if isinstance(type_, type) and issubclass(type_, T.DataType):
            self._spark_types = (type_,)
            self._name = type_.__name__
        elif type_ in _PYTYPE_TO_SPARK:
            self._spark_types = _PYTYPE_TO_SPARK[type_]
            self._name = type_.__name__
        else:
            raise PlanTimeError(f"Type() cannot map {type_!r} to a Spark dtype")

    def _matches(self, dtype) -> bool:
        return isinstance(dtype, self._spark_types)

    def compile(self, col, dtype):
        if self._matches(dtype):
            return Compiled(col, _null_err(), dtype)
        return Compiled(col, err_struct(
            self.code, self.failure_message % self._name), dtype)

    def describe(self):
        return f"{type(self).__name__}({self._name})"


class Subclass(Type):
    """Dtype-family subclass check (trafaret/base.py:231-246). In the data
    plane the class hierarchy that exists is the Spark dtype tree, so
    ``Subclass[T.NumericType]`` passes any numeric column."""

    failure_message = "value is not subclass of %s"
    code = codes.IS_NOT_SUBCLASS


class MongoId(Guard):
    """BSON ObjectId as its canonical 24-hex-char string
    (trafaret/contrib/object_id.py:8-43). Coerces to lowercase hex.
    Delta vs the reference: ``allow_blank=True`` passes NULL through
    instead of generating a fresh ObjectId (non-deterministic driver-side
    generation has no place in a distributed plan)."""

    def __init__(self, allow_blank: bool = False):
        self.allow_blank = allow_blank

    @property
    def accepts_null(self):
        return self.allow_blank

    def compile(self, col, dtype):
        s = F.lower(col.cast("string"))
        ok = s.rlike(r"^[0-9a-f]{24}$")
        e = F.when(col.isNull(),
                   _null_err() if self.allow_blank else err_struct(
                       codes.EMPTY_VALUE, "blank value is not allowed")) \
            .otherwise(F.when(~ok, err_struct(
                codes.INVALID_OBJECTID,
                "value must be a 24-character hex string")))
        return Compiled(F.when(ok, s), e, T.StringType())


class Call(Guard):
    """Arrow-batched custom validator — the engine analogue of trafaret's
    ``Call`` (trafaret/base.py:1331-1366) and the ONLY sanctioned custom-logic
    path (never row-at-a-time Python).

    ``fn(values: pd.Series) -> (values: pd.Series, errors: pd.Series[str|None])``
    where a non-null error string marks a failed row. ``return_type`` is the
    Spark type of the returned values.

    Context pass-through (trafaret/base.py:1349-1357, tests/test_context.py):
    an ``fn`` declaring a ``context`` keyword receives the value given to
    ``apply_schema(..., context=...)`` / ``Guard.check(value, context=...)``.
    Catalyst compiles once, so the context is a plan-time constant captured
    into the Arrow kernel's closure at compile time (via ``CALL_CONTEXT``)
    — it must be picklable; per-ROW mutable context has no engine analogue
    (documented n/a, same as with_context_caller).
    """

    def __init__(self, fn: PyCallable, return_type, code: str = "call_failed"):
        self.fn = fn
        self.return_type = (return_type if isinstance(return_type, T.DataType)
                            else T._parse_datatype_string(return_type))
        self.code = code
        try:
            sig = inspect.signature(fn)
            self.supports_context = "context" in sig.parameters
        except (TypeError, ValueError):
            self.supports_context = False

    def _build_udf(self, context):
        out_schema = T.StructType([
            T.StructField("value", self.return_type),
            T.StructField("err", T.StringType()),
        ])
        fn_ref, with_ctx = self.fn, self.supports_context

        @F.pandas_udf(out_schema)
        def _udf(s):
            import pandas as pd
            values, errs = (fn_ref(s, context=context) if with_ctx
                            else fn_ref(s))
            return pd.DataFrame({"value": values, "err": errs})

        return _udf

    def compile(self, col, dtype):
        res = self._build_udf(CALL_CONTEXT.get())(col)
        e = F.when(res["err"].isNotNull(),
                   F.struct(F.lit(self.code).alias("code"), res["err"].alias("message")))
        value = F.when(e.isNull(), res["value"])
        return Compiled(value, e, self.return_type)
