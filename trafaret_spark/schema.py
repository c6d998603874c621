"""Dict/Key schema layer: compile a keyed schema over a DataFrame (or a
struct column) into one `select` of coerced columns + an errors array.

Mirrors the reference's `Dict`/`Key` protocol (trafaret/base.py:938-1232):
  * required / optional / default (callable defaults evaluated at plan time)
    / rename-to (`to_name`, `>>`);
  * extras policy: unknown columns are an error by default, relaxed via
    ``allow_extra([...]/'*')`` or ``ignore_extra`` (trafaret/base.py:1150-1176);
  * cross-field rules (`xor_key`, `confirm_key`, `subdict` — trafaret/keys.py)
    consume several source columns and emit different output columns.

DataFrame delta vs the reference: a missing *key* in a dict becomes a NULL
*value* in a column (columns exist for every row), so for a required key a
NULL maps to code 'required' unless the guard itself accepts null
(`Null`, `Any`, `ToBool`, `X | Null`).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from trafaret_spark import codes
from trafaret_spark.guards import (
    Any,
    Bool,
    Compiled,
    ERROR_ENTRY_TYPE,
    Float,
    Guard,
    List,
    PlanTimeError,
    String,
    ToFloat,
    ToInt,
    Tuple,
    _null_err,
    ensure_guard,
    err_struct,
    let,
)

__all__ = [
    "Key", "Schema", "SchemaError", "DictGuard", "construct",
    "xor_key", "confirm_key", "subdict", "CompiledKey",
    "Forward", "DictKeys", "KeysSubset",
]

_EMPTY = object()


class SchemaError(PlanTimeError):
    """Plan-time schema violation (e.g. disallowed extra columns)."""


def _entry(path: str, error: Column) -> Column:
    """Lift struct<code,message> into struct<path,code,message> (or NULL)."""
    return F.when(error.isNotNull(), F.struct(
        F.lit(path).alias("path"),
        error["code"].alias("code"),
        error["message"].alias("message"),
    ))


@dataclasses.dataclass
class CompiledKey:
    out_name: str
    value: Column
    dtype: T.DataType
    entry: Column          # struct<path,code,message> or NULL
    touched: tuple         # source columns consumed
    # struct<v,e> single-expression form (see guards.let); e is the raw
    # struct<code,message> without the path
    packed: Optional[Column] = None

    def as_packed(self) -> Column:
        if self.packed is not None:
            return self.packed
        e = F.when(self.entry.isNotNull(), F.struct(
            self.entry["code"].alias("code"),
            self.entry["message"].alias("message")))
        return F.struct(self.value.alias("v"), e.alias("e"))


class Key:
    """One output column: extract, default, guard, rename
    (reference Key protocol: trafaret/base.py:938-1004)."""

    def __init__(self, name: str, guard=None, optional: bool = False,
                 default=_EMPTY, to_name: Optional[str] = None):
        self.name = name
        self.guard = ensure_guard(guard) if guard is not None else Any()
        self.optional = optional
        self.default = default
        self.to_name = to_name

    def __rshift__(self, to_name: str) -> "Key":
        return Key(self.name, self.guard, self.optional, self.default, to_name)

    def compile(self, columns: dict[str, T.DataType],
                get: Callable[[str], Column]) -> Optional[CompiledKey]:
        out = self.to_name or self.name
        has_default = self.default is not _EMPTY
        default_val = (self.default() if has_default and callable(self.default)
                       else self.default)

        if self.name not in columns:
            if has_default:
                src_dt = T._infer_type(default_val) if default_val is not None else T.StringType()
                c = self.guard.compile(F.lit(default_val).cast(src_dt), src_dt)
                # engine-wide convention (same as the present-column path
                # below): value is NULL whenever the key has an error entry —
                # a default that fails its own guard must not leak through
                return CompiledKey(out, F.when(c.error.isNull(), c.value),
                                   c.dtype, _entry(out, c.error), ())
            if self.optional:
                return None
            # column absent entirely: every row fails 'required'
            return CompiledKey(
                out, F.lit(None).cast("string"), T.StringType(),
                _entry(out, err_struct(codes.REQUIRED, "is required")), ())

        src = get(self.name)
        dtype = columns[self.name]
        if has_default:
            src = F.coalesce(src, F.lit(default_val).cast(dtype))
        c = self.guard.compile(src, dtype)

        if c.packed is None:
            # leaf guard: plain codegen-able composition (bounded duplication)
            if self.guard.accepts_null or has_default:
                e, value = c.error, c.value
            elif self.optional:
                # null = absent: skip the guard, emit null, no error
                e = F.when(src.isNotNull(), c.error)
                value = F.when(src.isNotNull(), c.value)
            else:
                required = F.when(src.isNull(),
                                  err_struct(codes.REQUIRED, "is required"))
                e = F.coalesce(required, c.error)
                value = c.value
            # engine-wide convention: a key's output value is NULL whenever
            # that key has an error entry (trafaret raises instead — the
            # failed value is never observable, so null is the faithful
            # columnar recast; guards themselves are inconsistent about it)
            return CompiledKey(out, F.when(e.isNull(), value), c.dtype,
                               _entry(out, e), (self.name,))

        # container/composed guard: single-copy via `let`. src-dependent
        # conditions are BOUND INTO the let input: an outer attribute
        # referenced inside a HOF lambda body resolves late, and if the
        # enclosing select aliases an output column to the same name the
        # lambda binds to the (coerced) output instead of the input
        inner = F.struct(c.as_packed().alias("p"), src.isNull().alias("nil"))

        def build(b: Column) -> Column:
            p, src_null = b["p"], b["nil"]
            if self.guard.accepts_null or has_default:
                e, value = p["e"], p["v"]
            elif self.optional:
                e = F.when(~src_null, p["e"])
                value = F.when(~src_null, p["v"])
            else:
                required = F.when(src_null,
                                  err_struct(codes.REQUIRED, "is required"))
                e = F.coalesce(required, p["e"])
                value = p["v"]
            return F.struct(F.when(e.isNull(), value).alias("v"), e.alias("e"))

        pk = let(inner, build)
        return CompiledKey(out, pk["v"], c.dtype, _entry(out, pk["e"]),
                           (self.name,), packed=pk)


class _CrossFieldKey:
    """Base for multi-source-column rules (trafaret/keys.py)."""

    def compile(self, columns, get) -> Sequence[CompiledKey]:  # pragma: no cover
        raise NotImplementedError


class xor_key(_CrossFieldKey):
    """Exactly one of two columns non-null (trafaret/keys.py:93-143)."""

    def __init__(self, first: str, second: str, guard, to_name: Optional[str] = None):
        self.first, self.second = first, second
        self.guard = ensure_guard(guard)
        self.to_name = to_name or first

    def compile(self, columns, get):
        a, b = get(self.first), get(self.second)
        both = a.isNotNull() & b.isNotNull()
        neither = a.isNull() & b.isNull()
        src = F.coalesce(a, b)
        dt = columns.get(self.first) or columns.get(self.second) or T.StringType()
        c = self.guard.compile(src, dt)
        e = (F.when(both, err_struct(codes.ONLY_ONE_MUST_BE_DEFINED,
                                     "only one of the keys must be defined"))
             .when(neither, err_struct(codes.ONE_IS_REQUIRED, "is required")))
        e = F.coalesce(e, c.error)
        return [CompiledKey(self.to_name, F.when(e.isNull(), c.value), c.dtype,
                            _entry(self.to_name, e), (self.first, self.second))]


class confirm_key(_CrossFieldKey):
    """Both present and equal (trafaret/keys.py:146-176)."""

    def __init__(self, name: str, confirm_name: str, guard):
        self.name, self.confirm_name = name, confirm_name
        self.guard = ensure_guard(guard)

    def compile(self, columns, get):
        a, b = get(self.name), get(self.confirm_name)
        dt = columns.get(self.name, T.StringType())
        c = self.guard.compile(a, dt)
        e = (F.when(a.isNull() | b.isNull(),
                    err_struct(codes.REQUIRED, "is required"))
             .when(a != b, err_struct(codes.MUST_BE_EQUAL, "must be equal")))
        e = F.coalesce(e, c.error)
        return [CompiledKey(self.name, F.when(e.isNull(), c.value), c.dtype,
                            _entry(self.name, e), (self.name, self.confirm_name))]


class subdict(_CrossFieldKey):
    """Group several source columns into one output through a combining
    expression (trafaret/keys.py:43-90). ``combine`` receives the guarded
    Columns and returns one Column; ``dtype`` names its Spark type."""

    def __init__(self, name: str, *keys: Key,
                 combine: Callable[..., Column], dtype="string"):
        self.name = name
        self.keys = keys
        self.combine = combine
        self.dtype = dtype if isinstance(dtype, T.DataType) else T._parse_datatype_string(dtype)

    def compile(self, columns, get):
        parts = [k.compile(columns, get) for k in self.keys]
        parts = [p for p in parts if p is not None]
        child_err = F.lit(None).cast("struct<code:string,message:string>")
        for p in parts:
            child_err = F.coalesce(
                child_err,
                F.when(p.entry.isNotNull(),
                       F.struct(p.entry["code"].alias("code"),
                                p.entry["message"].alias("message"))))
        value = self.combine(*[p.value for p in parts])
        touched = tuple(t for p in parts for t in p.touched)
        return [CompiledKey(self.name, F.when(child_err.isNull(), value),
                            self.dtype, _entry(self.name, child_err), touched)]


class KeysSubset(_CrossFieldKey):
    """Multi-key cross-field rule emitting reshaped output keys
    (trafaret/keys.py:5-40): consume ``names`` source columns, emit the
    columns returned by ``transform``.

    ``transform(*source_cols)`` returns ``{out_name: Column}`` or
    ``{out_name: (Column, error_Column)}`` where the error Column is a
    ``err_struct(...)``-shaped struct (NULL = pass) — the engine analogue of
    the reference's yield-a-DataError-per-key protocol. ``dtypes`` maps
    out_name → Spark type (default string).
    """

    def __init__(self, *names: str, transform: Callable[..., dict],
                 dtypes: Optional[dict] = None):
        self.names = names
        self.transform = transform
        self.dtypes = dtypes or {}

    def compile(self, columns, get):
        srcs = [get(n) if n in columns else F.lit(None).cast("string")
                for n in self.names]
        touched = tuple(n for n in self.names if n in columns)
        out = self.transform(*srcs)
        result = []
        for name, v in out.items():
            value, err = v if isinstance(v, tuple) else (v, _null_err_struct())
            dt = self.dtypes.get(name, "string")
            dt = dt if isinstance(dt, T.DataType) else T._parse_datatype_string(dt)
            result.append(CompiledKey(name, F.when(err.isNull(), value), dt,
                                      _entry(name, err), touched))
        return result


def _null_err_struct() -> Column:
    return F.lit(None).cast("struct<code:string,message:string>")


class Forward(Guard):
    """Recursive schema reference (trafaret/base.py:1369-1418):
    ``node << DictGuard(name=String(), children=List(node))``.

    Recursion is bounded by the *input dtype* — Spark struct types are
    finite trees, so compilation unrolls exactly as deep as the column's
    actual type and stops where the nested field is absent (the reference
    unrolls per-value at runtime instead). ``max_depth`` is a safety cap
    for pathological plans.
    """

    def __init__(self, max_depth: int = 24):
        self.guard: Optional[Guard] = None
        self.max_depth = max_depth
        self._depth = 0

    def __lshift__(self, guard):
        self.provide(guard)

    def provide(self, guard):
        if self.guard is not None:
            raise PlanTimeError("guard for Forward is already specified")
        self.guard = ensure_guard(guard)
        from trafaret_spark.guards import _PROBE_GEN
        _PROBE_GEN[0] += 1  # downstream probe dtypes may have changed

    def compile(self, col, dtype):
        if self.guard is None:
            return Compiled(col, err_struct(
                codes.TRAFARET_IS_NOT_SET, "trafaret not set yet"), dtype)
        if self._depth >= self.max_depth:
            raise SchemaError(
                f"Forward recursion exceeds max_depth={self.max_depth}")
        self._depth += 1
        try:
            return self.guard.compile(col, dtype)
        finally:
            self._depth -= 1

    def describe(self):
        return "Forward(...)" if self._depth else \
            f"Forward({self.guard.describe() if self.guard else None})"


def DictKeys(names: Sequence[str]) -> "Schema":
    """Require exactly this column set, values unchecked
    (trafaret/base.py:1224-1232): missing → 'required', extra → plan-time
    NOT_ALLOWED via the default extras='raise' policy."""
    return Schema(*[Key(n) for n in names], extras="raise")


class Schema:
    """Top-level keyed schema over a DataFrame — the engine's `Dict`
    (trafaret/base.py:1007-1221).

    extras: 'raise' (default; unknown columns are a plan-time SchemaError,
    mirroring the reference's per-value NOT_ALLOWED), 'ignore' (drop ALL),
    'allow' (keep ALL untouched), a list of allowed extra names (kept;
    others raise), or ('ignore', [names]) (those dropped; others raise —
    the per-name ignore_extra semantics of trafaret/base.py:1074-1076).

    ``extras_guard`` validates every KEPT extra column (reference
    allow_extra(trafaret=...), trafaret/base.py:1167-1176): failures add
    error entries exactly like declared keys.
    """

    def __init__(self, *keys: Union[Key, _CrossFieldKey],
                 extras: Union[str, list, tuple] = "raise",
                 extras_guard=None, **kw_guards):
        self.keys: list = list(keys)
        for name, g in kw_guards.items():
            optional = name.endswith("__optional")
            self.keys.append(Key(name.removesuffix("__optional"),
                                 ensure_guard(g), optional=optional))
        self.extras = extras
        self.extras_guard = ensure_guard(extras_guard) if extras_guard else None

    def allow_extra(self, *names: str, trafaret=None) -> "Schema":
        extras = "allow" if "*" in names else list(names)
        return Schema(*self.keys, extras=extras,
                      extras_guard=trafaret or self.extras_guard)

    def ignore_extra(self, *names: str) -> "Schema":
        """Per-name semantics (trafaret/base.py:1074-1076): only the named
        extras are dropped; any OTHER extra column still raises. '*' drops
        everything."""
        extras = "ignore" if "*" in names else ("ignore", list(names))
        return Schema(*self.keys, extras=extras,
                      extras_guard=self.extras_guard)

    def merge(self, other: "Schema") -> "Schema":
        """Key-set union (trafaret/base.py:1200-1221)."""
        return Schema(*self.keys, *other.keys, extras=self.extras)

    __add__ = merge

    def compile(self, df: DataFrame):
        columns = {f.name: f.dataType for f in df.schema.fields}
        get = F.col
        compiled: list[CompiledKey] = []
        for k in self.keys:
            got = k.compile(columns, get)
            if got is None:
                continue
            compiled.extend(got if isinstance(got, (list, tuple)) else [got])

        touched = {t for ck in compiled for t in ck.touched}
        extra = [c for c in columns if c not in touched]
        keep_extra: list[str] = []
        if self.extras == "raise":
            if extra:
                raise SchemaError(f"{sorted(extra)} are not allowed columns "
                                  f"(code={codes.NOT_ALLOWED})")
        elif self.extras == "allow":
            keep_extra = extra
        elif isinstance(self.extras, tuple) and self.extras[0] == "ignore":
            # per-name ignore: listed extras drop silently, others raise
            bad = [c for c in extra if c not in self.extras[1]]
            if bad:
                raise SchemaError(f"{sorted(bad)} are not allowed columns "
                                  f"(code={codes.NOT_ALLOWED})")
        elif isinstance(self.extras, list):
            bad = [c for c in extra if c not in self.extras]
            if bad:
                raise SchemaError(f"{sorted(bad)} are not allowed columns "
                                  f"(code={codes.NOT_ALLOWED})")
            keep_extra = [c for c in extra if c in self.extras]
        # 'ignore' drops all extras
        if self.extras_guard is not None and keep_extra:
            # validate kept extras (reference trafaret/base.py:1167-1176) —
            # reuse the Key machinery (optional: NULL extra ~ absent key)
            for name in keep_extra:
                got = Key(name, self.extras_guard,
                          optional=True).compile(columns, get)
                if got is not None:
                    compiled.append(got)
            keep_extra = []
        return compiled, keep_extra

    def apply(self, df: DataFrame, errors_col: str = "errors",
              context=None) -> DataFrame:
        """One wide `select`: coerced/renamed columns + accumulated errors
        array (the vectorized analogue of Dict.transform's error dict,
        trafaret/base.py:1132-1179).

        ``context`` is the reference's check-time context pass-through
        (trafaret/base.py:1354-1357: ``check(value, context=...)`` reaches
        ``Call`` fns declaring a ``context`` kwarg). The engine compiles
        once, so the context is a plan-time constant captured by Call's
        Arrow kernel closure — set for the duration of this compile via a
        contextvar (guards.CALL_CONTEXT)."""
        from trafaret_spark.guards import CALL_CONTEXT
        token = CALL_CONTEXT.set(context)
        try:
            compiled, keep_extra = self.compile(df)
        finally:
            CALL_CONTEXT.reset(token)
        # concat-of-conditional-arrays, NOT array_compact: array_compact
        # desugars to a higher-order function (CodegenFallback), and one
        # CodegenFallback expression disqualifies the WHOLE projection from
        # whole-stage codegen — measured interpreted-mode validation
        empty = F.array().cast(T.ArrayType(ERROR_ENTRY_TYPE))
        if compiled:
            entries = F.concat(*[
                F.when(ck.entry.isNotNull(),
                       F.array(ck.entry).cast(T.ArrayType(ERROR_ENTRY_TYPE)))
                .otherwise(empty)
                for ck in compiled])
        else:
            entries = empty
        cols = [ck.value.cast(ck.dtype).alias(ck.out_name) for ck in compiled]
        cols += [F.col(c) for c in keep_extra]
        cols.append(entries.cast(T.ArrayType(ERROR_ENTRY_TYPE)).alias(errors_col))
        return df.select(*cols)


class DictGuard(Guard):
    """Keyed schema over a *struct column* — nested Dict support. Produces a
    rebuilt struct and rolls child errors up with dotted paths."""

    def __init__(self, *keys: Key, **kw_guards):
        self.schema = Schema(*keys, extras="ignore", **kw_guards)

    def compile(self, col, dtype):
        if not isinstance(dtype, T.StructType):
            return Compiled(col, err_struct(codes.IS_NOT_A_DICT, "value is not a dict"), dtype)
        columns = {f.name: f.dataType for f in dtype.fields}
        compiled: list[CompiledKey] = []
        for k in self.schema.keys:
            got = k.compile(columns, lambda name: col[name])
            if got is None:
                continue
            compiled.extend(got if isinstance(got, (list, tuple)) else [got])
        out = T.StructType([T.StructField(ck.out_name, ck.dtype) for ck in compiled])
        # col.isNull() is bound into the let input (see Key.compile note on
        # late attribute resolution inside HOF lambdas)
        kids = F.struct(col.isNull().alias("nil"),
                        *[ck.as_packed().alias(f"f{i}")
                          for i, ck in enumerate(compiled)])

        def build(K: Column) -> Column:
            bad = F.array_compact(F.array(*[
                F.when(K[f"f{i}"]["e"].isNotNull(),
                       F.concat(F.lit(f"{ck.out_name}: "), K[f"f{i}"]["e"]["code"]))
                for i, ck in enumerate(compiled)]))
            null_err = F.when(K["nil"], err_struct(
                codes.IS_NOT_A_DICT, "value is not a dict"))
            e = F.coalesce(null_err, F.when(F.size(bad) > 0, err_struct(
                codes.SOME_ELEMENTS_DID_NOT_MATCH, F.concat_ws("; ", bad))))
            value = F.when(e.isNull(), F.struct(*[
                K[f"f{i}"]["v"].cast(ck.dtype).alias(ck.out_name)
                for i, ck in enumerate(compiled)]))
            return F.struct(value.alias("v"), e.alias("e"))

        packed = let(kids, build)
        return Compiled(packed["v"], packed["e"], out, packed=packed)


def construct(arg, top: bool = True):
    """Literal-schema shorthand → guard tree, mirroring the reference's
    constructor (trafaret/constructor.py:23-71):

      int → ToInt, float → ToFloat, str → String, bool → Bool,
      [x] → List(x), (a, b) → Tuple, {k: v} → Schema (top level) or
      DictGuard (nested struct), key 'name?' → optional key
      (trafaret/constructor.py:64-71).
    """
    import trafaret_spark.guards as g

    if isinstance(arg, (Guard, Schema)):
        return arg
    if isinstance(arg, type) and issubclass(arg, Guard):
        return arg()
    if arg is int:
        return ToInt()
    if arg is float:
        return ToFloat()
    if arg is str:
        return String()
    if arg is bool:
        return Bool()
    if arg is None:
        return g.Null()
    if isinstance(arg, list):
        if len(arg) != 1:
            raise PlanTimeError("list literal must have exactly one element type")
        return List(construct(arg[0], top=False))
    if isinstance(arg, tuple):
        return Tuple(*[construct(a, top=False) for a in arg])
    if isinstance(arg, dict):
        keys = []
        for name, sub in arg.items():
            optional = name.endswith("?")
            keys.append(Key(name.rstrip("?"), construct(sub, top=False),
                            optional=optional))
        if top:
            return Schema(*keys)
        dg = DictGuard()
        dg.schema = Schema(*keys, extras="ignore")
        return dg
    raise PlanTimeError(f"cannot construct a guard from {arg!r}")
