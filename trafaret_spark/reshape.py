"""Nested ↔ flat column reshaping — the engine's ``unfold``/``fold``
(trafaret/utils.py:38-103, delimiter-joined flat keys like ``a__b``).

DataFrame recast: the reference flattens one nested *value* into a flat
dict; here we flatten nested *struct columns* into delimiter-named flat
columns and back, as pure `select` projections (no shuffle, no Python).

Deltas vs the reference (documented):
  * ``unfold`` leaves array columns intact — array length varies per row,
    so the reference's positional ``a__0, a__1`` explosion has no columnar
    analogue (a column set must be row-invariant).
  * ``fold`` DOES assemble all-digit sibling groups into arrays
    (``a__0, a__1`` → ``a: array``), mirroring trafaret/utils.py:88-91,
    so a round-trip through a reference-unfolded flat schema reassembles.
"""

from __future__ import annotations

from itertools import groupby

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["unfold", "fold", "split"]


def split(key: str, delimiters) -> list:
    """Multi-delimiter key splitting (trafaret/utils.py:52-61): split
    ``key`` by every delimiter in turn, dropping empty segments —
    ``split("a__b--c", ["__", "--"]) == ["a", "b", "c"]``. Plain-Python
    helper for parsing flat column names produced by mixed-delimiter
    sources before handing them to :func:`fold`."""
    parts = [key]
    for d in delimiters:
        parts = [seg for p in parts for seg in p.split(d)]
    return [p for p in parts if p]


def unfold(df: DataFrame, prefix: str = "", delimiter: str = "__") -> DataFrame:
    """Flatten every struct column (recursively) into ``parent__child``
    top-level columns (trafaret/utils.py:38-49)."""

    def rec(col: Column, name: str, dtype: T.DataType):
        if isinstance(dtype, T.StructType):
            for f in dtype.fields:
                yield from rec(col[f.name], name + delimiter + f.name, f.dataType)
        else:
            yield col.alias(name)

    cols = []
    for f in df.schema.fields:
        base = f"{prefix}{delimiter}{f.name}" if prefix else f.name
        cols.extend(rec(F.col(f.name), base, f.dataType))
    return df.select(*cols)


def fold(df: DataFrame, prefix: str = "", delimiter: str = "__") -> DataFrame:
    """Reassemble ``parent__child`` flat columns into nested structs
    (all-digit sibling groups into arrays) — trafaret/utils.py:64-103.
    ``prefix`` strips a leading ``prefix__`` from every column first."""

    names = []
    for c in df.columns:
        parts = c.split(delimiter)
        if prefix:
            if parts[0] != prefix:
                continue
            parts = parts[1:]
        names.append((parts, c))

    def build(items) -> list:
        items = sorted(items, key=lambda kv: kv[0][0])
        cols = []
        for head, group in groupby(items, key=lambda kv: kv[0][0]):
            sub = [(parts[1:], full) for parts, full in group]
            if len(sub) == 1 and not sub[0][0]:
                cols.append((head, F.col(sub[0][1])))
            else:
                children = build(sub)
                if children and all(n.isdigit() for n, _ in children):
                    arr = [c for _, c in sorted(children, key=lambda nc: int(nc[0]))]
                    cols.append((head, F.array(*arr)))
                else:
                    cols.append((head, F.struct(*[c.alias(n) for n, c in children])))
        return cols

    return df.select(*[c.alias(n) for n, c in build(names)])
