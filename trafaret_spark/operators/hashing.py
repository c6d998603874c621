"""Cross-engine-reproducible hashing primitives.

The dedup / fingerprint operators hash tokens and combine the hashes. Two
interchangeable families:

  * **fast** (default) — ``xxhash64``: Spark's native 64-bit hash, one JVM
    intrinsic per token, and n-gram combining via ``xxhash64(a, b)`` (hashing
    two longs — no arithmetic, so no ANSI overflow surface at all). The
    production path at 100 TB.
  * **portable** — the low 60 bits of ``md5`` reduced mod M31 = 2^31-1, with
    polynomial n-gram combining ``(a * 1000003 + b) mod M31``. Every value
    stays < 2^31 so products stay < 2^52: exception-free under ANSI and exact
    in int64 on ANY engine. DuckDB reproduces it bit-for-bit
    (``CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT)``), which is what
    makes the minhash/simhash/fingerprint driver queries oracle-checkable.

Both families are ANSI-neutral: no operation here can throw under
``spark.sql.ansi.enabled=true`` (round-1 lesson — Java-long wrap-around
multiplication is an ARITHMETIC_OVERFLOW error under ANSI, see
CORRECTNESS_r01 dedup_minhash/text_fingerprint).

``rademacher_planes`` is the shared plane generator for sign-LSH over
embeddings: {-1, +1} entries make the projection an exact integer sum after
fixed-point quantization, so the bucket bits are bit-reproducible across
engines and float-summation orders (a gaussian-plane float dot near 0 can
flip sign between BLAS and a SQL fold).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["M31", "MULT", "hash60", "tok31", "combine31", "fold31",
           "tok_hash", "gram_combine", "rademacher_planes",
           "HASH60_DUCKDB", "TOK31_DUCKDB"]

M31 = (1 << 31) - 1     # Mersenne prime 2^31 - 1
MULT = 1_000_003        # polynomial combine multiplier (< 2^21)

# DuckDB expressions computing the same values (format with the input expr)
HASH60_DUCKDB = "CAST(concat('0x', substr(md5({0}), 1, 15)) AS BIGINT)"
TOK31_DUCKDB = ("(CAST(concat('0x', substr(md5({0}), 1, 15)) AS BIGINT) "
                f"% {M31})")


def hash60(col: Column) -> Column:
    """Low 60 bits of md5 as a non-negative long — identical in Spark and
    DuckDB (verified: conv(substr(md5, 1, 15), 16, 10) ⇔ hex cast)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def tok31(col: Column) -> Column:
    """Portable token hash in [0, M31)."""
    return F.pmod(hash60(col), F.lit(M31))


def combine31(a: Column, b: Column) -> Column:
    """(a * MULT + b) mod M31 with both inputs in [0, M31): the product is
    < 2^52, so plain long arithmetic is exact and never overflows."""
    return F.pmod(a * F.lit(MULT) + b, F.lit(M31))


def fold31(arr: Column) -> Column:
    """Left fold of combine31 over an array<long> (elements in [0, M31)),
    starting from 0 — the portable order-sensitive rolling hash."""
    return F.aggregate(arr, F.lit(0).cast("long"),
                       lambda acc, h: combine31(acc, h))


def tok_hash(col: Column, portable: bool = False) -> Column:
    """Per-token hash: xxhash64 (fast) or the md5-derived tok31 (portable)."""
    return tok31(col) if portable else F.xxhash64(col)


def gram_combine(portable: bool = False):
    """Binary combine for n-gram hash folding. Fast path hashes the two
    longs with xxhash64 (full 64-bit space, zero arithmetic); portable path
    is the mod-M31 polynomial."""
    if portable:
        return combine31
    return lambda a, b: F.xxhash64(a, b)


def rademacher_planes(dim: int, total: int, seed: int) -> np.ndarray:
    """Seed-deterministic {-1, +1} hyperplane matrix (dim × total), int64.

    Used by similarity.lsh_band_buckets and regenerated verbatim by the
    DuckDB oracle builder (__spark_entry__) — keep the RandomState recipe
    frozen."""
    rng = np.random.RandomState(seed)
    return (rng.randint(0, 2, size=(dim, total)) * 2 - 1).astype(np.int64)
