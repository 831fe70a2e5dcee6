"""Portable deterministic hashing shared by the dedup/similarity operators.

``portable_hash64(x)`` = first 15 hex digits of md5(x) as a bigint (60 bits,
never negative, never overflows). The SAME value is computable in any SQL
engine with md5 + hex parse:

  Spark :  CAST(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT)
  DuckDB:  ('0x' || substring(md5(x), 1, 15))::BIGINT

Why not xxhash64/murmur: Spark's builtins are fast but engine-specific —
an oracle in another engine could never reproduce them, and cross-system
reproducibility of dedup decisions is a correctness property for a pipeline
whose output (the kept corpus) must be auditable.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX_DIGITS = 15  # 60 bits < 2^63


def portable_hash64(col: Column, salt: str = "", start: int = 1) -> Column:
    """start=1 uses hex digits [1,15]; start=16 uses [16,30] — one md5 call
    yields TWO independent 60-bit hashes (md5 bits are independent), halving
    hash work for multi-hash schemes like MinHash."""
    base = F.concat(col, F.lit(salt)) if salt else col
    return F.conv(F.substring(F.md5(base), start, HEX_DIGITS), 16, 10).cast("bigint")


def sql_hash64(expr: str, salt: str = "", start: int = 1) -> str:
    """DuckDB rendering of the same hash (oracle side)."""
    base = f"({expr} || '{salt}')" if salt else expr
    return f"('0x' || substring(md5({base}), {start}, {HEX_DIGITS}))::BIGINT"


def py_hash64(s: str, salt: str = "", start: int = 1) -> int:
    """Python rendering (unit tests / single-process oracle)."""
    hx = hashlib.md5((s + salt).encode("utf-8")).hexdigest()
    return int(hx[start - 1 : start - 1 + HEX_DIGITS], 16)
