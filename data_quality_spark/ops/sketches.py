"""Distributed cardinality sketches for corpus telemetry.

COUNT(DISTINCT x) GROUP BY k is the classic web-corpus scale trap: Spark
plans it as an expand + exact distinct aggregation whose state is
O(distinct values) per group — at 100 TB (10^11 urls over 10^8 hosts)
that state IS the dataset. The HyperLogLog path here keeps per-group
state at exactly m=64 small ints, shuffles (key, bucket, rho) int rows
only, and partial-aggregates map-side, so per-host distinct-URL
telemetry costs one ordinary aggregation regardless of cardinality.

DETERMINISM (the repo-wide sketch contract, same as graph.harmonic_hll):
registers derive from portable md5 string ops (graph._hll_bucket_rho),
the register state collapses to the exact bigint S = Σ_j 2^(56-reg_j)
(order-independent integer sum — bit-identical under any partitioning),
and the only float, E = C/S, is one IEEE division computed by the same
expression in Spark and the DuckDB oracle twin. A sketch op that is
hash-exact under the correctness gate.

Estimator: RAW HLL (E = α·m²·2^56 / S in integer units; no
linear-counting or large-range correction — those need ln(), which is
not bit-portable across engines). m=64 gives ~13% standard error; the
regime is group cardinalities ≥ ~10³, with exact countDistinct as the
verification tier at test scale (tests pin the relative error).

Reference ancestor: extension tier (the reference has no sketches); the
shuffle discipline mirrors checks/values_duplicate.py — keys, never
payloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_quality_spark.ops.graph import (
    HLL_EST_C,
    HLL_M,
    HLL_RHO_CAP,
    _hll_bucket_rho,
)


def distinct_hll(
    df: DataFrame,
    key_cols,
    value_col: str,
) -> DataFrame:
    """Approximate COUNT(DISTINCT value_col) per key group.

    Two-level aggregation, both map-side-combining:
      1. groupBy(key, bucket).max(rho)      — rows are (key, int, int)
      2. groupBy(key): S = Σ_present 2^(56-rho) + (64-present)·2^56
         (absent registers are rho=0 — added arithmetically instead of
         materializing a 64-row grid per group)

    Returns key columns + `s_units` (exact bigint register state) +
    `distinct_est` (raw-HLL double). NULL values are skipped (SQL
    COUNT(DISTINCT) semantics); a group with only NULLs never appears.
    """
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    bucket, rho = _hll_bucket_rho(F.col(value_col))
    reg = (
        df.where(F.col(value_col).isNotNull())
        .select(*key_cols, bucket.alias("__b"), rho.alias("__r"))
        .groupBy(*key_cols, "__b")
        .agg(F.max("__r").alias("__r"))
    )
    pow2 = F.pow(F.lit(2.0), F.lit(HLL_RHO_CAP) - F.col("__r")).cast("bigint")
    s = (
        F.sum(pow2)
        + (F.lit(HLL_M) - F.count(F.lit(1)))
        * F.lit(2 ** HLL_RHO_CAP).cast("bigint")
    ).cast("bigint")
    return (
        reg.groupBy(*key_cols)
        .agg(s.alias("s_units"))
        .select(
            *key_cols,
            "s_units",
            (F.lit(HLL_EST_C) / F.col("s_units").cast("double")).alias(
                "distinct_est"
            ),
        )
    )


def sql_distinct_hll(rows_sql: str, key_cols, value_col: str) -> str:
    """DuckDB twin of distinct_hll over `rows_sql` (must yield the key
    columns and `value_col`). Same md5 register derivation as
    graph.sql_harmonic_hll, same arithmetic absent-register fold."""
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    keys = ", ".join(key_cols)
    cap, m, c = HLL_RHO_CAP, HLL_M, HLL_EST_C
    v = value_col
    rho = f"""
      least(4 * (15 - length(regexp_replace(substring(md5({v}), 16, 15),
                                            '^0+', ''))) +
            CASE substring(regexp_replace(substring(md5({v}), 16, 15),
                                          '^0+', ''), 1, 1)
              WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
              WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1
              WHEN '7' THEN 1 ELSE 0 END + 1, {cap})"""
    return f"""
WITH rows_in AS ({rows_sql}),
reg AS (
  SELECT {keys},
         (('0x' || substring(md5({v}), 1, 15))::BIGINT % {m})::INT AS b,
         max(({rho})::INT) AS r
  FROM rows_in WHERE {v} IS NOT NULL
  GROUP BY ALL
),
st AS (
  SELECT {keys},
         (sum((1::BIGINT << ({cap} - r)))
          + ({m} - count(*)) * (1::BIGINT << {cap}))::BIGINT AS s_units
  FROM reg GROUP BY {keys}
)
SELECT {keys}, s_units, {c!r} / s_units::DOUBLE AS distinct_est
FROM st
"""
