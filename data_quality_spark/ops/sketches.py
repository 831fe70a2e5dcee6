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


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005) — token-frequency
# estimation whose state is a fixed d×w integer table instead of the
# O(vocabulary) exact groupBy. The corpus-frequency companion of the HLL
# op above: HLL answers "how many distinct", CMS answers "how often is X".
# ---------------------------------------------------------------------------

CMS_D = 4     # hash rows: P(overestimate > eps) decays as 2^-d
CMS_W = 512   # buckets per row: eps ~= e / w of total token mass


def token_cms(
    df: DataFrame, text_col: str, d: int = CMS_D, w: int = CMS_W
) -> DataFrame:
    """d×w Count-Min table over whitespace tokens of `text_col`.

    One token explode, then each token emits d (row, bucket) int pairs
    (bucket_r = portable md5 hash of token salted by row, mod w) into
    ONE groupBy sum. The pair stream is d× the token count but consists
    of two ints, and partial aggregation collapses it to ≤ d·w rows PER
    PARTITION before the exchange — the shuffle is O(d·w·partitions)
    regardless of corpus size, and the result is ≤ d·w rows. Counts are
    exact integers (bit-portable; the DuckDB twin builds the identical
    table). Returns (r, b, cnt) with absent buckets omitted (= 0).
    """
    toks = df.where(F.col(text_col).isNotNull()).select(
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(r"\S+"), F.lit(0))
        ).alias("__tok")
    )
    from data_quality_spark.ops.hashing import portable_hash64

    pairs = toks.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        (portable_hash64(F.col("__tok"), salt=f"|cms{r}") % w)
                        .cast("int")
                        .alias("b"),
                    )
                    for r in range(d)
                ]
            )
        ).alias("__p")
    ).select("__p.r", "__p.b")
    return pairs.groupBy("r", "b").agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(
    sketch: DataFrame, tokens, d: int = CMS_D, w: int = CMS_W
) -> DataFrame:
    """Point-frequency estimates for candidate `tokens` (a driver-side
    list — heavy-hitter candidates come from a cheap local pass or a
    curated probe list): est(tok) = min over the d rows of the table
    cell the token hashes to (absent cell = 0). The candidate frame is
    d·|tokens| tiny rows — broadcast side of the join; the sketch never
    exceeds d·w rows. Never underestimates; overestimates by at most
    the documented eps·mass bound."""
    from data_quality_spark.ops.hashing import py_hash64

    spark = sketch.sparkSession
    cand = spark.createDataFrame(
        [
            (tok, r, py_hash64(tok, salt=f"|cms{r}") % w)
            for tok in tokens
            for r in range(d)
        ],
        "token string, r int, b int",
    )
    return (
        cand.join(F.broadcast(sketch), ["r", "b"], "left")
        .groupBy("token")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def sql_token_cms(
    docs_sql: str, text_col: str, d: int = CMS_D, w: int = CMS_W
) -> str:
    """DuckDB twin of token_cms over `docs_sql` (must yield text_col)."""
    from data_quality_spark.ops.hashing import HEX_DIGITS

    return f"""
WITH docs AS ({docs_sql}),
toks AS (
  SELECT unnest(regexp_extract_all({text_col}, '\\S+')) AS tok
  FROM docs WHERE {text_col} IS NOT NULL
),
pairs AS (
  SELECT t.range::INT AS r,
         ((('0x' || substring(md5(tok || '|cms' || t.range), 1, {HEX_DIGITS}))::BIGINT
           % {w}))::INT AS b
  FROM toks, range({d}) t
)
SELECT r, b, count(*)::BIGINT AS cnt FROM pairs GROUP BY r, b
"""


def sql_cms_estimate(
    sketch_sql: str, tokens, d: int = CMS_D, w: int = CMS_W
) -> str:
    """DuckDB twin of cms_estimate (candidate buckets rendered as the
    same python-computed literals)."""
    from data_quality_spark.ops.hashing import py_hash64

    rows = ", ".join(
        f"('{tok}', {r}, {py_hash64(tok, salt=f'|cms{r}') % w})"
        for tok in tokens
        for r in range(d)
    )
    return f"""
WITH sk AS ({sketch_sql}),
cand(token, r, b) AS (VALUES {rows})
SELECT token, min(coalesce(sk.cnt, 0))::BIGINT AS est
FROM cand LEFT JOIN sk ON sk.r = cand.r AND sk.b = cand.b
GROUP BY token
"""
