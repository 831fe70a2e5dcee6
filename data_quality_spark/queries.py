"""Driver-contract queries: one per operator (SURVEY.md §2), each with a
DuckDB oracle SQL string producing identical (column-name-aligned) results.

Every query goes through the engine's Rule factories — the correctness gate
exercises the same code paths users run, not ad-hoc DataFrame code.

Queries on columns with no real faults synthesize a derived column with
deterministic injected faults (e.g. ``doc_id % 7 = 0 → NULL``) so each
operator is tested with a MIXED KO/OK outcome — the reference's golden
corpus does the same with hand-marked rows (test_df.xlsx).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_quality_spark.rules import checks as C
from data_quality_spark.rules.core import RuleEngine, is_empty, not_empty


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _ko_rows(df: DataFrame, rule, cols: list) -> DataFrame:
    eng = RuleEngine([rule])
    return eng.flags(df).where(F.col(f"__ko_{rule.rule_id}")).select(*cols)


def _verdict(df: DataFrame, rule) -> DataFrame:
    """Count-by-verdict — the reference's core count query
    (check.py:84-108: CASE WHEN <filter> THEN 'KO' ELSE 'OK' + GROUP BY)."""
    eng = RuleEngine([rule])
    flagged = eng.flags(df)
    return (
        flagged.select(
            F.when(F.col(f"__ko_{rule.rule_id}"), "KO").otherwise("OK").alias("verdict")
        )
        .groupBy("verdict")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# 1 — index not null (NULL ∪ '' semantics)
# ---------------------------------------------------------------------------


def q_index_not_null(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").withColumn(
        "idx",
        F.when(F.col("doc_id") % 7 == 0, F.lit(None).cast("string"))
        .when(F.col("doc_id") % 11 == 0, F.lit(""))
        .otherwise(F.col("doc_id").cast("string")),
    )
    rule = C.index_not_null("idx")
    return _ko_rows(docs, rule, ["doc_id"])


SQL_INDEX_NOT_NULL = """
SELECT doc_id FROM (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN NULL
              WHEN doc_id % 11 = 0 THEN ''
              ELSE CAST(doc_id AS VARCHAR) END AS idx
  FROM documents
) WHERE idx IS NULL OR CAST(idx AS VARCHAR) = ''
"""


# ---------------------------------------------------------------------------
# 2 — duplicate count: n_ko = count(*) − count(distinct) (values_duplicate.py:24-38)
# ---------------------------------------------------------------------------


def q_duplicate_count(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.where(not_empty("l_orderkey")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct(F.col("l_orderkey").cast("string")).alias("n_distinct"),
        (F.count(F.lit(1)) - F.countDistinct(F.col("l_orderkey").cast("string"))).alias(
            "n_ko"
        ),
    )


SQL_DUPLICATE_COUNT = """
SELECT count(*) AS n_rows,
       count(DISTINCT CAST(l_orderkey AS VARCHAR)) AS n_distinct,
       count(*) - count(DISTINCT CAST(l_orderkey AS VARCHAR)) AS n_ko
FROM lineitem
WHERE l_orderkey IS NOT NULL AND CAST(l_orderkey AS VARCHAR) <> ''
"""


# ---------------------------------------------------------------------------
# 3 — duplicate rows: all members of dup groups (window count > 1)
# ---------------------------------------------------------------------------


def q_duplicate_rows(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    rule = C.duplicate_values("props")
    return _ko_rows(ev, rule, ["event_id", "props"])


SQL_DUPLICATE_ROWS = """
SELECT event_id, props FROM (
  SELECT event_id, props,
         count(*) OVER (PARTITION BY CAST(props AS VARCHAR)) AS c
  FROM events
  WHERE props IS NOT NULL AND CAST(props AS VARCHAR) <> ''
) WHERE c > 1
"""


# ---------------------------------------------------------------------------
# 4 — not-empty column (verdict counts over injected empties)
# ---------------------------------------------------------------------------


def q_not_empty(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").withColumn(
        "etype",
        F.when(F.col("event_id") % 13 == 0, F.lit(None).cast("string"))
        .when(F.col("event_id") % 17 == 0, F.lit(""))
        .otherwise(F.col("event_type")),
    )
    return _verdict(ev, C.not_empty_column("etype"))


SQL_NOT_EMPTY = """
SELECT CASE WHEN etype IS NULL OR CAST(etype AS VARCHAR) = '' THEN 'KO' ELSE 'OK' END AS verdict,
       count(*) AS n
FROM (
  SELECT CASE WHEN event_id % 13 = 0 THEN NULL
              WHEN event_id % 17 = 0 THEN ''
              ELSE event_type END AS etype
  FROM events
) GROUP BY 1
"""


# ---------------------------------------------------------------------------
# 5 — datetime format (mixed-format strings; try-parse null = KO)
# ---------------------------------------------------------------------------


def q_datetime_format(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").withColumn(
        "ts_str",
        F.when(F.col("event_id") % 2 == 0, F.date_format("ts", "yyyy/MM/dd")).otherwise(
            F.date_format("ts", "dd-MM-yyyy")
        ),
    )
    rule = C.datetime_format("ts_str", "yyyy/MM/dd")
    return _ko_rows(ev, rule, ["event_id", "ts_str"])


SQL_DATETIME_FORMAT = """
SELECT event_id, ts_str FROM (
  SELECT event_id,
         CASE WHEN event_id % 2 = 0 THEN strftime(ts, '%Y/%m/%d')
              ELSE strftime(ts, '%d-%m-%Y') END AS ts_str
  FROM events
) WHERE ts_str IS NOT NULL AND ts_str <> ''
    AND try_strptime(ts_str, '%Y/%m/%d') IS NULL
"""


# ---------------------------------------------------------------------------
# 6 — between values (column_between_values.py:38-51)
# ---------------------------------------------------------------------------


def q_between_values(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    rule = C.between_values("l_quantity", 5, 45)
    return _ko_rows(li, rule, ["l_orderkey", "l_linenumber", "l_quantity"])


SQL_BETWEEN_VALUES = """
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem
WHERE l_quantity IS NOT NULL AND CAST(l_quantity AS VARCHAR) <> ''
  AND (TRY_CAST(CAST(l_quantity AS VARCHAR) AS DOUBLE) < 5
       OR TRY_CAST(CAST(l_quantity AS VARCHAR) AS DOUBLE) > 45)
"""


# ---------------------------------------------------------------------------
# 7 — between dates
# ---------------------------------------------------------------------------


def q_between_dates(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    rule = C.between_dates("o_orderdate", None, "1995-06-01", "1997-12-31")
    return _verdict(o, rule)


SQL_BETWEEN_DATES = """
SELECT CASE WHEN o_orderdate IS NOT NULL
             AND (o_orderdate < TIMESTAMP '1995-06-01'
                  OR o_orderdate > TIMESTAMP '1997-12-31')
            THEN 'KO' ELSE 'OK' END AS verdict,
       count(*) AS n
FROM orders GROUP BY 1
"""


# ---------------------------------------------------------------------------
# 8 — dates order (strict, over a joined two-date frame)
# ---------------------------------------------------------------------------


def q_dates_order(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    j = li.join(o, li.l_orderkey == o.o_orderkey, "inner")
    rule = C.dates_order(["o_orderdate", "l_shipdate"], strictly_ascending=True)
    return _verdict(j, rule)


SQL_DATES_ORDER = """
SELECT CASE WHEN coalesce(o_orderdate >= l_shipdate, false) THEN 'KO' ELSE 'OK' END AS verdict,
       count(*) AS n
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# 9 — values order (non-strict: l_discount <= l_tax expected)
# ---------------------------------------------------------------------------


def q_values_order(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    rule = C.values_order(["l_discount", "l_tax"])
    return _ko_rows(li, rule, ["l_orderkey", "l_linenumber", "l_discount", "l_tax"])


SQL_VALUES_ORDER = """
SELECT l_orderkey, l_linenumber, l_discount, l_tax
FROM lineitem
WHERE coalesce(TRY_CAST(CAST(l_discount AS VARCHAR) AS DOUBLE)
               > TRY_CAST(CAST(l_tax AS VARCHAR) AS DOUBLE), false)
"""


# ---------------------------------------------------------------------------
# 10 — values in list
# ---------------------------------------------------------------------------


def q_values_in_list(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    rule = C.values_in_list(
        "c_mktsegment", ["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD"]
    )
    return _ko_rows(c, rule, ["c_custkey", "c_mktsegment"])


SQL_VALUES_IN_LIST = """
SELECT c_custkey, c_mktsegment
FROM customer
WHERE c_mktsegment IS NOT NULL AND CAST(c_mktsegment AS VARCHAR) <> ''
  AND CAST(c_mktsegment AS VARCHAR) NOT IN ('BUILDING','AUTOMOBILE','MACHINERY','HOUSEHOLD')
"""


# ---------------------------------------------------------------------------
# 11 — match regex (violation = does NOT match)
# ---------------------------------------------------------------------------


def q_match_regex(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    rule = C.match_regex("text", "data")
    return _ko_rows(d, rule, ["doc_id"])


SQL_MATCH_REGEX = """
SELECT doc_id FROM documents
WHERE text IS NOT NULL AND text <> '' AND NOT regexp_matches(text, 'data')
"""


# ---------------------------------------------------------------------------
# 12 — custom condition
# ---------------------------------------------------------------------------


def q_custom_condition(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    rule = C.custom_condition("o_totalprice > 150000 AND o_orderstatus = 'O'")
    return _ko_rows(o, rule, ["o_orderkey"])


SQL_CUSTOM_CONDITION = """
SELECT o_orderkey FROM orders WHERE o_totalprice > 150000 AND o_orderstatus = 'O'
"""


# ---------------------------------------------------------------------------
# 13 — match dimension table (broadcast anti-join on string-cast keys)
# ---------------------------------------------------------------------------


def q_match_dimension(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    dim = _t(spark, sf_dir, "nation").where(F.col("n_regionkey") < 4)
    rule = C.match_dimension(dim, "c_nationkey", "n_nationkey")
    return _ko_rows(cust, rule, ["c_custkey", "c_nationkey"])


SQL_MATCH_DIMENSION = """
SELECT c_custkey, c_nationkey FROM customer
WHERE c_nationkey IS NOT NULL AND CAST(c_nationkey AS VARCHAR) <> ''
  AND CAST(c_nationkey AS VARCHAR) NOT IN
      (SELECT CAST(n_nationkey AS VARCHAR) FROM nation WHERE n_regionkey < 4)
"""


# ---------------------------------------------------------------------------
# 13b — match dimension with a FLOAT foreign key: double 7.0 must match dim
#       key '7' (reference float-key normalization, utils.py:121-125 — its
#       BigQuery dim tests depend on this, test_check_bigquery.py:251-291)
# ---------------------------------------------------------------------------


def q_match_dimension_floatkey(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").withColumn(
        "suppkey_dbl", F.col("l_suppkey").cast("double")
    )
    dim = _t(spark, sf_dir, "supplier").where(F.col("s_suppkey") % 5 != 0)
    rule = C.match_dimension(dim, "suppkey_dbl", "s_suppkey")
    return _ko_rows(li, rule, ["l_orderkey", "l_linenumber", "suppkey_dbl"])


_SQL_NORM = (
    r"regexp_replace(regexp_replace({k}, '\.([0-9]*[1-9])0+$', '.\1'),"
    r" '\.0+$', '')"
)

SQL_MATCH_DIMENSION_FLOATKEY = f"""
SELECT l_orderkey, l_linenumber, CAST(l_suppkey AS DOUBLE) AS suppkey_dbl
FROM lineitem
WHERE l_suppkey IS NOT NULL
  AND {_SQL_NORM.format(k="CAST(CAST(l_suppkey AS DOUBLE) AS VARCHAR)")} NOT IN (
      SELECT {_SQL_NORM.format(k="CAST(s_suppkey AS VARCHAR)")}
      FROM supplier WHERE s_suppkey % 5 <> 0)
"""


# ---------------------------------------------------------------------------
# 14 — dates order vs dimension (lineitem.l_shipdate >= orders.o_orderdate)
# ---------------------------------------------------------------------------


def q_dates_order_dim(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    rule = C.dates_order_dimension(
        o, "l_orderkey", "o_orderkey", "l_shipdate", "o_orderdate", ">="
    )
    return _ko_rows(li, rule, ["l_orderkey", "l_linenumber", "l_shipdate", "o_orderdate"])


SQL_DATES_ORDER_DIM = """
SELECT l.l_orderkey, l.l_linenumber, l.l_shipdate, o.o_orderdate
FROM lineitem l LEFT JOIN orders o ON CAST(l.l_orderkey AS VARCHAR) = CAST(o.o_orderkey AS VARCHAR)
WHERE coalesce(NOT (l.l_shipdate >= o.o_orderdate), false)
"""


# ---------------------------------------------------------------------------
# 15 — values order vs dimension (l_quantity <= p_size)
# ---------------------------------------------------------------------------


def q_values_order_dim(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    rule = C.values_order_dimension(p, "l_partkey", "p_partkey", "l_quantity", "p_size", "<=")
    return _ko_rows(li, rule, ["l_orderkey", "l_linenumber", "l_quantity", "p_size"])


SQL_VALUES_ORDER_DIM = """
SELECT l.l_orderkey, l.l_linenumber, l.l_quantity, p.p_size
FROM lineitem l LEFT JOIN part p ON CAST(l.l_partkey AS VARCHAR) = CAST(p.p_partkey AS VARCHAR)
WHERE coalesce(NOT (TRY_CAST(CAST(l.l_quantity AS VARCHAR) AS DOUBLE)
                    <= TRY_CAST(CAST(p.p_size AS VARCHAR) AS DOUBLE)), false)
"""


# ---------------------------------------------------------------------------
# 16 — period intersection (lag/lead window per user)
# ---------------------------------------------------------------------------


def q_period_intersection(spark, sf_dir):
    ev = (
        _t(spark, sf_dir, "events")
        .withColumn(
            "end_ts",
            F.expr("timestampadd(MINUTE, CAST(FLOOR(value) AS INT) % 60 + 1, ts)"),
        )
        .withColumnRenamed("ts", "start_ts")
    )
    rule = C.period_intersection(
        "start_ts", "end_ts", id_columns="user_id", tiebreak_cols=["event_id"]
    )
    return _ko_rows(ev, rule, ["event_id", "user_id"])


SQL_PERIOD_INTERSECTION = """
WITH periods AS (
  SELECT event_id, user_id, ts AS start_ts,
         ts + INTERVAL 1 MINUTE * (CAST(FLOOR(value) AS INT) % 60 + 1) AS end_ts
  FROM events
), flagged AS (
  SELECT event_id, user_id, start_ts, end_ts,
         coalesce(lag(end_ts) OVER w > start_ts, false) AS chk
  FROM periods
  WINDOW w AS (PARTITION BY CAST(user_id AS VARCHAR) ORDER BY start_ts, end_ts, event_id)
), doubled AS (
  SELECT event_id, user_id,
         chk OR coalesce(lead(chk) OVER w2, false) AS double_chk
  FROM flagged
  WINDOW w2 AS (PARTITION BY CAST(user_id AS VARCHAR) ORDER BY start_ts, end_ts, event_id)
)
SELECT event_id, user_id FROM doubled WHERE double_chk
"""


# ---------------------------------------------------------------------------
# 17 — composite: single-pass per-rule metrics (the engine's headline shape)
# ---------------------------------------------------------------------------


def _doc_rules():
    return [
        C.not_empty_column("text", rule_id="text_not_empty"),
        C.between_values("n_chars", 100, 500, rule_id="length_bounds"),
        C.values_in_list("lang", ["en", "de", "fr", "es", "zh"], rule_id="lang_allowed"),
        C.match_regex("text", "data", rule_id="mentions_data"),
        C.custom_condition("n_chars <> length(text)", rule_id="n_chars_consistent"),
    ]


def q_rule_metrics(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    eng = RuleEngine(_doc_rules())
    return eng.metrics(d).select("rule_id", "n_ko", "n_rows")


SQL_RULE_METRICS = """
WITH flags AS (
  SELECT
    CASE WHEN text IS NULL OR text = '' THEN 1 ELSE 0 END AS f_text_not_empty,
    CASE WHEN text IS NOT NULL AND CAST(n_chars AS VARCHAR) <> ''
          AND coalesce(TRY_CAST(CAST(n_chars AS VARCHAR) AS DOUBLE) < 100
                       OR TRY_CAST(CAST(n_chars AS VARCHAR) AS DOUBLE) > 500, false)
         THEN 1 ELSE 0 END AS f_length_bounds,
    CASE WHEN lang IS NOT NULL AND lang <> ''
          AND lang NOT IN ('en','de','fr','es','zh') THEN 1 ELSE 0 END AS f_lang_allowed,
    CASE WHEN text IS NOT NULL AND text <> '' AND NOT regexp_matches(text,'data')
         THEN 1 ELSE 0 END AS f_mentions_data,
    CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END AS f_n_chars_consistent
  FROM documents
)
SELECT 'text_not_empty' AS rule_id, CAST(sum(f_text_not_empty) AS BIGINT) AS n_ko, count(*) AS n_rows FROM flags
UNION ALL SELECT 'length_bounds', CAST(sum(f_length_bounds) AS BIGINT), count(*) FROM flags
UNION ALL SELECT 'lang_allowed', CAST(sum(f_lang_allowed) AS BIGINT), count(*) FROM flags
UNION ALL SELECT 'mentions_data', CAST(sum(f_mentions_data) AS BIGINT), count(*) FROM flags
UNION ALL SELECT 'n_chars_consistent', CAST(sum(f_n_chars_consistent) AS BIGINT), count(*) FROM flags
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

CHECK_QUERIES = {
    "index_not_null": q_index_not_null,
    "duplicate_count": q_duplicate_count,
    "duplicate_rows": q_duplicate_rows,
    "not_empty": q_not_empty,
    "datetime_format": q_datetime_format,
    "between_values": q_between_values,
    "between_dates": q_between_dates,
    "dates_order": q_dates_order,
    "values_order": q_values_order,
    "values_in_list": q_values_in_list,
    "match_regex": q_match_regex,
    "custom_condition": q_custom_condition,
    "match_dimension": q_match_dimension,
    "match_dimension_floatkey": q_match_dimension_floatkey,
    "dates_order_dim": q_dates_order_dim,
    "values_order_dim": q_values_order_dim,
    "period_intersection": q_period_intersection,
    "rule_metrics": q_rule_metrics,
}

CHECK_ORACLES = {
    "index_not_null": SQL_INDEX_NOT_NULL,
    "duplicate_count": SQL_DUPLICATE_COUNT,
    "duplicate_rows": SQL_DUPLICATE_ROWS,
    "not_empty": SQL_NOT_EMPTY,
    "datetime_format": SQL_DATETIME_FORMAT,
    "between_values": SQL_BETWEEN_VALUES,
    "between_dates": SQL_BETWEEN_DATES,
    "dates_order": SQL_DATES_ORDER,
    "values_order": SQL_VALUES_ORDER,
    "values_in_list": SQL_VALUES_IN_LIST,
    "match_regex": SQL_MATCH_REGEX,
    "custom_condition": SQL_CUSTOM_CONDITION,
    "match_dimension": SQL_MATCH_DIMENSION,
    "match_dimension_floatkey": SQL_MATCH_DIMENSION_FLOATKEY,
    "dates_order_dim": SQL_DATES_ORDER_DIM,
    "values_order_dim": SQL_VALUES_ORDER_DIM,
    "period_intersection": SQL_PERIOD_INTERSECTION,
    "rule_metrics": SQL_RULE_METRICS,
}
