"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: single-pass per-rule quality metrics over the
documents table at sf0.001 (the engine's headline shape: k rules, ONE scan).

``queries()`` / ``oracle_sql()`` — one entry per implemented operator from
SURVEY.md §2, each with a DuckDB-runnable ANSI-SQL oracle producing identical
column names and values.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _configure(spark: SparkSession) -> SparkSession:
    # reference semantics: invalid casts yield NULL (never error) — Spark 4
    # defaults ANSI on, so flip it off for engine parity (SURVEY.md §1.2).
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from data_quality_spark.queries import q_rule_metrics

    _configure(spark)
    return q_rule_metrics(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from data_quality_spark import queries as Q
    from data_quality_spark import queries_ops as QO

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            return fn(_configure(spark), sf_dir)

        return run

    out = {name: wrap(fn) for name, fn in Q.CHECK_QUERIES.items()}
    out.update({name: wrap(fn) for name, fn in QO.OPS_QUERIES.items()})
    return out


def oracle_sql() -> dict[str, str]:
    from data_quality_spark import queries as Q
    from data_quality_spark import queries_ops as QO

    out = dict(Q.CHECK_ORACLES)
    out.update(QO.OPS_ORACLES)
    return out
