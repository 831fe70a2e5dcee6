"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_narrow(df: DataFrame, factor: int = 2) -> DataFrame:
    """Repartition a NARROW local input (1-2 parquet splits) so a following
    Arrow UDF stage parallelizes instead of serializing on one task. At
    scale the file splits already provide parallelism and this is a no-op
    (condition: existing partitions < defaultParallelism). Round-robin —
    callers needing a specific key distribution repartition themselves."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(factor * target)
    return df
