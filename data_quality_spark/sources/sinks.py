"""Output-table sink seam: Iceberg snapshots when the runtime is on the
classpath, parquet + manifest otherwise.

The reference's deployment model is warehouse tables (reference
sources.py:41-88 hands dialect-specific tables to the check engine); the
north-star deployment for THIS engine is an Iceberg lakehouse — snapshot
isolation gives the pipeline's resume/metrics writes atomic commits and
time travel for free. The sandbox ships no iceberg-spark-runtime jar, so
the capability is PROBED at runtime (JVM class lookup, no import games):
present → ``writeTo(...).using("iceberg")`` v2 writes; absent → the
parquet path the rest of the pipeline already uses. Callers get one
function either way and can see which path they got.

Scale note: both paths are plain Spark writers — executors stream
partitions to the table; nothing here touches the driver beyond the
commit. Iceberg additionally prunes on partition transforms and rewrites
only changed files on dynamic overwrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the JVM classpath (the
    class the catalog plugin registers). A conf-only check would miss
    jars added without catalog config; a class probe cannot."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def write_output_table(
    df: DataFrame,
    target: str,
    fmt: str = "auto",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> str:
    """Write ``df`` to ``target`` and return the format actually used.

    fmt='auto': iceberg when the runtime is present AND ``target`` looks
    like a catalog table name (no path separator) — else parquet at the
    path. fmt='iceberg'/'parquet' force the choice (iceberg raises if the
    runtime is absent, loudly — never a silent downgrade of an explicit
    ask). mode: 'overwrite' | 'append'."""
    spark = df.sparkSession
    is_table_name = "/" not in target and "://" not in target
    if fmt == "auto":
        fmt = (
            "iceberg"
            if is_table_name and iceberg_available(spark)
            else "parquet"
        )
    if fmt == "iceberg":
        if not iceberg_available(spark):
            raise RuntimeError(
                "fmt='iceberg' requested but no Iceberg Spark runtime is on "
                "the classpath — add iceberg-spark-runtime to spark.jars "
                "or use fmt='parquet'."
            )
        writer = df.writeTo(target).using("iceberg")
        if partition_by:
            from pyspark.sql import functions as F

            writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
        return "iceberg"
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(target)
    return "parquet"


def read_output_table(
    spark: SparkSession, target: str, fmt: str = "auto"
) -> DataFrame:
    """Read back a table written by write_output_table."""
    is_table_name = "/" not in target and "://" not in target
    if fmt == "auto":
        fmt = (
            "iceberg"
            if is_table_name and iceberg_available(spark)
            else "parquet"
        )
    if fmt == "iceberg":
        return spark.read.format("iceberg").load(target)
    return spark.read.parquet(target)
