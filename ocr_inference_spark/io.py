"""Thin table-IO abstraction: Iceberg when a catalog is configured,
plain Parquet otherwise (SURVEY.md §7 — the sandbox has no Iceberg
jars; the production path is the same API with format("iceberg")).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _has_iceberg(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.spark.SparkCatalog  # noqa: B018
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, ref: str) -> DataFrame:
    """ref: 'catalog.db.table' (Iceberg) or a parquet path."""
    if "/" not in ref and _has_iceberg(spark):
        return spark.read.format("iceberg").load(ref)
    return spark.read.parquet(ref)


def write_table(
    df: DataFrame,
    ref: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if "/" not in ref and _has_iceberg(df.sparkSession):
        writer.format("iceberg").saveAsTable(ref)
    else:
        writer.parquet(ref)
