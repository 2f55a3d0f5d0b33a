"""Table registry.

The reference addresses every table as an f-string GCS path scattered
through scripts (e.g. silver_table_creation.py:28, gold_table_creation.py:26-31).
The engine replaces that with a tiny declarative registry: a ``TableRef``
carries the layer, path, natural key and partition column, so operators
(scan, upsert, pipeline) take a ``TableRef`` instead of path strings.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

#: canonical driver-testdata table names (TESTDATA.md)
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@dataclass(frozen=True)
class TableRef:
    """A named table: where it lives and how it is keyed/partitioned."""

    name: str
    path: str
    layer: str = "bronze"  # bronze | silver | gold
    keys: tuple[str, ...] = field(default=())
    partition_col: str | None = None
    fmt: str = "parquet"  # parquet | delta | csv | json

    def read(self, spark: SparkSession) -> DataFrame:
        from medallion_delta_lake_spark.sources.readers import scan

        return scan(spark, self.path, fmt=self.fmt)


def load_testdata(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load all driver-generated testdata tables from ``sf_dir``."""
    from medallion_delta_lake_spark.plans.registry import table

    return {name: table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def register_testdata_views(spark: SparkSession, sf_dir: str) -> None:
    """Register the testdata tables as temp views for spark.sql entry points."""
    for name, df in load_testdata(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
