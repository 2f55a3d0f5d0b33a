"""Query registry: op-id → (PySpark callable, optional DuckDB oracle SQL).

This is the correctness face of the engine (SURVEY.md §5.1): every
operator claimed in SURVEY.md §2 registers a query over the driver
testdata plus an ANSI-SQL oracle. ``__spark_entry__.py`` re-exports it.

Float-determinism contract used throughout (so order-insensitive
value-hash comparison against DuckDB is exact, not approximate):

- SUM/AVG over doubles accumulate in DECIMAL(38,6) — decimal addition
  is exact and associative, so the result does not depend on row order,
  partitioning, or engine; the final value is cast back to DOUBLE.
- Per-row double arithmetic (x*(1-d), abs(a-b), ratios) is fine as-is:
  IEEE-754 ops on identical inputs are bit-identical in any engine.
- ROUND on non-integer doubles is avoided (Spark rounds the shortest
  decimal repr HALF_UP, DuckDB rounds the binary value — they disagree
  on values like 123.45); rounding only ever applies to exactly
  representable inputs (integers, halves). The same split applies to
  double→DECIMAL casts, so full-precision doubles are never cast to
  decimal either.
- A k-term reduction over per-row DOUBLES (one per group/cell) is
  order-sensitive. k ≤ ~17: sum in a SUM() OVER (ORDER BY key ROWS
  UNBOUNDED PRECEDING) window + MAX (sequential in both engines).
  Larger k: DuckDB's windowed SUM reassociates (segment tree), so
  quantize each term via floor(x·10^s)→BIGINT (floor of the identical
  double is exact in both engines) and sum the integers — exact in
  any order; divide by 10^s once at the close.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register an op-id. ``oracle=None`` → driver does a rows-only check
    (reserved for genuinely non-SQL-expressible / approximate ops)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a testdata table.

    ``events.parquet``'s ``ts`` column has shipped in three physical
    encodings across testdata regenerations; normalize every one to a
    session-tz TIMESTAMP so downstream plans (and ``withWatermark``,
    which rejects TIMESTAMP_NTZ) see a single stable type:

    - TIMESTAMP(NANOS) → read nanos as long (legacy conf; Spark 4
      rejects nanos otherwise) and convert with integer division
      (float division would lose precision — epoch-nanos exceed 2^53).
      DuckDB truncates nanos→micros the same way, so oracles stay exact.
    - TIMESTAMP(MICROS) without timezone → Spark TIMESTAMP_NTZ; cast to
      TIMESTAMP. The session tz is pinned UTC, so wall-clock values are
      unchanged and match the naive DuckDB oracle bit-for-bit.
    - TIMESTAMP(MICROS) with UTC timezone → already the target type.
    """
    # pin UTC so timestamp values match the (naive-UTC) DuckDB oracle even
    # when the harness session was built without our get_spark() defaults
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        return _normalize_event_time(df)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _normalize_event_time(df: DataFrame) -> DataFrame:
    """Coerce the events ``ts`` column to TIMESTAMP regardless of how the
    parquet encoded it (ns-int64 / us-NTZ / us-TZ). See ``table``."""
    from pyspark.sql import functions as F

    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df
