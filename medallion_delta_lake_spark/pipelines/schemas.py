"""Declared ingestion schemas for the medallion pipeline's raw feeds
(SURVEY.md §1: explicit StructType per source, inference only as a
fallback — at 100 TB an inferSchema pass is a full extra scan, and a
drifting inferred type silently corrupts downstream merges).

Column sets per FIXTURES.md; types are what the reference's
inferSchema ingestion (bronze_table_creation.py:25) produces, declared.
"""

from __future__ import annotations

from pyspark.sql.types import (
    DateType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _s(*fields: tuple[str, object]) -> StructType:
    return StructType([StructField(n, t()) for n, t in fields])


TRAIN = _s(
    ("row_id", LongType),
    ("county", IntegerType),
    ("is_business", IntegerType),
    ("product_type", IntegerType),
    ("target", DoubleType),
    ("is_consumption", IntegerType),
    ("datetime", TimestampType),
    ("data_block_id", IntegerType),
    ("prediction_unit_id", IntegerType),
)

CLIENT = _s(
    ("product_type", IntegerType),
    ("county", IntegerType),
    ("eic_count", IntegerType),
    ("installed_capacity", DoubleType),
    ("is_business", IntegerType),
    ("date", DateType),
    ("data_block_id", IntegerType),
)

ELECTRICITY_PRICES = _s(
    ("forecast_date", TimestampType),
    ("euros_per_mwh", DoubleType),
    ("origin_date", TimestampType),
    ("data_block_id", IntegerType),
)

GAS_PRICES = _s(
    ("forecast_date", DateType),
    ("lowest_price_per_mwh", DoubleType),
    ("highest_price_per_mwh", DoubleType),
    ("origin_date", DateType),
    ("data_block_id", IntegerType),
)

HISTORICAL_WEATHER = _s(
    ("datetime", TimestampType),
    ("latitude", DoubleType),
    ("longitude", DoubleType),
    ("temperature", DoubleType),
    ("dewpoint", DoubleType),
    ("rain", DoubleType),
    ("snowfall", DoubleType),
    ("surface_pressure", DoubleType),
    ("cloudcover_total", DoubleType),
    ("windspeed_10m", DoubleType),
    ("data_block_id", IntegerType),
)

FORECAST_WEATHER = _s(
    ("latitude", DoubleType),
    ("longitude", DoubleType),
    ("origin_datetime", TimestampType),
    ("hours_ahead", IntegerType),
    ("forecast_datetime", TimestampType),
    ("temperature", DoubleType),
    ("dewpoint", DoubleType),
    ("snowfall", DoubleType),
    ("cloudcover_total", DoubleType),
    ("data_block_id", IntegerType),
)

STATION_MAP = _s(
    ("county_name", StringType),
    ("longitude", DoubleType),
    ("latitude", DoubleType),
    ("county", IntegerType),
)

CSV_SCHEMAS: dict[str, StructType] = {
    "train": TRAIN,
    "client": CLIENT,
    "electricity_prices": ELECTRICITY_PRICES,
    "gas_prices": GAS_PRICES,
    "historical_weather": HISTORICAL_WEATHER,
    "forecast_weather": FORECAST_WEATHER,
}
