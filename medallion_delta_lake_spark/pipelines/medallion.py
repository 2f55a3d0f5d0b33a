"""Generic medallion pipeline with the reference's shape.

Re-expresses alex-coward/medallion_delta_lake's bronze/silver/gold flow
(bronze_table_creation.py, silver_table_creation.py,
gold_table_creation.py) as engine-operator composition — one generic
clean→derive→upsert per silver table instead of seven hand-templated
scripts, and one gold wide-join builder. Differences from the
reference are deliberate (SURVEY.md §4 quirks): explicit schemas,
null-safe merge conditions, single-pass nn-assignment instead of the
driver-side geodesic loop, name-based unions.

Layout under ``base``: ``bronze/<table>``, ``silver/<table>``,
``gold/enefit``; every fact table hive-partitioned on
``data_block_id`` (the reference's batch-lineage dimension — partition
pruning on it is what keeps incremental re-runs reading one day, not
100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from medallion_delta_lake_spark.operators import agg, clean, derive, joins, upsert
from medallion_delta_lake_spark.sources import readers, writers

HIST_MEASURES = [
    "temperature",
    "dewpoint",
    "rain",
    "snowfall",
    "surface_pressure",
    "cloudcover_total",
    "windspeed_10m",
]
FCST_MEASURES = ["temperature", "dewpoint", "snowfall", "cloudcover_total"]

_CSV_TABLES = [
    "train",
    "client",
    "electricity_prices",
    "gas_prices",
    "historical_weather",
    "forecast_weather",
]


def bronze(spark: SparkSession, landing_dir: str, base: str) -> None:
    """Raw landing files → bronze tables (append + partition for facts,
    overwrite for dimensions; ref bronze_table_creation.py:24-61).
    Ingestion uses DECLARED schemas (pipelines/schemas.py) — the
    reference's inferSchema=True costs a full extra scan per feed and
    lets type drift through silently (SURVEY.md §1)."""
    from medallion_delta_lake_spark.pipelines import schemas

    for name in _CSV_TABLES:
        df = readers.scan_csv(
            spark,
            f"{landing_dir}/{name}.csv",
            schema=schemas.CSV_SCHEMAS[name],
        )
        writers.write_append(
            df, f"{base}/bronze/{name}", partition_col="data_block_id"
        )
    stations = readers.scan_csv(
        spark,
        f"{landing_dir}/weather_station_to_county_mapping.csv",
        schema=schemas.STATION_MAP,
    )
    writers.write_overwrite(stations, f"{base}/bronze/station_map")
    county = readers.scan_json(
        spark, f"{landing_dir}/county_id_to_name_map.json"
    )
    writers.write_overwrite(
        readers.melt_wide_map_row(county, "county_id", "county_name"),
        f"{base}/bronze/county_map",
    )


def _bronze_clean(spark: SparkSession, base: str, name: str) -> DataFrame:
    """Shared bronze hygiene: re-run dedup + null drop
    (ref silver_table_creation.py:31-35 et al.)."""
    df = readers.scan_table(spark, f"{base}/bronze/{name}")
    return clean.dropna_any(clean.dedup_full_row(df))


def silver_station_map(spark: SparkSession, base: str) -> None:
    """Station→county dimension: round coordinates to the join grid,
    then assign NULL-county stations to the nearest labeled station
    (DataFrame nn-assign replaces the reference's driver-side geodesic
    loop, silver_table_creation.py:246-287)."""
    sm = clean.dedup_full_row(
        readers.scan_table(spark, f"{base}/bronze/station_map")
    )
    sm = derive.rename_columns(sm, {"county": "county_id"})
    sm = derive.round_coordinates(sm, ["latitude", "longitude"], scale=1)
    labeled = clean.dropna_any(sm, subset=["county_id"])
    unlabeled = clean.filter_isnull(sm, "county_id").drop(
        "county_id", "county_name"
    )
    assigned = joins.nn_assign_spatial(
        unlabeled,
        labeled,
        label_cols=["county_id", "county_name"],
        id_cols=["latitude", "longitude"],
    )
    out = labeled.unionByName(assigned.select(*labeled.columns))
    writers.write_overwrite(out, f"{base}/silver/station_map")


def silver(spark: SparkSession, base: str) -> None:
    """Bronze → six silver tables via the generic clean→derive→upsert
    (ref silver_table_creation.py; 7 hand-written merges become calls)."""
    train = clean.filter_neq(
        _bronze_clean(spark, base, "train"), "county", 12
    )
    upsert.upsert(
        spark,
        train,
        f"{base}/silver/train",
        keys=["row_id"],
        partition_col="data_block_id",
    )

    client = _bronze_clean(spark, base, "client")
    upsert.upsert(
        spark,
        client,
        f"{base}/silver/client",
        keys=["product_type", "county", "is_business", "date"],
        partition_col="data_block_id",
    )

    elec = derive.rename_columns(
        _bronze_clean(spark, base, "electricity_prices"),
        {
            "forecast_date": "electricity_effective_datetime",
            "origin_date": "electricity_origin_date",
        },
    )
    elec = derive.with_availability(
        elec,
        "electricity_effective_datetime",
        "1 DAY",
        "electricity_available_datetime",
    )
    upsert.upsert(
        spark,
        elec,
        f"{base}/silver/electricity_prices",
        keys=["electricity_effective_datetime"],
        partition_col="data_block_id",
    )

    gas = derive.rename_columns(
        _bronze_clean(spark, base, "gas_prices"),
        {"forecast_date": "gas_effective_date", "origin_date": "gas_origin_date"},
    )
    upsert.upsert(
        spark,
        gas,
        f"{base}/silver/gas_prices",
        keys=["gas_effective_date"],
        partition_col="data_block_id",
    )

    silver_station_map(spark, base)
    stations = readers.scan_table(spark, f"{base}/silver/station_map")

    hist = derive.round_coordinates(
        _bronze_clean(spark, base, "historical_weather"),
        ["latitude", "longitude"],
        scale=1,
    )
    hist = joins.join_left_using(
        hist, stations, ["latitude", "longitude"], broadcast_right=True
    )
    hist = derive.with_availability_by_hour(
        hist, "datetime", "historical_weather_available_datetime"
    )
    # duplicate station reports for one grain collapse to their mean
    # (ref silver_table_creation.py:347-361)
    hist = agg.avg_groupby_dynamic(
        hist,
        keys=[
            "latitude",
            "longitude",
            "datetime",
            "historical_weather_available_datetime",
            "data_block_id",
            "county_id",
        ],
        value_cols=HIST_MEASURES,
    )
    upsert.upsert(
        spark,
        hist,
        f"{base}/silver/historical_weather",
        keys=[
            "latitude",
            "longitude",
            "historical_weather_available_datetime",
            "datetime",
        ],
        partition_col="data_block_id",
    )

    fcst = derive.round_coordinates(
        _bronze_clean(spark, base, "forecast_weather"),
        ["latitude", "longitude"],
        scale=1,
    )
    fcst = joins.join_left_using(
        fcst, stations, ["latitude", "longitude"], broadcast_right=True
    )
    upsert.upsert(
        spark,
        fcst,
        f"{base}/silver/forecast_weather",
        keys=[
            "latitude",
            "longitude",
            "origin_datetime",
            "forecast_datetime",
            "hours_ahead",
        ],
        partition_col="data_block_id",
    )


def gold(spark: SparkSession, base: str) -> None:
    """Six-way wide join + county-hour weather aggregates → one gold
    table keyed by the prediction grain (ref gold_table_creation.py)."""
    train = readers.scan_table(spark, f"{base}/silver/train")
    train = clean.filter_not_in(train, "data_block_id", [0, 1])

    client = readers.scan_table(spark, f"{base}/silver/client")
    client = derive.rename_columns(
        client,
        {
            "product_type": "c_product_type",
            "county": "c_county",
            "is_business": "c_is_business",
            "data_block_id": "c_data_block_id",
            "date": "c_date",
        },
    )
    wide = joins.join_left_on(
        train,
        client,
        [
            F.col("product_type") == F.col("c_product_type"),
            F.col("county") == F.col("c_county"),
            F.col("is_business") == F.col("c_is_business"),
            F.col("data_block_id") == F.col("c_data_block_id"),
        ],
        broadcast_right=True,
    ).drop("c_product_type", "c_county", "c_is_business", "c_data_block_id", "c_date")

    elec = readers.scan_table(spark, f"{base}/silver/electricity_prices")
    wide = joins.join_asof_eq(
        wide,
        elec.select("electricity_available_datetime", "euros_per_mwh"),
        "datetime",
        "electricity_available_datetime",
        broadcast_feed=True,
    ).drop("electricity_available_datetime")

    gas = readers.scan_table(spark, f"{base}/silver/gas_prices")
    gas = derive.rename_columns(gas, {"data_block_id": "g_data_block_id"})
    wide = joins.join_left_on(
        wide,
        gas.select("g_data_block_id", "lowest_price_per_mwh", "highest_price_per_mwh"),
        [F.col("data_block_id") == F.col("g_data_block_id")],
        broadcast_right=True,
    ).drop("g_data_block_id")

    hist = readers.scan_table(spark, f"{base}/silver/historical_weather")
    hist_county = agg.avg_groupby_dynamic(
        hist,
        keys=["county_id", "datetime", "data_block_id"],
        value_cols=HIST_MEASURES,
        alias_prefix="historical_",
    )
    hist_county = derive.rename_columns(
        hist_county,
        {
            "county_id": "h_county",
            "datetime": "h_datetime",
            "data_block_id": "h_data_block_id",
        },
    )
    wide = joins.join_left_on(
        wide,
        hist_county,
        [
            F.col("county") == F.col("h_county"),
            F.col("datetime") == F.col("h_datetime"),
            F.col("data_block_id") == F.col("h_data_block_id"),
        ],
        broadcast_right=True,
    ).drop("h_county", "h_datetime", "h_data_block_id")

    fcst = readers.scan_table(spark, f"{base}/silver/forecast_weather")
    fcst = clean.filter_range(fcst, "hours_ahead", 23, 48)
    fcst_county = agg.avg_groupby_dynamic(
        fcst,
        keys=["county_id", "forecast_datetime", "data_block_id"],
        value_cols=FCST_MEASURES,
        alias_prefix="forecast_",
    )
    fcst_county = derive.rename_columns(
        fcst_county,
        {
            "county_id": "f_county",
            "forecast_datetime": "f_datetime",
            "data_block_id": "f_data_block_id",
        },
    )
    wide = joins.join_left_on(
        wide,
        fcst_county,
        [
            F.col("county") == F.col("f_county"),
            F.col("datetime") == F.col("f_datetime"),
            F.col("data_block_id") == F.col("f_data_block_id"),
        ],
        broadcast_right=True,
    ).drop("f_county", "f_datetime", "f_data_block_id")

    upsert.upsert(
        spark,
        wide,
        f"{base}/gold/enefit",
        keys=["datetime", "county", "product_type", "is_business", "is_consumption"],
        partition_col="data_block_id",
    )


def run_all(spark: SparkSession, landing_dir: str, base: str) -> DataFrame:
    """bronze → silver → gold; returns the gold table."""
    bronze(spark, landing_dir, base)
    silver(spark, base)
    gold(spark, base)
    return readers.scan_table(spark, f"{base}/gold/enefit")
