"""Semi-structured (VARIANT) operators (SURVEY.md §2.11 extension
surface — no reference counterpart; pre-built r10, registered face
lands in r11).

The 100 TB ingestion reality these serve: event payloads arrive as
heterogeneous JSON; parsing to a rigid struct at ingest either drops
unknown keys or fails on drift. Spark 4's VARIANT keeps the parsed
binary form (cheap re-access, no re-parse per query) while staying
schema-on-read. These operators cover the three moves a pipeline
makes over such a column:

- ``shred_variant``: promote declared paths to typed TOP-LEVEL
  columns (the "shredding" step that makes hot fields prunable,
  skippable, and join-keyable — after shredding, predicates on the
  typed columns push down to the scan like any other column).
- ``variant_key_census``: per-key occurrence counts + observed type
  — the drift monitor that tells you WHEN the payloads changed and
  which keys are worth shredding next.
- ``variant_type_profile``: per-path dominant type via
  ``schema_of_variant`` — string output from Spark's own inference,
  for drift assertions in tests/pipelines.

All three are pure JVM expressions (variant_get / json_object_keys /
schema_of_variant) — no Python UDF; a census over a petabyte of
events is one explode + one integer groupBy whose map-side combine
collapses each task to O(distinct keys).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def shred_variant(
    df: DataFrame,
    variant_col: str,
    spec: Mapping[str, tuple[str, str]],
    keep_variant: bool = False,
    strict: bool = False,
) -> DataFrame:
    """Promote variant paths to typed columns: ``spec`` maps output
    column name → (JSON path like ``$.user.id``, Spark type string).
    ``strict=True`` uses ``variant_get`` (a path whose value cannot
    cast to the declared type FAILS the query — ingestion-contract
    mode); the default uses ``try_variant_get`` (miscast → NULL —
    exploration mode). ``keep_variant`` retains the original column
    for not-yet-shredded consumers."""
    cols: list[Column] = [
        F.col(c) for c in df.columns if c != variant_col
    ]
    if keep_variant:
        cols.append(F.col(variant_col))
    getter = F.variant_get if strict else F.try_variant_get
    for out_name, (path, dtype) in spec.items():
        cols.append(
            getter(F.col(variant_col), path, dtype).alias(out_name)
        )
    return df.select(*cols)


def variant_key_census(
    df: DataFrame, variant_col: str
) -> DataFrame:
    """Top-level key census of a variant column: (key, n_rows,
    n_nonnull, type_sample) — how often each key appears, how often
    its value is non-null, and one observed type (the MIN of the
    per-row ``schema_of_variant`` strings — deterministic, unlike
    first()). The schema-drift scorecard: a new key showing up or a
    type_sample flipping between runs is the signal to evolve the
    shred spec.

    Shape: keys come from ``json_object_keys(to_json(v))`` (variant →
    canonical JSON text → key array) exploded once; both aggregates
    are integer counts keyed by the key string."""
    keys = df.select(
        F.explode(
            F.json_object_keys(F.to_json(F.col(variant_col)))
        ).alias("key"),
        F.col(variant_col).alias("__v"),
    )
    per_key = keys.select(
        "key",
        F.try_variant_get(
            F.col("__v"),
            F.concat(F.lit("$."), F.col("key")),
            "variant",
        ).alias("__val"),
    )
    return per_key.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(
                F.col("__val").isNotNull()
                & ~F.is_variant_null(F.col("__val")),
                1,
            ).otherwise(0)
        ).alias("n_nonnull"),
        F.min(F.schema_of_variant(F.col("__val"))).alias(
            "type_sample"
        ),
    )


def variant_type_profile(
    df: DataFrame, variant_col: str, paths: list[str]
) -> DataFrame:
    """Distribution of observed types per declared path: (path,
    variant_type, n) — e.g. ``$.amount`` seen as BIGINT in 99.2% of
    rows and STRING in the rest is a quantified ingestion bug. One
    explode over the declared paths (small), one integer groupBy."""
    probes = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(p).alias("path"),
                    F.schema_of_variant(
                        F.try_variant_get(
                            F.col(variant_col), p, "variant"
                        )
                    ).alias("variant_type"),
                )
                for p in paths
            ]
        )
    ).alias("pr")
    return (
        df.select(probes)
        .select("pr.path", "pr.variant_type")
        .groupBy("path", "variant_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
