"""Multimodal query surface: binary-payload plumbing over documents,
oracle-checked byte features (the DuckDB twin folds over the hex dump
of the same UTF-8 payload)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from medallion_delta_lake_spark.operators import multimodal as mm
from medallion_delta_lake_spark.plans.registry import query, table


@query(
    "multimodal-byte-features",
    oracle="""
    WITH p AS (
      SELECT doc_id, encode(text) AS payload,
             hex(encode(text)) AS hx,
             octet_length(encode(text)) AS nb
      FROM documents
    )
    SELECT doc_id,
           CAST(nb AS INT) AS n_bytes,
           CAST(CASE WHEN nb > 0
                THEN CAST(('0x' || substr(hx, 1, 2)) AS INT) ELSE -1 END
                AS INT) AS first_byte,
           CAST(CASE WHEN nb > 0
                THEN CAST(('0x' || substr(hx, 2*nb - 1, 2)) AS INT) ELSE -1 END
                AS INT) AS last_byte,
           CAST(coalesce(list_sum(list_transform(range(1, nb + 1),
                i -> CAST(('0x' || substr(hx, 2*i - 1, 2)) AS INT))), 0)
                AS BIGINT) AS byte_sum
    FROM p
    """,
)
def multimodal_byte_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """multimodal / byte features — binary payload attach + Arrow-
    batched mapInPandas extraction (the decode-stage plumbing, with a
    byte-stats body standing in for the codec)."""
    docs = mm.attach_binary_payload(table(spark, sf_dir, "documents"))
    return mm.byte_features(docs)
