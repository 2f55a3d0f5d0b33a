"""Multimodal column handling: image/audio/video as opaque binary
columns with typed metadata (SURVEY.md §2.11 extension surface).

Model: a modality payload is a ``binary`` column plus a metadata
struct (mime, n_bytes). Feature extraction runs as Arrow-batched
``mapInPandas`` — the payload bytes stay columnar end-to-end (parquet
→ Arrow → pandas), one Python roundtrip per batch, never per row.

The actual media *decode* steps are STUBBED in this environment (no
image/audio libraries in the container): ``decode_image_features``
tries a real decoder import and otherwise applies a clearly-marked
deterministic fake derived from the payload bytes. The Spark-side
plumbing — schemas, UDF signatures, batch iteration, partitioning — is
real and tested; swapping the stub for PIL/librosa changes only the
inner function body.

Scale notes (100 TB of media): binary payloads dominate row size, so
(a) select the payload column as late as possible (column pruning
keeps scans metadata-only until decode), (b) repartition before
``mapInPandas`` so batches are balanced by bytes not row count
(``spark.sql.execution.arrow.maxRecordsPerBatch`` caps batch rows),
(c) push decoded features to a narrow table and join back by id —
never carry payload bytes through shuffles.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", mime: str = "text/plain"
) -> DataFrame:
    """Turn a column into an opaque binary payload + metadata struct —
    the ingest shape for any modality (here UTF-8 text bytes stand in
    for image/audio payloads, which arrive the same way)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.length(payload).alias("n_bytes"),
        ),
    )


BYTE_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("first_byte", IntegerType()),
        StructField("last_byte", IntegerType()),
        StructField("byte_sum", LongType()),
    ]
)


def byte_features(
    df: DataFrame, id_col: str = "doc_id", fan_out: int | None = None
) -> DataFrame:
    """Deterministic per-payload byte statistics via mapInPandas — the
    real Arrow plumbing a decode stage uses (batch in, batch out).
    ``fan_out`` repartitions first so a single-file input doesn't feed
    one Python worker (the decode stage's parallelism = partitions)."""
    if fan_out:
        df = df.repartition(fan_out)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int32"),
                    "first_byte": payloads.map(
                        lambda b: b[0] if len(b) else -1
                    ).astype("int32"),
                    "last_byte": payloads.map(
                        lambda b: b[-1] if len(b) else -1
                    ).astype("int32"),
                    "byte_sum": payloads.map(
                        lambda b: int(sum(b))
                    ).astype("int64"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(
        extract, schema=BYTE_FEATURES_SCHEMA
    )


IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
    ]
)


def _try_real_image_decoder():
    try:  # real decoder when the container has one
        from PIL import Image  # noqa: F401

        return Image
    except ImportError:
        return None


def decode_image_features(
    df: DataFrame, id_col: str = "doc_id", allow_stub: bool = True
) -> DataFrame:
    """Image decode → (width, height, channels).

    STUB: this container ships no image codec. With ``allow_stub`` the
    deterministic fake derives dimensions from payload bytes (marked
    clearly below); with ``allow_stub=False`` and no decoder installed
    it raises NotImplementedError. The mapInPandas contract (schema,
    batching) is identical either way.
    """
    decoder = _try_real_image_decoder()
    if decoder is None and not allow_stub:
        raise NotImplementedError(
            "image decode requires an image library (e.g. PIL); "
            "not available in this environment - pass allow_stub=True "
            "for the deterministic fake"
        )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in batches:
            if decoder is not None:
                dims = [
                    decoder.open(io.BytesIO(b)).size + (3,)
                    for b in pdf["payload"]
                ]
            else:
                # DETERMINISTIC FAKE (stub): dimensions derived from the
                # payload bytes so tests exercise the full pipeline shape
                dims = [
                    ((b[0] if len(b) else 0) + 1, (b[-1] if len(b) else 0) + 1, 3)
                    for b in pdf["payload"]
                ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": pd.Series(
                        [d[0] for d in dims], dtype="int32"
                    ),
                    "height": pd.Series(
                        [d[1] for d in dims], dtype="int32"
                    ),
                    "channels": pd.Series(
                        [d[2] for d in dims], dtype="int32"
                    ),
                }
            )

    return df.select(id_col, "payload").mapInPandas(
        extract, schema=IMAGE_FEATURES_SCHEMA
    )
