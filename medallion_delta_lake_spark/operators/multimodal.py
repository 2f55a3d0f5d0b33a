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
    BinaryType,
    IntegerType,
    LongType,
    StringType,
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
                # no codec library: REAL header parse first (PNG/JPEG/
                # GIF dimensions decode without one — parse_media_header
                # below); only unrecognized payloads fall back to the
                # DETERMINISTIC FAKE that keeps the pipeline-shape tests
                # and oracles running on non-image fixtures
                dims = []
                for b in pdf["payload"]:
                    fmt, w, h, ch, _, _ = parse_media_header(bytes(b))
                    if fmt in ("png", "jpeg", "gif") and w is not None:
                        dims.append((w, h, ch if ch is not None else 3))
                    else:
                        dims.append(
                            (
                                (b[0] if len(b) else 0) + 1,
                                (b[-1] if len(b) else 0) + 1,
                                3,
                            )
                        )
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


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("byte_offset", IntegerType()),
        StructField("frame_len", IntegerType()),
        StructField("frame_bytes", BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    n_frames: int = 4,
    frame_len: int = 64,
    fan_out: int | None = None,
) -> DataFrame:
    """Video-style frame sampling: ``n_frames`` evenly-spaced fixed-size
    byte windows per payload (one input row → n output rows inside the
    Arrow batch — the fan-out happens Python-side, so payload bytes
    never duplicate through a Spark explode).

    STUB note: a real video pipeline seeks keyframes with a codec; the
    byte-window sampling here is the deterministic stand-in. The
    offsets/lengths are pure integer functions of payload size, so the
    registered query is fully oracle-checkable; the sliced bytes are
    pytest-checked against Python slicing.
    """
    if fan_out:
        df = df.repartition(fan_out)
    step_div = max(n_frames - 1, 1)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, offs, lens, blobs = [], [], [], [], []
            for doc_id, b in zip(pdf[id_col], pdf["payload"]):
                nb = len(b)
                span = max(nb - frame_len, 0)
                for i in range(n_frames):
                    off = i * span // step_div
                    ln = min(frame_len, nb - off)
                    ids.append(int(doc_id))
                    idxs.append(i)
                    offs.append(off)
                    lens.append(ln)
                    blobs.append(bytes(b[off : off + ln]))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "byte_offset": pd.Series(offs, dtype="int32"),
                    "frame_len": pd.Series(lens, dtype="int32"),
                    "frame_bytes": blobs,
                }
            )

    return df.select(id_col, "payload").mapInPandas(
        extract, schema=FRAME_SCHEMA
    )


CHUNK_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("chunk_idx", IntegerType()),
        StructField("byte_offset", IntegerType()),
        StructField("chunk_len", IntegerType()),
        StructField("chunk_bytes", BinaryType()),
    ]
)


def chunk_payload(
    df: DataFrame,
    id_col: str = "doc_id",
    chunk_len: int = 256,
    fan_out: int | None = None,
) -> DataFrame:
    """Audio-style fixed-size chunking: contiguous ``chunk_len``-byte
    windows covering the payload (last chunk short). Same Arrow
    plumbing contract as sample_frames; chunk geometry is an integer
    function of payload size (oracle-checkable), bytes pytest-checked."""
    if fan_out:
        df = df.repartition(fan_out)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, offs, lens, blobs = [], [], [], [], []
            for doc_id, b in zip(pdf[id_col], pdf["payload"]):
                nb = len(b)
                n_chunks = (nb + chunk_len - 1) // chunk_len
                for i in range(n_chunks):
                    off = i * chunk_len
                    ln = min(chunk_len, nb - off)
                    ids.append(int(doc_id))
                    idxs.append(i)
                    offs.append(off)
                    lens.append(ln)
                    blobs.append(bytes(b[off : off + ln]))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "chunk_idx": pd.Series(idxs, dtype="int32"),
                    "byte_offset": pd.Series(offs, dtype="int32"),
                    "chunk_len": pd.Series(lens, dtype="int32"),
                    "chunk_bytes": blobs,
                }
            )

    return df.select(id_col, "payload").mapInPandas(
        extract, schema=CHUNK_SCHEMA
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("out_w", IntegerType()),
        StructField("out_h", IntegerType()),
        StructField("out_bytes", IntegerType()),
        StructField("resized", BinaryType()),
    ]
)


def resize_image(
    df: DataFrame,
    id_col: str = "doc_id",
    out_w: int = 32,
    out_h: int = 32,
    allow_stub: bool = True,
) -> DataFrame:
    """Image resize → fixed (out_w × out_h × 3) RGB buffer.

    STUB: with no codec installed the deterministic fake tiles the
    payload bytes cyclically into the output buffer (clearly marked);
    with PIL present it decodes, resizes, and emits real pixels. The
    binary-in/binary-out mapInPandas contract is identical either way —
    swapping in the real decoder changes only the inner function.
    """
    decoder = _try_real_image_decoder()
    if decoder is None and not allow_stub:
        raise NotImplementedError(
            "image resize requires an image library (e.g. PIL); "
            "not available in this environment - pass allow_stub=True "
            "for the deterministic fake"
        )
    n_out = out_w * out_h * 3

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in batches:
            blobs = []
            for b in pdf["payload"]:
                if decoder is not None:
                    img = decoder.open(io.BytesIO(b)).convert("RGB")
                    blobs.append(img.resize((out_w, out_h)).tobytes())
                else:
                    # DETERMINISTIC FAKE (stub): tile payload bytes
                    # cyclically to the target buffer size
                    src = bytes(b) or b"\x00"
                    reps = n_out // len(src) + 1
                    blobs.append((src * reps)[:n_out])
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "out_w": pd.Series([out_w] * len(pdf), dtype="int32"),
                    "out_h": pd.Series([out_h] * len(pdf), dtype="int32"),
                    "out_bytes": pd.Series(
                        [n_out] * len(pdf), dtype="int32"
                    ),
                    "resized": blobs,
                }
            )

    return df.select(id_col, "payload").mapInPandas(
        extract, schema=RESIZED_SCHEMA
    )


MEDIA_HEADER_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("sample_rate_hz", IntegerType()),
        StructField("n_samples", LongType()),
    ]
)

# JPEG start-of-frame markers that carry dimensions (SOF0..SOF15 minus
# DHT/JPG/DAC, per ITU T.81 Table B.1)
_JPEG_SOF = {
    0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
    0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
}
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # by IHDR color type


def parse_media_header(b: bytes) -> tuple:
    """REAL (not stubbed) container-format metadata decode, pure
    Python over the payload bytes — no codec library required:

    - PNG: width/height/channels from the IHDR chunk
    - JPEG: width/height/components from the first SOF segment
    - GIF: width/height from the logical screen descriptor
    - WAV: channels / sample rate / sample count from the RIFF
      fmt + data chunks

    Returns (format, width, height, channels, sample_rate_hz,
    n_samples) with None where the field doesn't apply; unrecognized
    payloads → ('unknown', None, ...). Only headers are read — cost is
    O(header), not O(payload) — so this runs safely over 100 TB of
    media as a metadata-profiling pass before any full decode.
    """
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 26 and b[12:16] == b"IHDR":
        w = int.from_bytes(b[16:20], "big")
        h = int.from_bytes(b[20:24], "big")
        return ("png", w, h, _PNG_CHANNELS.get(b[25]), None, None)
    if b[:3] == b"\xff\xd8\xff":
        i = 2
        while i + 9 < len(b) and b[i] == 0xFF:
            marker = b[i + 1]
            if marker == 0xFF:  # 0xFF fill bytes before a marker (T.81 B.1.1.2)
                i += 1
                continue
            if marker == 0xD8 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            if marker in _JPEG_SOF:
                h = int.from_bytes(b[i + 5 : i + 7], "big")
                w = int.from_bytes(b[i + 7 : i + 9], "big")
                return ("jpeg", w, h, b[i + 9], None, None)
            i += 2 + int.from_bytes(b[i + 2 : i + 4], "big")
        return ("jpeg", None, None, None, None, None)
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        w = int.from_bytes(b[6:8], "little")
        h = int.from_bytes(b[8:10], "little")
        return ("gif", w, h, None, None, None)
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        i, channels, rate, bits, data_len = 12, None, None, None, None
        while i + 8 <= len(b):
            cid = b[i : i + 4]
            clen = int.from_bytes(b[i + 4 : i + 8], "little")
            if cid == b"fmt " and i + 24 <= len(b):
                channels = int.from_bytes(b[i + 10 : i + 12], "little")
                rate = int.from_bytes(b[i + 12 : i + 16], "little")
                bits = int.from_bytes(b[i + 22 : i + 24], "little")
            elif cid == b"data":
                data_len = clen
            i += 8 + clen + (clen & 1)  # chunks are word-aligned
        n_samples = None
        if data_len is not None and channels and bits:
            n_samples = data_len // (channels * (bits // 8))
        return ("wav", None, None, channels, rate, n_samples)
    return ("unknown", None, None, None, None, None)


def media_headers(
    df: DataFrame, id_col: str = "doc_id", fan_out: int | None = None
) -> DataFrame:
    """Media metadata profiling via mapInPandas: run
    :func:`parse_media_header` over every payload. This stage is NOT a
    stub — it performs real PNG/JPEG/GIF/WAV header decoding; only
    pixel/sample decode (PIL/librosa territory) remains gated."""
    if fan_out:
        df = df.repartition(fan_out)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [parse_media_header(bytes(b)) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "format": pd.Series([p[0] for p in parsed], dtype="object"),
                    "width": pd.array([p[1] for p in parsed], dtype="Int32"),
                    "height": pd.array([p[2] for p in parsed], dtype="Int32"),
                    "channels": pd.array(
                        [p[3] for p in parsed], dtype="Int32"
                    ),
                    "sample_rate_hz": pd.array(
                        [p[4] for p in parsed], dtype="Int32"
                    ),
                    "n_samples": pd.array(
                        [p[5] for p in parsed], dtype="Int64"
                    ),
                }
            )

    return df.select(id_col, "payload").mapInPandas(
        extract, schema=MEDIA_HEADER_SCHEMA
    )


def dhash_bands(
    df: DataFrame,
    payload_col: str = "payload",
    grid: int = 8,
    bands: int = 4,
) -> DataFrame:
    """Perceptual difference-hash (dHash) over a binary payload, as a
    pure codegen expression tree — the image near-dup index build,
    with the byte stream standing in for decoded grayscale pixels
    (the real pixel decode is env-gated in :func:`decode_image_features`;
    the hashing stage downstream of it is EXACTLY this).

    dHash: sample a ``grid × (grid+1)`` lattice of bytes at positions
    ``floor(i·(n_bytes−1)/(cells−1))``, set bit (r, c) when
    ``byte[r][c] < byte[r][c+1]``, giving ``grid²`` gradient-direction
    bits that survive brightness/scale shifts on real pixels. The bits
    pack into ``bands`` 16-bit integers (``band0..band{bands-1}``) —
    the LSH banding for hamming-space lookup: near-dup images collide
    on ≥1 band (same banded-join shape as dedup.simhash_pairs). No
    UDF, no shuffle; at 100 TB this runs inside the scan.
    """
    cells = grid * (grid + 1)
    hx = F.hex(F.col(payload_col))
    nb = F.length(F.col(payload_col))
    out = df.withColumn("_hx", hx).withColumn("_nb", nb)

    # One F.expr parse per band instead of composing ~130 Column ops
    # (each a py4j round-trip) — the parsed tree is op-for-op the
    # composed spelling (left-nested Add over shiftleft(CAST(bit)),
    # CAST..AS BIGINT on top), so plan, codegen and results are
    # bit-identical; only driver construction cost drops (the same
    # fix sim's hyperplane_bucket measured build 5.3 -> 1.7 s from).
    def byte_at(i: int) -> str:
        return (
            f"CAST(conv(substring(_hx,"
            f" CAST(({i} * (_nb - 1)) div {cells - 1} AS INT) * 2 + 1,"
            f" 2), 16, 10) AS INT)"
        )

    bits_per_band = grid * grid // bands
    cols = []
    for b in range(bands):
        terms = ["0"]
        for j in range(bits_per_band):
            k = b * bits_per_band + j
            r, c = divmod(k, grid)
            cell = r * (grid + 1) + c
            terms.append(
                f"shiftleft(CAST(({byte_at(cell)} <"
                f" {byte_at(cell + 1)}) AS INT), {j})"
            )
        cols.append(
            F.expr("CAST(" + " + ".join(terms) + " AS BIGINT)")
            .alias(f"band{b}")
        )
    return out.select(
        *[c for c in df.columns if c not in ("_hx", "_nb")], *cols
    ).drop("_hx", "_nb")


def dhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    max_hamming: int = 8,
    grid: int = 8,
    bands: int = 4,
) -> DataFrame:
    """Perceptual near-dup candidate pairs from banded dHashes: two
    payloads are candidates when ANY 16-bit band collides (an LSH
    guarantee: hamming ≤ bands−1 ⇒ some band equal, by pigeonhole),
    then the exact hamming distance — Σ bit_count(band_a XOR band_b)
    — verifies ≤ ``max_hamming``. The same band-join shape as
    dedup.simhash_pairs, over the image-hash domain: shuffles carry
    (id, band) ints, never payloads. Output: ``id_a, id_b, hamming``
    (id_a < id_b)."""
    from medallion_delta_lake_spark.operators.caching import tracked_cache

    # materialize the hashes ONCE: both join sides reference them, and
    # without the cache projection collapse would re-inline the whole
    # 64-comparison lattice (including hex(payload) per sampled byte)
    # into each side — measured 10.4 s → ~1 s at sf0.1
    hashed = tracked_cache(
        dhash_bands(
            df.select(id_col, payload_col), payload_col,
            grid=grid, bands=bands,
        ).drop(payload_col)
    )
    band_cols = [f"band{b}" for b in range(bands)]
    long_form = hashed.select(
        F.col(id_col),
        *band_cols,
        F.posexplode(F.array(*[F.col(c) for c in band_cols])).alias(
            "_band", "_key"
        ),
    )
    left = long_form.select(
        F.col(id_col).alias("id_a"),
        *[F.col(c).alias(f"{c}_a") for c in band_cols],
        "_band",
        "_key",
    )
    right = long_form.select(
        F.col(id_col).alias("id_b"),
        *[F.col(c).alias(f"{c}_b") for c in band_cols],
        "_band",
        "_key",
    )
    hamming = sum(
        F.bit_count(
            F.col(f"{c}_a").bitwiseXOR(F.col(f"{c}_b"))
        )
        for c in band_cols
    )
    return (
        left.join(right, ["_band", "_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def frame_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    n_frames: int = 4,
    frame_len: int = 64,
    max_hamming: int = 8,
    min_shared_frames: int = 2,
    grid: int = 8,
    bands: int = 4,
) -> DataFrame:
    """VIDEO-level near-duplicate pairs from temporally-aligned frame
    dHashes — the re-uploaded/re-encoded-video detector: sample
    ``n_frames`` evenly-spaced ``frame_len``-byte windows per payload
    (pure ``substring`` — the codegen twin of :func:`sample_frames`'s
    geometry), dHash each frame, and call two payloads near-dups when
    ≥ ``min_shared_frames`` of their SAME-INDEX frames are within
    ``max_hamming``. Frame alignment keys the join (a clip matches a
    clip, not a coincidence of unrelated frames), and the banded-LSH
    candidate filter + exact verify is :func:`dhash_pairs`' shape with
    ``frame_idx`` added to the join key — shuffles carry
    (id, frame_idx, band) ints, payloads never leave the scan.
    Output: ``id_a, id_b, n_shared_frames`` (id_a < id_b)."""
    from medallion_delta_lake_spark.operators.caching import tracked_cache

    step_div = max(n_frames - 1, 1)
    frames = (
        df.select(id_col, payload_col)
        .withColumn("_nb", F.length(F.col(payload_col)))
        .select(
            id_col,
            payload_col,
            "_nb",
            F.explode(
                F.array(*[F.lit(i) for i in range(n_frames)])
            ).alias("frame_idx"),
        )
        .withColumn(
            "_off",
            F.expr(
                f"CAST(frame_idx * greatest(_nb - {frame_len}, 0) "
                f"DIV {step_div} AS INT)"
            ),
        )
        .withColumn(
            "frame_bytes",
            F.expr(f"substring(`{payload_col}`, _off + 1, {frame_len})"),
        )
        .filter(F.length("frame_bytes") >= 2)
    )
    hashed = tracked_cache(
        dhash_bands(
            frames.select(id_col, "frame_idx", "frame_bytes"),
            "frame_bytes",
            grid=grid,
            bands=bands,
        ).drop("frame_bytes")
    )
    band_cols = [f"band{b}" for b in range(bands)]
    long_form = hashed.select(
        F.col(id_col),
        "frame_idx",
        *band_cols,
        F.posexplode(F.array(*[F.col(c) for c in band_cols])).alias(
            "_band", "_key"
        ),
    )
    left = long_form.select(
        F.col(id_col).alias("id_a"),
        "frame_idx",
        *[F.col(c).alias(f"{c}_a") for c in band_cols],
        "_band",
        "_key",
    )
    right = long_form.select(
        F.col(id_col).alias("id_b"),
        "frame_idx",
        *[F.col(c).alias(f"{c}_b") for c in band_cols],
        "_band",
        "_key",
    )
    hamming = sum(
        F.bit_count(F.col(f"{c}_a").bitwiseXOR(F.col(f"{c}_b")))
        for c in band_cols
    )
    shared = (
        left.join(right, ["frame_idx", "_band", "_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "frame_idx", hamming.alias("_h"))
        .filter(F.col("_h") <= max_hamming)
        .select("id_a", "id_b", "frame_idx")
        .distinct()
    )
    return (
        shared.groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared_frames"))
        .filter(F.col("n_shared_frames") >= min_shared_frames)
    )


def scene_cuts(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    n_frames: int = 16,
    frame_len: int = 32,
    cut_threshold: int = 12,
    grid: int = 8,
    bands: int = 4,
) -> DataFrame:
    """Scene-change detection from consecutive frame dHashes — the
    video shot-boundary primitive (keyframe selection, per-scene
    sampling budgets, intro/outro stripping all start here): sample
    ``n_frames`` evenly-spaced windows per payload (the same pure
    substring geometry as :func:`frame_neardup_pairs`), dHash each,
    and flag frame i a CUT when its Hamming distance to frame i−1
    reaches ``cut_threshold`` of the 64 signature bits. Output one
    row per frame: ``hamming_prev`` (NULL for frame 0) and
    ``is_cut``.

    Per-doc LAG over ≤``n_frames`` int rows after one narrow scan —
    payloads never shuffle; 100 TB of video costs one pass +
    a (doc, frame) window over 16-row groups."""
    from pyspark.sql import Window as W

    step_div = max(n_frames - 1, 1)
    frames = (
        df.select(id_col, payload_col)
        .withColumn("_nb", F.length(F.col(payload_col)))
        .select(
            id_col,
            payload_col,
            "_nb",
            F.explode(
                F.array(*[F.lit(i) for i in range(n_frames)])
            ).alias("frame_idx"),
        )
        .withColumn(
            "_off",
            F.expr(
                f"CAST(frame_idx * greatest(_nb - {frame_len}, 0) "
                f"DIV {step_div} AS INT)"
            ),
        )
        .withColumn(
            "frame_bytes",
            F.expr(f"substring(`{payload_col}`, _off + 1, {frame_len})"),
        )
        .filter(F.length("frame_bytes") >= 2)
    )
    hashed = dhash_bands(
        frames.select(id_col, "frame_idx", "frame_bytes"),
        "frame_bytes",
        grid=grid,
        bands=bands,
    ).drop("frame_bytes")
    band_cols = [f"band{b}" for b in range(bands)]
    w = W.partitionBy(id_col).orderBy("frame_idx")
    hamming = None
    for c in band_cols:
        term = F.bit_count(
            F.col(c).bitwiseXOR(F.lag(c).over(w))
        )
        hamming = term if hamming is None else hamming + term
    return hashed.select(
        id_col,
        "frame_idx",
        hamming.alias("hamming_prev"),
    ).select(
        id_col,
        "frame_idx",
        "hamming_prev",
        F.coalesce(
            F.col("hamming_prev") >= cut_threshold, F.lit(False)
        ).alias("is_cut"),
    )


# (ratio_w, ratio_h) training buckets, SDXL-style: square, photo and
# portrait/landscape pairs, and widescreen. Order is the tie-break.
ASPECT_BUCKETS: tuple[tuple[int, int], ...] = (
    (1, 1),
    (4, 3),
    (3, 4),
    (3, 2),
    (2, 3),
    (16, 9),
    (9, 16),
)

# LCM of the bucket ratio-heights {1,3,4,2,9,16} — scaling each
# bucket's error by (lcm / hb) clears denominators so ratio closeness
# compares in EXACT integers (|w/h − wb/hb| = |w·hb − wb·h|/(h·hb);
# h is common per image, so weighting by lcm/hb makes errors
# cross-bucket comparable without a single division)
_ASPECT_LCM = 144


def aspect_bucket_assign(
    df: DataFrame,
    width_col: str = "width",
    height_col: str = "height",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign each image to the nearest training aspect-ratio bucket —
    the batch-packing preprocessing every multi-resolution vision
    trainer runs (images batch with like-shaped peers so a batch crops
    to one canvas). Nearest is by TRUE ratio distance, computed in
    exact integer arithmetic: for buckets b the error
    ``|w·hb − wb·h| · (lcm/hb)`` orders identically to
    ``|w/h − wb/hb|`` (positive common factors), so there is no float
    comparison to disagree across engines; ties break on bucket order.

    Scale shape: a broadcast 7-row bucket dim × the image table, one
    per-image window min — the data-sized side never shuffles wider
    than the (id) partition, and the whole assign collapses into one
    whole-stage-codegen span (no UDF).

    Output: one row per image ``(id, width, height, bucket_w,
    bucket_h, ratio_err_scaled)``.
    """
    from pyspark.sql import Window as W

    spark = df.sparkSession
    buckets = spark.createDataFrame(
        [
            (i, wb, hb, _ASPECT_LCM // hb)
            for i, (wb, hb) in enumerate(ASPECT_BUCKETS)
        ],
        "bidx int, bucket_w int, bucket_h int, hweight int",
    )
    w = F.col(width_col).cast("bigint")
    h = F.col(height_col).cast("bigint")
    err = (
        F.abs(w * F.col("bucket_h") - F.col("bucket_w") * h)
        * F.col("hweight")
    ).alias("ratio_err_scaled")
    ranked = (
        df.select(id_col, width_col, height_col)
        .crossJoin(F.broadcast(buckets))
        .select(
            id_col, width_col, height_col,
            "bidx", "bucket_w", "bucket_h", err,
        )
        .withColumn(
            "_rn",
            F.row_number().over(
                W.partitionBy(id_col).orderBy(
                    "ratio_err_scaled", "bidx"
                )
            ),
        )
    )
    return ranked.filter(F.col("_rn") == 1).drop("_rn", "bidx")


def aspect_bucket_batches(
    assigned: DataFrame,
    batch_size: int = 64,
) -> DataFrame:
    """Collapse an :func:`aspect_bucket_assign` result into the batch
    plan: per bucket, the image count, the number of ``batch_size``
    batches (ceil), and the padding waste the trainer will pay in the
    final partial batch — the numbers a packing scheduler consumes.
    All-integer arithmetic."""
    n = F.count(F.lit(1))
    batches = F.floor(
        (n + F.lit(batch_size - 1)) / F.lit(batch_size)
    ).cast("bigint")
    return (
        assigned.groupBy("bucket_w", "bucket_h")
        .agg(
            n.alias("n_images"),
            batches.alias("n_batches"),
            (batches * batch_size - n).alias("pad_waste"),
        )
    )
