"""Multimodal query surface: binary-payload plumbing over documents,
oracle-checked byte features (the DuckDB twin folds over the hex dump
of the same UTF-8 payload)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from medallion_delta_lake_spark.operators import multimodal as mm
from medallion_delta_lake_spark.operators import pandas_ops
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
    # fan_out sized to the DATA, not the cluster: 500 docs across 32
    # Python workers pays ~2s of worker spin-up for ~0 parallelism gain
    # (measured 2.8s vs 0.7s cold at sf0.1). Production rule: fan_out ≈
    # payload_bytes / 128 MB, capped by defaultParallelism.
    return mm.byte_features(
        docs, fan_out=min(8, spark.sparkContext.defaultParallelism)
    )


@query(
    "pandas-scalar-tokens",
    oracle=r"""
    SELECT doc_id,
           CAST(len(string_split(
             trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '))
             AS INT) AS n_tokens
    FROM documents
    """,
)
def pandas_scalar_tokens_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """udf-pandas / scalar — Arrow-vectorized token count, pipelined in
    the stage (no shuffle); bit-exact vs the SQL twin."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    return pandas_ops.with_token_count(docs).select("doc_id", "n_tokens")


@query(
    "pandas-group-normalize",
    oracle="""
    SELECT event_id, user_id, value,
           value - (
             CAST(SUM(CAST(round(value * 100, 0) AS BIGINT))
                  OVER (PARTITION BY user_id) AS DOUBLE)
             / (100.0 * COUNT(*) OVER (PARTITION BY user_id))
           ) AS delta_from_mean
    FROM events
    """,
)
def pandas_group_normalize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """udf-pandas / grouped map — per-user mean-centering through
    applyInPandas; the mean comes from an integer-cents sum so the
    Python path matches the SQL oracle exactly."""
    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    return pandas_ops.group_normalize(ev, ["user_id"], "value")


@query(
    "multimodal-frame-sample",
    # frame geometry is a pure integer function of payload size — the
    # oracle recomputes it from octet_length; the sliced bytes
    # themselves are pytest-checked (tests/test_multimodal.py)
    oracle="""
    WITH p AS (
      SELECT doc_id, octet_length(encode(text)) AS nb FROM documents
    )
    SELECT doc_id, CAST(i AS INT) AS frame_idx,
           CAST(i * greatest(nb - 64, 0) // 3 AS INT) AS byte_offset,
           CAST(least(64, nb - (i * greatest(nb - 64, 0) // 3)) AS INT)
             AS frame_len
    FROM p, unnest(range(0, 4)) AS r(i)
    """,
)
def multimodal_frame_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """multimodal / frame sampling — 4 evenly-spaced 64-byte windows
    per payload via mapInPandas (the video keyframe-sampling plumbing;
    Python-side fan-out, payload never duplicates through an explode)."""
    docs = mm.attach_binary_payload(table(spark, sf_dir, "documents"))
    frames = mm.sample_frames(
        docs, n_frames=4, frame_len=64,
        fan_out=min(8, spark.sparkContext.defaultParallelism),
    )
    return frames.select("doc_id", "frame_idx", "byte_offset", "frame_len")


@query(
    "multimodal-audio-chunks",
    oracle="""
    WITH p AS (
      SELECT doc_id, octet_length(encode(text)) AS nb FROM documents
    )
    SELECT doc_id, CAST(i AS INT) AS chunk_idx,
           CAST(i * 256 AS INT) AS byte_offset,
           CAST(least(256, nb - i * 256) AS INT) AS chunk_len
    FROM p, unnest(range(0, (nb + 255) // 256)) AS r(i)
    """,
)
def multimodal_audio_chunks_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """multimodal / fixed-size chunking — contiguous 256-byte windows
    (the audio segmentation plumbing), last chunk short; geometry
    oracle-checked, bytes pytest-checked."""
    docs = mm.attach_binary_payload(table(spark, sf_dir, "documents"))
    chunks = mm.chunk_payload(
        docs, chunk_len=256,
        fan_out=min(8, spark.sparkContext.defaultParallelism),
    )
    return chunks.select("doc_id", "chunk_idx", "byte_offset", "chunk_len")


@query(
    "multimodal-resize",
    oracle="""
    SELECT doc_id, CAST(32 AS INT) AS out_w, CAST(32 AS INT) AS out_h,
           CAST(3072 AS INT) AS out_bytes
    FROM documents
    """,
)
def multimodal_resize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """multimodal / resize — binary-in/binary-out mapInPandas to a
    fixed 32×32×3 RGB buffer (deterministic stub tiling here, PIL when
    present); the oracle pins the output geometry, the buffer contents
    are pytest-checked."""
    docs = mm.attach_binary_payload(table(spark, sf_dir, "documents"))
    out = mm.resize_image(docs, out_w=32, out_h=32)
    return out.select("doc_id", "out_w", "out_h", "out_bytes")


def _dhash_oracle(grid: int = 8, bands: int = 4) -> str:
    """DuckDB twin of operators/multimodal.py:dhash_bands — same
    lattice positions, same comparisons, same band packing."""
    cells = grid * (grid + 1)

    def byte_at(i: int) -> str:
        return (
            f"CAST(('0x' || substr(hx,"
            f" CAST(({i} * (nb - 1)) // {cells - 1} AS INT) * 2 + 1,"
            f" 2)) AS INT)"
        )

    bits_per_band = grid * grid // bands
    band_cols = []
    for b in range(bands):
        terms = []
        for j in range(bits_per_band):
            k = b * bits_per_band + j
            r, c = divmod(k, grid)
            cell = r * (grid + 1) + c
            terms.append(
                f"(CASE WHEN {byte_at(cell)} < {byte_at(cell + 1)}"
                f" THEN 1 ELSE 0 END << {j})"
            )
        band_cols.append(
            "CAST(" + " + ".join(terms) + f" AS BIGINT) AS band{b}"
        )
    cols = ",\n           ".join(band_cols)
    return f"""
    WITH p AS (
      SELECT doc_id, hex(encode(text)) AS hx,
             octet_length(encode(text)) AS nb
      FROM documents
    )
    SELECT doc_id,
           {cols}
    FROM p
    """


@query("multimodal-dhash-bands", oracle=_dhash_oracle())
def multimodal_dhash_bands_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """multimodal / perceptual dHash index build — 64 gradient bits
    over a byte lattice of each payload, packed into 4 LSH bands for
    hamming-space near-dup lookup (the image-dedup primitive; byte
    stream stands in for the env-gated pixel decode). Pure codegen —
    zero shuffle, no UDF (operators/multimodal.py:dhash_bands)."""
    docs = mm.attach_binary_payload(table(spark, sf_dir, "documents"))
    return mm.dhash_bands(docs.select("doc_id", "payload")).drop("payload")


def _dhash_band_cols(grid: int = 8, bands: int = 4) -> str:
    """The band-column SQL expressions of _dhash_oracle, reusable over
    any CTE exposing (hx, nb)."""
    cells = grid * (grid + 1)

    def byte_at(i: int) -> str:
        return (
            f"CAST(('0x' || substr(hx,"
            f" CAST(({i} * (nb - 1)) // {cells - 1} AS INT) * 2 + 1,"
            f" 2)) AS INT)"
        )

    bits_per_band = grid * grid // bands
    band_cols = []
    for b in range(bands):
        terms = []
        for j in range(bits_per_band):
            k = b * bits_per_band + j
            r, c = divmod(k, grid)
            cell = r * (grid + 1) + c
            terms.append(
                f"(CASE WHEN {byte_at(cell)} < {byte_at(cell + 1)}"
                f" THEN 1 ELSE 0 END << {j})"
            )
        band_cols.append(
            "CAST(" + " + ".join(terms) + f" AS BIGINT) AS band{b}"
        )
    return ",\n             ".join(band_cols)


@query(
    "multimodal-dhash-pairs",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text
      FROM documents WHERE doc_id < 50
    ),
    p AS (
      SELECT doc_id, hex(encode(text)) AS hx,
             octet_length(encode(text)) AS nb
      FROM corpus
    ),
    h AS (
      SELECT doc_id,
             {_dhash_band_cols()}
      FROM p
    ),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             bit_count(xor(a.band0, b.band0))
               + bit_count(xor(a.band1, b.band1))
               + bit_count(xor(a.band2, b.band2))
               + bit_count(xor(a.band3, b.band3)) AS hamming
      FROM h a JOIN h b
        ON a.doc_id < b.doc_id
       AND (a.band0 = b.band0 OR a.band1 = b.band1
            OR a.band2 = b.band2 OR a.band3 = b.band3)
    )
    SELECT DISTINCT id_a, id_b, CAST(hamming AS INT) AS hamming
    FROM pairs WHERE hamming <= 8
    """,
)
def multimodal_dhash_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """multimodal / perceptual near-dup pairs — banded-dHash LSH join
    + exact hamming verify over a corpus with PLANTED duplicates
    (each low-id payload re-ingested under a new id — the re-crawled
    identical-image scenario; byte-identical payloads hash to hamming
    0, and any naturally similar payloads surface too). Band collision
    is the candidate
    filter (pigeonhole: hamming ≤ 3 ⇒ some 16-bit band equal);
    shuffles carry (id, band) ints only
    (operators/multimodal.py:dhash_pairs)."""
    from pyspark.sql import functions as F

    d = table(spark, sf_dir, "documents")
    planted = d.select("doc_id", "text").unionByName(
        d.filter(F.col("doc_id") < 50).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    )
    payload = mm.attach_binary_payload(planted)
    out = mm.dhash_pairs(payload, "doc_id", "payload", max_hamming=8)
    return out.select(
        "id_a", "id_b", F.col("hamming").cast("int").alias("hamming")
    )


@query(
    "multimodal-frame-dedup",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text
      FROM documents WHERE doc_id < 50
    ),
    p AS (
      SELECT doc_id, hex(encode(text)) AS full_hx,
             octet_length(encode(text)) AS fnb
      FROM corpus
    ),
    f AS (
      SELECT doc_id, CAST(i AS INT) AS frame_idx,
             substr(full_hx,
                    CAST(i * greatest(fnb - 64, 0) // 3 AS INT) * 2 + 1,
                    CAST(least(64, fnb
                               - (i * greatest(fnb - 64, 0) // 3))
                         AS INT) * 2) AS hx,
             CAST(least(64, fnb - (i * greatest(fnb - 64, 0) // 3))
                  AS INT) AS nb
      FROM p, unnest(range(0, 4)) AS r(i)
      WHERE least(64, fnb - (i * greatest(fnb - 64, 0) // 3)) >= 2
    ),
    h AS (
      SELECT doc_id, frame_idx,
             {_dhash_band_cols()}
      FROM f
    ),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.frame_idx,
             bit_count(xor(a.band0, b.band0))
               + bit_count(xor(a.band1, b.band1))
               + bit_count(xor(a.band2, b.band2))
               + bit_count(xor(a.band3, b.band3)) AS hamming
      FROM h a JOIN h b
        ON a.doc_id < b.doc_id AND a.frame_idx = b.frame_idx
       AND (a.band0 = b.band0 OR a.band1 = b.band1
            OR a.band2 = b.band2 OR a.band3 = b.band3)
    ),
    shared AS (
      SELECT DISTINCT id_a, id_b, frame_idx
      FROM pairs WHERE hamming <= 8
    )
    SELECT id_a, id_b, COUNT(*) AS n_shared_frames
    FROM shared GROUP BY 1, 2 HAVING COUNT(*) >= 2
    """,
)
def multimodal_frame_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """multimodal / video-level near-dup — temporally-aligned frame
    dHash matching over a corpus with PLANTED re-ingested payloads:
    two videos are near-dups when ≥2 of their same-index sampled
    frames land within hamming 8 (the re-uploaded-clip detector;
    frame alignment keys the join so a clip matches a clip, not a
    coincidence of unrelated frames). Frame slicing is pure codegen
    substring; shuffles carry (id, frame_idx, band) ints
    (operators/multimodal.py:frame_neardup_pairs)."""
    from pyspark.sql import functions as F

    d = table(spark, sf_dir, "documents")
    planted = d.select("doc_id", "text").unionByName(
        d.filter(F.col("doc_id") < 50).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    )
    payload = mm.attach_binary_payload(planted)
    return mm.frame_neardup_pairs(
        payload,
        "doc_id",
        "payload",
        n_frames=4,
        frame_len=64,
        max_hamming=8,
        min_shared_frames=2,
    )


@query(
    "multimodal-scene-cuts",
    # 16 frames × 32 bytes per payload; a cut = consecutive-frame
    # dHash hamming ≥ 12 of 64 bits — all integer/bit ops
    oracle=f"""
    WITH p AS (
      SELECT doc_id, hex(encode(text)) AS full_hx,
             octet_length(encode(text)) AS fnb
      FROM documents
    ),
    f AS (
      SELECT doc_id, CAST(i AS INT) AS frame_idx,
             substr(full_hx,
                    CAST(i * greatest(fnb - 32, 0) // 15 AS INT) * 2 + 1,
                    CAST(least(32, fnb
                               - (i * greatest(fnb - 32, 0) // 15))
                         AS INT) * 2) AS hx,
             CAST(least(32, fnb - (i * greatest(fnb - 32, 0) // 15))
                  AS INT) AS nb
      FROM p, unnest(range(0, 16)) AS r(i)
      WHERE least(32, fnb - (i * greatest(fnb - 32, 0) // 15)) >= 2
    ),
    h AS (
      SELECT doc_id, frame_idx,
             {_dhash_band_cols()}
      FROM f
    ),
    d AS (
      SELECT doc_id, frame_idx,
             bit_count(xor(band0, LAG(band0) OVER w))
               + bit_count(xor(band1, LAG(band1) OVER w))
               + bit_count(xor(band2, LAG(band2) OVER w))
               + bit_count(xor(band3, LAG(band3) OVER w)) AS hamming_prev
      FROM h
      WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx)
    )
    SELECT doc_id, frame_idx, hamming_prev,
           COALESCE(hamming_prev >= 12, FALSE) AS is_cut
    FROM d
    """,
)
def multimodal_scene_cuts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """multimodal / scene-change detection — shot boundaries from
    consecutive-frame dHash distance (16 aligned frames per payload;
    a jump of ≥12/64 signature bits marks a cut). The keyframe-
    selection front door for video sampling budgets; per-doc LAG over
    16 int rows, payloads never shuffle
    (operators/multimodal.py:scene_cuts)."""
    docs = mm.attach_binary_payload(table(spark, sf_dir, "documents"))
    return mm.scene_cuts(
        docs, n_frames=16, frame_len=32, cut_threshold=12
    )


@query(
    "multimodal-aspect-buckets",
    # the nearest-ratio argmin is EXACT integer arithmetic
    # (|w·hb − wb·h|·(144/hb) orders like |w/h − wb/hb|), so the
    # oracle replays it verbatim with a VALUES bucket dim
    oracle="""
    WITH geo AS (
      SELECT doc_id,
             CAST(128 + (doc_id * 37) % 1920 AS BIGINT) AS w,
             CAST(128 + (doc_id * 73) % 1080 AS BIGINT) AS h
      FROM documents
    ),
    b(bidx, bucket_w, bucket_h, hweight) AS (
      VALUES (0,1,1,144), (1,4,3,48), (2,3,4,36), (3,3,2,72),
             (4,2,3,48), (5,16,9,16), (6,9,16,9)
    ),
    ranked AS (
      SELECT doc_id, bucket_w, bucket_h,
             abs(w * bucket_h - bucket_w * h) * hweight AS err,
             ROW_NUMBER() OVER (
               PARTITION BY doc_id
               ORDER BY abs(w * bucket_h - bucket_w * h) * hweight,
                        bidx
             ) AS rn
      FROM geo, b
    )
    SELECT bucket_w, bucket_h, COUNT(*) AS n_images,
           CAST(floor((COUNT(*) + 63) / 64) AS BIGINT) AS n_batches,
           CAST(floor((COUNT(*) + 63) / 64) AS BIGINT) * 64 - COUNT(*)
             AS pad_waste
    FROM ranked WHERE rn = 1
    GROUP BY bucket_w, bucket_h
    """,
)
def multimodal_aspect_buckets_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """multimodal / aspect-ratio bucketing — the multi-resolution
    batch-packing plan (images batch with like-shaped peers; SDXL-style
    bucket set). Geometry is synthesized deterministically from doc_id
    (the container has no pixel decoder; the media-header ops prove the
    real width/height path), then each image argmins over a broadcast
    7-row bucket dim in exact integer ratio arithmetic and the batch
    plan (ceil batches, padding waste) closes per bucket
    (operators/multimodal.py:aspect_bucket_assign/_batches)."""
    from pyspark.sql import functions as F

    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        (128 + (F.col("doc_id") * 37) % 1920).cast("bigint").alias("width"),
        (128 + (F.col("doc_id") * 73) % 1080).cast("bigint").alias("height"),
    )
    assigned = mm.aspect_bucket_assign(docs, "width", "height", "doc_id")
    return mm.aspect_bucket_batches(assigned, batch_size=64)
