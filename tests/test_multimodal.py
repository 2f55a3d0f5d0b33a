"""Multimodal plumbing tests: oracle parity for byte features, stub
behavior for the image decode stage."""

from __future__ import annotations

import pytest

from medallion_delta_lake_spark.operators import multimodal as mm
from medallion_delta_lake_spark.plans import queries_multimodal  # noqa: F401
from medallion_delta_lake_spark.plans.registry import ORACLES, QUERIES, table
from tests.conftest import SF_SMOKE
from tests.oracle import compare_query


def test_byte_features_oracle_parity(spark):
    compare_query(
        spark, "multimodal-byte-features", QUERIES, ORACLES, SF_SMOKE
    )


def test_payload_metadata(spark):
    docs = mm.attach_binary_payload(table(spark, SF_SMOKE, "documents"))
    row = docs.select("media_meta", "payload", "text").first()
    assert row.media_meta.mime == "text/plain"
    assert row.media_meta.n_bytes == len(row.payload)
    assert bytes(row.payload).decode("utf-8") == row.text


def test_image_decode_stub(spark):
    docs = mm.attach_binary_payload(table(spark, SF_SMOKE, "documents"))
    if mm._try_real_image_decoder() is None:
        with pytest.raises(NotImplementedError):
            mm.decode_image_features(docs, allow_stub=False).count()
    feats = mm.decode_image_features(docs, allow_stub=True)
    rows = feats.collect()
    assert len(rows) == docs.count()
    assert all(r.channels == 3 and r.width >= 1 and r.height >= 1 for r in rows)


def test_sample_frames_bytes_match_python_slicing(spark):
    from medallion_delta_lake_spark.operators import multimodal as mm
    from pyspark.sql import functions as F

    texts = [(1, "a" * 10), (2, "x" * 300), (3, "hello world this is a payload")]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    frames = mm.sample_frames(
        mm.attach_binary_payload(df), n_frames=4, frame_len=64
    ).collect()
    raw = {i: t.encode() for i, t in texts}
    for r in frames:
        b = raw[r.doc_id]
        span = max(len(b) - 64, 0)
        off = r.frame_idx * span // 3
        assert r.byte_offset == off
        assert bytes(r.frame_bytes) == b[off : off + 64]
        assert r.frame_len == len(r.frame_bytes)
    # fan-out contract: 4 frames per payload
    assert len(frames) == 4 * len(texts)


def test_chunk_payload_reassembles_exactly(spark):
    from medallion_delta_lake_spark.operators import multimodal as mm

    texts = [(1, "q" * 700), (2, "short"), (3, "z" * 256)]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    chunks = mm.chunk_payload(
        mm.attach_binary_payload(df), chunk_len=256
    ).collect()
    by_doc = {}
    for r in sorted(chunks, key=lambda r: (r.doc_id, r.chunk_idx)):
        by_doc.setdefault(r.doc_id, b"")
        assert r.byte_offset == len(by_doc[r.doc_id])
        by_doc[r.doc_id] += bytes(r.chunk_bytes)
    for i, t in texts:
        assert by_doc[i] == t.encode()  # lossless cover, in order


def test_resize_stub_geometry_and_determinism(spark):
    from medallion_delta_lake_spark.operators import multimodal as mm

    df = spark.createDataFrame(
        [(1, "abc"), (2, "some longer payload")], "doc_id long, text string"
    )
    out = {
        r.doc_id: bytes(r.resized)
        for r in mm.resize_image(
            mm.attach_binary_payload(df), out_w=8, out_h=8
        ).collect()
    }
    assert all(len(b) == 8 * 8 * 3 for b in out.values())
    # deterministic fake: cyclic tiling of the payload
    assert out[1] == (b"abc" * (192 // 3 + 1))[:192]
