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


def _make_png(w: int, h: int, color_type: int = 2) -> bytes:
    """A fully valid PNG (correct CRCs, zlib IDAT) via stdlib only."""
    import struct
    import zlib
    from binascii import crc32

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    raw = b"".join(b"\x00" + b"\x7f" * (w * nch) for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _make_jpeg(w: int, h: int, ncomp: int = 3) -> bytes:
    """A structurally valid JPEG header stream: SOI, APP0/JFIF, SOF0."""
    import struct

    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof_payload = struct.pack(">BHHB", 8, h, w, ncomp) + bytes(
        3 * ncomp
    )
    return (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
        + b"\xff\xc0" + struct.pack(">H", len(sof_payload) + 2) + sof_payload
        + b"\xff\xd9"
    )


def _make_wav(rate: int, nch: int, nframes: int) -> bytes:
    """A real WAV file via the stdlib wave module."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(nch)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(b"\x01\x02" * nch * nframes)
    return buf.getvalue()


def test_parse_media_header_real_formats():
    """The header parser performs REAL decode on valid files of every
    supported container format — no codec library involved."""
    assert mm.parse_media_header(_make_png(640, 480)) == (
        "png", 640, 480, 3, None, None,
    )
    assert mm.parse_media_header(_make_png(8, 4, color_type=6)) == (
        "png", 8, 4, 4, None, None,
    )
    assert mm.parse_media_header(_make_jpeg(1024, 768)) == (
        "jpeg", 1024, 768, 3, None, None,
    )
    gif = b"GIF89a" + (320).to_bytes(2, "little") + (200).to_bytes(2, "little")
    assert mm.parse_media_header(gif + b"\x00" * 4) == (
        "gif", 320, 200, None, None, None,
    )

    # WAV: cross-check our parser against the stdlib wave reader
    import io
    import wave

    wav = _make_wav(16_000, 2, 777)
    with wave.open(io.BytesIO(wav)) as f:
        expect = ("wav", None, None, f.getnchannels(), f.getframerate(),
                  f.getnframes())
    assert mm.parse_media_header(wav) == expect

    assert mm.parse_media_header(b"plain text payload")[0] == "unknown"
    assert mm.parse_media_header(b"")[0] == "unknown"


def test_parse_media_header_jpeg_fill_bytes():
    """ITU T.81 B.1.1.2 allows any number of 0xFF fill bytes before a
    marker; the parser must skip them instead of reading a bogus
    segment length out of the padding."""
    import struct

    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof_payload = struct.pack(">BHHB", 8, 480, 640, 3) + bytes(9)
    padded = (
        b"\xff\xd8"
        + b"\xff" * 5  # fill bytes straight after SOI
        + b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
        + b"\xff\xff\xff"  # fill bytes between segments
        + b"\xff\xc0" + struct.pack(">H", len(sof_payload) + 2) + sof_payload
        + b"\xff\xd9"
    )
    assert mm.parse_media_header(padded) == ("jpeg", 640, 480, 3, None, None)


def test_media_headers_mapinpandas(spark):
    """The distributed profiling pass decodes mixed-format payloads in
    one Arrow-batched scan."""
    rows = [
        (1, _make_png(33, 17)),
        (2, _make_jpeg(64, 32, ncomp=1)),
        (3, _make_wav(44_100, 1, 1000)),
        (4, b"not media at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in mm.media_headers(df, "doc_id").collect()}
    assert (out[1].format, out[1].width, out[1].height, out[1].channels) == (
        "png", 33, 17, 3,
    )
    assert (out[2].format, out[2].width, out[2].height, out[2].channels) == (
        "jpeg", 64, 32, 1,
    )
    assert (out[3].format, out[3].sample_rate_hz, out[3].n_samples) == (
        "wav", 44_100, 1000,
    )
    assert out[4].format == "unknown"
    assert out[4].width is None


def test_decode_image_features_real_dims_without_codec(spark):
    """Without PIL, recognized image payloads still decode REAL
    dimensions (header parse); unrecognized payloads keep the marked
    deterministic fake, so existing fixtures/oracles are unaffected."""
    rows = [(1, _make_png(99, 55)), (2, b"\x05text payload\x09")]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in mm.decode_image_features(df).collect()}
    if mm._try_real_image_decoder() is None:
        assert (out[1].width, out[1].height, out[1].channels) == (99, 55, 3)
        assert (out[2].width, out[2].height) == (0x05 + 1, 0x09 + 1)  # fake
    else:  # container has PIL: the real-decoder branch owns row 1
        assert (out[1].width, out[1].height) == (99, 55)
