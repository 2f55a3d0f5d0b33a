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
