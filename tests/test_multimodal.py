"""Multimodal plumbing tests: binary payloads stay opaque, metadata
projection prunes the blob, fake decode streams Arrow batches with the
declared schema, real-decode seam raises cleanly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dirty_js_etl_spark.operators.multimodal import (
    attach_binary_payload,
    decode_images,
    media_metadata_only,
)


@pytest.fixture(scope="module")
def media(spark, catalog):
    return attach_binary_payload(catalog.read("documents").limit(50))


def test_payload_is_binary(media):
    assert dict(media.dtypes)["payload"] == "binary"
    assert dict(media.dtypes)["media_meta"].startswith("struct<")


def test_metadata_matches_bytes(media):
    row = media.select(
        F.length("payload").alias("n"), F.col("media_meta.byte_len").alias("m")
    ).collect()
    assert all(r["n"] == r["m"] for r in row)


def test_metadata_only_prunes_payload(media):
    out = media_metadata_only(media)
    assert "payload" not in out.columns
    assert out.count() == 50


def test_fake_decode_schema_and_determinism(spark, media):
    out = decode_images(media)
    assert out.columns == ["doc_id", "byte_len", "width", "height", "format"]
    a = sorted(tuple(r) for r in out.collect())
    b = sorted(tuple(r) for r in decode_images(media).collect())
    assert a == b  # deterministic fake
    assert all(r[4] == "FAKE" for r in a)
    assert all(0 <= r[2] < 640 and 0 <= r[3] < 480 for r in a)


def test_real_decoder_seam_raises(spark, media):
    with pytest.raises(Exception, match="(?i)pillow|notimplemented"):
        decode_images(media, use_real_decoder=True).collect()
