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


def test_resize_scale_factors(spark, media):
    from dirty_js_etl_spark.operators.multimodal import resize_images

    out = resize_images(media, target_w=224, target_h=112).collect()
    assert len(out) == 50
    for r in out:
        if r["width"]:
            assert r["scale_x"] == pytest.approx(224 / r["width"], rel=1e-5)
        else:
            assert r["scale_x"] is None
        assert r["target_h"] == 112


def test_frame_sample_expansion(spark, media):
    """1->N expansion: each doc yields byte_len % 5 + 1 frames with
    distinct indices and per-frame checksums."""
    from dirty_js_etl_spark.operators.multimodal import sample_frames

    frames = sample_frames(media, max_frames=5)
    per_doc = frames.groupBy("doc_id").count()
    want = media.select(
        "doc_id", (F.length("payload") % 5 + 1).alias("n")
    )
    joined = per_doc.join(want, "doc_id")
    assert joined.filter(F.col("count") != F.col("n")).isEmpty()
    # frame checksums unique within a doc (payload+idx keyed)
    assert (
        frames.groupBy("doc_id", "frame_checksum").count().filter("count > 1").isEmpty()
    )


def test_audio_features_deterministic(spark, media):
    from dirty_js_etl_spark.operators.multimodal import extract_audio_features

    out = extract_audio_features(media)
    assert out.columns == ["doc_id", "duration_ms", "n_channels", "rms"]
    rows = out.collect()
    assert all(r["n_channels"] in (1, 2) for r in rows)
    assert all(0.0 <= r["rms"] < 1.0 for r in rows)


# ---------------------------------------------------------------------------
# Perceptual-hash near-dup (average-hash kernel + pigeonhole pairing)
# ---------------------------------------------------------------------------


def test_phash_identical_payloads_pair_at_zero(spark):
    from dirty_js_etl_spark.operators.multimodal import (
        attach_binary_payload,
        phash_near_dup_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog " * 8
    perturbed = base.replace("quick", "quack", 1)
    unrelated = "zq " + "xv kj qw zz pp mm nn oo " * 16
    df = attach_binary_payload(
        spark.createDataFrame(
            [(1, base), (2, base), (3, perturbed), (4, unrelated)],
            "doc_id long, text string",
        )
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash_near_dup_pairs(df, max_hamming=3).collect()
    }
    assert pairs[(1, 2)] == 0  # identical payloads
    assert (1, 3) in pairs and pairs[(1, 3)] <= 3  # tiny perturbation
    assert (1, 4) not in pairs and (2, 4) not in pairs


def test_phash_signature_deterministic(spark, catalog):
    from dirty_js_etl_spark.operators.multimodal import (
        attach_binary_payload,
        phash_signatures,
    )

    docs = attach_binary_payload(catalog.read("documents").limit(50))
    a = sorted(map(tuple, phash_signatures(docs).collect()))
    b = sorted(map(tuple, phash_signatures(docs.repartition(5)).collect()))
    assert a == b
