"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decode/feature-extract as Arrow-batched Pandas operations over
``mapInPandas`` (north-star M4).

The container has no image/audio libraries, so the *decode kernels* are
stubbed two ways (both clearly marked):

- :func:`decode_image_stub` raises ``NotImplementedError`` — the seam
  where Pillow/torchvision/ffmpeg plugs in on a real cluster;
- :func:`fake_decode_image` is a deterministic fake (derives "width" /
  "height" / "format" from the bytes) so the Spark-side plumbing —
  schema, Arrow batch shapes, partitioning, UDF signature — is real and
  tested end-to-end.

Scale notes: payloads stay opaque ``binary`` columns end-to-end (never
stringified); ``mapInPandas`` streams Arrow record batches so peak memory
is one batch per core, not one partition; decode is map-only (no
shuffle); metadata lives in a sibling struct so pruning a metadata-only
query never touches the bytes (columnar parquet reads skip the blob
column entirely).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:
    import pandas as pd

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("checksum", T.StringType()),
    ]
)

DECODED_IMAGE_SCHEMA = (
    "doc_id bigint, byte_len bigint, width int, height int, format string"
)


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", media_type: str = "image/fake"
) -> DataFrame:
    """Demo payload builder: encodes the text column as the opaque binary
    blob (fixtures ship no real media) + the typed metadata struct every
    multimodal row carries."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.length(payload).cast("long").alias("byte_len"),
            F.md5(payload).alias("checksum"),
        ),
    )


def decode_image_stub(pdf: "pd.DataFrame") -> "pd.DataFrame":
    """REAL-DECODE SEAM — intentionally unimplemented in this container.

    On a cluster with Pillow installed, replace the body with
    ``PIL.Image.open(io.BytesIO(b))`` per payload and return the same
    schema as :func:`fake_decode_image`.
    """
    raise NotImplementedError(
        "image decode requires Pillow/libvips, not present in this container; "
        "use fake_decode_image for plumbing tests"
    )


def fake_decode_image(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
    """DETERMINISTIC FAKE decode kernel (mapInPandas signature).

    Derives pseudo width/height from byte length — stands in for a real
    decoder so batch shape, schema, and distribution are exercised.
    """
    for pdf in batches:
        lens = pdf["payload"].map(len)
        yield type(pdf)(
            {
                "doc_id": pdf["doc_id"],
                "byte_len": lens,
                "width": (lens % 640).astype("int32"),
                "height": (lens % 480).astype("int32"),
                "format": "FAKE",
            }
        )


def decode_images(df: DataFrame, use_real_decoder: bool = False) -> DataFrame:
    """Decode the payload column into image metadata via Arrow-batched
    ``mapInPandas``. ``use_real_decoder=True`` hits the unimplemented
    seam (raises at execution time in this container)."""
    if use_real_decoder:
        def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
            for pdf in batches:
                yield decode_image_stub(pdf)
    else:
        kernel = fake_decode_image
    return df.select("doc_id", "payload").mapInPandas(
        kernel, schema=DECODED_IMAGE_SCHEMA
    )


RESIZED_SCHEMA = (
    "doc_id bigint, width int, height int, target_w int, target_h int, "
    "scale_x double, scale_y double"
)


def resize_images(df: DataFrame, target_w: int = 224, target_h: int = 224) -> DataFrame:
    """Resize plumbing via ``mapInPandas`` — the fake kernel derives the
    source dims like :func:`fake_decode_image` and reports the scale
    factors a real resampler (Pillow ``Image.resize``) would apply.
    Map-only; one Arrow batch in flight per core."""

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            lens = pdf["payload"].map(len)
            w = (lens % 640).astype("int32")
            h = (lens % 480).astype("int32")
            yield type(pdf)(
                {
                    "doc_id": pdf["doc_id"],
                    "width": w,
                    "height": h,
                    "target_w": target_w,
                    "target_h": target_h,
                    "scale_x": (target_w / w.where(w != 0)).round(6),
                    "scale_y": (target_h / h.where(h != 0)).round(6),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(kernel, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_checksum string"


def sample_frames(df: DataFrame, max_frames: int = 5) -> DataFrame:
    """Frame-sampling plumbing (video analog): each payload expands to
    ``byte_len % max_frames + 1`` frame rows — the 1→N output shape a
    real ffmpeg frame sampler produces. Frame identity is a deterministic
    checksum of (payload, frame_idx) so results are engine-comparable.
    Map-only with batch-local expansion; no shuffle."""
    import hashlib

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            ids, idxs, sums = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload) % max_frames + 1
                for i in range(n):
                    ids.append(doc_id)
                    idxs.append(i)
                    sums.append(
                        hashlib.md5(payload + str(i).encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_checksum": sums}
            ).astype({"frame_idx": "int32"})

    return df.select("doc_id", "payload").mapInPandas(kernel, schema=FRAME_SCHEMA)


AUDIO_FEATURES_SCHEMA = (
    "doc_id bigint, duration_ms bigint, n_channels int, rms double"
)


def extract_audio_features(df: DataFrame) -> DataFrame:
    """Audio feature-extract plumbing — the fake kernel derives
    duration/channels/RMS deterministically from the bytes (the seam
    where librosa/torchaudio plugs in on a real cluster)."""

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            lens = pdf["payload"].map(len)
            yield type(pdf)(
                {
                    "doc_id": pdf["doc_id"],
                    "duration_ms": (lens * 20).astype("int64"),
                    "n_channels": (lens % 2 + 1).astype("int32"),
                    "rms": ((lens % 1000) / 1000.0).round(6),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(
        kernel, schema=AUDIO_FEATURES_SCHEMA
    )


def media_metadata_only(df: DataFrame) -> DataFrame:
    """Metadata projection — never touches the payload bytes (column
    pruning drops the blob at the parquet scan)."""
    return df.select(
        "doc_id",
        F.col("media_meta.media_type").alias("media_type"),
        F.col("media_meta.byte_len").alias("byte_len"),
        F.col("media_meta.checksum").alias("checksum"),
    )


# ---------------------------------------------------------------------------
# Perceptual-hash near-duplicate detection (image dedup plumbing)
# ---------------------------------------------------------------------------

PHASH_SCHEMA = "doc_id bigint, sig array<int>"

_PHASH_CELLS = 64
_PHASH_CHUNKS = 4  # 4 × 16-bit chunks -> pigeonhole pairs at hamming <= 3


def average_hash_kernel(
    batches: Iterator["pd.DataFrame"],
) -> Iterator["pd.DataFrame"]:
    """DETERMINISTIC average-hash kernel (``mapInPandas`` signature):
    split each payload into 64 equal byte cells, bit = cell mean above
    the global mean, packed into 4 × 16-bit int chunks (the
    :func:`~dirty_js_etl_spark.operators.dedup.chunked_signature_pairs`
    signature layout).

    REAL-DECODER SEAM: a production image pipeline decodes pixels and
    applies DCT (pHash) or resampling (aHash) before thresholding —
    byte cells stand in here (no image libs in this container). Small
    payload perturbations flip few cells, so hamming distance tracks
    payload similarity — the property the pairing layer needs.
    """
    import numpy as np

    for pdf in batches:
        sigs = []
        for b in pdf["payload"]:
            arr = np.frombuffer(bytes(b), dtype=np.uint8)
            if arr.size == 0:
                sigs.append([0] * _PHASH_CHUNKS)
                continue
            # pad to a multiple of 64 cells, cell means vs global mean
            cells = np.array_split(arr.astype(np.float64), _PHASH_CELLS)
            means = np.array([c.mean() if c.size else 0.0 for c in cells])
            bits = (means > arr.mean()).astype(np.int64)
            chunks = []
            per = _PHASH_CELLS // _PHASH_CHUNKS
            for c in range(_PHASH_CHUNKS):
                word = 0
                for i in range(per):
                    word |= int(bits[c * per + i]) << i
                chunks.append(word)
            sigs.append(chunks)
        yield type(pdf)({"doc_id": pdf["doc_id"], "sig": sigs})


def phash_signatures(df: DataFrame) -> DataFrame:
    """Arrow-batched perceptual signatures ``(doc_id, sig)`` for the
    payload column. Map-only — the expensive decode+hash never shuffles
    payload bytes; only the 4-int signature table moves downstream."""
    return df.select("doc_id", "payload").mapInPandas(
        average_hash_kernel, schema=PHASH_SCHEMA
    )


def phash_near_dup_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Image near-dup pairs: perceptual signature (map-only kernel) +
    the shared pigeonhole chunk join (``dedup.chunked_signature_pairs``).
    At 100 TB the payload bytes stay in the scan stage; what shuffles is
    the (id, chunk) table — same cost profile as SimHash text dedup.
    Returns ``(id_a, id_b, hamming)``.
    """
    from dirty_js_etl_spark.operators.dedup import chunked_signature_pairs

    base = phash_signatures(df).select(F.col("doc_id").alias("id"), "sig")
    return chunked_signature_pairs(base, max_hamming, max_bucket_size)
