"""Multimodal column plumbing: opaque binary media + typed metadata, with
decode / feature-extract / frame-sample stages as Arrow-batched
mapInPandas operators.

No reference counterpart; this is the north-star "multimodal columns"
extension. The container has no image/audio codecs, so the *codec call*
is stubbed exactly as the contract requires: when the real library is
absent the decode uses a clearly-marked deterministic fake (or raises
NotImplementedError in strict mode). Everything Spark-side is real and
tested: binary column schema, metadata struct, mapInPandas batch shape,
partitioning behavior.

Media derivation (fixture has no binary column): media = md5 digest bytes
of the text repeated (doc_id % 4 + 1) times -> 16..64 bytes, media_type
cycles image/audio/video. Deterministic, so metadata is DuckDB-oracle
checkable and features are replayable in tests.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load

MEDIA_TYPES = ("image", "audio", "video")
N_FEATURES = 8
FRAME_BYTES = 16

try:  # codec gate: none of these ship in this container
    from PIL import Image  # noqa: F401

    HAVE_IMAGE_CODEC = True
except ImportError:
    HAVE_IMAGE_CODEC = False


def attach_media(docs: DataFrame) -> DataFrame:
    """(doc_id, media binary, meta struct<media_type,n_bytes>): the opaque
    multimodal column layout. repeat(md5) keeps it deterministic."""
    digest = F.unhex(F.md5("text"))
    repeats = (F.col("doc_id") % 4 + 1).cast("int")
    # digest repeated `repeats` times: repeating the hex string and
    # unhexing once is byte-identical to concatenating the digest, and
    # stays a single codegen'd expression (one md5 per row) instead of an
    # interpreted higher-order aggregate re-hashing per element
    media = F.unhex(F.repeat(F.md5("text"), repeats))
    return docs.select(
        "doc_id",
        media.alias("media"),
        F.struct(
            F.element_at(
                F.array(*[F.lit(t) for t in MEDIA_TYPES]),
                (F.col("doc_id") % 3 + 1).cast("int"),
            ).alias("media_type"),
            (F.length(digest) * repeats).cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    return attach_media(load(spark, sf_dir, "documents", parallelize=True).select("doc_id", "text"))


def media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flattened metadata view (oracle-checkable)."""
    m = media_table(spark, sf_dir)
    return m.select(
        "doc_id",
        F.col("meta.media_type").alias("media_type"),
        F.col("meta.n_bytes").alias("n_bytes"),
    )


def _fake_decode(media: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for an image codec: dimensions derived from
    the first bytes. Clearly fake; replaced wholesale when a codec exists."""
    return media[0] % 64 + 1, media[1] % 64 + 1, media[2] % 3 + 1


def decode_media(df: DataFrame, strict: bool = False) -> DataFrame:
    """mapInPandas decode stage -> (doc_id, width, height, channels).

    Arrow moves the binary column in columnar batches; each pandas batch is
    decoded in bulk. strict=True always raises
    NotImplementedError (no real decode exists yet — the honest contract,
    codec installed or not); strict=False uses the
    deterministic fake so downstream plumbing stays testable.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                # no real decode path exists yet, codec installed or not —
                # strict mode must never present fake dims as real
                raise NotImplementedError(
                    "real media decode not implemented"
                    + ("" if HAVE_IMAGE_CODEC else " (and no codec installed)")
                    + "; run with strict=False for the deterministic fake"
                )
            dims = [_fake_decode(m) for m in pdf["media"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "channels": [d[2] for d in dims],
                }
            )

    return df.mapInPandas(
        decode, schema="doc_id bigint, width int, height int, channels int"
    )


def extract_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction -> (doc_id, features array<float>):
    N_FEATURES floats in [0,1) derived from the media digest — the batch
    shape and schema a real embedding model (ONNX/torch) would use."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for m in pdf["media"]:
                h = hashlib.md5(bytes(m)).digest()
                feats.append([h[i] / 256.0 for i in range(N_FEATURES)])
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return df.mapInPandas(featurize, schema="doc_id bigint, features array<float>")


def resize_media(df: DataFrame, target_bytes: int = 32, strict: bool = False) -> DataFrame:
    """mapInPandas resize stage -> (doc_id, media binary, n_bytes).

    A real implementation decodes, resamples to a target resolution, and
    re-encodes; without a codec the deterministic stand-in truncates or
    right-pads the payload by cycling it to ``target_bytes`` — preserving
    the contract a resize has (fixed-size output derived from input) so
    batch shape, schema, and downstream stages are testable. strict=True
    always raises NotImplementedError (no real resample exists yet)."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "real media resize not implemented"
                    + ("" if HAVE_IMAGE_CODEC else " (and no codec installed)")
                    + "; run with strict=False for the deterministic fake"
                )
            out = []
            for m in pdf["media"]:
                b = bytes(m)
                reps = (target_bytes + len(b) - 1) // len(b)
                out.append((b * reps)[:target_bytes])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": out,
                    "n_bytes": [len(o) for o in out],
                }
            )

    return df.mapInPandas(
        resize, schema="doc_id bigint, media binary, n_bytes bigint"
    )


def sample_frames(df: DataFrame, every: int = 2) -> DataFrame:
    """Frame sampling for video media: split the payload into FRAME_BYTES
    blocks and keep every ``every``-th -> (doc_id, frame_idx, frame binary).
    Pure column expressions (no Python): slicing is JVM-side."""
    frames = F.transform(
        F.sequence(
            F.lit(0),
            (F.length("media") / FRAME_BYTES).cast("int") - 1,
        ),
        lambda i: F.struct(
            i.alias("frame_idx"),
            F.substring(F.col("media"), i * FRAME_BYTES + 1, FRAME_BYTES).alias(
                "frame"
            ),
        ),
    )
    return (
        df.where(F.col("meta.media_type") == "video")
        .select("doc_id", F.explode(frames).alias("f"))
        .select("doc_id", F.col("f.frame_idx").alias("frame_idx"), F.col("f.frame").alias("frame"))
        .where(F.col("frame_idx") % every == 0)
    )


def q_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_meta(spark, sf_dir)


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_features(media_table(spark, sf_dir))


def q_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    fr = sample_frames(media_table(spark, sf_dir))
    return fr.select("doc_id", "frame_idx", F.hex("frame").alias("frame_hex"))
