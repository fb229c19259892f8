"""Multimodal columns: opaque binary payloads + typed metadata, with
decode / feature-extract / resize / frame-sample stages as
Arrow-batched ``mapInPandas`` operators.

Layout principle (100 TB): media bytes ride as a ``binary`` column
next to typed metadata so relational pruning/filtering happens on
metadata WITHOUT touching the bytes (parquet column pruning skips the
binary column entirely for metadata-only queries). Decode runs only
after pruning, batch-wise, in Python workers.

The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so
the decode kernels are STUBS: ``decode_stub=True`` (default) derives
deterministic fake features from the bytes, and ``decode_stub=False``
raises NotImplementedError at plan-build time. The Spark-side
plumbing — schema, partitioning, UDF signature, batch shape — is real
and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_DDL = (
    "media_id bigint, payload binary, "
    "meta struct<mime:string, n_bytes:bigint, origin:string>"
)

FEATURES_DDL = (
    "media_id bigint, mime string, n_bytes bigint, "
    "width int, height int, n_frames int, checksum bigint"
)


def attach_binary_payload(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", origin_col: str = "source"
) -> DataFrame:
    """Wrap a source column as a multimodal (payload, meta) pair.

    Here the payload is UTF-8 text bytes (the container has no media
    files); with real media the payload column comes from
    ``spark.read.format("binaryFile")`` and meta from its metadata.
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.col(origin_col).alias("origin"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, int]:
    """Deterministic stand-in for a real decoder: pseudo width/height/
    frame-count derived from the byte content."""
    checksum = sum(payload[:256]) + len(payload)
    width = 64 + checksum % 1856
    height = 64 + (checksum // 7) % 1016
    n_frames = 1 + checksum % 30
    return width, height, n_frames, checksum


def extract_features(
    media: DataFrame, decode_stub: bool = True, batch_hint: int = 1024
) -> DataFrame:
    """Decode + feature-extract as mapInPandas (Arrow batches in,
    Arrow batches out — never row-at-a-time).

    At scale: repartition upstream so each task holds
    O(batch_hint) payloads; the binary column is only deserialized
    inside the Python worker that decodes it.
    """
    if not decode_stub:
        raise NotImplementedError(
            "real media decoding needs PIL/ffmpeg, absent from this container; "
            "pass decode_stub=True for the deterministic fake decoder"
        )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_decode(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": [m["mime"] for m in pdf["meta"]],
                    "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "n_frames": [f[2] for f in feats],
                    "checksum": [f[3] for f in feats],
                }
            )

    return media.mapInPandas(decode_batches, schema=FEATURES_DDL)


def resize_stub(media: DataFrame, max_dim: int = 512, decode_stub: bool = True) -> DataFrame:
    """Resize stage stub: passes payload through, records the target
    size in meta (a real kernel re-encodes bytes per batch)."""
    if not decode_stub:
        raise NotImplementedError("real resize needs an image codec")
    return media.withColumn(
        "meta",
        F.struct(
            F.col("meta.mime").alias("mime"),
            F.col("meta.n_bytes").alias("n_bytes"),
            F.concat(F.col("meta.origin"), F.lit(f"|resized<{max_dim}")).alias("origin"),
        ),
    )


def frame_sample(features: DataFrame, every_n: int = 5) -> DataFrame:
    """Frame sampling plan over extracted features: one row per
    sampled frame index — pure sequence/explode, no Python."""
    return features.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    )
