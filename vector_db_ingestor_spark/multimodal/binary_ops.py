"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (north star "multimodal columns").

The reference is text-only; a 100 TB training-data pipeline carries
media alongside text.  Design:

* media rows are ``(media_id, modality, content BINARY, meta STRUCT)``
  — the binary column is never interpreted by Spark itself (parquet
  stores it as BYTE_ARRAY; column pruning means queries that don't
  touch ``content`` never read those pages, which is the whole game at
  100 TB);
* decode / feature-extract / resize / frame-sample run as
  ``mapInPandas`` batch iterators so the (C-library) decoder is called
  per Arrow batch, not per row;
* the actual codec calls are STUBBED here — image/audio libraries are
  not in this container.  ``decode_stub=True`` (default) produces a
  deterministic fake decode from a sha256 digest chain of the bytes
  (sha256 so external engines can recompute it — the DuckDB oracle
  checks the stubbed features exactly), keeping the Spark-side
  plumbing (schema, batching, partitioning) real and testable;
  ``decode_stub=False`` raises NotImplementedError at the call site
  where Pillow/ffmpeg would plug in.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id LONG, modality STRING, content BINARY, "
    "meta STRUCT<width:INT, height:INT, sample_rate:INT, duration_ms:INT>"
)

FEATURE_SCHEMA = (
    "media_id LONG, modality STRING, feat_dim INT, features ARRAY<DOUBLE>, "
    "decode_ms DOUBLE"
)


def _fake_decode(content: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a real decoder+encoder: expands a
    sha256 digest chain of the bytes into `dim` floats in [-1, 1).

    sha256 (not a salted blake2) on purpose: every engine with a
    ``sha256()`` builtin — DuckDB included — can recompute the stub
    features, so even the stubbed decode path gets an exact
    cross-engine oracle (queries.py q_multimodal_features).  Each
    feature is ``(byte - 128) / 128`` — an exact dyadic rational, so
    sums of squares are bit-identical across engines.
    """
    out: list[float] = []
    digest = hashlib.sha256(content).digest()
    while True:
        out.extend((b - 128) / 128.0 for b in digest)
        if len(out) >= dim:
            return out[:dim]
        digest = hashlib.sha256(digest).digest()


def extract_features(
    media: DataFrame, dim: int = 16, decode_stub: bool = True
) -> DataFrame:
    """Batch feature extraction over the binary column via mapInPandas.

    Real implementation point: replace ``_fake_decode`` with
    Pillow/torchaudio/pyav decoding — the Spark plumbing (Arrow batch
    iterator, schema, narrow execution) is unchanged.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:  # pragma: no cover - no codec libs in image
                raise NotImplementedError(
                    "real media decoding requires Pillow/ffmpeg/torchaudio; "
                    "not available in this container — use decode_stub=True"
                )
            feats = [
                _fake_decode(bytes(c) if c is not None else b"", dim)
                for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "feat_dim": dim,
                    "features": feats,
                    "decode_ms": 0.0,
                }
            )

    return media.mapInPandas(op, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: 1->N explode of frame timestamps
    from typed metadata (duration), no decode needed — the decode of
    the selected frames would be a second mapInPandas pass over
    (media_id, frame_ts).  Demonstrates that N-per-row planning stays
    JVM-side even when decoding is Python-side."""
    return (
        media.filter(F.col("modality") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (no fixture exists)."""
    rows = []
    for i in range(n):
        payload = hashlib.blake2b(str(i).encode(), digest_size=64).digest()
        modality = ("image", "audio", "video")[i % 3]
        rows.append(
            (
                i,
                modality,
                bytearray(payload),
                (64 + i % 8, 48, 16000, 2500 + 500 * (i % 4)),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def resize_images(
    media: DataFrame, width: int, height: int, decode_stub: bool = True
) -> DataFrame:
    """Batch image resize: binary in -> binary out with updated typed
    metadata.  Stub transform is deterministic (digest-sized payload
    proportional to the target area) so schema/meta plumbing is real;
    a real implementation decodes with Pillow, resizes, re-encodes —
    same mapInPandas shape, still a narrow plan."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target_bytes = max(width * height // 64, 32)
        for pdf in batches:
            if not decode_stub:  # pragma: no cover - no codec libs in image
                raise NotImplementedError(
                    "real image resize requires Pillow; use decode_stub=True"
                )
            out_content = []
            for c in pdf["content"]:
                raw = bytes(c) if c is not None else b""
                buf = bytearray()
                counter = 0
                while len(buf) < target_bytes:
                    buf += hashlib.blake2b(
                        raw, digest_size=64, salt=counter.to_bytes(8, "big")
                    ).digest()
                    counter += 1
                out_content.append(bytes(buf[:target_bytes]))
            meta = pd.DataFrame(
                {
                    "width": width,
                    "height": height,
                    "sample_rate": [m["sample_rate"] for m in pdf["meta"]],
                    "duration_ms": [m["duration_ms"] for m in pdf["meta"]],
                }
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "content": out_content,
                    "meta": meta.to_dict("records"),
                }
            )

    return media.filter(F.col("modality") == "image").mapInPandas(
        op, schema=MEDIA_SCHEMA
    )
