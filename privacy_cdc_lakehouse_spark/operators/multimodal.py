"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100 TB training-data lake stores images/audio/video as opaque
``binary`` columns (or object-store URIs) beside typed metadata, and
runs decode / feature-extract / resize / frame-sample as Arrow-batched
Pandas functions over ``mapInPandas`` — the pattern this module makes
real. The actual media codecs are not available in this container, so
the decode step is a clearly-marked deterministic stub
(``_stub_decode``); everything around it — schema, batching, partition
behavior, column pruning — is production-shaped.

Scale notes:
- ``mapInPandas`` streams Arrow batches; peak memory is one batch per
  core, so ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds
  memory for fat binary rows (set it down to ~256 for multi-MB blobs).
- Binary payloads never pass through Python row objects — Arrow keeps
  them as buffers end to end.
- For real codecs swap ``_stub_decode`` for PIL/ffmpeg calls; the
  Spark-side contract is unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id long, n_bytes long, first_byte int, checksum_mod int"
)


def _stub_decode(payload: bytes) -> dict:
    """Deterministic stand-in for a media decoder.

    Raises ``NotImplementedError`` for payloads claiming a real codec
    (magic bytes) — this container has no media libraries; synthetic
    payloads get deterministic fake features.
    """
    if payload[:4] in (b"\x89PNG", b"RIFF", b"\xff\xd8\xff\xe0"):
        raise NotImplementedError("real media decoding not available in this build")
    return {
        "n_bytes": len(payload),
        "first_byte": payload[0] if payload else -1,
        "checksum_mod": sum(payload) % 251,
    }


def decode_binary_features(df: DataFrame, binary_col: str = "payload", id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched decode: (id, binary) → typed feature rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf[binary_col].map(_stub_decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": feats.map(lambda f: f["n_bytes"]),
                    "first_byte": feats.map(lambda f: f["first_byte"]),
                    "checksum_mod": feats.map(lambda f: f["checksum_mod"]),
                }
            )

    return df.select(id_col, binary_col).mapInPandas(run, DECODED_SCHEMA)


def documents_as_binary(docs: DataFrame) -> DataFrame:
    """Treat document text as an opaque binary payload (fixture adapter)."""
    return docs.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )


RESIZED_SCHEMA = "doc_id long, payload binary, out_bytes long"


def resize_binary(
    df: DataFrame,
    width: int = 64,
    height: int = 64,
    binary_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """'Resize' an opaque payload to ≤ width×height bytes by
    deterministic nearest-neighbor stride sampling — the stub stands in
    for a real image resize (PIL absent in this container) but the
    Spark contract (Arrow batches in, binary column out, pruned input
    projection) is the production shape. Output length is exactly
    ``min(n_bytes, width*height)``, which gives the op an arithmetic
    oracle."""
    target = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def one(p: bytes) -> bytes:
                n = len(p)
                m = min(n, target)
                if m == n:
                    return p
                return bytes(p[i * n // m] for i in range(m))

            out = pdf[binary_col].map(one)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": out,
                    "out_bytes": out.map(len),
                }
            )

    return df.select(id_col, binary_col).mapInPandas(run, RESIZED_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx int, frame binary"


def frame_sample(
    df: DataFrame,
    frame_bytes: int = 256,
    every_n: int = 2,
    max_frames: int = 4,
    binary_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sample every ``every_n``-th fixed-size 'frame' (byte chunk) of a
    payload, up to ``max_frames`` — the video frame-sampling pattern:
    one input row fans out to ≤ max_frames frame rows, all inside one
    Arrow batch (no explode shuffle). The last chunk may be short;
    counts/bytes are exactly derivable, so the op has an arithmetic
    oracle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, p in zip(pdf[id_col], pdf[binary_col]):
                nchunks = (len(p) + frame_bytes - 1) // frame_bytes
                taken = 0
                for i in range(0, nchunks, every_n):
                    if taken >= max_frames:
                        break
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(p[i * frame_bytes : (i + 1) * frame_bytes])
                    taken += 1
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return df.select(id_col, binary_col).mapInPandas(run, FRAME_SCHEMA)
