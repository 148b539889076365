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
