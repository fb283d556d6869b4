"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the *decode* step is a
clearly-marked stub — but the Spark-side plumbing is real and tested:
schema (binary payload + struct metadata), Arrow batch shape
(mapInPandas over whole record batches so large blobs never go through
per-row pickling), and deterministic fake feature extraction used by
the oracle-checked query.

At 100 TB the pattern is: payloads stay in parquet binary columns,
partition by content size class, and run codec UDFs with
``mapInPandas`` so each python worker amortizes codec init over a
whole Arrow batch.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "doc_id long, n_bytes int, fake_width int, fake_height int, digest string"
)


def attach_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Treat each document's utf-8 bytes as an opaque media payload —
    the testdata has no real media, so text bytes stand in. Real
    pipelines land payloads directly as parquet binary columns."""
    return docs.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


def decode_image(payload: bytes) -> "object":
    """REAL-DECODE STUB: the container ships no image codecs.

    Production signature kept so the mapInPandas plumbing below is the
    real thing; swap the body for PIL/opencv when available."""
    raise NotImplementedError("image codecs not available in this container")


def extract_media_meta(docs_with_payload: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Emits deterministic fake width/height derived from the payload's
    md5 (so the DuckDB oracle can reproduce them) plus true byte
    length and digest. Batch-shaped exactly like a real decoder: one
    Arrow batch in, one out, no per-row python calls from the JVM."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            digests = payloads.map(lambda b: hashlib.md5(bytes(b)).hexdigest())
            hexv = "0123456789abcdef"
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "fake_width": digests.map(
                        lambda d: hexv.index(d[0]) * 16 + hexv.index(d[1])
                    ).astype("int32"),
                    "fake_height": digests.map(
                        lambda d: hexv.index(d[2]) * 16 + hexv.index(d[3])
                    ).astype("int32"),
                    "digest": digests,
                }
            )

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        _extract, MEDIA_META_SCHEMA
    )


FRAME_SCHEMA = "doc_id long, frame_idx int, n_frame_bytes int, frame_digest string"


def sample_frames(
    docs_with_payload: DataFrame, frame_bytes: int = 64, stride: int = 2
) -> DataFrame:
    """Frame sampling over binary payloads — the video-pipeline shape:
    one input row fans out to every ``stride``-th fixed-size frame
    window (only complete frames), emitted per Arrow batch via
    mapInPandas (a real decoder samples encoded frames the same way;
    the codec call is the only stub — windowing, 1→N batch expansion,
    schema, and digests are the production plumbing). Payloads shorter
    than one frame produce no rows."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids: list = []
            idxs: list = []
            sizes: list = []
            digests: list = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                for i in range(0, len(b) // frame_bytes, stride):
                    fr = b[i * frame_bytes : (i + 1) * frame_bytes]
                    doc_ids.append(doc_id)
                    idxs.append(i)
                    sizes.append(len(fr))
                    digests.append(hashlib.md5(fr).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(doc_ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "n_frame_bytes": pd.Series(sizes, dtype="int32"),
                    "frame_digest": pd.Series(digests, dtype="object"),
                }
            )

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        _sample, FRAME_SCHEMA
    )
