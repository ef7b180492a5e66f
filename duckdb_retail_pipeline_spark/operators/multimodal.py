"""Multimodal (image/audio/video) column plumbing.

Opaque media live as ``binary`` columns beside typed metadata
structs; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` so the Python-side work is amortized per batch, not
per row — the only sane shape for 100 TB of media.

The actual codecs (PIL / librosa / ffmpeg) are NOT in this container,
so ``decode_image`` raises ``NotImplementedError`` unless
``fake=True``, which substitutes a deterministic byte-statistics
"decode" with the exact same schema/batching/partitioning — the
Spark-side plumbing is real and tested; only the codec call is
stubbed (per the driver contract).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("content", BinaryType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_bytes", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("mean_byte", DoubleType()),
        StructField("byte_entropy", DoubleType()),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: pack the documents table into the media schema (text
    bytes as the opaque payload) so the binary plumbing is exercised
    on real driver testdata."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text/plain").alias("media_type"),
        F.encode("text", "utf-8").alias("content"),
        F.lit(None).cast("long").alias("width"),
        F.lit(None).cast("long").alias("height"),
        F.octet_length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
    )


def decode_image(content: bytes, fake: bool = False) -> dict:
    """Codec stub. Real implementation would be
    ``PIL.Image.open(io.BytesIO(content))`` — the imaging libs are
    not in this container, so only the deterministic fake path runs.
    """
    if not fake:
        raise NotImplementedError(
            "image codecs (PIL/ffmpeg) are not available in this environment; "
            "call with fake=True for the deterministic byte-stats decode"
        )
    import math

    n = len(content)
    counts: dict[int, int] = {}
    for byte in content:
        counts[byte] = counts.get(byte, 0) + 1
    mean = sum(content) / n if n else 0.0
    ent = -sum((c / n) * math.log2(c / n) for c in counts.values()) if n else 0.0
    return {"n_bytes": n, "mean_byte": mean, "byte_entropy": ent}


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over binary content.

    ``mapInPandas`` receives per-partition batch iterators; each batch
    is vectorized numpy work. Partitioning is whatever upstream chose
    — media tables should be written with size-balanced files so
    batches are uniform.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out_rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                buf = np.frombuffer(content or b"", dtype=np.uint8)
                n = int(buf.size)
                if n:
                    counts = np.bincount(buf, minlength=256)
                    p = counts[counts > 0] / n
                    ent = float(-(p * np.log2(p)).sum())
                    mean = float(buf.mean())
                else:
                    ent, mean = 0.0, 0.0
                out_rows.append((int(mid), n, round(mean, 4), round(ent, 4)))
            yield pd.DataFrame(
                out_rows, columns=["media_id", "n_bytes", "mean_byte", "byte_entropy"]
            )

    return media.select("media_id", "content").mapInPandas(_extract, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan* — emits (media_id, frame_idx) rows
    for frames a decoder would extract; the decode itself is the
    stubbed codec. Demonstrates the explode-based fan-out shape that
    keeps frame extraction parallel."""
    est_frames = (F.col("n_bytes") / F.lit(1000)).cast("long")
    return media.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(est_frames - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    )
