"""Multimodal (image/audio/video) column operators.

Media payloads are opaque ``binary`` columns with typed metadata — the
same discipline as the ``html`` column in the pages table.  The Spark-side
plumbing (schemas, batch iteration, partition sizing) is real and tested;
the codec work itself is STUBBED behind ``NotImplementedError`` or a
deterministic fake because the image/audio libraries are not in this
container — swap ``_decode_image_stub`` for PIL/libvips in deployment and
nothing else changes.

Every operator is a ``mapInPandas`` batch iterator: media decode is
CPU-heavy per-row Python work, exactly the case where Arrow-batched Python
beats both JVM UDFs (no codecs) and row-at-a-time Python (serde).
Partition sizing note: media rows are large — repartition so a partition's
payload fits executor memory (``spark.sql.files.maxPartitionBytes`` does
this for file sources; explicit ``repartition`` after joins).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

MEDIA_META_SCHEMA = (
    "id string, n_bytes int, content_sha256 string, format string, "
    "width int, height int"
)


def _sniff_format(b: bytes) -> str:
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if b[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return "wav"
    if b[4:8] == b"ftyp":
        return "mp4"
    return "unknown"


def _decode_image_stub(b: bytes) -> tuple[int, int]:
    """STUB decode: deterministic fake dimensions from the content hash.

    Replace with `PIL.Image.open(io.BytesIO(b)).size` in deployment; the
    call signature and the surrounding batch plumbing stay identical."""
    h = hashlib.sha256(b).digest()
    return (64 + h[0] % 192, 64 + h[1] % 192)


def media_metadata(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """Size, content hash, sniffed container format, (stub-)decoded
    dimensions for every media row."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = pdf[bin_col]
            out = pd.DataFrame(
                {
                    "id": pdf[id_col].astype(str),
                    "n_bytes": blobs.map(lambda b: len(b) if b is not None else 0),
                    "content_sha256": blobs.map(
                        lambda b: hashlib.sha256(b).hexdigest() if b is not None else None
                    ),
                    "format": blobs.map(
                        lambda b: _sniff_format(bytes(b)) if b else "empty"
                    ),
                }
            )
            dims = blobs.map(lambda b: _decode_image_stub(bytes(b)) if b else (0, 0))
            out["width"] = dims.map(lambda t: t[0]).astype("int32")
            out["height"] = dims.map(lambda t: t[1]).astype("int32")
            yield out

    return df.select(id_col, bin_col).mapInPandas(batches, MEDIA_META_SCHEMA)


def resize_images(df: DataFrame, id_col: str, bin_col: str,
                  width: int = 224, height: int = 224) -> DataFrame:
    """Image resize plumbing; the resample itself is a stub."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            raise NotImplementedError(
                "image resample requires PIL/libvips (not in this container); "
                "plumbing verified via media_metadata"
            )
            yield pdf  # pragma: no cover

    return df.select(id_col, bin_col).mapInPandas(
        batches, f"{id_col} string, {bin_col} binary"
    )


def sample_video_frames(df: DataFrame, id_col: str, bin_col: str,
                        every_n_seconds: float = 1.0) -> DataFrame:
    """Frame-sampling plumbing (1 row in -> N frame rows out via
    mapInPandas); decode stubbed pending ffmpeg bindings."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            raise NotImplementedError(
                "video decode requires ffmpeg bindings (not in this container)"
            )
            yield pdf  # pragma: no cover

    return df.select(id_col, bin_col).mapInPandas(
        batches, f"{id_col} string, frame_idx int, frame binary"
    )
