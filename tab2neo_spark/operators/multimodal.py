"""Multimodal (image/audio/video) column operators.

Media payloads are opaque ``binary`` columns with typed metadata — the
same discipline as the ``html`` column in the pages table.  The Spark-side
plumbing (schemas, batch iteration, partition sizing) is real and tested.
Codec coverage is two-tier:

- **netpbm (P5/P6) is decoded for real** — a pure-numpy codec (the format
  is a whitespace header + raw bytes), so decode, resize, and video
  frame-sampling run end-to-end with no external libraries;
- **baseline JPEG is decoded for real** too — a from-spec pure-Python
  codec (operators/jpeg.py: Huffman entropy decode, IDCT, 4:2:0/4:2:2
  chroma upsampling, YCbCr->RGB) with a minimal encoder for in-container
  round-trip tests; progressive JPEG raises NotImplementedError;
- png/wav/mp4 are sniffed by magic bytes (png dims header-parsed), but
  their pixel decode raises ``NotImplementedError`` because the codec
  libraries are not in this container — swap :func:`decode_pixels` for
  PIL/libvips in deployment and nothing else changes.

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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_META_SCHEMA = (
    "id string, n_bytes int, content_sha256 string, format string, "
    "width int, height int, decoded boolean"
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
    if b[:2] in (b"P5", b"P6"):
        return "pgm" if b[:2] == b"P5" else "ppm"
    return "unknown"


# -- real codec: netpbm binary (P5 gray / P6 rgb) ---------------------------


def netpbm_decode(b: bytes, offset: int = 0) -> tuple[np.ndarray, int]:
    """Decode one P5/P6 image starting at ``offset``; returns (pixels as
    H x W [x 3] uint8 array, offset past the image). Pure numpy — header is
    ASCII tokens (comments allowed), payload is raw bytes."""
    magic = b[offset : offset + 2]
    if magic not in (b"P5", b"P6"):
        raise ValueError(f"not a binary netpbm image at offset {offset}: {magic!r}")
    pos = offset + 2
    tokens: list[int] = []
    while len(tokens) < 3:
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if b[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(b) and b[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(b[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    channels = 3 if magic == b"P6" else 1
    n = w * h * channels
    pixels = np.frombuffer(b, dtype=np.uint8, count=n, offset=pos)
    shape = (h, w, 3) if channels == 3 else (h, w)
    return pixels.reshape(shape), pos + n


def netpbm_encode(arr: np.ndarray) -> bytes:
    """Encode an H x W (gray) or H x W x 3 (rgb) uint8 array as P5/P6."""
    magic = b"P6" if arr.ndim == 3 else b"P5"
    h, w = arr.shape[:2]
    return magic + f"\n{w} {h}\n255\n".encode() + arr.astype(np.uint8).tobytes()


def _nearest_resize(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    src_h, src_w = arr.shape[:2]
    ys = (np.arange(height) * src_h) // height
    xs = (np.arange(width) * src_w) // width
    return arr[ys][:, xs]


def jpeg_dims(b: bytes) -> tuple[int | None, int | None]:
    """(width, height) from a JPEG stream's SOFn segment — a pure header
    walk over the public JPEG marker layout (``0xFF marker len payload``),
    no pixel decode and no codec library. Every SOF0-SOF15 frame header
    (except the non-frame DHT/JPG/DAC markers) carries precision(1),
    height(2), width(2) big-endian at payload offset 2. Returns
    ``(None, None)`` on any malformed/truncated stream rather than
    guessing."""
    if b[:3] != b"\xff\xd8\xff":
        return (None, None)
    pos, n = 2, len(b)
    while pos + 1 < n:
        if b[pos] != 0xFF:
            return (None, None)  # desynced — not a marker boundary
        while pos < n and b[pos] == 0xFF:  # fill bytes are legal padding
            pos += 1
        if pos >= n:
            return (None, None)
        marker = b[pos]
        pos += 1
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers carry no length
        if marker == 0xD9 or pos + 2 > n:  # EOI / truncated
            return (None, None)
        seglen = int.from_bytes(b[pos : pos + 2], "big")
        if seglen < 2:
            return (None, None)
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if pos + 7 > n:
                return (None, None)
            height = int.from_bytes(b[pos + 3 : pos + 5], "big")
            width = int.from_bytes(b[pos + 5 : pos + 7], "big")
            return (width, height)
        if marker == 0xDA:  # SOS: entropy-coded data follows; SOF precedes it
            return (None, None)
        pos += seglen
    return (None, None)


def png_dims(b: bytes) -> tuple[int | None, int | None]:
    """(width, height) from a PNG IHDR chunk — the first chunk is IHDR by
    spec, width/height big-endian at bytes 16-24. Header-only, no inflate."""
    if len(b) < 24 or b[:8] != b"\x89PNG\r\n\x1a\n" or b[12:16] != b"IHDR":
        return (None, None)
    return (
        int.from_bytes(b[16:20], "big"),
        int.from_bytes(b[20:24], "big"),
    )


def _decode_dims(b: bytes) -> tuple[int | None, int | None]:
    """(width, height) — pixel-decoded for netpbm, header-parsed for
    jpeg/png (:func:`jpeg_dims`/:func:`png_dims` — real values, no codec
    needed), ``(None, None)`` for formats this container can't even
    header-parse (wav/mp4/unknown). Downstream must be able to tell real
    metadata from absent metadata, so unknown formats report NULL dims —
    never a fabricated value — and ``decoded`` stays ``false`` unless the
    PIXELS are decodable (netpbm only here). Swap this for
    ``PIL.Image.open(io.BytesIO(b)).size`` in deployment — the signature
    and all surrounding batch plumbing stay identical."""
    if b[:2] in (b"P5", b"P6"):
        arr, _ = netpbm_decode(b)
        return (arr.shape[1], arr.shape[0])
    if b[:3] == b"\xff\xd8\xff":
        return jpeg_dims(b)
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        return png_dims(b)
    return (None, None)


def media_metadata(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """Size, content hash, sniffed container format, dimensions per media
    row. Dimensions are REAL — pixel-decoded (netpbm) or header-parsed
    (jpeg SOFn / png IHDR) — or NULL when the format can't even be
    header-parsed; never fabricated. ``decoded`` is strictly "pixels were
    decoded in THIS pass" (netpbm — the only format whose dims come from
    an actual decode): a jpeg row carries true header-parsed width/height
    with ``decoded = false`` even though baseline streams ARE decodable
    via :func:`decode_pixels` (resize_images exercises that), so
    downstream pixel ops
    know the payload still needs a real codec."""

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
            dims = blobs.map(lambda b: _decode_dims(bytes(b)) if b else (None, None))
            out["width"] = dims.map(lambda t: t[0]).astype("Int32")
            out["height"] = dims.map(lambda t: t[1]).astype("Int32")
            # decoded = pixels decodable (netpbm), NOT merely dims known —
            # jpeg/png rows have header-parsed dims but no pixel codec here
            out["decoded"] = out["format"].isin(["pgm", "ppm"]) & out[
                "width"
            ].notna()
            yield out

    return df.select(id_col, bin_col).mapInPandas(batches, MEDIA_META_SCHEMA)


def decode_pixels(b: bytes) -> np.ndarray:
    """Decode a media payload to a uint8 pixel array: netpbm via the
    pure-numpy codec, baseline JPEG via the from-spec pure-Python codec
    (operators/jpeg.py — Huffman + IDCT + chroma upsampling; progressive
    streams raise NotImplementedError). Other formats raise until
    PIL/libvips is swapped in at deployment."""
    raw = bytes(b)
    if raw[:2] in (b"P5", b"P6"):
        arr, _ = netpbm_decode(raw)
        return arr
    if raw[:3] == b"\xff\xd8\xff":
        from tab2neo_spark.operators.jpeg import decode_jpeg

        return decode_jpeg(raw)
    raise NotImplementedError(
        f"pixel decode of {_sniff_format(raw)!r} requires PIL/libvips "
        "(not in this container); netpbm and baseline JPEG decode natively"
    )


def resize_images(df: DataFrame, id_col: str, bin_col: str,
                  width: int = 224, height: int = 224) -> DataFrame:
    """Nearest-neighbor resize — REAL for netpbm AND baseline-JPEG
    payloads (pure numpy/Python codecs, no libraries); the output
    container is netpbm (decode-to-raw stage semantics: downstream
    training pipelines want raw pixels, not re-encoded JPEG)."""

    def resize_one(b: bytes) -> bytes:
        arr = decode_pixels(b)
        return netpbm_encode(_nearest_resize(arr, width, height))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype(str),
                    bin_col: pdf[bin_col].map(resize_one),
                }
            )

    return df.select(id_col, bin_col).mapInPandas(
        batches, f"{id_col} string, {bin_col} binary"
    )


def sample_video_frames(df: DataFrame, id_col: str, bin_col: str,
                        every_n_seconds: float = 1.0,
                        fps: float = 1.0) -> DataFrame:
    """Frame sampling: 1 media row in -> N frame rows out via mapInPandas.

    REAL for the netpbm-stream container (concatenated P6/P5 frames —
    what a decode-to-raw stage emits); every ``round(every_n_seconds *
    fps)``-th frame is kept. Container formats needing ffmpeg raise until
    the bindings are swapped in."""
    stride = max(1, round(every_n_seconds * fps))

    def frames_of(b: bytes) -> list[bytes]:
        if bytes(b[:2]) not in (b"P5", b"P6"):
            raise NotImplementedError(
                f"frame decode of {_sniff_format(bytes(b))!r} requires ffmpeg "
                "bindings (not in this container); netpbm streams split natively"
            )
        raw = bytes(b)
        out, pos = [], 0
        while pos < len(raw):
            arr, nxt = netpbm_decode(raw, pos)
            out.append(raw[pos:nxt])
            pos = nxt
        return out

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, blobs = [], [], []
            for _, row in pdf.iterrows():
                for i, frame in enumerate(frames_of(row[bin_col])):
                    if i % stride == 0:
                        ids.append(str(row[id_col]))
                        idxs.append(i)
                        blobs.append(frame)
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": pd.array(idxs, dtype="int32"),
                 "frame": blobs}
            )

    return df.select(id_col, bin_col).mapInPandas(
        batches, f"{id_col} string, frame_idx int, frame binary"
    )
