"""Pure-Python baseline JPEG codec (operators/jpeg.py): encode->decode
round-trips, zigzag/quant-table order, color + chroma subsampling, and
the Spark resize plumbing over JPEG payloads."""

from __future__ import annotations

import struct

import numpy as np
import pytest


def test_gray_roundtrip_near_lossless():
    from tab2neo_spark.operators.jpeg import decode_jpeg, encode_jpeg_gray

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (24, 31), dtype=np.uint8)  # non-multiple of 8
    out = decode_jpeg(encode_jpeg_gray(img, 1))
    assert out.shape == (24, 31)
    # flat quant=1: the only error is DCT float rounding
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


def test_gray_roundtrip_asymmetric_quant_table():
    """A non-symmetric quantization table catches zigzag gather/scatter
    confusion (the DQT payload is zigzag-ordered; dequantization must
    SCATTER it to natural order)."""
    from tab2neo_spark.operators.jpeg import decode_jpeg, encode_jpeg_gray

    q = np.arange(1, 65).reshape(8, 8).T.reshape(64)  # asymmetric
    yy, xx = np.mgrid[0:40, 0:56]
    img = ((yy * 3 + xx * 2) % 256).astype(np.uint8)
    out = decode_jpeg(encode_jpeg_gray(img, q))
    err = np.abs(out.astype(int) - img.astype(int))
    assert out.shape == img.shape and err.max() <= 2


def _seg(marker, payload):
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _color_jpeg(y_dc: int, cb_dc: int, cr_dc: int, subsample: str) -> bytes:
    """Single-MCU flat color patch built from DC coefficients only —
    exercises 3-component interleave, per-component DC prediction, chroma
    upsampling, and the YCbCr->RGB matrix with exactly-known pixels."""
    from tab2neo_spark.operators.jpeg import (
        _AC_LUM_BITS, _AC_LUM_VALS, _BitWriter, _DC_LUM_BITS, _DC_LUM_VALS,
        _enc_table,
    )

    dc_codes = _enc_table(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_codes = _enc_table(_AC_LUM_BITS, _AC_LUM_VALS)

    def put_dc(w, diff):
        s = abs(diff).bit_length() if diff else 0
        c, ln = dc_codes[s]
        w.put(c, ln)
        if s:
            w.put(diff if diff > 0 else diff + (1 << s) - 1, s)
        c, ln = ac_codes[0x00]  # EOB
        w.put(c, ln)

    w = _BitWriter()
    if subsample == "444":
        hv, size = [(1, 1)] * 3, 8
        for dcval in (y_dc, cb_dc, cr_dc):
            put_dc(w, dcval)
    else:  # 4:2:0 — one MCU = 4 luma blocks + 1 Cb + 1 Cr
        hv, size = [(2, 2), (1, 1), (1, 1)], 16
        pred = 0
        for _ in range(4):
            put_dc(w, y_dc - pred)
            pred = y_dc
        put_dc(w, cb_dc)
        put_dc(w, cr_dc)
    w.flush()

    out = b"\xff\xd8"
    out += _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = bytes([8]) + struct.pack(">HH", size, size) + bytes([3])
    for i, (hh, vv) in enumerate(hv):
        sof += bytes([i + 1, (hh << 4) | vv, 0])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, bytes([0x00]) + bytes(_DC_LUM_BITS) + _DC_LUM_VALS)
    out += _seg(0xC4, bytes([0x10]) + bytes(_AC_LUM_BITS) + _AC_LUM_VALS)
    out += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    return out + bytes(w.out) + b"\xff\xd9"


@pytest.mark.parametrize("subsample", ["444", "420"])
def test_color_decode_exact(subsample):
    from tab2neo_spark.operators.jpeg import decode_jpeg

    img = decode_jpeg(_color_jpeg(200, -300, 400, subsample))
    size = 8 if subsample == "444" else 16
    assert img.shape == (size, size, 3)
    # DC-only block: every pixel = 128 + dc/8 in its plane
    y, cb, cr = 128 + 200 / 8, 128 - 300 / 8, 128 + 400 / 8
    exp = np.clip(
        np.round(
            [
                y + 1.402 * (cr - 128),
                y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128),
                y + 1.772 * (cb - 128),
            ]
        ),
        0,
        255,
    )
    assert (img == img[0, 0]).all()  # flat patch
    assert np.array_equal(img[4, 4].astype(float), exp)


def test_progressive_rejected():
    from tab2neo_spark.operators.jpeg import decode_jpeg

    prog = (
        b"\xff\xd8\xff\xc2\x00\x0b\x08" + (8).to_bytes(2, "big")
        + (8).to_bytes(2, "big") + b"\x01\x01\x11\x00"
    )
    with pytest.raises(NotImplementedError, match="non-baseline"):
        decode_jpeg(prog)


def test_resize_images_jpeg_through_spark(spark):
    """The Spark resize plumbing decodes baseline JPEG for real and emits
    the decoded-to-raw (netpbm) container."""
    from tab2neo_spark.operators.jpeg import encode_jpeg_gray
    from tab2neo_spark.operators.multimodal import netpbm_decode, resize_images

    yy, xx = np.mgrid[0:32, 0:48]
    img = (128 + 100 * np.sin(yy / 9.0) * np.cos(xx / 7.0)).astype(np.uint8)
    blob = encode_jpeg_gray(img, 1)
    df = spark.createDataFrame(
        [("j", bytearray(blob))], "id string, payload binary"
    )
    out = resize_images(df, "id", "payload", width=16, height=8).collect()
    arr, _ = netpbm_decode(bytes(out[0]["payload"]))
    assert arr.shape == (8, 16)
    # nearest-neighbor of the decoded image, which is within 2 of the source
    assert np.abs(arr[0, 0].astype(int) - int(img[0, 0])) <= 2
