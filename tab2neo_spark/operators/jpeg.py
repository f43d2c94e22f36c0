"""Pure-Python/numpy baseline JPEG codec (ITU-T T.81 / ISO 10918-1).

The container ships no image libraries, but baseline sequential JPEG —
the dominant web image format — is fully publicly specified, so the
decode path is implemented here from the spec: segment parse (DQT / DHT /
SOF0 / DRI / SOS), Huffman-coded MCU entropy decode with byte-unstuffing
and restart markers, dequantize + de-zigzag, 8x8 IDCT (vectorized basis
multiply over all blocks at once), chroma upsampling (4:4:4 / 4:2:2 /
4:2:0), YCbCr -> RGB. Grayscale (1 component) and color (3 components)
frames; progressive (SOF2) and arithmetic coding are explicitly rejected
— callers fall back to header-only dims for those.

A minimal baseline encoder (4:4:4, spec Annex K typical Huffman tables)
exists so the decoder is testable without any image library: encode an
array -> decode it back -> compare within quantization tolerance.

This is driver/executor Python inside Arrow batches (multimodal.py's
mapInPandas) — the right place for per-row codec CPU; nothing here
touches the JVM plan.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# 8x8 DCT-II basis: B[u, x] = c(u)/2 * cos((2x+1) u pi / 16)
_B = np.zeros((8, 8))
for _u in range(8):
    _c = (1 / np.sqrt(2)) if _u == 0 else 1.0
    for _x in range(8):
        _B[_u, _x] = _c / 2.0 * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _idct2(blocks: np.ndarray) -> np.ndarray:
    """IDCT over an (n, 8, 8) stack of coefficient blocks."""
    return np.einsum("ux,nuv,vy->nxy", _B, blocks, _B, optimize=True)


def _fdct2(blocks: np.ndarray) -> np.ndarray:
    return np.einsum("ux,nxy,vy->nuv", _B, blocks, _B, optimize=True)


class _Huff:
    """Canonical JPEG Huffman table: (code-length histogram, values) ->
    fast (length, code) -> value lookup."""

    def __init__(self, bits: list[int], values: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = values[k]
                k += 1
                code += 1
            code <<= 1
        self.maxlen = max((l for l, _ in self.lookup), default=0)


class _BitReader:
    """Entropy-coded segment reader: 0xFF00 unstuffing, stops at markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table: _Huff) -> int:
        code = 0
        for length in range(1, table.maxlen + 1):
            code = (code << 1) | self.bit()
            v = table.lookup.get((length, code))
            if v is not None:
                return v
        raise ValueError("invalid Huffman code in scan")

    def align_to_marker(self) -> None:
        self.acc = 0
        self.nbits = 0

    def skip_restart(self) -> None:
        # consume FFD0-FFD7 at the current byte position
        assert self.data[self.pos] == 0xFF
        self.pos += 2
        self.align_to_marker()


class _RestartMarker(Exception):
    def __init__(self, marker: int):
        self.marker = marker


def _extend(v: int, n: int) -> int:
    """T.81 F.2.2.1 EXTEND: map n received bits to a signed coefficient."""
    return v if n == 0 or v >= (1 << (n - 1)) else v - (1 << n) + 1


def decode_jpeg(b: bytes) -> np.ndarray:
    """Baseline JPEG -> uint8 array, (H, W) grayscale or (H, W, 3) RGB.
    Raises NotImplementedError for progressive/arithmetic streams and
    ValueError for malformed ones."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    dc: dict[int, _Huff] = {}
    ac: dict[int, _Huff] = {}
    frame = None
    restart_interval = 0

    while True:
        if b[pos] != 0xFF:
            raise ValueError("desynced JPEG segment stream")
        while b[pos] == 0xFF:
            pos += 1
        marker = b[pos]
        pos += 1
        if marker == 0xD9:
            raise ValueError("EOI before SOS")
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            continue
        seglen = struct.unpack(">H", b[pos : pos + 2])[0]
        seg = b[pos + 2 : pos + seglen]
        if marker == 0xC4:  # DHT — may hold several tables
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                table = _Huff(bits, seg[p + 17 : p + 17 + n])
                (dc if tc == 0 else ac)[th] = table
                p += 17 + n
        elif marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                prec, tq = seg[p] >> 4, seg[p] & 0xF
                if prec == 0:
                    tbl = np.frombuffer(seg[p + 1 : p + 65], dtype=np.uint8)
                    p += 65
                else:
                    tbl = np.frombuffer(
                        seg[p + 1 : p + 129], dtype=">u2"
                    )
                    p += 129
                qt[tq] = tbl.astype(np.int32)
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1: baseline huffman
            precision = seg[0]
            if precision != 8:
                raise NotImplementedError("only 8-bit precision")
            h = struct.unpack(">H", seg[1:3])[0]
            w = struct.unpack(">H", seg[3:5])[0]
            ncomp = seg[5]
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG frame (marker 0xFF{marker:02X})"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[0:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            if ns != len(frame["comps"]):
                raise NotImplementedError(
                    "multi-scan (non-interleaved per-component) baseline "
                    "JPEG not supported — expected one interleaved scan"
                )
            scan_sel = {}
            for i in range(ns):
                cs, tables = seg[1 + 2 * i], seg[2 + 2 * i]
                scan_sel[cs] = (tables >> 4, tables & 0xF)
            if set(scan_sel) != {c["id"] for c in frame["comps"]}:
                raise ValueError("SOS component ids do not match SOF")
            pos += seglen
            return _decode_scan(
                b, pos, frame, scan_sel, qt, dc, ac, restart_interval
            )
        pos += seglen


def _decode_scan(b, pos, frame, scan_sel, qt, dc, ac, restart_interval):
    comps = frame["comps"]
    h_img, w_img = frame["h"], frame["w"]
    if len(comps) == 1:
        # T.81 A.2.2/A.2.3: a single-component scan is NON-interleaved —
        # one data unit per MCU in raster order over the component's own
        # block grid, whatever sampling factors the SOF declares (some
        # encoders keep h=v=2 on grayscale converted from subsampled
        # color; interpreting that as a 4-block MCU garbles the image)
        comps[0]["h"] = comps[0]["v"] = 1
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w_img // (8 * hmax))
    mcuy = -(-h_img // (8 * vmax))
    n_mcu = mcux * mcuy

    # per component: coefficient block grid sized to the MCU lattice
    for c in comps:
        c["bw"] = mcux * c["h"]
        c["bh"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 8, 8), dtype=np.int32)
        c["dct"], c["act"] = scan_sel[c["id"]]
        c["pred"] = 0

    rd = _BitReader(b, pos)
    mcu = 0
    while mcu < n_mcu:
        if restart_interval and mcu and mcu % restart_interval == 0:
            rd.align_to_marker()
            # the restart marker may surface as an exception from _fill
            # or still be pending at the byte cursor
            if rd.data[rd.pos] == 0xFF and 0xD0 <= rd.data[rd.pos + 1] <= 0xD7:
                rd.skip_restart()
            for c in comps:
                c["pred"] = 0
        my, mx = divmod(mcu, mcux)
        try:
            for c in comps:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = _decode_block(rd, dc[c["dct"]], ac[c["act"]])
                        blk[0] += c["pred"]
                        c["pred"] = blk[0]
                        gy = my * c["v"] + by
                        gx = mx * c["h"] + bx
                        zz = np.zeros(64, dtype=np.int32)
                        zz[ZIGZAG] = blk
                        c["coef"][gy * c["bw"] + gx] = zz.reshape(8, 8)
        except _RestartMarker:
            raise ValueError("restart marker inside an MCU")
        mcu += 1

    planes = []
    for c in comps:
        # DQT stores the table in zigzag order: SCATTER to natural order
        # (qnat[ZIGZAG] = qzz), not gather — the two differ for any
        # non-symmetric table
        qnat = np.zeros(64, dtype=np.int32)
        qnat[ZIGZAG] = qt[c["tq"]]
        coef = c["coef"] * qnat.reshape(1, 8, 8)
        pix = _idct2(coef.astype(np.float64)) + 128.0
        grid = (
            pix.reshape(c["bh"], c["bw"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c["bh"] * 8, c["bw"] * 8)
        )
        # upsample to the full-resolution lattice
        grid = np.repeat(np.repeat(grid, vmax // c["v"], axis=0),
                         hmax // c["h"], axis=1)
        planes.append(grid[:h_img, :w_img])

    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bl = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, bl], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _decode_block(rd: _BitReader, dct: _Huff, act: _Huff) -> np.ndarray:
    """One 8x8 block in zigzag order (DC is the DIFF, caller adds pred)."""
    out = np.zeros(64, dtype=np.int32)
    t = rd.huff(dct)
    out[0] = _extend(rd.bits(t), t)
    k = 1
    while k < 64:
        rs = rd.huff(act)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        out[k] = _extend(rd.bits(s), s)
        k += 1
    return out


# -- minimal encoder (tests / fixtures; baseline, 4:4:4, Annex K tables) -----

# ITU T.81 Annex K "typical" Huffman tables
_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = bytes(range(12))
_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = bytes([
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        while self.n:
            self.put(1, 1)  # pad with 1-bits per spec


def _enc_table(bits, vals):
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return codes


def encode_jpeg_gray(img: np.ndarray, quant=1) -> bytes:
    """Minimal baseline encoder: grayscale, Annex K Huffman tables.
    ``quant`` is a scalar (flat table) or a 64-entry NATURAL-order
    quantization table. Exists to test the decoder end-to-end without an
    image library; with quant=1 the round-trip error is only DCT float
    rounding (<= 1 LSB-ish)."""
    img = np.asarray(img, dtype=np.float64)
    h, w = img.shape
    bh, bw = -(-h // 8), -(-w // 8)
    padded = np.empty((bh * 8, bw * 8))
    padded[:h, :w] = img
    padded[h:, :w] = img[h - 1 : h, :]  # edge-replicate padding
    padded[:, w:] = padded[:, w - 1 : w]

    qnat = (np.full(64, quant) if np.isscalar(quant)
            else np.asarray(quant)).astype(np.float64)
    blocks = (
        padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )
    coef = np.round(
        _fdct2(blocks - 128.0) / qnat.reshape(1, 8, 8)
    ).astype(np.int32)

    dc_codes = _enc_table(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_codes = _enc_table(_AC_LUM_BITS, _AC_LUM_VALS)
    wtr = _BitWriter()
    pred = 0
    inv_zz = ZIGZAG  # zz[i] = natural index of zigzag position i
    for blk in coef:
        zz = blk.reshape(64)[inv_zz]
        diff = int(zz[0]) - pred
        pred = int(zz[0])
        s = int(diff).bit_length() if diff != 0 else 0
        code, ln = dc_codes[s]
        wtr.put(code, ln)
        if s:
            wtr.put(diff if diff > 0 else diff + (1 << s) - 1, s)
        run = 0
        last_nz = max(np.nonzero(zz)[0]) if np.any(zz) else 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                if k == 63 or k > last_nz:
                    code, ln = ac_codes[0x00]  # EOB
                    wtr.put(code, ln)
                    break
                if run == 16:
                    code, ln = ac_codes[0xF0]  # ZRL
                    wtr.put(code, ln)
                    run = 0
            else:
                s = abs(v).bit_length()
                code, ln = ac_codes[(run << 4) | s]
                wtr.put(code, ln)
                wtr.put(v if v > 0 else v + (1 << s) - 1, s)
                run = 0
    wtr.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    qzz = qnat[ZIGZAG].astype(np.uint8)  # DQT payload is zigzag order
    out = b"\xff\xd8"
    out += seg(0xDB, bytes([0x00]) + qzz.tobytes())
    out += seg(0xC0, bytes([8]) + struct.pack(">HH", h, w)
               + bytes([1, 0x01, 0x11, 0x00]))
    out += seg(0xC4, bytes([0x00]) + bytes(_DC_LUM_BITS) + _DC_LUM_VALS)
    out += seg(0xC4, bytes([0x10]) + bytes(_AC_LUM_BITS) + _AC_LUM_VALS)
    out += seg(0xDA, bytes([1, 0x01, 0x00, 0, 63, 0]))
    out += bytes(wtr.out)
    out += b"\xff\xd9"
    return out
