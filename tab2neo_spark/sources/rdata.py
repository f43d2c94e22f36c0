"""Pure-Python reader (and minimal writer) for R serialization — .rda
(RData workspaces) and .rds (single objects) — so S-tier `.rda` loading
(reference: data_loaders/file_data_loader.py:77-80, via pyreadr) works
with no native dependency.

Implements the publicly documented R serialization format ("Serialization
Formats", R Internals manual; format versions 2 and 3, XDR big-endian
binary): enough of the SEXP type system to round-trip data.frames —
NILVALUE / SYMSXP / LISTSXP (pairlists + attributes) / CHARSXP / LGLSXP /
INTSXP / REALSXP / STRSXP / VECSXP / REFSXP, plus the compact
``row.names = c(NA, -n)`` form and factor decoding (integer codes +
``levels`` attribute -> strings, matching pyreadr's default).

Scale note: .rda is a DRIVER-LOCAL metadata-scale format here (the
reference loads clinical domain tables from it, never corpus data); the
resulting pandas frame goes through ``spark.createDataFrame`` exactly
like the other pandas-gated formats in loaders.py.

The writer exists so the reader is testable without R in the container
(encode -> decode round-trips) and emits the same subset (version-2
stream, gzip-wrapped, one data.frame per object).
"""

from __future__ import annotations

import bz2
import gzip
import lzma
import struct
from collections import OrderedDict
from typing import Any, BinaryIO

import numpy as np
import pandas as pd

# SEXP type codes (R Internals, "The serialization format")
NILSXP = 0
SYMSXP = 1
LISTSXP = 2
CHARSXP = 9
LGLSXP = 10
INTSXP = 13
REALSXP = 14
STRSXP = 16
VECSXP = 19
ALTREP_SXP = 238
NAMESPACESXP = 249
GLOBALENV_SXP = 253
NILVALUE_SXP = 254
REFSXP = 255

R_INT_NA = -(2**31)
# R's real NA is a specific quiet NaN: 0x7FF00000000007A2
R_REAL_NA_BITS = 0x7FF00000000007A2

_HAS_ATTR = 1 << 9
_HAS_TAG = 1 << 10
_IS_OBJECT = 1 << 8


def _decompress(raw: bytes) -> bytes:
    if raw[:2] == b"\x1f\x8b":
        return gzip.decompress(raw)
    if raw[:3] == b"BZh":
        return bz2.decompress(raw)
    if raw[:6] == b"\xfd7zXZ\x00":
        return lzma.decompress(raw)
    return raw


class _Reader:
    def __init__(self, data: bytes):
        self.b = data
        self.pos = 0
        self.refs: list[Any] = []  # REFSXP table (1-based indices)

    # -- primitives (XDR = big-endian) --------------------------------------
    def _take(self, n: int) -> bytes:
        chunk = self.b[self.pos : self.pos + n]
        if len(chunk) != n:
            raise ValueError("truncated R serialization stream")
        self.pos += n
        return chunk

    def u8(self) -> int:
        return self._take(1)[0]

    def i4(self) -> int:
        return struct.unpack(">i", self._take(4))[0]

    def f8(self) -> float:
        return struct.unpack(">d", self._take(8))[0]

    # -- header --------------------------------------------------------------
    def header(self) -> int:
        magic = self._take(2)
        if magic == b"X\n":
            pass  # XDR binary
        elif magic == b"B\n":
            raise NotImplementedError("native-binary R streams not supported (XDR only)")
        elif magic == b"A\n":
            raise NotImplementedError("ASCII R streams not supported")
        else:
            raise ValueError(f"not an R serialization stream: {magic!r}")
        version = self.i4()
        self.i4()  # writer R version
        self.i4()  # minimal reader R version
        if version not in (2, 3):
            raise NotImplementedError(f"R serialization version {version}")
        if version == 3:
            enc_len = self.i4()
            self._take(enc_len)  # native encoding name, e.g. "UTF-8"
        return version

    # -- SEXP tree ------------------------------------------------------------
    def item(self) -> Any:
        flags = self.i4()
        t = flags & 0xFF
        if t == NILVALUE_SXP or t == NILSXP:
            return None
        if t == REFSXP:
            idx = flags >> 8
            if idx == 0:
                idx = self.i4()
            return self.refs[idx - 1]
        if t == SYMSXP:
            name = self.item()  # CHARSXP
            self.refs.append(name)
            return name
        if t == GLOBALENV_SXP:
            self.refs.append("<globalenv>")
            return "<globalenv>"
        if t == ALTREP_SXP:
            # ALTREP record (R >= 3.5 serialization): info pairlist
            # (class symbol, package symbol, type int), then the class-
            # specific state object, then attributes. Real R writes e.g.
            # df$id <- 1:n as a compact_intseq — without this, every
            # modern .rda with a sequence column would fail to load.
            info = self.item()
            state = self.item()
            attr = self.item()
            return self._altrep(info, state, attr)
        if t == CHARSXP:
            n = self.i4()
            if n == -1:
                return None  # NA_character_
            return self._take(n).decode("utf-8", errors="replace")
        if t == LISTSXP:
            # pairlist node: [attr] [tag] car, then cdr continues the chain
            attr = self.item() if flags & _HAS_ATTR else None
            tag = self.item() if flags & _HAS_TAG else None
            car = self.item()
            cdr = self.item()
            node: list[tuple[Any, Any]] = [(tag, car)]
            if isinstance(cdr, list):
                node.extend(cdr)
            elif cdr is not None:
                node.append((None, cdr))
            del attr
            return node
        if t == LGLSXP:
            n = self.i4()
            vals = struct.unpack(f">{n}i", self._take(4 * n))
            out = [None if v == R_INT_NA else bool(v) for v in vals]
        elif t == INTSXP:
            n = self.i4()
            vals = struct.unpack(f">{n}i", self._take(4 * n))
            out = [None if v == R_INT_NA else v for v in vals]
        elif t == REALSXP:
            n = self.i4()
            raw = self._take(8 * n)
            bits = struct.unpack(f">{n}Q", raw)
            doubles = struct.unpack(f">{n}d", raw)
            out = [
                None if b == R_REAL_NA_BITS else d
                for b, d in zip(bits, doubles)
            ]
        elif t == STRSXP:
            n = self.i4()
            out = [self.item() for _ in range(n)]
        elif t == VECSXP:
            n = self.i4()
            out = [self.item() for _ in range(n)]
        else:
            raise NotImplementedError(f"SEXP type {t} not supported")

        attrs: dict[str, Any] = {}
        if flags & _HAS_ATTR:
            pl = self.item()  # pairlist of (tag, value)
            for tag, val in pl or []:
                if tag is not None:
                    attrs[tag] = val
        return _RObj(out, attrs) if attrs else out


    def _altrep(self, info: Any, state: Any, attr: Any) -> Any:
        cls = None
        if isinstance(info, list) and info:
            cls = info[0][1]  # class symbol printname
        if cls in ("compact_intseq", "compact_realseq"):
            n, start, step = (_plain(state) + [None, None, None])[:3]
            seq = [start + i * step for i in range(int(n))]
            out = [int(v) for v in seq] if cls == "compact_intseq" else seq
        elif cls in ("wrap_integer", "wrap_real", "wrap_logical",
                     "wrap_string", "wrap_complex"):
            # state = CONS(payload, wrap metadata)
            out = _plain(state[0][1]) if isinstance(state, list) else _plain(state)
        elif cls == "deferred_string":
            payload = state[0][1] if isinstance(state, list) else state
            vals = _plain(payload)
            if not all(v is None or isinstance(v, int) for v in vals):
                raise NotImplementedError(
                    "deferred_string over non-integer payload"
                )
            out = [None if v is None else str(v) for v in vals]
        else:
            raise NotImplementedError(f"ALTREP class {cls!r} not supported")
        attrs: dict[str, Any] = {}
        for tag, val in (attr or []):
            if tag is not None:
                attrs[tag] = val
        return _RObj(out, attrs) if attrs else out


class _RObj:
    """A vector/list with R attributes (names, class, levels, ...)."""

    def __init__(self, value: Any, attrs: dict[str, Any]):
        self.value = value
        self.attrs = attrs


def _plain(x: Any) -> Any:
    return x.value if isinstance(x, _RObj) else x


def _attr(x: Any, name: str) -> Any:
    return _plain(x.attrs.get(name)) if isinstance(x, _RObj) else None


def _column(col: Any) -> pd.Series:
    """One R vector -> pandas Series (factor codes -> level strings).
    Logical-with-NA keeps pandas' nullable boolean dtype (plain inference
    would degrade it to float); int-with-NA follows pandas/pyreadr
    inference (float + NaN)."""
    cls = _attr(col, "class")
    vals = _plain(col)
    if cls and "factor" in cls:
        levels = _attr(col, "levels") or []
        vals = [None if v is None else levels[v - 1] for v in vals]
    if vals and all(v is None or isinstance(v, bool) for v in vals) and any(
        isinstance(v, bool) for v in vals
    ):
        return pd.Series(pd.array(vals, dtype="boolean"))
    return pd.Series(vals)


def _to_dataframe(obj: Any) -> pd.DataFrame | None:
    cls = _attr(obj, "class")
    if not cls or "data.frame" not in cls:
        return None
    names = _attr(obj, "names") or []
    cols = _plain(obj)
    return pd.DataFrame(OrderedDict(
        (str(n), _column(c)) for n, c in zip(names, cols)
    ))


def read_r(path: str) -> "OrderedDict[str, Any]":
    """pyreadr-shaped API: ``OrderedDict`` of object name -> value
    (data.frames become pandas DataFrames; other vectors come back as
    plain lists). For .rds (a single unnamed object) the key is ``None``
    like pyreadr's."""
    with open(path, "rb") as fh:
        raw = _decompress(fh.read())

    out: "OrderedDict[str, Any]" = OrderedDict()
    if raw[:5] in (b"RDX2\n", b"RDX3\n"):
        rd = _Reader(raw[5:])
        rd.header()
        bindings = rd.item()  # pairlist: (symbol name, value) chain
        for tag, val in bindings or []:
            df = _to_dataframe(val)
            out[str(tag)] = df if df is not None else _plain(val)
    else:
        rd = _Reader(raw)
        rd.header()
        val = rd.item()
        df = _to_dataframe(val)
        out[None] = df if df is not None else _plain(val)
    return out


# -- minimal writer (version-2 XDR, gzip) -----------------------------------


class _Writer:
    def __init__(self) -> None:
        self.buf = bytearray()

    def i4(self, v: int) -> None:
        self.buf += struct.pack(">i", v)

    def f8(self, v: float) -> None:
        self.buf += struct.pack(">d", v)

    def flags(self, t: int, has_attr=False, has_tag=False, is_obj=False) -> None:
        f = t
        if is_obj:
            f |= _IS_OBJECT
        if has_attr:
            f |= _HAS_ATTR
        if has_tag:
            f |= _HAS_TAG
        self.i4(f)

    def charsxp(self, s: str | None) -> None:
        # levels 0x40000 marks UTF-8 in real R streams; readers (incl.
        # ours) ignore the encoding bits, so plain flags suffice here
        self.flags(CHARSXP)
        if s is None:
            self.i4(-1)
        else:
            b = s.encode("utf-8")
            self.i4(len(b))
            self.buf += b

    def symbol(self, name: str) -> None:
        self.flags(SYMSXP)
        self.charsxp(name)

    def strsxp(self, vals: list[str | None]) -> None:
        self.flags(STRSXP)
        self.i4(len(vals))
        for v in vals:
            self.charsxp(None if v is None else str(v))

    def intsxp(self, vals: list[int | None]) -> None:
        self.flags(INTSXP)
        self.i4(len(vals))
        for v in vals:
            self.i4(R_INT_NA if v is None else int(v))

    def realsxp(self, vals: list[float | None]) -> None:
        self.flags(REALSXP)
        self.i4(len(vals))
        for v in vals:
            if v is None or (isinstance(v, float) and np.isnan(v)):
                self.buf += struct.pack(">Q", R_REAL_NA_BITS)
            else:
                self.f8(float(v))

    def lglsxp(self, vals: list[bool | None]) -> None:
        self.flags(LGLSXP)
        self.i4(len(vals))
        for v in vals:
            self.i4(R_INT_NA if v is None else int(bool(v)))

    def attr_pairlist(self, items: list[tuple[str, Any]]) -> None:
        """items: (name, emit_fn) pairs already closed over self."""
        for name, emit in items:
            self.flags(LISTSXP, has_tag=True)
            self.symbol(name)
            emit()
        self.flags(NILVALUE_SXP)

    def dataframe(self, df: pd.DataFrame) -> None:
        self.flags(VECSXP, has_attr=True, is_obj=True)
        self.i4(len(df.columns))
        for c in df.columns:
            s = df[c]
            vals = [None if pd.isna(v) else v for v in s.tolist()]
            nn = [v for v in vals if v is not None]
            kind = s.dtype.kind
            if kind == "O" and nn:
                # object columns: classify by values (bool before int —
                # Python bool subclasses int); ints past the 32-bit R
                # integer range demote to REALSXP
                if all(isinstance(v, (bool, np.bool_)) for v in nn):
                    kind = "b"
                elif all(
                    isinstance(v, (int, np.integer))
                    and not isinstance(v, (bool, np.bool_))
                    and -(2**31) < v < 2**31
                    for v in nn
                ):
                    kind = "i"
                elif all(
                    isinstance(v, (int, float, np.integer, np.floating))
                    and not isinstance(v, (bool, np.bool_))
                    for v in nn
                ):
                    kind = "f"
            if kind in ("i", "u") and any(
                v is not None and not (-(2**31) < v < 2**31) for v in vals
            ):
                # R integers are 32-bit (and -2^31 is the NA sentinel):
                # out-of-range values demote the whole column to REALSXP,
                # mirroring R's own int64 handling
                kind = "f"
            if kind in ("i", "u"):
                self.intsxp(vals)
            elif kind == "f":
                self.realsxp(vals)
            elif kind == "b":
                self.lglsxp([None if v is None else bool(v) for v in vals])
            else:
                self.strsxp([None if v is None else str(v) for v in vals])
        names = [str(c) for c in df.columns]
        n = len(df)
        self.attr_pairlist(
            [
                ("names", lambda: self.strsxp(names)),
                # compact row.names: c(NA, -n)
                ("row.names", lambda: self.intsxp([None, -n])),
                ("class", lambda: self.strsxp(["data.frame"])),
            ]
        )


def write_rda(path: str, objects: dict[str, pd.DataFrame]) -> None:
    """Write data.frames as a gzip RDX2 workspace (.rda)."""
    w = _Writer()
    w.buf += b"X\n"
    w.i4(2)  # format version
    w.i4(0x030403)  # writer "R version"
    w.i4(0x020300)  # minimal reader version
    for name, df in objects.items():
        w.flags(LISTSXP, has_tag=True)
        w.symbol(name)
        w.dataframe(df)
    w.flags(NILVALUE_SXP)
    with open(path, "wb") as fh:
        fh.write(gzip.compress(b"RDX2\n" + bytes(w.buf)))


def write_rds(path: str, df: pd.DataFrame) -> None:
    """Write one data.frame as a gzip .rds stream."""
    w = _Writer()
    w.buf += b"X\n"
    w.i4(2)
    w.i4(0x030403)
    w.i4(0x020300)
    w.dataframe(df)
    with open(path, "wb") as fh:
        fh.write(gzip.compress(bytes(w.buf)))
