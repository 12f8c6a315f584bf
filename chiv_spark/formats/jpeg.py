"""Pure-Python+numpy baseline JPEG (JFIF/grayscale) codec.

Closes the last multimodal decode gap: like PNG (formats/png.py) and
WAV (formats/wav.py), baseline JPEG needs no native library — the
container format is markers + canonical Huffman + zigzag + quantized
DCT blocks, all implementable with stdlib ``struct`` and a numpy
matrix multiply for the (I)DCT.

Scope: baseline sequential DCT, 8-bit precision, one or three
components at 4:4:4 (grayscale, or JFIF YCbCr planes — no RGB
transform here), one quantization table, own Huffman tables embedded
in the stream's DHT segments (fixed-length canonical codes — valid JPEG,
chosen for implementation clarity over compression ratio). The
decoder implements the general baseline entropy/coefficient path (DC
prediction, run/size AC coding, EOB/ZRL, byte stuffing), not just
what this encoder emits.

Determinism: quantization is ``floor(F/Q + 0.5)`` (explicit, not
banker's rounding) and the IDCT is the orthonormal separable form, so
encode→decode is bit-stable across runs and machines — which is what
lets the registry query verify decoded pixels against a closed-form
oracle on DC-only blocks.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: zigzag[k] = (row, col) of the k-th coefficient
_ZZ = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]

# flat quantization table (all 16): keeps DC-only closed forms simple
QTABLE = np.full(64, 16, dtype=np.int32)

# our canonical Huffman tables: DC symbols 0..11 all at code length 4,
# AC symbols (EOB, ZRL, every run/size) all at code length 8 — valid
# prefix codes (12 <= 2^4, 162 <= 2^8, no all-ones code assigned)
_DC_SYMS = list(range(12))
_AC_SYMS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_DC_BITS = [0] * 16
_DC_BITS[3] = 12  # 12 codes of length 4 (BITS index 3 = length 4)
_AC_BITS = [0] * 16
_AC_BITS[7] = 162  # 162 codes of length 8


def _canonical_codes(bits: list[int], syms: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the JPEG canonical construction."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for li, n in enumerate(bits):
        length = li + 1
        for _ in range(n):
            out[syms[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_ENC = _canonical_codes(_DC_BITS, _DC_SYMS)
_AC_ENC = _canonical_codes(_AC_BITS, _AC_SYMS)

# orthonormal DCT-II matrix
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16)
_C *= np.sqrt(2.0 / 8.0)
_C[0, :] *= 1.0 / np.sqrt(2.0)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._nbits += length
        while self._nbits >= 8:
            self._nbits -= 8
            byte = (self._acc >> self._nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> None:
        if self._nbits:
            pad = 8 - self._nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._nbits = 0

    def read_bit(self) -> int:
        if self._nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("jpeg: entropy stream exhausted")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                    raise ValueError("jpeg: unexpected marker in entropy data")
                self.pos += 1  # skip stuffed 0x00
            self._acc = b
            self._nbits = 8
        self._nbits -= 1
        return (self._acc >> self._nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _magnitude_bits(v: int) -> tuple[int, int]:
    """(category, appended-bits) per the JPEG magnitude coding."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    return s, (v if v > 0 else v + (1 << s) - 1)


def _extend(bits: int, s: int) -> int:
    if s == 0:
        return 0
    return bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1


def is_jpeg(payload: bytes) -> bool:
    return len(payload) >= 2 and payload[:2] == b"\xff\xd8"


def _encode_block(bw: _BitWriter, block: np.ndarray, prev_dc: int) -> int:
    """DCT->quantize->entropy-code one level-shifted 8x8 block;
    returns the new DC predictor."""
    coef = _C @ block @ _C.T
    zz = np.array([coef[r, c] for r, c in _ZZ])
    qz = np.floor(zz / QTABLE + 0.5).astype(np.int64)
    diff = int(qz[0]) - prev_dc
    s, bits = _magnitude_bits(diff)
    code, ln = _DC_ENC[s]
    bw.write(code, ln)
    if s:
        bw.write(bits, s)
    run = 0
    for k in range(1, 64):
        v = int(qz[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, ln = _AC_ENC[0xF0]
            bw.write(code, ln)
            run -= 16
        s, bits = _magnitude_bits(v)
        code, ln = _AC_ENC[(run << 4) | s]
        bw.write(code, ln)
        bw.write(bits, s)
        run = 0
    if run:
        code, ln = _AC_ENC[0x00]
        bw.write(code, ln)
    return int(qz[0])


def encode_jpeg(img: np.ndarray) -> bytes:
    """8-bit image to baseline JFIF bytes.

    ``img`` is H×W uint8 (grayscale, 1 component) or H×W×3 uint8
    (color, three 4:4:4 components in JFIF YCbCr plane order —
    callers pass YCbCr planes; no RGB transform happens here). H and
    W must be multiples of 8."""
    if img.ndim == 2:
        planes = [img]
    elif img.ndim == 3 and img.shape[2] == 3:
        planes = [img[:, :, i] for i in range(3)]
    else:
        raise ValueError("jpeg: expected HxW or HxWx3 uint8")
    h, w = planes[0].shape
    if h % 8 or w % 8:
        raise ValueError("jpeg: dimensions must be multiples of 8")
    ncomp = len(planes)
    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, body: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(body) + 2))
        out.extend(body)

    # DQT: Pq=0 (8-bit) Tq=0, 64 bytes in zigzag order (flat -> same)
    seg(0xDB, bytes([0x00]) + bytes(int(QTABLE[i]) for i in range(64)))
    # SOF0: precision 8; every component H=V=1 (4:4:4), shared Tq=0
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for cid in range(1, ncomp + 1):
        sof += bytes([cid, 0x11, 0])
    seg(0xC0, sof)
    # DHT: DC table 0 then AC table 0 (shared by all components)
    seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_SYMS))
    seg(0xC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_SYMS))
    # SOS: every component Td=0 Ta=0; Ss=0 Se=63 Ah=Al=0
    sos = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        sos += bytes([cid, 0x00])
    seg(0xDA, sos + bytes([0, 63, 0]))

    bw = _BitWriter()
    lvls = [p.astype(np.float64) - 128.0 for p in planes]
    prev = [0] * ncomp
    # 4:4:4 interleave: each MCU is one block per component in order
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            for ci in range(ncomp):
                prev[ci] = _encode_block(
                    bw, lvls[ci][by : by + 8, bx : bx + 8], prev[ci]
                )
    bw.flush()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)


class _HuffDecoder:
    """Canonical Huffman decoder built from a DHT (BITS, HUFFVAL)."""

    def __init__(self, bits: list[int], syms: list[int]) -> None:
        self.min_code = [0] * 17
        self.max_code = [-1] * 17
        self.val_ptr = [0] * 17
        code = 0
        k = 0
        for li, n in enumerate(bits):
            length = li + 1
            self.val_ptr[length] = k
            self.min_code[length] = code
            code += n
            k += n
            self.max_code[length] = code - 1 if n else -1
            code <<= 1
        self.syms = syms

    def decode(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read_bit()
            if self.max_code[length] >= 0 and code <= self.max_code[length]:
                return self.syms[self.val_ptr[length] + code - self.min_code[length]]
        raise ValueError("jpeg: invalid Huffman code")


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes back to uint8 pixels: H×W for a single
    component, H×W×3 for 4:4:4 three-component (JFIF YCbCr plane
    order, returned untransformed)."""
    if not is_jpeg(payload):
        raise ValueError("jpeg: missing SOI")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    h = w = 0
    comp_tq: list[int] = []
    scan_tables: list[tuple[int, int]] = []
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("jpeg: expected marker")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        (ln,) = struct.unpack(">H", payload[pos : pos + 2])
        body = payload[pos + 2 : pos + ln]
        if marker == 0xDB:
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise NotImplementedError("jpeg: 16-bit qtables unsupported")
                qtables[tq] = np.frombuffer(
                    body[i + 1 : i + 65], dtype=np.uint8
                ).astype(np.int32)
                i += 65
        elif marker == 0xC0:
            prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8 or ncomp not in (1, 3):
                raise NotImplementedError("jpeg: 8-bit 1- or 3-component baseline only")
            comp_tq = []
            for ci in range(ncomp):
                if body[7 + 3 * ci] != 0x11:
                    raise NotImplementedError("jpeg: subsampling unsupported (4:4:4 only)")
                comp_tq.append(body[8 + 3 * ci])
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7):
            raise NotImplementedError("jpeg: only baseline sequential (SOF0)")
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                syms = list(body[i + 17 : i + 17 + n])
                huff[(tc, th)] = _HuffDecoder(bits, syms)
                i += 17 + n
        elif marker == 0xDA:
            ns = body[0]
            scan_tables = [
                (body[2 + 2 * ci] >> 4, body[2 + 2 * ci] & 0xF) for ci in range(ns)
            ]
            pos += ln
            break
        pos += ln
    else:
        raise ValueError("jpeg: no SOS segment")

    ncomp = len(comp_tq)
    # entropy data runs until the EOI marker (no restart markers here)
    end = payload.rfind(b"\xff\xd9")
    if end < pos:  # rfind miss (-1) would silently truncate the stream
        raise ValueError("jpeg: missing EOI")
    br = _BitReader(payload[pos:end])
    planes = [np.zeros((h, w), dtype=np.uint8) for _ in range(ncomp)]
    prev = [0] * ncomp
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            for ci in range(ncomp):
                dch = huff[(0, scan_tables[ci][0])]
                ach = huff[(1, scan_tables[ci][1])]
                q = qtables[comp_tq[ci]].astype(np.float64)
                zz = np.zeros(64)
                s = dch.decode(br)
                diff = _extend(br.read_bits(s), s) if s else 0
                prev[ci] += diff
                zz[0] = prev[ci] * q[0]
                k = 1
                while k < 64:
                    sym = ach.decode(br)
                    if sym == 0x00:  # EOB
                        break
                    if sym == 0xF0:  # ZRL
                        k += 16
                        continue
                    run, size = sym >> 4, sym & 0xF
                    k += run
                    if k > 63:
                        raise ValueError("jpeg: AC index overflow")
                    zz[k] = _extend(br.read_bits(size), size) * q[k]
                    k += 1
                coef = np.zeros((8, 8))
                for idx, (r, c) in enumerate(_ZZ):
                    coef[r, c] = zz[idx]
                block = _C.T @ coef @ _C + 128.0
                planes[ci][by : by + 8, bx : bx + 8] = np.clip(
                    np.floor(block + 0.5), 0, 255
                ).astype(np.uint8)
    if ncomp == 1:
        return planes[0]
    return np.stack(planes, axis=2)
