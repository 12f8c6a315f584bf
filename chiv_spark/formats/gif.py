"""Pure-stdlib animated GIF (GIF89a) codec — the video-modality
decode path.

Video proper needs native codecs, but GIF does not: LZW over palette
indices plus simple block framing. This gives the frame-sampling tier
(operators/multimodal.sample_frames) a REAL multi-frame decode, the
way PNG/WAV/JPEG cover images and audio.

Scope: GIF89a, one global 256-entry color table, full-frame images
(no transparency/disposal compositing, no interlace, no local
palettes). The LZW is the real variable-width GIF variant (LSB-first
bit packing, CLEAR/END codes, dictionary growth to 12 bits with
reset), not an uncompressed-GIF shortcut.
"""

from __future__ import annotations

import struct


def is_gif(payload: bytes) -> bool:
    return payload[:6] in (b"GIF89a", b"GIF87a")


GRAY_PALETTE = bytes(v for i in range(256) for v in (i, i, i))


def _lzw_encode(data: bytes, mcs: int) -> bytes:
    clear, end = 1 << mcs, (1 << mcs) + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits  # LSB-first packing
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(1 << mcs)}
    next_code = end + 1
    width = mcs + 1
    emit(clear, width)
    w = b""
    for b in data:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        table[wk] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            emit(clear, width)
            table = {bytes([i]): i for i in range(1 << mcs)}
            next_code = end + 1
            width = mcs + 1
        w = bytes([b])
    if w:
        emit(table[w], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, mcs: int) -> bytes:
    clear, end = 1 << mcs, (1 << mcs) + 1
    pos = 0
    acc = 0
    nbits = 0

    def read(width: int) -> int:
        nonlocal pos, acc, nbits
        while nbits < width:
            if pos >= len(data):
                raise ValueError("gif: LZW stream exhausted")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        v = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return v

    out = bytearray()
    table: list[bytes] = []
    width = mcs + 1
    prev: bytes | None = None
    while True:
        code = read(width)
        if code == clear:
            table = [bytes([i]) for i in range(1 << mcs)] + [b"", b""]
            width = mcs + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("gif: invalid LZW code")
        out.extend(entry)
        if prev is not None and len(table) >= (1 << width) and width < 12:
            width += 1
        prev = entry
    return bytes(out)


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out.extend(chunk)
    out.append(0)
    return bytes(out)


def encode_gif(
    frames: list, width: int, height: int, palette: bytes = GRAY_PALETTE, delay_cs: int = 4
) -> bytes:
    """frames: list of ``bytes``/arrays of length width*height palette
    indices (row-major). Emits an animated GIF89a with one global
    256-color palette."""
    out = bytearray(b"GIF89a")
    # logical screen descriptor: global table, 8 bits/color, 256 entries
    out.extend(struct.pack("<HHBBB", width, height, 0xF7, 0, 0))
    out.extend(palette)
    # netscape loop extension (loop forever) — standard for animation
    out.extend(b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00")
    for frame in frames:
        data = bytes(bytearray(frame))
        if len(data) != width * height:
            raise ValueError("gif: frame size mismatch")
        # graphic control extension: delay, no transparency
        out.extend(b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00")
        # image descriptor: full frame, no local table
        out.extend(b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00")
        out.append(8)  # LZW minimum code size
        out.extend(_sub_blocks(_lzw_encode(data, 8)))
    out.append(0x3B)  # trailer
    return bytes(out)


def decode_gif(payload: bytes) -> tuple[int, int, bytes, list[bytes]]:
    """(width, height, palette, frames) — each frame is width*height
    palette-index bytes, row-major."""
    if not is_gif(payload):
        raise ValueError("gif: bad signature")
    if len(payload) < 13:
        raise ValueError("gif: truncated payload")
    w, h, packed, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    palette = b""
    if packed & 0x80:
        n = 2 ** ((packed & 0x07) + 1)
        palette = payload[pos : pos + 3 * n]
        if len(palette) != 3 * n:
            raise ValueError("gif: truncated payload")
        pos += 3 * n
    frames: list[bytes] = []

    def _at(p: int) -> int:
        # a truncated stream must fail as malformed input (ValueError,
        # the module's contract), not as an uncontrolled IndexError
        if p >= len(payload):
            raise ValueError("gif: truncated payload")
        return payload[p]

    while True:
        b = _at(pos)  # stream must end at an explicit 0x3B trailer
        if b == 0x3B:
            break
        if b == 0x21:  # extension: skip sub-blocks
            pos += 2
            while _at(pos) != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            if pos + 10 > len(payload):
                raise ValueError("gif: truncated payload")
            left, top, fw, fh = struct.unpack("<HHHH", payload[pos + 1 : pos + 9])
            ipacked = payload[pos + 9]
            pos += 10
            if ipacked & 0x80:
                raise NotImplementedError("gif: local color tables unsupported")
            if ipacked & 0x40:
                raise NotImplementedError("gif: interlace unsupported")
            if (left, top, fw, fh) != (0, 0, w, h):
                raise NotImplementedError("gif: partial frames unsupported")
            mcs = _at(pos)
            pos += 1
            data = bytearray()
            while _at(pos) != 0:
                ln = payload[pos]
                data.extend(payload[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            frames.append(_lzw_decode(bytes(data), mcs))
        else:
            raise ValueError(f"gif: unexpected block 0x{b:02x}")
    return w, h, palette, frames
