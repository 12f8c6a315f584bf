"""PNG codec tests: spec-level round trips and the Spark resize path.

The codec is implemented from the public PNG spec with stdlib zlib +
struct only (chiv_spark/formats/png.py); these tests pin the format
details — all five scanline filters, channel layouts, CRC/chunk
framing — and then drive resize_images end-to-end on real PNG
payloads through mapInPandas.
"""

from __future__ import annotations

import struct
import zlib

import pytest

from chiv_spark.formats.png import (
    decode_png,
    encode_png,
    is_png,
    resize_nearest,
    resize_png,
)


def _gradient(w: int, h: int, ch: int) -> bytes:
    return bytes((x * 7 + y * 13 + c * 29) & 0xFF for y in range(h) for x in range(w) for c in range(ch))


def _filter_row(ftype: int, line: bytes, prev: bytes, ch: int) -> bytes:
    """Reference (forward) filter implementation straight from the
    spec, used to build test vectors the decoder must invert."""
    out = bytearray()
    for i, v in enumerate(line):
        left = line[i - ch] if i >= ch else 0
        up = prev[i]
        up_left = prev[i - ch] if i >= ch else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = left
        elif ftype == 2:
            pred = up
        elif ftype == 3:
            pred = (left + up) >> 1
        else:  # Paeth
            p = left + up - up_left
            pa, pb, pc = abs(p - left), abs(p - up), abs(p - up_left)
            pred = left if pa <= pb and pa <= pc else (up if pb <= pc else up_left)
        out.append((v - pred) & 0xFF)
    return bytes(out)


def _build_png(w: int, h: int, ch: int, raw: bytes, filters: list[int]) -> bytes:
    color = {1: 0, 3: 2, 2: 4, 4: 6}[ch]
    stride = w * ch
    scan = bytearray()
    prev = bytes(stride)
    for y in range(h):
        line = raw[y * stride : (y + 1) * stride]
        f = filters[y % len(filters)]
        scan.append(f)
        scan.extend(_filter_row(f, line, prev, ch))
        prev = line

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(scan)))
        + chunk(b"IEND", b"")
    )


class TestPngCodec:
    @pytest.mark.parametrize("ch", [1, 2, 3, 4])
    def test_encode_decode_round_trip(self, ch):
        raw = _gradient(9, 7, ch)
        data = encode_png(9, 7, ch, raw)
        assert is_png(data)
        w, h, c, out = decode_png(data)
        assert (w, h, c) == (9, 7, ch)
        assert out == raw

    @pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
    def test_decoder_inverts_every_filter(self, ftype):
        raw = _gradient(8, 6, 3)
        data = _build_png(8, 6, 3, raw, [ftype])
        assert decode_png(data)[3] == raw

    def test_decoder_handles_mixed_filters(self):
        raw = _gradient(16, 10, 3)
        data = _build_png(16, 10, 3, raw, [0, 1, 2, 3, 4])
        assert decode_png(data)[3] == raw

    def test_rejects_non_png(self):
        with pytest.raises(ValueError, match="signature"):
            decode_png(b"JFIF not a png at all")
        assert not is_png(b"\xff\xd8\xff")

    def test_resize_nearest_exact(self):
        # 2x2 RGB quadrants -> 4x4 repeats each quadrant 2x2
        px = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])
        out = resize_nearest(2, 2, 3, px, 4, 4)
        rows = [out[i * 12 : (i + 1) * 12] for i in range(4)]
        assert rows[0] == bytes([255, 0, 0] * 2 + [0, 255, 0] * 2)
        assert rows[0] == rows[1]
        assert rows[2] == bytes([0, 0, 255] * 2 + [9, 9, 9] * 2)
        assert rows[2] == rows[3]

    def test_resize_png_produces_valid_png(self):
        data = encode_png(10, 8, 3, _gradient(10, 8, 3))
        small = resize_png(data, 4, 4)
        w, h, c, raw = decode_png(small)
        assert (w, h, c) == (4, 4, 3)
        assert len(raw) == 4 * 4 * 3


class TestSparkResizePath:
    def test_resize_images_real_png_path(self, spark):
        from chiv_spark.operators import multimodal

        payload = encode_png(12, 9, 3, _gradient(12, 9, 3))
        media = spark.createDataFrame(
            [(1, bytearray(payload)), (2, bytearray(b"not a png payload"))],
            "media_id long, payload binary",
        )
        out = {r["media_id"]: r for r in multimodal.resize_images(media, 5, 6).collect()}
        # PNG row: a real resized PNG
        w, h, c, raw = decode_png(bytes(out[1]["payload"]))
        assert (w, h, c) == (5, 6, 3)
        assert out[1]["width"] == 5 and out[1]["height"] == 6
        # non-PNG row: documented deterministic fallback, pipeline keeps going
        assert bytes(out[2]["payload"]) == b"not a png payload"[: max(1, 5 * 6 // 64)]

    def test_decode_image_dispatch(self):
        from chiv_spark.operators import multimodal

        data = encode_png(3, 2, 4, _gradient(3, 2, 4))
        assert multimodal.decode_image(data)[:3] == (3, 2, 4)
        # JPEG routes to the real codec since r6; malformed JPEG bytes
        # are a decode error, not an unsupported format
        with pytest.raises(ValueError):
            multimodal.decode_image(b"\xff\xd8\xffJPEG")
        # genuinely unsupported formats (WebP) still raise NotImplemented
        with pytest.raises(NotImplementedError):
            multimodal.decode_image(b"RIFF\x00\x00\x00\x00WEBPVP8 ")


class TestPngProperty:
    def test_random_round_trips(self):
        """Property: encode∘decode is identity for arbitrary pixel
        buffers across sizes and channel layouts."""
        try:
            from hypothesis import given, settings
            from hypothesis import strategies as st
        except ImportError:
            pytest.skip("hypothesis unavailable")

        @settings(max_examples=40, deadline=None)
        @given(
            w=st.integers(1, 24),
            h=st.integers(1, 24),
            ch=st.sampled_from([1, 2, 3, 4]),
            data=st.data(),
        )
        def check(w, h, ch, data):
            raw = bytes(
                data.draw(
                    st.lists(
                        st.integers(0, 255), min_size=w * h * ch, max_size=w * h * ch
                    )
                )
            )
            assert decode_png(encode_png(w, h, ch, raw)) == (w, h, ch, raw)

        check()
