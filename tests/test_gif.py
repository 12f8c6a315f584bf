"""Pure-stdlib animated GIF codec tests (sibling of test_jpeg.py)."""

from __future__ import annotations

import numpy as np
import pytest

from chiv_spark.formats.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
    is_gif,
)


class TestLzw:
    def test_roundtrip_random(self):
        rng = np.random.RandomState(2)
        data = bytes(rng.randint(0, 256, 5000).astype(np.uint8))
        assert _lzw_decode(_lzw_encode(data, 8), 8) == data

    def test_roundtrip_repetitive_dict_reset(self):
        # >4096 dict entries forces the CLEAR/reset path
        data = bytes((i % 7 for i in range(50_000)))
        enc = _lzw_encode(data, 8)
        assert len(enc) < len(data) // 4  # actually compresses
        assert _lzw_decode(enc, 8) == data

    def test_kwkwk_case(self):
        # the classic code==len(table) LZW corner (cScSc pattern)
        data = b"ababababa" * 10
        assert _lzw_decode(_lzw_encode(data, 8), 8) == data


class TestGifContainer:
    def test_multi_frame_roundtrip_exact(self):
        rng = np.random.RandomState(1)
        frames = [bytes(rng.randint(0, 256, 24 * 16).astype(np.uint8)) for _ in range(5)]
        payload = encode_gif(frames, 24, 16)
        assert is_gif(payload)
        w, h, pal, dec = decode_gif(payload)
        assert (w, h) == (24, 16)
        assert len(pal) == 768
        assert dec == frames

    def test_frame_size_validated(self):
        with pytest.raises(ValueError):
            encode_gif([b"\x00" * 10], 8, 8)

    def test_bad_signature(self):
        with pytest.raises(ValueError):
            decode_gif(b"\x89PNG....")

    def test_truncated_payload_is_valueerror(self):
        # malformed input contract: truncation -> ValueError, not a
        # bare IndexError from an unchecked payload[pos] (r6 ADVICE)
        payload = encode_gif([bytes(range(64)) * 1], 8, 8)
        for cut in (14, len(payload) // 2, len(payload) - 2):
            with pytest.raises((ValueError, NotImplementedError)):
                decode_gif(payload[:cut])
