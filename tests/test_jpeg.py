"""Pure-Python baseline JPEG codec tests (sibling of test_png.py /
test_wav.py)."""

from __future__ import annotations

import numpy as np
import pytest

from chiv_spark.formats.jpeg import _C, _ZZ, decode_jpeg, encode_jpeg, is_jpeg


class TestJpegCodec:
    def test_even_uniform_blocks_are_value_exact(self):
        # flat Q=16 + even pixel values: quantized DC = (v-128)/2
        # exactly, 0.5 from every float rounding boundary -> the
        # lossy codec is value-exact on these inputs
        for v in (0, 8, 128, 200, 254):
            img = np.full((8, 8), v, dtype=np.uint8)
            payload = encode_jpeg(img)
            assert is_jpeg(payload)
            assert (decode_jpeg(payload) == v).all()

    def test_dc_prediction_across_blocks(self):
        img = np.zeros((16, 16), dtype=np.uint8)
        img[:8, :8], img[:8, 8:], img[8:, :8], img[8:, 8:] = 10, 240, 128, 64
        dec = decode_jpeg(encode_jpeg(img))
        assert (dec[:8, :8] == 10).all()
        assert (dec[:8, 8:] == 240).all()
        assert (dec[8:, :8] == 128).all()
        assert (dec[8:, 8:] == 64).all()

    def test_random_image_matches_independent_reference(self):
        # full AC path: decode(encode(x)) must equal the
        # DCT->quant->dequant->IDCT reference computed directly here
        rng = np.random.RandomState(7)
        img = rng.randint(0, 256, (32, 24)).astype(np.uint8)
        dec = decode_jpeg(encode_jpeg(img))
        ref = np.zeros_like(img)
        for by in range(0, 32, 8):
            for bx in range(0, 24, 8):
                b = img[by : by + 8, bx : bx + 8].astype(np.float64) - 128.0
                coef = _C @ b @ _C.T
                zz = np.array([coef[r, c] for r, c in _ZZ])
                dz = np.floor(zz / 16 + 0.5) * 16
                f2 = np.zeros((8, 8))
                for i, (r, c) in enumerate(_ZZ):
                    f2[r, c] = dz[i]
                rb = _C.T @ f2 @ _C + 128.0
                ref[by : by + 8, bx : bx + 8] = np.clip(np.floor(rb + 0.5), 0, 255)
        assert (dec == ref).all()
        # and it is a plausible lossy reconstruction of the original
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 32

    def test_bad_inputs(self):
        with pytest.raises(ValueError):
            decode_jpeg(b"\x89PNG")
        with pytest.raises(ValueError):
            encode_jpeg(np.zeros((10, 8), dtype=np.uint8))

    def test_decode_image_routes_jpeg(self):
        from chiv_spark.operators.multimodal import decode_image

        img = np.full((8, 16), 200, dtype=np.uint8)
        w, h, ch, raw = decode_image(encode_jpeg(img))
        assert (w, h, ch) == (16, 8, 1)
        assert raw == bytes([200]) * 128


class TestColorJpeg:
    def test_color_even_uniform_identity(self):
        img = np.zeros((16, 16, 3), dtype=np.uint8)
        img[..., 0], img[..., 1], img[..., 2] = 100, 60, 220
        img[8:, :, 0] = 40  # second MCU row changes Y: per-comp DC pred
        dec = decode_jpeg(encode_jpeg(img))
        assert dec.shape == (16, 16, 3)
        assert (dec == img).all()

    def test_color_random_roundtrip_is_lossy_but_close(self):
        rng = np.random.RandomState(3)
        img = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
        dec = decode_jpeg(encode_jpeg(img))
        assert dec.shape == img.shape
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 32

    def test_color_vs_grayscale_planes_agree(self):
        # each color plane must decode exactly as it would alone
        rng = np.random.RandomState(4)
        img = rng.randint(0, 256, (8, 8, 3)).astype(np.uint8)
        dec = decode_jpeg(encode_jpeg(img))
        for c in range(3):
            solo = decode_jpeg(encode_jpeg(img[:, :, c]))
            assert (dec[:, :, c] == solo).all()

    def test_missing_eoi_is_valueerror(self):
        # a stream cut before the EOI marker must fail loudly, not
        # silently decode a truncated entropy stream (r6 ADVICE:
        # rfind(-1) made payload[pos:-1] drop one byte instead)
        img = np.full((8, 8), 100, dtype=np.uint8)
        payload = encode_jpeg(img)
        assert payload.endswith(b"\xff\xd9")
        with pytest.raises(ValueError, match="EOI"):
            decode_jpeg(payload[:-2])
