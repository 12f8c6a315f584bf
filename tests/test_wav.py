"""Pure-stdlib WAV codec tests (the audio analog of test_png.py)."""

from __future__ import annotations

import pytest

from chiv_spark.formats.wav import decode_wav, encode_wav, is_wav


class TestWavCodec:
    def test_roundtrip_sample_exact(self):
        samples = [0, 1, -1, 32767, -32768, 12345, -12345] * 100
        payload = encode_wav(samples, rate=16000)
        assert is_wav(payload)
        rate, ch, out = decode_wav(payload)
        assert (rate, ch) == (16000, 1)
        assert out == samples

    def test_riff_header_fields(self):
        payload = encode_wav([0] * 10, rate=8000)
        assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
        rate, _, out = decode_wav(payload)
        assert rate == 8000 and len(out) == 10

    def test_empty(self):
        rate, ch, out = decode_wav(encode_wav([]))
        assert out == []

    def test_non_pcm16_rejected(self):
        import io
        import wave

        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(1)  # PCM8
            w.setframerate(8000)
            w.writeframes(b"\x00\x01")
        with pytest.raises(NotImplementedError):
            decode_wav(buf.getvalue())

    def test_is_wav_rejects_other_bytes(self):
        assert not is_wav(b"\x89PNG\r\n\x1a\n")
        assert not is_wav(b"RIFFxxxxAVI ")


class TestAudioPipeline:
    def test_synth_decode_matches_closed_form(self, spark):
        """The executor-side WAV roundtrip must reproduce the
        hash-derived sample stream exactly (the oracle's premise)."""
        import hashlib

        from pyspark.sql import functions as F

        from chiv_spark.operators.multimodal import audio_features, synth_audio

        ids = spark.range(3).select(F.col("id").alias("media_id"))
        out = {r["media_id"]: r for r in audio_features(synth_audio(ids)).collect()}

        def h64(s: str) -> int:
            return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

        for mid in range(3):
            n = 800 + (mid % 5) * 160
            samples = [(h64(f"aud:{mid}:{t}") % 65536) - 32768 for t in range(n)]
            r = out[mid]
            assert r["n_samples"] == n
            assert r["peak"] == max(abs(s) for s in samples)
            assert r["sum_sq"] == sum(s * s for s in samples)
            assert r["duration_ms"] == n * 1000 // 16000


class TestAudioFingerprint:
    """r10 verdict task 6: the audio dedup chain's fingerprint stage —
    the engine's WAV-round-tripped fingerprint must equal the closed
    form the oracle replays, and the pair set must respect the
    synthetic group structure."""

    def test_fingerprint_matches_closed_form_and_groups(self, spark):
        import hashlib

        from chiv_spark.operators import multimodal
        from chiv_spark.operators.dedup import hamming_chunk_pairs

        ids = spark.range(0, 24).selectExpr("id AS media_id")
        sig = multimodal.audio_fingerprint(multimodal.synth_audio_fp(ids))
        got = {r.media_id: r.afp for r in sig.collect()}

        def h64(s):
            return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

        n = multimodal.AFP_FRAME * multimodal.AFP_FRAMES

        def closed(mid):
            g = mid % multimodal.AFP_GROUPS
            d = h64(f"afpgain:{mid}") % multimodal.AFP_GAIN_MOD
            s = [
                (((h64(f"afp:{g}:{t}") % 65536) + d) % 65536) - 32768
                for t in range(n)
            ]
            e = [
                sum(x * x for x in s[i * 16 : (i + 1) * 16])
                for i in range(multimodal.AFP_FRAMES)
            ]
            return sum(1 << i for i in range(60) if e[i] > e[i + 1])

        assert got == {m: closed(m) for m in range(24)}
        pairs = hamming_chunk_pairs(sig, id_col="media_id", sig_col="afp").collect()
        assert pairs  # the gain perturbation leaves near-dups in range
        for r in pairs:
            assert r.doc_a % multimodal.AFP_GROUPS == r.doc_b % multimodal.AFP_GROUPS
            assert r.hamming <= 3
