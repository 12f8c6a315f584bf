"""Pure-stdlib WAV (RIFF/PCM16) codec for the multimodal audio path.

The container ships no native audio libraries, but WAV PCM needs none:
the stdlib ``wave`` module reads/writes the RIFF framing and the
samples are plain little-endian int16 — so unlike JPEG (still a
documented NotImplementedError), the AUDIO decode path is REAL, the
same way PNG is (chiv_spark.formats.png).
"""

from __future__ import annotations

import io
import struct
import wave


def is_wav(payload: bytes) -> bool:
    return len(payload) >= 12 and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"


def encode_wav(samples: list[int], rate: int = 16000) -> bytes:
    """Mono PCM16 WAV bytes from int samples in [-32768, 32767]."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[int, int, list[int]]:
    """(sample_rate, n_channels, samples) from WAV bytes.

    Multi-channel frames are interleaved in the returned list, as
    stored. Only PCM16 is supported (the format this codec writes).
    """
    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2:
            raise NotImplementedError("only PCM16 WAV decodes here")
        n = w.getnframes()
        raw = w.readframes(n)
        samples = list(struct.unpack(f"<{n * w.getnchannels()}h", raw))
        return w.getframerate(), w.getnchannels(), samples
