"""WAV (RIFF/PCM) audio codec — pure NumPy, from the public format spec.

Multimodal audio columns carry opaque binary; this codec makes the audio
path REAL end-to-end (like sources/png.py did for images): a spec-faithful
writer and a chunk-walking reader for 16-bit PCM, mono or multi-channel.

Format (RIFF spec / WAVE PCM): ``RIFF <size> WAVE`` then chunks — ``fmt ``
(audio_format=1 for PCM, channels, sample rate, byte rate, block align,
bits/sample) and ``data`` (interleaved little-endian samples). Chunks are
word-aligned: an odd-sized chunk is followed by one pad byte. The reader
WALKS the chunk list (tolerating extra chunks like ``LIST``/``fact``)
rather than assuming fixed offsets.

Reference parity: the reference has no audio surface; this is the graft's
multimodal axis (brief: decode/feature-extract over opaque binary media).
"""

from __future__ import annotations

import struct

import numpy as np


def wav_encode(samples: np.ndarray, rate: int = 8000) -> bytes:
    """int16 samples ``(n,)`` or ``(n, channels)`` → WAV bytes (PCM16LE)."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.reshape(-1).tobytes()
    block = ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * block, block, 16)
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(data)) + data
              + (b"\x00" if len(data) % 2 else b""))
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def wav_decode(b: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (int16 samples ``(n, channels)``, sample_rate)."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    channels = rate = bits = None
    data = None
    while pos + 8 <= len(b):
        cid = b[pos:pos + 4]
        (size,) = struct.unpack("<I", b[pos + 4:pos + 8])
        body = b[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            audio_format, channels, rate, _, _, bits = struct.unpack(
                "<HHIIHH", body[:16])
            if audio_format != 1:
                raise ValueError(f"unsupported format {audio_format} "
                                 "(only PCM)")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)     # word alignment pad
    if channels is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if bits != 16:
        raise ValueError(f"unsupported bit depth {bits} (only 16)")
    s = np.frombuffer(data, dtype="<i2")
    return s.reshape(-1, channels), rate
