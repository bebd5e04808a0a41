"""WAV codec (sources/wav.py): spec round-trips and the audio feature
chain through the multimodal extract kernel."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from air_health_gis_tools_spark.sources.wav import wav_decode, wav_encode


def test_roundtrip_mono():
    s = (np.arange(-500, 500, dtype=np.int16) * 13).astype(np.int16)
    out, rate = wav_decode(wav_encode(s, 8000))
    assert rate == 8000
    assert out.shape == (1000, 1)
    assert (out[:, 0] == s).all()


def test_roundtrip_stereo():
    s = np.stack([np.arange(256, dtype=np.int16),
                  -np.arange(256, dtype=np.int16)], axis=1)
    out, rate = wav_decode(wav_encode(s, 44100))
    assert rate == 44100
    assert (out == s).all()


def test_odd_data_chunk_is_padded():
    """Odd sample counts still produce word-aligned chunks that reparse."""
    s = np.array([1, 2, 3], dtype=np.int16)      # 6 bytes: even data...
    b = wav_encode(s, 8000)
    # splice an odd-length junk chunk BEFORE data to exercise the walker
    junk = b"LIST" + struct.pack("<I", 3) + b"abc\x00"
    b2 = b[:12] + junk + b[12:]
    b2 = b2[:4] + struct.pack("<I", len(b2) - 8) + b2[8:]
    out, _ = wav_decode(b2)
    assert (out[:, 0] == s).all()


def test_rejects_non_pcm_and_garbage():
    with pytest.raises(ValueError):
        wav_decode(b"not a riff stream at all....")
    s = np.zeros(4, dtype=np.int16)
    b = bytearray(wav_encode(s, 8000))
    b[20] = 3          # audio_format = IEEE float
    with pytest.raises(ValueError):
        wav_decode(bytes(b))


def test_audio_feature_through_kernel(spark):
    """Distributed extract over WAV payloads equals the source-sample
    feature values (decode fidelity through the whole Spark path)."""
    from air_health_gis_tools_spark.operators.multimodal import (
        audio_feature, extract_features, media_audio_samples,
        synthetic_media)
    media = synthetic_media(spark, 30)
    got = (extract_features(media.filter("kind = 'audio'"))
           .select("media_id", "feature").toPandas())
    assert len(got) == 10
    for _, row in got.iterrows():
        exp = audio_feature(media_audio_samples(int(row["media_id"])))
        assert np.array_equal(np.array(row["feature"], dtype=np.float32),
                              exp)
