"""Golden tests for the dependency-free WAV audio codec
(mack_spark/audio.py) and animated-GIF codec (mack_spark/video.py),
plus their Spark integration through extract_features /
frame_sample_plan."""

import struct

import numpy as np
import pytest

from mack_spark.audio import (
    AudioFormatError,
    audio_feature_fn,
    audio_features,
    decode_wav,
    encode_wav,
)
from mack_spark.video import (
    VideoFormatError,
    decode_gif_frames,
    encode_gif,
    gif_frame_count,
)

GRAY_PAL = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)


def _tone(freq: float, rate: int = 8000, dur: float = 0.5) -> np.ndarray:
    t = np.arange(int(rate * dur)) / rate
    return 0.5 * np.sin(2 * np.pi * freq * t)


class TestWav:
    def test_roundtrip_16bit_mono(self):
        sig = _tone(440)
        samples, rate = decode_wav(encode_wav(sig, 8000))
        assert rate == 8000
        assert samples.shape == (len(sig), 1)
        assert np.abs(samples[:, 0] - sig).max() < 1e-4

    def test_roundtrip_stereo(self):
        sig = np.stack([_tone(440), _tone(880)], axis=1)
        samples, rate = decode_wav(encode_wav(sig, 16000))
        assert samples.shape == sig.shape
        assert np.abs(samples - sig).max() < 1e-4

    def test_float32_and_8bit_paths(self):
        sig = _tone(100, rate=4000, dur=0.1).astype(np.float32)
        fmt = struct.pack("<HHIIHH", 3, 1, 4000, 16000, 4, 32)
        data = sig.tobytes()
        body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
        body += b"data" + struct.pack("<I", len(data)) + data
        wav = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
        samples, rate = decode_wav(wav)
        assert rate == 4000 and np.abs(samples[:, 0] - sig).max() < 1e-7

        pcm8 = (np.clip(sig, -1, 1) * 128 + 128).clip(0, 255).astype(np.uint8)
        fmt8 = struct.pack("<HHIIHH", 1, 1, 4000, 4000, 1, 8)
        body = b"fmt " + struct.pack("<I", len(fmt8)) + fmt8
        body += b"data" + struct.pack("<I", len(pcm8)) + pcm8.tobytes()
        wav8 = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
        s8, _ = decode_wav(wav8)
        assert np.abs(s8[:, 0] - sig).max() < 1 / 64

    def test_rejects_non_wav(self):
        with pytest.raises(AudioFormatError):
            decode_wav(b"not audio at all")
        with pytest.raises(AudioFormatError):
            decode_wav(b"RIFF\x00\x00\x00\x00WAVEjunk")

    def test_features_tone_lands_in_one_band(self):
        feats = audio_features(encode_wav(_tone(440, 8000, 1.0), 8000), 16)
        dur, rms, zcr, peak = feats[:4]
        assert abs(dur - 1.0) < 1e-6
        assert abs(rms - 0.5 / np.sqrt(2)) < 1e-3
        # 440 Hz tone crosses zero 880 times/sec -> zcr ~ 880/8000
        assert abs(zcr - 880 / 8000) < 0.01
        assert abs(peak - 0.5) < 1e-3
        bands = feats[4:]
        assert abs(sum(bands) - 1.0) < 1e-6
        assert max(bands) > 0.99  # pure tone concentrates in one band

    def test_features_freq_ordering(self):
        """Higher tones put their energy in higher bands."""

        def hot_band(freq):
            f = audio_features(encode_wav(_tone(freq, 8000, 0.5), 8000), 16)
            return int(np.argmax(f[4:]))

        assert hot_band(100) < hot_band(800) < hot_band(3000)

    def test_silence_and_dim_guard(self):
        f = audio_features(encode_wav(np.zeros(1000), 8000), 8)
        assert f[1] == 0.0 and sum(f[4:]) == 0.0
        with pytest.raises(ValueError):
            audio_features(b"", 4)


class TestGif:
    def test_roundtrip_two_frames(self):
        f0 = np.zeros((4, 6), np.uint8)
        f0[:2, :] = 10
        f1 = np.full((4, 6), 200, np.uint8)
        f1[0, 0] = 5
        gif = encode_gif([f0, f1])
        assert gif_frame_count(gif) == 2
        frames = decode_gif_frames(gif)
        assert len(frames) == 2
        assert np.array_equal(frames[0], GRAY_PAL[f0])
        assert np.array_equal(frames[1], GRAY_PAL[f1])

    def test_frame_count_without_decode(self):
        frames = [np.full((3, 3), i, np.uint8) for i in range(7)]
        assert gif_frame_count(encode_gif(frames)) == 7

    def test_max_frames_stops_early(self):
        frames = [np.full((3, 3), i, np.uint8) for i in range(5)]
        assert len(decode_gif_frames(encode_gif(frames), max_frames=2)) == 2

    def test_palette_mapping(self):
        pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
        idx = np.array([[0, 1], [2, 0]], np.uint8)
        frames = decode_gif_frames(encode_gif([idx], palette=pal))
        assert np.array_equal(frames[0], pal[idx])

    def test_rejects_non_gif(self):
        with pytest.raises(VideoFormatError):
            decode_gif_frames(b"PNG? nope")
        with pytest.raises(VideoFormatError):
            gif_frame_count(b"GIF")


class TestSparkIntegration:
    def test_audio_features_via_extract_features(self, spark):
        from mack_spark.multimodal import extract_features

        clips = [
            ("low", encode_wav(_tone(100, 8000, 0.25), 8000)),
            ("high", encode_wav(_tone(3000, 8000, 0.25), 8000)),
        ]
        df = spark.createDataFrame(clips, "doc_id string, payload binary")
        out = extract_features(
            df, "payload", "doc_id", dim=16, decode_fn=audio_feature_fn(16)
        )
        rows = {r["doc_id"]: r["features"] for r in out.collect()}
        assert all(len(v) == 16 for v in rows.values())
        assert int(np.argmax(rows["low"][4:])) < int(np.argmax(rows["high"][4:]))
        for doc_id, payload in clips:
            expect = audio_features(payload, 16)
            assert np.allclose(rows[doc_id], expect, atol=1e-6)

    def test_gif_frame_sample_real_counts(self, spark):
        from mack_spark.multimodal import frame_sample_plan

        gifs = [
            ("a", encode_gif([np.full((2, 2), i, np.uint8) for i in range(9)])),
            ("b", encode_gif([np.zeros((2, 2), np.uint8)])),
        ]
        df = spark.createDataFrame(gifs, "doc_id string, payload binary")
        out = frame_sample_plan(
            df, "payload", "doc_id", every_n=4, frame_count_fn=gif_frame_count
        )
        got = sorted((r["doc_id"], r["frame_index"]) for r in out.collect())
        assert got == [("a", 0), ("a", 4), ("a", 8), ("b", 0)]
