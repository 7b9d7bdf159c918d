"""MP4 box-walk and MP3 frame-scan parsers (mack_spark/containers.py)
plus the Spark-side probe_media operator."""

import struct

import pytest

from mack_spark.containers import (
    ContainerFormatError,
    encode_mp3_frames,
    encode_mp4_skeleton,
    parse_mp3,
    parse_mp4,
    probe_container,
)


class TestMp4:
    def test_skeleton_roundtrip(self):
        payload = encode_mp4_skeleton(duration_ms=2500, timescale=600)
        meta = parse_mp4(payload)
        assert meta["brand"] == "isom"
        assert meta["timescale"] == 600
        assert meta["duration_ms"] == 2500
        assert meta["n_tracks"] == 2
        assert meta["handlers"] == ["vide", "soun"]
        assert meta["has_mdat"]

    def test_mvhd_version1(self):
        # rebuild the skeleton's mvhd as a version-1 box (64-bit duration)
        def box(btype, payload):
            return struct.pack(">I", 8 + len(payload)) + btype + payload

        ftyp = box(b"ftyp", b"iso5" + struct.pack(">I", 0))
        mvhd = box(
            b"mvhd",
            b"\x01\x00\x00\x00"
            + struct.pack(">QQ", 0, 0)
            + struct.pack(">I", 90000)
            + struct.pack(">Q", 90000 * 7)
            + b"\x00" * 80,
        )
        meta = parse_mp4(ftyp + box(b"moov", mvhd))
        assert meta["brand"] == "iso5"
        assert meta["duration_ms"] == 7000

    def test_no_ftyp_rejected(self):
        with pytest.raises(ContainerFormatError, match="ftyp"):
            parse_mp4(b"\x00" * 32)

    def test_bad_box_size_rejected(self):
        payload = bytearray(encode_mp4_skeleton())
        # corrupt the moov size to overrun the buffer
        moov_off = payload.find(b"moov") - 4
        struct.pack_into(">I", payload, moov_off, 1 << 30)
        with pytest.raises(ContainerFormatError, match="bad box size"):
            parse_mp4(bytes(payload))

    def test_mdat_not_read(self):
        # an mdat declaring sample data that is pure garbage must not
        # affect parsing — the box is skipped by size, never inspected
        base = encode_mp4_skeleton(mdat_bytes=0)
        garbage = struct.pack(">I", 8 + 100) + b"mdat" + b"\xff" * 100
        meta = parse_mp4(base + garbage)
        assert meta["has_mdat"] and meta["duration_ms"] == 2000


class TestMp3:
    def test_frame_train_roundtrip(self):
        payload = encode_mp3_frames(n_frames=38, sample_rate=44100, bitrate_kbps=128)
        meta = parse_mp3(payload)
        assert meta["n_frames"] == 38
        assert meta["sample_rate"] == 44100
        assert meta["bitrate_kbps"] == 128
        # 38 frames * 1152 samples / 44100 Hz = 992.6 ms
        assert meta["duration_ms"] == int(38 * 1152 * 1000 / 44100)

    def test_id3v2_skip(self):
        frames = encode_mp3_frames(n_frames=5)
        tag_body = b"\x00" * 200
        id3 = b"ID3\x03\x00\x00" + bytes(
            [(200 >> 21) & 0x7F, (200 >> 14) & 0x7F, (200 >> 7) & 0x7F, 200 & 0x7F]
        )
        meta = parse_mp3(id3 + tag_body + frames)
        assert meta["has_id3"] and meta["n_frames"] == 5

    def test_trailing_garbage_stops_scan(self):
        payload = encode_mp3_frames(n_frames=3) + b"TAG" + b"\x00" * 125
        assert parse_mp3(payload)["n_frames"] == 3

    def test_not_mp3_rejected(self):
        with pytest.raises(ContainerFormatError):
            parse_mp3(b"\x00\x01\x02\x03" * 10)

    def test_other_rates(self):
        p = encode_mp3_frames(n_frames=10, sample_rate=32000, bitrate_kbps=64)
        meta = parse_mp3(p)
        assert meta["sample_rate"] == 32000 and meta["bitrate_kbps"] == 64


class TestProbe:
    def test_routing_all_formats(self):
        import numpy as np

        from mack_spark.audio import encode_wav
        from mack_spark.video import encode_gif

        wav = encode_wav(np.zeros(8000, dtype=np.int16), 16000)
        gif = encode_gif([np.zeros((4, 4), dtype=np.uint8)] * 3)
        cases = {
            "mp4": encode_mp4_skeleton(),
            "mp3": encode_mp3_frames(n_frames=4),
            "wav": wav,
            "gif": gif,
            "unknown": b"plain text bytes, nothing magic",
        }
        for fmt, payload in cases.items():
            assert probe_container(payload)["format"] == fmt, fmt
        assert probe_container(wav)["duration_ms"] == 500
        assert probe_container(gif)["n_frames"] == 3

    def test_probe_media_operator(self, spark):
        from mack_spark.multimodal import probe_media

        rows = [
            (1, bytearray(encode_mp4_skeleton(duration_ms=1234))),
            (2, bytearray(encode_mp3_frames(n_frames=7))),
            (3, bytearray(b"not media")),
            (4, None),
        ]
        df = spark.createDataFrame(rows, "media_id: long, payload: binary")
        out = {r["media_id"]: r for r in probe_media(df, "payload", "media_id").collect()}
        assert out[1]["format"] == "mp4" and out[1]["duration_ms"] == 1234
        assert out[2]["format"] == "mp3" and out[2]["n_frames"] == 7
        assert out[3]["format"] == "unknown"
        assert out[4]["format"] == "unknown"


class TestMp4PcmSamples:
    """PCM-in-MP4: the real ISO-BMFF SAMPLE decode path (VERDICT r6 #8).
    stsd/stsc/stsz/stco walk to raw 'twos' s16 samples; compressed
    codecs stay behind the explicit ContainerFormatError fence."""

    def test_mono_roundtrip_multichunk(self):
        import numpy as np

        from mack_spark.containers import decode_mp4_pcm, encode_mp4_pcm, parse_mp4

        t = np.sin(np.linspace(0, 40 * np.pi, 9000)) * 0.5
        payload = encode_mp4_pcm(t, 8000, chunk_samples=1000)  # 9 chunks
        meta = parse_mp4(payload)
        assert meta["handlers"] == ["soun"] and meta["duration_ms"] == 1125
        samples, rate = decode_mp4_pcm(payload)
        assert rate == 8000 and samples.shape == (9000, 1)
        assert float(np.abs(samples[:, 0] - t).max()) <= 1.0 / 32767

    def test_stereo_roundtrip(self):
        import numpy as np

        from mack_spark.containers import decode_mp4_pcm, encode_mp4_pcm

        t = np.linspace(-0.9, 0.9, 500)
        st = np.stack([t, -t], axis=1)
        samples, rate = decode_mp4_pcm(encode_mp4_pcm(st, 44100))
        assert rate == 44100 and samples.shape == (500, 2)
        # encode scales by 32767, decode by 32768 (the WAV-path
        # convention) -> bound is 2 LSBs, not 1
        assert float(np.abs(samples - st).max()) <= 2.0 / 32767

    def test_compressed_codec_is_fenced(self):
        import struct

        import pytest

        from mack_spark.containers import (
            ContainerFormatError,
            decode_mp4_pcm,
            encode_mp4_pcm,
            encode_mp4_skeleton,
        )

        # metadata-only skeleton: no sample tables at all
        with pytest.raises(ContainerFormatError):
            decode_mp4_pcm(encode_mp4_skeleton())
        # a real sample-table file whose codec is mp4a (AAC): the decode
        # must refuse loudly, not fake samples
        payload = bytearray(encode_mp4_pcm([0.0] * 16, 8000))
        i = payload.find(b"twos")
        payload[i : i + 4] = b"mp4a"
        with pytest.raises(ContainerFormatError, match="compressed codec"):
            decode_mp4_pcm(bytes(payload))
