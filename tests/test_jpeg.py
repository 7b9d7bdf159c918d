"""Round-14: JPEG codec (mack_spark/jpeg.py) — huffman + DCT in
numpy, no Pillow, baseline AND progressive (T.81 Annex G). The decoder
reads tables from the file's own DQT/DHT segments while the encoders
write the Annex K tables, so round-trip equality is two independent
implementations agreeing. The PROGRESSIVE oracle is stronger still:
a progressive encode (multi-scan, spectral selection + successive
approximation) must decode to EXACTLY the same pixels as the baseline
encode of the same image — identical quantized coefficients through
two entirely different entropy layouts. Arithmetic/lossless modes
refuse at the fence, like the mp4a/avc1 codec boundary.
"""

import struct

import numpy as np
import pytest

from mack_spark.codecs import ImageFormatError, decode_image
from mack_spark.jpeg import (
    decode_jpeg,
    encode_jpeg_baseline,
    encode_jpeg_progressive,
)


def _rt(img, **kw):
    payload = encode_jpeg_baseline(img, **kw)
    out = decode_jpeg(payload)
    ref = img if img.ndim == 3 else img[:, :, None]
    return out, int(np.abs(out.astype(int) - ref.astype(int)).max()), payload


class TestRoundTrip:
    def test_constant_gray_exact(self):
        out, err, _ = _rt(np.full((16, 16), 127, np.uint8))
        assert out.shape == (16, 16, 1)
        assert err <= 1

    def test_constant_rgb(self):
        out, err, _ = _rt(np.full((24, 40, 3), [200, 30, 90], np.uint8))
        assert out.shape == (24, 40, 3)
        assert err <= 2

    def test_gradient_ac_coefficients(self):
        g = np.tile(np.arange(64, dtype=np.uint8) * 4, (32, 1))
        out, err, _ = _rt(np.stack([g, g, g], 2), quality=95)
        assert err <= 8

    def test_noise_high_quality_bounded(self):
        rng = np.random.RandomState(7)
        img = rng.randint(0, 256, (17, 23, 3), dtype=np.int64).astype(
            np.uint8
        )
        out, err, _ = _rt(img, quality=100)
        assert out.shape == (17, 23, 3)
        assert err <= 40  # q=100 still quantizes; bounded, not exact

    def test_chroma_420_subsampling(self):
        out, err, payload = _rt(
            np.full((20, 20, 3), [10, 250, 60], np.uint8),
            subsample="420",
        )
        assert err <= 4
        # the SOF really declares 2x2 luma sampling
        i = payload.index(b"\xff\xc0")
        assert payload[i + 11] == 0x22

    def test_420_odd_dims(self):
        img = np.zeros((33, 31, 3), np.uint8)
        img[:, :, 0] = 90
        img[:16, :, 1] = 200
        out, err, _ = _rt(img, subsample="420", quality=95)
        assert out.shape == (33, 31, 3)
        assert err <= 16  # block-mean chroma at the half-plane edge

    def test_restart_markers(self):
        g = np.tile(np.arange(64, dtype=np.uint8) * 4, (32, 1))
        out, err, payload = _rt(
            np.stack([g, g, g], 2), quality=95, restart_interval=2
        )
        assert err <= 8
        assert b"\xff\xdd" in payload          # DRI present
        assert bytes([0xFF, 0xD0]) in payload  # at least one RST0

    def test_odd_sizes_crop(self):
        out, err, _ = _rt(np.full((9, 13, 3), 5, np.uint8))
        assert out.shape == (9, 13, 3)
        assert err <= 2

    def test_dispatch_magic(self):
        payload = encode_jpeg_baseline(np.full((8, 8), 42, np.uint8))
        out = decode_image(payload)
        assert out.shape == (8, 8, 1)
        assert abs(int(out[0, 0, 0]) - 42) <= 1


class TestProgressive:
    """decode(progressive encode) == decode(baseline encode), exactly:
    both encoders quantize to the same coefficients, so any bit of
    divergence is an entropy-layer bug in one of the four scan kinds."""

    CASES = [
        ((24, 24, 3), "444"), ((37, 29, 3), "444"),
        ((37, 29, 3), "420"), ((16, 16, 1), "444"),
        ((8, 8, 3), "444"), ((64, 48, 3), "420"),
        ((9, 17, 1), "444"), ((100, 60, 3), "420"),
    ]

    @pytest.mark.parametrize("shape,sub", CASES)
    def test_equals_baseline_decode(self, shape, sub):
        rng = np.random.RandomState(sum(shape))
        img = rng.randint(0, 256, size=shape).astype(np.uint8)
        base = decode_jpeg(encode_jpeg_baseline(
            img, quality=80, subsample=sub
        ))
        prog = decode_jpeg(encode_jpeg_progressive(
            img, quality=80, subsample=sub
        ))
        assert np.array_equal(base, prog)

    @pytest.mark.parametrize("quality", [10, 50, 95])
    def test_quality_sweep(self, quality):
        rng = np.random.RandomState(quality)
        img = rng.randint(0, 256, size=(40, 40, 3)).astype(np.uint8)
        assert np.array_equal(
            decode_jpeg(encode_jpeg_baseline(img, quality=quality)),
            decode_jpeg(encode_jpeg_progressive(img, quality=quality)),
        )

    def test_restart_intervals(self):
        rng = np.random.RandomState(11)
        img = rng.randint(0, 256, size=(32, 40, 3)).astype(np.uint8)
        prog = encode_jpeg_progressive(img, quality=70, restart_interval=3)
        assert bytes([0xFF, 0xD0]) in prog
        assert np.array_equal(
            decode_jpeg(encode_jpeg_baseline(img, quality=70)),
            decode_jpeg(prog),
        )

    def test_separate_dc_scans(self):
        """Per-component (non-interleaved) DC scans — T.81 allows DC
        scans with ns=1 too; this covers the decoder's block-raster DC
        path on a COLOR frame."""
        rng = np.random.RandomState(5)
        img = rng.randint(0, 256, size=(24, 40, 3)).astype(np.uint8)
        prog = encode_jpeg_progressive(
            img, quality=80, separate_dc=True
        )
        assert np.array_equal(
            decode_jpeg(encode_jpeg_baseline(img, quality=80)),
            decode_jpeg(prog),
        )
        # 3 DC-first + 3 DC-refine + 8 AC scans = 14 SOS markers
        assert prog.count(b"\xff\xda") == 14

    def test_separate_dc_refuses_420(self):
        img = np.zeros((16, 16, 3), np.uint8)
        with pytest.raises(ImageFormatError, match="separate_dc"):
            encode_jpeg_progressive(img, subsample="420",
                                    separate_dc=True)

    def test_structure_is_multi_scan_sof2(self):
        img = np.full((16, 16, 3), [9, 200, 77], np.uint8)
        payload = encode_jpeg_progressive(img)
        assert b"\xff\xc2" in payload       # SOF2, not SOF0
        assert b"\xff\xc0" not in payload
        assert payload.count(b"\xff\xda") == 10  # the color scan script

    def test_dispatch_magic_progressive(self):
        payload = encode_jpeg_progressive(np.full((8, 8), 42, np.uint8))
        out = decode_image(payload)
        assert out.shape == (8, 8, 1)
        assert abs(int(out[0, 0, 0]) - 42) <= 1

    def test_truncated_progressive_refused(self):
        payload = encode_jpeg_progressive(
            np.arange(64, dtype=np.uint8).reshape(8, 8)
        )
        with pytest.raises(ImageFormatError):
            decode_jpeg(payload[: len(payload) // 2 - 40])

    def test_no_scans_refused(self):
        sof2 = (
            b"\xff\xd8\xff\xc2" + struct.pack(">H", 11)
            + b"\x08" + struct.pack(">HH", 8, 8) + b"\x01\x01\x11\x00"
            + b"\xff\xd9"
        )
        with pytest.raises(ImageFormatError, match="no SOS"):
            decode_jpeg(sof2)


class TestFences:
    def test_lossless_refused(self):
        sof3 = (
            b"\xff\xd8\xff\xc3" + struct.pack(">H", 11)
            + b"\x08" + struct.pack(">HH", 8, 8) + b"\x01\x01\x11\x00"
        )
        with pytest.raises(ImageFormatError, match="not supported"):
            decode_jpeg(sof3)

    def test_not_jpeg_refused(self):
        with pytest.raises(ImageFormatError, match="SOI"):
            decode_jpeg(b"BM000000")

    def test_truncated_entropy_refused(self):
        payload = encode_jpeg_baseline(
            np.arange(64, dtype=np.uint8).reshape(8, 8)
        )
        with pytest.raises(ImageFormatError):
            decode_jpeg(payload[: len(payload) // 2])

    def test_12bit_refused(self):
        sof0_12 = (
            b"\xff\xd8\xff\xc0" + struct.pack(">H", 11)
            + b"\x0c" + struct.pack(">HH", 8, 8) + b"\x01\x01\x11\x00"
        )
        with pytest.raises(ImageFormatError, match="8-bit"):
            decode_jpeg(sof0_12)


class TestStructure:
    def test_markers_well_formed(self):
        payload = encode_jpeg_baseline(np.full((8, 8, 3), 99, np.uint8))
        assert payload[:2] == b"\xff\xd8"
        assert payload[-2:] == b"\xff\xd9"
        assert b"JFIF\x00" in payload
        # two DQTs, four DHTs for color
        assert payload.count(b"\xff\xdb") >= 2
        assert payload.count(b"\xff\xc4") >= 4

    def test_gray_single_component(self):
        payload = encode_jpeg_baseline(np.full((8, 8), 50, np.uint8))
        i = payload.index(b"\xff\xc0")
        ncomp = payload[i + 9]
        assert ncomp == 1

    def test_byte_stuffing_roundtrip(self):
        # an image tuned to produce 0xFF bytes in the entropy stream
        rng = np.random.RandomState(3)
        for _ in range(5):
            img = rng.randint(0, 256, (16, 16, 3), dtype=np.int64).astype(
                np.uint8
            )
            payload = encode_jpeg_baseline(img, quality=100)
            out = decode_jpeg(payload)
            assert out.shape == (16, 16, 3)

    def test_pixel_feature_fn_on_jpeg(self):
        from mack_spark.codecs import pixel_feature_fn

        payload = encode_jpeg_baseline(np.full((16, 16), 8, np.uint8))
        feats = pixel_feature_fn(8)(payload)
        assert len(feats) == 8
        assert abs(sum(feats) - 1.0) < 1e-9
        assert feats[0] == 1.0  # all intensity in the lowest bucket
