"""Golden-pixel tests for the dependency-free image codecs
(mack_spark/codecs.py): hand-constructed BMP/PPM/PNG byte streams with
known pixel values, filter-coverage PNG encoding, nearest-neighbor
resize geometry, and the Spark integration of the real decode/resize
fns through extract_features / resize_media."""

import hashlib
import struct
import zlib

import numpy as np
import pytest

from mack_spark.codecs import (
    ImageFormatError,
    decode_bmp,
    decode_image,
    decode_png,
    decode_pnm,
    encode_ppm,
    pixel_feature_fn,
    resize_image_bytes,
    resize_nearest,
)

# a 2x2 RGB test card: red, green / blue, white
CARD = np.array(
    [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 255]]], dtype=np.uint8
)


def _bmp_bytes(img: np.ndarray, top_down: bool = False) -> bytes:
    """Minimal 24-bpp uncompressed BMP writer (BITMAPINFOHEADER)."""
    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    pixel_off = 14 + 40
    size = pixel_off + stride * h
    hdr = b"BM" + struct.pack("<IHHI", size, 0, 0, pixel_off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, (-h if top_down else h), 1, 24, 0,
        stride * h, 2835, 2835, 0, 0,
    )
    rows = img if top_down else img[::-1]
    body = b"".join(
        row[:, ::-1].tobytes() + b"\x00" * (stride - w * 3) for row in rows
    )
    return hdr + dib + body


def _png_bytes(img: np.ndarray, ctype: int, filters) -> bytes:
    """Minimal PNG writer with a chosen filter per scanline."""
    h, w, c = img.shape
    bpp = c
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.int16)
    for y, ftype in zip(range(h), filters):
        line = img[y].reshape(-1).astype(np.int16)
        if ftype == 0:
            enc = line
        elif ftype == 1:  # Sub
            left = np.concatenate([np.zeros(bpp, np.int16), line[:-bpp]])
            enc = (line - left) & 0xFF
        elif ftype == 2:  # Up
            enc = (line - prev) & 0xFF
        elif ftype == 3:  # Average
            left = np.concatenate([np.zeros(bpp, np.int16), line[:-bpp]])
            enc = (line - ((left + prev) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            enc = np.empty_like(line)
            for x in range(len(line)):
                a = int(line[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                cc = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                enc[x] = (int(line[x]) - pred) & 0xFF
        raw.append(ftype)
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = line

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_ppm_golden_and_roundtrip():
    payload = b"P6\n# comment\n2 2\n255\n" + CARD.tobytes()
    assert np.array_equal(decode_pnm(payload), CARD)
    assert np.array_equal(decode_image(encode_ppm(CARD)), CARD)
    gray = np.array([[[0], [128]], [[255], [7]]], dtype=np.uint8)
    assert np.array_equal(decode_image(encode_ppm(gray)), gray)


def test_bmp_golden_both_row_orders():
    for top_down in (False, True):
        assert np.array_equal(
            decode_bmp(_bmp_bytes(CARD, top_down=top_down)), CARD
        ), f"top_down={top_down}"
    # 3-wide row exercises the 4-byte stride padding (9 -> 12 bytes)
    wide = np.arange(3 * 3 * 2, dtype=np.uint8).reshape(2, 3, 3)
    assert np.array_equal(decode_bmp(_bmp_bytes(wide)), wide)


def test_png_golden_all_filters():
    rng = np.random.RandomState(42)
    img = rng.randint(0, 256, size=(5, 4, 3), dtype=np.uint8)
    payload = _png_bytes(img, ctype=2, filters=[0, 1, 2, 3, 4])
    assert np.array_equal(decode_png(payload), img)
    # grayscale and RGBA color types
    gray = rng.randint(0, 256, size=(3, 3, 1), dtype=np.uint8)
    assert np.array_equal(decode_png(_png_bytes(gray, 0, [0, 1, 4])), gray)
    rgba = rng.randint(0, 256, size=(2, 2, 4), dtype=np.uint8)
    assert np.array_equal(decode_png(_png_bytes(rgba, 6, [2, 3])), rgba)


def test_png_rejects_unsupported():
    img = np.zeros((1, 1, 3), dtype=np.uint8)
    payload = bytearray(_png_bytes(img, 2, [0]))
    payload[24] = 16  # bit depth byte in IHDR
    with pytest.raises(ImageFormatError, match="depth=16"):
        decode_png(bytes(payload))


def test_resize_nearest_geometry():
    img = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
    out = resize_nearest(img, 2, 2)
    # pixel centers of a 2x2 grid over 4x4 land on rows/cols 1 and 3
    assert out[:, :, 0].tolist() == [[5, 7], [13, 15]]
    up = resize_nearest(CARD, 4, 4)
    assert up.shape == (4, 4, 3)
    assert np.array_equal(up[0, 0], CARD[0, 0]) and np.array_equal(
        up[3, 3], CARD[1, 1]
    )


def test_resize_image_bytes_is_valid_ppm():
    payload = _bmp_bytes(CARD)
    out = resize_image_bytes(payload, 4, 4)
    assert out.startswith(b"P6\n4 4\n255\n")
    decoded = decode_image(out)
    assert decoded.shape == (4, 4, 3)
    assert np.array_equal(decoded, resize_nearest(CARD, 4, 4))


def test_pixel_feature_fn_histogram():
    fn = pixel_feature_fn(8)
    # uniform mid-gray image: all mass in the bucket holding 100
    flat = np.full((4, 4, 3), 100, dtype=np.uint8)
    feats = fn(encode_ppm(flat))
    assert len(feats) == 8
    assert feats[int(100 // 32)] == pytest.approx(1.0)
    assert sum(feats) == pytest.approx(1.0)
    # format-independent: same pixels via BMP and PPM give equal feats
    assert fn(_bmp_bytes(CARD)) == fn(encode_ppm(CARD))


def test_spark_integration_real_codec(spark):
    """extract_features / resize_media run the REAL codec inside
    mapInPandas: genuine pixels flow through the Arrow boundary."""
    from mack_spark.multimodal import extract_features, resize_media

    payloads = [
        (1, _bmp_bytes(CARD)),
        (2, encode_ppm(np.full((3, 3, 3), 200, dtype=np.uint8))),
        (3, None),
    ]
    df = spark.createDataFrame(payloads, "id long, payload binary")

    feats = {
        r["id"]: r["features"]
        for r in extract_features(
            df, "payload", "id", dim=8, decode_fn=pixel_feature_fn(8)
        ).collect()
    }
    assert feats[1] == pytest.approx(pixel_feature_fn(8)(_bmp_bytes(CARD)))
    assert feats[2][int(200 // 32)] == pytest.approx(1.0)
    assert feats[3] is None

    resized = {
        r["id"]: r
        for r in resize_media(
            df, "payload", "id", target_w=2, target_h=2,
            resize_fn=resize_image_bytes,
        ).collect()
    }
    expect1 = resize_image_bytes(_bmp_bytes(CARD), 2, 2)
    assert bytes(resized[1]["resized"]) == expect1
    assert resized[1]["content_hash"] == hashlib.md5(expect1).hexdigest()
    assert resized[1]["out_bytes"] == len(expect1)
    assert resized[3]["resized"] is None
