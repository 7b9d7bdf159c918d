"""Multimodal plumbing: metadata struct, mapInPandas feature extraction
(deterministic fake decoder), frame-sample plan shape, codec hook."""

import hashlib

import pytest
from pyspark.sql import functions as F

from mack_spark.multimodal import (
    decode_image,
    extract_features,
    frame_sample_plan,
    with_media_metadata,
)


def _media_df(spark):
    rows = [(1, b"payload-one"), (2, b"payload-two-longer"), (3, None)]
    return spark.createDataFrame(rows, "id bigint, payload binary")


def test_with_media_metadata_struct(spark):
    out = with_media_metadata(_media_df(spark), "payload", "image", "png")
    got = {r["id"]: r["payload_meta"] for r in out.collect()}
    assert got[1]["media_type"] == "image"
    assert got[1]["format"] == "png"
    assert got[1]["n_bytes"] == len(b"payload-one")
    assert got[1]["content_hash"] == hashlib.md5(b"payload-one").hexdigest()


def test_extract_features_deterministic_and_null_safe(spark):
    out = extract_features(_media_df(spark), "payload", "id", dim=4)
    assert [f.name for f in out.schema.fields] == ["id", "features", "n_bytes"]
    got = {r["id"]: r for r in out.collect()}
    # fake decoder contract: le_uint32(md5(payload + b"|" + ascii(i))[:4]) / 2^32
    expected0 = (
        int.from_bytes(hashlib.md5(b"payload-one|0").digest()[:4], "little") / 2**32
    )
    assert got[1]["features"][0] == pytest.approx(expected0, rel=1e-6)
    assert len(got[1]["features"]) == 4
    assert got[1]["n_bytes"] == len(b"payload-one")
    # NULL payload -> NULL features, zero bytes, row preserved
    assert got[3]["features"] is None
    assert got[3]["n_bytes"] == 0
    # custom decode_fn slots in
    custom = extract_features(
        _media_df(spark), "payload", "id", dim=2, decode_fn=lambda p: [1.0, 2.0]
    )
    assert custom.filter("id = 1").first()["features"] == [1.0, 2.0]


def test_frame_sample_plan_shape(spark):
    df = spark.createDataFrame([(1, b"x" * 3000)], "id bigint, payload binary")
    out = frame_sample_plan(df, "payload", "id", every_n=2)
    # n_frames = 3000 // 1024 + 1 = 3 -> planned indices 0, 2
    assert [r["frame_index"] for r in out.orderBy("frame_index").collect()] == [0, 2]


def test_decode_image_routes_to_real_codecs():
    from mack_spark.codecs import ImageFormatError

    # a bare PNG magic with no chunks is recognized but malformed
    with pytest.raises(ImageFormatError, match="IHDR"):
        decode_image(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ImageFormatError, match="magic"):
        decode_image(b"not an image")
    img = decode_image(b"P6\n2 1\n255\n" + bytes([255, 0, 0, 0, 0, 255]))
    assert img.shape == (1, 2, 3)
    assert img[0, 0].tolist() == [255, 0, 0]
    assert img[0, 1].tolist() == [0, 0, 255]


def test_resize_media_stub_and_hook(spark):
    import hashlib

    from mack_spark.multimodal import resize_media

    df = spark.createDataFrame(
        [(1, b"x" * 500), (2, b"short"), (3, None)], "id long, payload binary"
    )
    out = resize_media(df, "payload", "id", target_w=4, target_h=4).orderBy("id")
    rows = out.collect()
    # stub: truncate to 16-byte budget
    assert (rows[0].out_bytes, rows[0].in_bytes) == (16, 500)
    assert rows[0].resized == b"x" * 16
    assert rows[0].content_hash == hashlib.md5(b"x" * 16).hexdigest()
    assert (rows[1].out_bytes, rows[1].resized) == (5, b"short")
    assert rows[2].resized is None and rows[2].content_hash is None
    # the real-codec hook: any (payload, w, h) -> bytes drops in
    out2 = resize_media(
        df.filter("id = 1"), "payload", "id", target_w=2, target_h=3,
        resize_fn=lambda p, w, h: bytes([len(p) % 256]) * (w * h),
    ).collect()[0]
    assert out2.resized == bytes([244]) * 6 and out2.out_bytes == 6
