"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns plus a typed metadata struct; all
per-item compute rides ``mapInPandas`` (Arrow-batched, one Python
worker round-trip per partition batch — never per row). Image decode
is REAL for BMP / PPM / PGM / PNG via the dependency-free codecs in
:mod:`mack_spark.codecs` (``decode_image``, ``resize_image_bytes``,
``pixel_feature_fn``); audio decode is REAL for PCM/float WAV via
:mod:`mack_spark.audio` (``decode_wav``, ``audio_feature_fn`` —
duration/RMS/ZCR/peak + log-spaced FFT band energies); multi-frame
decode is REAL for animated GIF via :mod:`mack_spark.video`
(``decode_gif_frames``, ``gif_frame_count``). Containers that need
ffmpeg (mp4/webm, mp3/ogg) stay out of scope: ``decode_fn=None`` on
the generic operators selects a deterministic byte-level fake — the
engine-independent oracle contract for the declared queries — and any
real codec slots in as a one-argument function.

SCALE: media rows are orders of magnitude wider than text rows.
``repartition`` by byte-size budget before the UDF stage so one Arrow
batch (`spark.sql.execution.arrow.maxRecordsPerBatch`) fits executor
memory; feature outputs are small and re-shuffle cheaply.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_type", StringType(), False),   # image|audio|video
        StructField("format", StringType(), True),        # png|wav|mp4|...
        StructField("n_bytes", LongType(), False),
        StructField("content_hash", StringType(), False),
    ]
)


def with_media_metadata(
    df: DataFrame, binary_col: str, media_type: str, fmt: Optional[str] = None
) -> DataFrame:
    """Attach the typed metadata struct derived from the binary payload
    (pure built-in expressions — no Python)."""
    return df.withColumn(
        f"{binary_col}_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).cast("string").alias("format"),
            F.length(F.col(binary_col)).cast("long").alias("n_bytes"),
            F.md5(F.col(binary_col)).alias("content_hash"),
        ),
    )


def _fake_decode(payload: bytes, dim: int) -> list:
    """Deterministic stand-in for a codec+model feature extractor:
    md5-seeded pseudo-features in [0, 1). Stable across processes.

    feature_i = le_uint32(md5(payload + b"|" + ascii(i))[:4]) / 2^32 —
    the seed suffix is printable so an engine-independent oracle can
    recompute it from SQL (``md5(text || '|' || i)``), which is what
    upgrades the multimodal query from rows-only to fully hash-checked.
    """
    out = []
    seed = payload if isinstance(payload, (bytes, bytearray)) else bytes(payload or b"")
    for i in range(dim):
        h = hashlib.md5(seed + b"|" + str(i).encode("ascii")).digest()
        out.append(int.from_bytes(h[:4], "little") / 2**32)
    return out


def extract_features(
    df: DataFrame,
    binary_col: str,
    id_col: str,
    dim: int = 16,
    decode_fn: Optional[Callable[[bytes], list]] = None,
    batch_budget_rows: Optional[int] = None,
) -> DataFrame:
    """Per-item feature extraction over ``mapInPandas``.

    ``decode_fn`` maps raw bytes → list[float] of length ``dim``. When
    None, the deterministic fake decoder is used (real codecs are not
    installed in this environment — see module docstring).

    Returns ``(id_col, features: array<float>, n_bytes)``.
    """
    fn = decode_fn or (lambda payload: _fake_decode(payload, dim))
    out_schema = StructType(
        [
            df.schema[id_col],
            StructField("features", ArrayType(FloatType()), True),
            StructField("n_bytes", LongType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[binary_col]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "features": [
                        None if p is None else [float(x) for x in fn(p)]
                        for p in payloads
                    ],
                    "n_bytes": [0 if p is None else len(p) for p in payloads],
                }
            )

    narrow = df.select(id_col, binary_col)
    if batch_budget_rows:
        narrow = narrow.repartition(
            max(1, narrow.sparkSession.sparkContext.defaultParallelism)
        )
    return narrow.mapInPandas(run, out_schema)


def resize_media(
    df: DataFrame,
    binary_col: str,
    id_col: str,
    target_w: int = 16,
    target_h: int = 16,
    resize_fn: Optional[Callable[[bytes, int, int], bytes]] = None,
) -> DataFrame:
    """Image-resize *plumbing* over Arrow-batched ``mapInPandas``.

    ``resize_fn`` maps (payload, w, h) → resized bytes via a real codec
    (Pillow's ``Image.open(...).resize(...)``) — absent in this
    environment, so the default is the documented codec-free stand-in:
    the output "pixel budget" is ``w*h`` bytes (1 byte/px grayscale)
    and "resize" truncates the byte stream to that budget. The Spark
    side — binary in/out schema, Arrow batch shape, per-batch hashing,
    partition preservation — is real and identical under either fn.

    Returns ``(id_col, resized: binary, in_bytes, out_w, out_h,
    out_bytes, content_hash)``; ``content_hash`` is the md5 of the
    resized payload, so any engine can audit the transform.
    """
    import hashlib

    fn = resize_fn or (lambda payload, w, h: payload[: w * h])
    out_schema = StructType(
        [
            df.schema[id_col],
            StructField("resized", BinaryType(), True),
            StructField("in_bytes", LongType(), True),
            StructField("out_w", IntegerType(), True),
            StructField("out_h", IntegerType(), True),
            StructField("out_bytes", LongType(), True),
            StructField("content_hash", StringType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[binary_col]
            resized = [
                None if p is None else fn(bytes(p), target_w, target_h)
                for p in payloads
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "resized": resized,
                    "in_bytes": [None if p is None else len(p) for p in payloads],
                    "out_w": [None if r is None else target_w for r in resized],
                    "out_h": [None if r is None else target_h for r in resized],
                    "out_bytes": [None if r is None else len(r) for r in resized],
                    "content_hash": [
                        None if r is None else hashlib.md5(r).hexdigest()
                        for r in resized
                    ],
                }
            )

    return df.select(id_col, binary_col).mapInPandas(run, out_schema)


def frame_sample_plan(
    df: DataFrame,
    binary_col: str,
    id_col: str,
    every_n: int = 30,
    frame_count_fn: Optional[Callable[[bytes], int]] = None,
) -> DataFrame:
    """Video frame-sampling: one row per sampled frame index.

    With ``frame_count_fn`` (e.g. :func:`mack_spark.video
    .gif_frame_count`, which walks GIF block structure without decoding
    pixels) the count comes from the REAL container; the counting runs
    in an Arrow-batched ``mapInPandas`` stage and only then explodes —
    so at 100 TB each worker holds one clip's bytes, and the exploded
    index rows (id, int) are the only thing that shuffles. When None,
    the codec-free byte-size heuristic keeps the engine-independent
    oracle contract for the declared query.
    """
    if frame_count_fn is None:
        n_frames = (F.length(F.col(binary_col)) / F.lit(1024)).cast("int") + 1
        counted = df.select(F.col(id_col), n_frames.alias("n_frames"))
    else:
        count_schema = StructType(
            [df.schema[id_col], StructField("n_frames", IntegerType(), True)]
        )

        def count(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                yield pd.DataFrame(
                    {
                        id_col: pdf[id_col],
                        "n_frames": [
                            None if p is None else int(frame_count_fn(bytes(p)))
                            for p in pdf[binary_col]
                        ],
                    }
                )

        counted = df.select(id_col, binary_col).mapInPandas(count, count_schema)
    return counted.select(
        F.col(id_col),
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_index"),
    )


def decode_image(payload: bytes):
    """Decode an image payload to an ``(h, w, c)`` uint8 numpy array.

    Backed by the dependency-free codecs in :mod:`mack_spark.codecs`
    (uncompressed BMP, binary PPM/PGM, 8-bit non-interlaced PNG via
    stdlib zlib). Formats beyond those raise
    :class:`mack_spark.codecs.ImageFormatError`; a full-coverage codec
    (Pillow) can still be slotted in as ``decode_fn``/``resize_fn`` on
    the operators above.
    """
    from mack_spark.codecs import decode_image as _decode

    return _decode(payload)


def probe_media(df: DataFrame, binary_col: str, id_col: str) -> DataFrame:
    """Container-level metadata probe over ``mapInPandas``: routes each
    payload by magic bytes to the real parsers (MP4 box walk, MP3
    frame scan, GIF frame count, WAV header — mack_spark.containers)
    and returns ``(id_col, format, duration_ms, n_streams, n_frames,
    sample_rate, bitrate_kbps)``.

    This is the real metadata layer for ffmpeg-class containers whose
    sample data this environment cannot decode: duration/stream/
    bitrate fields come from genuine container structure, never from
    byte-size heuristics. Arrow-batched, one payload in memory per
    worker at a time; unparseable payloads degrade to format='unknown'
    rather than failing the pass.
    """
    from mack_spark.containers import ContainerFormatError, probe_container

    out_schema = StructType(
        [
            df.schema[id_col],
            StructField("format", StringType(), True),
            StructField("duration_ms", LongType(), True),
            StructField("n_streams", IntegerType(), True),
            StructField("n_frames", LongType(), True),
            StructField("sample_rate", IntegerType(), True),
            StructField("bitrate_kbps", IntegerType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = []
            for p in pdf[binary_col]:
                try:
                    metas.append(probe_container(p))
                except (ContainerFormatError, ValueError):
                    metas.append(
                        {
                            "format": "unknown",
                            "duration_ms": None,
                            "n_streams": None,
                            "n_frames": None,
                            "sample_rate": None,
                            "bitrate_kbps": None,
                        }
                    )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "format": [m["format"] for m in metas],
                    "duration_ms": [m["duration_ms"] for m in metas],
                    "n_streams": [m["n_streams"] for m in metas],
                    "n_frames": [m["n_frames"] for m in metas],
                    "sample_rate": [m["sample_rate"] for m in metas],
                    "bitrate_kbps": [m["bitrate_kbps"] for m in metas],
                }
            )

    return df.select(id_col, binary_col).mapInPandas(run, out_schema)


def decode_dims(df: DataFrame, binary_col: str, id_col: str) -> DataFrame:
    """Pixel-level dimension probe: decode every payload with the real
    codecs (BMP/PPM/PGM/PNG/**baseline JPEG** — mack_spark.codecs) and
    return ``(id_col, width, height, channels, format)``. The corpus
    question it answers — "what are the true decoded dimensions of
    every image, by container format" — needs a real decode: container
    headers can lie, and JPEG dims live after an arbitrary number of
    APP/DQT/DHT segments.

    Undecodable payloads degrade to ``format='unknown'`` with NULL
    dims (never fail the pass). Arrow-batched ``mapInPandas``, one
    payload in memory per worker at a time.
    """
    from mack_spark.codecs import ImageFormatError
    from mack_spark.codecs import decode_image as _decode

    out_schema = StructType([
        df.schema[id_col],
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("channels", IntegerType(), True),
        StructField("format", StringType(), True),
    ])

    def _fmt(p: bytes) -> str:
        if p[:2] == b"\xff\xd8":
            return "jpeg"
        if p[:8] == b"\x89PNG\r\n\x1a\n":
            return "png"
        if p[:2] == b"BM":
            return "bmp"
        if p[:2] in (b"P5", b"P6"):
            return "pnm"
        return "unknown"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p in pdf[binary_col]:
                try:
                    img = _decode(bytes(p))
                    rows.append((
                        int(img.shape[1]), int(img.shape[0]),
                        int(img.shape[2]), _fmt(bytes(p)),
                    ))
                except (ImageFormatError, ValueError, TypeError):
                    rows.append((None, None, None, "unknown"))
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "width": [r[0] for r in rows],
                "height": [r[1] for r in rows],
                "channels": [r[2] for r in rows],
                "format": [r[3] for r in rows],
            })

    return df.select(id_col, binary_col).mapInPandas(run, out_schema)
