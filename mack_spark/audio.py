"""Dependency-free WAV audio codec + feature extractor for the
multimodal operators.

The container has no soundfile/librosa/ffmpeg, but PCM WAV (RIFF)
decodes with nothing beyond ``struct`` + numpy:

* **PCM** 8-bit unsigned / 16-bit / 24-bit / 32-bit signed little-endian;
* **IEEE float** 32-bit (format tag 3);
* arbitrary chunk order (``fmt `` before ``data``; unknown chunks
  skipped), mono or multi-channel.

``decode_wav`` returns ``(samples, sample_rate)`` where ``samples`` is
a float32 ``(n_samples, n_channels)`` array in [-1, 1); ``encode_wav``
re-encodes (16-bit PCM) for round-trip tests; ``audio_feature_fn(dim)``
builds a real per-payload feature extractor (duration, RMS,
zero-crossing rate, peak, then log-spaced FFT band energies) with the
exact ``bytes -> list[float]`` signature ``extract_features`` expects.

Reference has no multimodal surface; this is rebuild-extension surface
(SURVEY.md §2d) closing the "audio still stubbed" gap from VERDICT r4.

SCALE: decoding runs inside Arrow-batched ``mapInPandas`` workers, one
clip per batch row; features are O(n log n) in samples via numpy rFFT
and the output is a fixed ``dim``-vector, so the shuffle after the UDF
stage carries only small rows regardless of clip length.
"""

from __future__ import annotations

import struct

import numpy as np


class AudioFormatError(ValueError):
    """Payload is not a decodable audio clip in a supported format."""


def decode_wav(payload: bytes):
    """Decode a RIFF/WAVE payload to ``(samples, sample_rate)``.

    ``samples`` is float32 ``(n_samples, n_channels)`` scaled to
    [-1, 1); unsupported codecs (ADPCM, mu-law, ...) raise
    :class:`AudioFormatError`.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise AudioFormatError("not a RIFF/WAVE payload")
    fmt = None
    data = None
    off = 12
    while off + 8 <= len(payload):
        cid = payload[off : off + 4]
        (size,) = struct.unpack_from("<I", payload, off + 4)
        body = payload[off + 8 : off + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        off += 8 + size + (size & 1)  # chunks pad to even offsets
    if fmt is None or data is None:
        raise AudioFormatError("missing fmt/data chunk")
    if len(fmt) < 16:
        raise AudioFormatError("truncated fmt chunk")
    tag, n_ch, rate, _brate, _align, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if tag == 0xFFFE and len(fmt) >= 26:  # WAVE_FORMAT_EXTENSIBLE
        (tag,) = struct.unpack_from("<H", fmt, 24)
    if n_ch < 1 or rate < 1:
        raise AudioFormatError(f"bad fmt: channels={n_ch} rate={rate}")
    if tag == 1:  # integer PCM
        if bits == 8:
            x = np.frombuffer(data, dtype=np.uint8).astype(np.float32)
            x = (x - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
        elif bits == 24:
            raw = np.frombuffer(data[: len(data) - len(data) % 3], dtype=np.uint8)
            raw = raw.reshape(-1, 3)
            x = (
                raw[:, 0].astype(np.int32)
                | (raw[:, 1].astype(np.int32) << 8)
                | (raw[:, 2].astype(np.int32) << 16)
            )
            x = np.where(x >= 1 << 23, x - (1 << 24), x).astype(np.float32)
            x = x / float(1 << 23)
        elif bits == 32:
            x = np.frombuffer(data, dtype="<i4").astype(np.float32) / 2147483648.0
        else:
            raise AudioFormatError(f"unsupported PCM bit depth {bits}")
    elif tag == 3 and bits == 32:  # IEEE float
        x = np.frombuffer(data, dtype="<f4").astype(np.float32)
    elif tag == 7:  # G.711 mu-law (telephony corpora) — formulaic
        y = ~np.frombuffer(data, dtype=np.uint8)
        sign = y & 0x80
        e = (y >> 4) & 0x7
        m = (y & 0x0F).astype(np.int32)
        mag = (((m << 3) + 0x84) << e) - 0x84
        x = np.where(sign != 0, -mag, mag).astype(np.float32) / 32768.0
    elif tag == 6:  # G.711 A-law — formulaic
        y = np.frombuffer(data, dtype=np.uint8) ^ 0x55
        sign = y & 0x80
        e = (y >> 4) & 0x7
        m = (y & 0x0F).astype(np.int32)
        mag = np.where(e == 0, (m << 4) + 8, ((m << 4) + 0x108) << np.maximum(e - 1, 0))
        x = np.where(sign != 0, -mag, mag).astype(np.float32) / 32768.0
    else:
        raise AudioFormatError(f"unsupported WAV format tag {tag} bits {bits}")
    n = (len(x) // n_ch) * n_ch
    return x[:n].reshape(-1, n_ch), int(rate)


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode float samples in [-1, 1] to 16-bit PCM WAV bytes.
    ``samples`` is ``(n_samples,)`` or ``(n_samples, n_channels)``."""
    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    n_ch = arr.shape[1]
    pcm = np.clip(np.round(arr * 32767.0), -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, n_ch, sample_rate, sample_rate * n_ch * 2, n_ch * 2, 16
    )
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def audio_features(payload: bytes, dim: int = 16) -> list:
    """Real audio features from a WAV payload, fixed length ``dim``:

    ``[duration_sec, rms, zero_crossing_rate, peak,
    band_energy_0 .. band_energy_{dim-5}]``

    Band energies are mean power in ``dim - 4`` log-spaced frequency
    bands of the mono-mixed rFFT power spectrum, normalized to sum to 1
    (silence → zeros). Deterministic; no randomness, no model weights.
    """
    if dim < 5:
        raise ValueError(f"dim must be >= 5 to fit summary stats, got {dim}")
    if payload[:4] == b"fLaC":  # lossless path (mack_spark/flac.py)
        from mack_spark.flac import decode_flac_float

        samples, rate = decode_flac_float(payload)
    else:
        samples, rate = decode_wav(payload)
    mono = samples.mean(axis=1)
    n = mono.shape[0]
    duration = n / float(rate)
    if n == 0:
        return [0.0] * dim
    rms = float(np.sqrt(np.mean(mono**2)))
    zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if n > 1 else 0.0
    peak = float(np.max(np.abs(mono)))
    n_bands = dim - 4
    power = np.abs(np.fft.rfft(mono)) ** 2
    power = power[1:]  # drop DC so bands reflect spectral shape
    bands = np.zeros(n_bands)
    if power.size and power.sum() > 0:
        edges = np.unique(
            np.round(
                np.logspace(0, np.log10(power.size), n_bands + 1)
            ).astype(int)
        )
        edges = np.clip(edges, 1, power.size)
        # degenerate spectra (tiny clips) collapse edges; pad linearly
        while edges.size < n_bands + 1:
            edges = np.append(edges, edges[-1])
        total = power.sum()
        for i in range(n_bands):
            lo, hi = edges[i] - 1, edges[i + 1] - 1
            if hi > lo:
                bands[i] = power[lo:hi].sum() / total
    return [duration, rms, zcr, peak] + [float(b) for b in bands]


def audio_feature_fn(dim: int = 16):
    """Build a ``bytes -> list[float]`` extractor for
    ``multimodal.extract_features(decode_fn=...)``."""

    def fn(payload: bytes) -> list:
        return audio_features(payload, dim)

    return fn
