"""Metadata-level parsers for ffmpeg-class media containers (MP4, MP3).

Full sample decode of these formats needs ffmpeg-class codecs this
container lacks — but the *container* layer is plain public structure:
MP4 is ISO base-media boxes (ISO/IEC 14496-12), MP3 is a train of
MPEG audio frames with self-describing headers. Parsing that layer is
what a 100 TB media-curation pass needs per clip anyway: duration,
stream kinds, bitrate, frame counts — the fields that drive
keep/drop/sample decisions — without ever touching sample data.

* ``parse_mp4`` — box walk: ftyp brand, mvhd timescale/duration
  (version 0 and 1), per-trak handler types. O(#boxes), no sample
  data is read (mdat is skipped by its declared size).
* ``parse_mp3`` — ID3v2 skip + frame-header scan: version/layer,
  bitrate, sample rate, frame count, duration. O(#frames), reads 4
  header bytes per frame and skips the payload.
* ``probe_container`` — magic-byte sniff that routes a payload to the
  right parser (mp4/mp3/gif/wav/png/bmp) and returns one uniform
  metadata dict.
* ``encode_mp4_skeleton`` / ``encode_mp3_frames`` — minimal builders
  for round-trip tests (a valid ftyp+moov+mdat skeleton; silent
  Layer-III frames with correct headers).

The reference (mack) has no multimodal surface; this is rebuild
extension surface (SURVEY.md §2d). SCALE: both parsers run inside the
Arrow-batched ``mapInPandas`` workers of multimodal.py, one payload at
a time — no pixel/sample materialization, memory per worker is one
clip's bytes.

WHY MP3/AAC SAMPLES STAY FENCED (and what decodes instead): MPEG-1
Layer III's huffman tables (ISO 11172-3 Table B.7, 34 of them) and
512-tap synthesis window (Table B.3) are normative spec DATA with no
derivation — unlike JPEG, whose entropy tables ride inside every
file, they cannot be reconstructed offline without risking a silently
wrong decoder, so ``parse_mp3`` stays header-level and sample decode
raises loudly rather than approximating. The fully SELF-DESCRIBING
audio codec — every parameter in the stream, every constant formulaic
— is FLAC, and :mod:`mack_spark.flac` implements real lossless decode
(+ encode) for it; ``probe_container`` routes ``fLaC`` payloads there
and ``audio_features`` decodes them transparently.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional


class ContainerFormatError(ValueError):
    """Payload is not a parseable media container."""


# ---------------------------------------------------------------------------
# MP4 / ISO base media file format (ISO/IEC 14496-12)
# ---------------------------------------------------------------------------

# boxes whose payload is just more boxes
_MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"udta"}


def _iter_boxes(buf: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for each box in range."""
    off = start
    while off + 8 <= end:
        size = struct.unpack_from(">I", buf, off)[0]
        btype = buf[off + 4 : off + 8]
        header = 8
        if size == 1:
            if off + 16 > end:
                raise ContainerFormatError("truncated largesize box")
            size = struct.unpack_from(">Q", buf, off + 8)[0]
            header = 16
        elif size == 0:
            size = end - off  # box extends to end of enclosing scope
        if size < header or off + size > end:
            raise ContainerFormatError(f"bad box size {size} for {btype!r}")
        yield btype, off + header, off + size
        off += size


def parse_mp4(payload: bytes) -> Dict:
    """Parse the box structure of an MP4/ISO-BMFF payload.

    Returns ``{format: 'mp4', brand, timescale, duration_units,
    duration_ms, n_tracks, handlers: [4cc, ...], has_mdat}``. Raises
    :class:`ContainerFormatError` when the payload does not start with
    a valid ``ftyp`` box (the signature every ISO-BMFF file must lead
    with, 14496-12 §4.3).
    """
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ContainerFormatError("no ftyp leader")
    brand = None
    timescale = None
    duration = None
    handlers: List[str] = []
    n_tracks = 0
    has_mdat = False

    def walk(start: int, end: int) -> None:
        nonlocal brand, timescale, duration, handlers, n_tracks, has_mdat
        for btype, ps, pe in _iter_boxes(payload, start, end):
            if btype == b"ftyp":
                brand = payload[ps : ps + 4].decode("latin-1")
            elif btype == b"mdat":
                has_mdat = True  # skipped, never read
            elif btype == b"mvhd":
                version = payload[ps]
                if version == 1:
                    timescale = struct.unpack_from(">I", payload, ps + 20)[0]
                    duration = struct.unpack_from(">Q", payload, ps + 24)[0]
                else:
                    timescale = struct.unpack_from(">I", payload, ps + 12)[0]
                    duration = struct.unpack_from(">I", payload, ps + 16)[0]
            elif btype == b"trak":
                n_tracks += 1
                walk(ps, pe)
            elif btype == b"hdlr":
                # FullBox(4) + pre_defined(4) + handler_type(4)
                handlers.append(payload[ps + 8 : ps + 12].decode("latin-1"))
            elif btype in _MP4_CONTAINERS:
                walk(ps, pe)

    walk(0, len(payload))
    duration_ms = (
        int(duration * 1000 / timescale) if timescale and duration is not None else None
    )
    return {
        "format": "mp4",
        "brand": brand,
        "timescale": timescale,
        "duration_units": duration,
        "duration_ms": duration_ms,
        "n_tracks": n_tracks,
        "handlers": handlers,
        "has_mdat": has_mdat,
    }


def encode_mp4_skeleton(
    duration_ms: int = 2000,
    timescale: int = 1000,
    handlers: Optional[List[str]] = None,
    mdat_bytes: int = 64,
) -> bytes:
    """Minimal valid ISO-BMFF skeleton for round-trip tests: ftyp +
    moov(mvhd + one trak/mdia/hdlr per handler) + mdat filler."""

    def box(btype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    handlers = handlers if handlers is not None else ["vide", "soun"]
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    duration = int(duration_ms * timescale / 1000)
    mvhd = box(
        b"mvhd",
        b"\x00\x00\x00\x00"  # version 0 + flags
        + struct.pack(">II", 0, 0)  # creation/modification
        + struct.pack(">II", timescale, duration)
        + b"\x00" * 80,  # rate/volume/matrix/next_track_id filler
    )
    traks = b""
    for h in handlers:
        hdlr = box(
            b"hdlr",
            b"\x00\x00\x00\x00" + b"\x00" * 4 + h.encode("latin-1") + b"\x00" * 13,
        )
        traks += box(b"trak", box(b"mdia", hdlr))
    moov = box(b"moov", mvhd + traks)
    mdat = box(b"mdat", b"\x00" * mdat_bytes)
    return ftyp + moov + mdat


# ---------------------------------------------------------------------------
# PCM-in-MP4 sample decode (ISO/IEC 14496-12 sample tables + QuickTime
# uncompressed audio sample entries). This is the one ISO-BMFF SAMPLE
# path that is fully real here: 'twos'/'sowt' tracks are raw 16-bit PCM,
# so walking stsd/stsc/stsz/stco to the mdat bytes IS the decode — no
# codec involved. Compressed sample entries (mp4a/avc1/...) raise
# ContainerFormatError: that fence is where an ffmpeg-class codec would
# plug in, and nothing here pretends to be one.
# ---------------------------------------------------------------------------

_PCM_DTYPES = {"twos": ">i2", "sowt": "<i2"}  # big/little-endian s16


def _child_boxes(buf: bytes, start: int, end: int) -> Dict[bytes, tuple]:
    """First occurrence of each direct child box: {type: (ps, pe)}."""
    out: Dict[bytes, tuple] = {}
    for btype, ps, pe in _iter_boxes(buf, start, end):
        out.setdefault(btype, (ps, pe))
    return out


def decode_mp4_pcm(payload: bytes):
    """Decode the first uncompressed-PCM audio track of an ISO-BMFF
    payload to ``(samples, sample_rate)`` — float32 ``(n, channels)``
    in [-1, 1), the :func:`mack_spark.audio.decode_wav` contract.

    Real sample-table walk: stsd picks the codec ('twos'/'sowt' = raw
    s16 PCM, ISO 14496-12 §8.5 + the QuickTime sound sample entries),
    stsc maps samples to chunks, stco anchors each chunk in the file,
    stsz sizes each sample; the mdat bytes those tables address ARE the
    samples. A 'soun' track whose sample entry is a compressed codec
    (mp4a, ac-3, ...) raises :class:`ContainerFormatError` — decoding
    it needs an ffmpeg-class codec this container does not ship.
    """
    import numpy as np

    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ContainerFormatError("no ftyp leader")
    top = _child_boxes(payload, 0, len(payload))
    if b"moov" not in top:
        raise ContainerFormatError("no moov box")
    for btype, ps, pe in _iter_boxes(payload, *top[b"moov"]):
        if btype != b"trak":
            continue
        mdia = _child_boxes(payload, ps, pe).get(b"mdia")
        if mdia is None:
            continue
        mboxes = _child_boxes(payload, *mdia)
        hdlr = mboxes.get(b"hdlr")
        if hdlr is None or payload[hdlr[0] + 8 : hdlr[0] + 12] != b"soun":
            continue
        minf = mboxes.get(b"minf")
        if minf is None:
            continue
        stbl = _child_boxes(payload, *minf).get(b"stbl")
        if stbl is None:
            continue
        sboxes = _child_boxes(payload, *stbl)
        missing = {b"stsd", b"stsz", b"stsc", b"stco"} - set(sboxes)
        if missing:
            raise ContainerFormatError(f"sound trak missing {missing}")
        # stsd: FullBox + entry_count + AudioSampleEntry
        sp = sboxes[b"stsd"][0]
        fourcc = payload[sp + 12 : sp + 16].decode("latin-1")
        dtype = _PCM_DTYPES.get(fourcc)
        if dtype is None:
            raise ContainerFormatError(
                f"sample entry {fourcc!r} is a compressed codec — "
                "PCM-in-MP4 ('twos'/'sowt') is the only real sample "
                "decode here"
            )
        entry = sp + 16  # past size+type of the sample entry
        n_ch = struct.unpack_from(">H", payload, entry + 16)[0]
        bits = struct.unpack_from(">H", payload, entry + 18)[0]
        rate = struct.unpack_from(">I", payload, entry + 24)[0] >> 16
        if bits != 16 or n_ch < 1 or rate < 1:
            raise ContainerFormatError(
                f"unsupported PCM layout: {bits}-bit {n_ch}ch @{rate}"
            )
        # stsz: constant size or per-sample table
        zp = sboxes[b"stsz"][0]
        const_size, n_samples = struct.unpack_from(">II", payload, zp + 4)
        if const_size:
            sizes = [const_size] * n_samples
        else:
            sizes = list(
                struct.unpack_from(f">{n_samples}I", payload, zp + 12)
            )
        # stsc: (first_chunk, samples_per_chunk, desc_idx) runs
        cp = sboxes[b"stsc"][0]
        (n_runs,) = struct.unpack_from(">I", payload, cp + 4)
        runs = [
            struct.unpack_from(">III", payload, cp + 8 + 12 * i)
            for i in range(n_runs)
        ]
        # stco: chunk base offsets (co64 not emitted by our encoder but
        # cheap to honor)
        op = sboxes[b"stco"][0]
        (n_chunks,) = struct.unpack_from(">I", payload, op + 4)
        offsets = struct.unpack_from(f">{n_chunks}I", payload, op + 8)
        # walk chunks, slicing each sample's bytes out of mdat
        chunks_data = []
        si = 0
        for ci in range(n_chunks):
            per = 0
            for first, spc, _idx in runs:
                if first <= ci + 1:
                    per = spc
            off = offsets[ci]
            for _ in range(per):
                if si >= n_samples:
                    break
                chunks_data.append(payload[off : off + sizes[si]])
                off += sizes[si]
                si += 1
        raw = b"".join(chunks_data)
        x = np.frombuffer(raw, dtype=dtype).astype(np.float32) / 32768.0
        n = (len(x) // n_ch) * n_ch
        return x[:n].reshape(-1, n_ch), int(rate)
    raise ContainerFormatError("no sound trak found")


def encode_mp4_pcm(
    samples, sample_rate: int, chunk_samples: int = 4096
) -> bytes:
    """Encode float samples in [-1, 1] as an ISO-BMFF file with one
    'twos' (big-endian s16 PCM) sound track — a REAL, spec-shaped MP4
    whose sample tables address real sample bytes, for round-tripping
    through :func:`decode_mp4_pcm`. ``samples`` is ``(n,)`` or
    ``(n, channels)``; chunks of ``chunk_samples`` frames exercise the
    stsc/stco walk the way multi-chunk files in the wild do."""
    import numpy as np

    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, n_ch = arr.shape
    pcm = np.clip(np.round(arr * 32767.0), -32768, 32767).astype(">i2")
    data = pcm.tobytes()
    frame_bytes = n_ch * 2
    chunk_starts = list(range(0, n, chunk_samples))

    def box(btype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    def full(btype: bytes, payload: bytes) -> bytes:
        return box(btype, b"\x00\x00\x00\x00" + payload)

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")

    def build_moov(mdat_base: int) -> bytes:
        entry = (
            b"\x00" * 6
            + struct.pack(">H", 1)  # data_reference_index
            + struct.pack(">HH", 0, 0)  # version/revision
            + b"\x00" * 4  # vendor
            + struct.pack(">HH", n_ch, 16)
            + struct.pack(">HH", 0, 0)  # compression/packet
            + struct.pack(">I", sample_rate << 16)
        )
        stsd = full(
            b"stsd",
            struct.pack(">I", 1)
            + struct.pack(">I", 8 + len(entry))
            + b"twos"
            + entry,
        )
        stts = full(b"stts", struct.pack(">III", 1, n, 1))
        stsc = full(b"stsc", struct.pack(">IIII", 1, 1, chunk_samples, 1))
        stsz = full(b"stsz", struct.pack(">II", frame_bytes, n))
        stco = full(
            b"stco",
            struct.pack(">I", len(chunk_starts))
            + b"".join(
                struct.pack(">I", mdat_base + s * frame_bytes)
                for s in chunk_starts
            ),
        )
        stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
        minf = box(b"minf", stbl)
        hdlr = full(b"hdlr", b"\x00" * 4 + b"soun" + b"\x00" * 13)
        mdhd = full(
            b"mdhd",
            struct.pack(">II", 0, 0)
            + struct.pack(">II", sample_rate, n)
            + struct.pack(">HH", 0x55C4, 0),  # und language
        )
        mdia = box(b"mdia", mdhd + hdlr + minf)
        trak = box(b"trak", mdia)
        mvhd = full(
            b"mvhd",
            struct.pack(">II", 0, 0)
            + struct.pack(">II", sample_rate, n)
            + b"\x00" * 80,
        )
        return box(b"moov", mvhd + trak)

    # two passes: moov's length does not depend on the offsets it
    # carries (fixed-width fields), so build once to size it, then
    # rebuild with the real mdat base
    moov_len = len(build_moov(0))
    mdat_base = len(ftyp) + moov_len + 8
    moov = build_moov(mdat_base)
    assert len(moov) == moov_len
    return ftyp + moov + box(b"mdat", data)


# ---------------------------------------------------------------------------
# MP3 / MPEG audio frames (ISO/IEC 11172-3, 13818-3)
# ---------------------------------------------------------------------------

_BITRATE_V1_L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
_BITRATE_V2_L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160]
_SAMPLERATE = {
    3: [44100, 48000, 32000],  # MPEG1
    2: [22050, 24000, 16000],  # MPEG2
    0: [11025, 12000, 8000],  # MPEG2.5
}


def _parse_frame_header(b0: int, b1: int, b2: int):
    """Return (frame_len_without_padding_base, samples, sample_rate,
    bitrate_kbps, padding) or None if not a Layer-III header."""
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        return None
    version = (b1 >> 3) & 0x3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5, 1=reserved
    layer = (b1 >> 1) & 0x3  # 1 = Layer III
    if version == 1 or layer != 1:
        return None
    bitrate_idx = (b2 >> 4) & 0xF
    sr_idx = (b2 >> 2) & 0x3
    padding = (b2 >> 1) & 0x1
    if bitrate_idx in (0, 15) or sr_idx == 3:
        return None
    table = _BITRATE_V1_L3 if version == 3 else _BITRATE_V2_L3
    bitrate = table[bitrate_idx] * 1000
    sample_rate = _SAMPLERATE[version][sr_idx]
    if version == 3:
        samples = 1152
        frame_len = 144 * bitrate // sample_rate + padding
    else:
        samples = 576
        frame_len = 72 * bitrate // sample_rate + padding
    return frame_len, samples, sample_rate, bitrate // 1000, padding


def parse_mp3(payload: bytes) -> Dict:
    """Scan the MPEG audio frame train of an MP3 payload.

    Skips a leading ID3v2 tag (syncsafe size), then walks frame
    headers: returns ``{format: 'mp3', n_frames, sample_rate,
    bitrate_kbps (of the first frame), duration_ms, has_id3}``.
    Raises :class:`ContainerFormatError` when no valid Layer-III frame
    leads the stream.
    """
    off = 0
    has_id3 = False
    if payload[:3] == b"ID3" and len(payload) >= 10:
        has_id3 = True
        size = 0
        for b in payload[6:10]:
            size = (size << 7) | (b & 0x7F)
        off = 10 + size
    n_frames = 0
    total_samples = 0
    sample_rate = None
    bitrate_kbps = None
    while off + 4 <= len(payload):
        parsed = _parse_frame_header(payload[off], payload[off + 1], payload[off + 2])
        if parsed is None:
            if n_frames == 0:
                raise ContainerFormatError("no MPEG Layer-III frame at stream start")
            break  # trailing garbage / ID3v1 tag: stop at first non-frame
        frame_len, samples, sr, br, _pad = parsed
        if sample_rate is None:
            sample_rate, bitrate_kbps = sr, br
        n_frames += 1
        total_samples += samples
        off += frame_len
    if n_frames == 0:
        raise ContainerFormatError("no MPEG Layer-III frame found")
    duration_ms = int(total_samples * 1000 / sample_rate)
    return {
        "format": "mp3",
        "n_frames": n_frames,
        "sample_rate": sample_rate,
        "bitrate_kbps": bitrate_kbps,
        "duration_ms": duration_ms,
        "has_id3": has_id3,
    }


def encode_mp3_frames(
    n_frames: int = 10, sample_rate: int = 44100, bitrate_kbps: int = 128
) -> bytes:
    """Silent MPEG1 Layer-III frame train with correct headers (zeroed
    payloads — enough for header-level round-trip tests)."""
    sr_idx = {44100: 0, 48000: 1, 32000: 2}[sample_rate]
    br_idx = _BITRATE_V1_L3.index(bitrate_kbps)
    header = bytes(
        [
            0xFF,
            0xFB,  # MPEG1, Layer III, no CRC
            (br_idx << 4) | (sr_idx << 2),  # no padding
            0x00,
        ]
    )
    frame_len = 144 * bitrate_kbps * 1000 // sample_rate
    frame = header + b"\x00" * (frame_len - 4)
    return frame * n_frames


# ---------------------------------------------------------------------------
# Uniform prober
# ---------------------------------------------------------------------------

def probe_container(payload: bytes) -> Dict:
    """Sniff a payload's magic bytes and return uniform metadata:
    ``{format, duration_ms, n_streams, n_frames, sample_rate,
    bitrate_kbps}`` (absent fields None; format 'unknown' when nothing
    matches). Routes to the real parsers in this module and the codec
    modules (GIF frame counting, WAV header decode)."""
    out = {
        "format": "unknown",
        "duration_ms": None,
        "n_streams": None,
        "n_frames": None,
        "sample_rate": None,
        "bitrate_kbps": None,
    }
    if payload is None or len(payload) < 4:
        return out
    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        meta = parse_mp4(payload)
        out.update(
            format="mp4",
            duration_ms=meta["duration_ms"],
            n_streams=meta["n_tracks"],
        )
        return out
    if payload[:3] == b"ID3" or (
        payload[0] == 0xFF
        and (payload[1] & 0xE0) == 0xE0
        and _parse_frame_header(payload[0], payload[1], payload[2]) is not None
    ):
        try:
            meta = parse_mp3(payload)
        except ContainerFormatError:
            return out
        out.update(
            format="mp3",
            duration_ms=meta["duration_ms"],
            n_streams=1,
            n_frames=meta["n_frames"],
            sample_rate=meta["sample_rate"],
            bitrate_kbps=meta["bitrate_kbps"],
        )
        return out
    if payload[:4] in (b"GIF8",):
        from mack_spark.video import gif_frame_count

        out.update(format="gif", n_streams=1, n_frames=gif_frame_count(payload))
        return out
    if payload[:4] == b"fLaC":
        from mack_spark.flac import decode_flac

        samples, sr, _bps = decode_flac(payload)
        out.update(
            format="flac",
            duration_ms=int(len(samples) * 1000 / sr),
            n_streams=1,
            sample_rate=sr,
        )
        return out
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        from mack_spark.audio import decode_wav

        samples, sr = decode_wav(payload)
        out.update(
            format="wav",
            duration_ms=int(len(samples) * 1000 / sr),
            n_streams=1,
            sample_rate=sr,
        )
        return out
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        out.update(format="png", n_streams=1, n_frames=1)
        return out
    if payload[:2] == b"BM":
        out.update(format="bmp", n_streams=1, n_frames=1)
        return out
    return out
