"""Dependency-free animated-GIF codec for the multimodal frame-sampling
operators.

Real video containers (mp4/webm) need ffmpeg, which this container
lacks — but animated GIF is a genuine public multi-frame format that
decodes with pure Python LZW + numpy, which is enough to make frame
counting and frame sampling operate on real frames instead of the
byte-size heuristic.

* ``decode_gif_frames`` — GIF87a/89a, global + local color tables,
  interlacing, transparency, disposal methods 0-3; returns a list of
  full-canvas ``(h, w, 3)`` uint8 RGB arrays (each frame composited
  onto the canvas the way a viewer would show it).
* ``gif_frame_count`` — cheap scan that counts image descriptors
  without LZW-decoding pixel data (what a 100 TB frame-sampling pass
  actually needs per clip before deciding which frames to decode).
* ``encode_gif`` — minimal encoder (single 256-color global palette,
  full-frame images, clear-code-per-symbol LZW) for round-trip tests.

Reference has no multimodal surface; rebuild-extension surface
(SURVEY.md §2d). SCALE: runs inside Arrow-batched ``mapInPandas``
workers; ``gif_frame_count`` is O(payload) with no pixel
materialization, so counting frames across a corpus never holds more
than one clip's bytes per worker.
"""

from __future__ import annotations

import struct

import numpy as np


class VideoFormatError(ValueError):
    """Payload is not a decodable multi-frame container."""


def _skip_sub_blocks(payload: bytes, off: int) -> int:
    while True:
        if off >= len(payload):
            raise VideoFormatError("truncated sub-blocks")
        n = payload[off]
        off += 1
        if n == 0:
            return off
        off += n


def _read_sub_blocks(payload: bytes, off: int):
    chunks = []
    while True:
        if off >= len(payload):
            raise VideoFormatError("truncated sub-blocks")
        n = payload[off]
        off += 1
        if n == 0:
            return b"".join(chunks), off
        chunks.append(payload[off : off + n])
        off += n


def _lzw_decode(data: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # table entries are byte strings; rebuilt on every clear code
    table = [bytes([i]) for i in range(clear)] + [b"", b""]
    code_size = min_code_size + 1
    acc = 0
    nbits = 0
    prev = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            nbits -= code_size
            if code == clear:
                table = [bytes([i]) for i in range(clear)] + [b"", b""]
                code_size = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise VideoFormatError(f"bad LZW code {code}")
            out += entry
            prev = entry
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
    return bytes(out)


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    h = idx.shape[0]
    order = (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )
    out = np.empty_like(idx)
    out[order] = idx
    return out


def decode_gif_frames(payload: bytes, max_frames: int | None = None):
    """Decode every frame of a GIF to composited full-canvas RGB arrays."""
    if len(payload) < 13 or payload[:3] != b"GIF" or payload[3:6] not in (
        b"87a",
        b"89a",
    ):
        raise VideoFormatError("not a GIF payload")
    W, H = struct.unpack_from("<HH", payload, 6)
    packed = payload[10]
    bg_index = payload[11]
    off = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, np.uint8, n * 3, off).reshape(n, 3)
        off += n * 3

    canvas = np.zeros((H, W, 3), np.uint8)
    if gct is not None and bg_index < gct.shape[0]:
        canvas[:, :] = gct[bg_index]
    frames = []
    transparent = None
    disposal = 0
    while off < len(payload):
        b = payload[off]
        off += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = payload[off]
            off += 1
            if label == 0xF9:  # graphic control: flags, delay(2), transp idx
                flags = payload[off + 1]
                disposal = (flags >> 2) & 0x07
                transparent = payload[off + 4] if flags & 1 else None
            off = _skip_sub_blocks(payload, off)
            continue
        if b != 0x2C:
            raise VideoFormatError(f"unexpected GIF block 0x{b:02x}")
        x, y, w, h = struct.unpack_from("<HHHH", payload, off)
        flags = payload[off + 8]
        off += 9
        ct = gct
        if flags & 0x80:
            n = 2 << (flags & 0x07)
            ct = np.frombuffer(payload, np.uint8, n * 3, off).reshape(n, 3)
            off += n * 3
        if ct is None:
            raise VideoFormatError("frame has no color table")
        min_code = payload[off]
        data, off = _read_sub_blocks(payload, off + 1)
        idx = np.frombuffer(_lzw_decode(data, min_code), np.uint8)
        if idx.size < w * h:
            raise VideoFormatError("short GIF frame data")
        idx = idx[: w * h].reshape(h, w)
        if flags & 0x40:
            idx = _deinterlace(idx)
        prior = canvas.copy() if disposal == 3 else None
        region = canvas[y : y + h, x : x + w]
        rgb = ct[np.minimum(idx, ct.shape[0] - 1)]
        if transparent is not None:
            mask = idx != transparent
            region[mask] = rgb[mask]
        else:
            region[:, :] = rgb
        frames.append(canvas.copy())
        if max_frames is not None and len(frames) >= max_frames:
            return frames
        if disposal == 2:  # restore to background
            fill = gct[bg_index] if gct is not None and bg_index < gct.shape[0] else 0
            canvas[y : y + h, x : x + w] = fill
        elif disposal == 3 and prior is not None:
            canvas = prior
        transparent = None
        disposal = 0
    if not frames:
        raise VideoFormatError("GIF contains no frames")
    return frames


def gif_frame_count(payload: bytes) -> int:
    """Count frames by walking block structure only — no pixel decode."""
    if len(payload) < 13 or payload[:3] != b"GIF":
        raise VideoFormatError("not a GIF payload")
    off = 13
    packed = payload[10]
    if packed & 0x80:
        off += (2 << (packed & 0x07)) * 3
    count = 0
    while off < len(payload):
        b = payload[off]
        off += 1
        if b == 0x3B:
            break
        if b == 0x21:
            off = _skip_sub_blocks(payload, off + 1)
            continue
        if b != 0x2C:
            raise VideoFormatError(f"unexpected GIF block 0x{b:02x}")
        flags = payload[off + 8]
        off += 9
        if flags & 0x80:
            off += (2 << (flags & 0x07)) * 3
        off = _skip_sub_blocks(payload, off + 1)
        count += 1
    return count


def encode_gif(frames, palette: np.ndarray | None = None) -> bytes:
    """Minimal GIF89a encoder for tests: one global palette, full-frame
    images, LZW degenerated to clear-code-per-symbol (valid, just not
    compressed). ``frames`` is a list of ``(h, w)`` uint8 index arrays;
    ``palette`` is ``(n<=256, 3)`` uint8 (grayscale ramp when None)."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape
    if palette is None:
        palette = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
    n = palette.shape[0]
    bits = max(1, (n - 1).bit_length())
    size_field = max(bits, 1)
    table_n = 1 << size_field
    pal = np.zeros((table_n, 3), np.uint8)
    pal[:n] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (size_field - 1), 0, 0])
    out += pal.tobytes()
    min_code = max(2, size_field)
    clear = 1 << min_code
    eoi = clear + 1
    code_size = min_code + 1
    for frame in frames:
        if frame.shape != (h, w):
            raise ValueError("all frames must be full-canvas")
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # GCE, disposal 0
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + bytes([0])
        out += bytes([min_code])
        stream = bytearray()
        # bit-pack: emit clear before every literal so code width never grows
        codes = []
        for px in frame.flatten():
            codes.append(clear)
            codes.append(int(px))
        codes.append(eoi)
        acc = 0
        nbits = 0
        for code in codes:
            acc |= code << nbits
            nbits += code_size
            while nbits >= 8:
                stream.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8
        if nbits:
            stream.append(acc & 0xFF)
        for i in range(0, len(stream), 255):
            chunk = stream[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
