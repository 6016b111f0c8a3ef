"""Pure-stdlib image/audio codecs for the multimodal operators.

Real decode with zero third-party dependencies: PNG via ``zlib`` +
``struct`` (8-bit greyscale / grey+alpha / RGB / RGBA, non-interlaced,
all five scanline filters), WAV via the stdlib ``wave`` module (PCM16).
``operators/multimodal.py`` prefers Pillow when it is installed; these
codecs make the container-default path a genuine decode — parsing the
actual container format into pixel / sample arrays — rather than a stub.

Scale note: codecs run inside Arrow-batched ``mapInPandas`` workers, one
asset at a time; nothing here touches the driver. Per-asset cost is the
inherent decode cost (zlib inflate + a per-scanline unfilter pass).
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS_BY_COLOR_TYPE = {0: 1, 2: 3, 4: 2, 6: 4}
_COLOR_TYPE_BY_CHANNELS = {1: 0, 2: 4, 3: 2, 4: 6}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def png_encode(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode a uint8 array (H×W or H×W×C, C∈{1,2,3,4}) as a PNG.

    ``filter_type`` applies one scanline filter (0=None, 1=Sub, 2=Up,
    3=Average, 4=Paeth) to every row — mainly so the decoder's unfilter
    paths are testable; 0 is the fast default.
    """
    a = np.ascontiguousarray(np.asarray(arr, dtype=np.uint8))
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in _COLOR_TYPE_BY_CHANNELS:
        raise ValueError(f"unsupported array shape {a.shape}")
    h, w, c = a.shape
    color_type = _COLOR_TYPE_BY_CHANNELS[c]
    if filter_type not in (0, 1, 2, 3, 4):
        raise ValueError(f"bad filter type {filter_type}")

    raw = bytearray()
    prev = np.zeros((w, c), dtype=np.int32)
    for y in range(h):
        row = a[y].astype(np.int32)
        left = np.zeros((w, c), dtype=np.int32)
        left[1:] = row[:-1]
        if filter_type == 0:
            out = row
        elif filter_type == 1:
            out = row - left
        elif filter_type == 2:
            out = row - prev
        elif filter_type == 3:
            out = row - (left + prev) // 2
        else:
            ul = np.zeros((w, c), dtype=np.int32)
            ul[1:] = prev[:-1]
            out = row - _paeth_vec(left, prev, ul)
        raw.append(filter_type)
        raw += (out % 256).astype(np.uint8).tobytes()
        prev = row

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def _paeth_vec(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def png_decode(data: bytes) -> np.ndarray:
    """Decode a PNG into a uint8 array of shape (H, W, C).

    Supports bit depth 8, color types 0/2/4/6 (grey, RGB, grey+alpha,
    RGBA), no interlacing — with full unfiltering of all five scanline
    filter types, so output from any conforming encoder of those shapes
    (including Pillow's default RGB writer) decodes correctly.
    """
    if data[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    channels = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if interlace != 0:
                raise ValueError("interlaced PNG unsupported")
            channels = _CHANNELS_BY_COLOR_TYPE.get(color_type)
            if channels is None:
                raise ValueError(f"unsupported color type {color_type}")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("truncated PNG (missing IHDR/IDAT)")

    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG payload size mismatch")

    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        line = raw[y * (stride + 1) : (y + 1) * (stride + 1)]
        ftype = line[0]
        cur = np.frombuffer(line, dtype=np.uint8, offset=1).astype(np.int32)
        if ftype == 0:
            pass
        elif ftype == 1:
            for x in range(channels, stride):
                cur[x] = (cur[x] + cur[x - channels]) % 256
        elif ftype == 2:
            cur = (cur + prev) % 256
        elif ftype == 3:
            for x in range(stride):
                left = cur[x - channels] if x >= channels else 0
                cur[x] = (cur[x] + (left + prev[x]) // 2) % 256
        elif ftype == 4:
            for x in range(stride):
                left = cur[x - channels] if x >= channels else 0
                ul = prev[x - channels] if x >= channels else 0
                cur[x] = (cur[x] + _paeth(left, int(prev[x]), ul)) % 256
        else:
            raise ValueError(f"bad scanline filter {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(height, width, channels)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def wav_encode(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode int16 PCM samples (1-D mono or (N, channels)) as a WAV."""
    a = np.asarray(samples, dtype=np.int16)
    n_channels = 1 if a.ndim == 1 else a.shape[1]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(np.ascontiguousarray(a).tobytes())
    return buf.getvalue()


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM16 WAV into (samples, sample_rate). Multichannel input
    comes back as shape (N, channels); mono as 1-D."""
    with wave.open(io.BytesIO(data), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError(f"unsupported sample width {w.getsampwidth()}")
        rate = w.getframerate()
        n_channels = w.getnchannels()
        frames = w.readframes(w.getnframes())
    a = np.frombuffer(frames, dtype=np.int16)
    if n_channels > 1:
        a = a.reshape(-1, n_channels)
    return a, rate
