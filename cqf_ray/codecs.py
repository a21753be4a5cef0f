"""Pure-Python (struct + numpy) codecs for ONE real container format per
modality — BMP for images (BITMAPFILEHEADER + BITMAPINFOHEADER, 24 bpp,
bottom-up row order, 4-byte row padding) and WAV for audio (RIFF/WAVE
chunk walk, PCM16 mono little-endian).

This closes the multimodal decode stub honestly: the decoders parse real
headers (magic sniffing, data offset, stride/padding arithmetic, chunk
alignment), not a byte passthrough.  The container ships no PIL/ffmpeg,
so these cover the formats that are fully specifiable in a page of
struct-unpacks; richer codecs plug into the same actor-pool stage
(`pipelines/multimodal.py::MediaDecoder`) on a real cluster.
"""

from __future__ import annotations

import struct

import numpy as np

_BMP_FILE_HDR = "<2sIHHI"      # magic, file size, res1, res2, data offset
_BMP_INFO_HDR = "<IiiHHIIiiII"  # size, w, h, planes, bpp, comp, imgsize, ...
_WAV_FMT = "<HHIIHH"           # audio fmt, channels, rate, byterate, align, bits


def bmp_stride(width: int) -> int:
    """Bytes per stored row: 3 bytes/pixel rounded UP to a 4-byte boundary
    (the BMP padding rule decoders must honor)."""
    return (width * 3 + 3) & ~3


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 top-down pixel array -> 24 bpp bottom-up BMP."""
    h, w, c = pixels.shape
    if c != 3:
        raise ValueError("encode_bmp wants (h, w, 3)")
    stride = bmp_stride(w)
    rows = pixels[::-1].reshape(h, w * 3).astype(np.uint8, copy=False)
    if stride > w * 3:
        rows = np.concatenate(
            [rows, np.zeros((h, stride - w * 3), np.uint8)], axis=1)
    data = rows.tobytes()
    off = 14 + 40
    fh = struct.pack(_BMP_FILE_HDR, b"BM", off + len(data), 0, 0, off)
    ih = struct.pack(_BMP_INFO_HDR, 40, w, h, 1, 24, 0, len(data),
                     2835, 2835, 0, 0)
    return fh + ih + data


def decode_bmp(buf: bytes) -> np.ndarray:
    """24 bpp uncompressed BMP -> (h, w, 3) uint8 TOP-DOWN pixel array.
    Handles both bottom-up (positive height — the default) and top-down
    (negative height) files, and strips the per-row padding."""
    magic, _, _, _, off = struct.unpack_from(_BMP_FILE_HDR, buf, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    _, w, h, _, bpp, comp = struct.unpack_from("<IiiHHI", buf, 14)
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, comp={comp})")
    bottom_up = h > 0
    h = abs(h)
    stride = bmp_stride(w)
    arr = np.frombuffer(buf, np.uint8, count=stride * h, offset=off)
    arr = arr.reshape(h, stride)[:, : w * 3]
    if bottom_up:
        arr = arr[::-1]
    return arr.reshape(h, w, 3).copy()


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """int16 mono samples -> RIFF/WAVE PCM16 file bytes."""
    data = samples.astype("<i2", copy=False).tobytes()
    fmt = struct.pack(_WAV_FMT, 1, 1, rate, rate * 2, 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(buf: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM16 mono -> (sample_rate, int16 sample array).  Walks
    the chunk list (word-aligned) rather than assuming a fixed layout, so
    files with extra chunks (LIST/INFO metadata) decode too."""
    riff, _, wave = struct.unpack_from("<4sI4s", buf, 0)
    if riff != b"RIFF" or wave != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, rate, data = 12, None, None
    while pos + 8 <= len(buf):
        cid, csz = struct.unpack_from("<4sI", buf, pos)
        pos += 8
        if cid == b"fmt ":
            fmt, channels, rate, _, _, bits = struct.unpack_from(
                _WAV_FMT, buf, pos)
            if (fmt, channels, bits) != (1, 1, 16):
                raise ValueError(
                    f"unsupported WAV variant (fmt={fmt}, ch={channels}, "
                    f"bits={bits})")
        elif cid == b"data":
            data = np.frombuffer(buf, "<i2", count=csz // 2, offset=pos)
        pos += csz + (csz & 1)  # RIFF chunks are word-aligned
    if rate is None:
        raise ValueError("WAV without fmt chunk")
    return rate, (data if data is not None else np.empty(0, np.int16))


def sniff_kind(buf: bytes) -> str:
    """Container sniffing by magic — what a real ingest stage does before
    dispatching to a decoder."""
    if buf[:2] == b"BM":
        return "image"
    if buf[:4] == b"RIFF" and buf[8:12] == b"WAVE":
        return "audio"
    raise ValueError("unknown container")
