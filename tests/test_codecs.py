"""Round-trip + adversarial tests for the pure-Python BMP/WAV codecs
(the real-container decode path of pipelines/multimodal.py)."""

import struct

import numpy as np
import pytest

from cqf_ray.codecs import (bmp_stride, decode_bmp, decode_wav, encode_bmp,
                            encode_wav, sniff_kind)


def test_bmp_roundtrip_with_padding():
    # width 5 -> 15-byte rows padded to 16: exercises the stride rule
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(7, 5, 3), dtype=np.uint8)
    buf = encode_bmp(px)
    assert bmp_stride(5) == 16
    assert sniff_kind(buf) == "image"
    out = decode_bmp(buf)
    assert out.shape == (7, 5, 3)
    assert np.array_equal(out, px)


def test_bmp_bottom_up_flip_is_real():
    """The first stored row of a bottom-up BMP is the BOTTOM image row —
    craft a file by hand and check the decoder flips it."""
    w, h = 4, 2
    stride = bmp_stride(w)
    top = np.arange(12, dtype=np.uint8)
    bottom = np.arange(100, 112, dtype=np.uint8)
    data = bytes(bottom) + b"\0" * (stride - 12) + bytes(top) + b"\0" * (stride - 12)
    off = 54
    fh = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    ih = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 0, 0, 0, 0)
    out = decode_bmp(fh + ih + data)
    assert np.array_equal(out[0].reshape(-1), top)
    assert np.array_equal(out[1].reshape(-1), bottom)


def test_bmp_top_down_negative_height():
    px = np.arange(24, dtype=np.uint8).reshape(1, 8, 3)
    buf = bytearray(encode_bmp(px))
    # rewrite height to -1 (top-down): stored first row IS the top row
    struct.pack_into("<i", buf, 14 + 8, -1)
    out = decode_bmp(bytes(buf))
    assert np.array_equal(out, px)  # single row: flip is identity either way


def test_wav_roundtrip_and_chunk_walk():
    s = (np.arange(-5, 50, 3)).astype(np.int16)
    buf = encode_wav(s, 16000)
    assert sniff_kind(buf) == "audio"
    rate, out = decode_wav(buf)
    assert rate == 16000 and np.array_equal(out, s)
    # splice an extra LIST chunk between fmt and data: walker must skip it
    head, data_chunk = buf[: 12 + 8 + 16], buf[12 + 8 + 16:]
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\0"  # odd size, padded
    rate2, out2 = decode_wav(head + extra + data_chunk)
    assert rate2 == 16000 and np.array_equal(out2, s)


def test_codec_rejects_wrong_variants():
    with pytest.raises(ValueError):
        sniff_kind(b"GIF89a....")
    s = np.zeros(4, np.int16)
    buf = bytearray(encode_wav(s, 8000))
    struct.pack_into("<H", buf, 12 + 8 + 2, 2)  # channels=2
    with pytest.raises(ValueError):
        decode_wav(bytes(buf))
