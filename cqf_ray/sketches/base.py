"""The Sketch protocol — the target's analog of the reference benchmark's
pluggable filter vtable (``/root/reference/src/bm.c:161-171``,
``include/gqf_wrapper.h:20-73``): every sketch is a fixed-size, associative,
mergeable accumulator with byte serialization, so one generic Ray Data
UDAF driver (stages/agg.py) can build any of them.

Contract: ``update(values)`` consumes a numpy array (uint64 hashes for
membership/frequency sketches, float64 for quantile sketches);
``merge_in_place(other)`` must be associative and commutative up to the
sketch's published equivalence (bitwise for CQF/Bloom/HLL/CMS, estimate-
level for t-digest/KLL); ``to_bytes``/``from_bytes`` round-trip exactly.
"""

from __future__ import annotations

import struct
from typing import Protocol, runtime_checkable

import numpy as np


@runtime_checkable
class Sketch(Protocol):
    KIND: bytes  # 4-byte tag used by the serialization registry

    def update(self, values: np.ndarray, counts: np.ndarray | None = None) -> None: ...

    def merge_in_place(self, other: "Sketch") -> "Sketch": ...

    def to_bytes(self) -> bytes: ...


_REGISTRY: dict[bytes, type] = {}


def register(cls):
    """Class decorator adding the sketch type to the from_bytes registry."""
    _REGISTRY[cls.KIND] = cls
    return cls


def sketch_from_bytes(buf: bytes):
    """Deserialize any registered sketch (dispatch on the 4-byte kind tag,
    or the CQF's 8-byte magic)."""
    from .cqf import CQF, MAGIC, MAGIC_RAW

    if buf[:8] in (MAGIC, MAGIC_RAW):
        return CQF.from_bytes(buf)
    kind = buf[:4]
    if kind not in _REGISTRY:
        raise ValueError(f"unknown sketch tag {kind!r}")
    return _REGISTRY[kind].from_bytes(buf)


def pack_arrays(kind: bytes, params: bytes, arrays: list[np.ndarray]) -> bytes:
    """kind(4) + u32 param_len + params + [u8 dtype_code + u64 nbytes + data]*"""
    out = [kind, struct.pack("<I", len(params)), params, struct.pack("<B", len(arrays))]
    for a in arrays:
        a = np.ascontiguousarray(a)
        code = a.dtype.str.encode()
        out.append(struct.pack("<B", len(code)))
        out.append(code)
        data = a.tobytes()
        out.append(struct.pack("<Q", len(data)))
        out.append(data)
    return b"".join(out)


def unpack_arrays(buf: bytes, kind: bytes) -> tuple[bytes, list[np.ndarray]]:
    assert buf[:4] == kind, f"expected {kind!r}, got {buf[:4]!r}"
    (plen,) = struct.unpack_from("<I", buf, 4)
    off = 8
    params = buf[off : off + plen]
    off += plen
    (narr,) = struct.unpack_from("<B", buf, off)
    off += 1
    arrays = []
    for _ in range(narr):
        (clen,) = struct.unpack_from("<B", buf, off)
        off += 1
        dtype = np.dtype(buf[off : off + clen].decode())
        off += clen
        (nb,) = struct.unpack_from("<Q", buf, off)
        off += 8
        arrays.append(np.frombuffer(buf, dtype=dtype, count=nb // dtype.itemsize, offset=off).copy())
        off += nb
    return params, arrays


def bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for uint64 (no float rounding hazards)."""
    x = x.astype(np.uint64, copy=True)
    out = np.zeros(len(x), dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        t = x >> np.uint64(s)
        m = t > 0
        out[m] += s
        x[m] = t[m]
    out[x > 0] += 1
    return out
