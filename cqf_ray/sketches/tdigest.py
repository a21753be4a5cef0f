"""t-digest — mergeable quantile sketch (north-rule companion; e.g. latency /
turn-length quantiles over transcripts).

Dunning's *merging* t-digest with the k1 scale function
k(q) = δ/(2π)·asin(2q−1): buffered points are sorted and greedily merged
into centroids while the k-size budget allows; accuracy concentrates at the
tails. Merge = concatenate centroids + recompress (associative at the
estimate level, as published).
"""

from __future__ import annotations

import struct

import numpy as np

from .base import pack_arrays, register, unpack_arrays


def _k1(q: np.ndarray, delta: float) -> np.ndarray:
    return delta / (2 * np.pi) * np.arcsin(2 * np.clip(q, 0.0, 1.0) - 1)


@register
class TDigest:
    KIND = b"TDG1"

    def __init__(self, delta: float = 200.0):
        self.delta = float(delta)
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self._buf: list[tuple[np.ndarray, np.ndarray]] = []
        self._buf_n = 0

    def update(self, values: np.ndarray, counts: np.ndarray | None = None) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[np.isfinite(v)]
        if len(v) == 0:
            return
        w = (
            np.ones(len(v), dtype=np.float64)
            if counts is None
            else np.asarray(counts, dtype=np.float64)[: len(v)]
        )
        self._buf.append((v, w))
        self._buf_n += len(v)
        if self._buf_n > 20 * self.delta:
            self._compress()

    def _compress(self) -> None:
        if not self._buf and len(self.means) <= 2 * self.delta:
            return
        m = np.concatenate([self.means, *(v for v, _ in self._buf)])
        w = np.concatenate([self.weights, *(x for _, x in self._buf)])
        self._buf, self._buf_n = [], 0
        if len(m) == 0:
            return
        order = np.argsort(m, kind="stable")
        m, w = m[order], w[order]
        total = w.sum()
        out_m: list[float] = []
        out_w: list[float] = []
        cur_m, cur_w = m[0], w[0]
        q0 = 0.0
        k_lo = _k1(np.array([0.0]), self.delta)[0]
        for i in range(1, len(m)):
            q_new = q0 + (cur_w + w[i]) / total
            if _k1(np.array([q_new]), self.delta)[0] - k_lo <= 1.0:
                cur_m += (m[i] - cur_m) * (w[i] / (cur_w + w[i]))
                cur_w += w[i]
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                q0 += cur_w / total
                k_lo = _k1(np.array([q0]), self.delta)[0]
                cur_m, cur_w = m[i], w[i]
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.array(out_m)
        self.weights = np.array(out_w)

    def merge_in_place(self, other: "TDigest") -> "TDigest":
        other._compress()
        if len(other.means):
            self._buf.append((other.means.copy(), other.weights.copy()))
            self._buf_n += len(other.means)
        self._compress()
        return self

    def quantile(self, q: float) -> float:
        self._compress()
        if len(self.means) == 0:
            return float("nan")
        if len(self.means) == 1:
            return float(self.means[0])
        cum = np.cumsum(self.weights) - self.weights / 2
        target = q * self.weights.sum()
        return float(np.interp(target, cum, self.means))

    def cdf(self, x: float) -> float:
        self._compress()
        if len(self.means) == 0:
            return float("nan")
        cum = np.cumsum(self.weights) - self.weights / 2
        return float(np.interp(x, self.means, cum / self.weights.sum()))

    @property
    def total_weight(self) -> float:
        self._compress()
        return float(self.weights.sum())

    def to_bytes(self) -> bytes:
        self._compress()
        return pack_arrays(self.KIND, struct.pack("<d", self.delta), [self.means, self.weights])

    @classmethod
    def from_bytes(cls, buf: bytes) -> "TDigest":
        params, arrays = unpack_arrays(buf, cls.KIND)
        (delta,) = struct.unpack("<d", params)
        out = cls(delta)
        out.means, out.weights = arrays[0], arrays[1]
        return out
