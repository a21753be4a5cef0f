"""Deterministic Zipfian key generator — the target's analog of the
reference's benchmark generator surface (``/root/reference/src/zipf.c``,
vtable ``src/bm.c:140-159``): seeded, skewed key streams for fixtures and
benches. Re-derived from the standard inverse-CDF construction (exact
normalized CDF + binary search), not a port: the reference buckets the
tail for huge n as a speed optimization; numpy's vectorized searchsorted
over the exact CDF covers every fixture size this repo generates.
"""

from __future__ import annotations

import numpy as np


class ZipfGenerator:
    """Draw ranks in [0, n) with P(r) ∝ 1/(r+1)^theta, deterministically.

    The reference's bm generator hardcodes exponent 1.0 regardless of the
    CLI flag (``src/bm.c:114``, noted in SURVEY.md §2.7); theta is a real
    parameter here.
    """

    def __init__(self, n: int, theta: float = 1.0, seed: int = 0):
        if n <= 0:
            raise ValueError("n must be positive")
        self.n = n
        self.theta = theta
        self.seed = seed
        w = 1.0 / np.power(np.arange(1, n + 1, dtype=np.float64), theta)
        self._cdf = np.cumsum(w)
        self._cdf /= self._cdf[-1]
        self._rng = np.random.default_rng(seed)

    def draw(self, size: int) -> np.ndarray:
        """Vectorized inverse-CDF sampling → int64 ranks (0 = hottest)."""
        u = self._rng.random(size)
        return np.searchsorted(self._cdf, u, side="left").astype(np.int64)

    def expected_top_share(self, k: int) -> float:
        """CDF mass of the k hottest ranks (for skew assertions)."""
        return float(self._cdf[min(k, self.n) - 1])
