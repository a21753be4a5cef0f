"""Counting Quotient Filter — from-scratch, numpy-vectorized, mergeable.

Semantics follow the reference CQF (Pandey, Bender, Johnson, Patro, SIGMOD
2017; C implementation surveyed in SURVEY.md §1-2, ``/root/reference/src/
gqf.c``): a compact counting multiset over a p-bit fingerprint space with

* three hash modes — ``default`` (MurmurHash64A % 2^p, lossy: false
  positives / merged counts possible at rate ≤ 2^-r), ``invertible``
  (Thomas Wang bijection — no false positives, keys recoverable), ``none``
  (caller pre-hashed); cf. ``src/gqf.c:1918-1924``,
* optional ``value_bits`` payload packed into the slot word
  (``hash = fp << value_bits | value``, ``src/gqf.c:1925-1926``),
* exact counts per stored fingerprint, hash-ordered lossless enumeration,
* associative/commutative merge with **canonical (bitwise-equal) serialized
  form under any merge order**,
* the reference's physical layout concepts: quotient/remainder split at
  ``bits_per_slot = key_remainder_bits + value_bits`` (``src/gqf.c:1437-1438``),
  64-slot blocks with ``occupieds``/``runends`` rank-select bitmaps and
  per-block offsets (``include/gqf_int.h:38-58``), runs of ascending
  remainders, and the run-length **counter escape encoding** of
  ``src/gqf.c:1028-1093`` (re-derived from its documented format, not
  copied): ``1×x → x``; ``2×x → x x``; ``3×0 → 0 0 0``; ``c×x (x>0,c>2) →
  x [0?] d_m..d_1 x`` with base-(2^bps-2) digits skipping 0 and x;
  ``c×0 (c>3) → 0 d_m..d_1 0 0`` with base-(2^bps-1) digits skipping 0.

Engineering departure from the reference (deliberate, Ray-native): the
in-memory working form is a **sorted (slot_word, count) multiset** in numpy
arrays — inserts/merges/probes are O(n log n) vectorized kernels rather
than per-slot bit surgery, which is what makes a Python/numpy CQF fast
inside ``Dataset.map_batches``. The packed quotient-filter layout is
produced *canonically* from that multiset at serialization time
(``to_bytes``), so two filters holding the same multiset are byte-identical
regardless of insert/merge order — a strictly stronger form of the
reference's canonical-layout property (SURVEY.md §1.2). Block offsets are
stored as uint16 (the reference saturates uint8 at 255 and rescans,
``src/gqf.c:559-564``; we avoid the rescan).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

from ..bitpack import pack_slots, packed_words, unpack_all
from ..hashing import fingerprint, hash_64i

_U64 = np.uint64
MAGIC = b"RYCQF001"
MAGIC_RAW = b"RYCQFR01"

_HASH_MODES = ("default", "invertible", "none")


class CQFNoSpace(RuntimeError):
    """Analog of the reference's QF_NO_SPACE (include/gqf.h:132)."""


@dataclass
class _Layout:
    """Packed placement computed canonically from the sorted multiset."""

    occupieds: np.ndarray  # uint64[nblocks]
    runends: np.ndarray  # uint64[nblocks]
    offsets: np.ndarray  # uint16[nblocks]
    slot_words: np.ndarray  # packed slots
    item_slot_index: np.ndarray  # int64[n_items] — first slot of each item's counter
    noccupied_slots: int
    q: int  # the (possibly auto-resized) log2 nslots actually used


def _nslots(q: int) -> int:
    return 1 << q


def _xnslots(q: int) -> int:
    # reference: nslots + 10*sqrt(nslots) overflow slack (src/gqf.c:1628)
    n = 1 << q
    return int(n + 10 * np.sqrt(n))


class CQF:
    """Counting Quotient Filter over a p-bit fingerprint space.

    Parameters
    ----------
    q: log2 of the slot count (quotient bits). Grows automatically when
       ``auto_resize`` (default) and load exceeds 95% or placement spills
       past the overflow slack — mirroring qf_insert's triggers
       (``src/gqf.c:1902-1913``).
    key_bits: p — fingerprint width. ``key_bits - q >= 2`` must hold
       (``src/gqf.c:1630-1635``).
    value_bits: optional payload width packed into the slot word.
    hash_mode: "default" | "invertible" | "none".
    seed: murmur seed (``default`` mode); part of merge compatibility.
    """

    __slots__ = (
        "q",
        "key_bits",
        "value_bits",
        "hash_mode",
        "seed",
        "auto_resize",
        "_words",
        "_counts",
        "_pending",
        "_layout",
    )

    def __init__(
        self,
        q: int = 16,
        key_bits: int = 32,
        value_bits: int = 0,
        hash_mode: str = "invertible",
        seed: int = 0,
        auto_resize: bool = True,
    ):
        if hash_mode not in _HASH_MODES:
            raise ValueError(f"hash_mode must be one of {_HASH_MODES}")
        if key_bits - q < 2:
            raise ValueError("key_bits - q (remainder bits) must be >= 2")
        if key_bits + value_bits > 62:
            raise ValueError("key_bits + value_bits too large for uint64 slot words")
        self.q = q
        self.key_bits = key_bits
        self.value_bits = value_bits
        self.hash_mode = hash_mode
        self.seed = seed
        self.auto_resize = auto_resize
        self._words = np.empty(0, dtype=_U64)  # sorted distinct slot words
        self._counts = np.empty(0, dtype=_U64)
        self._pending: list[tuple[np.ndarray, np.ndarray]] = []
        self._layout: _Layout | None = None

    # ---------------- geometry ----------------

    @property
    def nslots(self) -> int:
        return _nslots(self.q)

    @property
    def xnslots(self) -> int:
        return _xnslots(self.q)

    @property
    def key_remainder_bits(self) -> int:
        return self.key_bits - self.q

    @property
    def bits_per_slot(self) -> int:
        return self.key_remainder_bits + self.value_bits

    @property
    def range(self) -> int:
        """Fingerprint space size 2^p (src/gqf.c:1666-1667)."""
        return 1 << self.key_bits

    # ---------------- key → slot-word kernels ----------------

    def _to_words(self, keys, values=None, key_is_hash: bool = False) -> np.ndarray:
        keys = np.ascontiguousarray(keys, dtype=np.uint64)
        if key_is_hash or self.hash_mode == "none":
            fps = keys & _U64(self.range - 1)
        else:
            fps = fingerprint(keys, self.key_bits, self.hash_mode, self.seed)
        if self.value_bits:
            if values is None:
                values = np.zeros(len(keys), dtype=_U64)
            v = np.ascontiguousarray(values, dtype=np.uint64) & _U64((1 << self.value_bits) - 1)
            return (fps << _U64(self.value_bits)) | v
        return fps

    # ---------------- mutation ----------------

    def insert_many(self, keys, values=None, counts=None, key_is_hash: bool = False) -> None:
        """Vectorized multi-insert (the hot path inside map_batches).

        ``counts=None`` (or all-ones) pends a count-free batch; consolidation
        then takes a cheaper sort (no stable argsort + gather)."""
        words = self._to_words(keys, values, key_is_hash)
        if counts is None:
            c = None
        else:
            c = np.ascontiguousarray(counts, dtype=np.uint64)
            if (c == 1).all():
                c = None
            else:
                nz = c > 0
                if not nz.all():
                    words, c = words[nz], c[nz]
        if len(words):
            self._pending.append((words, c))
            self._layout = None

    def update(self, values: np.ndarray, counts: np.ndarray | None = None) -> None:
        """Sketch-protocol alias of :meth:`insert_many` (keys only, no payload)."""
        self.insert_many(values, counts=counts)

    def insert(self, key: int, value: int = 0, count: int = 1, key_is_hash: bool = False) -> None:
        self.insert_many(
            np.array([key], dtype=_U64),
            np.array([value], dtype=_U64) if self.value_bits else None,
            np.array([count], dtype=_U64),
            key_is_hash,
        )

    def remove(self, key: int, value: int = 0, count: int = 1, key_is_hash: bool = False) -> None:
        """Decrement (floor at 0) — qf_remove (src/gqf.c:1982-1998)."""
        self._consolidate()
        w = self._to_words(np.array([key], dtype=_U64), np.array([value], dtype=_U64), key_is_hash)[0]
        i = int(np.searchsorted(self._words, w))
        if i < len(self._words) and self._words[i] == w:
            have = int(self._counts[i])
            newc = have - min(count, have)
            if newc:
                self._counts[i] = newc
            else:
                self._words = np.delete(self._words, i)
                self._counts = np.delete(self._counts, i)
            self._layout = None

    def delete_key_value(self, key: int, value: int = 0, key_is_hash: bool = False) -> None:
        """Remove all instances — qf_delete_key_value (src/gqf.c:2000-2016)."""
        self.remove(key, value, count=(1 << 62), key_is_hash=key_is_hash)

    def set_count(self, key: int, value: int = 0, count: int = 0, key_is_hash: bool = False) -> None:
        """Set absolute count — qf_set_count (src/gqf.c:1962-1980)."""
        cur = self.count_key_value(key, value, key_is_hash)
        if count > cur:
            self.insert(key, value, count - cur, key_is_hash)
        elif count < cur:
            self.remove(key, value, cur - count, key_is_hash)

    def reset(self) -> None:
        self._words = np.empty(0, dtype=_U64)
        self._counts = np.empty(0, dtype=_U64)
        self._pending = []
        self._layout = None

    def copy(self) -> "CQF":
        self._consolidate()
        out = CQF(self.q, self.key_bits, self.value_bits, self.hash_mode, self.seed, self.auto_resize)
        out._words = self._words.copy()
        out._counts = self._counts.copy()
        return out

    def resize(self, new_q: int) -> None:
        """Re-pack with a different slot count; fingerprint space (key_bits)
        is unchanged, matching qf_resize (src/gqf.c:1819-1889)."""
        if self.key_bits - new_q < 2:
            raise ValueError("key_bits - new_q must be >= 2")
        self.q = new_q
        self._layout = None

    # ---------------- consolidation ----------------

    def _consolidate(self) -> None:
        if not self._pending:
            return
        pending = self._pending
        self._pending = []
        if len(self._words) == 0 and all(c is None for _, c in pending):
            # count-free fast path: plain sort (no index gather), counts =
            # run lengths — ~40% cheaper per batch in the build hot loop
            w = np.concatenate([wds for wds, _ in pending]) if len(pending) > 1 else pending[0][0]
            if len(w) == 0:
                return
            w = np.sort(w)
            boundary = np.empty(len(w), dtype=bool)
            boundary[0] = True
            np.not_equal(w[1:], w[:-1], out=boundary[1:])
            starts = np.flatnonzero(boundary)
            self._words = np.ascontiguousarray(w[starts])
            self._counts = np.diff(np.concatenate([starts, [len(w)]])).astype(_U64)
            self._layout = None
        else:
            parts_w = [self._words]
            parts_c = [self._counts]
            for wds, c in pending:
                parts_w.append(wds)
                parts_c.append(c if c is not None else np.ones(len(wds), dtype=_U64))
            w = np.concatenate(parts_w)
            c = np.concatenate(parts_c)
            if len(w) == 0:
                return
            order = np.argsort(w, kind="stable")
            w, c = w[order], c[order]
            # reduce equal adjacent words
            boundary = np.empty(len(w), dtype=bool)
            boundary[0] = True
            np.not_equal(w[1:], w[:-1], out=boundary[1:])
            starts = np.flatnonzero(boundary)
            self._words = w[starts]
            self._counts = np.add.reduceat(c, starts).astype(_U64)
            self._layout = None
        if self.auto_resize:
            # keep load under 95% of nslots, mirroring qf_insert's check;
            # key_bits (the fingerprint space) never changes — growing q
            # shrinks the remainder, exactly like qf_resize (src/gqf.c:1851-1889)
            while (
                self._slots_needed() >= 0.95 * self.nslots
                and self.key_bits - (self.q + 1) >= 2
            ):
                self.q += 1
        elif self._slots_needed() >= 0.95 * self.nslots:
            raise CQFNoSpace(
                f"{self._slots_needed()} slots needed >= 95% of {self.nslots}; "
                "enable auto_resize or construct with larger q"
            )

    def _slots_needed(self) -> int:
        L, _, _ = _encode_lengths(
            self._words & _U64((1 << self.bits_per_slot) - 1), self._counts, self.bits_per_slot
        )
        return int(L.sum()) if len(L) else 0

    # ---------------- queries ----------------

    def count_many(self, keys, values=None, key_is_hash: bool = False) -> np.ndarray:
        """Vectorized qf_count_key_value (src/gqf.c:2018-2054): 0 = definitely
        absent; `default` mode may over-count on fingerprint collision."""
        self._consolidate()
        words = self._to_words(keys, values, key_is_hash)
        if len(self._words) == 0:
            return np.zeros(len(words), dtype=_U64)
        idx = np.searchsorted(self._words, words)
        idx_c = np.minimum(idx, len(self._words) - 1)
        hit = self._words[idx_c] == words
        out = np.zeros(len(words), dtype=_U64)
        out[hit] = self._counts[idx_c[hit]]
        return out

    def count_key_value(self, key: int, value: int = 0, key_is_hash: bool = False) -> int:
        return int(self.count_many(np.array([key], dtype=_U64),
                                   np.array([value], dtype=_U64), key_is_hash)[0])

    def contains_many(self, keys, values=None, key_is_hash: bool = False) -> np.ndarray:
        return self.count_many(keys, values, key_is_hash) > 0

    def query(self, key: int, key_is_hash: bool = False) -> tuple[int, int]:
        """First value stored under key + its count — qf_query
        (src/gqf.c:2056-2093). Returns (value, count) or (0, 0)."""
        self._consolidate()
        keys = np.array([key], dtype=_U64)
        if key_is_hash or self.hash_mode == "none":
            fp = keys & _U64(self.range - 1)
        else:
            fp = fingerprint(keys, self.key_bits, self.hash_mode, self.seed)
        lo_word = fp[0] << _U64(self.value_bits)
        hi_word = (fp[0] + _U64(1)) << _U64(self.value_bits)
        i = int(np.searchsorted(self._words, lo_word))
        if i < len(self._words) and self._words[i] < hi_word:
            vmask = _U64((1 << self.value_bits) - 1) if self.value_bits else _U64(0)
            return int(self._words[i] & vmask), int(self._counts[i])
        return 0, 0

    def unique_index(self, key: int, value: int = 0, key_is_hash: bool = False) -> int:
        """Slot index of the key's counter in the packed layout — a
        perfect-hash-like handle, strictly increasing in hash order
        (qf_get_unique_index, src/gqf.c:2095-2132). -1 if absent."""
        lay = self._packed_layout()
        w = self._to_words(np.array([key], dtype=_U64), np.array([value], dtype=_U64), key_is_hash)[0]
        i = int(np.searchsorted(self._words, w))
        if i < len(self._words) and self._words[i] == w:
            return int(lay.item_slot_index[i])
        return -1

    # ---------------- metadata (qf_get_* family, src/gqf.c:2134-2186) --------

    @property
    def num_distinct(self) -> int:
        self._consolidate()
        return len(self._words)

    @property
    def sum_counts(self) -> int:
        self._consolidate()
        return int(self._counts.sum()) if len(self._counts) else 0

    @property
    def num_occupied_slots(self) -> int:
        self._consolidate()
        return self._slots_needed()

    # ---------------- enumeration (iterator surface, src/gqf.c:2191-2419) ----

    def items_arrays(self, start_hash: int = 0) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Lossless hash-ordered dump: (fingerprint, value, count) arrays.
        ``start_hash`` gives qf_iterator_from_key_value's ranged scan."""
        self._consolidate()
        w, c = self._words, self._counts
        if start_hash:
            i = int(np.searchsorted(w, _U64(start_hash) << _U64(self.value_bits)))
            w, c = w[i:], c[i:]
        if self.value_bits:
            vb = _U64(self.value_bits)
            return (w >> vb), (w & _U64((1 << self.value_bits) - 1)), c.copy()
        return w.copy(), np.zeros(len(w), dtype=_U64), c.copy()

    def keys_arrays(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(key, value, count) — inverts fingerprints (invertible mode only,
        qfi_get_key src/gqf.c:2333-2338)."""
        if self.hash_mode != "invertible":
            raise ValueError("key recovery requires hash_mode='invertible'")
        fps, vals, counts = self.items_arrays()
        return hash_64i(fps, self.range - 1), vals, counts

    def items(self, start_hash: int = 0):
        fps, vals, counts = self.items_arrays(start_hash)
        for i in range(len(fps)):
            yield int(fps[i]), int(vals[i]), int(counts[i])

    # ---------------- multiset algebra (src/gqf.c:2432-2619) ----------------

    def _check_compat(self, other: "CQF") -> None:
        if (self.hash_mode, self.seed, self.key_bits, self.value_bits) != (
            other.hash_mode,
            other.seed,
            other.key_bits,
            other.value_bits,
        ):
            raise ValueError("CQF merge requires identical hash_mode/seed/key_bits/value_bits "
                             "(cf. src/gqf.c:2438-2444)")

    def merge_in_place(self, other: "CQF") -> "CQF":
        self._check_compat(other)
        other._consolidate()
        if len(other._words):
            self._pending.append((other._words.copy(), other._counts.copy()))
            self._layout = None
        self.q = max(self.q, other.q)
        return self

    @staticmethod
    def merge(a: "CQF", b: "CQF") -> "CQF":
        """Multiset sum — associative & commutative; canonical serialization
        makes the result bitwise merge-order-independent (qf_merge,
        src/gqf.c:2432-2474)."""
        out = a.copy()
        return out.merge_in_place(b)

    @staticmethod
    def multi_merge(filters: list["CQF"]) -> "CQF":
        """k-way merge (qf_multi_merge, src/gqf.c:2479-2544)."""
        if not filters:
            raise ValueError("multi_merge of zero filters")
        out = filters[0].copy()
        for f in filters[1:]:
            out.merge_in_place(f)
        out._consolidate()
        return out

    def inner_product(self, other: "CQF") -> int:
        """Σ_h count_a(h)·count_b(h) (qf_inner_product, src/gqf.c:2547-2580)."""
        self._check_compat(other)
        self._consolidate()
        other._consolidate()
        common, ia, ib = np.intersect1d(self._words, other._words,
                                        assume_unique=True, return_indices=True)
        if len(common) == 0:
            return 0
        # object-dtype product avoids uint64 overflow on huge counts
        return int(np.sum(self._counts[ia].astype(object) * other._counts[ib].astype(object)))

    def magnitude(self) -> float:
        """√(inner_product(self,self)) (qf_magnitude, src/gqf.c:2616-2619)."""
        return float(np.sqrt(self.inner_product(self)))

    def intersect(self, other: "CQF") -> "CQF":
        """Keep items of the filter with more distinct entries whose hash
        occurs in the other (qf_intersect, src/gqf.c:2583-2613)."""
        self._check_compat(other)
        self._consolidate()
        other._consolidate()
        big, small = (self, other) if len(self._words) >= len(other._words) else (other, self)
        mask = np.isin(big._words, small._words, assume_unique=True)
        out = CQF(max(self.q, other.q), self.key_bits, self.value_bits,
                  self.hash_mode, self.seed, True)
        out._words = big._words[mask].copy()
        out._counts = big._counts[mask].copy()
        return out

    # ---------------- canonical packed layout ----------------

    def _packed_layout(self) -> _Layout:
        self._consolidate()
        if self._layout is None:
            self._layout = _build_layout(
                self._words, self._counts, self.q, self.bits_per_slot,
                self.auto_resize, self.key_bits - 2,
            )
            if self._layout.q != self.q:
                self.q = self._layout.q  # auto-resized during packing
        return self._layout

    # ---------------- serialization (qf_serialize/deserialize analog) --------

    def to_bytes(self) -> bytes:
        """Canonical packed serialization: header + offsets + occupieds +
        runends + bit-packed slots. Byte-identical for equal multisets."""
        lay = self._packed_layout()
        header = MAGIC + struct.pack(
            "<BBBBBBxxQQQQ",
            2,  # version (2: flags byte carries auto_resize)
            lay.q,
            self.key_bits,
            self.value_bits,
            _HASH_MODES.index(self.hash_mode),
            1 if self.auto_resize else 0,
            self.seed,
            self.num_distinct,
            self.sum_counts,
            lay.noccupied_slots,
        )
        return b"".join(
            [
                header,
                lay.offsets.tobytes(),
                lay.occupieds.tobytes(),
                lay.runends.tobytes(),
                lay.slot_words.tobytes(),
            ]
        )

    def to_bytes_raw(self) -> bytes:
        """Fast shuttle serialization for internal partial blobs: header +
        sorted distinct slot words + counts. Also canonical (pure function
        of the multiset) but skips the packed quotient-filter layout — use
        for merge-tree traffic; `to_bytes` (packed, reference-shaped) for
        published/global artifacts. Both round-trip losslessly."""
        self._consolidate()
        header = MAGIC_RAW + struct.pack(
            "<BBBBBBxxQQ",
            2, self.q, self.key_bits, self.value_bits,
            _HASH_MODES.index(self.hash_mode), 1 if self.auto_resize else 0,
            self.seed, len(self._words),
        )
        return b"".join([header, self._words.tobytes(), self._counts.tobytes()])

    @classmethod
    def _from_bytes_raw(cls, buf: bytes) -> "CQF":
        (ver, q, key_bits, value_bits, hmode, flags, seed, n) = struct.unpack(
            "<BBBBBBxxQQ", buf[8 : 8 + 24]
        )
        if ver not in (1, 2):
            raise ValueError(f"unsupported raw CQF version {ver}")
        # v1 blobs (round-1 checkpoints/dumps) zero-padded the flags byte and
        # implied auto_resize=True; v2 carries it in bit 0 of the flags byte.
        auto = bool(flags & 1) if ver == 2 else True
        out = cls(q, key_bits, value_bits, _HASH_MODES[hmode], seed, auto)
        off = 8 + 24
        out._words = np.frombuffer(buf, dtype=_U64, count=n, offset=off).copy()
        out._counts = np.frombuffer(buf, dtype=_U64, count=n, offset=off + 8 * n).copy()
        return out

    @classmethod
    def from_bytes(cls, buf: bytes) -> "CQF":
        if buf[:8] == MAGIC_RAW:
            return cls._from_bytes_raw(buf)
        if buf[:8] != MAGIC:
            raise ValueError("bad magic — not a serialized CQF")
        (ver, q, key_bits, value_bits, hmode, flags, seed, ndistinct, scounts, nocc) = struct.unpack(
            "<BBBBBBxxQQQQ", buf[8 : 8 + 40]
        )
        if ver not in (1, 2):
            raise ValueError(f"unsupported CQF version {ver}")
        auto = bool(flags & 1) if ver == 2 else True  # v1: pad byte, implicit True
        out = cls(q, key_bits, value_bits, _HASH_MODES[hmode], seed, auto)
        xn = out.xnslots
        nblocks = (xn + 63) // 64
        off = 8 + 40
        offsets = np.frombuffer(buf, dtype=np.uint16, count=nblocks, offset=off)
        off += nblocks * 2
        occupieds = np.frombuffer(buf, dtype=_U64, count=nblocks, offset=off)
        off += nblocks * 8
        runends = np.frombuffer(buf, dtype=_U64, count=nblocks, offset=off)
        off += nblocks * 8
        nwords = packed_words(xn, out.bits_per_slot)
        slot_words = np.frombuffer(buf, dtype=_U64, count=nwords, offset=off)

        words, counts = _decode_layout(
            occupieds, runends, slot_words, xn, out.bits_per_slot, ndistinct, scounts
        )
        out._words = words
        out._counts = counts
        return out

    def __len__(self) -> int:
        return self.num_distinct

    def __repr__(self) -> str:
        return (
            f"CQF(q={self.q}, key_bits={self.key_bits}, value_bits={self.value_bits}, "
            f"hash_mode={self.hash_mode!r}, seed={self.seed}, "
            f"distinct={self.num_distinct}, total={self.sum_counts})"
        )


# ---------------------------------------------------------------------------
# counter escape encoding (format per src/gqf.c:1028-1036, re-derived)
# ---------------------------------------------------------------------------


def _heavy_digits(rem: np.ndarray, cnt: np.ndarray, bps: int):
    """Digit columns for counts needing the escape encoding (cnt > 3, or any
    cnt >= 4 for rem == 0 — note cnt==3,rem==0 is the literal '000').

    Returns (ndigits, marker, columns) where columns[k] is the k-th emitted
    digit (least-significant first) with -1 for finished items.
    """
    n = len(rem)
    base = np.where(rem > 0, _U64((1 << bps) - 2), _U64((1 << bps) - 1))
    c = np.where(rem > 0, cnt - _U64(3), cnt - _U64(4))
    cols: list[np.ndarray] = []
    ndig = np.zeros(n, dtype=np.int64)
    active = np.ones(n, dtype=bool)
    last_digit = np.zeros(n, dtype=_U64)
    while active.any():
        d = (c % base) + _U64(1)
        bump = (rem > 0) & (d >= rem)
        d = np.where(bump, d + _U64(1), d)
        col = np.where(active, d, _U64(0))
        cols.append(col)
        last_digit = np.where(active, d, last_digit)
        ndig += active
        c = c // base
        active = active & (c > 0)
    marker = (rem > 0) & (last_digit >= rem)
    return ndig, marker, cols


def _encode_lengths(rem: np.ndarray, cnt: np.ndarray, bps: int):
    """Per-item encoded slot length L, plus heavy-item info for reuse."""
    n = len(rem)
    L = np.ones(n, dtype=np.int64)
    L[cnt == 2] = 2
    L[cnt == 3] = 3
    heavy = cnt > 3
    hinfo = None
    if heavy.any():
        hi = np.flatnonzero(heavy)
        ndig, marker, cols = _heavy_digits(rem[hi], cnt[hi], bps)
        hrem = rem[hi]
        # rem>0: [r, 0?, digits..., r]  → 2 + marker + ndig
        # rem==0: [0, digits..., 0, 0] → 3 + ndig
        L[hi] = np.where(hrem > 0, 2 + marker.astype(np.int64) + ndig, 3 + ndig)
        hinfo = (hi, ndig, marker, cols)
    return L, heavy, hinfo


def _encode_slot_values(rem: np.ndarray, cnt: np.ndarray, bps: int):
    """Flat array of encoded slot values for all items (concatenated), plus
    per-item lengths L. Vectorized; the digit loop iterates over digit
    positions (≤ ceil(64/log2(base))), not items."""
    L, heavy, hinfo = _encode_lengths(rem, cnt, bps)
    total = int(L.sum())
    starts = np.concatenate([[0], np.cumsum(L)[:-1]]).astype(np.int64)
    flat = np.zeros(total, dtype=_U64)
    # leading + trailing remainder for every item (covers c==1 [x], c==2 [x,x],
    # c==3 [x,0,x]/[0,0,0] with the zero middle from initialization)
    flat[starts] = rem
    flat[starts + L - 1] = rem
    if hinfo is not None:
        hi, ndig, marker, cols = hinfo
        hstarts = starts[hi]
        hrem = rem[hi]
        dig_base = np.where(hrem > 0, hstarts + 1 + marker.astype(np.int64), hstarts + 1)
        for k, col in enumerate(cols):
            sel = ndig > k  # item still had a k-th digit
            pos = dig_base[sel] + (ndig[sel] - 1 - k)
            flat[pos] = col[sel]
        # rem==0 heavy: trailing is [.., 0, 0] — both zeros already there;
        # but the item's *last* slot must be 0 and second-to-last 0: flat was
        # zero-initialized and flat[start+L-1]=rem=0, ok.
    return flat, L


def _decode_run(slots: np.ndarray, bps: int) -> list[tuple[int, int]]:
    """Decode one run's slot values into [(remainder, count)] — inverse of
    the escape encoding, following the same decision tree as the reference's
    decode_counter (src/gqf.c:1097-1167) with "is_runend" ⇒ end of array.
    Scalar; used by the general from_bytes path (counts > 1 present)."""
    out: list[tuple[int, int]] = []
    i = 0
    n = len(slots)
    while i < n:
        rem = int(slots[i])
        if i == n - 1:  # runend at the remainder itself
            out.append((rem, 1))
            break
        nxt = int(slots[i + 1])
        if i + 1 == n - 1:  # runend right after
            if nxt == rem:
                out.append((rem, 2))
                i += 2
            else:
                out.append((rem, 1))
                i += 1
            continue
        if rem > 0 and nxt >= rem:
            if nxt == rem:
                out.append((rem, 2))
                i += 2
            else:
                out.append((rem, 1))
                i += 1
            continue
        if rem > 0 and nxt == 0 and int(slots[i + 2]) == rem:
            out.append((rem, 3))
            i += 3
            continue
        if rem == 0 and nxt == 0:
            if int(slots[i + 2]) == 0:
                out.append((0, 3))
                i += 3
            else:
                out.append((0, 2))
                i += 2
            continue
        # escape-encoded counter
        base = (1 << bps) - (2 if rem > 0 else 1)
        cnt = 0
        j = i + 1
        digit = nxt
        while digit != rem and j < n - 1:
            d = digit
            if d > rem:
                d -= 1
            if d and rem:
                d -= 1
            cnt = cnt * base + d
            j += 1
            digit = int(slots[j])
        if rem:
            out.append((rem, cnt + 3))
            i = j + 1
        else:
            if j == n - 1 or int(slots[j + 1]) != 0:
                out.append((rem, 1))
                i += 1
            else:
                out.append((0, cnt + 4))
                i = j + 2
    return out


# ---------------------------------------------------------------------------
# canonical placement
# ---------------------------------------------------------------------------


def _build_layout(
    words: np.ndarray,
    counts: np.ndarray,
    q: int,
    bps: int,
    auto_resize: bool,
    max_q: int,
) -> _Layout:
    while True:
        lay = _try_layout(words, counts, q, bps)
        if lay is not None:
            return lay
        if not auto_resize or q >= max_q:
            raise CQFNoSpace(f"packed layout overflows xnslots at q={q}")
        q += 1
        bps -= 1  # key_bits fixed ⇒ remainder shrinks as quotient grows
        if bps < 2:
            raise CQFNoSpace("cannot grow q further: remainder bits exhausted")


def _try_layout(words: np.ndarray, counts: np.ndarray, q: int, bps: int) -> _Layout | None:
    xn = _xnslots(q)
    nblocks = (xn + 63) // 64
    if len(words) == 0:
        return _Layout(
            occupieds=np.zeros(nblocks, dtype=_U64),
            runends=np.zeros(nblocks, dtype=_U64),
            offsets=np.zeros(nblocks, dtype=np.uint16),
            slot_words=pack_slots(np.empty(0, dtype=_U64), np.empty(0, dtype=_U64), xn, bps),
            item_slot_index=np.empty(0, dtype=np.int64),
            noccupied_slots=0,
            q=q,
        )
    quot = (words >> _U64(bps)).astype(np.int64)
    rem = words & _U64((1 << bps) - 1)
    flat, L = _encode_slot_values(rem, counts, bps)
    # run grouping (words sorted ⇒ quotients non-decreasing)
    run_start_item = np.flatnonzero(np.concatenate([[True], quot[1:] != quot[:-1]]))
    run_quot = quot[run_start_item]
    run_len = np.add.reduceat(L, run_start_item)
    # placement: end_j = cumsum(len)_j + cummax(quot_j - cumsum_excl(len)_j)
    csum = np.cumsum(run_len)
    csum_excl = csum - run_len
    end_excl = csum + np.maximum.accumulate(run_quot - csum_excl)
    if end_excl[-1] > xn:
        return None
    run_start = end_excl - run_len
    # per-slot global positions
    item_starts_flat = np.concatenate([[0], np.cumsum(L)[:-1]])
    run_flat_start = item_starts_flat[run_start_item]
    shift = np.repeat(run_start - run_flat_start, run_len)
    positions = shift + np.arange(len(flat), dtype=np.int64)
    # bitmaps
    occupieds = np.zeros(nblocks, dtype=_U64)
    runends = np.zeros(nblocks, dtype=_U64)
    with np.errstate(over="ignore"):
        np.bitwise_or.at(occupieds, run_quot >> 6, _U64(1) << (run_quot & 63).astype(_U64))
        re_idx = end_excl - 1
        np.bitwise_or.at(runends, re_idx >> 6, _U64(1) << (re_idx & 63).astype(_U64))
    # block offsets: distance from block start to the inclusive end of the
    # run of the largest occupied quotient <= block start (0 if none/ended)
    bstarts = np.arange(nblocks, dtype=np.int64) * 64
    jstar = np.searchsorted(run_quot, bstarts, side="right") - 1
    ends_incl = end_excl - 1
    off = np.where(jstar >= 0, ends_incl[np.maximum(jstar, 0)] - bstarts, -1)
    offsets = np.clip(off, 0, 65535).astype(np.uint16)
    # per-item first-slot index (unique_index surface)
    item_slot_index = (item_starts_flat + shift[item_starts_flat]).astype(np.int64)
    return _Layout(
        occupieds=occupieds,
        runends=runends,
        offsets=offsets,
        slot_words=pack_slots(positions.astype(_U64), flat, xn, bps),
        item_slot_index=item_slot_index.astype(np.int64),
        noccupied_slots=int(L.sum()),
        q=q,
    )


def _decode_layout(
    occupieds: np.ndarray,
    runends: np.ndarray,
    slot_words: np.ndarray,
    xn: int,
    bps: int,
    ndistinct: int,
    sum_counts: int,
):
    """Rebuild the sorted (word, count) multiset from the packed bitmaps."""
    if ndistinct == 0:
        return np.empty(0, dtype=_U64), np.empty(0, dtype=_U64)
    occ_bits = np.unpackbits(occupieds.view(np.uint8), bitorder="little")
    re_bits = np.unpackbits(runends.view(np.uint8), bitorder="little")
    quots = np.flatnonzero(occ_bits).astype(np.int64)
    ends = np.flatnonzero(re_bits).astype(np.int64)
    assert len(quots) == len(ends), "corrupt layout: occupieds/runends mismatch"
    starts = np.maximum(quots, np.concatenate([[0], ends[:-1] + 1]))
    slots = unpack_all(slot_words, xn, bps)
    run_len = ends - starts + 1
    if sum_counts == ndistinct:
        # fast path: every count is 1 ⇒ every slot is a bare remainder
        rem = slots[_ranges(starts, ends)]
        qrep = np.repeat(quots, run_len).astype(_U64)
        words = (qrep << _U64(bps)) | rem.astype(_U64)
        return words, np.ones(len(words), dtype=_U64)
    # hybrid: a run is all-count-1 iff its slots are strictly ascending —
    # every counter encoding repeats/undershoots the remainder somewhere
    # (x x; x 0 x; x …digits… x; 0 … 0 0), breaking strict ascent. Decode
    # ascending runs vectorized; scalar-decode only counter-bearing runs.
    flat_idx = _ranges(starts, ends)
    flat = slots[flat_idx]
    run_of = np.repeat(np.arange(len(starts)), run_len)
    rising = np.ones(len(flat), dtype=bool)
    if len(flat) > 1:
        same_run = run_of[1:] == run_of[:-1]
        rising[1:] = ~same_run | (flat[1:] > flat[:-1])
    run_ascending = np.logical_and.reduceat(rising, np.concatenate([[0], np.cumsum(run_len)[:-1]]))
    asc_mask_flat = np.repeat(run_ascending, run_len)
    qflat = np.repeat(quots, run_len).astype(_U64)
    asc_words = (qflat[asc_mask_flat] << _U64(bps)) | flat[asc_mask_flat].astype(_U64)
    words_out = []
    counts_out = []
    for ri in np.flatnonzero(~run_ascending):
        s, e, qt = starts[ri], ends[ri], quots[ri]
        for r, c in _decode_run(slots[s : e + 1], bps):
            words_out.append((int(qt) << bps) | int(r))
            counts_out.append(c)
    words = np.concatenate([asc_words, np.array(words_out, dtype=_U64)])
    counts = np.concatenate(
        [np.ones(len(asc_words), dtype=_U64), np.array(counts_out, dtype=_U64)]
    )
    order = np.argsort(words, kind="stable")
    return words[order], counts[order]


def _ranges(starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """Vectorized concatenation of [s, e] inclusive ranges."""
    lens = ends - starts + 1
    total = int(lens.sum())
    out = np.ones(total, dtype=np.int64)
    heads = np.concatenate([[0], np.cumsum(lens)[:-1]])
    out[heads] = starts - np.concatenate([[0], ends[:-1]])
    return np.cumsum(out)
