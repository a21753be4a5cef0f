"""Incremental (streaming) sketch maintenance with periodic checkpoints.

The reference CQF is a *streaming-updatable* summary: inserts at any time,
queries at any time (SURVEY.md §1.3/§2.10). The distributed batch analog is
state/checkpoint.py (partition builds). This module is the ORDERED-STREAM
analog: consume an event-time-ordered Dataset in micro-batches through one
live sketch, checkpoint every k batches, answer queries between updates,
and resume exactly from the last checkpoint after a crash.

Exactly-once resume relies on (a) deterministic batch order —
``preserve_order`` is forced on the consuming context and the input must
have a stable sort key — and (b) the sketch's canonical serialization, so
a resumed stream converges to the bitwise-identical filter.
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable

import numpy as np
import ray

from ..sketches.base import sketch_from_bytes


class StreamingSketchBuilder:
    def __init__(
        self,
        make_sketch: Callable[[], Any],
        extract: Callable,
        ckpt_dir: str,
        *,
        checkpoint_every: int = 5,
        counted: bool = False,
    ):
        self.make_sketch = make_sketch
        self.extract = extract
        self.ckpt_dir = ckpt_dir
        self.checkpoint_every = checkpoint_every
        self.counted = counted
        os.makedirs(ckpt_dir, exist_ok=True)
        self.sketch = make_sketch()
        self.batches_done = 0
        self.rows_done = 0
        self._load()

    # ---------------- checkpointing ----------------

    def _paths(self):
        return (os.path.join(self.ckpt_dir, "stream.sketch"),
                os.path.join(self.ckpt_dir, "stream.json"))

    def _load(self) -> None:
        blob_p, meta_p = self._paths()
        if os.path.exists(blob_p) and os.path.exists(meta_p):
            with open(meta_p) as f:
                meta = json.load(f)
            with open(blob_p, "rb") as f:
                self.sketch = sketch_from_bytes(f.read())
            self.batches_done = meta["batches_done"]
            self.rows_done = meta["rows_done"]

    def checkpoint(self) -> None:
        blob_p, meta_p = self._paths()
        tmp = blob_p + ".tmp"
        with open(tmp, "wb") as f:
            f.write(self.sketch.to_bytes())
        os.replace(tmp, blob_p)  # atomic: meta always refers to a full blob
        tmp = meta_p + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"batches_done": self.batches_done, "rows_done": self.rows_done}, f)
        os.replace(tmp, meta_p)

    # ---------------- consumption ----------------

    def run(
        self,
        ds: "ray.data.Dataset",
        *,
        batch_size: int = 4096,
        fail_after: int | None = None,
    ):
        """Consume the stream from the last checkpoint. ``fail_after=k``
        raises after k NEW batches (crash injection for tests)."""
        ctx = ray.data.DataContext.get_current()
        prev = ctx.execution_options.preserve_order
        ctx.execution_options.preserve_order = True  # deterministic replay
        try:
            processed = 0
            for i, batch in enumerate(
                ds.iter_batches(batch_format="pyarrow", batch_size=batch_size)
            ):
                if i < self.batches_done:
                    continue  # already in the checkpointed prefix
                if self.counted:
                    vals, counts = self.extract(batch)
                    self.sketch.update(vals, counts)
                else:
                    self.sketch.update(self.extract(batch))
                self.batches_done += 1
                self.rows_done += batch.num_rows
                processed += 1
                if self.batches_done % self.checkpoint_every == 0:
                    self.checkpoint()
                if fail_after is not None and processed >= fail_after:
                    raise RuntimeError(f"injected stream failure after {processed} batches")
            self.checkpoint()
        finally:
            ctx.execution_options.preserve_order = prev
        return self.sketch


class StreamingWindowAggregator:
    """Event-time TUMBLING-WINDOW streaming aggregate with watermark,
    allowed lateness, and checkpoint/resume — §2.10 beyond sketch
    maintenance: the stream analog of ``hourly_event_windows``.

    Consumes an event-time-mostly-ordered stream in micro-batches.  Per
    batch, a vectorized polars partial collapses rows to (window, key)
    accumulator deltas (Python touches windows, never rows); the
    watermark advances to max-event-time − allowed lateness; windows
    whose end ≤ watermark FINALIZE — emitted exactly once, in (window,
    key) order — and events arriving behind the watermark land in the
    LATE SIDE OUTPUT (``late_output()``: per-(window, key) count/sum
    aggregates, plus the ``late_dropped`` row counter) rather than being
    silently lost — the downstream reconciliation job can fold them into
    the finalized results or alert on them.  With lateness ≥ the
    stream's true disorder the finalized+flushed output equals the batch
    aggregate EXACTLY (micro-unit integer sums), which is the
    oracle-checked contract of ``streaming_hourly_windows``.

    Checkpoints follow the module's atomic-rename convention and carry
    the open-window accumulators, the emission log (the output sink's
    stand-in), the input position, the watermark clock, and the late
    counter — a resumed stream replays to bitwise-identical emissions
    (crash-injection pytest)."""

    def __init__(self, ckpt_dir: str, *, window_us: int = 3_600_000_000,
                 lateness_us: int = 0, checkpoint_every: int = 5):
        self.ckpt_dir = ckpt_dir
        self.window_us = int(window_us)
        self.lateness_us = int(lateness_us)
        self.checkpoint_every = checkpoint_every
        os.makedirs(ckpt_dir, exist_ok=True)
        self.open: dict[tuple[int, str], list[int]] = {}
        self.emitted: list[tuple[int, str, int, int]] = []
        self.late_side: dict[tuple[int, str], list[int]] = {}
        self.batches_done = 0
        self.max_ts = -(1 << 62)
        self.late_dropped = 0
        self._load()

    def _meta_path(self) -> str:
        return os.path.join(self.ckpt_dir, "windows.json")

    def _load(self) -> None:
        p = self._meta_path()
        if os.path.exists(p):
            with open(p) as f:
                m = json.load(f)
            self.open = {(int(w), k): [int(n), int(s)]
                         for w, k, n, s in m["open"]}
            self.emitted = [(int(w), k, int(n), int(s)) for w, k, n, s in m["emitted"]]
            self.late_side = {(int(w), k): [int(n), int(s)]
                              for w, k, n, s in m.get("late_side", [])}
            self.batches_done = m["batches_done"]
            self.max_ts = m["max_ts"]
            self.late_dropped = m["late_dropped"]

    def checkpoint(self) -> None:
        p = self._meta_path()
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump({
                "open": [[w, k, n, s] for (w, k), (n, s) in self.open.items()],
                "emitted": [list(r) for r in self.emitted],
                "late_side": [[w, k, n, s]
                              for (w, k), (n, s) in self.late_side.items()],
                "batches_done": self.batches_done,
                "max_ts": self.max_ts,
                "late_dropped": self.late_dropped,
            }, f)
        os.replace(tmp, p)

    def _finalize_ripe(self) -> None:
        wm = self.max_ts - self.lateness_us
        ripe = sorted(
            (wk for wk in self.open if wk[0] + self.window_us <= wm),
        )
        for wk in ripe:
            n, s = self.open.pop(wk)
            self.emitted.append((wk[0], wk[1], n, s))

    def run(self, ds: "ray.data.Dataset", *, key_col: str = "event_type",
            ts_col: str = "ts", value_col: str = "value",
            batch_size: int = 4096, fail_after: int | None = None):
        """Consume from the last checkpoint; ``fail_after`` injects a
        crash after that many NEW batches (tests)."""
        import polars as pl

        ctx = ray.data.DataContext.get_current()
        prev = ctx.execution_options.preserve_order
        ctx.execution_options.preserve_order = True
        try:
            processed = 0
            for i, batch in enumerate(
                ds.iter_batches(batch_format="pyarrow", batch_size=batch_size)
            ):
                if i < self.batches_done:
                    continue
                ts = np.asarray(batch.column(ts_col).combine_chunks()).view(np.int64)
                keys = batch.column(key_col).to_numpy(zero_copy_only=False)
                v = np.asarray(batch.column(value_col), dtype=np.float64)
                v_s = np.round(v * 1e6).astype(np.int64)
                wm = self.max_ts - self.lateness_us
                win = (ts // self.window_us) * self.window_us
                late = win + self.window_us <= wm
                self.late_dropped += int(late.sum())
                for sel, sink in ((~late, self.open), (late, self.late_side)):
                    if not sel.any():
                        continue
                    part = (
                        pl.DataFrame({"w": win[sel], "k": keys[sel],
                                      "n": np.ones(int(sel.sum()), dtype=np.int64),
                                      "s": v_s[sel]})
                        .group_by(["w", "k"])
                        .agg(pl.col("n").sum(), pl.col("s").sum())
                    )
                    for w, k, n, s in part.rows():
                        acc = sink.setdefault((int(w), k), [0, 0])
                        acc[0] += int(n)
                        acc[1] += int(s)
                if len(ts):
                    self.max_ts = max(self.max_ts, int(ts.max()))
                self._finalize_ripe()
                self.batches_done += 1
                processed += 1
                if self.batches_done % self.checkpoint_every == 0:
                    self.checkpoint()
                if fail_after is not None and processed >= fail_after:
                    raise RuntimeError(
                        f"injected stream failure after {processed} batches")
            self.checkpoint()
        finally:
            ctx.execution_options.preserve_order = prev
        return self

    def flush(self):
        """End-of-stream: finalize every still-open window (in order) and
        return the full emission log as arrays."""
        for wk in sorted(self.open):
            n, s = self.open.pop(wk)
            self.emitted.append((wk[0], wk[1], n, s))
        self.checkpoint()
        return self.emitted

    def late_output(self) -> list[tuple[int, str, int, int]]:
        """The late-event side output: (window, key, count, sum_micro)
        aggregates of every event that arrived behind the watermark,
        sorted by (window, key).  ``emitted + late_output`` folded
        together equals the offline batch aggregate exactly, regardless
        of stream disorder — the reconciliation identity the pytest
        asserts against a DuckDB oracle."""
        return [(w, k, n, s)
                for (w, k), (n, s) in sorted(self.late_side.items())]
