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
