"""Transcript table sources.

``BASELINE.json`` ``input_hint`` fixes the input schema: a Parquet table of
multi-turn conversation / agent transcripts with columns ``(conv_id:string,
turn_idx:int32, role:string, text:string, tool:string, ts:timestamp)``.

Two sources:

* :func:`transcripts_from_events` — a deterministic derivation from the
  driver's ``events`` table, expressible identically in ANSI SQL (see
  :data:`TRANSCRIPTS_SQL`) so the correctness driver can oracle-check
  transcript pipelines. One conversation per ``user_id``; turn order is
  ``(ts, event_id)``; ``text`` is the event's ``props`` payload verbatim
  (per-turn text equality under stable ``(conv_id, turn_idx)`` ordering —
  the north-rule row invariant).
* :func:`synth_transcripts` — a seeded, Zipf-skewed synthetic generator
  (vectorized numpy; the analog of the reference's benchmark generators,
  ``/root/reference/src/bm.c:140-420`` and ``src/zipf.c``) used by the
  bench driver at arbitrary scale.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

ROLE_OF_EVENT = {
    "signup": "system",
    "view": "user",
    "click": "user",
    "purchase": "assistant",
    "error": "tool",
}

TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

# The same derivation in ANSI SQL (DuckDB-runnable) for oracle checks.
TRANSCRIPTS_SQL = """
SELECT
  'c' || CAST(user_id AS VARCHAR)                                        AS conv_id,
  CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
       AS INTEGER)                                                       AS turn_idx,
  CASE event_type
    WHEN 'signup' THEN 'system'
    WHEN 'view' THEN 'user'
    WHEN 'click' THEN 'user'
    WHEN 'purchase' THEN 'assistant'
    WHEN 'error' THEN 'tool'
    ELSE 'user' END                                                      AS role,
  props                                                                  AS text,
  event_type                                                             AS tool,
  ts                                                                     AS ts
FROM events
"""


def _role_of_types(et: "pa.Array") -> "pa.Array":
    """event_type → role via dictionary lookup; unmatched AND null both map
    to 'user' exactly like the SQL CASE's ELSE branch."""
    enc = et.combine_chunks().dictionary_encode()
    lut = pa.array(
        [ROLE_OF_EVENT.get(s.as_py(), "user") for s in enc.dictionary],
        type=pa.string(),
    )
    import pyarrow.compute as pc

    return pc.fill_null(lut.take(enc.indices), "user")


def _turns_kernel(t: pa.Table) -> pa.Table:
    """Per-partition turn-index kernel: one lexsort by (user, ts, event_id)
    and a segmented arange for turn_idx — replaces the per-conversation
    pandas call (one call per PARTITION, not per conversation)."""
    from ..stages.keyed import run_ids

    uid = np.asarray(t.column("user_id").combine_chunks()).astype(np.int64)
    ts = np.asarray(t.column("ts").combine_chunks()).astype("datetime64[us]").astype(np.int64)
    eid = np.asarray(t.column("event_id").combine_chunks()).astype(np.int64)
    order = np.lexsort((eid, ts, uid))
    u = uid[order]
    rid, starts, _ = run_ids(u)
    turn_idx = (np.arange(len(u), dtype=np.int64) - starts[rid]).astype(np.int32)
    t = t.take(pa.array(order))
    return pa.table(
        {
            "conv_id": pa.array(np.char.add("c", u.astype(str)), type=pa.string()),
            "turn_idx": pa.array(turn_idx, type=pa.int32()),
            "role": _role_of_types(t.column("event_type")),
            "text": t.column("text" if "text" in t.column_names else "props"),
            "tool": t.column("event_type"),
            "ts": t.column("ts"),
        }
    )


def transcripts_light(sf_dir: str, columns: list[str]) -> "ray.data.Dataset":
    """Shuffle-FREE transcript view: any subset of (conv_id, role, text,
    tool, ts) derived per batch with pyarrow kernels. ``turn_idx`` needs a
    per-conversation window (use :func:`transcripts_from_events`); every
    other column is a pure row-wise map, so pipelines that don't consume
    turn order (role stats, conv lengths, distinct texts, shingle sketches)
    must NOT pay the conv-keyed shuffle for it."""
    import pyarrow.compute as pc

    need = {"conv_id": ["user_id"], "role": ["event_type"], "text": ["props"],
            "tool": ["event_type"], "ts": ["ts"]}
    src = sorted({c for col in columns for c in need[col]})
    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=src)

    def derive(batch: pa.Table) -> pa.Table:
        out = {}
        for col in columns:
            if col == "conv_id":
                out[col] = pc.binary_join_element_wise(
                    "c", pc.cast(batch.column("user_id"), pa.string()), ""
                )
            elif col == "role":
                # dictionary path: map only the (few) unique event types;
                # null/unmatched → 'user' (= the SQL CASE ELSE branch)
                out[col] = _role_of_types(batch.column("event_type"))
            elif col == "text":
                out[col] = batch.column("props")
            elif col == "tool":
                out[col] = batch.column("event_type")
            elif col == "ts":
                out[col] = batch.column("ts")
        return pa.table(out)

    return ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)


def transcripts_from_events(sf_dir: str) -> "ray.data.Dataset":
    """events.parquet → transcript Dataset (schema per ``input_hint``).

    The turn-index assignment is a per-conversation window (row_number) —
    expressed as ONE coarse keyed-partition shuffle on the conversation key
    (``cqf_ray.stages.keyed``) followed by a vectorized lexsort+segmented-
    arange kernel per partition; never one call per conversation. Column
    pruning at the read keeps only the 5 columns the derivation needs.
    """
    from ..stages.keyed import keyed_partition_map

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type", "props"],
    )
    return keyed_partition_map(ds, ["user_id"], _turns_kernel)


_WORDS = np.array(
    "the a spark ray data batch stream merge sort hash join filter scan table row column "
    "key value query plan agg window part order line customer vector index cache shard "
    "block slot count sketch quotient remainder rank select run tool call reply done".split()
)


def synth_transcripts(
    out_dir: str,
    n_convs: int = 1000,
    mean_turns: int = 16,
    seed: int = 42,
    shards: int = 8,
) -> str:
    """Deterministic synthetic transcript Parquet (sharded directory).

    Conversation lengths are Zipf-skewed (bounded), roles cycle through a
    realistic agent-loop pattern, ``text`` is a seeded bag-of-words line,
    ``tool`` is set on tool-role turns. Sharded so readers parallelize and
    a resumable writer could skip finished shards. Returns ``out_dir``.
    """
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    # bounded Zipf conversation lengths: skewed like real agent traces
    raw = rng.zipf(1.3, size=n_convs)
    turns = np.minimum(raw * max(mean_turns // 4, 1), mean_turns * 8).astype(np.int64)
    turns = np.maximum(turns, 2)
    conv_of_turn = np.repeat(np.arange(n_convs), turns)
    total = int(turns.sum())
    within = np.ones(total, dtype=np.int64)
    heads = np.concatenate([[0], np.cumsum(turns)[:-1]])
    within[heads] = np.concatenate([[0], 1 - turns[:-1]])
    turn_idx = np.cumsum(within).astype(np.int32)

    roles_cycle = np.array(["system", "user", "assistant", "tool", "assistant", "user"])
    role = roles_cycle[turn_idx % len(roles_cycle)]
    tools = np.array(["", "search", "python", "browser", "sql"])
    tool = np.where(role == "tool", tools[1 + (conv_of_turn + turn_idx) % 4], "")

    n_words = rng.integers(3, 40, size=total)
    flat_words = _WORDS[rng.integers(0, len(_WORDS), size=int(n_words.sum()))]
    bounds = np.concatenate([[0], np.cumsum(n_words)])
    joined = np.empty(total, dtype=object)
    for i in range(total):  # driver-side generator only; not a hot pipeline path
        joined[i] = " ".join(flat_words[bounds[i] : bounds[i + 1]])
    ts = np.datetime64("2024-01-01", "us") + (
        conv_of_turn * 86_400_000_000 + turn_idx * 37_000_000
    ).astype("timedelta64[us]")

    table = pa.table(
        {
            "conv_id": pa.array(np.char.add("conv", conv_of_turn.astype(str)), type=pa.string()),
            "turn_idx": pa.array(turn_idx, type=pa.int32()),
            "role": pa.array(role, type=pa.string()),
            "text": pa.array(joined, type=pa.string()),
            "tool": pa.array(tool, type=pa.string()),
            "ts": pa.array(ts, type=pa.timestamp("us")),
        }
    )
    import pyarrow.parquet as pq

    shard_bounds = np.linspace(0, table.num_rows, shards + 1).astype(int)
    for s in range(shards):
        pq.write_table(
            table.slice(shard_bounds[s], shard_bounds[s + 1] - shard_bounds[s]),
            os.path.join(out_dir, f"part-{s:05d}.parquet"),
        )
    return out_dir
