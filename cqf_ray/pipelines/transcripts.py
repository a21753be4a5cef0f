"""Transcript pipelines — the north-star surface (BASELINE.json): sketch
queries over the (conv_id, turn_idx, role, text, tool, ts) transcript table,
derived deterministically from `events` so the driver can oracle-check them
(sources/transcripts.py: the same derivation in Ray and in SQL).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .. import keys
from ..sketches import CQF, HyperLogLog
from ..stages.agg import build_sketch, grouped_sketches
from ..stages.probe import probe_dataset
from ..sources.transcripts import TRANSCRIPTS_SQL, transcripts_from_events, transcripts_light
from .common import read

_CTE = f"WITH transcripts AS ({TRANSCRIPTS_SQL})"


def transcript_turns(sf_dir: str) -> pa.Table:
    """The per-row invariant itself: the full derived transcript table under
    stable (conv_id, turn_idx) ordering — per-turn text equality vs the SQL
    derivation (north_rule / input_hint row invariant)."""
    t = transcripts_from_events(sf_dir).to_pandas()
    t = t[["conv_id", "turn_idx", "role", "text", "tool"]]
    t = t.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    return pa.Table.from_pandas(t, preserve_index=False)


def transcript_role_stats(sf_dir: str) -> pa.Table:
    """Turns and distinct conversations per role in ONE derivation pass:
    combiner-aggregate to (role, conv_id, n_turns) — exact, since a
    (role, conv_id) group fully merges in the shuffle — then a tiny second
    aggregate to (role, n_turns, n_convs). Distinct counts fall out as row
    counts of the first aggregate: no non-mergeable distinct partials."""
    from ..stages.groupagg import grouped_aggregate

    ds = transcripts_light(sf_dir, ["role", "conv_id"])
    per_pair = grouped_aggregate(ds, ["role", "conv_id"], [("n_turns", "count", None)])
    out = grouped_aggregate(
        per_pair, ["role"],
        [("n_turns", "sum", "n_turns"), ("n_convs", "count", None)],
    )
    df = out.to_pandas().sort_values("role").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def transcript_conv_lengths(sf_dir: str) -> pa.Table:
    """Turns per conversation (the conv_id-keyed aggregate every transcript
    pipeline shares; one shuffle key reused — SURVEY.md §7.3)."""
    from ..stages.groupagg import grouped_aggregate

    ds = transcripts_light(sf_dir, ["conv_id"])
    out = grouped_aggregate(ds, ["conv_id"], [("n_turns", "count", None)])
    df = out.to_pandas().sort_values("conv_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def transcript_shingle_cqf(sf_dir: str, q: int = 16, key_bits: int = 40) -> dict:
    """FLAGSHIP: distributed CQF over (role, tool, text-shingle) keys of the
    transcript stream (the north_star's core key), default murmur
    fingerprint mode (FP rate ≤ 2^-r). Returns the build summary + the
    global sketch. Not SQL-expressible (lossy fingerprint space) — the
    pytest suite checks exactness-on-inserted-keys and the FP bound."""
    ds = transcripts_light(sf_dir, ["role", "text", "tool"])
    extract = keys.shingle_keys("text", n=5, seed=11, context_cols=["role", "tool"])
    cqf = build_sketch(
        ds, extract,
        lambda: CQF(q=q, key_bits=key_bits, hash_mode="default", seed=11),
        counted=True,
    )
    return {
        "cqf": cqf,
        "n_distinct": cqf.num_distinct,
        "total_shingles": cqf.sum_counts,
    }


def transcript_shingle_summary(sf_dir: str) -> pa.Table:
    """Driver-facing wrapper of the flagship build. ORACLE-CHECKED: the
    CQF's distinct/total equal COUNT(DISTINCT (role,tool,5-gram)) /
    COUNT(*) over the SQL-built shingle set (collision probability
    ~|keys|²/2^40·2^-1 — zero observed; the multiset itself is additionally
    validated against an exact dict oracle in pytest)."""
    r = transcript_shingle_cqf(sf_dir)
    return pa.table(
        {
            "n_distinct": pa.array([r["n_distinct"]], type=pa.int64()),
            "total_shingles": pa.array([r["total_shingles"]], type=pa.int64()),
        }
    )


def transcript_distinct_text_per_role(sf_dir: str) -> pa.Table:
    """Exact distinct texts per role (the HLL companion's exact oracle)."""
    ds = transcripts_light(sf_dir, ["role", "text"])

    from ..stages.groupagg import grouped_aggregate

    per_text = grouped_aggregate(ds, ["role", "text"], [("n", "count", None)])
    out = grouped_aggregate(per_text, ["role"], [("n_distinct_texts", "count", None)])
    df = out.to_pandas().sort_values("role").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def transcript_hll_text_per_role(sf_dir: str) -> pa.Table:
    """HLL distinct-text estimate per role — the grouped-sketch two-level
    aggregation (partial per batch per group, tiny blob shuffle) — made
    driver-checkable: each role row carries the EXACT distinct count
    (distributed two-level grouped count) plus a 3σ-bound verdict on the
    hash-dependent HLL estimate; the oracle reproduces (role, n_exact)
    and asserts the bound held."""
    ds = transcripts_light(sf_dir, ["role", "text"])

    def by_group(batch: pa.Table) -> dict:
        from ..hashing import hash_strings

        roles = batch.column("role").to_numpy(zero_copy_only=False)
        h = hash_strings(batch.column("text"), seed=13)
        return {g: h[roles == g] for g in np.unique(roles)}

    sketches = grouped_sketches(ds, "role", by_group, lambda: HyperLogLog(p=13))

    from ..stages.groupagg import grouped_aggregate

    per_text = grouped_aggregate(transcripts_light(sf_dir, ["role", "text"]),
                                 ["role", "text"], [("n", "count", None)])
    exact = (
        grouped_aggregate(per_text, ["role"], [("n_exact", "count", None)])
        .to_pandas()
        .set_index("role")["n_exact"]
    )
    sigma = 1.04 / np.sqrt(2**13)
    rows = []
    for role in sorted(sketches):
        n_exact = int(exact[role])
        est = sketches[role].estimate()
        rows.append((role, n_exact, bool(abs(est - n_exact) <= 3 * sigma * n_exact)))
    return pa.table(
        {"role": pa.array([r[0] for r in rows]),
         "n_exact": pa.array([r[1] for r in rows], type=pa.int64()),
         "est_in_3sigma": pa.array([r[2] for r in rows])}
    )


def transcript_shingle_per_role(sf_dir: str) -> pa.Table:
    """Per-role shingle CQFs via the grouped-sketch two-level pattern with
    the CQF itself as the grouped accumulator (not just HLL): per-batch
    per-role partial filters, tiny blob shuffle, per-role merge. Output is
    each role's distinct/total shingle counts (oracle-checked via the SQL
    substring-set equivalent)."""
    from ..text import char_ngram_hashes

    ds = transcripts_light(sf_dir, ["role", "text"])

    def by_group(batch: pa.Table) -> dict:
        hashes, offs = char_ngram_hashes(batch.column("text"), n=5, seed=11)
        roles = batch.column("role").to_numpy(zero_copy_only=False)
        per_doc = np.diff(offs)
        rep = np.repeat(roles, per_doc)
        return {g: hashes[rep == g] for g in np.unique(roles)}

    sketches = grouped_sketches(
        ds, "role", by_group,
        lambda: CQF(q=14, key_bits=40, hash_mode="default", seed=11),
    )
    rows = sorted(
        (g, s.num_distinct, s.sum_counts) for g, s in sketches.items()
    )
    return pa.table(
        {
            "role": pa.array([r[0] for r in rows]),
            "n_distinct": pa.array([r[1] for r in rows], type=pa.int64()),
            "total_shingles": pa.array([r[2] for r in rows], type=pa.int64()),
        }
    )


def transcript_tool_stats(sf_dir: str) -> pa.Table:
    """Turns and distinct conversations per tool (same two-level exact
    pattern as role stats; `tool` is the event_type passthrough)."""
    from ..stages.groupagg import grouped_aggregate

    ds = transcripts_light(sf_dir, ["tool", "conv_id"])
    per_pair = grouped_aggregate(ds, ["tool", "conv_id"], [("n_turns", "count", None)])
    out = grouped_aggregate(
        per_pair, ["tool"], [("n_turns", "sum", "n_turns"), ("n_convs", "count", None)]
    )
    df = out.to_pandas().sort_values("tool").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def transcript_conv_durations(sf_dir: str) -> pa.Table:
    """Wall-clock span per conversation in whole seconds (grouped min/max
    over event time — no per-group Python, just the combiner aggregate)."""
    from ..stages.groupagg import grouped_aggregate

    ds = transcripts_light(sf_dir, ["conv_id", "ts"])
    out = grouped_aggregate(ds, ["conv_id"], [("t0", "min", "ts"), ("t1", "max", "ts")])
    df = out.to_pandas()
    # match SQL date_diff('second', …): count second-boundary crossings,
    # i.e. floor(t1/1s) − floor(t0/1s), NOT floor((t1−t0)/1s)
    t0 = df["t0"].to_numpy().astype("datetime64[us]").astype(np.int64) // 1_000_000
    t1 = df["t1"].to_numpy().astype("datetime64[us]").astype(np.int64) // 1_000_000
    df["duration_s"] = t1 - t0
    df = df[["conv_id", "duration_s"]].sort_values("conv_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def turns_per_hour_of_day(sf_dir: str) -> pa.Table:
    """Hour-of-day histogram of turns (vectorized temporal extraction +
    combiner aggregate)."""
    import pyarrow.compute as pc

    from ..stages.groupagg import grouped_aggregate

    ds = transcripts_light(sf_dir, ["ts"])

    def hod(batch: pa.Table) -> pa.Table:
        return pa.table({"hour": pc.cast(pc.hour(batch.column("ts")), pa.int64())})

    out = grouped_aggregate(
        ds.map_batches(hod, batch_format="pyarrow"), ["hour"], [("n_turns", "count", None)]
    )
    df = out.to_pandas().sort_values("hour").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def users_with_view_then_purchase(sf_dir: str) -> pa.Table:
    """Ordered-funnel count: users with a purchase strictly after some view
    — per-user grouped min(view ts) / max(purchase ts) compared, all via
    combiner aggregates (no per-group Python, no window)."""
    from ..stages.groupagg import grouped_aggregate
    from .common import read

    ds = read(sf_dir, "events", ["user_id", "event_type", "ts"])

    def tag(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc_

        et = batch.column("event_type")
        ts = batch.column("ts")
        far_future = pa.scalar(np.datetime64("2200-01-01", "us"), type=pa.timestamp("us"))
        far_past = pa.scalar(np.datetime64("1900-01-01", "us"), type=pa.timestamp("us"))
        view_ts = pc_.if_else(pc_.equal(et, "view"), ts, far_future)
        buy_ts = pc_.if_else(pc_.equal(et, "purchase"), ts, far_past)
        return pa.table({"user_id": batch.column("user_id"),
                         "view_ts": view_ts, "buy_ts": buy_ts})

    out = grouped_aggregate(
        ds.map_batches(tag, batch_format="pyarrow"),
        ["user_id"],
        [("first_view", "min", "view_ts"), ("last_buy", "max", "buy_ts")],
    )
    df = out.to_pandas()
    n = int((df["last_buy"] > df["first_view"]).sum())
    return pa.table({"n_users": pa.array([n], type=pa.int64())})


def conv_reconstruct(sf_dir: str) -> pa.Table:
    """Sequence reconstruction: rebuild each conversation's full ordered
    dialog ('role: text' lines joined by newline in (ts, event_id) turn
    order) and emit its length + MD5 — the document-assembly step a
    training pipeline runs before packing/tokenizing.  ONE keyed shuffle
    on the conversation key; the kernel lexsorts its partition once and
    concatenates per-conversation in a vectorized polars aggregation (the
    only per-group Python work is one MD5 per conversation, O(groups) not
    O(rows))."""
    import hashlib
    import os as _os

    import pyarrow.compute as pc
    import ray

    from ..sources.transcripts import _role_of_types
    from ..stages.keyed import keyed_partition_map

    ds = ray.data.read_parquet(
        _os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type", "props"],
    )

    def kernel(t: pa.Table) -> pa.Table:
        import polars as pl

        uid = np.asarray(t.column("user_id").combine_chunks()).astype(np.int64)
        tsv = np.asarray(t.column("ts").combine_chunks()).view(np.int64)
        eid = np.asarray(t.column("event_id").combine_chunks()).astype(np.int64)
        order = np.lexsort((eid, tsv, uid))
        idx = pa.array(order)
        role = _role_of_types(t.column("event_type")).take(idx)
        text = t.column("props").combine_chunks().take(idx)
        line = pc.binary_join_element_wise(role, text, ": ")
        df = pl.from_arrow(pa.table({"conv": pa.array(uid[order]), "line": line}))
        agg = df.group_by("conv").agg(
            n_turns=pl.len().cast(pl.Int64),
            dialog=pl.col("line").str.join("\n"),
        )
        md5s = [hashlib.md5(s.encode("utf-8")).hexdigest() for s in agg["dialog"]]
        return pa.table({
            "conv_id": pc.binary_join_element_wise(
                "c", pc.cast(agg["conv"].to_arrow(), pa.string()), ""
            ),
            "n_turns": agg["n_turns"].to_arrow(),
            "dialog_len": agg["dialog"].str.len_chars().cast(pl.Int64).to_arrow(),
            "dialog_md5": pa.array(md5s),
        })

    df = keyed_partition_map(ds, ["user_id"], kernel).to_pandas()
    df = df.sort_values("conv_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def conv_template_dedup(sf_dir: str, *, prefix_turns: int = 4) -> pa.Table:
    """Conversation OPENING-template dedup on the north-star payload: two
    conversations are structural duplicates when their first
    ``prefix_turns`` ordered (role | tool) turns are identical (the
    boilerplate-opening near-dup a transcript-mining pipeline removes
    before SFT sampling — same flow, different surface text).  ONE
    conv-keyed exchange builds per-conversation prefix fingerprints
    (vectorized join + one MD5 per CONVERSATION, O(convs) not O(turns));
    one fingerprint-keyed exchange elects each group's canonical
    conversation (min conv_id) and sizes the group.  Output: duplicate
    groups only."""
    import hashlib
    import os as _os

    import pyarrow.compute as pc
    import ray

    from ..sources.transcripts import _role_of_types
    from ..stages.keyed import keyed_partition_map

    ds = ray.data.read_parquet(
        _os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type"],
    )

    def fingerprint(t: pa.Table) -> pa.Table:
        import polars as pl

        from ..stages.keyed import run_ids

        uid = np.asarray(t.column("user_id").combine_chunks()).astype(np.int64)
        tsv = np.asarray(t.column("ts").combine_chunks()).view(np.int64)
        eid = np.asarray(t.column("event_id").combine_chunks()).astype(np.int64)
        order = np.lexsort((eid, tsv, uid))
        u = uid[order]
        rid, starts, _ = run_ids(u)
        turn_idx = np.arange(len(u), dtype=np.int64) - starts[rid]
        keep = turn_idx < prefix_turns
        order = order[keep]
        idx = pa.array(order)
        role = _role_of_types(t.column("event_type")).take(idx)
        tool = t.column("event_type").combine_chunks().take(idx)
        line = pc.binary_join_element_wise(role, tool, "|")
        df = pl.from_arrow(pa.table({"conv": pa.array(uid[order]), "line": line}))
        agg = df.group_by("conv").agg(tmpl=pl.col("line").str.join(";"))
        md5s = [hashlib.md5(s.encode()).hexdigest() for s in agg["tmpl"]]
        return pa.table({
            "conv_id": pc.binary_join_element_wise(
                "c", pc.cast(agg["conv"].to_arrow(), pa.string()), ""),
            "template_md5": pa.array(md5s, type=pa.string()),
        })

    fps = keyed_partition_map(ds, ["user_id"], fingerprint)

    def groups(t: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(t)
        return (df.group_by("template_md5")
                .agg(n_convs=pl.len().cast(pl.Int64),
                     canonical_conv=pl.col("conv_id").min())
                .filter(pl.col("n_convs") >= 2)).to_arrow()

    out = keyed_partition_map(fps, ["template_md5"], groups).to_pandas()
    if out.empty:
        return pa.table({"template_md5": pa.array([], type=pa.string()),
                         "n_convs": pa.array([], type=pa.int64()),
                         "canonical_conv": pa.array([], type=pa.string())})
    out = out.sort_values("template_md5").reset_index(drop=True)
    return pa.Table.from_pandas(
        out[["template_md5", "n_convs", "canonical_conv"]],
        preserve_index=False)


def _ordered_conv_arrays(t: pa.Table):
    """Shared per-partition prologue: lexsort events by (conv, ts, event_id)
    and return (conv int key, turn_idx, role, text) aligned arrays."""
    from ..sources.transcripts import _role_of_types
    from ..stages.keyed import run_ids

    uid = np.asarray(t.column("user_id").combine_chunks()).astype(np.int64)
    ts = np.asarray(t.column("ts").combine_chunks()).astype("datetime64[us]").astype(np.int64)
    eid = np.asarray(t.column("event_id").combine_chunks()).astype(np.int64)
    order = np.lexsort((eid, ts, uid))
    u = uid[order]
    rid, starts, _ = run_ids(u)
    turn_idx = (np.arange(len(u), dtype=np.int64) - starts[rid]).astype(np.int32)
    t = t.take(pa.array(order))
    roles = np.asarray(_role_of_types(t.column("event_type")), dtype=object)
    texts = np.asarray(t.column("props").combine_chunks(), dtype=object)
    return u, rid, starts, turn_idx, roles, texts


def sft_pair_extraction(sf_dir: str) -> pa.Table:
    """(user → assistant) adjacent-turn training-pair extraction — THE
    SFT-corpus construction step: every 'user' turn whose immediate next
    turn in the same conversation is an 'assistant' turn becomes one
    (prompt, response) example. Plan: turn ordering, role derivation and
    adjacency all happen inside ONE keyed partition shuffle on the
    conversation key (conversations are partition-closed, so the shifted-
    array adjacency compare is exact); output is pair-scale only."""
    import os

    import ray

    from ..stages.keyed import keyed_partition_map

    def kernel(t: pa.Table) -> pa.Table:
        u, _, _, turn_idx, roles, texts = _ordered_conv_arrays(t)
        n = len(u)
        m = np.zeros(n, dtype=bool)
        if n > 1:
            m[:-1] = (u[1:] == u[:-1]) & (roles[:-1] == "user") \
                & (roles[1:] == "assistant")
        i = np.flatnonzero(m)
        return pa.table({
            "conv_id": pa.array(np.char.add("c", u[i].astype(str)),
                                type=pa.string()),
            "user_turn_idx": pa.array(turn_idx[i], type=pa.int32()),
            "prompt": pa.array(texts[i], type=pa.string()),
            "response": pa.array(texts[i + 1], type=pa.string()),
        })

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type", "props"],
    )
    out = keyed_partition_map(ds, ["user_id"], kernel).to_pandas()
    out = out.sort_values(["conv_id", "user_turn_idx"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def turn_alternation_stats(sf_dir: str) -> pa.Table:
    """Dialogue-quality audit: per conversation, how many adjacent turns
    REPEAT the same role (a clean chat corpus alternates) — the filter
    stat an SFT pipeline thresholds before pair extraction. Same single
    keyed shuffle as ``sft_pair_extraction``; the per-conversation counts
    are one bincount over the partition, output conv-scale."""
    import os

    import ray

    from ..stages.keyed import keyed_partition_map

    def kernel(t: pa.Table) -> pa.Table:
        u, rid, starts, _, roles, _ = _ordered_conv_arrays(t)
        n = len(u)
        nruns = len(starts)
        rep = np.zeros(n, dtype=bool)
        if n > 1:
            rep[1:] = (u[1:] == u[:-1]) & (roles[1:] == roles[:-1])
        n_rep = np.bincount(rid[rep], minlength=nruns).astype(np.int64)
        n_turns = np.diff(np.append(starts, n)).astype(np.int64)
        conv = u[starts]
        return pa.table({
            "conv_id": pa.array(np.char.add("c", conv.astype(str)),
                                type=pa.string()),
            "n_turns": pa.array(n_turns),
            "n_repeat_role": pa.array(n_rep),
        })

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type", "props"],
    )
    out = keyed_partition_map(ds, ["user_id"], kernel).to_pandas()
    out = out.sort_values("conv_id").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def sft_corpus_build(sf_dir: str) -> pa.Table:
    """End-to-end SFT corpus composition — the LLM-axis flagship shape:
    (1) alternation-quality gate (drop conversations where ≥half the
    adjacent turns repeat a role), (2) (user → assistant) pair extraction,
    (3) exact pair dedup with occurrence counts. Steps 1+2 are both
    conversation-local, so they fuse into ONE kernel under the single
    conversation-keyed shuffle; step 3 is one combiner-first group-by on
    the pair text — two exchanges total, each carrying only what the next
    step needs (pairs, then distinct pairs)."""
    import os

    import ray

    from ..stages.groupagg import grouped_aggregate
    from ..stages.keyed import keyed_partition_map

    def kernel(t: pa.Table) -> pa.Table:
        u, rid, starts, turn_idx, roles, texts = _ordered_conv_arrays(t)
        n = len(u)
        nruns = len(starts)
        rep = np.zeros(n, dtype=bool)
        if n > 1:
            rep[1:] = (u[1:] == u[:-1]) & (roles[1:] == roles[:-1])
        n_rep = np.bincount(rid[rep], minlength=nruns).astype(np.int64)
        n_turns = np.diff(np.append(starts, n)).astype(np.int64)
        conv_ok = 2 * n_rep < n_turns
        m = np.zeros(n, dtype=bool)
        if n > 1:
            m[:-1] = (u[1:] == u[:-1]) & (roles[:-1] == "user") \
                & (roles[1:] == "assistant")
        m &= conv_ok[rid]
        i = np.flatnonzero(m)
        return pa.table({
            "prompt": pa.array(texts[i], type=pa.string()),
            "response": pa.array(texts[i + 1], type=pa.string()),
        })

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type", "props"],
    )
    pairs = keyed_partition_map(ds, ["user_id"], kernel)
    out = grouped_aggregate(pairs, ["prompt", "response"],
                            [("n_occurrences", "count", None)])
    df = out.to_pandas().sort_values(["prompt", "response"]).reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


SQL = {
    "sft_corpus_build": (
        f"{_CTE}, l AS (SELECT conv_id, role, text, "
        "LAG(role) OVER w AS prev_role, "
        "LEAD(role) OVER w AS next_role, LEAD(text) OVER w AS next_text "
        "FROM transcripts WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)), "
        "ok AS (SELECT conv_id FROM l GROUP BY 1 "
        "HAVING 2 * SUM(CASE WHEN role = prev_role THEN 1 ELSE 0 END) < COUNT(*)) "
        "SELECT text AS prompt, next_text AS response, COUNT(*) AS n_occurrences "
        "FROM l JOIN ok USING (conv_id) "
        "WHERE role = 'user' AND next_role = 'assistant' "
        "GROUP BY 1, 2 ORDER BY 1, 2"
    ),
    "sft_pair_extraction": (
        f"{_CTE}, l AS (SELECT conv_id, turn_idx, role, text, "
        "LEAD(role) OVER w AS next_role, LEAD(text) OVER w AS next_text "
        "FROM transcripts WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)) "
        "SELECT conv_id, turn_idx AS user_turn_idx, text AS prompt, "
        "next_text AS response FROM l "
        "WHERE role = 'user' AND next_role = 'assistant' "
        "ORDER BY conv_id, user_turn_idx"
    ),
    "turn_alternation_stats": (
        f"{_CTE}, l AS (SELECT conv_id, role, "
        "LAG(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_role "
        "FROM transcripts) "
        "SELECT conv_id, COUNT(*) AS n_turns, "
        "CAST(SUM(CASE WHEN role = prev_role THEN 1 ELSE 0 END) AS BIGINT) AS n_repeat_role "
        "FROM l GROUP BY 1 ORDER BY 1"
    ),
    "conv_template_dedup": (
        f"{_CTE}, t AS (SELECT conv_id, "
        "MD5(STRING_AGG(role || '|' || tool, ';' ORDER BY turn_idx)) "
        "AS template_md5 FROM transcripts WHERE turn_idx < 4 GROUP BY conv_id) "
        "SELECT template_md5, COUNT(*) AS n_convs, "
        "MIN(conv_id) AS canonical_conv "
        "FROM t GROUP BY 1 HAVING COUNT(*) >= 2 ORDER BY template_md5"
    ),
    "conv_reconstruct": (
        f"{_CTE} SELECT conv_id, COUNT(*) AS n_turns, "
        "LENGTH(STRING_AGG(role || ': ' || text, CHR(10) ORDER BY turn_idx)) AS dialog_len, "
        "MD5(STRING_AGG(role || ': ' || text, CHR(10) ORDER BY turn_idx)) AS dialog_md5 "
        "FROM transcripts GROUP BY conv_id ORDER BY conv_id"
    ),
    "transcript_shingle_summary": (
        f"{_CTE}, sh AS ("
        "  SELECT role, tool, CASE WHEN length(text) >= 5 "
        "THEN substring(text, CAST(r AS BIGINT) + 1, 5) ELSE text END AS g "
        "  FROM transcripts, LATERAL UNNEST(range(CASE WHEN length(text) >= 5 "
        "THEN length(text) - 4 ELSE 1 END)) AS t(r)) "
        "SELECT COUNT(DISTINCT (role, tool, g)) AS n_distinct, "
        "COUNT(*) AS total_shingles FROM sh"
    ),
    "transcript_shingle_per_role": (
        f"{_CTE}, sh AS ("
        "  SELECT role, CASE WHEN length(text) >= 5 "
        "THEN substring(text, CAST(r AS BIGINT) + 1, 5) ELSE text END AS g "
        "  FROM transcripts, LATERAL UNNEST(range(CASE WHEN length(text) >= 5 "
        "THEN length(text) - 4 ELSE 1 END)) AS t(r)) "
        "SELECT role, COUNT(DISTINCT g) AS n_distinct, COUNT(*) AS total_shingles "
        "FROM sh GROUP BY role ORDER BY role"
    ),
    "transcript_tool_stats": (
        f"{_CTE} SELECT tool, COUNT(*) AS n_turns, COUNT(DISTINCT conv_id) AS n_convs "
        "FROM transcripts GROUP BY tool ORDER BY tool"
    ),
    "transcript_conv_durations": (
        f"{_CTE} SELECT conv_id, "
        "CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT) AS duration_s "
        "FROM transcripts GROUP BY conv_id ORDER BY conv_id"
    ),
    "turns_per_hour_of_day": (
        f"{_CTE} SELECT CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour, "
        "COUNT(*) AS n_turns FROM transcripts GROUP BY 1 ORDER BY hour"
    ),
    "users_with_view_then_purchase": (
        "SELECT COUNT(*) AS n_users FROM ("
        "  SELECT user_id FROM events GROUP BY user_id "
        "  HAVING MAX(CASE WHEN event_type = 'purchase' THEN ts END) > "
        "         MIN(CASE WHEN event_type = 'view' THEN ts END))"
    ),
    "transcript_turns": (
        f"{_CTE} SELECT conv_id, turn_idx, role, text, tool FROM transcripts "
        "ORDER BY conv_id, turn_idx"
    ),
    "transcript_role_stats": (
        f"{_CTE} SELECT role, COUNT(*) AS n_turns, COUNT(DISTINCT conv_id) AS n_convs "
        "FROM transcripts GROUP BY role ORDER BY role"
    ),
    "transcript_conv_lengths": (
        f"{_CTE} SELECT conv_id, COUNT(*) AS n_turns FROM transcripts "
        "GROUP BY conv_id ORDER BY conv_id"
    ),
    "transcript_distinct_text_per_role": (
        f"{_CTE} SELECT role, COUNT(DISTINCT text) AS n_distinct_texts "
        "FROM transcripts GROUP BY role ORDER BY role"
    ),
    "transcript_hll_text_per_role": (
        f"{_CTE} SELECT role, COUNT(DISTINCT text) AS n_exact, "
        "TRUE AS est_in_3sigma FROM transcripts GROUP BY role ORDER BY role"
    ),
}


def conv_response_latency(sf_dir: str) -> pa.Table:
    """Assistant RESPONSE LATENCY per conversation: over every user turn
    immediately followed by an assistant turn, the count, mean and median
    of (assistant ts − user ts) in whole seconds — the serving-quality
    stat a transcript pipeline reports per conversation.  One keyed
    shuffle on conv_id; the kernel is a single lexsort + shifted role
    compare (no per-conversation Python); latencies stay integer µs, the
    mean is ONE mirrored float division of exact ints and the median is
    the (a+b)/2 central-pair convention, so doubles match the oracle
    bit-for-bit."""
    from ..sources.transcripts import _role_of_types
    from ..stages.keyed import keyed_partition_map

    ds = read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def kernel(t: pa.Table) -> pa.Table:
        uid = np.asarray(t.column("user_id").combine_chunks()).astype(np.int64)
        eid = np.asarray(t.column("event_id").combine_chunks()).astype(np.int64)
        role = _role_of_types(t.column("event_type")).to_numpy(zero_copy_only=False)
        tsu = (np.asarray(t.column("ts").combine_chunks())
               .astype("datetime64[us]").astype(np.int64))
        if len(uid) == 0:
            return pa.table({"conv_id": pa.array([], type=pa.string()),
                             "n_responses": pa.array([], type=pa.int64()),
                             "mean_latency_sec": pa.array([], type=pa.float64()),
                             "median_latency_sec": pa.array([], type=pa.float64())})
        uids, inv = np.unique(uid, return_inverse=True)
        order = np.lexsort((eid, tsu, inv))  # = turn_idx order per conv
        inv_s, role_s, ts_s = inv[order], role[order], tsu[order]
        pair = (inv_s[1:] == inv_s[:-1]) & (role_s[:-1] == "user") \
            & (role_s[1:] == "assistant")
        lat = (ts_s[1:] - ts_s[:-1])[pair] // 1_000_000
        cid = inv_s[:-1][pair]
        o2 = np.lexsort((lat, cid))
        cid_s, lat_s = cid[o2], lat[o2]
        starts = np.flatnonzero(np.r_[True, cid_s[1:] != cid_s[:-1]])
        counts = np.diff(np.append(starts, len(cid_s)))
        sums = np.add.reduceat(lat_s, starts)
        lo = starts + (counts - 1) // 2
        hi = starts + counts // 2
        med = (lat_s[lo].astype(np.float64) + lat_s[hi]) / 2.0
        mean = sums.astype(np.float64) / counts
        names = np.array([f"c{u}" for u in uids[cid_s[starts]]], dtype=object)
        return pa.table({"conv_id": pa.array(names, type=pa.string()),
                         "n_responses": pa.array(counts.astype(np.int64)),
                         "mean_latency_sec": pa.array(mean),
                         "median_latency_sec": pa.array(med)})

    out = keyed_partition_map(ds, ["user_id"], kernel).to_pandas()
    out = out.sort_values("conv_id").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def tool_call_chains(sf_dir: str) -> pa.Table:
    """Gaps-and-islands over transcript roles: per conversation, how many
    CONSECUTIVE-tool-turn runs occur and the longest such chain — the
    agentic-loop depth profile (long tool chains = multi-step tool use).
    One keyed shuffle on conv_id; islands fall out of one vectorized
    run-boundary scan per partition (the SQL oracle uses the classic
    turn_idx − ROW_NUMBER() island key).  Conversations with no tool
    turns are excluded (the oracle's WHERE does the same)."""
    from ..sources.transcripts import _role_of_types
    from ..stages.keyed import keyed_partition_map

    ds = read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def kernel(t: pa.Table) -> pa.Table:
        uid = np.asarray(t.column("user_id").combine_chunks()).astype(np.int64)
        eid = np.asarray(t.column("event_id").combine_chunks()).astype(np.int64)
        role = _role_of_types(t.column("event_type")).to_numpy(zero_copy_only=False)
        tsu = (np.asarray(t.column("ts").combine_chunks())
               .astype("datetime64[us]").astype(np.int64))
        if len(uid) == 0:
            return pa.table({"conv_id": pa.array([], type=pa.string()),
                             "n_chains": pa.array([], type=pa.int64()),
                             "longest_chain": pa.array([], type=pa.int64())})
        uids, inv = np.unique(uid, return_inverse=True)
        order = np.lexsort((eid, tsu, inv))  # = turn_idx order per conv
        inv_s = inv[order]
        is_tool = role[order] == "tool"
        # a tool run starts at a tool turn whose predecessor (same conv,
        # previous turn) is not a tool turn — rows are consecutive turns
        prev_tool = np.r_[False, is_tool[:-1] & (inv_s[1:] == inv_s[:-1])]
        run_start = is_tool & ~prev_tool
        run_id = np.cumsum(run_start) - 1
        tool_conv = inv_s[is_tool]
        tool_run = run_id[is_tool]
        o2 = np.lexsort((tool_run, tool_conv))
        tc, tr = tool_conv[o2], tool_run[o2]
        new_run = np.r_[True, (tc[1:] != tc[:-1]) | (tr[1:] != tr[:-1])]
        rstart = np.flatnonzero(new_run)
        rlen = np.diff(np.append(rstart, len(tc)))
        rconv = tc[rstart]
        cstart = np.flatnonzero(np.r_[True, rconv[1:] != rconv[:-1]])
        n_chains = np.diff(np.append(cstart, len(rconv)))
        longest = np.maximum.reduceat(rlen, cstart)
        names = np.array([f"c{u}" for u in uids[rconv[cstart]]], dtype=object)
        return pa.table({"conv_id": pa.array(names, type=pa.string()),
                         "n_chains": pa.array(n_chains.astype(np.int64)),
                         "longest_chain": pa.array(longest.astype(np.int64))})

    out = keyed_partition_map(ds, ["user_id"], kernel).to_pandas()
    out = out.sort_values("conv_id").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


SQL["conv_response_latency"] = (
    f"{_CTE}, nxt AS (SELECT conv_id, role, ts, "
    "LEAD(role) OVER w AS nrole, LEAD(ts) OVER w AS nts "
    "FROM transcripts WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)), "
    "lat AS (SELECT conv_id, "
    "(epoch_us(nts) - epoch_us(ts)) // 1000000 AS lsec "
    "FROM nxt WHERE role = 'user' AND nrole = 'assistant') "
    "SELECT conv_id, COUNT(*) AS n_responses, "
    "CAST(SUM(lsec) AS DOUBLE) / COUNT(*) AS mean_latency_sec, "
    "MEDIAN(lsec) AS median_latency_sec "
    "FROM lat GROUP BY conv_id ORDER BY conv_id"
)

SQL["tool_call_chains"] = (
    f"{_CTE}, tool_turns AS (SELECT conv_id, turn_idx, "
    "turn_idx - ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS grp "
    "FROM transcripts WHERE role = 'tool'), "
    "runs AS (SELECT conv_id, grp, COUNT(*) AS chain_len "
    "FROM tool_turns GROUP BY 1, 2) "
    "SELECT conv_id, COUNT(*) AS n_chains, "
    "CAST(MAX(chain_len) AS BIGINT) AS longest_chain "
    "FROM runs GROUP BY conv_id ORDER BY conv_id"
)


def turn_repetition_stats(sf_dir: str) -> pa.Table:
    """Assistant SELF-REPETITION audit: per conversation, the exact token-
    set Jaccard between each pair of CONSECUTIVE assistant turns (integer
    bps), aggregated to (n_pairs, mean, max) — the transcript-quality
    check for models that repeat themselves turn over turn (high adjacent
    Jaccard = near-identical responses).  ONE keyed shuffle on conv_id;
    the kernel is fully vectorized: one lexsort recovers turn order, one
    ``token_hashes`` pass + per-row dedup builds the distinct token sets,
    and the gather+lexsort dup-count kernel (the ``_verify_pairs_jaccard``
    intersection trick) scores every adjacent pair in a single pass — no
    per-conversation Python.  All outputs are integers (bps = 10000·|∩|
    // |∪|, mean = Σbps // n), so the oracle comparison is float-free;
    pairs with an empty union are skipped in both (the SQL WHERE)."""
    from ..sources.transcripts import _role_of_types
    from ..stages.keyed import _segmented_arange, keyed_partition_map
    from ..text import token_hashes

    ds = read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type",
                                 "props"])

    def kernel(t: pa.Table) -> pa.Table:
        empty = pa.table({"conv_id": pa.array([], type=pa.string()),
                          "n_pairs": pa.array([], type=pa.int64()),
                          "mean_jaccard_bps": pa.array([], type=pa.int64()),
                          "max_jaccard_bps": pa.array([], type=pa.int64())})
        uid = np.asarray(t.column("user_id").combine_chunks()).astype(np.int64)
        if len(uid) == 0:
            return empty
        eid = np.asarray(t.column("event_id").combine_chunks()).astype(np.int64)
        tsu = (np.asarray(t.column("ts").combine_chunks())
               .astype("datetime64[us]").astype(np.int64))
        role = _role_of_types(t.column("event_type")).to_numpy(zero_copy_only=False)
        uids, inv = np.unique(uid, return_inverse=True)
        order = np.lexsort((eid, tsu, inv))  # = turn_idx order per conv
        is_a = role[order] == "assistant"
        aconv = inv[order][is_a]
        if len(aconv) < 2:
            return empty
        pair = aconv[1:] == aconv[:-1]  # consecutive assistant turns, same conv
        if not pair.any():
            return empty
        texts = t.column("props").combine_chunks().take(pa.array(order[is_a]))
        h, offs = token_hashes(texts, seed=7, lowercase=True)
        row_of = np.repeat(np.arange(len(aconv), dtype=np.int64), np.diff(offs))
        o = np.lexsort((h, row_of))
        r, v = row_of[o], h[o].view(np.int64)
        keep = np.ones(len(r), dtype=bool)
        keep[1:] = (r[1:] != r[:-1]) | (v[1:] != v[:-1])
        r, v = r[keep], v[keep]
        sz = np.bincount(r, minlength=len(aconv)).astype(np.int64)
        u_offs = np.concatenate([[0], np.cumsum(sz)]).astype(np.int64)
        ia = np.flatnonzero(pair)
        ib = ia + 1
        la, lb = sz[ia], sz[ib]
        npairs = len(ia)
        seg = np.empty(2 * npairs, dtype=np.int64)
        seg[0::2], seg[1::2] = la, lb
        src = np.empty(2 * npairs, dtype=np.int64)
        src[0::2], src[1::2] = u_offs[ia], u_offs[ib]
        pair_of = np.repeat(np.arange(npairs), la + lb)
        vals = v[np.repeat(src, seg) + _segmented_arange(seg)]
        o2 = np.lexsort((vals, pair_of))
        p_, v_ = pair_of[o2], vals[o2]
        dup = (p_[1:] == p_[:-1]) & (v_[1:] == v_[:-1])
        inter = np.bincount(p_[1:][dup], minlength=npairs).astype(np.int64)
        union = la + lb - inter
        ok = union > 0
        bps = (10000 * inter[ok]) // union[ok]
        pconv = aconv[ia][ok]
        if len(pconv) == 0:
            return empty
        o3 = np.argsort(pconv, kind="stable")
        pc_, bps_ = pconv[o3], bps[o3]
        starts = np.flatnonzero(np.r_[True, pc_[1:] != pc_[:-1]])
        cnts = np.diff(np.append(starts, len(pc_))).astype(np.int64)
        sums = np.add.reduceat(bps_, starts)
        mx = np.maximum.reduceat(bps_, starts)
        names = np.array([f"c{u}" for u in uids[pc_[starts]]], dtype=object)
        return pa.table({"conv_id": pa.array(names, type=pa.string()),
                         "n_pairs": pa.array(cnts),
                         "mean_jaccard_bps": pa.array(sums // cnts),
                         "max_jaccard_bps": pa.array(mx)})

    out = keyed_partition_map(ds, ["user_id"], kernel).to_pandas()
    out = out.sort_values("conv_id").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


SQL["turn_repetition_stats"] = (
    f"{_CTE}, "
    "a AS (SELECT conv_id, text, "
    "ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS rn "
    "FROM transcripts WHERE role = 'assistant'), "
    "tok AS (SELECT DISTINCT conv_id, rn, "
    "UNNEST(regexp_extract_all(lower(text), '\\S+')) AS term FROM a), "
    "sz AS (SELECT conv_id, rn, COUNT(*) AS n FROM tok GROUP BY 1, 2), "
    "p AS (SELECT x.conv_id, x.rn AS r1, y.rn AS r2 FROM a x "
    "JOIN a y ON y.conv_id = x.conv_id AND y.rn = x.rn + 1), "
    "ints AS (SELECT p.conv_id, p.r1, p.r2, COUNT(tb.term) AS c "
    "FROM p LEFT JOIN tok ta ON ta.conv_id = p.conv_id AND ta.rn = p.r1 "
    "LEFT JOIN tok tb ON tb.conv_id = p.conv_id AND tb.rn = p.r2 "
    "AND tb.term = ta.term GROUP BY 1, 2, 3), "
    "j AS (SELECT i.conv_id, "
    "(10000 * i.c) // (COALESCE(sa.n, 0) + COALESCE(sb.n, 0) - i.c) AS bps "
    "FROM ints i "
    "LEFT JOIN sz sa ON sa.conv_id = i.conv_id AND sa.rn = i.r1 "
    "LEFT JOIN sz sb ON sb.conv_id = i.conv_id AND sb.rn = i.r2 "
    "WHERE COALESCE(sa.n, 0) + COALESCE(sb.n, 0) - i.c > 0) "
    "SELECT conv_id, COUNT(*) AS n_pairs, "
    "CAST(SUM(bps) // COUNT(*) AS BIGINT) AS mean_jaccard_bps, "
    "CAST(MAX(bps) AS BIGINT) AS max_jaccard_bps "
    "FROM j GROUP BY conv_id ORDER BY conv_id"
)


def conv_context_budget(sf_dir: str, *, budget: int = 16) -> pa.Table:
    """Context-window BUDGET audit per conversation: running
    whitespace-token total along turn order, how many turns land past the
    ``budget``-token context limit and where the overflow starts — the
    packing/truncation planner for feeding transcripts to a
    fixed-context model.  One keyed shuffle on user_id (conv == user);
    the kernel is one lexsort + segmented cumsum over vectorized polars
    token counts, all integers."""
    import polars as pl

    from ..sources.transcripts import _role_of_types  # noqa: F401 (parity)
    from ..stages.keyed import keyed_partition_map

    ds = read(sf_dir, "events", ["user_id", "ts", "event_id", "props"])

    def kernel(t: pa.Table) -> pa.Table:
        uid = np.asarray(t.column("user_id").combine_chunks()).astype(np.int64)
        if len(uid) == 0:
            return pa.table({"conv_id": pa.array([], type=pa.string()),
                             "n_turns": pa.array([], type=pa.int64()),
                             "total_tokens": pa.array([], type=pa.int64()),
                             "n_over_budget": pa.array([], type=pa.int64()),
                             "first_over_turn": pa.array([], type=pa.int64())})
        eid = np.asarray(t.column("event_id").combine_chunks()).astype(np.int64)
        tsu = (np.asarray(t.column("ts").combine_chunks())
               .astype("datetime64[us]").astype(np.int64))
        ntok = (pl.from_arrow(t.column("props").combine_chunks())
                .fill_null("").str.count_matches(r"\S+")
                .cast(pl.Int64).to_numpy())
        uids, inv = np.unique(uid, return_inverse=True)
        order = np.lexsort((eid, tsu, inv))
        inv_s, tok_s = inv[order], ntok[order]
        starts = np.flatnonzero(np.r_[True, inv_s[1:] != inv_s[:-1]])
        cum = np.cumsum(tok_s)
        base = np.zeros(len(starts), np.int64)
        base[1:] = cum[starts[1:] - 1]
        run_cum = cum - base[inv_s]
        counts = np.diff(np.append(starts, len(inv_s)))
        turn_idx = np.arange(len(inv_s), dtype=np.int64) - starts[inv_s]
        over = run_cum > budget
        n_over = np.add.reduceat(over.astype(np.int64), starts)
        first = np.where(over, turn_idx, np.iinfo(np.int64).max)
        first_over = np.minimum.reduceat(first, starts)
        first_over = np.where(n_over > 0, first_over, -1)
        names = np.array([f"c{u}" for u in uids], dtype=object)
        return pa.table({
            "conv_id": pa.array(names, type=pa.string()),
            "n_turns": pa.array(counts.astype(np.int64)),
            "total_tokens": pa.array(run_cum[starts + counts - 1]),
            "n_over_budget": pa.array(n_over),
            "first_over_turn": pa.array(first_over),
        })

    out = keyed_partition_map(ds, ["user_id"], kernel).to_pandas()
    out = out.sort_values("conv_id").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


SQL["conv_context_budget"] = (
    f"{_CTE}, tok AS (SELECT conv_id, turn_idx, "
    "CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS nt "
    "FROM transcripts), "
    "c AS (SELECT conv_id, turn_idx, "
    "SUM(nt) OVER (PARTITION BY conv_id ORDER BY turn_idx "
    "ROWS UNBOUNDED PRECEDING) AS run FROM tok) "
    "SELECT conv_id, COUNT(*) AS n_turns, "
    "CAST(MAX(run) AS BIGINT) AS total_tokens, "
    "CAST(SUM(CASE WHEN run > 16 THEN 1 ELSE 0 END) AS BIGINT) "
    "AS n_over_budget, "
    "CAST(COALESCE(MIN(CASE WHEN run > 16 THEN turn_idx END), -1) AS BIGINT) "
    "AS first_over_turn "
    "FROM c GROUP BY conv_id ORDER BY conv_id"
)


def reward_pref_pairs(sf_dir: str) -> pa.Table:
    """Preference-pair construction for reward-model training: every
    adjacent pair of assistant turns in a conversation becomes a
    (chosen, rejected) pair — chosen = the LONGER response, earlier turn
    on ties (the standard verbosity-prior bootstrap when no human labels
    exist).  Same keyed shuffle + lexsort shape as
    ``conv_response_latency``; lengths are character counts, everything
    integer."""
    from ..sources.transcripts import _role_of_types
    from ..stages.keyed import keyed_partition_map

    ds = read(sf_dir, "events", ["user_id", "ts", "event_id",
                                 "event_type", "props"])

    def kernel(t: pa.Table) -> pa.Table:
        import polars as pl

        uid = np.asarray(t.column("user_id").combine_chunks()).astype(np.int64)
        empty = pa.table({"conv_id": pa.array([], type=pa.string()),
                          "pair_idx": pa.array([], type=pa.int64()),
                          "chosen_turn": pa.array([], type=pa.int64()),
                          "rejected_turn": pa.array([], type=pa.int64()),
                          "chosen_len": pa.array([], type=pa.int64()),
                          "rejected_len": pa.array([], type=pa.int64())})
        if len(uid) == 0:
            return empty
        eid = np.asarray(t.column("event_id").combine_chunks()).astype(np.int64)
        tsu = (np.asarray(t.column("ts").combine_chunks())
               .astype("datetime64[us]").astype(np.int64))
        role = _role_of_types(t.column("event_type")).to_numpy(zero_copy_only=False)
        ln = (pl.from_arrow(t.column("props").combine_chunks())
              .fill_null("").str.len_chars().cast(pl.Int64).to_numpy())
        uids, inv = np.unique(uid, return_inverse=True)
        order = np.lexsort((eid, tsu, inv))
        inv_s, role_s, ln_s = inv[order], role[order], ln[order]
        turn_idx = np.empty(len(inv_s), np.int64)
        starts_all = np.flatnonzero(np.r_[True, inv_s[1:] != inv_s[:-1]])
        turn_idx = np.arange(len(inv_s), dtype=np.int64) - starts_all[
            np.searchsorted(starts_all, np.arange(len(inv_s)), side="right") - 1]
        a = role_s == "assistant"
        if a.sum() < 2:
            return empty
        ci, ti, li = inv_s[a], turn_idx[a], ln_s[a]
        adj = ci[1:] == ci[:-1]
        if not adj.any():
            return empty
        t1, t2 = ti[:-1][adj], ti[1:][adj]
        l1, l2 = li[:-1][adj], li[1:][adj]
        cpair = ci[:-1][adj]
        ps = np.flatnonzero(np.r_[True, cpair[1:] != cpair[:-1]])
        pair_idx = np.arange(len(cpair), dtype=np.int64) - ps[
            np.searchsorted(ps, np.arange(len(cpair)), side="right") - 1]
        second_wins = l2 > l1
        chosen_turn = np.where(second_wins, t2, t1)
        rejected_turn = np.where(second_wins, t1, t2)
        chosen_len = np.where(second_wins, l2, l1)
        rejected_len = np.where(second_wins, l1, l2)
        names = np.array([f"c{u}" for u in uids[cpair]], dtype=object)
        return pa.table({
            "conv_id": pa.array(names, type=pa.string()),
            "pair_idx": pa.array(pair_idx),
            "chosen_turn": pa.array(chosen_turn),
            "rejected_turn": pa.array(rejected_turn),
            "chosen_len": pa.array(chosen_len),
            "rejected_len": pa.array(rejected_len),
        })

    out = keyed_partition_map(ds, ["user_id"], kernel).to_pandas()
    out = out.sort_values(["conv_id", "pair_idx"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


SQL["reward_pref_pairs"] = (
    f"{_CTE}, a AS (SELECT conv_id, turn_idx, "
    "CAST(length(text) AS BIGINT) AS ln, "
    "ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY turn_idx) - 1 AS ai "
    "FROM transcripts WHERE role = 'assistant'), "
    "p AS (SELECT x.conv_id, x.ai AS pair_idx, "
    "x.turn_idx AS t1, y.turn_idx AS t2, x.ln AS l1, y.ln AS l2 "
    "FROM a x JOIN a y ON y.conv_id = x.conv_id AND y.ai = x.ai + 1) "
    "SELECT conv_id, pair_idx, "
    "CAST(CASE WHEN l2 > l1 THEN t2 ELSE t1 END AS BIGINT) AS chosen_turn, "
    "CAST(CASE WHEN l2 > l1 THEN t1 ELSE t2 END AS BIGINT) AS rejected_turn, "
    "CAST(CASE WHEN l2 > l1 THEN l2 ELSE l1 END AS BIGINT) AS chosen_len, "
    "CAST(CASE WHEN l2 > l1 THEN l1 ELSE l2 END AS BIGINT) AS rejected_len "
    "FROM p ORDER BY conv_id, pair_idx"
)


def response_length_by_turn(sf_dir: str) -> pa.Table:
    """Assistant RESPONSE-LENGTH drift along conversation depth: mean
    response length (chars) per assistant turn position across all
    conversations — the "does the model get terser as context grows"
    monitor.  Turn position = the assistant turn's ordinal WITHIN its
    conversation (0-based).  One keyed shuffle on user_id; per-partition
    lexsort + segmented ordinal, then integer (position, count, Σlen)
    partials fold in a tiny grouped sum; the mean is one mirrored float
    division."""
    import polars as pl

    from ..sources.transcripts import _role_of_types
    from ..stages.groupagg import grouped_aggregate
    from ..stages.keyed import keyed_partition_map

    ds = read(sf_dir, "events", ["user_id", "ts", "event_id",
                                 "event_type", "props"])

    def kernel(t: pa.Table) -> pa.Table:
        uid = np.asarray(t.column("user_id").combine_chunks()).astype(np.int64)
        if len(uid) == 0:
            return pa.table({"a_pos": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64()),
                             "s": pa.array([], type=pa.int64())})
        eid = np.asarray(t.column("event_id").combine_chunks()).astype(np.int64)
        tsu = (np.asarray(t.column("ts").combine_chunks())
               .astype("datetime64[us]").astype(np.int64))
        role = _role_of_types(t.column("event_type")).to_numpy(zero_copy_only=False)
        ln = (pl.from_arrow(t.column("props").combine_chunks())
              .fill_null("").str.len_chars().cast(pl.Int64).to_numpy())
        uids, inv = np.unique(uid, return_inverse=True)
        order = np.lexsort((eid, tsu, inv))
        inv_s, role_s, ln_s = inv[order], role[order], ln[order]
        a = role_s == "assistant"
        if not a.any():
            return pa.table({"a_pos": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64()),
                             "s": pa.array([], type=pa.int64())})
        ci, li = inv_s[a], ln_s[a]
        starts = np.flatnonzero(np.r_[True, ci[1:] != ci[:-1]])
        a_pos = np.arange(len(ci), dtype=np.int64) - starts[
            np.searchsorted(starts, np.arange(len(ci)), side="right") - 1]
        df = pl.DataFrame({"a_pos": a_pos, "l": li})
        return (df.group_by("a_pos")
                .agg(n=pl.len().cast(pl.Int64), s=pl.col("l").sum())
                .to_arrow())

    parts = keyed_partition_map(ds, ["user_id"], kernel)
    out = grouped_aggregate(parts, ["a_pos"],
                            [("n", "sum", "n"), ("s", "sum", "s")]
                            ).to_pandas()
    out["mean_len"] = out["s"].to_numpy(np.float64) \
        / out["n"].to_numpy(np.float64)
    out = (out.rename(columns={"n": "n_responses", "s": "total_len"})
           [["a_pos", "n_responses", "total_len", "mean_len"]]
           .sort_values("a_pos").reset_index(drop=True))
    return pa.Table.from_pandas(out, preserve_index=False)


SQL["response_length_by_turn"] = (
    f"{_CTE}, a AS (SELECT conv_id, CAST(length(text) AS BIGINT) AS ln, "
    "ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY turn_idx) - 1 AS a_pos "
    "FROM transcripts WHERE role = 'assistant') "
    "SELECT a_pos, COUNT(*) AS n_responses, "
    "CAST(SUM(ln) AS BIGINT) AS total_len, "
    "CAST(SUM(ln) AS DOUBLE) / COUNT(*) AS mean_len "
    "FROM a GROUP BY 1 ORDER BY 1"
)


def conv_outcome_label(sf_dir: str) -> pa.Table:
    """Conversation OUTCOME labeling for SFT curation: each conversation
    tagged converted / errored / converted_with_errors / abandoned from
    its event mix, with per-label conversation counts, total turns and
    µ-exact revenue — the triage table that decides which transcripts
    enter a training corpus.  ONE combiner-first per-conversation
    aggregate (purchase/error flags, turn count, µ-revenue partials);
    the label CASE and the label-level fold run on the tiny result."""
    import polars as pl

    from ..stages.groupagg import grouped_aggregate

    ds = read(sf_dir, "events", ["user_id", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        vmu = np.round(np.asarray(batch.column("value").combine_chunks(),
                                  dtype=np.float64) * 1e6).astype(np.int64)
        et = batch.column("event_type").combine_chunks()
        is_p = np.asarray(pc.equal(et, "purchase"))
        is_e = np.asarray(pc.equal(et, "error"))
        df = pl.DataFrame({
            "user_id": np.asarray(batch.column("user_id").combine_chunks()
                                  ).astype(np.int64),
            "p": is_p.astype(np.int64), "e": is_e.astype(np.int64),
            "vmu": np.where(is_p, vmu, 0),
        })
        return (df.group_by("user_id")
                .agg(n_turns=pl.len().cast(pl.Int64),
                     n_p=pl.col("p").sum(), n_e=pl.col("e").sum(),
                     vmu=pl.col("vmu").sum()).to_arrow())

    per_conv = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"],
        [("n_turns", "sum", "n_turns"), ("n_p", "sum", "n_p"),
         ("n_e", "sum", "n_e"), ("vmu", "sum", "vmu")],
    ).to_pandas()
    p = per_conv["n_p"].to_numpy(np.int64) > 0
    e = per_conv["n_e"].to_numpy(np.int64) > 0
    label = np.where(p & e, "converted_with_errors",
                     np.where(p, "converted",
                              np.where(e, "errored", "abandoned")))
    per_conv["label"] = label
    g = per_conv.groupby("label").agg(
        n_convs=("user_id", "size"), total_turns=("n_turns", "sum"),
        vmu=("vmu", "sum")).reset_index()
    from .common import round_scaled

    out = pd.DataFrame({
        "label": g["label"],
        "n_convs": g["n_convs"].astype(np.int64),
        "total_turns": g["total_turns"].astype(np.int64),
        "revenue": round_scaled(g["vmu"].to_numpy(np.int64), 2, 6),
    }).sort_values("label").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


SQL["conv_outcome_label"] = (
    "WITH c AS (SELECT user_id, COUNT(*) AS n_turns, "
    "SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n_p, "
    "SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_e, "
    "SUM(CASE WHEN event_type = 'purchase' "
    "THEN CAST(value AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END) "
    "AS v FROM events GROUP BY 1), "
    "l AS (SELECT *, CASE "
    "WHEN n_p > 0 AND n_e > 0 THEN 'converted_with_errors' "
    "WHEN n_p > 0 THEN 'converted' "
    "WHEN n_e > 0 THEN 'errored' ELSE 'abandoned' END AS label FROM c) "
    "SELECT label, COUNT(*) AS n_convs, "
    "CAST(SUM(n_turns) AS BIGINT) AS total_turns, "
    "CAST(ROUND(SUM(v), 2) AS DOUBLE) AS revenue "
    "FROM l GROUP BY 1 ORDER BY 1"
)


def conv_tool_diversity(sf_dir: str) -> pa.Table:
    """Distinct-TOOLS-per-conversation histogram (how many different
    tools does a session touch?) — the capability-coverage profile of
    an agentic corpus. Shuffle-free derivation (``transcripts_light``:
    tool is a row-wise map, turn order irrelevant), then the same
    two-level exact-distinct shape as ``transcript_role_stats``:
    combiner-aggregate to (conv_id, tool), count rows per conv, fold
    the conv-sized table to the |distinct-counts| histogram."""
    from ..stages.groupagg import grouped_aggregate

    ds = transcripts_light(sf_dir, ["conv_id", "tool"])

    def drop_null_tools(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc_

        return batch.filter(pc_.is_valid(batch.column("tool")))

    per_pair = grouped_aggregate(
        ds.map_batches(drop_null_tools, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["conv_id", "tool"], [("n", "count", None)])
    per_conv = grouped_aggregate(per_pair, ["conv_id"],
                                 [("n_tools", "count", None)])

    def fold(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(batch)
        return (df.group_by("n_tools")
                .agg(n_convs=pl.len().cast(pl.Int64)).to_arrow())

    out = grouped_aggregate(
        per_conv.map_batches(fold, batch_format="pyarrow",
                             zero_copy_batch=True),
        ["n_tools"], [("n_convs", "sum", "n_convs")]).to_pandas()
    out["n_tools"] = out["n_tools"].astype(np.int64)
    out = out.sort_values("n_tools").reset_index(drop=True)
    return pa.Table.from_pandas(out[["n_tools", "n_convs"]],
                                preserve_index=False)


SQL["conv_tool_diversity"] = (
    f"{_CTE}, d AS (SELECT conv_id, COUNT(DISTINCT tool) AS n_tools "
    "FROM transcripts WHERE tool IS NOT NULL GROUP BY 1) "
    "SELECT CAST(n_tools AS BIGINT) AS n_tools, "
    "COUNT(*) AS n_convs FROM d GROUP BY 1 ORDER BY 1"
)


def conv_duration_turns_corr(sf_dir: str) -> pa.Table:
    """Pearson correlation between conversation duration (seconds) and
    turn count — do longer sessions mean more exchanges, or slower ones?
    One conv-keyed combiner aggregate to (conv, duration, n_turns) —
    exact since a conv fully merges in the shuffle — then EXACT integer
    moment partials (Σx, Σy, Σxy, Σx², Σy²) and the mirrored final
    formula, ROUND 6 (grouped_regression precedent)."""
    from ..stages.groupagg import grouped_aggregate
    from .common import round_col

    ds = transcripts_light(sf_dir, ["conv_id", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        tsu = (np.asarray(batch.column("ts").combine_chunks())
               .astype("datetime64[us]").astype(np.int64))
        df = pl.DataFrame({
            "conv_id": np.asarray(batch.column("conv_id").combine_chunks(),
                                  dtype=object),
            "t": pl.Series(tsu),
        })
        return (df.group_by("conv_id")
                .agg(t0=pl.col("t").min(), t1=pl.col("t").max(),
                     n=pl.len().cast(pl.Int64)).to_arrow())

    per_conv = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["conv_id"], [("t0", "min", "t0"), ("t1", "max", "t1"),
                      ("n", "sum", "n")],
    )

    def fold(batch: pa.Table) -> pa.Table:
        t0 = np.asarray(batch.column("t0").combine_chunks()).astype(np.int64)
        t1 = np.asarray(batch.column("t1").combine_chunks()).astype(np.int64)
        n = np.asarray(batch.column("n").combine_chunks()).astype(np.int64)
        x = (t1 - t0) // 1_000_000  # whole seconds, exact
        return pa.table({
            "k": pa.array([0], type=pa.int64()),
            "cnt": pa.array([len(x)], type=pa.int64()),
            "sx": pa.array([int(x.sum())], type=pa.int64()),
            "sy": pa.array([int(n.sum())], type=pa.int64()),
            "sxy": pa.array([int((x * n).sum())], type=pa.int64()),
            "sxx": pa.array([int((x * x).sum())], type=pa.int64()),
            "syy": pa.array([int((n * n).sum())], type=pa.int64()),
        })

    f = grouped_aggregate(
        per_conv.map_batches(fold, batch_format="pyarrow",
                             zero_copy_batch=True),
        ["k"], [("cnt", "sum", "cnt"), ("sx", "sum", "sx"),
                ("sy", "sum", "sy"), ("sxy", "sum", "sxy"),
                ("sxx", "sum", "sxx"), ("syy", "sum", "syy")]).to_pandas()
    cnt = int(f["cnt"][0]); sx = int(f["sx"][0]); sy = int(f["sy"][0])
    sxy = int(f["sxy"][0]); sxx = int(f["sxx"][0]); syy = int(f["syy"][0])
    num = float(cnt * sxy - sx * sy)
    den = (np.sqrt(float(cnt * sxx - sx * sx))
           * np.sqrt(float(cnt * syy - sy * sy)))
    return pa.table({
        "n_convs": pa.array([cnt], type=pa.int64()),
        "corr": pa.array(round_col(np.array([num / den]), 6)),
    })


SQL["conv_duration_turns_corr"] = (
    f"{_CTE}, c AS (SELECT conv_id, "
    "(MAX(epoch_us(ts)) - MIN(epoch_us(ts))) // 1000000 AS x, "
    "COUNT(*) AS y FROM transcripts GROUP BY 1), "
    "m AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy, "
    "SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy FROM c) "
    "SELECT CAST(n AS BIGINT) AS n_convs, "
    "ROUND(CAST(n * sxy - sx * sy AS DOUBLE) "
    "/ (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) "
    "* sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS corr FROM m"
)


def tool_cooccurrence_pairs(sf_dir: str) -> pa.Table:
    """Which TOOLS appear together in one conversation? Unordered tool
    pair counts over distinct (conv, tool) — the capability-bundle
    signal for router/curriculum design. Distinct pairs via the shared
    two-level aggregate, then a conv-keyed kernel expands each conv's
    ≤|tools| set to its C(k,2) pairs (vectorized triu indices) with
    in-kernel pre-count — the second exchange carries (tool_a, tool_b)
    partials, bounded by |tools|²."""
    from ..stages.groupagg import grouped_aggregate
    from ..stages.keyed import keyed_partition_map

    ds = transcripts_light(sf_dir, ["conv_id", "tool"])
    per_pair = grouped_aggregate(ds, ["conv_id", "tool"],
                                 [("n", "count", None)])

    def kernel(t: pa.Table) -> pa.Table:
        import polars as pl

        conv = t.column("conv_id").to_numpy(zero_copy_only=False)
        if len(conv) == 0:
            return pa.table({"tool_a": pa.array([], type=pa.string()),
                             "tool_b": pa.array([], type=pa.string()),
                             "n_convs": pa.array([], type=pa.int64())})
        tool = t.column("tool").to_numpy(zero_copy_only=False)
        order = np.lexsort((tool, conv))
        c_s, t_s = conv[order], tool[order]
        starts = np.flatnonzero(np.r_[True, c_s[1:] != c_s[:-1]])
        ends = np.r_[starts[1:], len(c_s)]
        la, lb = [], []
        for a, b in zip(starts, ends):  # ≤|tools| per conv, tiny
            k = b - a
            if k < 2:
                continue
            iu = np.triu_indices(k, k=1)
            la.extend(t_s[a + iu[0]])
            lb.extend(t_s[a + iu[1]])
        if not la:
            return pa.table({"tool_a": pa.array([], type=pa.string()),
                             "tool_b": pa.array([], type=pa.string()),
                             "n_convs": pa.array([], type=pa.int64())})
        df = pl.DataFrame({"tool_a": np.asarray(la, dtype=object),
                           "tool_b": np.asarray(lb, dtype=object)})
        return (df.group_by(["tool_a", "tool_b"])
                .agg(n_convs=pl.len().cast(pl.Int64)).to_arrow())

    from ..stages.groupagg import grouped_aggregate as _ga

    parts = keyed_partition_map(per_pair, ["conv_id"], kernel)
    out = _ga(parts, ["tool_a", "tool_b"],
              [("n_convs", "sum", "n_convs")]).to_pandas()
    out = out.sort_values(["tool_a", "tool_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


SQL["tool_cooccurrence_pairs"] = (
    f"{_CTE}, d AS (SELECT DISTINCT conv_id, tool FROM transcripts) "
    "SELECT a.tool AS tool_a, b.tool AS tool_b, COUNT(*) AS n_convs "
    "FROM d a JOIN d b ON a.conv_id = b.conv_id AND a.tool < b.tool "
    "GROUP BY 1, 2 ORDER BY 1, 2"
)


def first_tool_latency(sf_dir: str) -> pa.Table:
    """Seconds from conversation start to the FIRST tool turn, per
    conversation — how deep into a session the agent reaches for a
    tool. One conv-keyed combiner aggregate (min ts overall, min ts
    where role='tool') — exact after the shuffle merge — inner-filtered
    to conversations that used a tool at all. Whole-second integers."""
    from ..stages.groupagg import grouped_aggregate

    ds = transcripts_light(sf_dir, ["conv_id", "role", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        tsu = (np.asarray(batch.column("ts").combine_chunks())
               .astype("datetime64[us]").astype(np.int64))
        df = pl.DataFrame({
            "conv_id": np.asarray(batch.column("conv_id").combine_chunks(),
                                  dtype=object),
            "role": np.asarray(batch.column("role").combine_chunks(),
                               dtype=object),
            "t": pl.Series(tsu),
        })
        big = np.int64(2**62)
        return (df.with_columns(
            tt=pl.when(pl.col("role") == "tool").then(pl.col("t"))
            .otherwise(pl.lit(big)))
            .group_by("conv_id")
            .agg(t0=pl.col("t").min(), tt=pl.col("tt").min()).to_arrow())

    agg = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["conv_id"], [("t0", "min", "t0"), ("tt", "min", "tt")],
    ).to_pandas()
    agg = agg[agg["tt"] < 2**62].copy()
    agg["first_tool_sec"] = ((agg["tt"].to_numpy(np.int64)
                              - agg["t0"].to_numpy(np.int64))
                             // 1_000_000).astype(np.int64)
    agg = agg[["conv_id", "first_tool_sec"]].sort_values("conv_id")
    return pa.Table.from_pandas(agg.reset_index(drop=True),
                                preserve_index=False)


SQL["first_tool_latency"] = (
    f"{_CTE}, a AS (SELECT conv_id, MIN(epoch_us(ts)) AS t0, "
    "MIN(CASE WHEN role = 'tool' THEN epoch_us(ts) END) AS tt "
    "FROM transcripts GROUP BY 1) "
    "SELECT conv_id, (tt - t0) // 1000000 AS first_tool_sec "
    "FROM a WHERE tt IS NOT NULL ORDER BY conv_id"
)


def conv_idle_gaps(sf_dir: str) -> pa.Table:
    """Longest IDLE gap inside each conversation (seconds) plus its turn
    count — the stall detector for agentic sessions (a long gap mid-conv
    usually marks a human walking away or a hung tool). One conv-keyed
    exchange; per partition a composite-key lexsort + one diff finds
    every conversation's max adjacent gap (``user_bursts`` machinery,
    no per-conv loop). Whole-second integers."""
    from ..stages.groupagg import grouped_aggregate
    from ..stages.keyed import keyed_partition_map

    ds = transcripts_light(sf_dir, ["conv_id", "ts"])

    def kernel(t: pa.Table) -> pa.Table:
        import polars as pl

        conv = t.column("conv_id").to_numpy(zero_copy_only=False)
        if len(conv) == 0:
            return pa.table({"conv_id": pa.array([], type=pa.string()),
                             "n_turns": pa.array([], type=pa.int64()),
                             "max_gap_sec": pa.array([], type=pa.int64())})
        tsu = (np.asarray(t.column("ts").combine_chunks())
               .astype("datetime64[us]").astype(np.int64))
        ccode = np.unique(conv, return_inverse=True)[1]
        order = np.lexsort((tsu, ccode))
        c_s, t_s = conv[order], tsu[order]
        cc_s = ccode[order]
        same = cc_s[1:] == cc_s[:-1]
        d = np.where(same, t_s[1:] - t_s[:-1], np.int64(-1))
        df = pl.DataFrame({"conv_id": c_s.astype(str),
                           "g": pl.Series(np.r_[np.int64(-1), d])})
        out = (df.group_by("conv_id")
               .agg(n_turns=pl.len().cast(pl.Int64),
                    mg=pl.col("g").max()))
        out = out.with_columns(
            max_gap_sec=pl.when(pl.col("mg") < 0).then(pl.lit(0))
            .otherwise(pl.col("mg") // 1_000_000).cast(pl.Int64)).drop("mg")
        return out.to_arrow()

    parts = keyed_partition_map(ds, ["conv_id"], kernel)
    out = grouped_aggregate(parts, ["conv_id"],
                            [("n_turns", "sum", "n_turns"),
                             ("max_gap_sec", "max", "max_gap_sec")]
                            ).to_pandas()
    out = out.sort_values("conv_id").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


SQL["conv_idle_gaps"] = (
    f"{_CTE}, o AS (SELECT conv_id, epoch_us(ts) AS t, "
    "LAG(epoch_us(ts)) OVER (PARTITION BY conv_id ORDER BY turn_idx) "
    "AS pt FROM transcripts) "
    "SELECT conv_id, COUNT(*) AS n_turns, "
    "CAST(COALESCE(MAX((t - pt) // 1000000), 0) AS BIGINT) "
    "AS max_gap_sec FROM o GROUP BY 1 ORDER BY 1"
)


def role_daypart_mix(sf_dir: str) -> pa.Table:
    """Turn volume by ROLE × DAYPART (night 0–5, morning 6–11,
    afternoon 12–17, evening 18–23) with within-role shares — when do
    users vs tools vs assistants actually speak? Shuffle-free
    derivation + ONE combiner-first (role, daypart) count; shares on
    the ≤16-row aggregate. Exact integers, ROUND 6."""
    from ..stages.groupagg import grouped_aggregate
    from .common import round_col

    ds = transcripts_light(sf_dir, ["role", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl
        import pyarrow.compute as pc_

        hr = np.asarray(pc_.hour(batch.column("ts")).combine_chunks(),
                        dtype=np.int64)
        dp = np.array(["night", "morning", "afternoon", "evening"],
                      dtype=object)[hr // 6]
        df = pl.DataFrame({
            "role": np.asarray(batch.column("role").combine_chunks(),
                               dtype=object),
            "daypart": dp,
        })
        return (df.group_by(["role", "daypart"])
                .agg(n_turns=pl.len().cast(pl.Int64)).to_arrow())

    out = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["role", "daypart"], [("n_turns", "sum", "n_turns")]).to_pandas()
    tot = out.groupby("role")["n_turns"].transform("sum")
    out["role_share"] = round_col(
        out["n_turns"].to_numpy(np.float64) / tot.to_numpy(np.float64), 6)
    out = out.sort_values(["role", "daypart"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


SQL["role_daypart_mix"] = (
    f"{_CTE}, c AS (SELECT role, CASE hour(ts) // 6 "
    "WHEN 0 THEN 'night' WHEN 1 THEN 'morning' WHEN 2 THEN 'afternoon' "
    "ELSE 'evening' END AS daypart, COUNT(*) AS n_turns "
    "FROM transcripts GROUP BY 1, 2), "
    "t AS (SELECT role, SUM(n_turns) AS tot FROM c GROUP BY 1) "
    "SELECT c.role, c.daypart, c.n_turns, "
    "ROUND(CAST(c.n_turns AS DOUBLE) / t.tot, 6) AS role_share "
    "FROM c JOIN t ON t.role = c.role ORDER BY c.role, c.daypart"
)


def conv_role_first_last(sf_dir: str) -> pa.Table:
    """Who OPENS and who CLOSES conversations: the (first_role,
    last_role) matrix over conversations — the dialog-shape prior an
    SFT curriculum checks (sessions should open with user/system and
    close with assistant). One conv-keyed exchange; per partition the
    ordered first/last turn of each conv reads off the run boundaries
    of one lexsort (``_ordered_conv_arrays`` convention: ts then
    event-order tie-break via turn order)."""
    from ..stages.groupagg import grouped_aggregate
    from ..stages.keyed import keyed_partition_map

    ds = transcripts_from_events(sf_dir)

    def kernel(t: pa.Table) -> pa.Table:
        import polars as pl

        conv = t.column("conv_id").to_numpy(zero_copy_only=False)
        if len(conv) == 0:
            return pa.table({"first_role": pa.array([], type=pa.string()),
                             "last_role": pa.array([], type=pa.string()),
                             "n_convs": pa.array([], type=pa.int64())})
        ti = np.asarray(t.column("turn_idx").combine_chunks()).astype(np.int64)
        role = t.column("role").to_numpy(zero_copy_only=False)
        ccode = np.unique(conv, return_inverse=True)[1]
        order = np.lexsort((ti, ccode))
        cc_s, r_s = ccode[order], role[order]
        starts = np.flatnonzero(np.r_[True, cc_s[1:] != cc_s[:-1]])
        ends = np.r_[starts[1:], len(cc_s)] - 1
        df = pl.DataFrame({"first_role": r_s[starts].astype(str),
                           "last_role": r_s[ends].astype(str)})
        return (df.group_by(["first_role", "last_role"])
                .agg(n_convs=pl.len().cast(pl.Int64)).to_arrow())

    parts = keyed_partition_map(ds, ["conv_id"], kernel)
    out = grouped_aggregate(parts, ["first_role", "last_role"],
                            [("n_convs", "sum", "n_convs")]).to_pandas()
    out = out.sort_values(["first_role", "last_role"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


SQL["conv_role_first_last"] = (
    f"{_CTE}, fl AS (SELECT conv_id, "
    "FIRST_VALUE(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) "
    "AS first_role, "
    "FIRST_VALUE(role) OVER (PARTITION BY conv_id ORDER BY turn_idx DESC) "
    "AS last_role FROM transcripts), "
    "d AS (SELECT DISTINCT conv_id, first_role, last_role FROM fl) "
    "SELECT first_role, last_role, COUNT(*) AS n_convs FROM d "
    "GROUP BY 1, 2 ORDER BY 1, 2"
)


def role_text_length_stats(sf_dir: str) -> pa.Table:
    """Text-LENGTH profile per role (turn count, total/mean/max chars) —
    the context-budget planner's per-role input. Shuffle-free
    derivation; per-batch vectorized char counts pre-aggregate to
    |roles| rows before the exchange. Exact integers, ROUND 6 mean."""
    from ..stages.groupagg import grouped_aggregate
    from .common import round_col

    ds = transcripts_light(sf_dir, ["role", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl
        import pyarrow.compute as pc_

        ln = np.asarray(
            pc_.utf8_length(pc_.coalesce(batch.column("text"), ""))
            .combine_chunks(), dtype=np.int64)
        df = pl.DataFrame({
            "role": np.asarray(batch.column("role").combine_chunks(),
                               dtype=object),
            "ln": pl.Series(ln),
        })
        return (df.group_by("role")
                .agg(n_turns=pl.len().cast(pl.Int64),
                     total_chars=pl.col("ln").sum(),
                     max_chars=pl.col("ln").max()).to_arrow())

    out = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["role"], [("n_turns", "sum", "n_turns"),
                   ("total_chars", "sum", "total_chars"),
                   ("max_chars", "max", "max_chars")]).to_pandas()
    out["mean_chars"] = round_col(
        out["total_chars"].to_numpy(np.float64)
        / out["n_turns"].to_numpy(np.float64), 6)
    out = out[["role", "n_turns", "total_chars", "mean_chars", "max_chars"]]
    out = out.sort_values("role").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


SQL["role_text_length_stats"] = (
    f"{_CTE} SELECT role, COUNT(*) AS n_turns, "
    "CAST(SUM(length(COALESCE(text, ''))) AS BIGINT) AS total_chars, "
    "ROUND(CAST(SUM(length(COALESCE(text, ''))) AS DOUBLE) / COUNT(*), 6) "
    "AS mean_chars, "
    "CAST(MAX(length(COALESCE(text, ''))) AS BIGINT) AS max_chars "
    "FROM transcripts GROUP BY 1 ORDER BY 1"
)
