"""Event-time operators Ray Data has no primitive for: session windows and
as-of joins (SURVEY.md §2 'custom operators' mandate). Both partition by
the conversation/user key — the ONE shuffle key the transcript pipelines
share — and compute vectorized per group (numpy searchsorted / diff), so
the partitioning assumption is: all rows of a key fit one group task
(true for conversations; salting would split pathological keys).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..sources.transcripts import TRANSCRIPTS_SQL
from .common import read

_GAP_MIN = 30

_CTE = f"WITH transcripts AS ({TRANSCRIPTS_SQL})"


def transcript_sessions(sf_dir: str) -> pa.Table:
    """Gap-based session windows per conversation: a new session starts
    when > 30 min separate consecutive turns. Returns (conv_id,
    n_sessions, n_turns)."""
    ds = read(sf_dir, "events", ["event_id", "ts", "user_id"])

    def sessions(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"], kind="mergesort")
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        gaps = np.diff(ts) > _GAP_MIN * 60_000_000
        uid = df["user_id"].iloc[0]
        return pd.DataFrame(
            {
                "conv_id": [f"c{uid}"],
                "n_sessions": [int(gaps.sum()) + 1],
                "n_turns": [len(df)],
            }
        )

    df = ds.groupby("user_id").map_groups(sessions, batch_format="pandas").to_pandas()
    df = df.sort_values("conv_id").reset_index(drop=True)
    df["n_sessions"] = df["n_sessions"].astype(np.int64)
    df["n_turns"] = df["n_turns"].astype(np.int64)
    return pa.Table.from_pandas(df, preserve_index=False)


def purchase_view_asof(sf_dir: str) -> pa.Table:
    """As-of join (attribution): for each 'purchase' event, the most recent
    'view' event of the same user at-or-before it. Keyed shuffle on
    user_id, then per-group vectorized searchsorted — the canonical way to
    express an as-of join in Ray Data (oracle: DuckDB's native ASOF JOIN)."""
    ds = read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def asof(df: pd.DataFrame) -> pd.DataFrame:
        p = df[df.event_type == "purchase"].sort_values(["ts", "event_id"], kind="mergesort")
        v = df[df.event_type == "view"].sort_values(["ts", "event_id"], kind="mergesort")
        if len(p) == 0 or len(v) == 0:
            return pd.DataFrame({"purchase_id": pd.Series([], dtype=np.int64),
                                 "view_id": pd.Series([], dtype=np.int64)})
        vts = v["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        pts = p["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        idx = np.searchsorted(vts, pts, side="right") - 1
        m = idx >= 0
        return pd.DataFrame(
            {
                "purchase_id": p["event_id"].to_numpy()[m],
                "view_id": v["event_id"].to_numpy()[idx[m]],
            }
        )

    df = ds.groupby("user_id").map_groups(asof, batch_format="pandas").to_pandas()
    df = df.sort_values("purchase_id").reset_index(drop=True)
    return pa.Table.from_pandas(df.astype(np.int64), preserve_index=False)


SQL = {
    "transcript_sessions": (
        f"{_CTE}, d AS ("
        "  SELECT conv_id, ts - LAG(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS gap "
        "  FROM transcripts) "
        "SELECT conv_id, "
        "CAST(1 + SUM(CASE WHEN gap > INTERVAL '30 minutes' THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions, "
        "COUNT(*) AS n_turns "
        "FROM d GROUP BY conv_id ORDER BY conv_id"
    ),
    "purchase_view_asof": (
        "SELECT p.event_id AS purchase_id, v.event_id AS view_id "
        "FROM (SELECT * FROM events WHERE event_type = 'purchase') p "
        "ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v "
        "ON p.user_id = v.user_id AND p.ts >= v.ts "
        "ORDER BY purchase_id"
    ),
}
