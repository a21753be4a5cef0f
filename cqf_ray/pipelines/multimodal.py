"""Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
decode/feature stages as actor pools.

The container has no image/audio codecs (driver mandate), so the DECODE
step is a deterministic fake behind the real Ray plumbing: schema, batch
sizing (small batches for large payloads), actor signature and output
layout are all real and tested. Swap `_FakeDecoder.decode` for a PIL/ffmpeg
call on a real cluster.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from .common import read

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # "image" | "audio"
        ("payload", pa.binary()),
        ("width", pa.int32()),  # typed metadata (0 when unknown)
        ("height", pa.int32()),
        ("sample_rate", pa.int32()),
    ]
)


def synth_media(sf_dir: str) -> "ray.data.Dataset":
    """Deterministic opaque-binary media table derived from documents.text
    (UTF-8 bytes stand in for an encoded payload)."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def to_media(batch: pa.Table) -> pa.Table:
        did = np.asarray(batch.column("doc_id"), dtype=np.int64)
        payload = batch.column("text").cast(pa.binary())
        kind = np.where(did % 2 == 0, "image", "audio")
        return pa.table(
            {
                "media_id": pa.array(did),
                "kind": pa.array(kind, type=pa.string()),
                "payload": payload,
                "width": pa.array(np.where(did % 2 == 0, 64, 0).astype(np.int32)),
                "height": pa.array(np.where(did % 2 == 0, 64, 0).astype(np.int32)),
                "sample_rate": pa.array(np.where(did % 2 == 1, 16000, 0).astype(np.int32)),
            }
        )

    return ds.map_batches(to_media, batch_format="pyarrow", zero_copy_batch=True)


class MediaFeatures:
    """Actor-pool decode/feature stage (stateful: a real decoder would load
    its codec/model here ONCE per actor). Small batch_size is the memory
    lever for large payloads (SURVEY.md §7 memory-aware rule)."""

    def __init__(self, model: str = "fake-v1"):
        if model != "fake-v1":
            raise NotImplementedError(
                "real codecs are unavailable in this container; plug a PIL/"
                "torchaudio decoder here on a real cluster"
            )
        self.model = model

    @staticmethod
    def decode(payload: np.ndarray) -> np.ndarray:
        """STUB decode: deterministic per-payload feature = (len, sum, xor).
        Vectorized over the binary column's flat buffer."""
        return payload  # passthrough; features computed from buffers below

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column("payload")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        buffers = col.buffers()
        off = np.frombuffer(buffers[1], dtype=np.int32, count=len(col) + 1,
                            offset=col.offset * 4).astype(np.int64)
        data = (np.frombuffer(buffers[2], dtype=np.uint8)
                if buffers[2] is not None else np.empty(0, np.uint8))
        cs = np.concatenate([[0], np.cumsum(data.astype(np.int64))])
        n_bytes = off[1:] - off[:-1]
        byte_sum = cs[off[1:]] - cs[off[:-1]]
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "n_bytes": pa.array(n_bytes),
                "byte_sum": pa.array(byte_sum),
            }
        )


def media_features(sf_dir: str) -> pa.Table:
    """Decode+featurize the media table through the actor-pool stage."""
    ds = synth_media(sf_dir)
    out = ds.map_batches(
        MediaFeatures, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=256, concurrency=(1, 4),
    )
    df = out.to_pandas().sort_values("media_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


class MediaResize:
    """Actor-pool RESIZE stage (the image-downscale shape). STUB transform
    per the no-codecs mandate: a deterministic strided byte subsample
    stands in for pixel resampling, so the Ray plumbing — actor pool,
    small batches, payload-buffer vectorization, output schema — and the
    byte-arithmetic oracle are both real. Swap `__call__`'s gather for a
    PIL `Image.resize` on a real cluster."""

    def __init__(self, stride: int = 4):
        if stride < 1:
            raise ValueError("stride must be >= 1")
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column("payload")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        buffers = col.buffers()
        off = np.frombuffer(buffers[1], dtype=np.int32, count=len(col) + 1,
                            offset=col.offset * 4).astype(np.int64)
        data = (np.frombuffer(buffers[2], dtype=np.uint8)
                if buffers[2] is not None else np.empty(0, np.uint8))
        n_bytes = off[1:] - off[:-1]
        s = self.stride
        n_out = (n_bytes + s - 1) // s
        total = int(n_out.sum())
        idx = np.ones(total, dtype=np.int64)
        heads = np.concatenate([[0], np.cumsum(n_out)[:-1]])
        nz = n_out > 0
        idx[heads[nz]] = np.concatenate([[0], 1 - n_out[nz][:-1]])
        within = np.cumsum(idx)  # 0..n_out-1 per media
        gather = np.repeat(off[:-1], n_out) + within * s
        vals = data[gather].astype(np.int64)
        cs = np.concatenate([[0], np.cumsum(vals)])
        bounds = np.concatenate([heads, [total]])
        byte_sum = cs[bounds[1:]] - cs[bounds[:-1]]
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "n_bytes_out": pa.array(n_out),
                "byte_sum_out": pa.array(byte_sum),
            }
        )


def media_resize(sf_dir: str, *, stride: int = 4) -> pa.Table:
    """Resize every payload through the actor-pool stage (setup once per
    actor, small batches for large payloads)."""
    ds = synth_media(sf_dir)
    out = ds.map_batches(
        MediaResize, fn_constructor_kwargs={"stride": stride},
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=256, concurrency=(1, 4),
    )
    df = out.to_pandas().sort_values("media_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


_FRAME = 64  # bytes per synthetic "frame"


def media_frames(sf_dir: str) -> pa.Table:
    """Frame sampling: explode each payload into fixed-size frame records
    (media_id, frame_idx, frame_bytes) — the video/audio frame-extraction
    shape. Vectorized row expansion inside map_batches (repeat + ragged
    arange), not per-row flat_map."""
    ds = synth_media(sf_dir)

    def explode(batch: pa.Table) -> pa.Table:
        col = batch.column("payload")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        off = np.frombuffer(col.buffers()[1], dtype=np.int32, count=len(col) + 1,
                            offset=col.offset * 4).astype(np.int64)
        n_bytes = off[1:] - off[:-1]
        n_frames = np.maximum((n_bytes + _FRAME - 1) // _FRAME, 0)
        mid = np.asarray(batch.column("media_id"), dtype=np.int64)
        total = int(n_frames.sum())
        idx = np.ones(total, dtype=np.int64)
        heads = np.concatenate([[0], np.cumsum(n_frames)[:-1]])
        nz = n_frames > 0
        idx[heads[nz]] = np.concatenate([[0], 1 - n_frames[nz][:-1]])
        frame_idx = np.cumsum(idx)
        rep_bytes = np.repeat(n_bytes, n_frames)
        frame_bytes = np.minimum(rep_bytes - frame_idx * _FRAME, _FRAME)
        return pa.table(
            {
                "media_id": pa.array(np.repeat(mid, n_frames)),
                "frame_idx": pa.array(frame_idx),
                "frame_bytes": pa.array(frame_bytes),
            }
        )

    df = ds.map_batches(explode, batch_format="pyarrow").to_pandas()
    df = df.sort_values(["media_id", "frame_idx"]).reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


SQL = {
    "media_frames": (
        "SELECT doc_id AS media_id, CAST(r AS BIGINT) AS frame_idx, "
        "CAST(LEAST(octet_length(CAST(text AS BLOB)) - r * 64, 64) AS BIGINT) AS frame_bytes "
        "FROM documents, LATERAL UNNEST(range(CAST(CEIL(octet_length(CAST(text AS BLOB)) / 64.0) AS BIGINT))) AS t(r) "
        "ORDER BY media_id, frame_idx"
    ),
    # the decode stage is a stub (no codecs in this container) but its
    # feature arithmetic over the payload bytes is deterministic, so the
    # plumbing IS oracle-checked: byte_sum via ascii()/list_aggregate
    # (ASCII contract — payload bytes == code points on this testdata)
    "media_resize": (
        "SELECT doc_id AS media_id, "
        "CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind, "
        "CAST(CEIL(octet_length(CAST(text AS BLOB)) / 4.0) AS BIGINT) AS n_bytes_out, "
        "CAST(COALESCE(list_aggregate(list_transform(range(1, length(text) + 1, 4), "
        "i -> CAST(ascii(substring(text, CAST(i AS BIGINT), 1)) AS BIGINT)), 'sum'), 0) "
        "AS BIGINT) AS byte_sum_out "
        "FROM documents ORDER BY media_id"
    ),
    "media_features": (
        "SELECT doc_id AS media_id, "
        "CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind, "
        "CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes, "
        "CAST(CASE WHEN length(text) = 0 THEN 0 ELSE "
        "list_aggregate(list_transform(range(1, length(text) + 1), "
        "i -> CAST(ascii(substring(text, CAST(i AS BIGINT), 1)) AS BIGINT)), 'sum') "
        "END AS BIGINT) AS byte_sum "
        "FROM documents ORDER BY media_id"
    ),
}
