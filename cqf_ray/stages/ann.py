"""Similarity search over an embedding column (`list<float>`).

Baseline: brute-force cosine top-k — the query matrix is broadcast once
(`ray.put`), every batch does one numpy matmul against it (vectorized,
zero Python loops per row). Scale path: LSH-bucketed (random-hyperplane)
candidate generation so each batch only scores against its buckets.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray


def _ids_and_matrix(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = np.asarray(t.column("vec_id"), dtype=np.int64)
    flat = np.asarray(t.column("embedding").combine_chunks().flatten(), dtype=np.float64)
    mat = flat.reshape(len(ids), -1)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    return ids, mat


def load_embedding_matrix(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """FULL-table (vec_ids, L2-normalized matrix) — small-scale VERIFY role
    only (all-pairs `embedding_dup_pairs`, tests). The ANN pipelines never
    call this: queries come from `load_query_matrix` (filtered read) and
    quantizer fits from `sample_embeddings` (distributed hash sample)."""
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"])
    return _ids_and_matrix(t)


def load_query_matrix(sf_dir: str, n_queries: int) -> tuple[np.ndarray, np.ndarray]:
    """(vec_ids, normalized matrix) for the query rows only: a predicate-
    pushdown read (`filters=`) so just the matching row groups/rows are
    decoded — never the whole table on the driver."""
    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", n_queries)],
    )
    return _ids_and_matrix(t)


def sample_embeddings(ds: "ray.data.Dataset", *, rate_inv: int = 3, seed: int = 17) -> np.ndarray:
    """Deterministic distributed hash sample of an embeddings Dataset for
    quantizer fits: each batch keeps rows with murmur64(vec_id) % rate_inv
    == 0, so only ~n/rate_inv sampled vectors (the aggregate) reach the
    driver — the full table never does. Partition-layout-invariant."""
    from ..hashing import murmur64a_u64

    def pick(batch: pa.Table) -> dict:
        vid = np.asarray(batch.column("vec_id").combine_chunks()).astype(np.int64)
        keep = murmur64a_u64(vid.view(np.uint64), seed=seed) % np.uint64(rate_inv) == 0
        return {"embedding": batch_embeddings(batch)[keep]}

    sampled = ds.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    mat = np.stack(sampled["embedding"].to_numpy()).astype(np.float64)
    return mat / np.linalg.norm(mat, axis=1, keepdims=True)


def batch_embeddings(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    """Zero-copy-ish extraction of a FixedSizeList/List<float> column into a
    (n, d) float64 matrix via the flattened values buffer."""
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = np.asarray(arr.flatten(), dtype=np.float64)
    return flat.reshape(len(arr), -1)


class BruteForceTopK:
    """Actor-pool stage: per-batch cosine top-k against broadcast queries.

    Emits (query_id, vec_id, sim) candidate rows — each batch contributes
    its local top-k per query; the global top-k is a tiny final reduction
    over |batches| × |queries| × k candidate rows.
    """

    def __init__(self, queries_ref, k: int):
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.qids, self.qmat = q  # (m,), (m, d) normalized
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        vid = np.asarray(batch.column("vec_id"), dtype=np.int64)
        emb = batch_embeddings(batch)
        emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        sims = self.qmat @ emb.T  # (m, n)
        # exclude self-matches
        self_mask = self.qids[:, None] == vid[None, :]
        sims[self_mask] = -np.inf
        k = min(self.k, sims.shape[1])
        idx = np.argpartition(-sims, kth=k - 1, axis=1)[:, :k]
        rows = np.repeat(self.qids, k)
        cols = vid[idx.reshape(-1)]
        vals = np.take_along_axis(sims, idx, axis=1).reshape(-1)
        keep = np.isfinite(vals)
        return pa.table(
            {"query_id": pa.array(rows[keep]), "vec_id": pa.array(cols[keep]),
             "sim": pa.array(vals[keep])}
        )


def brute_force_topk(
    ds: "ray.data.Dataset",
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    k: int,
    *,
    batch_size: int = 4096,
    concurrency=(1, 8),
) -> "pa.Table":
    """Global exact top-k: distributed candidate generation + small final
    reduction. Returns (query_id, rank, vec_id) with deterministic
    tie-break (−sim, vec_id)."""
    import pandas as pd

    ref = ray.put((query_ids, query_mat))
    cand = ds.map_batches(
        BruteForceTopK,
        fn_constructor_args=(ref, k),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    ).to_pandas()
    cand["sim_r"] = np.round(cand["sim"].to_numpy(), 9)  # stabilize float ties
    cand = cand.sort_values(["query_id", "sim_r", "vec_id"],
                            ascending=[True, False, True], kind="mergesort")
    top = cand.groupby("query_id", as_index=False).head(k).copy()
    top["rank"] = top.groupby("query_id").cumcount() + 1
    out = top[["query_id", "rank", "vec_id"]].reset_index(drop=True)
    out["rank"] = out["rank"].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


class KMeansIVF:
    """IVF coarse quantizer: seeded Lloyd's k-means over a (driver-side)
    sample; vectors search only their nearest cells. The scale path
    complementary to hyperplane LSH — cells adapt to the data distribution.
    Fit once (small sample), broadcast centroids, assign per batch."""

    def __init__(self, sample: np.ndarray, n_cells: int = 16, iters: int = 10, seed: int = 43):
        rng = np.random.default_rng(seed)
        n = sample.shape[0]
        n_cells = min(n_cells, n)
        sample = sample / np.linalg.norm(sample, axis=1, keepdims=True)
        centroids = sample[rng.choice(n, size=n_cells, replace=False)]
        for _ in range(iters):
            assign = np.argmax(sample @ centroids.T, axis=1)
            for c in range(n_cells):
                m = assign == c
                if m.any():
                    v = sample[m].mean(axis=0)
                    centroids[c] = v / max(np.linalg.norm(v), 1e-12)
        self.centroids = centroids

    def cells(self, mat: np.ndarray, nprobe: int = 1) -> np.ndarray:
        """(n, nprobe) nearest-centroid indices (cosine)."""
        sims = mat @ self.centroids.T
        if nprobe == 1:
            return np.argmax(sims, axis=1)[:, None]
        k = min(nprobe, sims.shape[1])
        return np.argpartition(-sims, kth=k - 1, axis=1)[:, :k]


class LshBucketer:
    """Random-hyperplane LSH:
    bucket = sign-bit string of `nbits` projections. Stateful stage — the
    projection matrix is generated once per actor from the seed."""

    def __init__(self, dim: int, nbits: int = 12, seed: int = 41):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, nbits))

    def bucket(self, mat: np.ndarray) -> np.ndarray:
        bits = (mat @ self.planes) > 0
        return (bits.astype(np.uint64) << np.arange(bits.shape[1], dtype=np.uint64)).sum(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = batch_embeddings(batch)
        emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        return batch.append_column("bucket", pa.array(self.bucket(emb).view(np.int64)))


class ProductQuantizer:
    """Product quantization (Jégou et al., PAMI'11) — the memory-
    compression ANN scale path next to LSH (hash buckets) and IVF (coarse
    cells): vectors are stored as m × log2(ks) bits, queries scan codes
    with an ADC lookup table, and only a short per-batch candidate list is
    re-ranked against the real vectors.  Fit is per-subspace Lloyd L2
    k-means on a (distributed-hash-sampled) driver-side sample; encode and
    search are vectorized per batch."""

    def __init__(self, sample: np.ndarray, m: int = 8, ks: int = 16,
                 iters: int = 10, seed: int = 47):
        sample = sample / np.linalg.norm(sample, axis=1, keepdims=True)
        n, dim = sample.shape
        if dim % m:
            raise ValueError(f"dim {dim} not divisible by m={m}")
        self.m, self.dsub = m, dim // m
        self.ks = min(ks, n)
        rng = np.random.default_rng(seed)
        self.codebooks = np.empty((m, self.ks, self.dsub))
        for j in range(m):
            sub = sample[:, j * self.dsub:(j + 1) * self.dsub]
            cent = sub[rng.choice(n, size=self.ks, replace=False)]
            for _ in range(iters):
                d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
                assign = np.argmin(d2, axis=1)
                for c in range(self.ks):
                    msk = assign == c
                    if msk.any():
                        cent[c] = sub[msk].mean(axis=0)
            self.codebooks[j] = cent

    def encode(self, mat: np.ndarray) -> np.ndarray:
        """(n, m) uint8 codes for NORMALIZED input rows (nearest centroid
        per subspace, L2 — argmax of 2x·c − |c|²)."""
        n = mat.shape[0]
        codes = np.empty((n, self.m), dtype=np.uint8)
        for j in range(self.m):
            sub = mat[:, j * self.dsub:(j + 1) * self.dsub]
            cent = self.codebooks[j]
            score = 2.0 * (sub @ cent.T) - (cent * cent).sum(axis=1)[None, :]
            codes[:, j] = np.argmax(score, axis=1)
        return codes

    def lut(self, qmat: np.ndarray) -> np.ndarray:
        """(n_queries, m, ks) ADC table of query-subvector · centroid —
        summing one entry per subspace approximates the inner product."""
        q = qmat.reshape(qmat.shape[0], self.m, self.dsub)
        return np.einsum("qmd,mkd->qmk", q, self.codebooks)
