"""Similarity-search pipelines over the `embeddings` table."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..stages.ann import LshBucketer, batch_embeddings, brute_force_topk, load_query_matrix
from .common import read, round_col

_N_QUERIES = 10
_K = 5


def ann_brute_force(sf_dir: str) -> pa.Table:
    """Exact cosine top-5 for the first 10 vec_ids against the whole table
    (self excluded): broadcast query matrix (filtered predicate-pushdown
    read — only the query rows reach the driver), per-batch matmul, small
    final reduction. Oracle-checkable (DuckDB list_cosine_similarity)."""
    qids, qmat = load_query_matrix(sf_dir, _N_QUERIES)
    ds = read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return brute_force_topk(ds, qids, qmat, _K)


def ann_range_search(sf_dir: str, *, radius: float = 0.30) -> pa.Table:
    """Cosine RANGE search — all neighbors within a similarity radius, the
    retrieval mode dedup/recall audits need when "how many" matters more
    than "the best k": for each query vector, every (query_id, vec_id)
    with cosine ≥ ``radius`` (self excluded).  Same distributed shape as
    ``brute_force_topk`` — broadcast query matrix via ``ray.put``, one
    numpy matmul per batch, only the MATCHING pairs leave each task (the
    result is output-sized; no per-batch top-k cap because range search
    must return the full neighborhood).  Oracle: exact
    ``list_cosine_similarity`` cross join."""
    import ray

    qids, qmat = load_query_matrix(sf_dir, _N_QUERIES)
    ds = read(sf_dir, "embeddings", ["vec_id", "embedding"])
    ref = ray.put((qids, qmat))

    class RangeScan:
        def __init__(self, queries_ref, r):
            q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
            self.qids, self.qmat = q
            self.r = r

        def __call__(self, batch: pa.Table) -> pa.Table:
            vid = np.asarray(batch.column("vec_id"), dtype=np.int64)
            emb = batch_embeddings(batch)
            emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
            sims = self.qmat @ emb.T  # (m, n)
            hit = (sims >= self.r) & (self.qids[:, None] != vid[None, :])
            qi, ci = np.nonzero(hit)
            return pa.table({"query_id": pa.array(self.qids[qi]),
                             "vec_id": pa.array(vid[ci])})

    out = ds.map_batches(RangeScan, fn_constructor_args=(ref, radius),
                         batch_format="pyarrow", batch_size=4096,
                         concurrency=(1, 8)).to_pandas()
    out = out.sort_values(["query_id", "vec_id"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def knn_graph(sf_dir: str, *, k: int = 3) -> pa.Table:
    """Exact cosine k-NN GRAPH over the embeddings table — every vector's
    top-k neighbors (self excluded), the primitive under SemDeDup
    clustering, graph-based ANN index builds (HNSW ground truth) and
    embedding-space quality audits.  Distributed shape: the normalized
    matrix is broadcast ONCE via ``ray.put`` and the table streams through
    ``map_batches`` — each batch computes one (batch × corpus) matmul and
    emits only its rows' top-k (output-sized; nothing quadratic leaves a
    task).  The broadcast side is the scale limiter: past ~10⁷ vectors
    swap candidate generation to the banded LSH index
    (``dedup.embedding_dup_pairs_lsh``) or the IVF cells (``ann_ivf``) and
    keep this exact kernel for per-bucket scoring.  Ranking follows the
    ``ann_brute_force`` convention: sims rounded to 9 dp, ties broken by
    neighbor_id, so the result equals the SQL oracle row-for-row."""
    import ray

    from ..stages.ann import load_embedding_matrix

    ids, mat = load_embedding_matrix(sf_dir)
    ref = ray.put((ids, mat))
    ds = read(sf_dir, "embeddings", ["vec_id", "embedding"])

    class RowTopK:
        def __init__(self, corpus_ref, k):
            c = ray.get(corpus_ref) if isinstance(corpus_ref, ray.ObjectRef) else corpus_ref
            self.cids, self.cmat = c
            self.k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            vid = np.asarray(batch.column("vec_id"), dtype=np.int64)
            emb = batch_embeddings(batch)
            emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
            sims = np.round(emb @ self.cmat.T, 9)  # (n, corpus)
            sims[vid[:, None] == self.cids[None, :]] = -np.inf
            kk = min(self.k, sims.shape[1] - 1)
            # top-k with (sim desc, neighbor_id asc) tie-break: one row-wise
            # lexsort — ties at the k-boundary resolve by id, never by
            # partition order (self rows sit at -inf and sort last)
            cids2 = np.broadcast_to(self.cids, sims.shape)
            order = np.lexsort((cids2, -sims), axis=1)[:, :kk]
            out_n = np.take_along_axis(cids2, order, axis=1)
            return pa.table({
                "vec_id": pa.array(np.repeat(vid, kk)),
                "rank": pa.array(np.tile(np.arange(1, kk + 1, dtype=np.int64), len(vid))),
                "neighbor_id": pa.array(out_n.reshape(-1)),
            })

    out = ds.map_batches(RowTopK, fn_constructor_args=(ref, k),
                         batch_format="pyarrow", batch_size=4096,
                         concurrency=(1, 8)).to_pandas()
    out = out.sort_values(["vec_id", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def ann_lsh(sf_dir: str) -> pa.Table:
    """LSH-bucketed approximate variant (the 100 TB path: candidates only
    from matching hyperplane buckets; probes multiple nearby buckets by
    flipping one bit). Recall vs the exact result asserted in pytest."""
    import ray

    qids, qmat = load_query_matrix(sf_dir, _N_QUERIES)
    dim = qmat.shape[1]
    bucketer = LshBucketer(dim, nbits=8, seed=41)
    qbuckets = bucketer.bucket(qmat)
    # multiprobe: exact bucket + all 1-bit and 2-bit flips (37 of 256
    # buckets/query — recall on UNIFORM data, the ANN worst case, needs
    # wider probing than clustered corpora)
    probe = {int(b) for b in qbuckets}
    for b in list(probe):
        for i in range(8):
            probe.add(b ^ (1 << i))
            for j in range(i + 1, 8):
                probe.add(b ^ (1 << i) ^ (1 << j))
    probe_arr = pa.array(np.array(sorted(probe), dtype=np.int64))
    ref = ray.put((qids, qmat, bucketer.planes))

    class BucketTopK:
        def __init__(self, ref, k):
            self.qids, self.qmat, planes = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            self.k = k
            self.planes = planes

        def __call__(self, batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            emb = batch_embeddings(batch)
            emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
            bits = (emb @ self.planes) > 0
            buckets = (bits.astype(np.uint64) << np.arange(bits.shape[1], dtype=np.uint64)).sum(axis=1).view(np.int64)
            mask = np.isin(buckets, np.asarray(probe_arr))
            if not mask.any():
                return pa.table({"query_id": pa.array([], type=pa.int64()),
                                 "vec_id": pa.array([], type=pa.int64()),
                                 "sim": pa.array([], type=pa.float64())})
            vid = np.asarray(batch.column("vec_id"), dtype=np.int64)[mask]
            emb = emb[mask]
            sims = self.qmat @ emb.T
            sims[self.qids[:, None] == vid[None, :]] = -np.inf
            k = min(self.k, sims.shape[1])
            idx = np.argpartition(-sims, kth=k - 1, axis=1)[:, :k]
            rows = np.repeat(self.qids, k)
            cols = vid[idx.reshape(-1)]
            vals = np.take_along_axis(sims, idx, axis=1).reshape(-1)
            keep = np.isfinite(vals)
            return pa.table({"query_id": pa.array(rows[keep]),
                             "vec_id": pa.array(cols[keep]),
                             "sim": pa.array(vals[keep])})

    ds = read(sf_dir, "embeddings", ["vec_id", "embedding"])
    cand = ds.map_batches(
        BucketTopK, fn_constructor_args=(ref, _K),
        batch_format="pyarrow", batch_size=4096, concurrency=(1, 4),
    ).to_pandas()
    cand["sim_r"] = np.round(cand["sim"].to_numpy(), 9)
    cand = cand.sort_values(["query_id", "sim_r", "vec_id"],
                            ascending=[True, False, True], kind="mergesort")
    top = cand.groupby("query_id", as_index=False).head(_K).copy()
    top["rank"] = (top.groupby("query_id").cumcount() + 1).astype(np.int64)
    return pa.Table.from_pandas(
        top[["query_id", "rank", "vec_id"]].reset_index(drop=True), preserve_index=False
    )


def ann_ivf(sf_dir: str, *, n_cells: int = 16, nprobe: int = 6) -> pa.Table:
    """IVF approximate top-k: k-means cells fit on a DISTRIBUTED hash
    sample (only ~n/3 sampled vectors reach the driver — never the full
    table), centroids broadcast; every batch scores only vectors whose
    cell is among each query's `nprobe` nearest cells. Recall vs the exact
    result asserted in pytest."""
    import ray

    from ..stages.ann import KMeansIVF, sample_embeddings

    qids, qmat = load_query_matrix(sf_dir, _N_QUERIES)
    sample = sample_embeddings(
        read(sf_dir, "embeddings", ["vec_id", "embedding"]), rate_inv=3, seed=17
    )
    ivf = KMeansIVF(sample, n_cells=n_cells, iters=10, seed=43)
    probe_cells = ivf.cells(qmat, nprobe=nprobe)  # (m, nprobe)
    ref = ray.put((qids, qmat, ivf.centroids, probe_cells))

    class CellTopK:
        def __init__(self, r, k):
            self.qids, self.qmat, self.centroids, self.probe = (
                ray.get(r) if isinstance(r, ray.ObjectRef) else r
            )
            self.k = k
            self.union_cells = np.unique(self.probe)

        def __call__(self, batch: pa.Table) -> pa.Table:
            emb = batch_embeddings(batch)
            emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
            cell = np.argmax(emb @ self.centroids.T, axis=1)
            mask = np.isin(cell, self.union_cells)
            empty = pa.table({"query_id": pa.array([], type=pa.int64()),
                              "vec_id": pa.array([], type=pa.int64()),
                              "sim": pa.array([], type=pa.float64())})
            if not mask.any():
                return empty
            vid = np.asarray(batch.column("vec_id"), dtype=np.int64)[mask]
            emb = emb[mask]
            cell = cell[mask]
            sims = self.qmat @ emb.T  # (m, n_kept)
            # a vector only counts for queries probing its cell
            allowed = (self.probe[:, :, None] == cell[None, None, :]).any(axis=1)
            sims = np.where(allowed, sims, -np.inf)
            sims[self.qids[:, None] == vid[None, :]] = -np.inf
            k = min(self.k, sims.shape[1])
            idx = np.argpartition(-sims, kth=k - 1, axis=1)[:, :k]
            rows = np.repeat(self.qids, k)
            cols = vid[idx.reshape(-1)]
            vals = np.take_along_axis(sims, idx, axis=1).reshape(-1)
            keep = np.isfinite(vals)
            return pa.table({"query_id": pa.array(rows[keep]),
                             "vec_id": pa.array(cols[keep]),
                             "sim": pa.array(vals[keep])})

    ds = read(sf_dir, "embeddings", ["vec_id", "embedding"])
    cand = ds.map_batches(
        CellTopK, fn_constructor_args=(ref, _K),
        batch_format="pyarrow", batch_size=4096, concurrency=(1, 4),
    ).to_pandas()
    if cand.empty:
        return pa.table({"query_id": pa.array([], type=pa.int64()),
                         "rank": pa.array([], type=pa.int64()),
                         "vec_id": pa.array([], type=pa.int64())})
    cand["sim_r"] = np.round(cand["sim"].to_numpy(), 9)
    cand = cand.sort_values(["query_id", "sim_r", "vec_id"],
                            ascending=[True, False, True], kind="mergesort")
    top = cand.groupby("query_id", as_index=False).head(_K).copy()
    top["rank"] = (top.groupby("query_id").cumcount() + 1).astype(np.int64)
    return pa.Table.from_pandas(
        top[["query_id", "rank", "vec_id"]].reset_index(drop=True), preserve_index=False
    )


def ann_pq(sf_dir: str, *, m: int = 8, ks: int = 16, shortlist: int = 48) -> pa.Table:
    """Product-quantization ANN (the memory-compression scale path: codes
    are m·log2(ks) bits per vector — 4 bytes here vs 256 for the raw
    float64 row).  Codebooks fit on the distributed hash sample; each
    batch encodes itself, scans codes via the broadcast ADC lookup table,
    keeps a per-query SHORTLIST by approximate inner product, and
    re-ranks the shortlist against the real vectors (exact sims) before
    the driver's final top-k — the classic ADC + re-rank pipeline.
    Quantizer-dependent output ⇒ rows-only; `ann_pq_recall` is the
    oracle-checked companion."""
    import ray

    from ..stages.ann import ProductQuantizer, sample_embeddings

    qids, qmat = load_query_matrix(sf_dir, _N_QUERIES)
    sample = sample_embeddings(
        read(sf_dir, "embeddings", ["vec_id", "embedding"]), rate_inv=3, seed=17
    )
    pq_ = ProductQuantizer(sample, m=m, ks=ks, seed=47)
    ref = ray.put((qids, qmat, pq_.lut(qmat), pq_.codebooks))

    class PQTopK:
        def __init__(self, r, shortlist):
            self.qids, self.qmat, self.lut, codebooks = (
                ray.get(r) if isinstance(r, ray.ObjectRef) else r
            )
            self.shortlist = shortlist
            self.pq = ProductQuantizer.__new__(ProductQuantizer)
            self.pq.codebooks = codebooks
            self.pq.m, self.pq.ks, self.pq.dsub = (
                codebooks.shape[0], codebooks.shape[1], codebooks.shape[2]
            )

        def __call__(self, batch: pa.Table) -> pa.Table:
            emb = batch_embeddings(batch)
            emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
            vid = np.asarray(batch.column("vec_id"), dtype=np.int64)
            codes = self.pq.encode(emb)
            approx = self.lut[:, 0, codes[:, 0]].copy()
            for j in range(1, self.pq.m):
                approx += self.lut[:, j, codes[:, j]]
            approx[self.qids[:, None] == vid[None, :]] = -np.inf
            s = min(self.shortlist, approx.shape[1])
            short = np.argpartition(-approx, kth=s - 1, axis=1)[:, :s]
            # exact re-rank of the shortlist only
            rows, cols, vals = [], [], []
            for qi in range(len(self.qids)):
                cand = short[qi]
                sims = self.qmat[qi] @ emb[cand].T
                sims[self.qids[qi] == vid[cand]] = -np.inf
                rows.append(np.full(len(cand), self.qids[qi], dtype=np.int64))
                cols.append(vid[cand])
                vals.append(sims)
            return pa.table({"query_id": pa.array(np.concatenate(rows)),
                             "vec_id": pa.array(np.concatenate(cols)),
                             "sim": pa.array(np.concatenate(vals))})

    ds = read(sf_dir, "embeddings", ["vec_id", "embedding"])
    cand = ds.map_batches(
        PQTopK, fn_constructor_args=(ref, shortlist),
        batch_format="pyarrow", batch_size=4096, concurrency=(1, 4),
    ).to_pandas()
    cand = cand[np.isfinite(cand["sim"])]
    cand["sim_r"] = np.round(cand["sim"].to_numpy(), 9)
    cand = cand.sort_values(["query_id", "sim_r", "vec_id"],
                            ascending=[True, False, True], kind="mergesort")
    top = cand.groupby("query_id", as_index=False).head(_K).copy()
    top["rank"] = (top.groupby("query_id").cumcount() + 1).astype(np.int64)
    return pa.Table.from_pandas(
        top[["query_id", "rank", "vec_id"]].reset_index(drop=True), preserve_index=False
    )


def ann_pq_recall(sf_dir: str) -> pa.Table:
    """Driver-checkable recall bound for the PQ ANN variant: mean recall
    ≥ 0.5 over the query set vs the in-query exact brute-force top-k."""
    return _recall_vs_exact(sf_dir, ann_pq(sf_dir).to_pandas(), 0.5)


def _recall_vs_exact(sf_dir: str, approx: pd.DataFrame, min_mean: float) -> pa.Table:
    """Mean recall of an approximate top-k result against the in-query
    exact brute-force top-k, emitted as (n_queries, mean_recall_ok) — the
    driver-checkable contract for hash/quantizer-dependent ANN variants.
    A MEAN bound, not per-query: on uniform data (the ANN worst case) a
    single query can legitimately land in a sparse bucket neighborhood."""
    exact = ann_brute_force(sf_dir).to_pandas()
    recalls = []
    for q, g in exact.groupby("query_id"):
        e = set(g["vec_id"].tolist())
        a = set(approx[approx.query_id == q]["vec_id"].tolist())
        recalls.append(len(a & e) / len(e))
    ok = bool(recalls) and float(np.mean(recalls)) >= min_mean
    return pa.table({"n_queries": pa.array([len(recalls)], type=pa.int64()),
                     "mean_recall_ok": pa.array([ok])})


def ann_lsh_recall(sf_dir: str) -> pa.Table:
    """Driver-checkable recall bound for the LSH ANN variant: mean recall
    ≥ 0.5 over the query set vs the in-query exact brute-force top-k."""
    return _recall_vs_exact(sf_dir, ann_lsh(sf_dir).to_pandas(), 0.5)


def ann_ivf_recall(sf_dir: str) -> pa.Table:
    """Driver-checkable recall bound for the IVF ANN variant: mean recall
    ≥ 0.5 over the query set vs the in-query exact brute-force top-k."""
    return _recall_vs_exact(sf_dir, ann_ivf(sf_dir).to_pandas(), 0.5)


def kmeans_embeddings(sf_dir: str, *, k: int = 8, iters: int = 5,
                      seed: int = 29) -> pa.Table:
    """Distributed FULL-DATA Lloyd k-means over the embeddings table —
    the iterative-training pattern (contrast: the IVF/PQ quantizers fit
    on a sample).  Per iteration ONE streaming pass: each batch assigns
    its rows to the broadcast centroids and emits k partial
    (cell, sum-vector, count) rows; the driver folds |blocks|×k partials
    (sorted by a deterministic batch key, so float addition order — and
    hence every assignment — is reproducible) into new centroids.  The
    only driver state is k×d floats + the tiny partial rows.  Output is
    the verdict row (n_cells, n_vecs, inertia_monotone_ok): exact Lloyd
    never increases inertia, and the oracle reproduces the exact row
    count."""
    import ray

    from ..stages.ann import sample_embeddings

    ds = read(sf_dir, "embeddings", ["vec_id", "embedding"])
    n_vecs = ds.count()
    sample = sample_embeddings(ds, rate_inv=3, seed=17)
    rng = np.random.default_rng(seed)
    cent = sample[rng.choice(sample.shape[0], size=k, replace=False)]
    cent = cent / np.linalg.norm(cent, axis=1, keepdims=True)

    inertias = []
    for _ in range(iters):
        ref = ray.put(cent)

        def partials(batch: pa.Table, _ref=ref) -> pa.Table:
            c = ray.get(_ref) if isinstance(_ref, ray.ObjectRef) else _ref
            emb = batch_embeddings(batch)
            emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
            vid = np.asarray(batch.column("vec_id"), dtype=np.int64)
            sims = emb @ c.T
            assign = np.argmax(sims, axis=1)
            # cosine inertia: sum of (1 - best sim)
            inert = float((1.0 - sims[np.arange(len(vid)), assign]).sum())
            sums = np.zeros((c.shape[0], emb.shape[1]))
            np.add.at(sums, assign, emb)
            counts = np.bincount(assign, minlength=c.shape[0]).astype(np.int64)
            return pa.table({
                "bkey": pa.array(np.full(c.shape[0], vid.min(), dtype=np.int64)),
                "cell": pa.array(np.arange(c.shape[0], dtype=np.int64)),
                "vsum": pa.array(list(sums)),
                "n": pa.array(counts),
                "inert": pa.array(np.full(c.shape[0], inert)),
            })

        part = ds.map_batches(partials, batch_format="pyarrow",
                              batch_size=4096).to_pandas()
        part = part.sort_values(["bkey", "cell"], kind="mergesort")
        inertias.append(float(part.drop_duplicates("bkey")["inert"].sum()))
        new = cent.copy()
        for c_id, g in part.groupby("cell"):
            if g["n"].sum() > 0:
                v = np.add.reduce(np.stack(g["vsum"].to_numpy()), axis=0)
                nrm = np.linalg.norm(v)
                if nrm > 1e-12:
                    new[c_id] = v / nrm
        cent = new
    ok = all(b <= a + 1e-9 for a, b in zip(inertias, inertias[1:]))
    return pa.table({"n_cells": pa.array([k], type=pa.int64()),
                     "n_vecs": pa.array([n_vecs], type=pa.int64()),
                     "inertia_monotone_ok": pa.array([bool(ok)])})


def embedding_centroids(sf_dir: str) -> pa.Table:
    """Per-label centroid norms (vectorized grouped mean over the embedding
    matrix — a feature-extraction-shaped aggregate). Oracle-checkable via
    list aggregation in SQL on count; we expose counts only (floats are
    engine-order sensitive)."""
    ds = read(sf_dir, "embeddings", ["label"])
    from ..stages.groupagg import grouped_aggregate

    out = grouped_aggregate(ds, ["label"], [("n_vecs", "count", None)])
    df = out.to_pandas().sort_values("label").reset_index(drop=True)
    df["label"] = df["label"].astype(np.int64)
    return pa.Table.from_pandas(df, preserve_index=False)


def embedding_dim_stats(sf_dir: str) -> pa.Table:
    """Per-dimension feature statistics over the embedding matrix — the
    profile a vector pipeline runs before normalization / PQ codebook
    fitting (dead dims, scale imbalance). One streaming pass: each batch
    reduces its (n, d) block to FOUR d-length integer vectors (count,
    Σmicro, Σmicro², min, max in micro-units — exact associative int64
    sums, so the result is summation-order-free); the driver folds
    |blocks| × d scalars. The micro-unit quantization is mirrored in the
    UNNEST-with-ordinality SQL oracle, making mean/std bit-identical."""
    ds = read(sf_dir, "embeddings", ["embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        emb = batch_embeddings(batch)  # (n, d) float64
        q = np.round(emb * 1e6).astype(np.int64)  # micro-units, exact
        return pa.table({
            "dim": pa.array(np.arange(q.shape[1], dtype=np.int64)),
            "n": pa.array(np.full(q.shape[1], q.shape[0], dtype=np.int64)),
            "s1": pa.array(q.sum(axis=0)),
            "s2": pa.array((q * q).sum(axis=0)),
            "mn": pa.array(q.min(axis=0)),
            "mx": pa.array(q.max(axis=0)),
        })

    from ..stages.groupagg import grouped_aggregate

    agg = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["dim"],
        [("n", "sum", "n"), ("s1", "sum", "s1"), ("s2", "sum", "s2"),
         ("mn", "min", "mn"), ("mx", "max", "mx")],
    ).to_pandas().sort_values("dim").reset_index(drop=True)
    n = agg["n"].to_numpy(np.int64).astype(np.float64)
    s1 = agg["s1"].to_numpy(np.int64).astype(np.float64)
    s2 = agg["s2"].to_numpy(np.int64).astype(np.float64)
    mean = s1 / n / 1e6
    var = (s2 / n - (s1 / n) * (s1 / n)) / 1e12
    return pa.table({
        "dim": pa.array(agg["dim"].to_numpy(np.int64)),
        "n": pa.array(agg["n"].to_numpy(np.int64)),
        "mean": pa.array(round_col(mean, 9)),
        "variance": pa.array(round_col(var, 12)),
        "min_v": pa.array(agg["mn"].to_numpy(np.int64).astype(np.float64) / 1e6),
        "max_v": pa.array(agg["mx"].to_numpy(np.int64).astype(np.float64) / 1e6),
    })


SQL = {
    "embedding_dim_stats": (
        "WITH u AS (SELECT CAST(g.i AS BIGINT) - 1 AS dim, "
        "CAST(ROUND(CAST(e.embedding[CAST(g.i AS BIGINT)] AS DOUBLE) * 1000000) AS BIGINT) AS q "
        "FROM embeddings e, "
        "LATERAL UNNEST(range(1, len(e.embedding) + 1)) AS g(i)), "
        "a AS (SELECT dim, COUNT(*) AS n, SUM(q) AS s1, SUM(q * q) AS s2, "
        "MIN(q) AS mn, MAX(q) AS mx FROM u GROUP BY 1) "
        "SELECT dim, CAST(n AS BIGINT) AS n, "
        "ROUND(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0, 9) AS mean, "
        "ROUND((CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) "
        "- (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))) "
        "/ 1000000000000.0, 12) AS variance, "
        "CAST(mn AS DOUBLE) / 1000000.0 AS min_v, "
        "CAST(mx AS DOUBLE) / 1000000.0 AS max_v "
        "FROM a ORDER BY dim"
    ),
    "ann_range_search": (
        "WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings "
        "WHERE vec_id < 10) "
        "SELECT q.query_id, e.vec_id FROM q CROSS JOIN embeddings e "
        "WHERE e.vec_id <> q.query_id "
        "AND list_cosine_similarity(q.embedding, e.embedding) >= 0.30 "
        "ORDER BY query_id, vec_id"
    ),
    "knn_graph": (
        "WITH sims AS ( "
        "  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id, "
        "         ROUND(list_cosine_similarity(a.embedding, b.embedding), 9) AS sim "
        "  FROM embeddings a CROSS JOIN embeddings b WHERE a.vec_id <> b.vec_id), "
        "ranked AS ( "
        "  SELECT vec_id, neighbor_id, "
        "         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, neighbor_id) AS rank "
        "  FROM sims) "
        "SELECT vec_id, CAST(rank AS BIGINT) AS rank, neighbor_id FROM ranked "
        "WHERE rank <= 3 ORDER BY vec_id, rank"
    ),
    "ann_brute_force": (
        "WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < 10), "
        "sims AS ( "
        "  SELECT q.query_id, e.vec_id, "
        "         ROUND(list_cosine_similarity(q.embedding, e.embedding), 9) AS sim "
        "  FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.query_id), "
        "ranked AS ( "
        "  SELECT query_id, vec_id, "
        "         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank "
        "  FROM sims) "
        "SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id FROM ranked "
        "WHERE rank <= 5 ORDER BY query_id, rank"
    ),
    "embedding_centroids": (
        "SELECT CAST(label AS BIGINT) AS label, COUNT(*) AS n_vecs FROM embeddings "
        "GROUP BY label ORDER BY label"
    ),
    "ann_lsh_recall": (
        "SELECT COUNT(*) AS n_queries, TRUE AS mean_recall_ok "
        "FROM embeddings WHERE vec_id < 10"
    ),
    "fd_sketch_verdict": (
        "SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs, "
        "ROUND(SUM(list_sum(list_transform(embedding, "
        "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS fro_sq, "
        "TRUE AS within_bound FROM embeddings"
    ),
    "ann_ivf_recall": (
        "SELECT COUNT(*) AS n_queries, TRUE AS mean_recall_ok "
        "FROM embeddings WHERE vec_id < 10"
    ),
    "kmeans_embeddings": (
        "SELECT CAST(8 AS BIGINT) AS n_cells, COUNT(*) AS n_vecs, "
        "TRUE AS inertia_monotone_ok FROM embeddings"
    ),
    "ann_pq_recall": (
        "SELECT COUNT(*) AS n_queries, TRUE AS mean_recall_ok "
        "FROM embeddings WHERE vec_id < 10"
    ),
}


def mutual_nn_pairs(sf_dir: str) -> pa.Table:
    """Mutual (reciprocal) nearest-neighbor pairs: (a, b) where b is a's
    cosine-NN AND a is b's — the high-precision matching primitive behind
    MNN batch alignment, bitext mining and safe embedding-dedup seeds.
    Composition: the distributed exact `knn_graph` at k=1 (broadcast
    matrix, streamed batches, 9-dp + id tie-break ranking convention) →
    a driver-side reciprocity join on the |corpus|-row NN table (already
    output-sized; at larger N the same join is one keyed shuffle on the
    unordered pair key).  Output is id pairs only — the convention that
    keeps the ranking float out of the comparison surface."""
    nn = knn_graph(sf_dir, k=1).to_pandas()[["vec_id", "neighbor_id"]]
    m = nn.merge(nn, left_on="neighbor_id", right_on="vec_id",
                 suffixes=("", "_r"))
    mut = m[(m["neighbor_id_r"] == m["vec_id"])
            & (m["vec_id"] < m["neighbor_id"])]
    out = (mut[["vec_id", "neighbor_id"]]
           .rename(columns={"vec_id": "vec_a", "neighbor_id": "vec_b"})
           .sort_values("vec_a").reset_index(drop=True))
    return pa.Table.from_pandas(out, preserve_index=False)


SQL["mutual_nn_pairs"] = (
    "WITH s AS (SELECT a.vec_id AS va, b.vec_id AS vb, "
    "ROUND(list_cosine_similarity(a.embedding, b.embedding), 9) AS sim "
    "FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id), "
    "r AS (SELECT va, vb, ROW_NUMBER() OVER (PARTITION BY va "
    "ORDER BY sim DESC, vb) AS rn FROM s), "
    "nn AS (SELECT va, vb FROM r WHERE rn = 1) "
    "SELECT x.va AS vec_a, x.vb AS vec_b "
    "FROM nn x JOIN nn y ON x.vb = y.va AND y.vb = x.va AND x.va < x.vb "
    "ORDER BY vec_a"
)


def fd_embedding_sketch(sf_dir: str, *, ell: int = 16) -> pa.Table:
    """Frequent-Directions covariance sketch over the embedding column,
    with its deterministic guarantee CHECKED at corpus scale: the ℓ×d
    sketch streams through the standard partial+tree-merge build
    (``stages/agg.build_sketch`` — FD merges are provably bound-
    preserving under any merge tree), the exact d×d Gram comes from one
    combiner-first partial-Gram pass (d is small; the Gram partials are
    (d², ) rows, never the matrix), and the verdict row reports
    ‖AᵀA−BᵀB‖₂ against the FD bound ‖A‖_F²/ℓ.  Rows-only by design (the
    sketch content depends on block partitioning; no SQL SVD) — the
    bound assertion also runs in pytest at fixed seeds."""
    import ray

    from ..sketches.fd import FrequentDirections
    from ..stages.agg import build_sketch

    ds = read(sf_dir, "embeddings", ["embedding"])

    def extract(batch: pa.Table) -> np.ndarray:
        return batch_embeddings(batch).astype(np.float64)

    dim = len(batch_embeddings(
        ds.take_batch(1, batch_format="pyarrow"))[0])
    fd = build_sketch(ds, extract, lambda: FrequentDirections(ell, dim))

    def gram_partial(batch: pa.Table) -> pa.Table:
        m = batch_embeddings(batch).astype(np.float64)
        return pa.table({"g": pa.array([(m.T @ m).ravel()],
                                       type=pa.list_(pa.float64()))})

    grams = read(sf_dir, "embeddings", ["embedding"]).map_batches(
        gram_partial, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    exact = np.sum(np.stack(grams["g"].to_numpy()), axis=0).reshape(dim, dim)
    err = fd.spectral_error_vs(exact)
    bound = fd.error_bound()
    return pa.table({
        "n_vecs": pa.array([fd.n_seen], type=pa.int64()),
        "ell": pa.array([ell], type=pa.int64()),
        "fro_sq": pa.array([round(fd.sq_norm, 6)], type=pa.float64()),
        "spectral_err": pa.array([round(err, 6)], type=pa.float64()),
        "fd_bound": pa.array([round(bound, 6)], type=pa.float64()),
        "within_bound": pa.array([bool(err <= bound)], type=pa.bool_()),
    })


def fd_sketch_verdict(sf_dir: str, *, ell: int = 16) -> pa.Table:
    """Oracle-backed companion for ``fd_embedding_sketch`` (whose sketch
    content is partition-order-dependent and hence rows-only): the
    SQL-checkable facts are n_vecs (COUNT) and ``fro_sq`` = ‖A‖_F²
    (SUM of squared components, 6-dp round absorbing sum-order jitter —
    the ``char_entropy`` precedent), and ``within_bound`` is the REAL
    engine-side verdict ‖AᵀA−BᵀB‖₂ ≤ ‖A‖_F²/ℓ against the exact Gram
    (the FD deterministic guarantee), which the oracle pins TRUE — the
    ``ann_lsh_recall`` companion pattern."""
    t = fd_embedding_sketch(sf_dir, ell=ell)
    return t.select(["n_vecs", "fro_sq", "within_bound"])


def knn_triangle_count(sf_dir: str, *, k: int = 3) -> pa.Table:
    """Distributed TRIANGLE COUNT over the symmetrized k-NN graph — the
    clustering-structure audit for an embedding space (triangle-dense
    neighborhoods = tight semantic clusters; the third graph primitive
    next to `stages/cc.py` and PageRank).  Classic two-shuffle plan that
    never builds a global adjacency: (1) undirected edges (u<v, deduped)
    from the exact `knn_graph`; (2) wedges by CENTER node — one keyed
    shuffle, per-partition vectorized neighbor-pair explosion (bounded by
    k² per node); (3) one keyed shuffle co-locating wedges with edges on
    the closing pair (a,b) — a partition-local polars join counts
    closures.  Every triangle closes at exactly 3 corners → total/3."""
    import polars as pl

    from ..stages.groupagg import grouped_aggregate
    from ..stages.keyed import keyed_partition_map

    nn = knn_graph(sf_dir, k=k).to_pandas()
    a = np.minimum(nn["vec_id"].to_numpy(np.int64),
                   nn["neighbor_id"].to_numpy(np.int64))
    b = np.maximum(nn["vec_id"].to_numpy(np.int64),
                   nn["neighbor_id"].to_numpy(np.int64))
    edges = pd.DataFrame({"a": a, "b": b}).drop_duplicates()
    import ray

    edge_ds = ray.data.from_pandas(edges)
    n_edges = len(edges)

    def wedges(t: pa.Table) -> pa.Table:
        # partition holds every edge touching its center nodes twice
        # (emitted once per endpoint below); here t IS (c, n) adjacency rows
        df = pl.from_arrow(t)
        j = df.join(df, on="c", suffix="_r").filter(pl.col("n") < pl.col("n_r"))
        return (j.rename({"n": "a", "n_r": "b"})
                .select("a", "b").with_columns(w=pl.lit(1, dtype=pl.Int64))
                .group_by(["a", "b"]).agg(w=pl.col("w").sum()).to_arrow())

    def both_dirs(t: pa.Table) -> pa.Table:
        aa = np.asarray(t.column("a").combine_chunks()).astype(np.int64)
        bb = np.asarray(t.column("b").combine_chunks()).astype(np.int64)
        return pa.table({"c": pa.array(np.concatenate([aa, bb])),
                         "n": pa.array(np.concatenate([bb, aa]))})

    adj = edge_ds.map_batches(both_dirs, batch_format="pyarrow",
                              zero_copy_batch=True)
    wedge_ds = keyed_partition_map(adj, ["c"], wedges)

    def close_kernel(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        w = df.filter(pl.col("kind") == 0)
        e = df.filter(pl.col("kind") == 1).select("a", "b")
        closed = w.join(e, on=["a", "b"])
        return pa.table({"tri3": pa.array(
            [int(closed.get_column("w").sum()) if closed.height else 0],
            type=pa.int64())})

    tagged_w = wedge_ds.map_batches(
        lambda t: t.append_column("kind", pa.array(np.zeros(t.num_rows, np.int64))),
        batch_format="pyarrow", zero_copy_batch=True)
    tagged_e = edge_ds.map_batches(
        lambda t: pa.table({"a": t.column("a"), "b": t.column("b"),
                            "w": pa.array(np.ones(t.num_rows, np.int64)),
                            "kind": pa.array(np.ones(t.num_rows, np.int64))}),
        batch_format="pyarrow", zero_copy_batch=True)
    merged = tagged_w.union(tagged_e)
    parts = keyed_partition_map(merged, ["a", "b"], close_kernel).to_pandas()
    tri = int(parts["tri3"].sum()) // 3
    return pa.table({"n_edges": pa.array([n_edges], type=pa.int64()),
                     "n_triangles": pa.array([tri], type=pa.int64())})


SQL["knn_triangle_count"] = (
    "WITH sims AS ( "
    "  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id, "
    "         ROUND(list_cosine_similarity(a.embedding, b.embedding), 9) AS sim "
    "  FROM embeddings a CROSS JOIN embeddings b WHERE a.vec_id <> b.vec_id), "
    "ranked AS ( "
    "  SELECT vec_id, neighbor_id, "
    "         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, neighbor_id) AS rank "
    "  FROM sims), "
    "e AS (SELECT DISTINCT LEAST(vec_id, neighbor_id) AS a, "
    "GREATEST(vec_id, neighbor_id) AS b FROM ranked WHERE rank <= 3), "
    "t AS (SELECT COUNT(*) AS tri FROM e e1 "
    "JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b "
    "JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b) "
    "SELECT (SELECT COUNT(*) FROM e) AS n_edges, "
    "CAST(tri AS BIGINT) AS n_triangles FROM t"
)


def embedding_dbscan(sf_dir: str, *, eps_sim: float = 0.33,
                     min_neighbors: int = 3) -> pa.Table:
    """DBSCAN over the embedding column — density clustering with cosine
    similarity ≥ ``eps_sim`` as the eps-neighborhood (the clustering mode
    SemDeDup-style corpus curation uses when cluster SHAPE matters more
    than a global threshold): a point is CORE if ≥ ``min_neighbors`` other
    points sit in its neighborhood; clusters are the connected components
    of the core-core eps-graph (label = min core vec_id — canonical, scan-
    order-free); a non-core point with a core neighbor is BORDER and joins
    the cluster of its minimum-id core neighbor (the deterministic stand-in
    for DBSCAN's arbitrary scan-order assignment); everything else is NOISE
    (cluster −1).  Distributed shape: ONE broadcast-matrix streaming pass
    (the ``knn_graph`` convention — matrix ``ray.put`` once, one matmul per
    batch) emits only the eps-edges, which are output-sized at clustering-
    grade eps; neighbor counts, the core set, and components all derive
    from that edge list (union-find below the edge threshold, the
    hash-to-min ``stages/cc.connected_components`` above it — the
    ``near_dup_canonical`` switch).  At ≫10⁷ vectors swap edge generation
    to the banded LSH index exactly as ``knn_graph`` documents; everything
    downstream consumes (a, b) edges unchanged.  Sims rounded to 9 dp
    before thresholding so the result equals the SQL oracle (recursive-CTE
    reachability) row-for-row."""
    import ray

    from ..stages.ann import load_embedding_matrix
    from .dedup import _union_find

    ids, mat = load_embedding_matrix(sf_dir)
    ref = ray.put((ids, mat))
    ds = read(sf_dir, "embeddings", ["vec_id", "embedding"])

    class EpsEdges:
        def __init__(self, corpus_ref, eps):
            c = ray.get(corpus_ref) if isinstance(corpus_ref, ray.ObjectRef) else corpus_ref
            self.cids, self.cmat = c
            self.eps = eps

        def __call__(self, batch: pa.Table) -> pa.Table:
            vid = np.asarray(batch.column("vec_id"), dtype=np.int64)
            emb = batch_embeddings(batch)
            emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
            sims = np.round(emb @ self.cmat.T, 9)
            hit = (sims >= self.eps) & (vid[:, None] != self.cids[None, :])
            ri, ci = np.nonzero(hit)
            return pa.table({"va": pa.array(vid[ri]),
                             "vb": pa.array(self.cids[ci])})

    edges = (ds.map_batches(EpsEdges, fn_constructor_args=(ref, eps_sim),
                            batch_format="pyarrow", batch_size=4096,
                            concurrency=(1, 8))
             .to_pandas())  # output-sized: eps-edge list only
    va = edges["va"].to_numpy(np.int64) if len(edges) else np.empty(0, np.int64)
    vb = edges["vb"].to_numpy(np.int64) if len(edges) else np.empty(0, np.int64)
    uniq, cnt = np.unique(va, return_counts=True)
    core_ids = uniq[cnt >= min_neighbors]  # sorted
    core_a = np.isin(va, core_ids)
    core_b = np.isin(vb, core_ids)
    cc_mask = core_a & core_b
    comp = _union_find(va[cc_mask], vb[cc_mask])  # {core: min core in comp}
    label = {int(v): int(c) for v, c in comp.items()}
    for v in core_ids[~np.isin(core_ids, va[cc_mask])].tolist():
        label[int(v)] = int(v)  # isolated-from-other-cores: own cluster
    # border: non-core with ≥1 core neighbor → cluster of MIN core neighbor
    bmask = ~core_a & core_b
    border: dict[int, int] = {}
    if bmask.any():
        mn = (pd.DataFrame({"v": va[bmask], "n": vb[bmask]})
              .groupby("v")["n"].min())
        border = {int(v): label[int(n)] for v, n in mn.items()}
    sids = np.sort(ids)
    role = np.full(len(sids), "noise", dtype=object)
    cluster = np.full(len(sids), -1, dtype=np.int64)

    def assign(mapping: dict[int, int], name: str) -> None:
        if not mapping:
            return
        keys = np.fromiter(mapping.keys(), np.int64, len(mapping))
        vals = np.fromiter(mapping.values(), np.int64, len(mapping))
        o = np.argsort(keys)
        keys, vals = keys[o], vals[o]
        pos = np.searchsorted(sids, keys)  # every key is a real vec_id
        role[pos] = name
        cluster[pos] = vals

    assign(border, "border")
    assign(label, "core")  # core wins if a point is somehow in both
    return pa.table({"vec_id": pa.array(sids),
                     "role": pa.array(role.tolist(), type=pa.string()),
                     "cluster": pa.array(cluster)})


SQL["embedding_dbscan"] = (
    "WITH RECURSIVE sim AS ( "
    "  SELECT a.vec_id AS va, b.vec_id AS vb FROM embeddings a JOIN embeddings b "
    "  ON a.vec_id <> b.vec_id "
    "  AND ROUND(list_cosine_similarity(a.embedding, b.embedding), 9) >= 0.33), "
    "cnt AS (SELECT va AS v, COUNT(*) AS c FROM sim GROUP BY 1), "
    "core AS (SELECT v FROM cnt WHERE c >= 3), "
    "ce AS (SELECT s.va, s.vb FROM sim s JOIN core x ON s.va = x.v "
    "JOIN core y ON s.vb = y.v), "
    "reach(a, b) AS (SELECT v, v FROM core UNION "
    "  SELECT r.a, e.vb FROM reach r JOIN ce e ON e.va = r.b), "
    "lbl AS (SELECT a AS v, MIN(b) AS cl FROM reach GROUP BY 1), "
    "border AS (SELECT s.va AS v, MIN(s.vb) AS mnbr FROM sim s "
    "  JOIN core c ON s.vb = c.v LEFT JOIN core k ON s.va = k.v "
    "  WHERE k.v IS NULL GROUP BY s.va), "
    "bl AS (SELECT border.v, lbl.cl FROM border JOIN lbl ON lbl.v = border.mnbr) "
    "SELECT e.vec_id, "
    "CASE WHEN l.cl IS NOT NULL THEN 'core' "
    "     WHEN bl.cl IS NOT NULL THEN 'border' ELSE 'noise' END AS role, "
    "CAST(COALESCE(l.cl, bl.cl, -1) AS BIGINT) AS cluster "
    "FROM embeddings e LEFT JOIN lbl l ON l.v = e.vec_id "
    "LEFT JOIN bl ON bl.v = e.vec_id ORDER BY e.vec_id"
)


def label_similarity_stats(sf_dir: str) -> pa.Table:
    """Exact mean pairwise cosine WITHIN and BETWEEN embedding labels —
    the cluster-cohesion / separation audit (are labels tight? which two
    bleed into each other?) — computed WITHOUT materializing a single
    pair: for L2-normalized vectors, Σᵢ∈A Σⱼ∈B cos(vᵢ,vⱼ) = S_A · S_B
    where S_X is X's vector SUM, so mean intra-label cosine over distinct
    pairs is (‖S_A‖² − n_A)/(n_A² − n_A) and mean inter-label cosine is
    S_A·S_B/(n_A·n_B).  The distributed plan is therefore ONE
    combiner-first pass: per-batch (label, count, partial sum vector)
    rows — |labels|·d floats per batch, never a pair — folded driver-side
    (label-count-sized).  O(N·d) total for what naive pair enumeration
    makes O(N²·d); the identity is exact, 6-dp rounded only to absorb
    sum-order jitter vs the SQL mirror (``char_entropy`` precedent)."""
    ds = read(sf_dir, "embeddings", ["label", "embedding"])

    def partials(batch: pa.Table) -> pa.Table:
        lab = np.asarray(batch.column("label")).astype(np.int64)
        emb = batch_embeddings(batch)
        emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        ul, inv = np.unique(lab, return_inverse=True)
        sums = np.zeros((len(ul), emb.shape[1]), dtype=np.float64)
        np.add.at(sums, inv, emb)
        return pa.table({"label": pa.array(ul),
                         "n": pa.array(np.bincount(inv).astype(np.int64)),
                         "s": pa.array(list(sums),
                                       type=pa.list_(pa.float64()))})

    parts = ds.map_batches(partials, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    labs = np.sort(parts["label"].unique()).astype(np.int64)
    d = len(parts["s"].iloc[0])
    S = np.zeros((len(labs), d))
    n = np.zeros(len(labs), dtype=np.int64)
    for _, row in parts.iterrows():  # label-count-sized fold
        i = int(np.searchsorted(labs, row["label"]))
        S[i] += np.asarray(row["s"])
        n[i] += int(row["n"])
    out_a, out_b, out_np, out_c = [], [], [], []
    for i in range(len(labs)):
        for j in range(i, len(labs)):
            dot = float(S[i] @ S[j])
            if i == j:
                npairs = int(n[i]) * (int(n[i]) - 1) // 2
                mc = (dot - n[i]) / (int(n[i]) ** 2 - int(n[i])) if n[i] > 1 else 0.0
            else:
                npairs = int(n[i]) * int(n[j])
                mc = dot / (int(n[i]) * int(n[j]))
            out_a.append(int(labs[i]))
            out_b.append(int(labs[j]))
            out_np.append(npairs)
            out_c.append(round(mc, 6))
    return pa.table({"label_a": pa.array(out_a, type=pa.int64()),
                     "label_b": pa.array(out_b, type=pa.int64()),
                     "n_pairs": pa.array(out_np, type=pa.int64()),
                     "mean_cos": pa.array(out_c, type=pa.float64())})


SQL["label_similarity_stats"] = (
    "WITH v AS (SELECT vec_id, label, embedding, "
    "SQRT(list_sum(list_transform(embedding, "
    "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm FROM embeddings), "
    "u AS (SELECT vec_id, label, CAST(g.i AS BIGINT) AS dim, "
    "CAST(embedding[CAST(g.i AS BIGINT)] AS DOUBLE) / nrm AS x "
    "FROM v, LATERAL UNNEST(range(1, len(embedding) + 1)) AS g(i)), "
    "s AS (SELECT label, dim, SUM(x) AS sx FROM u GROUP BY 1, 2), "
    "c AS (SELECT label, COUNT(*) AS n FROM embeddings GROUP BY 1), "
    "dot AS (SELECT a.label AS la, b.label AS lb, SUM(a.sx * b.sx) AS d "
    "FROM s a JOIN s b ON a.dim = b.dim AND a.label <= b.label GROUP BY 1, 2) "
    "SELECT CAST(la AS BIGINT) AS label_a, CAST(lb AS BIGINT) AS label_b, "
    "CAST(CASE WHEN la = lb THEN ca.n * (ca.n - 1) // 2 "
    "ELSE ca.n * cb.n END AS BIGINT) AS n_pairs, "
    "ROUND(CASE WHEN la = lb THEN "
    "CASE WHEN ca.n > 1 THEN (d - ca.n) / (ca.n * ca.n - ca.n) ELSE 0.0 END "
    "ELSE d / (ca.n * cb.n) END, 6) AS mean_cos "
    "FROM dot JOIN c ca ON ca.label = dot.la JOIN c cb ON cb.label = dot.lb "
    "ORDER BY label_a, label_b"
)


def embedding_outliers(sf_dir: str, *, k: int = 3) -> pa.Table:
    """Per-label OUTLIER detection — the mislabeled-point / junk-vector
    audit: each vector's cosine to its own label's centroid direction
    (cos(v̂, S_L) = v̂·S_L/‖S_L‖ over the label's normalized-vector sum
    S_L), flagging the ``k`` LOWEST per label.  Two passes, no pairs:
    (1) the combiner-first (label, n, Σv̂) partials (shared shape with
    ``label_similarity_stats``) folded driver-side and broadcast once via
    ``ray.put``; (2) a streaming scoring pass — one gather + row-wise dot
    per batch, emitting (label, vec_id, cos) — followed by an
    output-sized bottom-k per label (a grouped top-k at scale).  Cosines
    are 6-dp rounded BEFORE ranking with a vec_id tie-break, so the
    ranking is the oracle's row-for-row."""
    import ray

    ds = read(sf_dir, "embeddings", ["label", "vec_id", "embedding"])

    def partials(batch: pa.Table) -> pa.Table:
        lab = np.asarray(batch.column("label")).astype(np.int64)
        emb = batch_embeddings(batch)
        emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        ul, inv = np.unique(lab, return_inverse=True)
        sums = np.zeros((len(ul), emb.shape[1]), dtype=np.float64)
        np.add.at(sums, inv, emb)
        return pa.table({"label": pa.array(ul),
                         "s": pa.array(list(sums),
                                       type=pa.list_(pa.float64()))})

    parts = ds.map_batches(partials, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    labs = np.sort(parts["label"].unique()).astype(np.int64)
    d = len(parts["s"].iloc[0])
    S = np.zeros((len(labs), d))
    for _, row in parts.iterrows():  # label-count-sized fold
        S[int(np.searchsorted(labs, row["label"]))] += np.asarray(row["s"])
    ref = ray.put((labs, S, np.linalg.norm(S, axis=1)))

    class ScoreCos:
        def __init__(self, r):
            self.labs, self.S, self.norms = ray.get(r) \
                if isinstance(r, ray.ObjectRef) else r

        def __call__(self, batch: pa.Table) -> pa.Table:
            lab = np.asarray(batch.column("label")).astype(np.int64)
            vid = np.asarray(batch.column("vec_id")).astype(np.int64)
            emb = batch_embeddings(batch)
            emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
            idx = np.searchsorted(self.labs, lab)
            cos = np.round(
                np.einsum("ij,ij->i", emb, self.S[idx]) / self.norms[idx], 6)
            return pa.table({"label": pa.array(lab), "vec_id": pa.array(vid),
                             "cos_to_centroid": pa.array(cos)})

    cos = ds.map_batches(ScoreCos, fn_constructor_args=(ref,),
                         batch_format="pyarrow",
                         concurrency=(1, 8)).to_pandas()
    cos = cos.sort_values(["label", "cos_to_centroid", "vec_id"])
    cos["rk"] = cos.groupby("label").cumcount() + 1
    out = cos[cos["rk"] <= k].reset_index(drop=True)
    out["rk"] = out["rk"].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


SQL["embedding_outliers"] = (
    "WITH v AS (SELECT vec_id, label, embedding, "
    "SQRT(list_sum(list_transform(embedding, "
    "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm FROM embeddings), "
    "u AS (SELECT vec_id, label, CAST(g.i AS BIGINT) AS dim, "
    "CAST(embedding[CAST(g.i AS BIGINT)] AS DOUBLE) / nrm AS x "
    "FROM v, LATERAL UNNEST(range(1, len(embedding) + 1)) AS g(i)), "
    "s AS (SELECT label, dim, SUM(x) AS sx FROM u GROUP BY 1, 2), "
    "sn AS (SELECT label, SQRT(SUM(sx * sx)) AS snorm FROM s GROUP BY 1), "
    "dt AS (SELECT u.vec_id, u.label, SUM(u.x * s.sx) AS dot "
    "FROM u JOIN s ON s.label = u.label AND s.dim = u.dim GROUP BY 1, 2), "
    "c AS (SELECT dt.vec_id, dt.label, ROUND(dot / snorm, 6) AS cos_to_centroid "
    "FROM dt JOIN sn ON sn.label = dt.label), "
    "r AS (SELECT *, ROW_NUMBER() OVER "
    "(PARTITION BY label ORDER BY cos_to_centroid, vec_id) AS rk FROM c) "
    "SELECT CAST(label AS BIGINT) AS label, vec_id, cos_to_centroid, "
    "CAST(rk AS BIGINT) AS rk FROM r WHERE rk <= 3 ORDER BY label, rk"
)


def knn_label_purity(sf_dir: str, *, k: int = 3) -> pa.Table:
    """k-NN LABEL PURITY per class — the standard embedding-space quality
    metric (does the space cluster by label?): for every vector, the
    fraction of its exact cosine k-NN sharing its label, aggregated per
    label as integer bps (10000·matches // (n·k)) — float-free, so the
    oracle comparison is exact.  Composition: the distributed
    ``knn_graph`` (broadcast matrix, streamed batches, 9-dp ranking
    convention) → one label join on the |corpus|·k-row NN table (pandas
    here — output-sized; a keyed co-shuffle at scale, exactly like
    ``mutual_nn_pairs``'s reciprocity join)."""
    nn = knn_graph(sf_dir, k=k).to_pandas()
    lab = read(sf_dir, "embeddings", ["vec_id", "label"]).to_pandas()
    lab["label"] = lab["label"].astype(np.int64)
    m = (nn.merge(lab, on="vec_id")
         .merge(lab.rename(columns={"vec_id": "neighbor_id",
                                    "label": "nlabel"}), on="neighbor_id"))
    m["match"] = (m["label"] == m["nlabel"]).astype(np.int64)
    agg = (m.groupby("label", sort=True)
           .agg(n_edges=("match", "size"), n_matches=("match", "sum"))
           .reset_index())
    agg["purity_bps"] = (10000 * agg["n_matches"].to_numpy(np.int64)) \
        // agg["n_edges"].to_numpy(np.int64)
    agg["n_vecs"] = (agg["n_edges"] // k).astype(np.int64)
    out = agg[["label", "n_vecs", "n_matches", "purity_bps"]]
    out = out.astype({"label": np.int64, "n_matches": np.int64})
    return pa.Table.from_pandas(out.reset_index(drop=True),
                                preserve_index=False)


SQL["knn_label_purity"] = (
    "WITH sims AS ( "
    "  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id, "
    "         ROUND(list_cosine_similarity(a.embedding, b.embedding), 9) AS sim "
    "  FROM embeddings a CROSS JOIN embeddings b WHERE a.vec_id <> b.vec_id), "
    "ranked AS ( "
    "  SELECT vec_id, neighbor_id, "
    "         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, neighbor_id) AS rank "
    "  FROM sims), "
    "nn AS (SELECT vec_id, neighbor_id FROM ranked WHERE rank <= 3), "
    "j AS (SELECT la.label, "
    "CASE WHEN la.label = lb.label THEN 1 ELSE 0 END AS m "
    "FROM nn JOIN embeddings la ON la.vec_id = nn.vec_id "
    "JOIN embeddings lb ON lb.vec_id = nn.neighbor_id) "
    "SELECT CAST(label AS BIGINT) AS label, "
    "CAST(COUNT(*) // 3 AS BIGINT) AS n_vecs, "
    "CAST(SUM(m) AS BIGINT) AS n_matches, "
    "CAST(10000 * SUM(m) AS BIGINT) // COUNT(*) AS purity_bps "
    "FROM j GROUP BY 1 ORDER BY label"
)


def hard_negative_mining(sf_dir: str) -> pa.Table:
    """HARD-NEGATIVE mining for contrastive training: each vector's single
    most-similar vector with a DIFFERENT label — the pair a triplet/InfoNCE
    loss most needs and random negatives almost never supply.  Same
    distributed shape as ``knn_graph`` (matrix broadcast once, one matmul
    per streamed batch) with the same-label columns masked to −inf before
    the argmax; ranking follows the 9-dp + id tie-break convention and the
    output is id/label-only (floats stay out of the comparison surface).
    At ≫10⁷ vectors candidate generation swaps to the banded LSH index
    exactly as ``knn_graph`` documents — the masked scoring kernel is
    unchanged."""
    import ray

    from ..stages.ann import load_embedding_matrix

    ids, mat = load_embedding_matrix(sf_dir)
    lab_df = read(sf_dir, "embeddings", ["vec_id", "label"]).to_pandas()
    labs = (lab_df.set_index("vec_id")["label"]
            .reindex(ids).to_numpy().astype(np.int64))
    ref = ray.put((ids, mat, labs))
    ds = read(sf_dir, "embeddings", ["vec_id", "label", "embedding"])

    class HardNeg:
        def __init__(self, corpus_ref):
            c = ray.get(corpus_ref) if isinstance(corpus_ref, ray.ObjectRef) else corpus_ref
            self.cids, self.cmat, self.clabs = c

        def __call__(self, batch: pa.Table) -> pa.Table:
            vid = np.asarray(batch.column("vec_id"), dtype=np.int64)
            lab = np.asarray(batch.column("label"), dtype=np.int64)
            emb = batch_embeddings(batch)
            emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
            sims = np.round(emb @ self.cmat.T, 9)
            sims[lab[:, None] == self.clabs[None, :]] = -np.inf
            cids2 = np.broadcast_to(self.cids, sims.shape)
            pick = np.lexsort((cids2, -sims), axis=1)[:, 0]
            neg = np.take_along_axis(cids2, pick[:, None], axis=1)[:, 0]
            return pa.table({
                "vec_id": pa.array(vid),
                "label": pa.array(lab),
                "hard_negative_id": pa.array(neg),
                "neg_label": pa.array(self.clabs[
                    np.searchsorted(self.cids, neg)
                    if not np.array_equal(self.cids,
                                          np.arange(len(self.cids)))
                    else neg]),
            })

    out = ds.map_batches(HardNeg, fn_constructor_args=(ref,),
                         batch_format="pyarrow", batch_size=4096,
                         concurrency=(1, 8)).to_pandas()
    out = out.sort_values("vec_id").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


SQL["hard_negative_mining"] = (
    "WITH sims AS ( "
    "  SELECT a.vec_id, a.label, b.vec_id AS nid, b.label AS nlabel, "
    "         ROUND(list_cosine_similarity(a.embedding, b.embedding), 9) AS sim "
    "  FROM embeddings a CROSS JOIN embeddings b "
    "  WHERE a.label <> b.label), "
    "r AS (SELECT vec_id, label, nid, nlabel, "
    "ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, nid) AS rk "
    "FROM sims) "
    "SELECT vec_id, CAST(label AS BIGINT) AS label, "
    "nid AS hard_negative_id, CAST(nlabel AS BIGINT) AS neg_label "
    "FROM r WHERE rk = 1 ORDER BY vec_id"
)


def triplet_margin_mining(sf_dir: str) -> pa.Table:
    """TRIPLET mining for metric learning: per anchor vector, the nearest
    SAME-label positive (self excluded) and the hardest OTHER-label
    negative — ``hard_negative_mining``'s broadcast-matmul shape run with
    both masks in one pass — plus the triplet margin (pos_sim − neg_sim).
    Negative margins mark the "violating" triplets a margin loss trains
    on.  Margins ship as exact integer nano-units: both sims are 9-dp
    multiples, so their difference scaled by 10⁹ is integral and
    nearest-int rounding is representation-error-proof — no float column
    crosses the comparison surface.  Anchors whose label has no second
    member have no positive and are dropped (mirrored in the oracle)."""
    import ray

    from ..stages.ann import load_embedding_matrix

    ids, mat = load_embedding_matrix(sf_dir)
    lab_df = read(sf_dir, "embeddings", ["vec_id", "label"]).to_pandas()
    labs = (lab_df.set_index("vec_id")["label"]
            .reindex(ids).to_numpy().astype(np.int64))
    ref = ray.put((ids, mat, labs))
    ds = read(sf_dir, "embeddings", ["vec_id", "label", "embedding"])

    class Mine:
        def __init__(self, corpus_ref):
            c = ray.get(corpus_ref) if isinstance(corpus_ref, ray.ObjectRef) else corpus_ref
            self.cids, self.cmat, self.clabs = c

        def __call__(self, batch: pa.Table) -> pa.Table:
            vid = np.asarray(batch.column("vec_id"), dtype=np.int64)
            lab = np.asarray(batch.column("label"), dtype=np.int64)
            emb = batch_embeddings(batch)
            emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
            sims = np.round(emb @ self.cmat.T, 9)
            cids2 = np.broadcast_to(self.cids, sims.shape)
            same = lab[:, None] == self.clabs[None, :]
            s_pos = np.where(same & (cids2 != vid[:, None]), sims, -np.inf)
            s_neg = np.where(~same, sims, -np.inf)
            ppick = np.lexsort((cids2, -s_pos), axis=1)[:, 0]
            npick = np.lexsort((cids2, -s_neg), axis=1)[:, 0]
            rows = np.arange(len(vid))
            pos_sim = s_pos[rows, ppick]
            keep = np.isfinite(pos_sim)
            # both engines' sims are 9-dp multiples, so the difference
            # scaled by 1e9 sits within float-eps of an integer — nearest-
            # int is exact where a floor would straddle representation
            # error at the boundary
            margin = np.rint(
                (pos_sim[keep] - s_neg[rows, npick][keep]) * 1e9
            ).astype(np.int64)
            return pa.table({
                "vec_id": pa.array(vid[keep]),
                "label": pa.array(lab[keep]),
                "pos_id": pa.array(cids2[rows, ppick][keep]),
                "neg_id": pa.array(cids2[rows, npick][keep]),
                "margin_e9": pa.array(margin),
            })

    out = ds.map_batches(Mine, fn_constructor_args=(ref,),
                         batch_format="pyarrow", batch_size=4096,
                         concurrency=(1, 8)).to_pandas()
    out = out.sort_values("vec_id").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


SQL["triplet_margin_mining"] = (
    "WITH s AS ( "
    "  SELECT a.vec_id, a.label, b.vec_id AS nid, "
    "         a.label = b.label AS same, "
    "         ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
    "CAST(b.embedding AS DOUBLE[])), 9) AS sim "
    "  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id), "
    "p AS (SELECT vec_id, label, nid, sim, ROW_NUMBER() OVER ("
    "PARTITION BY vec_id ORDER BY sim DESC, nid) AS rk "
    "FROM s WHERE same), "
    "n AS (SELECT vec_id, nid, sim, ROW_NUMBER() OVER ("
    "PARTITION BY vec_id ORDER BY sim DESC, nid) AS rk "
    "FROM s WHERE NOT same) "
    "SELECT p.vec_id, CAST(p.label AS BIGINT) AS label, "
    "p.nid AS pos_id, n.nid AS neg_id, "
    "CAST(ROUND((p.sim - n.sim) * 1000000000, 0) AS BIGINT) AS margin_e9 "
    "FROM p JOIN n ON n.vec_id = p.vec_id AND n.rk = 1 "
    "WHERE p.rk = 1 ORDER BY p.vec_id"
)


def embedding_hubness(sf_dir: str, *, k: int = 10) -> pa.Table:
    """HUBNESS audit of the embedding space: each vector's IN-degree in
    the exact cosine k-NN graph — the high-dimensional pathology detector
    (hub points that appear in everyone's neighbor lists poison
    retrieval and kNN classification).  Reuses ``knn_graph``'s
    broadcast-matmul + per-batch top-k shape (same 9-dp + id tie-break),
    then ONE combiner-first count on neighbor_id; the distribution
    summary (n_vectors per in-degree) is a degree-scale fold.  Output is
    the per-in-degree histogram plus antihub (in-degree 0) mass, all
    integers."""
    g = knn_graph(sf_dir, k=k)
    import polars as pl

    deg = (pl.from_arrow(g).group_by("neighbor_id")
           .agg(indeg=pl.len().cast(pl.Int64)))
    n_total = len(pl.from_arrow(g)["vec_id"].unique())
    hist = (deg.group_by("indeg").agg(n_vectors=pl.len().cast(pl.Int64))
            .sort("indeg"))
    antihubs = n_total - len(deg)
    out = hist.to_pandas()
    if antihubs > 0:
        out = pd.concat([pd.DataFrame({"indeg": [0],
                                       "n_vectors": [antihubs]}), out],
                        ignore_index=True)
    out["indeg"] = out["indeg"].astype(np.int64)
    out["n_vectors"] = out["n_vectors"].astype(np.int64)
    out = out.sort_values("indeg").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


SQL["embedding_hubness"] = (
    "WITH sims AS ( "
    "  SELECT a.vec_id, b.vec_id AS nid, "
    "         ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
    "CAST(b.embedding AS DOUBLE[])), 9) AS sim "
    "  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id), "
    "r AS (SELECT vec_id, nid, ROW_NUMBER() OVER ("
    "PARTITION BY vec_id ORDER BY sim DESC, nid) AS rk FROM sims), "
    "deg AS (SELECT nid, COUNT(*) AS indeg FROM r WHERE rk <= 10 "
    "GROUP BY 1), "
    "alldeg AS (SELECT e.vec_id, COALESCE(deg.indeg, 0) AS indeg "
    "FROM embeddings e LEFT JOIN deg ON deg.nid = e.vec_id) "
    "SELECT CAST(indeg AS BIGINT) AS indeg, COUNT(*) AS n_vectors "
    "FROM alldeg GROUP BY 1 ORDER BY 1"
)


def embedding_scalar_quant(sf_dir: str) -> pa.Table:
    """Scalar INT8-style quantization audit: embeddings quantized to
    8-bit codes against global per-corpus min/max, summarized per label —
    code mass, zero/saturated-code counts (the clipping diagnostic that
    decides whether int8 serving is safe) and total values.  Two
    streaming passes: a tiny global min/max reduce, then one
    ``map_batches`` quantize + per-label integer partials.  Codes are
    ``floor(z·255 + 0.5)`` on the SAME double expression both engines
    evaluate from float32-exact inputs, so every output column is an
    exact integer — no float crosses the comparison surface."""
    from ..stages.groupagg import grouped_aggregate

    ds = read(sf_dir, "embeddings", ["label", "embedding"])

    def minmax(batch: pa.Table) -> pa.Table:
        emb = batch_embeddings(batch)
        return pa.table({"lo": pa.array([float(emb.min())]),
                         "hi": pa.array([float(emb.max())])})

    mm = ds.map_batches(minmax, batch_format="pyarrow",
                        zero_copy_batch=True).to_pandas()
    lo, hi = float(mm["lo"].min()), float(mm["hi"].max())

    def quant(batch: pa.Table) -> pa.Table:
        import polars as pl

        lab = np.asarray(batch.column("label"), dtype=np.int64)
        emb = batch_embeddings(batch)
        z = (emb - lo) / (hi - lo)
        q = np.floor(z * 255.0 + 0.5).astype(np.int64)
        df = pl.DataFrame({
            "label": np.repeat(lab, emb.shape[1]),
            "q": q.reshape(-1),
        })
        return (df.group_by("label")
                .agg(n_values=pl.len().cast(pl.Int64),
                     sum_codes=pl.col("q").sum(),
                     n_zero=(pl.col("q") == 0).sum().cast(pl.Int64),
                     n_sat=(pl.col("q") == 255).sum().cast(pl.Int64))
                .to_arrow())

    out = grouped_aggregate(
        ds.map_batches(quant, batch_format="pyarrow", zero_copy_batch=True),
        ["label"],
        [("n_values", "sum", "n_values"), ("sum_codes", "sum", "sum_codes"),
         ("n_zero", "sum", "n_zero"), ("n_sat", "sum", "n_sat")],
    ).to_pandas()
    out["label"] = out["label"].astype(np.int64)
    out = out.sort_values("label").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


SQL["embedding_scalar_quant"] = (
    "WITH v AS (SELECT CAST(label AS BIGINT) AS label, "
    "CAST(UNNEST(embedding) AS DOUBLE) AS x FROM embeddings), "
    "mm AS (SELECT MIN(x) AS lo, MAX(x) AS hi FROM v), "
    "q AS (SELECT label, "
    "CAST(FLOOR((x - lo) / (hi - lo) * 255 + 0.5) AS BIGINT) AS q "
    "FROM v, mm) "
    "SELECT label, COUNT(*) AS n_values, "
    "CAST(SUM(q) AS BIGINT) AS sum_codes, "
    "CAST(SUM(CASE WHEN q = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero, "
    "CAST(SUM(CASE WHEN q = 255 THEN 1 ELSE 0 END) AS BIGINT) AS n_sat "
    "FROM q GROUP BY 1 ORDER BY 1"
)


def knn_classifier_eval(sf_dir: str, *, k: int = 5) -> pa.Table:
    """Leave-one-out k-NN CLASSIFIER evaluation over the embedding table:
    each vector is classified by majority vote of its k nearest
    neighbors' labels (ties → smallest label), and accuracy is reported
    per true label in exact basis points — the standard embedding-quality
    eval that tells you whether the space separates classes.  Reuses
    ``knn_graph``'s broadcast-matmul candidate generation (same 9-dp +
    id tie-break); the vote and the accuracy fold are vectorized
    group-bys over the output-sized edge list."""
    import polars as pl

    g = pl.from_arrow(knn_graph(sf_dir, k=k))
    labs = read(sf_dir, "embeddings", ["vec_id", "label"]).to_pandas()
    labs["label"] = labs["label"].astype(np.int64)
    ldf = pl.from_pandas(labs)
    votes = (g.join(ldf.rename({"vec_id": "neighbor_id",
                                "label": "nlabel"}), on="neighbor_id")
             .group_by(["vec_id", "nlabel"])
             .agg(c=pl.len().cast(pl.Int64))
             .sort(["vec_id", "c", "nlabel"],
                   descending=[False, True, False])
             .group_by("vec_id", maintain_order=True)
             .agg(pred=pl.col("nlabel").first()))
    ev = (votes.join(ldf, on="vec_id")
          .with_columns(ok=(pl.col("pred") == pl.col("label"))
                        .cast(pl.Int64)))
    acc = (ev.group_by("label")
           .agg(n_vectors=pl.len().cast(pl.Int64),
                n_correct=pl.col("ok").sum())
           .with_columns(accuracy_bps=(10000 * pl.col("n_correct"))
                         // pl.col("n_vectors"))
           .sort("label"))
    return acc.to_arrow()


SQL["knn_classifier_eval"] = (
    "WITH sims AS ( "
    "  SELECT a.vec_id, a.label AS tlabel, b.vec_id AS nid, "
    "         CAST(b.label AS BIGINT) AS nlabel, "
    "         ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
    "CAST(b.embedding AS DOUBLE[])), 9) AS sim "
    "  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id), "
    "r AS (SELECT vec_id, tlabel, nlabel, ROW_NUMBER() OVER ("
    "PARTITION BY vec_id ORDER BY sim DESC, nid) AS rk FROM sims), "
    "v AS (SELECT vec_id, tlabel, nlabel, COUNT(*) AS c "
    "FROM r WHERE rk <= 5 GROUP BY 1, 2, 3), "
    "p AS (SELECT vec_id, tlabel, nlabel, ROW_NUMBER() OVER ("
    "PARTITION BY vec_id ORDER BY c DESC, nlabel) AS pr FROM v) "
    "SELECT CAST(tlabel AS BIGINT) AS label, COUNT(*) AS n_vectors, "
    "CAST(SUM(CASE WHEN nlabel = tlabel THEN 1 ELSE 0 END) AS BIGINT) "
    "AS n_correct, "
    "CAST(10000 * SUM(CASE WHEN nlabel = tlabel THEN 1 ELSE 0 END) "
    "// COUNT(*) AS BIGINT) AS accuracy_bps "
    "FROM p WHERE pr = 1 GROUP BY 1 ORDER BY 1"
)


def embedding_norm_quantiles(sf_dir: str) -> pa.Table:
    """Per-label L2-NORM profile of the embedding column — the
    magnitude-drift audit run before cosine vs dot-product retrieval
    decisions (unnormalized encoders leak document length into norms).
    One map_batches computes ‖v‖₂ in float64 from the flattened Arrow
    values buffer (no per-row Python), rounded to 6 dp BEFORE the
    order-statistic fold so both engines aggregate identical doubles;
    then ONE keyed exchange on label and a per-label sort+gather kernel
    emits min / disc-median / max (quantile_disc convention
    sorted[ceil(q·n)−1], ``winsorized_value_stats`` precedent). The
    exchange carries (label, norm) pairs — 16 bytes/vector."""
    from ..stages.keyed import keyed_partition_map

    ds = read(sf_dir, "embeddings", ["label", "embedding"])

    def norms(batch: pa.Table) -> pa.Table:
        lab = np.asarray(batch.column("label").combine_chunks()).astype(np.int64)
        mat = batch_embeddings(batch)
        nr = np.round(np.sqrt((mat * mat).sum(axis=1)), 6)
        return pa.table({"label": pa.array(lab, type=pa.int64()),
                         "nr": pa.array(nr, type=pa.float64())})

    nd = ds.map_batches(norms, batch_format="pyarrow", zero_copy_batch=True)

    def kernel(t: pa.Table) -> pa.Table:
        lab = np.asarray(t.column("label").combine_chunks()).astype(np.int64)
        if len(lab) == 0:
            return pa.table({"label": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64()),
                             "min_norm": pa.array([], type=pa.float64()),
                             "p50_norm": pa.array([], type=pa.float64()),
                             "max_norm": pa.array([], type=pa.float64())})
        nr = np.asarray(t.column("nr").combine_chunks(), dtype=np.float64)
        order = np.lexsort((nr, lab))
        l_s, v_s = lab[order], nr[order]
        starts = np.flatnonzero(np.r_[True, l_s[1:] != l_s[:-1]])
        ends = np.r_[starts[1:], len(l_s)]
        cnt = ends - starts
        med = v_s[starts + np.ceil(0.5 * cnt).astype(np.int64) - 1]
        return pa.table({"label": pa.array(l_s[starts], type=pa.int64()),
                         "n": pa.array(cnt.astype(np.int64), type=pa.int64()),
                         "min_norm": pa.array(v_s[starts], type=pa.float64()),
                         "p50_norm": pa.array(med, type=pa.float64()),
                         "max_norm": pa.array(v_s[ends - 1], type=pa.float64())})

    out = keyed_partition_map(nd, ["label"], kernel).to_pandas()
    out = out.sort_values("label").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


SQL["embedding_norm_quantiles"] = (
    "WITH n AS (SELECT label, ROUND(sqrt(list_sum(list_transform("
    "CAST(embedding AS DOUBLE[]), x -> x * x))), 6) AS nr "
    "FROM embeddings) "
    "SELECT CAST(label AS BIGINT) AS label, COUNT(*) AS n, "
    "MIN(nr) AS min_norm, quantile_disc(nr, 0.5) AS p50_norm, "
    "MAX(nr) AS max_norm FROM n GROUP BY label ORDER BY label"
)


def cosine_pair_stats(sf_dir: str, *, rate: int = 5) -> pa.Table:
    """Pairwise-cosine DISTRIBUTION summary over a deterministic
    1-in-``rate`` mod-sample of the corpus — the cheap geometry probe
    (is the space collapsing? are sims bimodal?) run before committing
    to a dedup threshold. The sample predicate (vec_id % rate = 0) is
    applied batch-side so only ~n/rate vectors reach the driver (the
    production path swaps in the murmur hash-sample of
    ``sample_embeddings``); the sample matrix is matmul'd once and the
    i<j triangle summarized. Sims rounded to 9 dp (knn_graph
    convention) before stats; disc-quantiles are exact order
    statistics, the mean is ROUND 6."""
    ds = read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def pick(batch: pa.Table) -> pa.Table:
        vid = np.asarray(batch.column("vec_id").combine_chunks()).astype(np.int64)
        keep = vid % np.int64(rate) == 0
        mat = batch_embeddings(batch)[keep]
        return pa.table({"vec_id": pa.array(vid[keep], type=pa.int64()),
                         "embedding": pa.array(list(mat))})

    s = ds.map_batches(pick, batch_format="pyarrow",
                       zero_copy_batch=True).to_pandas()
    mat = np.stack(s["embedding"].to_numpy()).astype(np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = np.round(mat @ mat.T, 9)
    iu = np.triu_indices(len(mat), k=1)
    v = np.sort(sims[iu])
    n = len(v)
    q = lambda p: v[int(np.ceil(p * n)) - 1]
    from .common import round_col

    return pa.table({
        "n_pairs": pa.array([n], type=pa.int64()),
        "mean_sim": pa.array([round_col(np.array([v.mean()]), 6)[0]],
                             type=pa.float64()),
        "p10_sim": pa.array([q(0.10)], type=pa.float64()),
        "p50_sim": pa.array([q(0.50)], type=pa.float64()),
        "p90_sim": pa.array([q(0.90)], type=pa.float64()),
    })


SQL["cosine_pair_stats"] = (
    "WITH s AS (SELECT vec_id, embedding FROM embeddings "
    "WHERE vec_id % 5 = 0), "
    "p AS (SELECT ROUND(list_cosine_similarity("
    "CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 9) "
    "AS sim FROM s a JOIN s b ON a.vec_id < b.vec_id) "
    "SELECT COUNT(*) AS n_pairs, ROUND(AVG(sim), 6) AS mean_sim, "
    "quantile_disc(sim, 0.10) AS p10_sim, "
    "quantile_disc(sim, 0.50) AS p50_sim, "
    "quantile_disc(sim, 0.90) AS p90_sim FROM p"
)


def label_reweight_plan(sf_dir: str) -> pa.Table:
    """Class-imbalance REWEIGHTING plan over the embedding labels:
    inverse-frequency weight w_k = N / (K·n_k) (mean weight 1 under the
    empirical distribution) plus each class's sampling share — the
    table a training loop feeds its loss weights / sampler from. One
    combiner-first label count; everything else is arithmetic on the
    K-row aggregate."""
    from ..stages.groupagg import grouped_aggregate
    from .common import round_col

    ds = read(sf_dir, "embeddings", ["label"])

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.DataFrame({"label": np.asarray(
            batch.column("label").combine_chunks()).astype(np.int64)})
        return df.group_by("label").agg(n=pl.len().cast(pl.Int64)).to_arrow()

    c = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["label"], [("n", "sum", "n")],
    ).to_pandas()
    N = int(c["n"].sum()); K = len(c)
    c["share"] = round_col(c["n"].to_numpy(np.float64) / N, 6)
    c["weight"] = round_col(N / (K * c["n"].to_numpy(np.float64)), 6)
    c = c.astype({"label": np.int64, "n": np.int64})
    c = c.sort_values("label").reset_index(drop=True)
    return pa.Table.from_pandas(c[["label", "n", "share", "weight"]],
                                preserve_index=False)


SQL["label_reweight_plan"] = (
    "WITH c AS (SELECT CAST(label AS BIGINT) AS label, COUNT(*) AS n "
    "FROM embeddings GROUP BY 1), "
    "t AS (SELECT SUM(n) AS N, COUNT(*) AS K FROM c) "
    "SELECT c.label, c.n, "
    "ROUND(CAST(c.n AS DOUBLE) / t.N, 6) AS share, "
    "ROUND(CAST(t.N AS DOUBLE) / (t.K * c.n), 6) AS weight "
    "FROM c, t ORDER BY c.label"
)


def label_centroid_similarity(sf_dir: str) -> pa.Table:
    """Pairwise COSINE between per-label centroid embeddings — the
    class-separation matrix read before trusting a label-conditioned
    sampler or a centroid classifier. Per-batch partials emit (label,
    dim, Σv) long rows (labels × 64 per batch, never vectors), the
    centroid means and the 45-pair cosine matrix are arithmetic on that
    K×d aggregate. ROUND 6 absorbs per-dim mean summation order."""
    from ..stages.groupagg import grouped_aggregate
    from .common import round_col

    ds = read(sf_dir, "embeddings", ["label", "embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        lab = np.asarray(batch.column("label").combine_chunks()).astype(np.int64)
        mat = batch_embeddings(batch)
        if len(lab) == 0:
            return pa.table({"label": pa.array([], type=pa.int64()),
                             "dim": pa.array([], type=pa.int64()),
                             "s": pa.array([], type=pa.float64()),
                             "cnt": pa.array([], type=pa.int64())})
        ulab = np.unique(lab)
        rows_l, rows_d, rows_s, rows_c = [], [], [], []
        for L in ulab:
            m = lab == L
            s = mat[m].sum(axis=0)
            rows_l.extend([int(L)] * mat.shape[1])
            rows_d.extend(range(mat.shape[1]))
            rows_s.extend(s.tolist())
            rows_c.extend([int(m.sum())] * mat.shape[1])
        return pa.table({"label": pa.array(rows_l, type=pa.int64()),
                         "dim": pa.array(rows_d, type=pa.int64()),
                         "s": pa.array(rows_s, type=pa.float64()),
                         "cnt": pa.array(rows_c, type=pa.int64())})

    agg = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["label", "dim"], [("s", "sum", "s"), ("cnt", "sum", "cnt")],
    ).to_pandas()
    agg = agg.sort_values(["label", "dim"])
    labels = np.sort(agg["label"].unique())
    d = agg["dim"].max() + 1
    cent = {}
    for L in labels:
        g = agg[agg["label"] == L]
        cent[L] = (g["s"].to_numpy(np.float64)
                   / g["cnt"].to_numpy(np.float64))
    rows = []
    for i, a in enumerate(labels):
        for b in labels[i + 1:]:
            ca, cb = cent[a], cent[b]
            cos = float(ca @ cb) / (np.sqrt(float(ca @ ca))
                                    * np.sqrt(float(cb @ cb)))
            rows.append((int(a), int(b), round_col(np.array([cos]), 6)[0]))
    out = pd.DataFrame(rows, columns=["label_a", "label_b", "cos_sim"])
    out = out.astype({"label_a": np.int64, "label_b": np.int64})
    out = out.sort_values(["label_a", "label_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


SQL["label_centroid_similarity"] = (
    "WITH u AS (SELECT label, "
    "UNNEST(CAST(embedding AS DOUBLE[])) AS v, "
    "generate_subscripts(embedding, 1) AS i FROM embeddings), "
    "c AS (SELECT label, i, AVG(v) AS m FROM u GROUP BY 1, 2), "
    "p AS (SELECT a.label AS la, b.label AS lb, SUM(a.m * b.m) AS dot "
    "FROM c a JOIN c b ON a.i = b.i AND a.label < b.label GROUP BY 1, 2), "
    "nr AS (SELECT label, sqrt(SUM(m * m)) AS nrm FROM c GROUP BY 1) "
    "SELECT CAST(p.la AS BIGINT) AS label_a, CAST(p.lb AS BIGINT) "
    "AS label_b, ROUND(p.dot / (na.nrm * nb.nrm), 6) AS cos_sim "
    "FROM p JOIN nr na ON na.label = p.la JOIN nr nb ON nb.label = p.lb "
    "ORDER BY 1, 2"
)


def embedding_clip_bounds(sf_dir: str, *, q_lo: float = 0.01,
                          q_hi: float = 0.99) -> pa.Table:
    """Per-DIMENSION p01/p99 clip bounds over the embedding column — the
    calibration table an int8 quantizer or outlier-clipper is fit from.
    One map_batches explodes each batch's (n, d) block to (dim, value)
    long rows VECTORIZED (tile/ravel — d·n rows but only two fixed-width
    columns); one keyed exchange on dim (d keys) and a per-dim
    sort+gather kernel emits the disc order statistics. Float32 inputs
    widen to float64 exactly on both engines, so the quantiles match
    bit-for-bit with NO rounding."""
    from ..stages.keyed import keyed_partition_map

    ds = read(sf_dir, "embeddings", ["embedding"])

    def explode(batch: pa.Table) -> pa.Table:
        mat = batch_embeddings(batch)
        n, d = mat.shape
        return pa.table({
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), n)),
            "v": pa.array(mat.ravel(), type=pa.float64()),
        })

    long = ds.map_batches(explode, batch_format="pyarrow",
                          zero_copy_batch=True)

    def kernel(t: pa.Table) -> pa.Table:
        dim = np.asarray(t.column("dim").combine_chunks()).astype(np.int64)
        if len(dim) == 0:
            return pa.table({"dim": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64()),
                             "p_lo": pa.array([], type=pa.float64()),
                             "p_hi": pa.array([], type=pa.float64())})
        v = np.asarray(t.column("v").combine_chunks(), dtype=np.float64)
        order = np.lexsort((v, dim))
        d_s, v_s = dim[order], v[order]
        starts = np.flatnonzero(np.r_[True, d_s[1:] != d_s[:-1]])
        ends = np.r_[starts[1:], len(d_s)]
        cnt = ends - starts
        lo = v_s[starts + np.ceil(q_lo * cnt).astype(np.int64) - 1]
        hi = v_s[starts + np.ceil(q_hi * cnt).astype(np.int64) - 1]
        return pa.table({"dim": pa.array(d_s[starts], type=pa.int64()),
                         "n": pa.array(cnt.astype(np.int64)),
                         "p_lo": pa.array(lo, type=pa.float64()),
                         "p_hi": pa.array(hi, type=pa.float64())})

    out = keyed_partition_map(long, ["dim"], kernel).to_pandas()
    out = out.sort_values("dim").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


SQL["embedding_clip_bounds"] = (
    "WITH u AS (SELECT UNNEST(CAST(embedding AS DOUBLE[])) AS v, "
    "CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim "
    "FROM embeddings) "
    "SELECT dim, COUNT(*) AS n, quantile_disc(v, 0.01) AS p_lo, "
    "quantile_disc(v, 0.99) AS p_hi FROM u GROUP BY dim ORDER BY dim"
)


def knn_dcg_eval(sf_dir: str, *, k: int = 10) -> pa.Table:
    """Retrieval-quality DCG@k of the exact cosine k-NN graph with
    label-match relevance (rel=1 iff the neighbor shares the query's
    label) — the graded companion to ``knn_classifier_eval``'s
    majority-vote accuracy. Reuses ``knn_graph``'s broadcast-matmul
    candidates (9-dp + id tie-break ranking); labels join via one
    broadcast id→label map; per-query DCG = Σ rel_i/log2(i+1) and the
    corpus mean are arithmetic on the (n·k)-row graph. ROUND 6."""
    import ray as _ray

    g = knn_graph(sf_dir, k=k)
    lab = read(sf_dir, "embeddings", ["vec_id", "label"]).to_pandas()
    l_of = dict(zip(lab["vec_id"].to_numpy(np.int64),
                    lab["label"].to_numpy(np.int64)))
    df = g.to_pandas()
    ql = df["vec_id"].map(l_of).to_numpy(np.int64)
    nl = df["neighbor_id"].map(l_of).to_numpy(np.int64)
    rel = (ql == nl).astype(np.float64)
    gain = rel / np.log2(df["rank"].to_numpy(np.int64) + 1.0)
    per_q = (pd.DataFrame({"q": df["vec_id"], "g": gain, "r": rel})
             .groupby("q").agg(dcg=("g", "sum"), hits=("r", "sum")))
    from .common import round_col

    return pa.table({
        "n_queries": pa.array([len(per_q)], type=pa.int64()),
        "mean_dcg": pa.array(round_col(
            np.array([float(per_q["dcg"].mean())]), 6)),
        "mean_hits": pa.array(round_col(
            np.array([float(per_q["hits"].mean())]), 6)),
    })


SQL["knn_dcg_eval"] = (
    "WITH sims AS ( "
    "  SELECT a.vec_id, a.label AS ql, b.vec_id AS nid, b.label AS nlab, "
    "         ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
    "CAST(b.embedding AS DOUBLE[])), 9) AS sim "
    "  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id), "
    "r AS (SELECT vec_id, ql, nlab, ROW_NUMBER() OVER ("
    "PARTITION BY vec_id ORDER BY sim DESC, nid) AS rk FROM sims), "
    "q AS (SELECT vec_id, "
    "SUM(CASE WHEN ql = nlab THEN 1.0 / log2(rk + 1.0) ELSE 0 END) "
    "AS dcg, "
    "SUM(CASE WHEN ql = nlab THEN 1 ELSE 0 END) AS hits "
    "FROM r WHERE rk <= 10 GROUP BY 1) "
    "SELECT COUNT(*) AS n_queries, ROUND(AVG(dcg), 6) AS mean_dcg, "
    "ROUND(AVG(hits), 6) AS mean_hits FROM q"
)


def dim_correlation_top(sf_dir: str, *, k: int = 10) -> pa.Table:
    """Most-CORRELATED embedding dimension pairs — the redundancy scan
    run before dimensionality reduction (highly correlated dims waste
    index bytes). Each batch emits its local Gram block MᵀM plus
    per-dim sums as (i, j, s) long partials — d²-bounded per batch,
    never row-level — and the Pearson matrix is arithmetic on the
    summed Gram. ROUND 6; ties rank by (i, j)."""
    from ..stages.groupagg import grouped_aggregate
    from .common import round_col

    ds = read(sf_dir, "embeddings", ["embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        mat = batch_embeddings(batch)
        n, d = mat.shape
        g = mat.T @ mat
        iu = np.triu_indices(d, k=0)
        return pa.table({
            "i": pa.array(iu[0].astype(np.int64)),
            "j": pa.array(iu[1].astype(np.int64)),
            "g": pa.array(g[iu], type=pa.float64()),
            "si": pa.array(np.where(iu[0] == iu[1], mat.sum(axis=0)[iu[0]],
                                    0.0), type=pa.float64()),
            "cnt": pa.array(np.where((iu[0] == 0) & (iu[1] == 0), n, 0)
                            .astype(np.int64)),
        })

    agg = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["i", "j"], [("g", "sum", "g"), ("si", "sum", "si"),
                     ("cnt", "sum", "cnt")],
    ).to_pandas()
    n = int(agg["cnt"].sum())
    d = int(agg["j"].max()) + 1
    G = np.zeros((d, d))
    for i_, j_, g_ in zip(agg["i"], agg["j"], agg["g"]):
        G[i_, j_] = g_
        G[j_, i_] = g_
    s = np.zeros(d)
    diag = agg[agg["i"] == agg["j"]].sort_values("i")
    s[diag["i"].to_numpy(np.int64)] = diag["si"].to_numpy(np.float64)
    var = n * np.diag(G) - s * s
    num = n * G - np.outer(s, s)
    den = np.sqrt(np.outer(var, var))
    corr = num / den
    iu = np.triu_indices(d, k=1)
    flat = pd.DataFrame({"dim_i": iu[0].astype(np.int64),
                         "dim_j": iu[1].astype(np.int64),
                         "corr6": round_col(corr[iu], 6)})
    flat["abs6"] = np.abs(flat["corr6"].to_numpy())
    flat = flat.sort_values(["abs6", "dim_i", "dim_j"],
                            ascending=[False, True, True]).head(k)
    flat.insert(0, "rank", np.arange(1, len(flat) + 1, dtype=np.int64))
    out = flat[["rank", "dim_i", "dim_j", "corr6"]].rename(
        columns={"corr6": "corr"})
    return pa.Table.from_pandas(out.reset_index(drop=True),
                                preserve_index=False)


SQL["dim_correlation_top"] = (
    "WITH u AS (SELECT vec_id, UNNEST(CAST(embedding AS DOUBLE[])) AS v, "
    "CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS i "
    "FROM embeddings), "
    "m AS (SELECT a.i AS dim_i, b.i AS dim_j, COUNT(*) AS n, "
    "SUM(a.v * b.v) AS g, SUM(a.v) AS sa, SUM(b.v) AS sb, "
    "SUM(a.v * a.v) AS ga, SUM(b.v * b.v) AS gb "
    "FROM u a JOIN u b ON a.vec_id = b.vec_id AND a.i < b.i "
    "GROUP BY 1, 2), "
    "c AS (SELECT dim_i, dim_j, "
    "ROUND((n * g - sa * sb) / (sqrt(n * ga - sa * sa) "
    "* sqrt(n * gb - sb * sb)), 6) AS corr FROM m), "
    "r AS (SELECT dim_i, dim_j, corr, ROW_NUMBER() OVER ("
    "ORDER BY ABS(corr) DESC, dim_i, dim_j) AS rank FROM c) "
    "SELECT CAST(rank AS BIGINT) AS rank, dim_i, dim_j, corr FROM r "
    "WHERE rank <= 10 ORDER BY rank"
)


def centroid_margin_stats(sf_dir: str) -> pa.Table:
    """Nearest-CENTROID margin audit: for every vector, cosine to its
    OWN label centroid minus the best other-label centroid — the
    separability health check (negative margin = the vector would be
    misclassified by a centroid rule). Centroids come from the same
    (label, dim, Σv) long partials as ``label_centroid_similarity``;
    the margins are ONE (n×K) matmul per batch against the broadcast
    K×d centroid matrix. 9-dp sims; counts exact; mean ROUND 6."""
    import ray as _ray

    from ..stages.groupagg import grouped_aggregate
    from .common import round_col

    ds = read(sf_dir, "embeddings", ["label", "embedding"])

    def cpartial(batch: pa.Table) -> pa.Table:
        lab = np.asarray(batch.column("label").combine_chunks()).astype(np.int64)
        mat = batch_embeddings(batch)
        if len(lab) == 0:
            return pa.table({"label": pa.array([], type=pa.int64()),
                             "dim": pa.array([], type=pa.int64()),
                             "s": pa.array([], type=pa.float64()),
                             "cnt": pa.array([], type=pa.int64())})
        rows_l, rows_d, rows_s, rows_c = [], [], [], []
        for L in np.unique(lab):
            m = lab == L
            s = mat[m].sum(axis=0)
            rows_l.extend([int(L)] * mat.shape[1])
            rows_d.extend(range(mat.shape[1]))
            rows_s.extend(s.tolist())
            rows_c.extend([int(m.sum())] * mat.shape[1])
        return pa.table({"label": pa.array(rows_l, type=pa.int64()),
                         "dim": pa.array(rows_d, type=pa.int64()),
                         "s": pa.array(rows_s, type=pa.float64()),
                         "cnt": pa.array(rows_c, type=pa.int64())})

    agg = grouped_aggregate(
        ds.map_batches(cpartial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["label", "dim"], [("s", "sum", "s"), ("cnt", "sum", "cnt")],
    ).to_pandas().sort_values(["label", "dim"])
    labels = np.sort(agg["label"].unique())
    d = int(agg["dim"].max()) + 1
    C = np.zeros((len(labels), d))
    for i, L in enumerate(labels):
        g = agg[agg["label"] == L]
        C[i] = g["s"].to_numpy(np.float64) / g["cnt"].to_numpy(np.float64)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    lab_pos = {int(L): i for i, L in enumerate(labels)}
    ref = _ray.put((Cn, lab_pos))

    def margins(batch: pa.Table) -> pa.Table:
        Cn_, pos = _ray.get(ref)
        lab = np.asarray(batch.column("label").combine_chunks()).astype(np.int64)
        mat = batch_embeddings(batch)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = np.round(mat @ Cn_.T, 9)
        own_idx = np.array([pos[int(L)] for L in lab], dtype=np.int64)
        own = sims[np.arange(len(lab)), own_idx]
        sims[np.arange(len(lab)), own_idx] = -2.0
        best_other = sims.max(axis=1)
        marg = own - best_other
        return pa.table({"k": pa.array([0], type=pa.int64()),
                         "n": pa.array([len(lab)], type=pa.int64()),
                         "neg": pa.array([int((marg < 0).sum())],
                                         type=pa.int64()),
                         "s": pa.array([float(marg.sum())],
                                       type=pa.float64())})

    f = grouped_aggregate(
        ds.map_batches(margins, batch_format="pyarrow", zero_copy_batch=True),
        ["k"], [("n", "sum", "n"), ("neg", "sum", "neg"),
                ("s", "sum", "s")]).to_pandas()
    n = int(f["n"][0]); neg = int(f["neg"][0]); s = float(f["s"][0])
    return pa.table({
        "n_vectors": pa.array([n], type=pa.int64()),
        "n_negative_margin": pa.array([neg], type=pa.int64()),
        "neg_share": pa.array(round_col(np.array([neg / n]), 6)),
        "mean_margin": pa.array(round_col(np.array([s / n]), 6)),
    })


SQL["centroid_margin_stats"] = (
    "WITH u AS (SELECT vec_id, label, "
    "UNNEST(CAST(embedding AS DOUBLE[])) AS v, "
    "generate_subscripts(embedding, 1) AS i FROM embeddings), "
    "c AS (SELECT label, i, AVG(v) AS m FROM u GROUP BY 1, 2), "
    "nv AS (SELECT vec_id, sqrt(SUM(v * v)) AS nr FROM u GROUP BY 1), "
    "nc AS (SELECT label, sqrt(SUM(m * m)) AS nr FROM c GROUP BY 1), "
    "sims AS (SELECT u.vec_id, u.label AS vl, c.label AS cl, "
    "ROUND(SUM(u.v * c.m) / (nv.nr * nc.nr), 9) AS sim "
    "FROM u JOIN c ON c.i = u.i "
    "JOIN nv ON nv.vec_id = u.vec_id JOIN nc ON nc.label = c.label "
    "GROUP BY u.vec_id, u.label, c.label, nv.nr, nc.nr), "
    "m AS (SELECT vec_id, "
    "MAX(CASE WHEN vl = cl THEN sim END) "
    "- MAX(CASE WHEN vl <> cl THEN sim END) AS marg FROM sims "
    "GROUP BY 1) "
    "SELECT COUNT(*) AS n_vectors, "
    "CAST(SUM(CASE WHEN marg < 0 THEN 1 ELSE 0 END) AS BIGINT) "
    "AS n_negative_margin, "
    "ROUND(CAST(SUM(CASE WHEN marg < 0 THEN 1 ELSE 0 END) AS DOUBLE) "
    "/ COUNT(*), 6) AS neg_share, "
    "ROUND(AVG(marg), 6) AS mean_margin FROM m"
)
