"""Deduplication pipelines over `documents`: exact, MinHash+LSH, SimHash,
n-gram Jaccard verification, embedding-cosine near-dup (driver mandate:
first-class training-data operators).

Scale shapes:
* exact dedup — hash-partition on a 64-bit text hash (uniform key), group,
  resolve collisions against the true text within each (tiny) group;
* MinHash LSH — shingle→signature per batch (vectorized), explode to
  (band_key, doc) rows, groupby band_key (the only shuffle; band tables are
  ~num_bands × n_docs small rows), pair up within buckets, then verify
  candidates with exact n-gram Jaccard;
* SimHash — 64-bit fingerprint, bucket by fingerprint bands, verify by
  Hamming distance;
* embedding cosine — normalized vectors, candidate generation by
  brute-force block product against a broadcast matrix (LSH/IVF variant in
  pipelines/ann.py scales this).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..sketches.minhash import MinHasher
from ..sketches.simhash import hamming64, simhash64
from ..stages.groupagg import grouped_aggregate
from ..text import char_ngram_hashes
from .common import read


def dedup_exact(sf_dir: str) -> pa.Table:
    """Exact dedup: canonical doc (min doc_id) + copy count per distinct
    text, as a combiner-first grouped aggregate keyed on the text itself
    (exact by construction; per-batch partials collapse duplicate-heavy
    batches before the shuffle). At 100 TB, to avoid shuffling full text,
    key on hash64(text) and keep the text only for in-group collision
    verification — same plan shape, smaller exchange."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])
    out = grouped_aggregate(
        ds, ["text"], [("doc_id", "min", "doc_id"), ("n_copies", "count", None)]
    )
    df = out.to_pandas()[["doc_id", "n_copies"]].sort_values("doc_id").reset_index(drop=True)
    df["n_copies"] = df["n_copies"].astype(np.int64)
    return pa.Table.from_pandas(df, preserve_index=False)


def _doc_shingles(batch: pa.Table, n: int = 5, seed: int = 29):
    return char_ngram_hashes(batch.column("text"), n=n, seed=seed)


_MAX_BUCKET = 256  # skip degenerate LSH buckets (standard practice: a
# bucket this hot is a trivial shingle collision, and pairing it is O(L²))


def _pairs_from_buckets(bands: np.ndarray, bkeys: np.ndarray, doc_ids: np.ndarray,
                        payload: np.ndarray | None = None):
    """Vectorized within-bucket pair generation: lexsort by (band, bkey),
    detect runs, emit all intra-run pairs. Replaces per-bucket map_groups
    (one task per bucket is pure overhead at 10^5 buckets). The candidate
    table is |docs|×bands small rows; above driver scale the same kernel
    runs inside map_batches after a sort — the pairing math is identical.
    Returns (doc_a, doc_b[, payload_a, payload_b]) with doc_a < doc_b."""
    order = np.lexsort((doc_ids, bkeys, bands))
    b, k, d = bands[order], bkeys[order], doc_ids[order]
    p = payload[order] if payload is not None else None
    boundary = np.concatenate([[True], (b[1:] != b[:-1]) | (k[1:] != k[:-1])])
    starts = np.flatnonzero(boundary)
    lens = np.diff(np.concatenate([starts, [len(b)]]))
    out_a, out_b, pl_a, pl_b = [], [], [], []
    for s, L in zip(starts[lens >= 2], lens[lens >= 2]):
        if L > _MAX_BUCKET:
            continue
        ii, jj = np.triu_indices(int(L), k=1)
        out_a.append(d[s + ii])
        out_b.append(d[s + jj])
        if p is not None:
            pl_a.append(p[s + ii])
            pl_b.append(p[s + jj])
    if not out_a:
        z = np.empty(0, dtype=np.int64)
        return (z, z) if payload is None else (z, z, z.astype(payload.dtype), z.astype(payload.dtype))
    a = np.concatenate(out_a)
    bb = np.concatenate(out_b)
    if payload is None:
        return a, bb
    return a, bb, np.concatenate(pl_a), np.concatenate(pl_b)


def minhash_lsh_pairs(
    sf_dir: str, *, num_perm: int = 128, bands: int = 32, threshold: float = 0.7
) -> pa.Table:
    """MinHash+LSH near-duplicate pairs, verified with exact n-gram Jaccard.

    Stage 1 (map_batches): per-doc 128-perm MinHash signatures; explode to
    (band_key, doc_id, signature) rows. Stage 2: groupby band_key — only
    bucketed candidates shuffle. Stage 3: within-bucket pairing, global
    dedup of pairs, then exact-Jaccard verification against the documents'
    true shingle sets (a broadcast of the candidate doc texts).
    """
    ds = read(sf_dir, "documents", ["doc_id", "text"])
    hasher = MinHasher(num_perm=num_perm, seed=31)

    def stage1(batch: pa.Table) -> pa.Table:
        hashes, offs = _doc_shingles(batch)
        sigs = hasher.signatures(hashes, offs)  # (ndocs, num_perm)
        bkeys = hasher.band_keys(sigs, bands)  # (ndocs, bands) uint64
        ndocs = sigs.shape[0]
        doc_ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        return pa.table(
            {
                "band": np.repeat(np.arange(bands, dtype=np.int64), ndocs),
                "bkey": bkeys.T.reshape(-1).view(np.int64),
                "doc_id": np.tile(doc_ids, bands),
            }
        )

    bt = (
        ds.map_batches(stage1, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
    )
    a, b = _pairs_from_buckets(
        bt["band"].to_numpy(), bt["bkey"].to_numpy(), bt["doc_id"].to_numpy()
    )
    cand = pd.DataFrame({"doc_a": a, "doc_b": b}).drop_duplicates()
    if len(cand) == 0:
        return pa.table({"doc_a": pa.array([], type=pa.int64()),
                         "doc_b": pa.array([], type=pa.int64())})
    # exact verification on the candidate set (small): true Jaccard of
    # 5-gram shingle sets
    need = np.unique(np.concatenate([cand["doc_a"], cand["doc_b"]]))
    import pyarrow.parquet as pq
    import pyarrow.compute as pc
    import os

    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    docs = docs.filter(pc.is_in(docs.column("doc_id"), pa.array(need.astype(np.int64))))
    h, offs = _doc_shingles(docs)
    did = np.asarray(docs.column("doc_id"), dtype=np.int64)
    shingle_sets = {
        int(did[i]): np.unique(h[offs[i] : offs[i + 1]]) for i in range(len(did))
    }
    keep_a, keep_b = [], []
    for a, b in zip(cand["doc_a"], cand["doc_b"]):
        sa, sb = shingle_sets[int(a)], shingle_sets[int(b)]
        inter = np.intersect1d(sa, sb, assume_unique=True)
        union = len(sa) + len(sb) - len(inter)
        if union and len(inter) / union >= threshold:
            keep_a.append(int(a))
            keep_b.append(int(b))
    df = pd.DataFrame({"doc_a": keep_a, "doc_b": keep_b}).sort_values(
        ["doc_a", "doc_b"]
    ).reset_index(drop=True)
    return pa.Table.from_pandas(df.astype(np.int64), preserve_index=False)


def simhash_near_dups(sf_dir: str, *, max_hamming: int = 3) -> pa.Table:
    """SimHash near-dup pairs: 64-bit fingerprints, candidate buckets from
    four 16-bit bands (any pair within Hamming ≤ 3 of 64 bits shares ≥ 1
    exact band by pigeonhole when ≤ 3 differing bits spread over 4 bands),
    verified by exact Hamming distance."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def stage1(batch: pa.Table) -> pa.Table:
        h, offs = char_ngram_hashes(batch.column("text"), n=4, seed=37)
        sig = simhash64(h, offs)
        doc_ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        bands_ = [(sig >> np.uint64(16 * i)) & np.uint64(0xFFFF) for i in range(4)]
        return pa.table(
            {
                "band": np.repeat(np.arange(4, dtype=np.int64), len(doc_ids)),
                "bkey": np.concatenate(bands_).view(np.int64),
                "doc_id": np.tile(doc_ids, 4),
                "sig": np.tile(sig.view(np.int64), 4),
            }
        )

    bt = ds.map_batches(stage1, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    a, b, sig_a, sig_b = _pairs_from_buckets(
        bt["band"].to_numpy(), bt["bkey"].to_numpy(), bt["doc_id"].to_numpy(),
        payload=bt["sig"].to_numpy(),
    )
    hd = hamming64(sig_a.view(np.uint64), sig_b.view(np.uint64))
    m = hd <= max_hamming
    out = (
        pd.DataFrame({"doc_a": a[m], "doc_b": b[m], "hamming": hd[m].astype(np.int64)})
        .drop_duplicates(subset=["doc_a", "doc_b"])
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(out.astype(np.int64), preserve_index=False)


def ngram_jaccard_pairs(sf_dir: str, *, threshold: float = 0.5, max_doc: int = 200) -> pa.Table:
    """EXACT n-gram Jaccard similarity pairs (distinct character 5-gram
    sets), J(a,b) ≥ threshold — the mandated standalone n-gram Jaccard
    operator, oracle-checkable (the SQL side builds the same substring
    sets). Shingle-set extraction runs distributed (map_batches); the
    pairing here is a dense intersection matmul over the (bounded,
    ``doc_id < max_doc``) candidate set. The 100 TB path is the
    inverted-index plan: explode (shingle → doc), groupby shingle, count
    pair co-occurrences = exact intersection sizes, with hot-shingle
    capping — same semantics, shuffle-shaped like MinHash-LSH."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def distinct_shingles(batch: pa.Table) -> pa.Table:
        did = np.asarray(batch.column("doc_id"), dtype=np.int64)
        keep = did < max_doc
        batch = batch.filter(pa.array(keep))
        if batch.num_rows == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "shingle": pa.array([], type=pa.int64()),
                             "doc_len": pa.array([], type=pa.int64())})
        h, offs = char_ngram_hashes(batch.column("text"), n=5, seed=53)
        did = np.asarray(batch.column("doc_id"), dtype=np.int64)
        from ..text import string_bytes_and_offsets

        _, soffs = string_bytes_and_offsets(batch.column("text"))
        doc_len = np.diff(soffs)
        out_d, out_s, out_l = [], [], []
        for i in range(len(did)):
            u = np.unique(h[offs[i] : offs[i + 1]])
            out_d.append(np.full(len(u), did[i]))
            out_s.append(u.view(np.int64))
            out_l.append(np.full(len(u), doc_len[i]))
        return pa.table(
            {"doc_id": pa.array(np.concatenate(out_d)),
             "shingle": pa.array(np.concatenate(out_s)),
             "doc_len": pa.array(np.concatenate(out_l))}
        )

    flat = ds.map_batches(distinct_shingles, batch_format="pyarrow").to_pandas()
    flat = flat[flat.doc_len >= 5]  # SQL side has no shingles for short docs
    if flat.empty:
        return pa.table({"doc_a": pa.array([], type=pa.int64()),
                         "doc_b": pa.array([], type=pa.int64())})
    docs = np.unique(flat.doc_id.to_numpy())
    vocab, col = np.unique(flat.shingle.to_numpy(), return_inverse=True)
    row = np.searchsorted(docs, flat.doc_id.to_numpy())
    M = np.zeros((len(docs), len(vocab)), dtype=np.float32)
    M[row, col] = 1.0
    inter = M @ M.T
    sizes = inter.diagonal()
    union = sizes[:, None] + sizes[None, :] - inter
    jac = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
    a, b = np.nonzero(np.triu(jac >= threshold, k=1))
    df = pd.DataFrame({"doc_a": docs[a], "doc_b": docs[b]}).sort_values(
        ["doc_a", "doc_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(df.astype(np.int64), preserve_index=False)


def _union_find(pairs_a: np.ndarray, pairs_b: np.ndarray) -> dict[int, int]:
    """Connected components over near-dup pairs → {doc: canonical(min) id}.
    Runs on the verified pair list (tiny relative to the corpus); path
    compression keeps it linear-ish."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(pairs_a.tolist(), pairs_b.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    return {x: find(x) for x in parent}


def near_dup_canonical(sf_dir: str, *, threshold: float = 0.7) -> pa.Table:
    """Training-data dedup decision list: MinHash-LSH candidates → exact
    Jaccard verify → connected components → (doc_id, canonical_id, keep).
    Only docs in a dup group appear; keep=True marks the group minimum."""
    pairs = minhash_lsh_pairs(sf_dir, threshold=threshold).to_pandas()
    if len(pairs) == 0:
        return pa.table({"doc_id": pa.array([], type=pa.int64()),
                         "canonical_id": pa.array([], type=pa.int64()),
                         "keep": pa.array([], type=pa.bool_())})
    comp = _union_find(pairs["doc_a"].to_numpy(), pairs["doc_b"].to_numpy())
    docs = np.array(sorted(comp), dtype=np.int64)
    canon = np.array([comp[d] for d in docs], dtype=np.int64)
    return pa.table(
        {"doc_id": pa.array(docs), "canonical_id": pa.array(canon),
         "keep": pa.array(docs == canon)}
    )


def embedding_dup_pairs(sf_dir: str, *, threshold: float = 0.95) -> pa.Table:
    """Embedding-cosine near-duplicate pairs (vec pairs with cosine ≥ t).
    Batch×broadcast matmul: the embedding matrix is broadcast once; each
    batch computes its block of the similarity matrix vectorized."""
    import ray

    from ..stages.ann import load_embedding_matrix

    ids, mat = load_embedding_matrix(sf_dir)  # normalized float64
    mat_ref = ray.put((ids, mat))
    ds = read(sf_dir, "embeddings", ["vec_id", "embedding"])

    class BlockSim:
        def __init__(self, ref):
            self.ids, self.mat = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref

        def __call__(self, batch: pa.Table) -> pa.Table:
            vid = np.asarray(batch.column("vec_id"), dtype=np.int64)
            emb = np.stack(batch.column("embedding").to_pylist()).astype(np.float64)
            emb /= np.linalg.norm(emb, axis=1, keepdims=True)
            sims = emb @ self.mat.T  # (batch, N)
            bi, gj = np.nonzero(sims >= threshold)
            a = vid[bi]
            b = self.ids[gj]
            m = a < b  # dedupe + drop self
            return pa.table({"vec_a": pa.array(a[m]), "vec_b": pa.array(b[m])})

    df = ds.map_batches(
        BlockSim, fn_constructor_args=(mat_ref,),
        batch_format="pyarrow", batch_size=1024, concurrency=(1, 4),
    ).to_pandas()
    if df.empty:  # empty Dataset.to_pandas drops the schema — rebuild it
        return pa.table({"vec_a": pa.array([], type=pa.int64()),
                         "vec_b": pa.array([], type=pa.int64())})
    df = df.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


SQL = {
    "ngram_jaccard_pairs": (
        "WITH sh AS ("
        "  SELECT DISTINCT doc_id, substring(text, CAST(r AS BIGINT) + 1, 5) AS g "
        "  FROM documents, LATERAL UNNEST(range(length(text) - 4)) AS t(r) "
        "  WHERE doc_id < 200 AND length(text) >= 5), "
        "sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id), "
        "pairs AS ("
        "  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c "
        "  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id "
        "  GROUP BY 1, 2) "
        "SELECT doc_a, doc_b FROM pairs "
        "JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id "
        "WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.5 "
        "ORDER BY doc_a, doc_b"
    ),
    "dedup_exact": (
        "SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies FROM documents "
        "GROUP BY text ORDER BY doc_id"
    ),
    "embedding_dup_pairs": (
        "SELECT a.vec_id AS vec_a, b.vec_id AS vec_b "
        "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
        "WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.95 "
        "ORDER BY vec_a, vec_b"
    ),
}
