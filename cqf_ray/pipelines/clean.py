"""The composed training-data cleaning pipeline — the end-to-end shape a
100 TB corpus actually runs: quality gate → exact dedup → near-dup
canonicalization → cleaned corpus stats, each stage the distributed
operator defined elsewhere in this package, composed here and checked as
ONE oracle (the SQL mirrors the full composition, including the
recursive-CTE near-dup closure restricted to the quality+dedup
survivors).

Order of operations (matches the SQL exactly):
1. quality gate (byte length, token count, alpha ratio — integer-exact);
2. exact dedup among survivors (keep the min doc_id per distinct text);
3. near-dup groups among the remaining docs (exact 5-gram Jaccard ≥ 0.7
   pairs via MinHash-LSH + per-pair verification), keep each group's min;
4. report the kept corpus: doc count + total token count.

The heavy stages are all distributed; only aggregated artifacts (kept-id
sets, verified pair lists) reach the driver for the final set algebra.

Scale note: the ENGINE runs in seconds at every testdata scale (LSH keeps
the pair space sparse); the SQL ORACLE's exact-Jaccard self-join is
quadratic in shingle document frequency and exhausts DuckDB temp space
beyond the sf0.01 gate scale — the oracle is correctness evidence, not the
scale path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .common import read
from .dedup import _union_find, minhash_lsh_pairs

_QUALITY_COND = (
    "length(text) BETWEEN 50 AND 5000 "
    "AND length(regexp_extract_all(text, '\\S+')) >= 10 "
    "AND 10 * length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) >= 6 * length(text)"
)


def clean_corpus(sf_dir: str, *, threshold: float = 0.7) -> pa.Table:
    """Run the full cleaning composition and return one summary row:
    (n_input, n_quality, n_after_exact_dedup, n_kept, total_tokens_kept)."""
    from ..text import token_hashes
    from .textq import quality_filter

    n_input = read(sf_dir, "documents", ["doc_id"]).count()

    quality = set(quality_filter(sf_dir).to_pandas()["doc_id"].tolist())

    # exact dedup restricted to quality survivors: a duplicate group's
    # canonical is the min doc_id AMONG SURVIVORS, so the grouped min runs
    # over the filtered set (same combiner-first grouped aggregate as
    # dedup_exact, with a broadcast id filter at the read)
    from ..stages.groupagg import grouped_aggregate
    import ray

    qref = ray.put(np.array(sorted(quality), dtype=np.int64))

    def only_quality(batch: pa.Table) -> pa.Table:
        did = np.asarray(batch.column("doc_id").combine_chunks()).astype(np.int64)
        return batch.filter(pa.array(np.isin(did, ray.get(qref))))

    ds_q = read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        only_quality, batch_format="pyarrow", zero_copy_batch=True
    )
    per_text = grouped_aggregate(
        ds_q, ["text"], [("doc_id", "min", "doc_id"), ("n", "count", None)]
    ).to_pandas()
    exact_kept = set(per_text["doc_id"].astype(np.int64).tolist())
    n_after_exact = len(exact_kept)

    # near-dup pairs over the whole corpus (distributed LSH + verify),
    # restricted to the docs still alive, then union-find keep-min
    pairs = minhash_lsh_pairs(sf_dir, threshold=threshold).to_pandas()
    alive = exact_kept
    pairs = pairs[pairs.doc_a.isin(alive) & pairs.doc_b.isin(alive)]
    if len(pairs):
        comp = _union_find(pairs["doc_a"].to_numpy(), pairs["doc_b"].to_numpy())
        drop = {d for d, c in comp.items() if d != c}
    else:
        drop = set()
    kept = np.array(sorted(alive - drop), dtype=np.int64)

    # distributed token count over the kept corpus
    kref = ray.put(kept)

    def tok_partial(batch: pa.Table) -> pa.Table:
        did = np.asarray(batch.column("doc_id").combine_chunks()).astype(np.int64)
        keep = np.isin(did, ray.get(kref))
        batch = batch.filter(pa.array(keep))
        if batch.num_rows == 0:
            return pa.table({"n_tokens": pa.array([0], type=pa.int64())})
        _, offs = token_hashes(batch.column("text"), seed=0, lowercase=False)
        return pa.table({"n_tokens": pa.array([int(np.diff(offs).sum())], type=pa.int64())})

    total_tokens = int(
        read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(tok_partial, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()["n_tokens"]
        .sum()
    )

    return pa.table(
        {
            "n_input": pa.array([n_input], type=pa.int64()),
            "n_quality": pa.array([len(quality)], type=pa.int64()),
            "n_after_exact_dedup": pa.array([n_after_exact], type=pa.int64()),
            "n_kept": pa.array([len(kept)], type=pa.int64()),
            "total_tokens_kept": pa.array([total_tokens], type=pa.int64()),
        }
    )


def _jaccard_pairs_over_quality_sql(threshold: float) -> str:
    """Exact J≥t pairs among exact-dedup canonical quality survivors."""
    return (
        "q AS (SELECT doc_id, text FROM documents WHERE " + _QUALITY_COND + "), "
        "canon AS (SELECT MIN(doc_id) AS doc_id FROM q GROUP BY text), "
        "alive AS (SELECT q.doc_id, q.text FROM q JOIN canon USING (doc_id)), "
        "sh AS (SELECT DISTINCT doc_id, substring(text, CAST(r AS BIGINT) + 1, 5) AS g "
        "       FROM alive, LATERAL UNNEST(range(length(text) - 4)) AS t(r) "
        "       WHERE length(text) >= 5), "
        "sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id), "
        "prs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c "
        "        FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2), "
        "jp AS (SELECT doc_a, doc_b FROM prs "
        "       JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id "
        f"      WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= {threshold})"
    )


SQL = {
    "clean_corpus": (
        "WITH RECURSIVE " + _jaccard_pairs_over_quality_sql(0.7) + ", "
        "edges AS (SELECT doc_a AS u, doc_b AS v FROM jp "
        "          UNION ALL SELECT doc_b, doc_a FROM jp), "
        "reach(node, r) AS ("
        "  SELECT u, u FROM (SELECT DISTINCT u FROM edges) "
        "  UNION "
        "  SELECT reach.node, e.v FROM reach JOIN edges e ON e.u = reach.r), "
        "dropped AS (SELECT node AS doc_id FROM reach GROUP BY node "
        "            HAVING node <> MIN(r)), "
        "kept AS (SELECT doc_id FROM alive WHERE doc_id NOT IN (SELECT doc_id FROM dropped)) "
        "SELECT (SELECT COUNT(*) FROM documents) AS n_input, "
        "       (SELECT COUNT(*) FROM q) AS n_quality, "
        "       (SELECT COUNT(*) FROM alive) AS n_after_exact_dedup, "
        "       (SELECT COUNT(*) FROM kept) AS n_kept, "
        "       (SELECT CAST(COALESCE(SUM(length(regexp_extract_all(text, '\\S+'))), 0) AS BIGINT) "
        "        FROM documents JOIN kept USING (doc_id)) AS total_tokens_kept"
    ),
}
