"""Text-analysis pipelines over the `documents` table: token counting,
quality scoring, language ID, document fingerprinting — the large-scale
training-data operators the engine adds beyond the reference (driver
mandate), all vectorized over Arrow string buffers (cqf_ray.text).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..text import string_bytes_and_offsets, token_hashes
from .common import read

# tiny per-language stopword lists for the n-gram/stopword heuristic
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "auf"],
    "fr": ["le", "la", "les", "et", "est", "pas", "pour", "dans", "que", "une"],
    "es": ["el", "la", "los", "las", "es", "no", "por", "para", "con", "una"],
    "zh": ["de5", "shi4", "bu4", "le5", "wo3", "ni3", "ta1", "men5", "zai4", "you3"],
}


def token_counts(sf_dir: str) -> "pa.Table":
    """Whitespace-token count per document (vectorized split+hash kernel —
    the count is len of each doc's token list, no Python row loop)."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def count(batch: pa.Table) -> pa.Table:
        _, offs = token_hashes(batch.column("text"), seed=0, lowercase=False)
        return pa.table(
            {"doc_id": batch.column("doc_id"),
             "n_tokens": pa.array(np.diff(offs).astype(np.int64))}
        )

    df = ds.map_batches(count, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    df = df.sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


_BPE_PAT = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def bpe_token_counts(sf_dir: str) -> pa.Table:
    """BPE-style pre-tokenizer counts per document (driver brief: 'token
    counting — whitespace + a BPE-ish regex'): runs of letters, runs of
    digits, and runs of other non-space symbols, GPT-2-pretokenizer-shaped.
    One vectorized regex pass per batch (polars/Rust), byte-identical
    semantics to the RE2 pattern the SQL oracle runs."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def count(batch: pa.Table) -> pa.Table:
        import polars as pl

        s = pl.from_arrow(batch.column("text").combine_chunks()).fill_null("")
        return pa.table(
            {"doc_id": batch.column("doc_id"),
             "n_bpe": pa.array(s.str.count_matches(_BPE_PAT).cast(pl.Int64).to_numpy()),
             "n_alpha_runs": pa.array(s.str.count_matches("[A-Za-z]+").cast(pl.Int64).to_numpy()),
             "n_digit_runs": pa.array(s.str.count_matches("[0-9]+").cast(pl.Int64).to_numpy())}
        )

    df = ds.map_batches(count, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    df = df.sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def quality_mask(batch: pa.Table) -> np.ndarray:
    """Per-doc quality predicate, vectorized: byte length in [50, 5000],
    ≥ 10 tokens, alpha ratio ≥ 0.6 in integers (10·alpha ≥ 6·len) so the
    Ray and SQL sides agree bit-for-bit. Shared by ``quality_filter`` and
    ``clean_corpus`` (which pushes it into its batch stages instead of
    materializing a survivor id set)."""
    data, offs = string_bytes_and_offsets(batch.column("text"))
    lens = np.diff(offs)
    is_alpha = ((data >= 65) & (data <= 90)) | ((data >= 97) & (data <= 122))
    cs = np.concatenate([[0], np.cumsum(is_alpha.astype(np.int64))])
    alpha = cs[offs[1:]] - cs[offs[:-1]]
    _, toffs = token_hashes(batch.column("text"), seed=0, lowercase=False)
    n_tok = np.diff(toffs)
    return (lens >= 50) & (lens <= 5000) & (n_tok >= 10) & (10 * alpha >= 6 * lens)


def quality_filter(sf_dir: str) -> pa.Table:
    """Quality gate query: doc_ids passing ``quality_mask``."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def gate(batch: pa.Table) -> pa.Table:
        keep = quality_mask(batch)
        return pa.table({"doc_id": pa.array(
            np.asarray(batch.column("doc_id"), dtype=np.int64)[keep])})

    df = ds.map_batches(gate, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    return pa.Table.from_pandas(
        df.sort_values("doc_id").reset_index(drop=True), preserve_index=False
    )


class _LangID:
    """Actor-pool language-ID stage: the marker token-hash table is built
    ONCE per actor in __init__ (stateful-stage pattern, SURVEY.md §2.8) and
    each batch is scored vectorized against it."""

    def __init__(self, seed: int = 0):
        self.langs = list(_LANG_MARKERS)
        marker_sets = []
        for lang in self.langs:
            h, _ = token_hashes(pa.array([" ".join(_LANG_MARKERS[lang])]), seed=seed)
            marker_sets.append(np.sort(np.unique(h)))
        self.marker_sets = marker_sets
        self.seed = seed

    def __call__(self, batch: pa.Table) -> pa.Table:
        h, offs = token_hashes(batch.column("text"), seed=self.seed)
        ndocs = len(offs) - 1
        scores = np.zeros((len(self.langs), ndocs), dtype=np.int64)
        doc_of_tok = np.repeat(np.arange(ndocs), np.diff(offs))
        for li, ms in enumerate(self.marker_sets):
            hit = np.isin(h, ms, assume_unique=False)
            np.add.at(scores[li], doc_of_tok[hit], 1)
        best = np.argmax(scores, axis=0)  # ties → first lang in fixed order
        pred = np.array(self.langs, dtype=object)[best]
        pred[scores.max(axis=0) == 0] = "unknown"
        return pa.table(
            {"doc_id": batch.column("doc_id"), "lang": batch.column("lang"),
             "lang_pred": pa.array(pred, type=pa.string())}
        )


def lang_id(sf_dir: str) -> pa.Table:
    """Stopword-marker language ID per document → confusion summary
    (lang, lang_pred, n). Heuristic ⇒ rows-only driver check; accuracy on
    en/de/fr/es asserted in pytest."""
    ds = read(sf_dir, "documents", ["doc_id", "text", "lang"])
    out = ds.map_batches(_LangID, batch_format="pyarrow", zero_copy_batch=True,
                         concurrency=(1, 4))
    df = out.to_pandas().groupby(["lang", "lang_pred"], as_index=False).size()
    df = df.rename(columns={"size": "n"}).sort_values(["lang", "lang_pred"])
    return pa.Table.from_pandas(df.reset_index(drop=True), preserve_index=False)


_FP_P = 2147483647  # Mersenne prime 2³¹−1
_FP_B = 1000003
_FP_POW_CACHE: dict[int, np.ndarray] = {}


def contamination_ngram(sf_dir: str, *, n: int = 5, seed: int = 61) -> pa.Table:
    """Train/test DECONTAMINATION: per document, the exact count of its
    distinct character n-grams that also occur anywhere in the
    event-stream text corpus (`events.props` — the benchmark/eval side a
    training corpus must not leak). Output is integer-exact
    (doc_id, n_shingles, n_hit); a cleaning pipeline thresholds
    n_hit/n_shingles to drop contaminated docs.

    Distributed shape: (1) the eval side's DISTINCT shingle-hash set via
    per-batch unique + combiner-first grouped distinct — only 8-byte
    hashes shuffle; the distinct set (vocabulary-sized) broadcasts once.
    At corpus scales where even the distinct-shingle set outgrows a
    broadcast, swap stage 2 for the keyed co-shuffle membership join
    (pattern: `_verify_pairs_jaccard_partitioned`). (2) one probe stage
    over documents: per-doc distinct shingles by one lexsort per batch,
    membership by searchsorted — no per-row loops, no floats. Byte
    shingles == character shingles is asserted (ASCII contract, as in the
    dedup oracles)."""
    import ray

    from ..stages.groupagg import grouped_aggregate
    from ..text import char_ngram_hashes

    def _ascii_guard(col) -> None:
        data, _ = string_bytes_and_offsets(col)
        if len(data) and int(data.max()) >= 128:
            raise ValueError("non-ASCII text: byte-shingle engine and "
                             "character-substring SQL oracle diverge")

    ev = read(sf_dir, "events", ["props"])

    def ev_shingles(batch: pa.Table) -> pa.Table:
        _ascii_guard(batch.column("props"))
        h, _ = char_ngram_hashes(batch.column("props"), n=n, seed=seed)
        return pa.table({"h": pa.array(np.unique(h).view(np.int64))})

    tset = grouped_aggregate(
        ev.map_batches(ev_shingles, batch_format="pyarrow", zero_copy_batch=True),
        ["h"], [("cnt", "count", None)],
    ).to_pandas()
    eval_set = np.sort(tset["h"].to_numpy().astype(np.int64)) if len(tset) else \
        np.empty(0, np.int64)
    ref = ray.put(eval_set)

    docs = read(sf_dir, "documents", ["doc_id", "text"])

    def probe(batch: pa.Table) -> pa.Table:
        _ascii_guard(batch.column("text"))
        eset = ray.get(ref)
        did = np.asarray(batch.column("doc_id").combine_chunks()).astype(np.int64)
        h, offs = char_ngram_hashes(batch.column("text"), n=n, seed=seed)
        ndocs = len(did)
        doc_of = np.repeat(np.arange(ndocs, dtype=np.int64), np.diff(offs))
        o = np.lexsort((h, doc_of))
        d_, h_ = doc_of[o], h[o].view(np.int64)
        uniq = np.concatenate([[True], (d_[1:] != d_[:-1]) | (h_[1:] != h_[:-1])]) \
            if len(d_) else np.empty(0, bool)
        du, hu = d_[uniq], h_[uniq]
        n_sh = np.bincount(du, minlength=ndocs)
        if len(eset):
            i = np.clip(np.searchsorted(eset, hu), 0, len(eset) - 1)
            hit = eset[i] == hu
        else:
            hit = np.zeros(len(hu), bool)
        n_hit = np.bincount(du[hit], minlength=ndocs)
        keep = n_sh > 0  # docs shorter than n have no shingles (SQL len>=n)
        return pa.table({"doc_id": pa.array(did[keep]),
                         "n_shingles": pa.array(n_sh[keep].astype(np.int64)),
                         "n_hit": pa.array(n_hit[keep].astype(np.int64))})

    df = docs.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    if df.empty or "doc_id" not in df.columns:
        return pa.table({"doc_id": pa.array([], type=pa.int64()),
                         "n_shingles": pa.array([], type=pa.int64()),
                         "n_hit": pa.array([], type=pa.int64())})
    df = df.sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def epoch_shuffle(sf_dir: str, *, n_epochs: int = 2, n_buckets: int = 16,
                  seed: int = 73) -> pa.Table:
    """Deterministic multi-epoch shard-local shuffle — the order a training
    loader replays data in: each epoch, every doc gets a fresh position
    ``(bucket, pos_in_bucket)`` where bucket routing is epoch-independent
    (shard residency is stable) and the within-bucket order is
    ``argsort(murmur64(doc_id ⊕ epoch_salt))`` (a new permutation each
    epoch).  Coordination-free and resume-safe: position depends only on
    (doc_id, epoch), never on partition order or visit sequence.  One
    keyed shuffle per corpus; the per-epoch argsorts run inside one kernel
    pass.  Global order = bucket-major — the standard shard-local shuffle
    a distributed loader uses instead of an all-to-all global sort."""
    from ..hashing import murmur64a_u64
    from ..stages.keyed import keyed_partition_map, run_starts

    ds = read(sf_dir, "documents", ["doc_id"])

    def tag(batch: pa.Table) -> pa.Table:
        did = np.asarray(batch.column("doc_id").combine_chunks()).astype(np.int64)
        bucket = (murmur64a_u64(did.view(np.uint64), seed=seed)
                  % np.uint64(n_buckets)).astype(np.int64)
        return pa.table({"doc_id": pa.array(did), "bucket": pa.array(bucket)})

    def kernel(t: pa.Table) -> pa.Table:
        did = np.asarray(t.column("doc_id").combine_chunks()).astype(np.int64)
        bucket = np.asarray(t.column("bucket").combine_chunks()).astype(np.int64)
        order = np.lexsort((did, bucket))
        did, bucket = did[order], bucket[order]
        starts = run_starts(bucket)
        bounds = np.append(starts, len(bucket))
        out_d, out_b, out_e, out_p = [], [], [], []
        for ep in range(n_epochs):
            pri = murmur64a_u64(did.view(np.uint64) ^ np.uint64(seed + 1000 * (ep + 1)),
                                seed=0)
            pos = np.empty(len(did), dtype=np.int64)
            for s, e in zip(bounds[:-1], bounds[1:]):
                # per-bucket permutation, tie-broken by doc_id exactly like
                # the oracle's ROW_NUMBER(ORDER BY priority, doc_id)
                perm = np.lexsort((did[s:e], pri[s:e]))
                pos[s:e][perm] = np.arange(e - s, dtype=np.int64)
            out_d.append(did)
            out_b.append(bucket)
            out_e.append(np.full(len(did), ep, dtype=np.int64))
            out_p.append(pos)
        return pa.table({"doc_id": pa.array(np.concatenate(out_d)),
                         "epoch": pa.array(np.concatenate(out_e)),
                         "bucket": pa.array(np.concatenate(out_b)),
                         "pos_in_bucket": pa.array(np.concatenate(out_p))})

    df = keyed_partition_map(
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True),
        ["bucket"], kernel,
    ).to_pandas()
    df = df.sort_values(["epoch", "doc_id"]).reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def dataset_split(sf_dir: str, *, val_permille: int = 10, test_permille: int = 10,
                  seed: int = 17) -> pa.Table:
    """Deterministic leakage-safe train/val/test assignment per document:
    bucket = murmur64(doc_id) % 1000, thresholded 980/10/10 by default.
    Partition-invariant and coordination-free — the same doc lands in the
    same split on any machine, any run, any shard layout (the property a
    training-data pipeline needs so re-runs never leak val/test docs into
    train). One vectorized hash per batch; bit-exact against the
    MurmurHash64A-in-SQL oracle (HUGEINT modular arithmetic, the same port
    the bottom-k samplers use)."""
    from ..hashing import murmur64a_u64

    ds = read(sf_dir, "documents", ["doc_id"])
    train_lim = 1000 - val_permille - test_permille
    val_lim = 1000 - test_permille
    names = np.array(["train", "val", "test"], dtype=object)

    def assign(batch: pa.Table) -> pa.Table:
        did = np.asarray(batch.column("doc_id").combine_chunks()).astype(np.int64)
        bucket = murmur64a_u64(did.view(np.uint64), seed=seed) % np.uint64(1000)
        code = (bucket >= train_lim).astype(np.int64) + (bucket >= val_lim)
        return pa.table({"doc_id": pa.array(did),
                         "split": pa.array(names[code], type=pa.string())})

    df = ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    df = df.sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def stratified_split_exact(sf_dir: str, *, train_permille: int = 800,
                           seed: int = 43) -> pa.Table:
    """EXACT-count stratified split: every language stratum contributes
    exactly ``floor(n_lang * 800 / 1000)`` documents to train — the
    per-stratum rank-based split real eval-set construction needs when
    proportional hashing (``stratified_sample_langs``) is not allowed to
    be off-by-a-few.  Members are the quota smallest (murmur(doc_id),
    doc_id) ranks per stratum, so membership is deterministic and
    coordination-free.

    Scale shape — distributed exact-rank selection (bucketed radix
    select), NEVER a per-stratum global sort: (1) one combiner-first
    (lang, bucket) histogram over the priority hash's top 12 bits (order-
    aligned, so bucket order == priority order); the driver folds the
    ≤ |langs|×4096 histogram into each stratum's BOUNDARY bucket and the
    exact rank still needed inside it; (2) one tagged pass partial-sums
    the decided rows (bucket strictly below/above the boundary) and
    forwards ONLY boundary-bucket rows (≈ n/4096 per stratum) to a tiny
    lang-keyed exchange where the exact intra-bucket ranks resolve.  The
    output carries per-(lang, split) doc_id sums, so the driver hash
    proves exact MEMBERSHIP, not just counts."""
    from ..hashing import murmur64a_u64
    from ..stages.groupagg import grouped_aggregate
    from ..stages.keyed import keyed_partition_map

    _SHIFT = np.uint64(52)  # 4096 order-aligned buckets
    ds = read(sf_dir, "documents", ["doc_id", "lang"])

    def hist(batch: pa.Table) -> pa.Table:
        import polars as pl

        did = np.asarray(batch.column("doc_id"), dtype=np.int64)
        b = (murmur64a_u64(did.view(np.uint64), seed=seed) >> _SHIFT) \
            .astype(np.int64)
        df = pl.DataFrame({
            "lang": np.asarray(batch.column("lang").combine_chunks(),
                               dtype=object),
            "bucket": b})
        return (df.group_by(["lang", "bucket"])
                .agg(n=pl.len().cast(pl.Int64)).to_arrow())

    h = grouped_aggregate(
        ds.map_batches(hist, batch_format="pyarrow", zero_copy_batch=True),
        ["lang", "bucket"], [("n", "sum", "n")]).to_pandas()

    bstar: dict[str, int] = {}
    need: dict[str, int] = {}
    for lang, g in h.groupby("lang"):
        g = g.sort_values("bucket")
        cum = g["n"].cumsum().to_numpy()
        quota = int(cum[-1]) * train_permille // 1000
        i = int(np.searchsorted(cum, quota, side="left"))
        if i >= len(cum):
            i = len(cum) - 1
        bstar[lang] = int(g["bucket"].iloc[i])
        need[lang] = quota - (int(cum[i - 1]) if i > 0 else 0)

    def route(batch: pa.Table) -> pa.Table:
        # ONE pass emits both legs (memory lesson: don't union two lineages
        # into an exchange): decided rows collapse to (lang, split)
        # partials; boundary rows pass through row-level for exact ranking
        import polars as pl

        did = np.asarray(batch.column("doc_id"), dtype=np.int64)
        pri = murmur64a_u64(did.view(np.uint64), seed=seed)
        b = (pri >> _SHIFT).astype(np.int64)
        lang = np.asarray(batch.column("lang").combine_chunks(), dtype=object)
        bl = np.array([bstar[x] for x in lang], dtype=np.int64) \
            if len(lang) else np.empty(0, np.int64)
        on_boundary = b == bl
        decided = ~on_boundary
        df = pl.DataFrame({
            "lang": lang[decided],
            "split": np.where(b[decided] < bl[decided], "train", "holdout"),
            "doc_id": did[decided]},
            schema_overrides={"lang": pl.Utf8, "split": pl.Utf8,
                              "doc_id": pl.Int64})
        partial = (df.group_by(["lang", "split"])
                   .agg(n_docs=pl.len().cast(pl.Int64),
                        doc_id_sum=pl.col("doc_id").sum().cast(pl.Int64)))
        rows = pl.DataFrame({
            "lang": lang[on_boundary],
            "split": np.full(int(on_boundary.sum()), "", dtype=object),
            "doc_id": did[on_boundary],
            "pri": pri[on_boundary].view(np.int64),
        }, schema_overrides={"lang": pl.Utf8, "split": pl.Utf8,
                             "doc_id": pl.Int64, "pri": pl.Int64})
        partial = partial.with_columns(
            doc_id=pl.lit(0, dtype=pl.Int64), pri=pl.lit(0, dtype=pl.Int64),
            is_partial=pl.lit(True))[
            ["lang", "split", "n_docs", "doc_id_sum", "doc_id", "pri",
             "is_partial"]]
        rows = rows.with_columns(
            n_docs=pl.lit(0, dtype=pl.Int64),
            doc_id_sum=pl.lit(0, dtype=pl.Int64),
            is_partial=pl.lit(False))[
            ["lang", "split", "n_docs", "doc_id_sum", "doc_id", "pri",
             "is_partial"]]
        return pl.concat([partial, rows]).to_arrow()

    tagged = ds.map_batches(route, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()

    import pyarrow.compute as pc

    decided = grouped_aggregate(
        tagged.map_batches(
            lambda t: t.filter(t.column("is_partial")).select(
                ["lang", "split", "n_docs", "doc_id_sum"]),
            batch_format="pyarrow", zero_copy_batch=True),
        ["lang", "split"],
        [("n_docs", "sum", "n_docs"), ("doc_id_sum", "sum", "doc_id_sum")],
    ).to_pandas()

    def rank_boundary(t: pa.Table) -> pa.Table:
        import polars as pl

        lang = np.asarray(t.column("lang").combine_chunks(), dtype=object)
        did = np.asarray(t.column("doc_id").combine_chunks(), dtype=np.int64)
        pri = np.asarray(t.column("pri").combine_chunks(),
                         dtype=np.int64).view(np.uint64)
        out_lang, out_split, out_n, out_sum = [], [], [], []
        for lg in pd.unique(lang):
            m = lang == lg
            d, p = did[m], pri[m]
            o = np.lexsort((d, p))
            k = need[lg]
            for split, sel in (("train", o[:k]), ("holdout", o[k:])):
                if len(sel):
                    out_lang.append(lg)
                    out_split.append(split)
                    out_n.append(len(sel))
                    out_sum.append(int(d[sel].sum()))
        return pa.table({"lang": pa.array(out_lang, type=pa.string()),
                         "split": pa.array(out_split, type=pa.string()),
                         "n_docs": pa.array(out_n, type=pa.int64()),
                         "doc_id_sum": pa.array(out_sum, type=pa.int64())})

    boundary = keyed_partition_map(
        tagged.map_batches(
            lambda t: t.filter(pc.invert(
                t.column("is_partial").combine_chunks())).select(
                ["lang", "doc_id", "pri"]),
            batch_format="pyarrow", zero_copy_batch=True),
        ["lang"], rank_boundary).to_pandas()

    out = (pd.concat([decided, boundary], ignore_index=True)
           .groupby(["lang", "split"], as_index=False)
           .agg(n_docs=("n_docs", "sum"), doc_id_sum=("doc_id_sum", "sum"))
           .sort_values(["lang", "split"]).reset_index(drop=True))
    out["n_docs"] = out["n_docs"].astype(np.int64)
    out["doc_id_sum"] = out["doc_id_sum"].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


def stratified_sample_langs(sf_dir: str, *, seed: int = 29) -> pa.Table:
    """Stratified deterministic sampling with PER-STRATUM rates — the
    language-rebalancing step of a multilingual corpus mix (downsample the
    dominant language, keep low-resource ones): doc survives iff
    murmur64(doc_id) % 1000 < rate_permille[lang]. Coordination-free and
    partition-invariant like ``dataset_split`` (same hash, different
    seed), so the sample is reproducible across runs and shard layouts —
    no global sort, no sampling state, one vectorized hash per batch.
    Returns the surviving (doc_id, lang) rows."""
    from ..hashing import murmur64a_u64

    rates = {"en": 100, "de": 500, "es": 500, "fr": 500, "zh": 500}
    default = 250

    ds = read(sf_dir, "documents", ["doc_id", "lang"])

    def keep(batch: pa.Table) -> pa.Table:
        did = np.asarray(batch.column("doc_id").combine_chunks()).astype(np.int64)
        lang = np.asarray(batch.column("lang").combine_chunks(), dtype=object)
        bucket = murmur64a_u64(did.view(np.uint64), seed=seed) % np.uint64(1000)
        lim = np.full(len(did), default, dtype=np.uint64)
        for lg, r in rates.items():
            lim[lang == lg] = r
        return batch.filter(pa.array(bucket < lim))

    df = ds.map_batches(keep, batch_format="pyarrow",
                        zero_copy_batch=True).to_pandas()
    df = df.sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def _stratified_split_exact_sql() -> str:
    from .sketchq import _MURMUR_SQL

    return (
        "WITH u AS (SELECT CAST(doc_id AS HUGEINT) AS k64, doc_id, lang "
        "FROM documents), "
        + _MURMUR_SQL.format(seed=43)
        + ", r AS (SELECT doc_id, lang, "
        "ROW_NUMBER() OVER (PARTITION BY lang ORDER BY priority, doc_id) AS rn, "
        "COUNT(*) OVER (PARTITION BY lang) AS tot FROM mmf) "
        "SELECT lang, CASE WHEN rn <= (tot * 800) // 1000 THEN 'train' "
        "ELSE 'holdout' END AS split, COUNT(*) AS n_docs, "
        "CAST(SUM(doc_id) AS BIGINT) AS doc_id_sum "
        "FROM r GROUP BY 1, 2 ORDER BY lang, split"
    )


def _stratified_sample_sql() -> str:
    from .sketchq import _MURMUR_SQL

    return (
        "WITH u AS (SELECT CAST(doc_id AS HUGEINT) AS k64, doc_id, lang FROM documents), "
        + _MURMUR_SQL.format(seed=29)
        + " SELECT doc_id, lang FROM mmf WHERE priority % 1000 < "
        "(CASE lang WHEN 'en' THEN 100 WHEN 'de' THEN 500 WHEN 'es' THEN 500 "
        "WHEN 'fr' THEN 500 WHEN 'zh' THEN 500 ELSE 250 END) "
        "ORDER BY doc_id"
    )


def repetition_stats(sf_dir: str, *, n: int = 5, seed: int = 61) -> pa.Table:
    """Within-document repetition signal (the Gopher-style quality rule
    "drop docs whose n-grams repeat excessively"): per doc, the total and
    DISTINCT character n-gram counts — a cleaning pipeline thresholds
    n_distinct/n_total. Integer-exact, one lexsort per batch, no shuffle
    at all (the measure is per-doc-local). ASCII contract asserted, as in
    the other shingle oracles."""
    from ..text import char_ngram_hashes

    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def stats(batch: pa.Table) -> pa.Table:
        data, _ = string_bytes_and_offsets(batch.column("text"))
        if len(data) and int(data.max()) >= 128:
            raise ValueError("non-ASCII text: byte-shingle engine and "
                             "character-substring SQL oracle diverge")
        did = np.asarray(batch.column("doc_id").combine_chunks()).astype(np.int64)
        h, offs = char_ngram_hashes(batch.column("text"), n=n, seed=seed)
        ndocs = len(did)
        n_total = np.diff(offs)
        doc_of = np.repeat(np.arange(ndocs, dtype=np.int64), n_total)
        o = np.lexsort((h, doc_of))
        d_, h_ = doc_of[o], h[o].view(np.int64)
        uniq = np.concatenate([[True], (d_[1:] != d_[:-1]) | (h_[1:] != h_[:-1])]) \
            if len(d_) else np.empty(0, bool)
        n_dist = np.bincount(d_[uniq], minlength=ndocs)
        keep = n_total > 0
        return pa.table({"doc_id": pa.array(did[keep]),
                         "n_total": pa.array(n_total[keep].astype(np.int64)),
                         "n_distinct": pa.array(n_dist[keep].astype(np.int64))})

    df = ds.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    df = df.sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def _fp_powers(maxlen: int) -> np.ndarray:
    """B^k mod P table (cached per process; built once per actor)."""
    cached = _FP_POW_CACHE.get(0)
    if cached is None or len(cached) <= maxlen:
        size = max(maxlen + 1, 8192)
        pw = np.empty(size, dtype=np.uint64)
        pw[0] = 1
        for i in range(1, size):
            pw[i] = (pw[i - 1] * _FP_B) % _FP_P
        _FP_POW_CACHE[0] = pw
        cached = pw
    return cached


def doc_fingerprints(sf_dir: str) -> pa.Table:
    """Polynomial rolling-hash content fingerprint per document:
    fp = Σ byteᵢ·B^(L−1−i) mod P (Horner form, P = 2³¹−1, B = 1000003),
    vectorized over the batch's concatenated byte buffer with a power
    table + segmented cumsum (no per-document Python loop). The same
    recurrence is expressible in SQL via ``list_reduce`` — this is the
    oracle-checkable deterministic fingerprint (SimHash near-dup
    fingerprints live in :func:`simhash_near_dups`)."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def fp(batch: pa.Table) -> pa.Table:
        data, offs = string_bytes_and_offsets(batch.column("text"))
        if len(data) and int(data.max()) >= 128:
            raise ValueError("non-ASCII text: byte fingerprint and "
                             "character-based SQL oracle diverge")
        lens = np.diff(offs)
        pw = _fp_powers(int(lens.max()) if len(lens) else 0)
        # exponent of byte j in doc d: end(d) - 1 - j
        exps = np.repeat(offs[1:], lens) - 1 - np.arange(len(data), dtype=np.int64)
        terms = (data.astype(np.uint64) * pw[exps]) % _FP_P
        cs = np.zeros(len(data) + 1, dtype=np.uint64)
        np.cumsum(terms, out=cs[1:])
        fps = ((cs[offs[1:]] - cs[offs[:-1]]) % _FP_P).astype(np.int64)
        return pa.table(
            {"doc_id": batch.column("doc_id"), "fingerprint": pa.array(fps)}
        )

    df = ds.map_batches(fp, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    return pa.Table.from_pandas(
        df.sort_values("doc_id").reset_index(drop=True), preserve_index=False
    )


def tfidf_top_terms(sf_dir: str, *, k: int = 3) -> pa.Table:
    """Top-k terms per document by tf·idf — the corpus-statistics text
    operator (feature extraction for retrieval/quality pipelines).

    idf is QUANTIZED to integer milli-idf: ``idf_int = (N·1000) // df`` and
    ``score = tf · idf_int`` — integer-exact on both engines, so ranking
    (score DESC, term ASC) is bit-identical to the SQL oracle with no
    float-libm tie hazards. Shape: per-batch tf (docs never span batches →
    batch-local tf is final), distributed df count over the (doc, term)
    rows, df map broadcast once, then a keyed-partition top-k kernel per
    doc (sort + run-boundary take, no per-doc calls)."""
    import ray

    from ..stages.groupagg import grouped_aggregate
    from ..stages.keyed import keyed_partition_map, run_ids

    ds = read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = ds.count()

    def tf_partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        df_ = pl.DataFrame(
            {
                "doc_id": pl.from_arrow(batch.column("doc_id").combine_chunks()),
                "t": pl.from_arrow(batch.column("text").combine_chunks()).str.to_lowercase(),
            }
        )
        out = (
            df_.with_columns(pl.col("t").str.extract_all(r"\S+").alias("term"))
            .select("doc_id", "term")
            .explode("term")
            .drop_nulls()
            .group_by(["doc_id", "term"])
            .agg(pl.len().cast(pl.Int64).alias("tf"))
        )
        return out.to_arrow()

    tf_ds = ds.map_batches(tf_partial, batch_format="pyarrow", zero_copy_batch=True)
    df_tbl = (
        grouped_aggregate(tf_ds, ["term"], [("df", "count", None)])
        .to_pandas()
        .sort_values("term")
    )
    terms_sorted = df_tbl["term"].to_numpy()
    idf_int = (np.int64(n_docs) * 1000) // df_tbl["df"].to_numpy().astype(np.int64)
    ref = ray.put((terms_sorted, idf_int))

    def score(batch: pa.Table) -> pa.Table:
        ts, idf = ray.get(ref)
        term = np.asarray(batch.column("term").combine_chunks())
        tf = np.asarray(batch.column("tf").combine_chunks()).astype(np.int64)
        pos = np.searchsorted(ts, term)
        return batch.append_column("score", pa.array(tf * idf[pos]))

    def topk_kernel(t: pa.Table) -> pa.Table:
        did = np.asarray(t.column("doc_id").combine_chunks()).astype(np.int64)
        term = np.asarray(t.column("term").combine_chunks())
        sc = np.asarray(t.column("score").combine_chunks()).astype(np.int64)
        order = np.lexsort((term, -sc, did))
        d, te, s = did[order], term[order], sc[order]
        rid, starts, lens = run_ids(d)
        within = np.arange(len(d), dtype=np.int64) - starts[rid]
        keep = within < k
        return pa.table(
            {
                "doc_id": pa.array(d[keep]),
                "rank": pa.array(within[keep] + 1),
                "term": pa.array(te[keep], type=pa.string()),
                "score": pa.array(s[keep]),
            }
        )

    scored = tf_ds.map_batches(score, batch_format="pyarrow")
    out = keyed_partition_map(scored, ["doc_id"], topk_kernel, num_partitions=16)
    df = out.to_pandas().sort_values(["doc_id", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def vocab_top_terms_by_lang(sf_dir: str, *, k: int = 10) -> pa.Table:
    """Per-language top-k vocabulary — GROUPED top-k over text keys (the
    multilingual variant of ``vocab_top_terms``). Same combiner-first
    term aggregation (per-batch polars group_by on (lang, term), exchange
    carries vocab-scale partials only); the per-group top-k then runs as
    ONE vectorized lexsort + run-offset rank inside the keyed final merge
    — no per-group Python, no global sort of the vocabulary."""
    from ..stages.groupagg import grouped_aggregate
    from ..stages.keyed import keyed_partition_map, run_starts

    ds = read(sf_dir, "documents", ["lang", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        df_ = pl.DataFrame({
            "lang": pl.from_arrow(batch.column("lang").combine_chunks()),
            "t": pl.from_arrow(batch.column("text").combine_chunks())
            .str.to_lowercase(),
        })
        return (df_.with_columns(pl.col("t").str.extract_all(r"\S+")
                                 .alias("term"))
                .select("lang", "term").explode("term").drop_nulls()
                .group_by(["lang", "term"])
                .agg(pl.len().cast(pl.Int64).alias("tf_part"))).to_arrow()

    agg = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["lang", "term"], [("tf_total", "sum", "tf_part")],
    )

    def topk(t: pa.Table) -> pa.Table:
        lang = np.asarray(t.column("lang").combine_chunks(), dtype=object)
        term = np.asarray(t.column("term").combine_chunks(), dtype=object)
        tf = np.asarray(t.column("tf_total").combine_chunks(), dtype=np.int64)
        order = np.lexsort((term, -tf, lang))
        lang, term, tf = lang[order], term[order], tf[order]
        # rank within each lang run = offset from the run start
        changed = np.ones(len(lang), dtype=bool)
        if len(lang) > 1:
            changed[1:] = lang[1:] != lang[:-1]
        starts = np.flatnonzero(changed)
        lens = np.diff(np.append(starts, len(lang)))
        rank = np.arange(len(lang), dtype=np.int64) - np.repeat(starts, lens) + 1
        keep = rank <= k
        return pa.table({
            "lang": pa.array(lang[keep], type=pa.string()),
            "rank": pa.array(rank[keep]),
            "term": pa.array(term[keep], type=pa.string()),
            "tf_total": pa.array(tf[keep]),
        })

    out = keyed_partition_map(agg, ["lang"], topk).to_pandas()
    out = out.sort_values(["lang", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def vocab_top_terms(sf_dir: str, *, k: int = 50) -> pa.Table:
    """Corpus vocabulary statistics: the top-k terms by total occurrence
    count, with document frequency — the global-vocab profile a
    training-data pipeline uses for tokenizer fitting / stopword
    discovery / contamination triage.

    Combiner-first shape (the only scale-correct one): each batch
    pre-aggregates its tokens to per-term ``(tf_part, df_part)`` rows
    (one vectorized polars group_by per batch), so the all-to-all
    exchange carries |blocks| × |vocab| partial rows, never the token
    stream. Per-batch df partials sum exactly because a document never
    spans batches (same invariant ``tfidf_top_terms`` relies on). The
    final top-k runs on the vocabulary-sized aggregate only."""
    from ..stages.groupagg import grouped_aggregate

    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        df_ = pl.DataFrame(
            {
                "doc_id": pl.from_arrow(batch.column("doc_id").combine_chunks()),
                "t": pl.from_arrow(batch.column("text").combine_chunks()).str.to_lowercase(),
            }
        )
        out = (
            df_.with_columns(pl.col("t").str.extract_all(r"\S+").alias("term"))
            .select("doc_id", "term")
            .explode("term")
            .drop_nulls()
            .group_by("term")
            .agg(
                pl.len().cast(pl.Int64).alias("tf_part"),
                pl.col("doc_id").n_unique().cast(pl.Int64).alias("df_part"),
            )
        )
        return out.to_arrow()

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = grouped_aggregate(
        partials, ["term"],
        [("tf_total", "sum", "tf_part"), ("df", "sum", "df_part")],
    ).to_pandas()
    if agg.empty or "term" not in agg.columns:
        return pa.table({"rank": pa.array([], type=pa.int64()),
                         "term": pa.array([], type=pa.string()),
                         "tf_total": pa.array([], type=pa.int64()),
                         "df": pa.array([], type=pa.int64())})
    agg = agg.sort_values(["tf_total", "term"], ascending=[False, True]).head(k)
    agg.insert(0, "rank", np.arange(1, len(agg) + 1, dtype=np.int64))
    return pa.Table.from_pandas(agg.reset_index(drop=True), preserve_index=False)


def bigram_top_pairs(sf_dir: str, *, k: int = 50) -> pa.Table:
    """Top-k adjacent-token bigrams over the corpus (collocation /
    boilerplate-phrase discovery). Same combiner-first plan as
    :func:`vocab_top_terms`: tokens explode inside the batch, the
    within-document next-token pairing is one vectorized ``shift(-1)
    over doc_id`` (order-preserving — a document's tokens stay
    contiguous and in order through explode), and only per-batch
    ``(bigram, n_part)`` partials enter the exchange."""
    from ..stages.groupagg import grouped_aggregate

    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        df_ = pl.DataFrame(
            {
                "doc_id": pl.from_arrow(batch.column("doc_id").combine_chunks()),
                "t": pl.from_arrow(batch.column("text").combine_chunks()).str.to_lowercase(),
            }
        )
        ex = (
            df_.with_columns(pl.col("t").str.extract_all(r"\S+").alias("term"))
            .select("doc_id", "term")
            .explode("term")
            .drop_nulls()
            .with_columns(pl.col("term").shift(-1).over("doc_id").alias("nxt"))
            .drop_nulls()
            .with_columns(
                pl.concat_str([pl.col("term"), pl.col("nxt")], separator=" ").alias("bigram")
            )
        )
        return ex.group_by("bigram").agg(
            pl.len().cast(pl.Int64).alias("n_part")
        ).to_arrow()

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = grouped_aggregate(partials, ["bigram"], [("n", "sum", "n_part")]).to_pandas()
    if agg.empty or "bigram" not in agg.columns:
        return pa.table({"rank": pa.array([], type=pa.int64()),
                         "bigram": pa.array([], type=pa.string()),
                         "n": pa.array([], type=pa.int64())})
    agg = agg.sort_values(["n", "bigram"], ascending=[False, True]).head(k)
    agg.insert(0, "rank", np.arange(1, len(agg) + 1, dtype=np.int64))
    return pa.Table.from_pandas(agg.reset_index(drop=True), preserve_index=False)


def length_band_filter(sf_dir: str, *, lo_q: float = 0.05, hi_q: float = 0.95) -> pa.Table:
    """Percentile-band outlier filter: keep documents whose length sits
    within the EXACT [p5, p95] order statistics of the corpus — the
    two-pass global-statistic-then-filter shape every threshold-from-data
    cleaning rule uses. Pass 1 finds the two order statistics from the
    distributed sort with a bounded take (``split_at_indices`` + one-row
    reads — the same streaming pattern as ``value_quantiles_exact``,
    never a full materialization); pass 2 is a stateless vectorized
    gate with the two ints broadcast in the closure. Integer-exact, so
    the ROW_NUMBER-order-statistic oracle matches bit-for-bit."""
    ds = read(sf_dir, "documents", ["n_chars"])
    n = ds.count()
    lo_i = int(np.floor(lo_q * (n - 1)))
    hi_i = int(np.floor(hi_q * (n - 1)))
    splits = ds.sort("n_chars").split_at_indices([lo_i, hi_i])
    lo = int(splits[1].take(1)[0]["n_chars"])
    hi = int(splits[2].take(1)[0]["n_chars"])

    docs = read(sf_dir, "documents", ["doc_id", "n_chars"])

    def gate(batch: pa.Table) -> pa.Table:
        nc = np.asarray(batch.column("n_chars").combine_chunks()).astype(np.int64)
        did = np.asarray(batch.column("doc_id").combine_chunks()).astype(np.int64)
        m = (nc >= lo) & (nc <= hi)
        return pa.table({"doc_id": pa.array(did[m])})

    df = docs.map_batches(gate, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    df = df.sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def _marker_list(lang: str) -> str:
    return ", ".join(f"'{w}'" for w in _LANG_MARKERS[lang])


_GREATEST = "GREATEST(s_en, s_de, s_fr, s_es, s_zh)"

_LANG_ID_SQL = (
    "WITH toks AS (SELECT lang, regexp_extract_all(lower(text), '\\S+') AS w FROM documents), "
    "sc AS (SELECT lang, "
    + ", ".join(
        f"length(list_filter(w, x -> x IN ({_marker_list(lang)}))) AS s_{lang}"
        for lang in ("en", "de", "fr", "es", "zh")
    )
    + " FROM toks), "
    "pred AS (SELECT lang, CASE "
    f"WHEN {_GREATEST} = 0 THEN 'unknown' "
    f"WHEN s_en = {_GREATEST} THEN 'en' "
    f"WHEN s_de = {_GREATEST} THEN 'de' "
    f"WHEN s_fr = {_GREATEST} THEN 'fr' "
    f"WHEN s_es = {_GREATEST} THEN 'es' "
    "ELSE 'zh' END AS lang_pred FROM sc) "
    "SELECT lang, lang_pred, COUNT(*) AS n FROM pred "
    "GROUP BY lang, lang_pred ORDER BY lang, lang_pred"
)

def _murmur_block(seed: int, prefix: str, src: str) -> str:
    """The murmur-in-SQL CTE chain with PREFIXED cte names and a custom
    source table, so one WITH clause can hold several independent murmur
    computations (epoch_shuffle needs bucket + one priority per epoch)."""
    from .sketchq import _MURMUR_SQL

    s = _MURMUR_SQL.format(seed=seed)
    for name in ("consts", "mmf", "mm0", "mm1", "mm2", "mm3", "mm4", "mm5", "mm6", "mm7"):
        s = s.replace(name, prefix + name)
    return s.replace("FROM u, ", f"FROM {src}, ").replace("u.*", f"{src}.*") \
            .replace("u.k64", f"{src}.k64")


def _epoch_shuffle_sql(n_epochs: int = 2, n_buckets: int = 16, seed: int = 73) -> str:
    parts = [
        "WITH bsrc AS (SELECT CAST(doc_id AS HUGEINT) AS k64, doc_id FROM documents), ",
        _murmur_block(seed, "b", "bsrc"),
        f", bk AS (SELECT doc_id, CAST(priority % {n_buckets} AS BIGINT) AS bucket FROM bmmf)",
    ]
    unions = []
    for ep in range(n_epochs):
        salt = seed + 1000 * (ep + 1)
        p = f"e{ep}"
        parts.append(
            f", {p}src AS (SELECT xor(CAST(doc_id AS HUGEINT), {salt}) AS k64, doc_id FROM documents), "
            + _murmur_block(0, p, f"{p}src")
            + f", {p} AS (SELECT doc_id, CAST({ep} AS BIGINT) AS epoch, priority FROM {p}mmf)"
        )
        unions.append(f"SELECT * FROM {p}")
    parts.append(
        ", pos AS (SELECT e.doc_id, e.epoch, b.bucket, "
        "ROW_NUMBER() OVER (PARTITION BY e.epoch, b.bucket ORDER BY e.priority, e.doc_id) - 1 "
        "AS pos_in_bucket FROM (" + " UNION ALL ".join(unions) + ") e JOIN bk b USING (doc_id)) "
        "SELECT doc_id, epoch, bucket, CAST(pos_in_bucket AS BIGINT) AS pos_in_bucket "
        "FROM pos ORDER BY epoch, doc_id"
    )
    return "".join(parts)


def _dataset_split_sql() -> str:
    from .sketchq import _MURMUR_SQL

    return (
        "WITH u AS (SELECT CAST(doc_id AS HUGEINT) AS k64, doc_id FROM documents), "
        + _MURMUR_SQL.format(seed=17)
        + " SELECT doc_id, CASE WHEN priority % 1000 < 980 THEN 'train' "
        "WHEN priority % 1000 < 990 THEN 'val' ELSE 'test' END AS split "
        "FROM mmf ORDER BY doc_id"
    )


def table_checksum(sf_dir: str) -> pa.Table:
    """Order-invariant corpus checksum — the integrity primitive for
    verifying a migration / replication / rewrite of a 100 TB table
    without sorting it: per row, murmur64 of a (doc_id, n_chars) key; the
    table digest is the XOR of all row hashes (commutative + associative
    ⇒ partition- and order-invariant, any single-row change flips the
    digest).  Per-batch XOR partials stream; the driver folds |blocks|
    scalars.  Bit-exact against the murmur-in-SQL oracle."""
    from ..hashing import murmur64a_u64

    ds = read(sf_dir, "documents", ["doc_id", "n_chars"])

    def part(batch: pa.Table) -> pa.Table:
        did = np.asarray(batch.column("doc_id").combine_chunks()).astype(np.int64)
        nch = np.asarray(batch.column("n_chars").combine_chunks()).astype(np.int64)
        key = (did * 1000003 + nch).astype(np.uint64)
        h = murmur64a_u64(key, 23)
        x = np.bitwise_xor.reduce(h) if len(h) else np.uint64(0)
        return pa.table({"x": pa.array([np.int64(x.astype(np.int64))]),
                         "n": pa.array([len(h)], type=pa.int64())})

    parts = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    digest = np.bitwise_xor.reduce(parts["x"].to_numpy().astype(np.int64)) if len(parts) else np.int64(0)
    return pa.table({"checksum": pa.array([int(digest)], type=pa.int64()),
                     "n_rows": pa.array([int(parts["n"].sum())], type=pa.int64())})


_REDACT_RE = r"\b(customer|spark|vector)\b"


def redact_terms(sf_dir: str) -> pa.Table:
    """Deny-list redaction (the PII-scrub shape: a dictionary of terms —
    names, identifiers — replaced corpus-wide before training): per doc,
    the number of redactions and the scrubbed length after each match
    becomes ``[X]``.  Pure row-wise map — zero shuffle, streams at any
    scale; the regex is compiled once per polars kernel, the engine and
    the RE2 oracle evaluate the identical word-boundary pattern."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def scrub(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(batch)
        out = df.select(
            pl.col("doc_id"),
            n_redacted=pl.col("text").str.count_matches(_REDACT_RE).cast(pl.Int64),
            scrubbed_len=pl.col("text").str.replace_all(_REDACT_RE, "[X]")
            .str.len_chars().cast(pl.Int64),
        )
        return out.to_arrow()

    df = ds.map_batches(scrub, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    return pa.Table.from_pandas(
        df.sort_values("doc_id").reset_index(drop=True), preserve_index=False
    )


def lexical_diversity(sf_dir: str) -> pa.Table:
    """Per-document type/token lexical-diversity profile (a standard
    corpus quality signal next to ``quality_filter``'s length gates):
    token count, distinct-token count, the modal token's frequency, and
    an integer type-token ratio in milli-units — all integer-exact, so
    the SQL oracle matches bit-for-bit.  Row-wise per doc (documents
    never straddle batches): one vectorized polars explode + two-level
    group_by per batch, zero shuffle."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def profile(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(batch)
        toks = (
            df.select("doc_id", tok=pl.col("text").str.split(" "))
            .explode("tok")
            .group_by("doc_id", "tok").agg(n=pl.len().cast(pl.Int64))
        )
        out = toks.group_by("doc_id").agg(
            n_tokens=pl.col("n").sum(),
            n_types=pl.len().cast(pl.Int64),
            top_token_n=pl.col("n").max(),
        ).with_columns(
            ttr_milli=(pl.col("n_types") * 1000) // pl.col("n_tokens"),
        )
        return out.to_arrow()

    df = ds.map_batches(profile, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    return pa.Table.from_pandas(
        df.sort_values("doc_id").reset_index(drop=True), preserve_index=False
    )


def char_entropy(sf_dir: str) -> pa.Table:
    """Per-document character-level Shannon entropy — the classic
    gibberish / encoding-noise quality signal (low entropy = repeated
    filler, high = random bytes). Fully vectorized SEGMENTED kernel with
    no per-doc loop: every byte of the batch maps to a
    ``doc_index*256 + byte`` key, ONE ``np.unique`` yields all per-doc
    histograms at once, and a weighted ``bincount`` folds the
    ``-p·log2 p`` terms back per doc. Zero shuffle (row-wise per doc);
    6-dp rounding absorbs summation-order float jitter vs the oracle."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def ent(batch: pa.Table) -> pa.Table:
        data, offs = string_bytes_and_offsets(batch.column("text"))
        lens = np.diff(offs)
        n = len(lens)
        doc = np.repeat(np.arange(n, dtype=np.int64), lens)
        uniq, counts = np.unique(doc * 256 + data.astype(np.int64),
                                 return_counts=True)
        d_idx = uniq >> 8
        p = counts / lens[d_idx].astype(np.float64)
        h = np.bincount(d_idx, weights=-(p * np.log2(p)), minlength=n)
        h[lens == 0] = 0.0
        from .common import round_col

        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_chars": pa.array(lens.astype(np.int64)),
            "entropy": pa.array(round_col(h, 6)),
        })

    df = ds.map_batches(ent, batch_format="pyarrow",
                        zero_copy_batch=True).to_pandas()
    return pa.Table.from_pandas(df.sort_values("doc_id").reset_index(drop=True),
                                preserve_index=False)


def unigram_logprob(sf_dir: str) -> pa.Table:
    """CCNet-style LM-proxy quality scoring: fit a corpus unigram model
    (distributed combiner-first token counts — pass 1), broadcast it once
    (``ray.put``), and score every document by its mean token log2-prob
    (pass 2, an actor-pool stage holding the model). The distributed
    shape of real perplexity filtering — swap the unigram table for a
    real LM without touching the plumbing. Scale note: at web scale the
    broadcast vocabulary is capped to top-V with an OOV floor; this
    corpus's vocab is tiny so the model is exact."""
    import ray

    from ..stages.groupagg import grouped_aggregate

    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def tok_partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        return (pl.from_arrow(batch.select(["text"]))
                .select(tok=pl.col("text").str.split(" "))
                .explode("tok").filter(pl.col("tok") != "")
                .group_by("tok").agg(n=pl.len().cast(pl.Int64))).to_arrow()

    vocab = grouped_aggregate(
        ds.map_batches(tok_partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["tok"], [("n", "sum", "n")],
    ).to_pandas()
    total = float(vocab["n"].sum())
    import polars as pl

    model = pl.DataFrame({
        "tok": vocab["tok"].to_numpy(object),
        "lp": np.log2(vocab["n"].to_numpy(np.float64) / total),
    })
    ref = ray.put(model)

    class Score:
        def __init__(self, r):
            self.model = ray.get(r)

        def __call__(self, batch: pa.Table) -> pa.Table:
            import polars as pl

            ex = (pl.from_arrow(batch.select(["doc_id", "text"]))
                  .select("doc_id", tok=pl.col("text").str.split(" "))
                  .explode("tok").filter(pl.col("tok") != ""))
            scored = ex.join(self.model, on="tok", how="left")
            out = scored.group_by("doc_id").agg(
                n_tokens=pl.len().cast(pl.Int64),
                avg_logprob=pl.col("lp").mean(),
            )
            return out.to_arrow()

    df = ds.map_batches(Score, fn_constructor_args=(ref,),
                        batch_format="pyarrow",
                        concurrency=(1, 8)).to_pandas()
    from .common import round_col

    df["avg_logprob"] = round_col(df["avg_logprob"], 6)
    return pa.Table.from_pandas(df.sort_values("doc_id").reset_index(drop=True),
                                preserve_index=False)


def source_quality_profile(sf_dir: str) -> pa.Table:
    """Corpus-triage rollup: per (source, lang) document count,
    quality-gate pass count (shared ``quality_mask`` predicate) and
    integer-exact centi-unit mean length — the table a pipeline operator
    reads to decide which sources to keep, reweight, or drop. One
    combiner-first group-by; integers end-to-end so the oracle matches
    bit-for-bit."""
    from ..stages.groupagg import grouped_aggregate

    ds = read(sf_dir, "documents", ["doc_id", "text", "lang", "source",
                                    "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        m = quality_mask(batch)
        df = pl.from_arrow(batch.select(["source", "lang", "n_chars"]))
        df = df.with_columns(passed=pl.Series(m.astype(np.int64)))
        return (df.group_by(["source", "lang"])
                .agg(n_docs=pl.len().cast(pl.Int64),
                     n_pass=pl.col("passed").sum(),
                     sum_chars=pl.col("n_chars").sum().cast(pl.Int64))
                ).to_arrow()

    out = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["source", "lang"],
        [("n_docs", "sum", "n_docs"), ("n_pass", "sum", "n_pass"),
         ("sum_chars", "sum", "sum_chars")],
    )
    df = out.to_pandas()
    df["avg_chars_centi"] = (df.pop("sum_chars").to_numpy(np.int64) * 100
                             // df["n_docs"].to_numpy(np.int64))
    df = df.sort_values(["source", "lang"]).reset_index(drop=True)
    return pa.Table.from_pandas(
        df[["source", "lang", "n_docs", "n_pass", "avg_chars_centi"]],
        preserve_index=False)


def length_quartile_by_source(sf_dir: str) -> pa.Table:
    """Per-group exact NTILE: within each source, docs are bucketed into
    4 equal-count quartiles by (n_chars, doc_id) — the per-group variant
    of ``range_partition_stats``'s global partitioner, and the building
    block of per-domain curriculum bucketing. One keyed shuffle on
    source; the kernel replicates SQL NTILE's remainder rule exactly
    (first n mod 4 buckets get the extra row), so the oracle matches
    bit-for-bit. Output is groups × 4 rows."""
    from ..stages.groupagg import grouped_aggregate
    from ..stages.keyed import keyed_partition_map

    ds = read(sf_dir, "documents", ["doc_id", "source", "n_chars"])

    def kernel(t: pa.Table) -> pa.Table:
        import polars as pl

        df = (pl.from_arrow(t)
              .sort(["source", "n_chars", "doc_id"])
              .with_columns(n=pl.len().over("source"),
                            rk=pl.int_range(pl.len()).over("source")))
        n = df["n"].to_numpy().astype(np.int64)
        rk = df["rk"].to_numpy().astype(np.int64)
        q, r = n // 4, n % 4
        cut = r * (q + 1)
        big = rk < cut
        bucket = np.where(big, rk // np.maximum(q + 1, 1),
                          r + (rk - cut) // np.maximum(q, 1)) + 1
        out = df.with_columns(quartile=pl.Series(bucket.astype(np.int64)))
        return (out.group_by(["source", "quartile"])
                .agg(n_docs=pl.len().cast(pl.Int64),
                     min_chars=pl.col("n_chars").min().cast(pl.Int64),
                     max_chars=pl.col("n_chars").max().cast(pl.Int64))
                ).to_arrow()

    parts = keyed_partition_map(ds, ["source"], kernel)
    out = grouped_aggregate(parts, ["source", "quartile"],
                            [("n_docs", "sum", "n_docs"),
                             ("min_chars", "min", "min_chars"),
                             ("max_chars", "max", "max_chars")])
    return pa.Table.from_pandas(
        out.to_pandas().sort_values(["source", "quartile"])
        .reset_index(drop=True), preserve_index=False)


_BM25_TERMS = ("table", "query", "spark")
_BM25_K1, _BM25_B = 1.2, 0.75


def bm25_search(sf_dir: str, *, k: int = 20) -> pa.Table:
    """BM25 keyword retrieval — the lexical-search operator of a RAG /
    training-data pipeline, distributed in two streaming passes: (1)
    corpus stats (per-doc lengths + per-term document frequencies,
    combiner-first — only (term, df) and (Σdl, n) partials move); (2)
    per-doc term frequencies for the QUERY TERMS ONLY (the polars explode
    filters to the broadcast term set before grouping), scored per batch
    and reduced as a distributed top-k. Both engines evaluate the same
    double formula on the same exact integers (tf, dl, df, N), so ranks
    reproduce bit-for-bit at 6 dp."""
    import ray

    from ..stages.groupagg import grouped_aggregate
    from .common import round_col

    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def stats_partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        toks = (pl.from_arrow(batch.select(["doc_id", "text"]))
                .select("doc_id", tok=pl.col("text").str.split(" "))
                .explode("tok").filter(pl.col("tok") != ""))
        per_doc = toks.group_by("doc_id").agg(dl=pl.len().cast(pl.Int64))
        hits = (toks.filter(pl.col("tok").is_in(list(_BM25_TERMS)))
                .unique().group_by("tok").agg(df=pl.len().cast(pl.Int64)))
        # partials are BLOCK-sized, never corpus-sized: one scalar
        # (n_docs, Σdl) row per block (docs never straddle batches, so
        # per-block df counts sum exactly) + ≤|terms| df rows
        corpus = pl.DataFrame({
            "tok": [None], "df": [0],
            "n_docs": [per_doc.height], "dl_sum": [int(per_doc["dl"].sum())],
        }).cast({"tok": pl.String, "df": pl.Int64, "n_docs": pl.Int64,
                 "dl_sum": pl.Int64})
        b = hits.with_columns(n_docs=pl.lit(0, dtype=pl.Int64),
                              dl_sum=pl.lit(0, dtype=pl.Int64))
        return pl.concat([corpus.select("tok", "df", "n_docs", "dl_sum"),
                          b.select("tok", "df", "n_docs", "dl_sum")]).to_arrow()

    stats = ds.map_batches(stats_partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    n_docs = int(stats["n_docs"].sum())
    total_dl = int(stats["dl_sum"].sum())
    avgdl = float(total_dl) / float(n_docs)
    df_map = stats[stats["tok"].notna()].groupby("tok")["df"].sum().to_dict()
    idf = {t: np.log((n_docs - df_map.get(t, 0) + 0.5)
                     / (df_map.get(t, 0) + 0.5) + 1.0)
           for t in _BM25_TERMS}
    ref = ray.put((idf, avgdl))

    class Score:
        def __init__(self, r):
            self.idf, self.avgdl = ray.get(r)

        def __call__(self, batch: pa.Table) -> pa.Table:
            import polars as pl

            toks = (pl.from_arrow(batch.select(["doc_id", "text"]))
                    .select("doc_id", tok=pl.col("text").str.split(" "))
                    .explode("tok").filter(pl.col("tok") != ""))
            dl = toks.group_by("doc_id").agg(dl=pl.len().cast(pl.Int64))
            tf = (toks.filter(pl.col("tok").is_in(list(_BM25_TERMS)))
                  .group_by("doc_id", "tok").agg(tf=pl.len().cast(pl.Int64)))
            if tf.height == 0:
                return pa.table({"doc_id": pa.array([], type=pa.int64()),
                                 "score": pa.array([], type=pa.float64())})
            j = tf.join(dl, on="doc_id").to_pandas()
            tfv = j["tf"].to_numpy(np.float64)
            dlv = j["dl"].to_numpy(np.float64)
            idfv = j["tok"].map(self.idf).to_numpy(np.float64)
            term = idfv * tfv * (_BM25_K1 + 1.0) / (
                tfv + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * dlv / self.avgdl))
            import pandas as _pd

            s = _pd.DataFrame({"doc_id": j["doc_id"], "t": term}) \
                .groupby("doc_id", sort=True)["t"].sum()
            return pa.table({"doc_id": pa.array(s.index.to_numpy(np.int64)),
                             "score": pa.array(s.to_numpy(np.float64))})

    cand = ds.map_batches(Score, fn_constructor_args=(ref,),
                          batch_format="pyarrow",
                          concurrency=(1, 8)).to_pandas()
    cand["score"] = round_col(cand["score"], 6)
    cand = cand.sort_values(["score", "doc_id"], ascending=[False, True],
                            kind="mergesort").head(k)
    return pa.Table.from_pandas(cand[["doc_id", "score"]].reset_index(drop=True),
                                preserve_index=False)


def rrf_fusion(sf_dir: str, *, k: int = 20, out_k: int = 10,
               c: int = 60) -> pa.Table:
    """Hybrid retrieval by Reciprocal-Rank Fusion — the standard way a
    RAG / training-data pipeline combines a lexical and a semantic ranker
    (Cormack et al.: score = Σ 1/(c + rank)).  Legs: the distributed
    ``bm25_search`` top-k (lexical) and an exact cosine top-k for query
    vector 0 via ``brute_force_topk`` (semantic; doc_id ≡ vec_id in the
    corpus).  Both legs are distributed streaming passes; the fusion
    itself is 2k rows on the driver — output-sized by construction.  The
    score is ONE double addition per doc (missing leg contributes 0),
    identical on both engines, rounded at 9 dp for the hash."""
    from ..stages.ann import brute_force_topk, load_query_matrix
    from .common import read as _read, round_col

    bm = bm25_search(sf_dir, k=k).to_pandas()
    bm_rank = pd.Series(np.arange(1, len(bm) + 1, dtype=np.int64),
                        index=bm["doc_id"].to_numpy())

    qids, qmat = load_query_matrix(sf_dir, 1)  # query vector 0
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    ann = brute_force_topk(emb, qids, qmat, k).to_pandas()
    ann_rank = pd.Series(ann["rank"].to_numpy(np.int64),
                         index=ann["vec_id"].to_numpy())

    docs = np.union1d(bm_rank.index.to_numpy(), ann_rank.index.to_numpy())
    rb = bm_rank.reindex(docs)
    ra = ann_rank.reindex(docs)
    tb = np.where(rb.notna(), 1.0 / (c + rb.fillna(0).to_numpy()), 0.0)
    ta = np.where(ra.notna(), 1.0 / (c + ra.fillna(0).to_numpy()), 0.0)
    score = tb + ta
    df = pd.DataFrame({"doc_id": docs.astype(np.int64), "s": score,
                       "in_bm25": rb.notna().to_numpy(),
                       "in_ann": ra.notna().to_numpy()})
    df = df.sort_values(["s", "doc_id"], ascending=[False, True],
                        kind="mergesort").head(out_k).reset_index(drop=True)
    df["rrf_score"] = round_col(df.pop("s"), 9)
    return pa.Table.from_pandas(
        df[["doc_id", "rrf_score", "in_bm25", "in_ann"]], preserve_index=False)


def _rrf_fusion_sql(k: int = 20, out_k: int = 10, c: int = 60) -> str:
    """Both legs re-derived in SQL: the bm25 oracle as a subquery (rank =
    its own ordering), the ANN leg as an exact cosine ROW_NUMBER with the
    same 9-dp tie stabilization ``brute_force_topk`` uses."""
    return (
        "WITH bm AS (SELECT doc_id, ROW_NUMBER() OVER "
        "(ORDER BY score DESC, doc_id) AS r FROM (" + SQL["bm25_search"] + ")), "
        "annr AS (SELECT vec_id AS doc_id, r FROM ("
        "  SELECT e.vec_id, ROW_NUMBER() OVER (ORDER BY "
        "    ROUND(list_cosine_similarity(q.embedding, e.embedding), 9) DESC, "
        "    e.vec_id) AS r "
        "  FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q "
        f"  WHERE e.vec_id <> 0) WHERE r <= {k}), "
        "f AS (SELECT COALESCE(bm.doc_id, annr.doc_id) AS doc_id, "
        f"COALESCE(1.0/({c} + bm.r), 0) + COALESCE(1.0/({c} + annr.r), 0) AS s, "
        "bm.r IS NOT NULL AS in_bm25, annr.r IS NOT NULL AS in_ann "
        "FROM bm FULL OUTER JOIN annr ON bm.doc_id = annr.doc_id) "
        "SELECT doc_id, ROUND(s, 9) AS rrf_score, in_bm25, in_ann "
        f"FROM f ORDER BY s DESC, doc_id LIMIT {out_k}"
    )


def _table_checksum_sql() -> str:
    from .sketchq import _MURMUR_SQL

    return (
        "WITH u AS (SELECT CAST(doc_id AS HUGEINT) * 1000003 + n_chars AS k64 "
        "FROM documents), "
        + _MURMUR_SQL.format(seed=23)
        + " SELECT bit_xor(CAST(priority - CASE WHEN priority >= CAST('9223372036854775808' AS HUGEINT) "
        "THEN CAST('18446744073709551616' AS HUGEINT) ELSE 0 END AS BIGINT)) AS checksum, "
        "COUNT(*) AS n_rows FROM mmf"
    )


SQL = {
    "length_quartile_by_source": (
        "WITH r AS (SELECT source, n_chars, "
        "NTILE(4) OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS q "
        "FROM documents) "
        "SELECT source, CAST(q AS BIGINT) AS quartile, COUNT(*) AS n_docs, "
        "CAST(MIN(n_chars) AS BIGINT) AS min_chars, "
        "CAST(MAX(n_chars) AS BIGINT) AS max_chars "
        "FROM r GROUP BY 1, 2 ORDER BY source, quartile"
    ),
    "bm25_search": (
        "WITH toks AS (SELECT doc_id, tok FROM documents, "
        "LATERAL UNNEST(string_split(text, ' ')) AS t(tok) WHERE tok <> ''), "
        "dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1), "
        "stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, "
        "CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl FROM dl), "
        "q(term) AS (VALUES ('table'), ('query'), ('spark')), "
        "df AS (SELECT tok AS term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df "
        "FROM toks JOIN q ON tok = term GROUP BY 1), "
        "tf AS (SELECT doc_id, tok AS term, CAST(COUNT(*) AS DOUBLE) AS tf "
        "FROM toks JOIN q ON tok = term GROUP BY 1, 2), "
        "sc AS (SELECT tf.doc_id, SUM("
        "ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0) * "
        "tf.tf * (1.2 + 1.0) / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl.dl AS DOUBLE) / stats.avgdl))"
        ") AS score FROM tf JOIN df USING (term) JOIN dl USING (doc_id), stats "
        "GROUP BY 1) "
        "SELECT doc_id, score FROM (SELECT doc_id, ROUND(score, 6) AS score FROM sc) "
        "ORDER BY score DESC, doc_id LIMIT 20"
    ),
    "char_entropy": (
        "WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents), "
        "cnt AS (SELECT doc_id, c, CAST(COUNT(*) AS DOUBLE) AS k FROM ch GROUP BY 1, 2), "
        "n AS (SELECT doc_id, SUM(k) AS n FROM cnt GROUP BY 1) "
        "SELECT cnt.doc_id, CAST(ANY_VALUE(n) AS BIGINT) AS n_chars, "
        "ROUND(SUM(-(k / n) * log2(k / n)), 6) AS entropy "
        "FROM cnt JOIN n USING (doc_id) GROUP BY cnt.doc_id ORDER BY doc_id"
    ),
    "unigram_logprob": (
        "WITH toks AS (SELECT doc_id, tok FROM documents, "
        "LATERAL UNNEST(string_split(text, ' ')) AS t(tok) WHERE tok <> ''), "
        "v AS (SELECT tok, COUNT(*) AS n FROM toks GROUP BY 1), "
        "tt AS (SELECT CAST(SUM(n) AS DOUBLE) AS T FROM v) "
        "SELECT doc_id, COUNT(*) AS n_tokens, "
        "ROUND(AVG(log2(n / T)), 6) AS avg_logprob "
        "FROM toks JOIN v USING (tok), tt GROUP BY doc_id ORDER BY doc_id"
    ),
    "source_quality_profile": (
        "SELECT source, lang, COUNT(*) AS n_docs, "
        "CAST(SUM(CASE WHEN length(text) BETWEEN 50 AND 5000 "
        "AND length(regexp_extract_all(text, '\\S+')) >= 10 "
        "AND 10 * length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) >= 6 * length(text) "
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_pass, "
        "CAST(SUM(n_chars) AS BIGINT) * 100 // COUNT(*) AS avg_chars_centi "
        "FROM documents GROUP BY source, lang ORDER BY source, lang"
    ),
    "table_checksum": _table_checksum_sql(),
    "redact_terms": (
        "SELECT doc_id, "
        "CAST(length(regexp_extract_all(text, '\\b(customer|spark|vector)\\b')) AS BIGINT) AS n_redacted, "
        "CAST(length(regexp_replace(text, '\\b(customer|spark|vector)\\b', '[X]', 'g')) AS BIGINT) AS scrubbed_len "
        "FROM documents ORDER BY doc_id"
    ),
    "lexical_diversity": (
        "WITH toks AS (SELECT doc_id, tok, COUNT(*) AS n "
        "FROM documents, LATERAL UNNEST(string_split(text, ' ')) AS t(tok) "
        "GROUP BY doc_id, tok) "
        "SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_tokens, COUNT(*) AS n_types, MAX(n) AS top_token_n, "
        "CAST((COUNT(*) * 1000) // SUM(n) AS BIGINT) AS ttr_milli "
        "FROM toks GROUP BY doc_id ORDER BY doc_id"
    ),
    "vocab_top_terms_by_lang": (
        "WITH toks AS (SELECT lang, UNNEST(regexp_extract_all(lower(text), '\\S+')) AS term FROM documents), "
        "ag AS (SELECT lang, term, COUNT(*) AS tf_total FROM toks GROUP BY 1, 2), "
        "ranked AS (SELECT lang, term, tf_total, "
        "ROW_NUMBER() OVER (PARTITION BY lang ORDER BY tf_total DESC, term) AS rank FROM ag) "
        "SELECT lang, CAST(rank AS BIGINT) AS rank, term, "
        "CAST(tf_total AS BIGINT) AS tf_total "
        "FROM ranked WHERE rank <= 10 ORDER BY lang, rank"
    ),
    "vocab_top_terms": (
        "WITH toks AS (SELECT doc_id, UNNEST(regexp_extract_all(lower(text), '\\S+')) AS term FROM documents), "
        "ag AS (SELECT term, COUNT(*) AS tf_total, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term), "
        "ranked AS (SELECT term, tf_total, df, "
        "ROW_NUMBER() OVER (ORDER BY tf_total DESC, term) AS rank FROM ag) "
        "SELECT CAST(rank AS BIGINT) AS rank, term, CAST(tf_total AS BIGINT) AS tf_total, "
        "CAST(df AS BIGINT) AS df FROM ranked WHERE rank <= 50 ORDER BY rank"
    ),
    "bigram_top_pairs": (
        "WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS w FROM documents), "
        "pairs AS (SELECT w[CAST(i AS BIGINT)] || ' ' || w[CAST(i AS BIGINT) + 1] AS bigram "
        "          FROM toks, LATERAL UNNEST(range(1, length(w))) AS t(i)), "
        "ag AS (SELECT bigram, COUNT(*) AS n FROM pairs GROUP BY bigram), "
        "ranked AS (SELECT bigram, n, ROW_NUMBER() OVER (ORDER BY n DESC, bigram) AS rank FROM ag) "
        "SELECT CAST(rank AS BIGINT) AS rank, bigram, CAST(n AS BIGINT) AS n "
        "FROM ranked WHERE rank <= 50 ORDER BY rank"
    ),
    "length_band_filter": (
        "WITH o AS (SELECT n_chars, ROW_NUMBER() OVER (ORDER BY n_chars) - 1 AS r FROM documents), "
        "n AS (SELECT COUNT(*) AS n FROM documents), "
        "b AS (SELECT MIN(CASE WHEN r = CAST(floor(0.05 * (n - 1)) AS BIGINT) THEN n_chars END) AS lo, "
        "             MIN(CASE WHEN r = CAST(floor(0.95 * (n - 1)) AS BIGINT) THEN n_chars END) AS hi "
        "      FROM o, n) "
        "SELECT doc_id FROM documents, b WHERE n_chars BETWEEN lo AND hi ORDER BY doc_id"
    ),
    "contamination_ngram": (
        "WITH ts AS (SELECT DISTINCT substring(props, CAST(r AS BIGINT) + 1, 5) AS g "
        "            FROM events, LATERAL UNNEST(range(length(props) - 4)) AS t(r) "
        "            WHERE length(props) >= 5), "
        "dsh AS (SELECT DISTINCT doc_id, substring(text, CAST(r AS BIGINT) + 1, 5) AS g "
        "        FROM documents, LATERAL UNNEST(range(length(text) - 4)) AS t(r) "
        "        WHERE length(text) >= 5) "
        "SELECT doc_id, COUNT(*) AS n_shingles, "
        "       CAST(COUNT(*) FILTER (WHERE g IN (SELECT g FROM ts)) AS BIGINT) AS n_hit "
        "FROM dsh GROUP BY doc_id ORDER BY doc_id"
    ),
    "bpe_token_counts": (
        "SELECT doc_id, "
        "CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+')) AS BIGINT) AS n_bpe, "
        "CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT) AS n_alpha_runs, "
        "CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_digit_runs "
        "FROM documents ORDER BY doc_id"
    ),
    "dataset_split": _dataset_split_sql(),
    "stratified_sample_langs": _stratified_sample_sql(),
    "stratified_split_exact": _stratified_split_exact_sql(),
    "epoch_shuffle": _epoch_shuffle_sql(),
    "repetition_stats": (
        "SELECT doc_id, CAST(length(text) - 4 AS BIGINT) AS n_total, "
        "       CAST(COUNT(DISTINCT substring(text, CAST(r AS BIGINT) + 1, 5)) AS BIGINT) AS n_distinct "
        "FROM documents, LATERAL UNNEST(range(length(text) - 4)) AS t(r) "
        "WHERE length(text) >= 5 GROUP BY doc_id, length(text) ORDER BY doc_id"
    ),
    "tfidf_top_terms": (
        "WITH toks AS (SELECT doc_id, UNNEST(regexp_extract_all(lower(text), '\\S+')) AS term FROM documents), "
        "tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2), "
        "df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1), "
        "n AS (SELECT COUNT(*) AS n FROM documents), "
        "scored AS (SELECT doc_id, term, tf * ((n.n * 1000) // df.df) AS score "
        "           FROM tf JOIN df USING (term), n), "
        "ranked AS (SELECT doc_id, term, score, "
        "ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rank FROM scored) "
        "SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, CAST(score AS BIGINT) AS score "
        "FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank"
    ),
    "lang_id": _LANG_ID_SQL,
    "doc_fingerprints": (
        "SELECT doc_id, CASE WHEN length(text) = 0 THEN 0 ELSE "
        "list_reduce(list_transform(range(1, length(text) + 1), "
        "i -> CAST(ascii(substring(text, CAST(i AS BIGINT), 1)) AS BIGINT)), "
        "(acc, c) -> (acc * 1000003 + c) % 2147483647) END AS fingerprint "
        "FROM documents ORDER BY doc_id"
    ),
    "token_counts": (
        "SELECT doc_id, CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens "
        "FROM documents ORDER BY doc_id"
    ),
    "quality_filter": (
        "SELECT doc_id FROM documents "
        "WHERE length(text) BETWEEN 50 AND 5000 "
        "AND length(regexp_extract_all(text, '\\S+')) >= 10 "
        "AND 10 * length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) >= 6 * length(text) "
        "ORDER BY doc_id"
    ),
}


def term_drift(sf_dir: str, *, k: int = 50) -> pa.Table:
    """Distribution-shift detection between two corpus halves (even vs
    odd doc_id — stand-in for old/new snapshots): per high-frequency term,
    occurrence counts in each half and the drift in exact basis points
    ((even−odd)·10⁴ // total, integer floor-division — no float). The
    monitoring surface a production corpus pipeline alarms on. Plan: ONE
    combiner-first (term, half) count aggregate (vocab-scale partials,
    token stream never crosses the exchange); the top-k-by-total cut and
    the bps arithmetic run on the vocabulary-scale result."""
    import polars as pl  # noqa: F401

    from ..stages.groupagg import grouped_aggregate

    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        did = np.asarray(batch.column("doc_id").combine_chunks()).astype(np.int64)
        df = pl.DataFrame({
            "half": did % 2,
            "t": pl.from_arrow(batch.column("text").combine_chunks())
            .str.to_lowercase(),
        })
        return (df.with_columns(pl.col("t").str.extract_all(r"\S+")
                                .alias("term"))
                .select("half", "term").explode("term").drop_nulls()
                .group_by(["half", "term"])
                .agg(n=pl.len().cast(pl.Int64)).to_arrow())

    agg = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["half", "term"], [("n", "sum", "n")],
    ).to_pandas()
    wide = agg.pivot_table(index="term", columns="half", values="n",
                           fill_value=0, aggfunc="sum")
    n_even = wide.get(0, pd.Series(0, index=wide.index)).to_numpy(np.int64)
    n_odd = wide.get(1, pd.Series(0, index=wide.index)).to_numpy(np.int64)
    total = n_even + n_odd
    out = pd.DataFrame({
        "term": wide.index.to_numpy(object),
        "n_even": n_even, "n_odd": n_odd,
        # DuckDB's BIGINT // truncates toward zero; numpy floors — emulate
        # truncation so negative drifts match the oracle exactly
        "drift_bps": np.where(n_even >= n_odd,
                              (n_even - n_odd) * 10000 // total,
                              -((n_odd - n_even) * 10000 // total)
                              ).astype(np.float64),
        "total": total,
    })
    out = out.sort_values(["total", "term"],
                          ascending=[False, True]).head(k)
    out = out.sort_values("term").reset_index(drop=True)
    return pa.Table.from_pandas(
        out[["term", "n_even", "n_odd", "drift_bps"]], preserve_index=False)


def _term_drift_sql(k: int = 50) -> str:
    return (
        "WITH toks AS (SELECT doc_id % 2 AS half, "
        "UNNEST(regexp_extract_all(lower(text), '\\S+')) AS term FROM documents), "
        "c AS (SELECT term, "
        "CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_even, "
        "CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_odd "
        "FROM toks GROUP BY 1), "
        "r AS (SELECT *, n_even + n_odd AS total, "
        "ROW_NUMBER() OVER (ORDER BY n_even + n_odd DESC, term) AS rk FROM c) "
        "SELECT term, n_even, n_odd, "
        "CAST((n_even - n_odd) * 10000 // total AS DOUBLE) AS drift_bps "
        f"FROM r WHERE rk <= {k} ORDER BY term"
    )


SQL["term_drift"] = _term_drift_sql()
SQL["rrf_fusion"] = _rrf_fusion_sql()


def bigram_novelty(sf_dir: str, *, _hash=None) -> pa.Table:
    """Per-document FIRST-OCCURRENCE novelty score over word bigrams: what
    fraction of a doc's distinct adjacent-word pairs appear in no
    earlier-id document — the curriculum/value-scoring signal dedup-style
    pipelines use to rank fresh content (a doc full of already-seen
    phrasing scores near 0).  Three stages, all distributed: (1) per-batch
    vectorized bigram explosion to DISTINCT ``(doc_id, bigram)`` rows
    (docs never span batches, so batch-level distinct is global), keyed by
    the 64-BIT FINGERPRINT of the bigram — the exchange moves 16-byte
    rows, never the strings (the ``dup_span_stats`` precedent: ~7× smaller
    exchange).  Each batch also emits one ``(bh, bg)`` AUDIT row per
    distinct bigram (vocab-sized, not corpus-sized) riding the same
    shuffle; (2) ONE keyed shuffle on ``bh`` — each partition owns its
    fingerprints wholly, so per-bigram ``min(doc_id)`` and the per-doc
    novel/total partials are partition-local group_bys, and the audit rows
    detect hash collisions EXACTLY (two distinct strings under one ``bh``
    ⇒ min(bg) ≠ max(bg), the ``dedup_exact`` pattern); (3) a
    combiner-first grouped sum by doc_id.  Colliding fingerprints
    (expected ~never at 2⁻⁶⁴ rates, but correctness never rides on it —
    ``_hash`` lets tests inject a weak hash) are EXCLUDED from the hashed
    pass and patched by a string-keyed second pass over only the colliding
    rows; partial (nb, nn) counts are additive across the passes, so the
    result is exact.  Exact integer output (``novelty_bps`` = 10000·novel
    // total — both engines floor non-negative ints).  Docs with < 2 words
    have no bigrams and do not appear (matches the oracle's group-by)."""
    import polars as pl

    from ..hashing import hash_strings
    from ..stages.groupagg import grouped_aggregate
    from ..stages.keyed import keyed_partition_map

    hash_fn = _hash or (lambda col: hash_strings(col, seed=17))
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def distinct_doc_bigrams(batch: pa.Table) -> pl.DataFrame:
        df = pl.DataFrame({
            "doc_id": pl.from_arrow(batch.column("doc_id").combine_chunks()),
            "text": pl.from_arrow(batch.column("text").combine_chunks()),
        }).with_columns(ws=pl.col("text").str.split(" "))
        return (df.with_columns(
                    a=pl.col("ws").list.slice(0, pl.col("ws").list.len() - 1),
                    b=pl.col("ws").list.slice(1))
                .select("doc_id", "a", "b")
                .explode(["a", "b"])
                .drop_nulls()
                .with_columns(bg=pl.col("a") + " " + pl.col("b"))
                .select("doc_id", "bg")
                .unique())

    def explode_bigrams(batch: pa.Table) -> pa.Table:
        df = distinct_doc_bigrams(batch)
        arr = df.to_arrow()
        h = hash_fn(arr.column("bg")).view(np.int64)
        n = len(arr)
        # main rows: (bh, doc_id, bg=NULL) — the string never ships;
        # audit rows: (bh, doc_id=-1, bg) once per batch-distinct bigram.
        vocab = df.select("bg").unique().to_arrow()
        vh = hash_fn(vocab.column("bg")).view(np.int64)
        m = len(vocab)
        return pa.table({
            "bh": pa.array(np.concatenate([h, vh])),
            "doc_id": pa.concat_arrays(
                [arr.column("doc_id").combine_chunks().cast(pa.int64()),
                 pa.array(np.full(m, -1, dtype=np.int64))]),
            "bg": pa.concat_arrays(
                [pa.nulls(n, type=pa.string()),
                 vocab.column("bg").combine_chunks().cast(pa.string())]),
        })

    def per_fingerprint_kernel(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        audit = df.filter(pl.col("doc_id") < 0)
        bad = (audit.group_by("bh")
               .agg(lo=pl.col("bg").min(), hi=pl.col("bg").max())
               .filter(pl.col("lo") != pl.col("hi"))
               .get_column("bh"))
        main = df.filter(pl.col("doc_id") >= 0).drop("bg")
        parts = []
        if len(bad):
            # marker rows: doc_id = -1, nb carries the colliding bh
            parts.append(pl.DataFrame({
                "doc_id": pl.Series(np.full(len(bad), -1, dtype=np.int64)),
                "nb": bad.cast(pl.Int64),
                "nn": pl.Series(np.zeros(len(bad), dtype=np.int64)),
            }))
            main = main.filter(~pl.col("bh").is_in(bad))
        first = main.group_by("bh").agg(mn=pl.col("doc_id").min())
        j = main.join(first, on="bh")
        out = j.group_by("doc_id").agg(
            nb=pl.len().cast(pl.Int64),
            nn=(pl.col("doc_id") == pl.col("mn")).sum().cast(pl.Int64),
        )
        parts.append(out.select("doc_id", "nb", "nn"))
        res = pl.concat(parts) if len(parts) > 1 else parts[0]
        if res.is_empty():
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "nb": pa.array([], type=pa.int64()),
                             "nn": pa.array([], type=pa.int64())})
        return res.to_arrow()

    rows = ds.map_batches(explode_bigrams, batch_format="pyarrow",
                          zero_copy_batch=True)
    partials = keyed_partition_map(
        rows, ["bh"], per_fingerprint_kernel).materialize()

    def only_markers(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return b.filter(pc.less(b.column("doc_id"), 0))

    def only_partials(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return b.filter(pc.greater_equal(b.column("doc_id"), 0))

    bad_pdf = partials.map_batches(
        only_markers, batch_format="pyarrow").to_pandas()
    agg = grouped_aggregate(
        partials.map_batches(only_partials, batch_format="pyarrow",
                             zero_copy_batch=True),
        ["doc_id"],
        [("n_bigrams", "sum", "nb"), ("n_novel", "sum", "nn")],
    ).to_pandas()

    if len(bad_pdf):  # rare path: string-keyed pass over colliding rows
        bad_ref = ray.put(np.unique(bad_pdf["nb"].to_numpy(np.int64)))

        def explode_only_bad(batch: pa.Table) -> pa.Table:
            df = distinct_doc_bigrams(batch)
            arr = df.to_arrow()
            h = hash_fn(arr.column("bg")).view(np.int64)
            return arr.filter(pa.array(np.isin(h, ray.get(bad_ref))))

        def per_bigram_kernel(t: pa.Table) -> pa.Table:
            df = pl.from_arrow(t)
            first = df.group_by("bg").agg(mn=pl.col("doc_id").min())
            out = (df.join(first, on="bg").group_by("doc_id")
                   .agg(nb=pl.len().cast(pl.Int64),
                        nn=(pl.col("doc_id") == pl.col("mn"))
                        .sum().cast(pl.Int64)))
            return out.to_arrow()

        patch = grouped_aggregate(
            keyed_partition_map(
                ds.map_batches(explode_only_bad, batch_format="pyarrow",
                               zero_copy_batch=True),
                ["bg"], per_bigram_kernel),
            ["doc_id"],
            [("n_bigrams", "sum", "nb"), ("n_novel", "sum", "nn")],
        ).to_pandas()
        agg = (pd.concat([agg, patch], ignore_index=True)
               .groupby("doc_id", as_index=False).sum())

    agg = agg.sort_values("doc_id").reset_index(drop=True)
    nb = agg["n_bigrams"].to_numpy(np.int64)
    nn = agg["n_novel"].to_numpy(np.int64)
    agg["novelty_bps"] = (10000 * nn) // np.maximum(nb, 1)
    return pa.Table.from_pandas(agg, preserve_index=False)


def term_cooccurrence(sf_dir: str, *, k: int = 20, top_n: int = 32) -> pa.Table:
    """Top-k within-document term CO-OCCURRENCE pairs (phrase/topic mining):
    for every unordered pair of distinct tokens, the number of documents
    containing both.  Docs never span batches, so pair generation is a
    batch-local polars self-join on doc_id — the all-to-all exchange
    carries per-batch ``(term_a, term_b, n)`` PARTIALS, never the token
    stream, and the final top-k runs on the pair-vocabulary aggregate.
    The pair count is quadratic in per-doc vocabulary, not in corpus size,
    so each doc is capped to its ``top_n`` highest-TF terms BEFORE pairing
    (default ON — a single pathological million-term doc would otherwise
    emit 10¹² pairs); the tie-break is deterministic (tf DESC, term ASC)
    and the oracle ranks with the identical ROW_NUMBER window."""
    import polars as pl

    from ..stages.groupagg import grouped_aggregate

    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def pair_partials(batch: pa.Table) -> pa.Table:
        toks = (pl.DataFrame({
                    "doc_id": pl.from_arrow(batch.column("doc_id").combine_chunks()),
                    "text": pl.from_arrow(batch.column("text").combine_chunks()),
                })
                .with_columns(term=pl.col("text").str.split(" "))
                .select("doc_id", "term").explode("term"))
        tf = toks.group_by(["doc_id", "term"]).agg(tf=pl.len())
        df = (tf.sort(["doc_id", "tf", "term"],
                      descending=[False, True, False])
              .with_columns(rk=pl.int_range(pl.len()).over("doc_id"))
              .filter(pl.col("rk") < top_n)
              .select("doc_id", "term"))
        pairs = df.join(df.rename({"term": "term_b"}), on="doc_id")
        pairs = pairs.filter(pl.col("term") < pl.col("term_b"))
        out = (pairs.rename({"term": "term_a"})
               .group_by(["term_a", "term_b"])
               .agg(n=pl.len().cast(pl.Int64)))
        return out.to_arrow()

    partials = ds.map_batches(pair_partials, batch_format="pyarrow",
                              zero_copy_batch=True)
    agg = grouped_aggregate(partials, ["term_a", "term_b"],
                            [("n_docs", "sum", "n")]).to_pandas()
    agg = agg.sort_values(["n_docs", "term_a", "term_b"],
                          ascending=[False, True, True]).head(k)
    return pa.Table.from_pandas(agg.reset_index(drop=True), preserve_index=False)


SQL["bigram_novelty"] = (
    "WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents), "
    "b AS (SELECT DISTINCT doc_id, "
    "ws[CAST(i AS BIGINT)] || ' ' || ws[CAST(i AS BIGINT) + 1] AS bg "
    "FROM w, LATERAL UNNEST(range(1, len(ws))) AS t(i)), "
    "f AS (SELECT bg, MIN(doc_id) AS first_doc FROM b GROUP BY bg) "
    "SELECT b.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams, "
    "CAST(SUM(CASE WHEN f.first_doc = b.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel, "
    "CAST(10000 * SUM(CASE WHEN f.first_doc = b.doc_id THEN 1 ELSE 0 END) AS BIGINT) "
    "// COUNT(*) AS novelty_bps "
    "FROM b JOIN f USING (bg) GROUP BY b.doc_id ORDER BY b.doc_id"
)

SQL["term_cooccurrence"] = (
    "WITH tok AS (SELECT doc_id, t.term "
    "FROM documents, LATERAL UNNEST(string_split(text, ' ')) AS t(term)), "
    "tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2), "
    "w AS (SELECT doc_id, term FROM (SELECT doc_id, term, "
    "ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tf DESC, term) AS rk "
    "FROM tf) WHERE rk <= 32), "
    "p AS (SELECT a.term AS term_a, b.term AS term_b, COUNT(*) AS n "
    "FROM w a JOIN w b ON a.doc_id = b.doc_id AND a.term < b.term GROUP BY 1, 2) "
    "SELECT term_a, term_b, CAST(n AS BIGINT) AS n_docs FROM p "
    "ORDER BY n DESC, term_a, term_b LIMIT 20"
)


def source_vocab_overlap(sf_dir: str) -> pa.Table:
    """All-pairs vocabulary similarity between sources: for every source
    pair, the exact Jaccard of their distinct-term vocabularies (shared
    terms / union, integer bps) — the corpus-mixing diagnostic for 'how
    redundant are these feeds?'.  Scale shape: per-batch distinct
    (source, term) partials, then ONE keyed shuffle on the TERM so each
    partition wholly owns its terms; per-source vocab-size partials and
    per-pair common-term partials are both partition-local (the within-
    partition pair explosion is bounded by |sources|² per term), and only
    |sources|²-sized aggregates reach the final combiner — the pairwise
    set-similarity plan that never ships a vocabulary anywhere."""
    import polars as pl

    from ..stages.groupagg import grouped_aggregate
    from ..stages.keyed import keyed_partition_map

    ds = read(sf_dir, "documents", ["source", "text"])

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        df = pl.DataFrame({
            "source": pl.from_arrow(batch.column("source").combine_chunks()),
            "t": pl.from_arrow(batch.column("text").combine_chunks())
            .str.to_lowercase(),
        })
        return (df.with_columns(term=pl.col("t").str.extract_all(r"\S+"))
                .select("source", "term").explode("term").drop_nulls()
                .unique().to_arrow())

    def per_term_kernel(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t).unique()  # exact distinct: term wholly owned
        sizes = (df.group_by("source")
                 .agg(n=pl.len().cast(pl.Int64))
                 .rename({"source": "a"})
                 .with_columns(b=pl.lit("", dtype=pl.String),
                               kind=pl.lit(0, dtype=pl.Int64)))
        pairs = (df.join(df, on="term", suffix="_b")
                 .filter(pl.col("source") < pl.col("source_b"))
                 .group_by(["source", "source_b"])
                 .agg(n=pl.len().cast(pl.Int64))
                 .rename({"source": "a", "source_b": "b"})
                 .with_columns(kind=pl.lit(1, dtype=pl.Int64)))
        return pl.concat([sizes.select("a", "b", "kind", "n"),
                          pairs.select("a", "b", "kind", "n")]).to_arrow()

    partials = keyed_partition_map(
        ds.map_batches(distinct_pairs, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["term"], per_term_kernel)
    agg = grouped_aggregate(partials, ["a", "b", "kind"],
                            [("n", "sum", "n")]).to_pandas()
    sz = dict(zip(agg.loc[agg["kind"] == 0, "a"],
                  agg.loc[agg["kind"] == 0, "n"].astype(np.int64)))
    out = agg[agg["kind"] == 1].rename(
        columns={"a": "source_a", "b": "source_b", "n": "n_common"}).copy()
    na = out["source_a"].map(sz).to_numpy(np.int64)
    nb = out["source_b"].map(sz).to_numpy(np.int64)
    nc = out["n_common"].to_numpy(np.int64)
    out["n_union"] = na + nb - nc
    out["jaccard_bps"] = (10000 * nc) // (na + nb - nc)
    out = out[["source_a", "source_b", "n_common", "n_union", "jaccard_bps"]]
    out = out.sort_values(["source_a", "source_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)

SQL["source_vocab_overlap"] = (
    "WITH v2 AS (SELECT DISTINCT source, "
    "UNNEST(regexp_extract_all(lower(text), '\\S+')) AS term FROM documents), "
    "sz AS (SELECT source, COUNT(*) AS n FROM (SELECT DISTINCT source, term FROM v2) GROUP BY 1), "
    "i AS (SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_common "
    "FROM (SELECT DISTINCT source, term FROM v2) a "
    "JOIN (SELECT DISTINCT source, term FROM v2) b "
    "ON a.term = b.term AND a.source < b.source GROUP BY 1, 2) "
    "SELECT i.source_a, i.source_b, CAST(i.n_common AS BIGINT) AS n_common, "
    "CAST(sa.n + sb.n - i.n_common AS BIGINT) AS n_union, "
    "CAST(10000 * i.n_common AS BIGINT) // (sa.n + sb.n - i.n_common) AS jaccard_bps "
    "FROM i JOIN sz sa ON sa.source = i.source_a "
    "JOIN sz sb ON sb.source = i.source_b ORDER BY 1, 2"
)


def quantile_normalize_scores(sf_dir: str) -> pa.Table:
    """Cross-source score CALIBRATION by quantile normalization: each
    document's n_chars is replaced by the GLOBAL length distribution's
    value at the doc's within-source percentile (linear interpolation
    between global order statistics) — the standard fix when per-source
    quality scores aren't comparable and mixing needs one scale.  Exact
    and fully distributed: the global order-statistic array is never
    materialized — a combiner-first (value, count) histogram (bounded by
    the length DOMAIN, not the corpus) plus its cumsum answers g[i] by
    one searchsorted; within-source ranks come from one keyed shuffle on
    source.  Every float op (pos, frac, interpolation) mirrors the oracle
    expression exactly, so doubles match bit-for-bit."""
    import polars as pl

    from ..stages.groupagg import grouped_aggregate
    from ..stages.keyed import keyed_partition_map

    hist = grouped_aggregate(
        read(sf_dir, "documents", ["n_chars"]).map_batches(
            lambda b: pl.from_arrow(b).group_by("n_chars")
            .agg(cnt=pl.len().cast(pl.Int64)).to_arrow(),
            batch_format="pyarrow", zero_copy_batch=True),
        ["n_chars"], [("cnt", "sum", "cnt")],
    ).to_pandas().sort_values("n_chars")
    vals = hist["n_chars"].to_numpy(np.int64)
    cum = hist["cnt"].to_numpy(np.int64).cumsum()
    nn = int(cum[-1])

    ds = read(sf_dir, "documents", ["doc_id", "source", "n_chars"])

    def kernel(t: pa.Table) -> pa.Table:
        did = np.asarray(t.column("doc_id").combine_chunks()).astype(np.int64)
        src = t.column("source").to_numpy(zero_copy_only=False)
        nc = np.asarray(t.column("n_chars").combine_chunks()).astype(np.int64)
        order = np.lexsort((did, nc, src))
        src_s, nc_s, did_s = src[order], nc[order], did[order]
        m = len(src_s)
        idx = np.arange(m, dtype=np.int64)
        new = np.r_[True, src_s[1:] != src_s[:-1]]
        sstart = np.maximum.accumulate(np.where(new, idx, 0))
        r = idx - sstart + 1
        counts = np.diff(np.append(np.flatnonzero(new), m))
        ns = np.repeat(counts, counts)
        # A single-document stratum has no rank spread — pin its position
        # to 0 (the oracle CASEs the same way) instead of taking 0/0.
        pos = np.where(
            ns == 1, 0.0,
            (r - 1).astype(np.float64) / (ns - 1.0) * (nn - 1.0))
        lo = np.floor(pos).astype(np.int64)
        hi = np.minimum(lo + 1, nn - 1)
        g_lo = vals[np.searchsorted(cum, lo, side="right")]
        g_hi = vals[np.searchsorted(cum, hi, side="right")]
        cal = g_lo + (pos - lo) * (g_hi - g_lo)
        return pa.table({"doc_id": pa.array(did_s),
                         "source": pa.array(src_s, type=pa.string()),
                         "n_chars": pa.array(nc_s),
                         "calibrated": pa.array(cal)})

    out = keyed_partition_map(ds, ["source"], kernel).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


SQL["quantile_normalize_scores"] = (
    "WITH N AS (SELECT COUNT(*) AS nn FROM documents), "
    "g AS (SELECT n_chars AS v, "
    "ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) - 1 AS i FROM documents), "
    "pr AS (SELECT doc_id, source, n_chars, "
    "COUNT(*) OVER (PARTITION BY source) AS ns, "
    "RANK() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS r "
    "FROM documents), "
    "p AS (SELECT doc_id, source, n_chars, "
    "CASE WHEN ns = 1 THEN 0.0 "
    "ELSE CAST(r - 1 AS DOUBLE) / (ns - 1.0) * (nn - 1.0) END AS pos "
    "FROM pr, N), "
    "q AS (SELECT doc_id, source, n_chars, pos, "
    "CAST(FLOOR(pos) AS BIGINT) AS lo FROM p) "
    "SELECT q.doc_id, q.source, q.n_chars, "
    "glo.v + (q.pos - q.lo) * (ghi.v - glo.v) AS calibrated "
    "FROM q JOIN g glo ON glo.i = q.lo "
    "JOIN g ghi ON ghi.i = LEAST(q.lo + 1, (SELECT nn FROM N) - 1) "
    "ORDER BY q.doc_id"
)


def source_js_divergence(sf_dir: str) -> pa.Table:
    """Per-source Jensen–Shannon divergence between the source's unigram
    term distribution and the GLOBAL corpus distribution — the standard
    'how far does this feed drift from the mixture?' diagnostic when
    composing training corpora.  Distributed shape: one combiner-first
    (source, term) count aggregate (the exchange carries vocab-scale
    partials only); the JS itself runs on the driver over the
    |sources|×|vocab| aggregate in a FIXED term-sorted order, one sum per
    source (at web vocab sizes the same sum is a keyed partial over term
    shards).  Values are ROUNDed to 6 dp on both engines — the float-sum
    order slack (~1e-15) is 9 orders below the rounding grain."""
    import polars as pl

    from ..stages.groupagg import grouped_aggregate

    ds = read(sf_dir, "documents", ["source", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pl.DataFrame({
            "source": pl.from_arrow(batch.column("source").combine_chunks()),
            "t": pl.from_arrow(batch.column("text").combine_chunks())
            .str.to_lowercase(),
        })
        return (df.with_columns(term=pl.col("t").str.extract_all(r"\S+"))
                .select("source", "term").explode("term").drop_nulls()
                .group_by(["source", "term"])
                .agg(c=pl.len().cast(pl.Int64))).to_arrow()

    agg = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["source", "term"], [("c", "sum", "c")],
    ).to_pandas().sort_values(["source", "term"]).reset_index(drop=True)

    piv = agg.pivot_table(index="term", columns="source", values="c",
                          aggfunc="sum", fill_value=0).sort_index()
    counts = piv.to_numpy(np.float64)           # (vocab, sources), term-sorted
    tot_s = counts.sum(axis=0)
    tot_g = tot_s.sum()
    g = counts.sum(axis=1) / tot_g              # global distribution
    rows = []
    for j, src in enumerate(piv.columns):
        p = counts[:, j] / tot_s[j]
        m_ = (p + g) / 2.0
        mask_p = p > 0
        mask_g = g > 0
        kl_pm = float(np.sum(p[mask_p] * np.log2(p[mask_p] / m_[mask_p])))
        kl_gm = float(np.sum(g[mask_g] * np.log2(g[mask_g] / m_[mask_g])))
        rows.append((src, int(tot_s[j]), round(0.5 * kl_pm + 0.5 * kl_gm, 6)))
    out = pd.DataFrame(rows, columns=["source", "n_tokens", "js_divergence"])
    out = out.sort_values("source").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


SQL["source_js_divergence"] = (
    "WITH toks AS (SELECT source, "
    "UNNEST(regexp_extract_all(lower(text), '\\S+')) AS term FROM documents), "
    "sc AS (SELECT source, term, COUNT(*) AS c FROM toks GROUP BY 1, 2), "
    "st AS (SELECT source, SUM(c) AS ns FROM sc GROUP BY 1), "
    "gt AS (SELECT term, SUM(c) AS cg FROM sc GROUP BY 1), "
    "g AS (SELECT term, CAST(cg AS DOUBLE) / (SELECT SUM(c) FROM sc) AS pg FROM gt), "
    "grid AS (SELECT st.source, g.term, g.pg, COALESCE(sc.c, 0) AS c, st.ns "
    "FROM st CROSS JOIN g LEFT JOIN sc ON sc.source = st.source AND sc.term = g.term), "
    "px AS (SELECT source, term, CAST(c AS DOUBLE) / ns AS p, pg, ns FROM grid), "
    "kl AS (SELECT source, MAX(ns) AS n_tokens, "
    "SUM(CASE WHEN p > 0 THEN p * log2(p / ((p + pg) / 2.0)) ELSE 0 END) AS kl_pm, "
    "SUM(CASE WHEN pg > 0 THEN pg * log2(pg / ((p + pg) / 2.0)) ELSE 0 END) AS kl_gm "
    "FROM px GROUP BY source) "
    "SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens, "
    "ROUND(0.5 * kl_pm + 0.5 * kl_gm, 6) AS js_divergence "
    "FROM kl ORDER BY source"
)


def term_burstiness(sf_dir: str, *, k: int = 50) -> pa.Table:
    """Term BURSTINESS (variance-to-mean ratio of per-document counts,
    zeros included) for the corpus's top-k terms by frequency — the
    content-vs-function-word separator (bursty terms concentrate in few
    docs; stopwords spread evenly).  Everything that orders or selects is
    exact-int (per-(term, doc) counts → Σc, Σc², N docs; top-k by
    (tf_total DESC, term)); VMR = (N·Σc² − Σc²)/(N·Σc) is ONE mirrored
    float division at the end.  Combiner-first throughout: the exchange
    carries (term, doc)-level partials collapsed per batch, then
    vocab-sized (term, s, q) rows only."""
    import polars as pl

    from ..stages.groupagg import grouped_aggregate

    ds = read(sf_dir, "documents", ["doc_id", "text"])
    nd_total = int(read(sf_dir, "documents", ["doc_id"]).count())

    def perdoc(batch: pa.Table) -> pa.Table:
        df = pl.DataFrame({
            "doc_id": pl.from_arrow(batch.column("doc_id").combine_chunks()),
            "t": pl.from_arrow(batch.column("text").combine_chunks())
            .str.to_lowercase(),
        })
        cnt = (df.with_columns(term=pl.col("t").str.extract_all(r"\S+"))
               .select("doc_id", "term").explode("term").drop_nulls()
               .group_by(["doc_id", "term"])
               .agg(c=pl.len().cast(pl.Int64)))
        # a doc never spans batches → (term, Σc, Σc²) partials are exact
        return (cnt.group_by("term")
                .agg(s=pl.col("c").sum(),
                     q=(pl.col("c") * pl.col("c")).sum())).to_arrow()

    agg = grouped_aggregate(
        ds.map_batches(perdoc, batch_format="pyarrow", zero_copy_batch=True),
        ["term"], [("s", "sum", "s"), ("q", "sum", "q")],
    ).to_pandas()
    agg = agg.sort_values(["s", "term"], ascending=[False, True]).head(k)
    s = agg["s"].to_numpy(np.int64)
    q = agg["q"].to_numpy(np.int64)
    agg["vmr"] = (nd_total * q - s * s).astype(np.float64) \
        / (np.float64(nd_total) * s)
    out = agg.rename(columns={"s": "tf_total"})[["term", "tf_total", "vmr"]]
    return pa.Table.from_pandas(out.reset_index(drop=True),
                                preserve_index=False)


SQL["term_burstiness"] = (
    "WITH cnt AS (SELECT doc_id, term, COUNT(*) AS c FROM ("
    "SELECT doc_id, UNNEST(regexp_extract_all(lower(text), '\\S+')) AS term "
    "FROM documents) GROUP BY 1, 2), "
    "ag AS (SELECT term, SUM(c) AS s, SUM(c * c) AS q FROM cnt GROUP BY 1), "
    "nd AS (SELECT COUNT(*) AS n FROM documents), "
    "top AS (SELECT term, s, q FROM ag ORDER BY s DESC, term LIMIT 50) "
    "SELECT term, CAST(s AS BIGINT) AS tf_total, "
    "CAST(nd.n * q - s * s AS DOUBLE) / (CAST(nd.n AS DOUBLE) * s) AS vmr "
    "FROM top, nd ORDER BY tf_total DESC, term"
)


def ks_drift_by_source(sf_dir: str) -> pa.Table:
    """Per-source two-sample Kolmogorov–Smirnov drift test: for every
    source, the exact KS statistic between ITS document-length
    distribution and the REST of the corpus — the distribution-shift
    screen run before adding a feed to a training mixture.  Exactness:
    D is carried as the INTEGER max|cum_s·n_r − cum_r·n_s| over the
    sorted value domain (no float CDFs), and the statistic is ONE
    mirrored division.  Distributed shape: one combiner-first
    (n_chars, source) histogram (domain-bounded, the
    `quantile_normalize_scores` trick); the cumsum/argmax runs on the
    |domain|×|sources| driver grid — at web scale the same max is a
    per-value-shard keyed partial."""
    import polars as pl

    from ..stages.groupagg import grouped_aggregate

    h = grouped_aggregate(
        read(sf_dir, "documents", ["n_chars", "source"]).map_batches(
            lambda b: pl.from_arrow(b).group_by(["n_chars", "source"])
            .agg(c=pl.len().cast(pl.Int64)).to_arrow(),
            batch_format="pyarrow", zero_copy_batch=True),
        ["n_chars", "source"], [("c", "sum", "c")],
    ).to_pandas()

    piv = (h.pivot_table(index="n_chars", columns="source", values="c",
                         aggfunc="sum", fill_value=0).sort_index())
    counts = piv.to_numpy(np.int64)              # (|domain|, |sources|)
    cs = counts.cumsum(axis=0)
    ns = counts.sum(axis=0)
    n = int(ns.sum())
    cg = cs.sum(axis=1)                          # global cumsum
    rows = []
    for j, src in enumerate(piv.columns):
        d2 = np.abs(cs[:, j] * (n - ns[j]) - (cg - cs[:, j]) * ns[j])
        dmax = int(d2.max())
        rows.append((src, int(ns[j]), dmax,
                     float(dmax) / (int(ns[j]) * (n - int(ns[j])))))
    out = pd.DataFrame(rows, columns=["source", "n_docs", "d2", "ks_stat"])
    out = out.sort_values("source").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


SQL["ks_drift_by_source"] = (
    "WITH h AS (SELECT n_chars AS v, source, COUNT(*) AS c "
    "FROM documents GROUP BY 1, 2), "
    "vals AS (SELECT DISTINCT v FROM h), "
    "srcs AS (SELECT source, COUNT(*) AS ns FROM documents GROUP BY 1), "
    "tot AS (SELECT COUNT(*) AS n FROM documents), "
    "grid AS (SELECT s.source, vals.v, s.ns, COALESCE(h.c, 0) AS c "
    "FROM srcs s CROSS JOIN vals "
    "LEFT JOIN h ON h.source = s.source AND h.v = vals.v), "
    "cums AS (SELECT source, v, ns, "
    "SUM(c) OVER (PARTITION BY source ORDER BY v) AS cs FROM grid), "
    "cumg AS (SELECT v, SUM(SUM(c)) OVER (ORDER BY v) AS cgall "
    "FROM h GROUP BY v), "
    "j AS (SELECT c.source, c.ns, t.n, "
    "ABS(c.cs * (t.n - c.ns) - (g.cgall - c.cs) * c.ns) AS d2 "
    "FROM cums c JOIN cumg g USING (v), tot t) "
    "SELECT source, CAST(ns AS BIGINT) AS n_docs, "
    "CAST(MAX(d2) AS BIGINT) AS d2, "
    "CAST(MAX(d2) AS DOUBLE) / (ns * (n - ns)) AS ks_stat "
    "FROM j GROUP BY source, ns, n ORDER BY source"
)


def length_gini_by_source(sf_dir: str) -> pa.Table:
    """Per-source Gini coefficient of document lengths — the inequality
    screen for corpus mixing (a source where a few huge docs carry most
    of the mass behaves very differently under token budgets than a
    uniform one).  Exact-int formulation: with lengths sorted ascending
    (doc_id tie-break) and 1-based ranks, G = (2·Σr·x − (n+1)·Σx) /
    (n·Σx) — both sums are int64, the statistic is ONE mirrored float
    division.  One keyed shuffle on source; ranks fall out of a single
    lexsort + run-boundary arange per partition."""
    from ..stages.keyed import keyed_partition_map

    ds = read(sf_dir, "documents", ["doc_id", "source", "n_chars"])

    def kernel(t: pa.Table) -> pa.Table:
        src = t.column("source").to_numpy(zero_copy_only=False)
        did = np.asarray(t.column("doc_id").combine_chunks()).astype(np.int64)
        x = np.asarray(t.column("n_chars").combine_chunks()).astype(np.int64)
        if len(src) == 0:
            return pa.table({"source": pa.array([], type=pa.string()),
                             "n_docs": pa.array([], type=pa.int64()),
                             "s1": pa.array([], type=pa.int64()),
                             "s0": pa.array([], type=pa.int64())})
        srcs, inv = np.unique(src, return_inverse=True)
        order = np.lexsort((did, x, inv))
        inv_s, x_s = inv[order], x[order]
        idx = np.arange(len(x_s), dtype=np.int64)
        new = np.r_[True, inv_s[1:] != inv_s[:-1]]
        start = np.maximum.accumulate(np.where(new, idx, 0))
        rn = idx - start + 1
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, len(x_s)))
        s0 = np.add.reduceat(x_s, starts)
        s1 = np.add.reduceat(rn * x_s, starts)
        return pa.table({"source": pa.array(srcs[inv_s[starts]],
                                            type=pa.string()),
                         "n_docs": pa.array(counts.astype(np.int64)),
                         "s1": pa.array(s1), "s0": pa.array(s0)})

    out = keyed_partition_map(ds, ["source"], kernel).to_pandas()
    n = out["n_docs"].to_numpy(np.int64)
    s0 = out["s0"].to_numpy(np.int64)
    s1 = out["s1"].to_numpy(np.int64)
    out["gini"] = (2 * s1 - (n + 1) * s0).astype(np.float64) \
        / (n * s0).astype(np.float64)
    out = out[["source", "n_docs", "gini"]].sort_values("source")
    return pa.Table.from_pandas(out.reset_index(drop=True),
                                preserve_index=False)


SQL["length_gini_by_source"] = (
    "WITH r AS (SELECT source, n_chars, "
    "ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn "
    "FROM documents), "
    "a AS (SELECT source, COUNT(*) AS n, SUM(n_chars) AS s0, "
    "SUM(rn * n_chars) AS s1 FROM r GROUP BY 1) "
    "SELECT source, CAST(n AS BIGINT) AS n_docs, "
    "CAST(2 * s1 - (n + 1) * s0 AS DOUBLE) / CAST(n * s0 AS DOUBLE) AS gini "
    "FROM a ORDER BY source"
)


def pmi_top_pairs(sf_dir: str, *, k: int = 20, top_n: int = 32,
                  min_docs: int = 3) -> pa.Table:
    """Top-k within-document term pairs by POINTWISE MUTUAL INFORMATION —
    the collocation/phrase-mining score that normalizes raw co-occurrence
    by term popularity (``term_cooccurrence``'s top pairs are dominated by
    corpus-frequent terms; PMI surfaces the pairs that co-occur far above
    chance).  PMI(a,b) = ln( n_ab · N / (n_a · n_b) ) over DOCUMENT
    frequencies, with the same per-doc ``top_n``-by-TF cap (deterministic
    tf DESC, term ASC tie-break) applied to pair generation AND to the
    unary frequencies — one definition, mirrored exactly by the oracle.
    Distributed shape: ONE ``map_batches`` pass emits kind-tagged partials
    (per-batch pair counts, per-batch unary counts, batch doc counts —
    docs never span batches), one combiner-first ``grouped_aggregate``
    folds them, and only the pair-vocabulary aggregate reaches the final
    top-k; the exchange never carries the token stream.  Pairs below
    ``min_docs`` co-occurrences are noise-suppressed (standard PMI
    practice — a 1-doc pair has unbounded sample PMI)."""
    import polars as pl

    from ..stages.groupagg import grouped_aggregate

    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def partials(batch: pa.Table) -> pa.Table:
        toks = (pl.DataFrame({
                    "doc_id": pl.from_arrow(batch.column("doc_id").combine_chunks()),
                    "text": pl.from_arrow(batch.column("text").combine_chunks()),
                })
                .with_columns(term=pl.col("text").str.split(" "))
                .select("doc_id", "term").explode("term"))
        tf = toks.group_by(["doc_id", "term"]).agg(tf=pl.len())
        w = (tf.sort(["doc_id", "tf", "term"], descending=[False, True, False])
             .with_columns(rk=pl.int_range(pl.len()).over("doc_id"))
             .filter(pl.col("rk") < top_n).select("doc_id", "term"))
        pairs = (w.join(w.rename({"term": "term_b"}), on="doc_id")
                 .filter(pl.col("term") < pl.col("term_b"))
                 .rename({"term": "term_a"})
                 .group_by(["term_a", "term_b"])
                 .agg(n=pl.len().cast(pl.Int64))
                 .with_columns(kind=pl.lit(0, dtype=pl.Int64)))
        unary = (w.group_by("term").agg(n=pl.len().cast(pl.Int64))
                 .rename({"term": "term_a"})
                 .with_columns(term_b=pl.lit("", dtype=pl.String),
                               kind=pl.lit(1, dtype=pl.Int64)))
        ndoc = pl.DataFrame({"term_a": [""], "term_b": [""],
                             "kind": pl.Series([2], dtype=pl.Int64),
                             "n": pl.Series([tf["doc_id"].n_unique()],
                                            dtype=pl.Int64)})
        cols = ["term_a", "term_b", "kind", "n"]
        return pl.concat([pairs.select(cols), unary.select(cols),
                          ndoc.select(cols)]).to_arrow()

    agg = grouped_aggregate(
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True),
        ["term_a", "term_b", "kind"], [("n", "sum", "n")]).to_pandas()
    n_total = int(agg.loc[agg["kind"] == 2, "n"].sum())
    una = dict(zip(agg.loc[agg["kind"] == 1, "term_a"],
                   agg.loc[agg["kind"] == 1, "n"].astype(np.int64)))
    p = agg[(agg["kind"] == 0) & (agg["n"] >= min_docs)].copy()
    na = p["term_a"].map(una).to_numpy(np.float64)
    nb = p["term_b"].map(una).to_numpy(np.float64)
    nab = p["n"].to_numpy(np.float64)
    # same float expression as the oracle: (n_ab * N) / (n_a * n_b), one LN
    p["pmi"] = np.round(np.log(nab * float(n_total) / (na * nb)), 6)
    p = (p.rename(columns={"n": "n_docs"})
         .sort_values(["pmi", "term_a", "term_b"],
                      ascending=[False, True, True]).head(k))
    p["n_docs"] = p["n_docs"].astype(np.int64)
    return pa.Table.from_pandas(
        p[["term_a", "term_b", "n_docs", "pmi"]].reset_index(drop=True),
        preserve_index=False)


SQL["pmi_top_pairs"] = (
    "WITH tok AS (SELECT doc_id, t.term "
    "FROM documents, LATERAL UNNEST(string_split(text, ' ')) AS t(term)), "
    "tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2), "
    "w AS (SELECT doc_id, term FROM (SELECT doc_id, term, "
    "ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tf DESC, term) AS rk "
    "FROM tf) WHERE rk <= 32), "
    "nd AS (SELECT COUNT(DISTINCT doc_id) AS n FROM w), "
    "ta AS (SELECT term, COUNT(*) AS na FROM w GROUP BY 1), "
    "p AS (SELECT a.term AS term_a, b.term AS term_b, COUNT(*) AS n "
    "FROM w a JOIN w b ON a.doc_id = b.doc_id AND a.term < b.term "
    "GROUP BY 1, 2) "
    "SELECT p.term_a, p.term_b, CAST(p.n AS BIGINT) AS n_docs, "
    "ROUND(LN(CAST(p.n AS DOUBLE) * nd.n / "
    "(CAST(x.na AS DOUBLE) * CAST(y.na AS DOUBLE))), 6) AS pmi "
    "FROM p CROSS JOIN nd "
    "JOIN ta x ON x.term = p.term_a JOIN ta y ON y.term = p.term_b "
    "WHERE p.n >= 3 "
    "ORDER BY pmi DESC, term_a, term_b LIMIT 20"
)


def zipf_fit_by_source(sf_dir: str, *, top: int = 100) -> pa.Table:
    """Zipf-law FIT per source: the OLS slope of ln(term frequency) on
    ln(rank) over each source's ``top`` most frequent terms — the standard
    power-law health check for a corpus feed (natural language sits near
    slope −1; templated/machine output flattens or steepens it).  This is
    the distributed analog of the reference's Zipfian workload generator
    (`/root/reference/src/zipf.c` hardcodes theta = 1.0; here the exponent
    is MEASURED per source).  Shape: per-batch (source, term) TF partials
    → one combiner-first ``grouped_aggregate`` → ONE keyed shuffle on
    source (each source wholly owned by a partition) where the kernel
    ranks (tf DESC, term ASC — deterministic), keeps ``top``, and computes
    the closed-form slope (m·Σxy − Σx·Σy)/(m·Σx² − (Σx)²) — the same
    explicit expression as the oracle, 6-dp rounded (sum-order jitter
    precedent: ``char_entropy``)."""
    import polars as pl

    from ..stages.groupagg import grouped_aggregate
    from ..stages.keyed import keyed_partition_map

    ds = read(sf_dir, "documents", ["source", "text"])

    def tf_partials(batch: pa.Table) -> pa.Table:
        df = pl.DataFrame({
            "source": pl.from_arrow(batch.column("source").combine_chunks()),
            "t": pl.from_arrow(batch.column("text").combine_chunks())
            .str.to_lowercase(),
        })
        return (df.with_columns(term=pl.col("t").str.extract_all(r"\S+"))
                .select("source", "term").explode("term").drop_nulls()
                .group_by(["source", "term"])
                .agg(f=pl.len().cast(pl.Int64)).to_arrow())

    tf = grouped_aggregate(
        ds.map_batches(tf_partials, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["source", "term"], [("f", "sum", "f")])

    def fit_kernel(tbl: pa.Table) -> pa.Table:
        df = (pl.from_arrow(tbl)
              .sort(["source", "f", "term"], descending=[False, True, False])
              .with_columns(rk=pl.int_range(pl.len()).over("source") + 1)
              .filter(pl.col("rk") <= top))
        src = df["source"].to_numpy()
        x = np.log(df["rk"].to_numpy().astype(np.float64))
        y = np.log(df["f"].to_numpy().astype(np.float64))
        out_s, out_m, out_sl = [], [], []
        for s in np.unique(src):
            m = src == s
            n = int(m.sum())
            sx, sy = x[m].sum(), y[m].sum()
            sxy, sxx = (x[m] * y[m]).sum(), (x[m] * x[m]).sum()
            out_s.append(s)
            out_m.append(n)
            out_sl.append(round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6))
        return pa.table({"source": pa.array(out_s, type=pa.string()),
                         "n_terms": pa.array(out_m, type=pa.int64()),
                         "slope": pa.array(out_sl, type=pa.float64())})

    out = keyed_partition_map(tf, ["source"], fit_kernel).to_pandas()
    out = out.sort_values("source").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


SQL["zipf_fit_by_source"] = (
    "WITH tok AS (SELECT source, "
    "UNNEST(regexp_extract_all(lower(text), '\\S+')) AS term FROM documents), "
    "tf AS (SELECT source, term, COUNT(*) AS f FROM tok GROUP BY 1, 2), "
    "r AS (SELECT source, f, ROW_NUMBER() OVER "
    "(PARTITION BY source ORDER BY f DESC, term) AS rk FROM tf), "
    "t AS (SELECT source, LN(CAST(rk AS DOUBLE)) AS x, "
    "LN(CAST(f AS DOUBLE)) AS y FROM r WHERE rk <= 100), "
    "a AS (SELECT source, COUNT(*) AS m, SUM(x) AS sx, SUM(y) AS sy, "
    "SUM(x * y) AS sxy, SUM(x * x) AS sxx FROM t GROUP BY 1) "
    "SELECT source, CAST(m AS BIGINT) AS n_terms, "
    "ROUND((m * sxy - sx * sy) / (m * sxx - sx * sx), 6) AS slope "
    "FROM a ORDER BY source"
)


def bigram_logprob(sf_dir: str) -> pa.Table:
    """CCNet-style LM-proxy scoring at BIGRAM order: fit a corpus bigram
    model with add-one smoothing (distributed combiner-first bigram
    counts — pass 1), broadcast it once (``ray.put``), and score every
    document by its mean log2 P(wᵢ | wᵢ₋₁) = log2((c(a,b)+1)/(c(a)+V))
    over its bigram positions (pass 2, an actor-pool stage holding the
    model) — the step up from ``unigram_logprob`` that actually penalizes
    scrambled word order (shuffled near-dups score identically under a
    unigram model, far lower here).  c(a) is derived FROM the bigram
    table (Σ_b c(a,b) — no second count pass); V is the corpus distinct-
    token count (one tiny distinct aggregate).  Unseen bigrams never
    occur (the model is fit on the same corpus), so the join is total.
    Scale note: at web scale the broadcast bigram table is capped to
    top-K with the smoothing floor as OOV — same plumbing."""
    import ray

    import polars as pl

    from ..stages.groupagg import grouped_aggregate

    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def bigram_partial(batch: pa.Table) -> pa.Table:
        df = (pl.from_arrow(batch.select(["text"]))
              .select(ws=pl.col("text").str.split(" ")))
        df = df.with_columns(
            a=pl.col("ws").list.slice(0, pl.col("ws").list.len() - 1),
            b=pl.col("ws").list.slice(1),
        ).select("a", "b").explode("a", "b").drop_nulls()
        return (df.group_by(["a", "b"])
                .agg(n=pl.len().cast(pl.Int64)).to_arrow())

    def tok_partial(batch: pa.Table) -> pa.Table:
        return (pl.from_arrow(batch.select(["text"]))
                .select(tok=pl.col("text").str.split(" ")).explode("tok")
                .drop_nulls().unique()
                .with_columns(one=pl.lit(1, dtype=pl.Int64))).to_arrow()

    cb = grouped_aggregate(
        ds.map_batches(bigram_partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["a", "b"], [("n", "sum", "n")]).to_pandas()
    vocab_n = grouped_aggregate(
        ds.map_batches(tok_partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["tok"], [("one", "max", "one")]).count()
    ca = cb.groupby("a", sort=False)["n"].sum()
    na = ca.reindex(cb["a"]).to_numpy(np.float64)
    # same float expression as the oracle: (c_ab + 1) / (c_a + V), one LOG2
    lp = np.log2((cb["n"].to_numpy(np.float64) + 1.0) / (na + float(vocab_n)))
    model = pl.DataFrame({"a": cb["a"].to_numpy(object),
                          "b": cb["b"].to_numpy(object), "lp": lp})
    ref = ray.put(model)

    class Score:
        def __init__(self, r):
            self.model = ray.get(r)

        def __call__(self, batch: pa.Table) -> pa.Table:
            df = (pl.from_arrow(batch.select(["doc_id", "text"]))
                  .select("doc_id", ws=pl.col("text").str.split(" ")))
            df = df.with_columns(
                a=pl.col("ws").list.slice(0, pl.col("ws").list.len() - 1),
                b=pl.col("ws").list.slice(1),
            ).select("doc_id", "a", "b").explode("a", "b").drop_nulls()
            scored = df.join(self.model, on=["a", "b"], how="left")
            return (scored.group_by("doc_id")
                    .agg(n_bigrams=pl.len().cast(pl.Int64),
                         avg_logprob2=pl.col("lp").mean()).to_arrow())

    out = ds.map_batches(Score, fn_constructor_args=(ref,),
                         batch_format="pyarrow",
                         concurrency=(1, 8)).to_pandas()
    from .common import round_col

    out["avg_logprob2"] = round_col(out["avg_logprob2"], 6)
    return pa.Table.from_pandas(out.sort_values("doc_id").reset_index(drop=True),
                                preserve_index=False)


SQL["bigram_logprob"] = (
    "WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents), "
    "b AS (SELECT doc_id, ws[CAST(i AS BIGINT)] AS a, "
    "ws[CAST(i AS BIGINT) + 1] AS b "
    "FROM w, LATERAL UNNEST(range(1, len(ws))) AS t(i)), "
    "cb AS (SELECT a, b, COUNT(*) AS n FROM b GROUP BY 1, 2), "
    "ca AS (SELECT a, SUM(n) AS na FROM cb GROUP BY 1), "
    "v AS (SELECT COUNT(DISTINCT tok) AS vn FROM "
    "(SELECT UNNEST(ws) AS tok FROM w)), "
    "sc AS (SELECT x.doc_id, "
    "LOG2((CAST(cb.n AS DOUBLE) + 1) / (CAST(ca.na AS DOUBLE) + vn)) AS lp "
    "FROM b x JOIN cb ON cb.a = x.a AND cb.b = x.b "
    "JOIN ca ON ca.a = x.a CROSS JOIN v) "
    "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams, "
    "ROUND(AVG(lp), 6) AS avg_logprob2 "
    "FROM sc GROUP BY doc_id ORDER BY doc_id"
)


def tokenizer_fertility(sf_dir: str) -> pa.Table:
    """Tokenizer FERTILITY profile per source: how many BPE-style tokens
    the GPT-2-shaped pre-tokenizer (``bpe_token_counts``'s pattern)
    produces per whitespace word, and how many characters each BPE token
    carries — the corpus statistic that predicts training cost per byte
    and flags sources (code, numerics) that explode a tokenizer.  ONE
    combiner-first pass: each batch collapses to per-source integer sums
    (docs / chars / words / BPE runs) in vectorized polars regex kernels,
    a tiny grouped sum folds the partials, and the two fertility ratios
    are the same double expression the oracle evaluates (half-away
    rounding via ``round_col``)."""
    from ..stages.groupagg import grouped_aggregate
    from .common import round_col

    ds = read(sf_dir, "documents", ["source", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.DataFrame({
            "source": pl.from_arrow(batch.column("source").combine_chunks()),
            "t": pl.from_arrow(batch.column("text").combine_chunks()).fill_null(""),
        })
        df = df.with_columns(
            chars=pl.col("t").str.len_chars().cast(pl.Int64),
            words=pl.col("t").str.count_matches(r"\S+").cast(pl.Int64),
            bpe=pl.col("t").str.count_matches(_BPE_PAT).cast(pl.Int64),
        )
        return (df.group_by("source")
                .agg(n_docs=pl.len().cast(pl.Int64),
                     n_chars=pl.col("chars").sum(),
                     n_words=pl.col("words").sum(),
                     n_bpe=pl.col("bpe").sum()).to_arrow())

    out = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["source"],
        [("n_docs", "sum", "n_docs"), ("n_chars", "sum", "n_chars"),
         ("n_words", "sum", "n_words"), ("n_bpe", "sum", "n_bpe")],
    ).to_pandas()
    chars = out["n_chars"].to_numpy(np.float64)
    words = out["n_words"].to_numpy(np.float64)
    bpe = out["n_bpe"].to_numpy(np.float64)
    out["chars_per_bpe"] = round_col(chars / bpe, 6)
    out["bpe_per_word"] = round_col(bpe / words, 6)
    out = out.sort_values("source").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


SQL["tokenizer_fertility"] = (
    "WITH a AS (SELECT source, COUNT(*) AS n_docs, "
    "SUM(CAST(length(text) AS BIGINT)) AS n_chars, "
    "SUM(CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT)) AS n_words, "
    "SUM(CAST(len(regexp_extract_all(text, "
    "'[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+')) AS BIGINT)) AS n_bpe "
    "FROM documents GROUP BY 1) "
    "SELECT source, CAST(n_docs AS BIGINT) AS n_docs, "
    "CAST(n_chars AS BIGINT) AS n_chars, CAST(n_words AS BIGINT) AS n_words, "
    "CAST(n_bpe AS BIGINT) AS n_bpe, "
    "ROUND(CAST(n_chars AS DOUBLE) / CAST(n_bpe AS DOUBLE), 6) AS chars_per_bpe, "
    "ROUND(CAST(n_bpe AS DOUBLE) / CAST(n_words AS DOUBLE), 6) AS bpe_per_word "
    "FROM a ORDER BY source"
)


def doc_simpson_diversity(sf_dir: str) -> pa.Table:
    """Per-source SIMPSON diversity of the term distribution — the
    probability two random tokens from a source are the SAME term
    (concentration index; 1−D is diversity).  Complements
    ``lexical_diversity``'s per-doc TTR with a corpus-level view.
    Exact-int formulation: D = Σ n_t(n_t−1) / (N(N−1)) — both sums are
    int64 from ONE combiner-first (source, term) count (vocab-scale
    partials cross the exchange, never tokens), and the statistic is one
    mirrored float division."""
    from ..stages.groupagg import grouped_aggregate

    ds = read(sf_dir, "documents", ["source", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.DataFrame({
            "source": pl.from_arrow(batch.column("source").combine_chunks()),
            "t": pl.from_arrow(batch.column("text").combine_chunks())
            .fill_null("").str.to_lowercase(),
        })
        return (df.with_columns(tok=pl.col("t").str.extract_all(r"\S+"))
                .drop("t").explode("tok").drop_nulls("tok")
                .group_by(["source", "tok"])
                .agg(n=pl.len().cast(pl.Int64)).to_arrow())

    counts = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["source", "tok"], [("n", "sum", "n")],
    )

    def fold(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(batch)
        return (df.group_by("source")
                .agg(n_terms=pl.len().cast(pl.Int64),
                     n_tokens=pl.col("n").sum(),
                     s2=(pl.col("n") * (pl.col("n") - 1)).sum())
                .to_arrow())

    agg = grouped_aggregate(
        counts.map_batches(fold, batch_format="pyarrow", zero_copy_batch=True),
        ["source"],
        [("n_terms", "sum", "n_terms"), ("n_tokens", "sum", "n_tokens"),
         ("s2", "sum", "s2")],
    ).to_pandas()
    nt = agg["n_tokens"].to_numpy(np.int64)
    s2 = agg["s2"].to_numpy(np.int64)
    agg["simpson"] = s2.astype(np.float64) / (nt * (nt - 1)).astype(np.float64)
    out = agg[["source", "n_terms", "n_tokens", "simpson"]] \
        .sort_values("source").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


SQL["doc_simpson_diversity"] = (
    "WITH tok AS (SELECT source, "
    "UNNEST(regexp_extract_all(lower(text), '\\S+')) AS t FROM documents), "
    "c AS (SELECT source, t, COUNT(*) AS n FROM tok GROUP BY 1, 2), "
    "a AS (SELECT source, COUNT(*) AS n_terms, SUM(n) AS n_tokens, "
    "SUM(n * (n - 1)) AS s2 FROM c GROUP BY 1) "
    "SELECT source, CAST(n_terms AS BIGINT) AS n_terms, "
    "CAST(n_tokens AS BIGINT) AS n_tokens, "
    "CAST(s2 AS DOUBLE) / CAST(n_tokens * (n_tokens - 1) AS DOUBLE) "
    "AS simpson FROM a ORDER BY source"
)


def term_entropy_by_source(sf_dir: str) -> pa.Table:
    """Per-source Shannon ENTROPY of the term distribution (bits) — the
    information-density companion to ``doc_simpson_diversity``'s
    concentration index, over the same ONE combiner-first (source, term)
    count: H = log2(N) − Σ n·log2(n) / N, with the float Σ folded per
    source and ROUND 6 absorbing summation-order jitter (char_entropy /
    transition_entropy precedent)."""
    from ..stages.groupagg import grouped_aggregate
    from .common import round_col

    ds = read(sf_dir, "documents", ["source", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.DataFrame({
            "source": pl.from_arrow(batch.column("source").combine_chunks()),
            "t": pl.from_arrow(batch.column("text").combine_chunks())
            .fill_null("").str.to_lowercase(),
        })
        return (df.with_columns(tok=pl.col("t").str.extract_all(r"\S+"))
                .drop("t").explode("tok").drop_nulls("tok")
                .group_by(["source", "tok"])
                .agg(n=pl.len().cast(pl.Int64)).to_arrow())

    counts = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["source", "tok"], [("n", "sum", "n")],
    )

    def fold(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(batch)
        n = df["n"].to_numpy().astype(np.float64)
        df = df.with_columns(sl=pl.Series(n * np.log2(n)))
        return (df.group_by("source")
                .agg(n_terms=pl.len().cast(pl.Int64),
                     n_tokens=pl.col("n").sum(),
                     sl=pl.col("sl").sum()).to_arrow())

    agg = grouped_aggregate(
        counts.map_batches(fold, batch_format="pyarrow", zero_copy_batch=True),
        ["source"],
        [("n_terms", "sum", "n_terms"), ("n_tokens", "sum", "n_tokens"),
         ("sl", "sum", "sl")],
    ).to_pandas()
    nt = agg["n_tokens"].to_numpy(np.float64)
    agg["entropy_bits"] = round_col(
        np.log2(nt) - agg["sl"].to_numpy(np.float64) / nt, 6)
    out = agg[["source", "n_terms", "n_tokens", "entropy_bits"]] \
        .sort_values("source").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


SQL["term_entropy_by_source"] = (
    "WITH tok AS (SELECT source, "
    "UNNEST(regexp_extract_all(lower(text), '\\S+')) AS t FROM documents), "
    "c AS (SELECT source, t, COUNT(*) AS n FROM tok GROUP BY 1, 2), "
    "a AS (SELECT source, COUNT(*) AS n_terms, SUM(n) AS n_tokens, "
    "SUM(CAST(n AS DOUBLE) * LOG2(CAST(n AS DOUBLE))) AS sl FROM c "
    "GROUP BY 1) "
    "SELECT source, CAST(n_terms AS BIGINT) AS n_terms, "
    "CAST(n_tokens AS BIGINT) AS n_tokens, "
    "ROUND(LOG2(CAST(n_tokens AS DOUBLE)) - sl / CAST(n_tokens AS DOUBLE), 6) "
    "AS entropy_bits FROM a ORDER BY source"
)


def oov_rate_by_source(sf_dir: str, *, vocab_k: int = 1000) -> pa.Table:
    """OUT-OF-VOCABULARY rate per source against the corpus top-``vocab_k``
    vocabulary — the tokenizer-coverage check run before committing a
    vocab (a source with high OOV will shred into bytes/unks).  Two
    passes, both combiner-first: the global (term, count) aggregate
    feeds a count-desc/term-asc top-k cut (vocab-scale), the vocab
    broadcasts ONCE via ``ray.put`` as a hash set, and a second pass
    counts per-source member/non-member tokens vectorized (polars
    ``is_in`` against the broadcast list).  Shares are exact integer
    basis points."""
    import ray

    from ..stages.groupagg import grouped_aggregate

    ds = read(sf_dir, "documents", ["source", "text"])

    def term_partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        s = (pl.from_arrow(batch.column("text").combine_chunks())
             .fill_null("").str.to_lowercase())
        return (pl.DataFrame({"t": s})
                .with_columns(tok=pl.col("t").str.extract_all(r"\S+"))
                .drop("t").explode("tok").drop_nulls("tok")
                .group_by("tok").agg(n=pl.len().cast(pl.Int64)).to_arrow())

    counts = grouped_aggregate(
        ds.map_batches(term_partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["tok"], [("n", "sum", "n")],
    ).to_pandas()
    counts = counts.sort_values(["n", "tok"],
                                ascending=[False, True]).head(vocab_k)
    vocab_ref = ray.put(counts["tok"].tolist())

    class Oov:
        def __init__(self, ref):
            import polars as pl

            v = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            self.vocab = pl.Series("v", v)

        def __call__(self, batch: pa.Table) -> pa.Table:
            import polars as pl

            df = pl.DataFrame({
                "source": pl.from_arrow(
                    batch.column("source").combine_chunks()),
                "t": pl.from_arrow(batch.column("text").combine_chunks())
                .fill_null("").str.to_lowercase(),
            })
            return (df.with_columns(tok=pl.col("t").str.extract_all(r"\S+"))
                    .drop("t").explode("tok").drop_nulls("tok")
                    .with_columns(oov=(~pl.col("tok").is_in(self.vocab))
                                  .cast(pl.Int64))
                    .group_by("source")
                    .agg(n_tokens=pl.len().cast(pl.Int64),
                         n_oov=pl.col("oov").sum()).to_arrow())

    agg = grouped_aggregate(
        ds.map_batches(Oov, fn_constructor_args=(vocab_ref,),
                       batch_format="pyarrow", concurrency=(1, 8)),
        ["source"],
        [("n_tokens", "sum", "n_tokens"), ("n_oov", "sum", "n_oov")],
    ).to_pandas()
    agg["oov_bps"] = (10000 * agg["n_oov"].to_numpy(np.int64)
                      // agg["n_tokens"].to_numpy(np.int64))
    out = agg.sort_values("source").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


SQL["oov_rate_by_source"] = (
    "WITH tok AS (SELECT source, "
    "UNNEST(regexp_extract_all(lower(text), '\\S+')) AS t FROM documents), "
    "c AS (SELECT t, COUNT(*) AS n FROM tok GROUP BY 1), "
    "v AS (SELECT t FROM c ORDER BY n DESC, t LIMIT 1000), "
    "a AS (SELECT source, COUNT(*) AS n_tokens, "
    "SUM(CASE WHEN v.t IS NULL THEN 1 ELSE 0 END) AS n_oov "
    "FROM tok LEFT JOIN v ON v.t = tok.t GROUP BY 1) "
    "SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens, "
    "CAST(n_oov AS BIGINT) AS n_oov, "
    "CAST(10000 * n_oov // n_tokens AS BIGINT) AS oov_bps "
    "FROM a ORDER BY source"
)


def keyword_in_context(sf_dir: str, *, keyword: str = "spark") -> pa.Table:
    """KWIC concordance: every occurrence of ``keyword`` with its token
    position and one token of left/right context — the corpus-inspection
    primitive behind term audits and prompt-leak hunts.  Embarrassingly
    parallel single pass: one vectorized polars explode with positions
    per batch, filter on the keyword, shift-join the neighbor tokens
    in-partition (documents never straddle batches).  Boundary
    occurrences emit '' for the missing side, matching the oracle's
    COALESCE."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def kwic(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.DataFrame({
            "doc_id": np.asarray(batch.column("doc_id").combine_chunks()
                                 ).astype(np.int64),
            "t": pl.from_arrow(batch.column("text").combine_chunks())
            .fill_null("").str.to_lowercase(),
        })
        ex = (df.with_columns(tok=pl.col("t").str.extract_all(r"\S+"))
              .drop("t").explode("tok").drop_nulls("tok")
              .with_columns(pos=pl.int_range(pl.len()).over("doc_id")
                            .cast(pl.Int64)))
        hits = (ex.with_columns(
            prev_tok=pl.col("tok").shift(1, fill_value="").over("doc_id"),
            next_tok=pl.col("tok").shift(-1, fill_value="").over("doc_id"))
            .filter(pl.col("tok") == keyword)
            .select("doc_id", "pos", "prev_tok", "next_tok"))
        return hits.to_arrow()

    df = ds.map_batches(kwic, batch_format="pyarrow",
                        zero_copy_batch=True).to_pandas()
    if df.empty:
        return pa.table({"doc_id": pa.array([], type=pa.int64()),
                         "pos": pa.array([], type=pa.int64()),
                         "prev_tok": pa.array([], type=pa.string()),
                         "next_tok": pa.array([], type=pa.string())})
    df = df.sort_values(["doc_id", "pos"]).reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


SQL["keyword_in_context"] = (
    "WITH w AS (SELECT doc_id, "
    "regexp_extract_all(lower(text), '\\S+') AS ws FROM documents), "
    "x AS (SELECT doc_id, ws, CAST(i AS BIGINT) AS pos "
    "FROM w, LATERAL UNNEST(range(0, len(ws))) AS g(i)) "
    "SELECT doc_id, pos, "
    "COALESCE(ws[CAST(pos AS BIGINT)], '') AS prev_tok, "
    "COALESCE(ws[CAST(pos + 2 AS BIGINT)], '') AS next_tok "
    "FROM x WHERE ws[CAST(pos + 1 AS BIGINT)] = 'spark' "
    "ORDER BY doc_id, pos"
)


def vocab_growth_curve(sf_dir: str, *, points: int = 10) -> pa.Table:
    """HEAPS-LAW vocabulary growth: distinct terms seen after each decile
    of the corpus (docs in doc_id order) — the curve that predicts vocab
    size at 10× the data and sizes tokenizer budgets.  The insight that
    keeps it ONE pass: the prefix-distinct count at threshold T is just
    |{terms whose FIRST document ≤ T}| — so a combiner-first
    min-doc_id-per-term aggregate (vocab-scale exchange) plus a tiny
    histogram replaces any sequential scan.  All integers.  The final
    fold runs driver-side on the vocab-scale term table (small-scale
    verify role; at web scale it becomes one more map_batches histogram
    against broadcast rank thresholds)."""
    from ..stages.groupagg import grouped_aggregate

    ds = read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = ds.count()
    bounds = np.array([(i + 1) * n_docs // points for i in range(points)],
                      dtype=np.int64)

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.DataFrame({
            "doc_id": np.asarray(batch.column("doc_id").combine_chunks()
                                 ).astype(np.int64),
            "t": pl.from_arrow(batch.column("text").combine_chunks())
            .fill_null("").str.to_lowercase(),
        })
        return (df.with_columns(tok=pl.col("t").str.extract_all(r"\S+"))
                .drop("t").explode("tok").drop_nulls("tok")
                .group_by("tok")
                .agg(first_doc=pl.col("doc_id").min()).to_arrow())

    terms = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["tok"], [("first_doc", "min", "first_doc")],
    ).to_pandas()
    # doc_id rank (dense position in sorted doc order) ≈ doc_id order;
    # thresholds are doc-RANK based so gaps in doc_id don't skew deciles
    all_ids = np.sort(read(sf_dir, "documents", ["doc_id"])
                      .to_pandas()["doc_id"].to_numpy(np.int64))
    first_rank = np.searchsorted(all_ids, terms["first_doc"].to_numpy(np.int64),
                                 side="left") + 1
    vocab = np.array([(first_rank <= b).sum() for b in bounds],
                     dtype=np.int64)
    out = pd.DataFrame({
        "decile": np.arange(1, points + 1, dtype=np.int64),
        "n_docs": bounds,
        "vocab_size": vocab,
    })
    return pa.Table.from_pandas(out, preserve_index=False)


SQL["vocab_growth_curve"] = (
    "WITH tok AS (SELECT doc_id, "
    "UNNEST(regexp_extract_all(lower(text), '\\S+')) AS t FROM documents), "
    "f AS (SELECT t, MIN(doc_id) AS first_doc FROM tok GROUP BY 1), "
    "rk AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY doc_id) AS r "
    "FROM documents), "
    "fr AS (SELECT f.t, rk.r FROM f JOIN rk ON rk.doc_id = f.first_doc), "
    "nd AS (SELECT COUNT(*) AS n FROM documents), "
    "d AS (SELECT CAST(i + 1 AS BIGINT) AS decile, "
    "CAST((i + 1) * n // 10 AS BIGINT) AS n_docs "
    "FROM range(10) t(i), nd) "
    "SELECT d.decile, d.n_docs, "
    "CAST((SELECT COUNT(*) FROM fr WHERE fr.r <= d.n_docs) AS BIGINT) "
    "AS vocab_size "
    "FROM d ORDER BY d.decile"
)


def hapax_ratio_by_source(sf_dir: str) -> pa.Table:
    """Per-source HAPAX LEGOMENA ratio — the fraction of a source's
    vocabulary that occurs exactly once, the classic productivity /
    OCR-noise indicator a corpus audit reads next to entropy. Same ONE
    combiner-first (source, term) count as ``term_entropy_by_source``;
    the fold just counts n==1 terms per source, so the exchange carries
    per-batch vocab partials and the final table is |sources| rows."""
    from ..stages.groupagg import grouped_aggregate
    from .common import round_col

    ds = read(sf_dir, "documents", ["source", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.DataFrame({
            "source": pl.from_arrow(batch.column("source").combine_chunks()),
            "t": pl.from_arrow(batch.column("text").combine_chunks())
            .fill_null("").str.to_lowercase(),
        })
        return (df.with_columns(tok=pl.col("t").str.extract_all(r"\S+"))
                .drop("t").explode("tok").drop_nulls("tok")
                .group_by(["source", "tok"])
                .agg(n=pl.len().cast(pl.Int64)).to_arrow())

    counts = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["source", "tok"], [("n", "sum", "n")],
    )

    def fold(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(batch)
        return (df.group_by("source")
                .agg(n_terms=pl.len().cast(pl.Int64),
                     n_hapax=(pl.col("n") == 1).sum().cast(pl.Int64))
                .to_arrow())

    out = grouped_aggregate(
        counts.map_batches(fold, batch_format="pyarrow", zero_copy_batch=True),
        ["source"],
        [("n_terms", "sum", "n_terms"), ("n_hapax", "sum", "n_hapax")],
    ).to_pandas()
    out["hapax_ratio"] = round_col(
        out["n_hapax"].to_numpy(np.float64)
        / out["n_terms"].to_numpy(np.float64), 6)
    out = out.sort_values("source").reset_index(drop=True)
    return pa.Table.from_pandas(
        out[["source", "n_terms", "n_hapax", "hapax_ratio"]],
        preserve_index=False)


SQL["hapax_ratio_by_source"] = (
    "WITH tok AS (SELECT source, "
    "UNNEST(regexp_extract_all(lower(text), '\\S+')) AS t FROM documents), "
    "c AS (SELECT source, t, COUNT(*) AS n FROM tok GROUP BY 1, 2) "
    "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_terms, "
    "CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax, "
    "ROUND(CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE) "
    "/ COUNT(*), 6) AS hapax_ratio "
    "FROM c GROUP BY source ORDER BY source"
)


def term_position_profile(sf_dir: str, *, k: int = 20) -> pa.Table:
    """WHERE in documents do the top terms appear? For the k terms with
    highest document frequency (ties → lexicographic), the mean relative
    first-occurrence position ((first_index)/(doc token count), 0 = doc
    start) across the docs containing them — the positional-bias signal
    a boilerplate/header detector is built on. Two streaming passes:
    pass 1 is the combiner-first df aggregate (vocabulary-sized result,
    driver top-k on that aggregate only); pass 2 broadcasts the k-term
    set into a batch kernel that explodes tokens WITH positions, keeps
    the min index per (doc, top-term) (vectorized polars), and emits
    per-batch (term, Σrelpos, n) partials — the exchange is k-bounded."""
    from ..stages.groupagg import grouped_aggregate
    from .common import round_col

    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def df_partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.DataFrame({
            "doc_id": pl.from_arrow(batch.column("doc_id").combine_chunks()),
            "t": pl.from_arrow(batch.column("text").combine_chunks())
            .fill_null("").str.to_lowercase(),
        })
        return (df.with_columns(term=pl.col("t").str.extract_all(r"\S+"))
                .select("doc_id", "term").explode("term").drop_nulls()
                .group_by("term")
                .agg(df_part=pl.col("doc_id").n_unique().cast(pl.Int64))
                .to_arrow())

    agg = grouped_aggregate(
        ds.map_batches(df_partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["term"], [("df", "sum", "df_part")],
    ).to_pandas()
    agg = agg.sort_values(["df", "term"], ascending=[False, True]).head(k)
    agg.insert(0, "rank", np.arange(1, len(agg) + 1, dtype=np.int64))
    top = set(agg["term"])

    def pos_partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.DataFrame({
            "doc_id": pl.from_arrow(batch.column("doc_id").combine_chunks()),
            "t": pl.from_arrow(batch.column("text").combine_chunks())
            .fill_null("").str.to_lowercase(),
        })
        ex = (df.with_columns(term=pl.col("t").str.extract_all(r"\S+"))
              .select("doc_id", "term")
              .with_columns(ntok=pl.col("term").list.len().cast(pl.Int64))
              .explode("term").drop_nulls("term")
              .with_columns(pos=pl.int_range(pl.len()).over("doc_id")
                            .cast(pl.Int64))
              .filter(pl.col("term").is_in(list(top)))
              .group_by(["doc_id", "term"])
              .agg(fp=pl.col("pos").min(), ntok=pl.col("ntok").first()))
        ex = ex.with_columns(
            relpos=pl.col("fp").cast(pl.Float64)
            / pl.col("ntok").cast(pl.Float64))
        return (ex.group_by("term")
                .agg(s=pl.col("relpos").sum(),
                     n=pl.len().cast(pl.Int64)).to_arrow())

    pos = grouped_aggregate(
        ds.map_batches(pos_partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["term"], [("s", "sum", "s"), ("n", "sum", "n")],
    ).to_pandas()
    out = agg.merge(pos, on="term", how="left")
    out["mean_relpos"] = round_col(
        out["s"].to_numpy(np.float64) / out["n"].to_numpy(np.float64), 6)
    out = out[["rank", "term", "df", "mean_relpos"]].sort_values("rank")
    return pa.Table.from_pandas(out.reset_index(drop=True),
                                preserve_index=False)


SQL["term_position_profile"] = (
    "WITH d AS (SELECT doc_id, "
    "regexp_extract_all(lower(text), '\\S+') AS toks FROM documents), "
    "t AS (SELECT doc_id, UNNEST(toks) AS term FROM d), "
    "dt AS (SELECT DISTINCT doc_id, term FROM t), "
    "dfs AS (SELECT term, COUNT(*) AS df FROM dt GROUP BY term), "
    "top AS (SELECT term, df, "
    "ROW_NUMBER() OVER (ORDER BY df DESC, term) AS rank FROM dfs "
    "QUALIFY rank <= 20), "
    "pos AS (SELECT dt.term, "
    "CAST(list_position(d.toks, dt.term) - 1 AS DOUBLE) / len(d.toks) "
    "AS relpos FROM dt JOIN d USING (doc_id) "
    "JOIN top ON top.term = dt.term) "
    "SELECT top.rank, top.term, CAST(top.df AS BIGINT) AS df, "
    "ROUND(AVG(pos.relpos), 6) AS mean_relpos "
    "FROM pos JOIN top ON pos.term = top.term "
    "GROUP BY 1, 2, 3 ORDER BY rank"
)


def vocab_coverage_curve(sf_dir: str, *, ks: tuple = (10, 50, 100)) -> pa.Table:
    """Token-mass COVERAGE of the top-k vocabulary (k = 10/50/100): what
    fraction of all token occurrences the k most frequent terms absorb —
    the curve that sizes a tokenizer's base vocab and a stopword list.
    One combiner-first term-count aggregate (vocabulary-sized result),
    then the cumulative coverage at all three k's reads off one
    descending sort of that aggregate — the corpus is scanned once
    regardless of how many k's are asked. Tie-break tf DESC, term ASC
    mirrored in the oracle's ROW_NUMBER."""
    from ..stages.groupagg import grouped_aggregate
    from .common import round_col

    ds = read(sf_dir, "documents", ["text"])

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.DataFrame({
            "t": pl.from_arrow(batch.column("text").combine_chunks())
            .fill_null("").str.to_lowercase(),
        })
        return (df.with_columns(term=pl.col("t").str.extract_all(r"\S+"))
                .select("term").explode("term").drop_nulls()
                .group_by("term").agg(tf=pl.len().cast(pl.Int64)).to_arrow())

    agg = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["term"], [("tf", "sum", "tf")],
    ).to_pandas()
    agg = agg.sort_values(["tf", "term"], ascending=[False, True])
    tf = agg["tf"].to_numpy(np.int64)
    cum = np.cumsum(tf)
    tot = int(tf.sum())
    rows = []
    for k in ks:
        cov = int(cum[min(k, len(tf)) - 1]) if len(tf) else 0
        rows.append((k, cov, tot))
    out = pd.DataFrame(rows, columns=["k", "covered_tokens", "total_tokens"])
    out["coverage"] = round_col(
        out["covered_tokens"].to_numpy(np.float64)
        / out["total_tokens"].to_numpy(np.float64), 6)
    out = out.astype({"k": np.int64, "covered_tokens": np.int64,
                      "total_tokens": np.int64})
    return pa.Table.from_pandas(out.sort_values("k").reset_index(drop=True),
                                preserve_index=False)


SQL["vocab_coverage_curve"] = (
    "WITH tok AS (SELECT UNNEST(regexp_extract_all(lower(text), '\\S+')) "
    "AS term FROM documents), "
    "c AS (SELECT term, COUNT(*) AS tf FROM tok GROUP BY 1), "
    "r AS (SELECT term, tf, ROW_NUMBER() OVER ("
    "ORDER BY tf DESC, term) AS rk FROM c), "
    "tot AS (SELECT SUM(tf) AS t FROM c), "
    "ks AS (SELECT UNNEST([10, 50, 100]) AS k) "
    "SELECT CAST(ks.k AS BIGINT) AS k, "
    "(SELECT SUM(tf) FROM r WHERE rk <= ks.k) AS covered_tokens, "
    "CAST(tot.t AS BIGINT) AS total_tokens, "
    "ROUND(CAST((SELECT SUM(tf) FROM r WHERE rk <= ks.k) AS DOUBLE) "
    "/ tot.t, 6) AS coverage "
    "FROM ks, tot ORDER BY k"
)


def term_bigram_cond_entropy(sf_dir: str) -> pa.Table:
    """Conditional next-token entropy H(next | current) of the corpus
    term-bigram distribution — the predictability score (low = templated
    text, high = diverse prose) computed as
    (Σ_a n_a·log2 n_a − Σ_ab n_ab·log2 n_ab) / N over within-doc
    adjacent pairs. One combiner-first bigram count; the marginal is a
    second small aggregate OVER THE BIGRAM TABLE (keyed on the first
    term), so the corpus is tokenized exactly once. ROUND 6 absorbs the
    float Σ ordering (transition_entropy precedent)."""
    from ..stages.groupagg import grouped_aggregate
    from .common import round_col

    ds = read(sf_dir, "documents", ["text"])

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.DataFrame({
            "t": pl.from_arrow(batch.column("text").combine_chunks())
            .fill_null("").str.to_lowercase(),
        })
        toks = df.with_columns(w=pl.col("t").str.extract_all(r"\S+"))
        pairs = (toks.select(
            a=pl.col("w").list.slice(0, pl.col("w").list.len() - 1),
            b=pl.col("w").list.slice(1))
            .explode(["a", "b"]).drop_nulls())
        return (pairs.group_by(["a", "b"])
                .agg(n=pl.len().cast(pl.Int64)).to_arrow())

    bg = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["a", "b"], [("n", "sum", "n")],
    )

    def fold_pairs(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(batch)
        n = df["n"].to_numpy().astype(np.float64)
        return pa.table({
            "k": pa.array([0], type=pa.int64()),
            "N": pa.array([int(n.sum())], type=pa.int64()),
            "nd": pa.array([len(n)], type=pa.int64()),
            "slab": pa.array([float((n * np.log2(n)).sum())],
                             type=pa.float64()),
        })

    def fold_marg(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = (pl.from_arrow(batch).group_by("a")
              .agg(na=pl.col("n").sum()))
        na = df["na"].to_numpy().astype(np.float64)
        return pa.table({
            "k": pa.array([0], type=pa.int64()),
            "sla": pa.array([float((na * np.log2(na)).sum())],
                            type=pa.float64()),
        })

    bgm = bg.materialize()
    fp = grouped_aggregate(
        bgm.map_batches(fold_pairs, batch_format="pyarrow",
                        zero_copy_batch=True),
        ["k"], [("N", "sum", "N"), ("nd", "sum", "nd"),
                ("slab", "sum", "slab")]).to_pandas()
    # marginal needs all of a term's continuations co-located first
    from ..stages.keyed import keyed_partition_map

    marg = keyed_partition_map(bgm, ["a"], fold_marg)
    fm = grouped_aggregate(marg, ["k"], [("sla", "sum", "sla")]).to_pandas()
    N = int(fp["N"][0])
    h = (float(fm["sla"][0]) - float(fp["slab"][0])) / N
    return pa.table({
        "n_bigrams": pa.array([N], type=pa.int64()),
        "n_distinct_bigrams": pa.array([int(fp["nd"][0])], type=pa.int64()),
        "cond_entropy_bits": pa.array(round_col(np.array([h]), 6)),
    })


SQL["term_bigram_cond_entropy"] = (
    "WITH toks AS (SELECT doc_id, "
    "regexp_extract_all(lower(text), '\\S+') AS w FROM documents), "
    "pairs AS (SELECT w[CAST(i AS BIGINT)] AS a, "
    "w[CAST(i AS BIGINT) + 1] AS b "
    "FROM toks, LATERAL UNNEST(range(1, length(w))) AS t(i)), "
    "bg AS (SELECT a, b, COUNT(*) AS n FROM pairs GROUP BY 1, 2), "
    "mg AS (SELECT a, SUM(n) AS na FROM bg GROUP BY 1), "
    "s AS (SELECT (SELECT SUM(CAST(na AS DOUBLE) * LOG2(CAST(na AS DOUBLE))) "
    "FROM mg) AS sla, "
    "SUM(CAST(n AS DOUBLE) * LOG2(CAST(n AS DOUBLE))) AS slab, "
    "SUM(n) AS N, COUNT(*) AS nd FROM bg) "
    "SELECT CAST(N AS BIGINT) AS n_bigrams, "
    "CAST(nd AS BIGINT) AS n_distinct_bigrams, "
    "ROUND((sla - slab) / N, 6) AS cond_entropy_bits FROM s"
)


def char_trigram_top(sf_dir: str, *, k: int = 20) -> pa.Table:
    """Top character TRIGRAMS of the lowercased corpus (spaces count —
    they carry word-boundary signal), the language/encoding fingerprint
    scanner. The kernel never loops rows: each batch joins its texts
    with a NUL separator, views the bytes as uint8, packs every 3-byte
    window into one int with two shifted adds, masks windows that cross
    a separator, and np.unique-counts — ~4 vectorized ops per batch
    (ASCII corpus asserted; byte==char there, matching SQL substr
    semantics). Exchange carries int24-keyed partials; top-k on the
    ≤256³-bounded aggregate."""
    from ..stages.groupagg import grouped_aggregate

    ds = read(sf_dir, "documents", ["text"])

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        blob = "\x00".join(t.lower() for t in texts if t)
        b = blob.encode("ascii")  # asserts ASCII (fixture invariant)
        arr = np.frombuffer(b, dtype=np.uint8)
        if len(arr) < 3:
            return pa.table({"code": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        w = (arr[:-2].astype(np.int64) * 65536
             + arr[1:-1].astype(np.int64) * 256 + arr[2:].astype(np.int64))
        ok = (arr[:-2] != 0) & (arr[1:-1] != 0) & (arr[2:] != 0)
        codes, counts = np.unique(w[ok], return_counts=True)
        return pa.table({"code": pa.array(codes, type=pa.int64()),
                         "n": pa.array(counts.astype(np.int64))})

    agg = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["code"], [("n", "sum", "n")],
    ).to_pandas()
    codes = agg["code"].to_numpy(np.int64)
    tri = np.array([chr(c >> 16) + chr((c >> 8) & 255) + chr(c & 255)
                    for c in codes], dtype=object)
    agg = pd.DataFrame({"trigram": tri, "n": agg["n"].to_numpy(np.int64)})
    agg = agg.sort_values(["n", "trigram"], ascending=[False, True]).head(k)
    agg.insert(0, "rank", np.arange(1, len(agg) + 1, dtype=np.int64))
    return pa.Table.from_pandas(agg.reset_index(drop=True),
                                preserve_index=False)


SQL["char_trigram_top"] = (
    "WITH tri AS (SELECT substr(lower(text), CAST(i AS BIGINT), 3) "
    "AS trigram FROM documents, "
    "LATERAL UNNEST(range(1, length(text) - 1)) AS t(i)), "
    "c AS (SELECT trigram, COUNT(*) AS n FROM tri GROUP BY 1), "
    "r AS (SELECT trigram, n, ROW_NUMBER() OVER ("
    "ORDER BY n DESC, trigram) AS rank FROM c) "
    "SELECT CAST(rank AS BIGINT) AS rank, trigram, CAST(n AS BIGINT) AS n "
    "FROM r WHERE rank <= 20 ORDER BY rank"
)


def length_anova_by_source(sf_dir: str) -> pa.Table:
    """One-way ANOVA F-statistic for document length (n_chars) across
    sources — does source explain length variance? All moments are
    EXACT integer sums (Σn, Σx, Σx² per source, combiner-first); only
    the final mirrored F formula is float, ROUND 6
    (grouped_regression precedent). Output: group count, N, F."""
    from ..stages.groupagg import grouped_aggregate
    from .common import round_col

    ds = read(sf_dir, "documents", ["source", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(batch)
        x = df.get_column("n_chars").cast(pl.Int64)
        return (df.with_columns(x=x, x2=x * x).group_by("source")
                .agg(n=pl.len().cast(pl.Int64), sx=pl.col("x").sum(),
                     sxx=pl.col("x2").sum()).to_arrow())

    g = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["source"], [("n", "sum", "n"), ("sx", "sum", "sx"),
                     ("sxx", "sum", "sxx")]).to_pandas()
    n = g["n"].to_numpy(np.int64)
    sx = g["sx"].to_numpy(np.int64)
    sxx = g["sxx"].to_numpy(np.int64)
    N = int(n.sum()); K = len(g)
    SX = int(sx.sum()); SXX = int(sxx.sum())
    # SSB = Σ sx_k²/n_k − SX²/N ; SSW = SXX − Σ sx_k²/n_k  (float here,
    # mirrored term-for-term in the oracle)
    sb = float((sx.astype(np.float64) ** 2 / n).sum())
    ssb = sb - float(SX) ** 2 / N
    ssw = float(SXX) - sb
    f = (ssb / (K - 1)) / (ssw / (N - K))
    return pa.table({
        "n_sources": pa.array([K], type=pa.int64()),
        "n_docs": pa.array([N], type=pa.int64()),
        "f_stat": pa.array(round_col(np.array([f]), 6)),
    })


SQL["length_anova_by_source"] = (
    "WITH g AS (SELECT source, COUNT(*) AS n, "
    "SUM(CAST(n_chars AS BIGINT)) AS sx, "
    "SUM(CAST(n_chars AS BIGINT) * CAST(n_chars AS BIGINT)) AS sxx "
    "FROM documents GROUP BY 1), "
    "t AS (SELECT COUNT(*) AS K, SUM(n) AS N, SUM(sx) AS SX, "
    "SUM(sxx) AS SXX, "
    "SUM(CAST(sx AS DOUBLE) * sx / n) AS sb FROM g) "
    "SELECT CAST(K AS BIGINT) AS n_sources, CAST(N AS BIGINT) AS n_docs, "
    "ROUND(((sb - CAST(SX AS DOUBLE) * SX / N) / (K - 1)) "
    "/ ((CAST(SXX AS DOUBLE) - sb) / (N - K)), 6) AS f_stat FROM t"
)


def token_length_histogram(sf_dir: str) -> pa.Table:
    """Token character-LENGTH distribution of the corpus — the
    calibration table for tokenizer byte-budget / truncation decisions.
    Per-batch vectorized: explode tokens, measure lengths, pre-count
    (length, n) — the exchange carries ≤|distinct lengths| rows per
    batch. Exact integers."""
    from ..stages.groupagg import grouped_aggregate

    ds = read(sf_dir, "documents", ["text"])

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.DataFrame({
            "t": pl.from_arrow(batch.column("text").combine_chunks())
            .fill_null("").str.to_lowercase(),
        })
        return (df.with_columns(tok=pl.col("t").str.extract_all(r"\S+"))
                .select("tok").explode("tok").drop_nulls()
                .with_columns(tok_len=pl.col("tok").str.len_chars()
                              .cast(pl.Int64))
                .group_by("tok_len")
                .agg(n=pl.len().cast(pl.Int64)).to_arrow())

    out = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["tok_len"], [("n", "sum", "n")],
    ).to_pandas()
    out = out.sort_values("tok_len").reset_index(drop=True)
    return pa.Table.from_pandas(out[["tok_len", "n"]], preserve_index=False)


SQL["token_length_histogram"] = (
    "WITH tok AS (SELECT UNNEST(regexp_extract_all(lower(text), '\\S+')) "
    "AS t FROM documents) "
    "SELECT CAST(length(t) AS BIGINT) AS tok_len, COUNT(*) AS n "
    "FROM tok GROUP BY 1 ORDER BY 1"
)


def k_anonymity_audit(sf_dir: str, *, ks: tuple = (2, 5, 10)) -> pa.Table:
    """K-ANONYMITY audit over the (lang, source) quasi-identifier: how
    many attribute combinations are carried by fewer than k documents —
    the re-identification risk screen run before releasing corpus
    slices. ONE combiner-first (lang, source) count; every k reads off
    the same |combos|-row aggregate."""
    from ..stages.groupagg import grouped_aggregate

    ds = read(sf_dir, "documents", ["lang", "source"])

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        return (pl.from_arrow(batch).group_by(["lang", "source"])
                .agg(n=pl.len().cast(pl.Int64)).to_arrow())

    g = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["lang", "source"], [("n", "sum", "n")],
    ).to_pandas()
    n = g["n"].to_numpy(np.int64)
    rows = [(k, len(g), int((n < k).sum()), int(n[n < k].sum()))
            for k in ks]
    out = pd.DataFrame(rows, columns=["k", "n_groups", "n_below_k",
                                      "n_docs_at_risk"])
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return pa.Table.from_pandas(out.sort_values("k").reset_index(drop=True),
                                preserve_index=False)


SQL["k_anonymity_audit"] = (
    "WITH g AS (SELECT lang, source, COUNT(*) AS n FROM documents "
    "GROUP BY 1, 2), "
    "ks AS (SELECT UNNEST([2, 5, 10]) AS k) "
    "SELECT CAST(ks.k AS BIGINT) AS k, "
    "(SELECT COUNT(*) FROM g) AS n_groups, "
    "CAST((SELECT COUNT(*) FROM g WHERE g.n < ks.k) AS BIGINT) "
    "AS n_below_k, "
    "CAST((SELECT COALESCE(SUM(n), 0) FROM g WHERE g.n < ks.k) AS BIGINT) "
    "AS n_docs_at_risk "
    "FROM ks ORDER BY k"
)


def char_class_profile(sf_dir: str) -> pa.Table:
    """Character-CLASS composition per source: fractions of letters,
    digits, whitespace and other — the encoding/noise audit that flags
    OCR junk and markup baths before tokenization. The kernel counts
    classes on the raw uint8 view of each batch's concatenated text
    buffer (two masked sums per class, no per-row work; ASCII corpus
    invariant); the exchange carries 4 integers per (batch, source).
    Exact integers, ROUND 6 fractions."""
    from ..stages.groupagg import grouped_aggregate
    from .common import round_col

    ds = read(sf_dir, "documents", ["source", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        src = np.asarray(batch.column("source").combine_chunks(),
                         dtype=object)
        texts = batch.column("text").to_pylist()
        usrc = np.unique(src)
        rows = []
        for s in usrc:
            blob = "".join(t for t, ss in zip(texts, src) if ss == s and t)
            a = np.frombuffer(blob.encode("ascii"), dtype=np.uint8)
            letters = int((((a >= 97) & (a <= 122))
                           | ((a >= 65) & (a <= 90))).sum())
            digits = int(((a >= 48) & (a <= 57)).sum())
            spaces = int(((a == 32) | (a == 9) | (a == 10) | (a == 13)).sum())
            rows.append((s, len(a), letters, digits, spaces))
        df = pl.DataFrame(rows, schema=["source", "n_chars", "letters",
                                        "digits", "spaces"], orient="row")
        return df.to_arrow()

    out = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["source"], [("n_chars", "sum", "n_chars"),
                     ("letters", "sum", "letters"),
                     ("digits", "sum", "digits"),
                     ("spaces", "sum", "spaces")]).to_pandas()
    tot = out["n_chars"].to_numpy(np.float64)
    for c in ("letters", "digits", "spaces"):
        out[f"{c[:-1]}_frac" if c != "spaces" else "space_frac"] = round_col(
            out[c].to_numpy(np.float64) / tot, 6)
    out = out[["source", "n_chars", "letter_frac", "digit_frac",
               "space_frac"]]
    out = out.sort_values("source").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


SQL["char_class_profile"] = (
    "WITH c AS (SELECT source, "
    "CAST(SUM(length(text)) AS BIGINT) AS n_chars, "
    "CAST(SUM(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))) "
    "AS BIGINT) AS letters, "
    "CAST(SUM(length(regexp_replace(text, '[^0-9]', '', 'g'))) "
    "AS BIGINT) AS digits, "
    "CAST(SUM(length(text) "
    "- length(regexp_replace(text, '[ \\t\\n\\r]', '', 'g'))) AS BIGINT) "
    "AS spaces FROM documents GROUP BY 1) "
    "SELECT source, n_chars, "
    "ROUND(CAST(letters AS DOUBLE) / n_chars, 6) AS letter_frac, "
    "ROUND(CAST(digits AS DOUBLE) / n_chars, 6) AS digit_frac, "
    "ROUND(CAST(spaces AS DOUBLE) / n_chars, 6) AS space_frac "
    "FROM c ORDER BY source"
)


def part_name_top_tokens(sf_dir: str, *, k: int = 20) -> pa.Table:
    """Top tokens of the part-name catalog (p_name) — the same
    combiner-first vocabulary machinery pointed at a DIMENSION string
    column (catalog normalization / attribute extraction prep)."""
    from ..stages.groupagg import grouped_aggregate

    ds = read(sf_dir, "part", ["p_name"])

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.DataFrame({
            "t": pl.from_arrow(batch.column("p_name").combine_chunks())
            .fill_null("").str.to_lowercase(),
        })
        return (df.with_columns(tok=pl.col("t").str.extract_all(r"\S+"))
                .select("tok").explode("tok").drop_nulls()
                .group_by("tok").agg(n=pl.len().cast(pl.Int64)).to_arrow())

    agg = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["tok"], [("n", "sum", "n")],
    ).to_pandas()
    agg = agg.sort_values(["n", "tok"], ascending=[False, True]).head(k)
    agg.insert(0, "rank", np.arange(1, len(agg) + 1, dtype=np.int64))
    agg = agg.rename(columns={"tok": "token"})
    agg["n"] = agg["n"].astype(np.int64)
    return pa.Table.from_pandas(agg.reset_index(drop=True),
                                preserve_index=False)


SQL["part_name_top_tokens"] = (
    "WITH tok AS (SELECT UNNEST(regexp_extract_all(lower(p_name), "
    "'\\S+')) AS token FROM part), "
    "c AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY 1), "
    "r AS (SELECT token, n, ROW_NUMBER() OVER (ORDER BY n DESC, token) "
    "AS rank FROM c) "
    "SELECT CAST(rank AS BIGINT) AS rank, token, CAST(n AS BIGINT) AS n "
    "FROM r WHERE rank <= 20 ORDER BY rank"
)
