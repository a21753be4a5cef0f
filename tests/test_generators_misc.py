"""Zipf generator, actor-pool build parity, canonical dedup groups."""

import numpy as np
import pyarrow as pa
import pytest

from conftest import SF_DIR


def test_zipf_deterministic_and_skewed():
    from cqf_ray.sources.zipf import ZipfGenerator

    a = ZipfGenerator(10_000, theta=1.0, seed=9).draw(50_000)
    b = ZipfGenerator(10_000, theta=1.0, seed=9).draw(50_000)
    assert (a == b).all()
    assert a.min() >= 0 and a.max() < 10_000
    # zipf(1.0): rank 0 alone carries ~1/H(n) ≈ 10% of mass at n=10k
    top1 = (a == 0).mean()
    g = ZipfGenerator(10_000, theta=1.0, seed=9)
    assert abs(top1 - g.expected_top_share(1)) < 0.01
    assert top1 > 0.08
    # heavier exponent ⇒ heavier head
    heavy = ZipfGenerator(10_000, theta=1.5, seed=9).draw(50_000)
    assert (heavy == 0).mean() > top1


def test_actor_build_bitwise_equals_task_build(ray_session):
    import ray

    from cqf_ray import keys
    from cqf_ray.sketches import CQF
    from cqf_ray.stages.agg import build_sketch, build_sketch_actors

    ds = ray.data.read_parquet(f"{SF_DIR}/events.parquet", columns=["user_id"])
    mk = lambda: CQF(q=8, key_bits=34, hash_mode="invertible", seed=0)  # noqa: E731
    a = build_sketch_actors(ds, keys.int_column("user_id"), mk, num_actors=2)
    b = build_sketch(ds, keys.int_column("user_id"), mk, batch_size=256)
    assert a.to_bytes() == b.to_bytes()


def test_near_dup_canonical_on_planted(ray_session, tmp_path_factory):
    # reuse the planted fixture logic via a tiny local corpus
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("nd")
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 6
    texts = [base, base, base.replace("gamma", "gamms"), "totally different words here " * 8]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(4), type=pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * 4),
                "source": pa.array(["t"] * 4),
                "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    from cqf_ray.pipelines.dedup import near_dup_canonical

    t = near_dup_canonical(str(d), threshold=0.6).to_pandas()
    grp = dict(zip(t.doc_id, t.canonical_id))
    assert grp[0] == 0 and grp[1] == 0 and grp[2] == 0  # one group, canon=min
    assert 3 not in grp  # unrelated doc untouched
    keep = dict(zip(t.doc_id, t.keep))
    assert keep[0] and not keep[1] and not keep[2]


def test_lang_id_on_planted_stopwords(ray_session, tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("lang")
    docs = {
        "en": "the cat and the dog sat in that house for it was warm with food",
        "de": "der hund und die katze ist nicht mit der maus auf ein dach zu gehen",
        "fr": "le chien et la souris est pour les chats dans une maison que jamais",
        "es": "el perro y la casa es para los gatos con una mesa no por nada",
    }
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(len(docs)), type=pa.int64()),
                "text": pa.array(list(docs.values())),
                "lang": pa.array(list(docs.keys())),
                "source": pa.array(["t"] * len(docs)),
                "n_chars": pa.array([len(v) for v in docs.values()], type=pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    from cqf_ray.pipelines.textq import lang_id

    t = lang_id(str(d)).to_pandas()
    correct = t[t.lang == t.lang_pred]["n"].sum()
    assert correct == len(docs)  # stopword-marker heuristic nails planted docs


def test_sketch_quantiles_agree_with_exact(ray_session):
    from cqf_ray import keys
    from cqf_ray.pipelines.common import read
    from cqf_ray.pipelines.relational import value_quantiles_exact
    from cqf_ray.pipelines.sketchq import kll_value_quantiles, tdigest_value_quantiles
    from cqf_ray.sketches import KLL, TDigest
    from cqf_ray.stages.agg import build_sketch

    exact = value_quantiles_exact(SF_DIR).to_pandas().set_index("q")["value"]
    ds = read(SF_DIR, "events", ["value"])
    sketches = {
        "tdigest": build_sketch(ds, keys.float_column("value"), lambda: TDigest(delta=300.0)),
        "kll": build_sketch(ds, keys.float_column("value"), lambda: KLL(k=256, seed=5)),
    }
    for name, sk in sketches.items():
        for q in (0.5, 0.9):
            rel = abs(sk.quantile(q) - exact[q]) / max(abs(exact[q]), 1e-9)
            assert rel < 0.06, (name, q, sk.quantile(q), exact[q])
    # the driver-facing queries emit the rank-bound verdict form
    for fn in (tdigest_value_quantiles, kll_value_quantiles):
        t = fn(SF_DIR).to_pandas()
        assert t["in_bounds"].all(), fn.__name__


def test_contamination_finds_planted_leak(ray_session, tmp_path):
    """A doc that quotes an eval-side string verbatim must show the
    quoted substring's shingles as hits; clean docs must show zero."""
    import pyarrow.parquet as pq

    leak = "secret eval answer forty two"
    docs = [
        "totally clean training text with no overlap whatsoever here",
        f"model output copied: {leak} pasted into the training corpus",
    ]
    pq.write_table(
        pa.table({
            "doc_id": pa.array([0, 1], type=pa.int64()),
            "text": pa.array(docs),
            "lang": pa.array(["en", "en"]),
            "source": pa.array(["t", "t"]),
            "n_chars": pa.array([len(t) for t in docs], type=pa.int64()),
        }),
        str(tmp_path / "documents.parquet"),
    )
    pq.write_table(
        pa.table({"props": pa.array([f'{{"answer": "{leak}"}}', '{"k": 1}'])}),
        str(tmp_path / "events.parquet"),
    )
    from cqf_ray.pipelines.textq import contamination_ngram

    t = contamination_ngram(str(tmp_path)).to_pandas().set_index("doc_id")
    assert t.loc[0, "n_hit"] == 0
    # every 5-gram inside the quoted leak string is a hit
    assert t.loc[1, "n_hit"] >= len(leak) - 4
    assert t.loc[1, "n_hit"] < t.loc[1, "n_shingles"]


def test_every_oracle_key_has_a_query():
    import __ray_entry__ as E

    qs, sql = E.queries(), E.oracle_sql()
    missing = set(sql) - set(qs)
    assert not missing, f"oracle entries without queries: {missing}"
    assert len(qs) >= 40
