"""raysketch — Ray-Data-native counting-sketch & data-processing engine.

Convenience surface; submodules hold the full API (see README.md):

* ``cqf_ray.sketches`` — CQF + companion mergeable sketches
* ``cqf_ray.stages`` — build/merge, probe, join, grouped-aggregate, ANN
* ``cqf_ray.sources`` — transcript derivations + generators
* ``cqf_ray.pipelines`` — driver-facing query pipelines
* ``cqf_ray.state`` — checkpointed + streaming builds
"""

def _ensure_polars_healthy() -> None:
    """Eagerly import polars and HEAL a cancellation-poisoned install.

    Ray can cancel a worker's in-flight task (limit pushdown, early-exit
    iteration, executor abort) in the middle of that worker's very first
    ``import polars``. Python unwinds the in-progress modules but leaves
    already-registered SUBmodules (``polars._reexport`` …) half-initialized
    in ``sys.modules``; every later polars call in that reused worker then
    dies with ``module 'polars._reexport' has no attribute 'Series'``
    (observed cascading across a full test run). Because every pipeline
    UDF lives in ``cqf_ray.pipelines.*``, each fresh worker imports this
    package before running anything — so importing polars HERE (a) makes
    every kernel-level ``import polars`` a cache hit, eliminating the
    mid-kernel cancellation window, and (b) re-runs on the next task after
    a cancelled import (the unwind removed ``cqf_ray`` from sys.modules
    too), where the purge below restores a clean polars."""
    import sys

    try:
        import polars as pl

        pl.Series  # touch the attrs the lazy machinery resolves
        sys.modules["polars._reexport"].Series
    except Exception:
        for k in [k for k in list(sys.modules)
                  if k == "polars" or k.startswith("polars.")]:
            sys.modules.pop(k, None)
        import polars  # noqa: F401  (clean re-import)


_ensure_polars_healthy()

from .sketches import (  # noqa: F401,E402
    CQF,
    BloomFilter,
    CountMinSketch,
    HyperLogLog,
    KLL,
    MinHasher,
    Sketch,
    TDigest,
    sketch_from_bytes,
)


def build_sketch(*args, **kwargs):
    from .stages.agg import build_sketch as _f

    return _f(*args, **kwargs)


def probe_dataset(*args, **kwargs):
    from .stages.probe import probe_dataset as _f

    return _f(*args, **kwargs)
