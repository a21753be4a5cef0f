"""raysketch — Ray-Data-native counting-sketch & data-processing engine.

Convenience surface; submodules hold the full API (see README.md):

* ``cqf_ray.sketches`` — CQF + companion mergeable sketches
* ``cqf_ray.stages`` — build/merge, probe, join, grouped-aggregate, ANN
* ``cqf_ray.sources`` — transcript derivations + generators
* ``cqf_ray.pipelines`` — driver-facing query pipelines
* ``cqf_ray.state`` — checkpointed + streaming builds
"""

from .sketches import (  # noqa: F401
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
