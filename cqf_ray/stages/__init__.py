from .agg import build_sketch, build_sketch_actors, grouped_sketches, partial_sketches, tree_merge_blobs
from .groupagg import grouped_aggregate
from .join import broadcast_join
from .probe import SketchProbe, probe_dataset

__all__ = [
    "build_sketch",
    "build_sketch_actors",
    "grouped_sketches",
    "partial_sketches",
    "tree_merge_blobs",
    "grouped_aggregate",
    "broadcast_join",
    "SketchProbe",
    "probe_dataset",
]
