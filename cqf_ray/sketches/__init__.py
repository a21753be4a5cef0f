from .base import Sketch, sketch_from_bytes
from .ams import AmsSketch
from .fd import FrequentDirections
from .bloom import BloomFilter
from .bottomk import BottomKSample
from .cms import CountMinSketch
from .cqf import CQF, CQFNoSpace
from .hll import HyperLogLog
from .kll import KLL
from .minhash import MinHasher, jaccard_exact
from .misragries import MisraGries
from .simhash import hamming64, simhash64
from .tdigest import TDigest
from .theta import ThetaSketch

__all__ = [
    "CQF",
    "CQFNoSpace",
    "Sketch",
    "sketch_from_bytes",
    "AmsSketch",
    "FrequentDirections",
    "BloomFilter",
    "BottomKSample",
    "ThetaSketch",
    "CountMinSketch",
    "HyperLogLog",
    "KLL",
    "TDigest",
    "MinHasher",
    "MisraGries",
    "jaccard_exact",
    "simhash64",
    "hamming64",
]
