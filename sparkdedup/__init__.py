"""sparkdedup — a PySpark-native near-duplicate detection & clustering engine.

A from-scratch rebuild of the capabilities of
elisemercury/Duplicate-Image-Finder (difPy v4.2.1, see /root/reference
and SURVEY.md) for source-code / text corpora at cluster scale:

    scan -> validate -> featurize (sha256 / MinHash / SimHash)
         -> candidate pairs (LSH banding, never O(n^2))
         -> verify (Jaccard estimate + SimHash Hamming + containment)
         -> connected components -> rank representatives -> sinks.

Everything is expressed with the PySpark DataFrame API so Catalyst /
Tungsten / AQE pick the physical plan; Python appears only inside
Arrow-vectorized pandas UDFs (signature computation, substring
verification).
"""

from sparkdedup.config import DedupConfig
from sparkdedup.plans.pipeline import build_signatures, search_clusters

__all__ = ["DedupConfig", "build_signatures", "search_clusters"]
__version__ = "0.1.0"
