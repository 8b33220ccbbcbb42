"""near_duplicate_detection_spark — a PySpark-native near-duplicate detection
and clustering engine.

A from-scratch distributed re-expression of the query and data-processing
capabilities of the reference repo ``JacobLoe/near_duplicate_detection``
(single-node Flask + filesystem pipeline), re-targeted at Common-Crawl-style
web pages per the north rule:

  stage 1  byte-deterministic text extraction + k-shingle MinHash signatures
           + SimHash64 fingerprints      (reference: ndd/extract_features.py)
  stage 2  LSH band equi-join candidate generation + exact-Jaccard verify
           (replaces the reference's brute-force O(N) distance scan,
           ndd/server_ndd.py:104-117)
  stage 3  iterative connected-components clustering + representative pick
           (generalizes the reference's per-(videoid, shot) dedup grouping,
           ndd/server_ndd.py:127-141)

All heavy per-row compute is Arrow-batched (pandas UDFs / mapInPandas); all
relational work is DataFrame/SQL so Catalyst plans it. No RDDs anywhere.
"""

from near_duplicate_detection_spark.config import NDDConfig

__all__ = ["NDDConfig"]
__version__ = "0.1.0"
