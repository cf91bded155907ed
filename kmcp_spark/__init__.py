"""kmcp_spark — PySpark-native near-duplicate detection & clustering engine.

A from-scratch re-imagining of the capabilities of shenwei356/kmcp
(k-mer sketch compute → index → search → merge → profile) as an idiomatic
Spark pipeline over tables of audio clip + transcript pairs:

    clips → sketch (MinHash / SimHash / minimizer / syncmer over
            transcript k-grams + quantized spectral-frame tokens)
          → LSH banding into buckets (salted, skew-aware)
          → candidate pairs → verification (signature Jaccard /
            containment, SimHash Hamming, suffix-array substring)
          → connected components (hash-min label propagation)
          → cluster reports + metrics.

Everything here derives from public knowledge only: the Apache Spark /
PySpark API, the reference repo's observable behavior, and published
papers (FracMinHash, minimizers, closed syncmers, COBS, MinHash-LSH).
Reference citations in docstrings use `kmcp/cmd/<file>.go:<line>` paths
relative to /root/reference so parity can be checked; no code is copied.
"""

__version__ = "0.1.0"
