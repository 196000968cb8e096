"""Engine operators beyond built-in DataFrame ops.

- :mod:`.textstats`   — tokenization (whitespace + BPE-ish regex),
  quality scoring, n-gram language ID, rolling-hash fingerprints
- :mod:`.dedup`       — exact, MinHash-LSH, SimHash, n-gram Jaccard
  and embedding-cosine deduplication
- :mod:`.graph`       — connected components (scale-adaptive: local
  union-find / distributed label propagation) for dedup clustering
- :mod:`.similarity`  — embedding similarity search (brute force,
  multiprobe LSH, KMeans IVF)
- :mod:`.asof`        — as-of (nearest-preceding temporal) join via
  union + ordered window
- :mod:`.skew`        — salted joins / salted aggregation for hot keys
- :mod:`.multimodal`  — binary media columns + pandas-UDF plumbing
  (feature extraction, resize, frame sampling; codecs stubbed)
"""
