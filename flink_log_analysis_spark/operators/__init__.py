"""Engine operators beyond built-in DataFrame ops.

- :mod:`.textstats`   — tokenization, quality scoring, language ID
- :mod:`.dedup`       — exact, MinHash-LSH, SimHash deduplication
- :mod:`.similarity`  — embedding similarity search (brute force + LSH)
- :mod:`.multimodal`  — binary media columns + pandas-UDF plumbing
- :mod:`.upsert`      — keyed upsert sink (the reference's JDBC
  PK-upsert semantics) and streaming top-k
"""
