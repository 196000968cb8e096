"""Query plans: the reference's declared query surface + extensions.

Each plan module exposes:
- ``QUERIES``: dict name -> callable(spark, sf_dir) -> DataFrame
- ``ORACLE``:  dict name -> equivalent DuckDB SQL over the driver's
  pre-registered views (region nation customer supplier part orders
  lineitem events documents embeddings)

Column names/aliases are kept identical between the Spark plan and the
oracle SQL — the driver's comparator sorts columns by name before
hashing values.
"""
