"""mklab_focused_crawler_spark — a from-scratch, PySpark-native analytics
engine with the query/data-processing capabilities of
MKLab-ITI/mklab-focused-crawler (reference: Apache Storm topology, Java).

Architecture: batch-iterative crawl loop over snapshot-versioned Parquet
tables (Iceberg-style commit semantics), DataFrame/SQL declarative plans,
vectorized pandas/Arrow UDFs for the non-relational kernels (HTML span
extraction, MinHash signatures), zero per-row Python in hot paths.

See SURVEY.md for the full reference-to-Spark operator mapping.
"""

__version__ = "0.1.0"
