"""infoscience_imports_spark — PySpark-native near-duplicate detection + clustering.

A from-scratch, Spark-first engine generalizing the record-dedup semantics of
``epfllibrary/infoscience-imports`` (DOI/title+year key dedup, source-priority
cluster-merge, version-link connected components — see
``/root/reference/data_pipeline/deduplicator.py:55-144`` and
``harvester.py:710-757``) to Common-Crawl-style web pages stored in
``(url, warc_ts, html, text, lang)`` tables.

Architecture is idiomatic PySpark: DataFrame/SQL plans optimized by Catalyst,
vectorized Arrow UDF kernels for MinHash/SimHash, checkpointed stages with
per-partition lineage, and iterative self-join connected components with
salted keys for skew.
"""

__version__ = "0.1.0"
