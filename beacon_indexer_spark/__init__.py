"""beacon_indexer_spark — a PySpark-native analytics/ELT engine.

A from-scratch re-expression of the capabilities of the
gnosischain/beacon-indexer reference (an asyncio ELT pipeline that loads
beacon-chain JSON into raw tables and transforms it into ~24 structured
analytic tables), built Spark-first:

- raw/structured tables are Parquet-backed DataFrames with declared schemas
  (``beacon_indexer_spark.schemas``)
- the parser chain (reference ``src/parsers/*``) is pure column expressions:
  one ``from_json`` + per-table ``select``/``posexplode`` projections
  (``beacon_indexer_spark.plans.transform``)
- ReplacingMergeTree latest-wins semantics become the ``latest()`` helper
  (``beacon_indexer_spark.functions``)
- the chunk-ledger control plane becomes manifest DataFrames + anti-joins
  (``beacon_indexer_spark.control``)
- beyond the reference: large-scale training-data operators (dedup,
  similarity search, text analysis, multimodal plumbing) in
  ``beacon_indexer_spark.operators``.
"""

__version__ = "0.1.0"
