"""crypto_exchange_etl_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch re-imagining of the capabilities of
``globophobe/crypto-exchange-etl`` (incremental tick/change ingest →
validated, deduplicated, partitioned lake tables → chained derived
aggregations, idempotent and resumable) as an idiomatic Spark engine:

- DataFrame/SQL logical plans, Catalyst-optimized (no per-row Python).
- Simulated binlog/WAL of insert/update/delete events over
  Common-Crawl-style web pages (``url, warc_ts, html, text, lang``).
- Last-writer-wins key compaction via two-phase ``max_by`` aggregation
  (map-side partial agg ≙ built-in skew resistance).
- MERGE upserts into a snapshot-versioned, bucket-partitioned parquet
  lake table ("LakeTable": Iceberg-style manifests, atomic commits,
  idempotent batch re-apply) with an additive schema-evolution resolver.
- Structured Streaming wrapper with checkpoint + per-partition
  high-watermark ledger committed atomically with the data snapshot.
- Derived aggregations with capability parity to the reference
  (run compaction, candles, threshold/renko bars, top-N-in-bar).
- Web-scale training-data operators: exact/MinHash-LSH/SimHash/Jaccard/
  embedding dedup, ANN similarity search, text quality analysis,
  multimodal binary-column plumbing.

Reference studied at /root/reference (see SURVEY.md); this is not a port.
"""

__version__ = "0.1.0"
