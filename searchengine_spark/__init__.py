"""searchengine_spark — a PySpark-native inverted-index + BM25 query engine
with the capabilities of charlene0122/SearchEngine, rebuilt Spark-first.

Modules:
  session     SparkSession defaults (Arrow, AQE, shuffle partitions)
  corpus      deterministic synthetic web corpus (FIXTURES.md)
  textprep    byte-identical extraction/tokenization (Arrow-vectorized)
  porter      Porter stemmer matching the reference Java class
  ids         deterministic doc ids + reference Hasher replica
  compress    delta+varbyte posting blobs with block-max metadata
  indexer     resumable staged index build (tokens/docstats/postings/title)
  query       distributed exhaustive top-k scoring + blend
  wand        block-max WAND pruned top-k, lazy block decode, doc-range
              parallel serving (bounded per-task memory)
  merge       incremental segment compaction (streamed deltas -> postings)
  pagerank    iterative DataFrame PageRank over the extracted link graph
  checkpoint  per-partition lineage/metrics + resume
  catalog     storage layout, index metadata, all filesystem access
  formats     JSONL/CSV connectors (explicit schemas, exact timestamps)
  oracle      single-process golden implementation
  serving     title/snippet/pagination (Mainpage parity)
  streaming   incremental ingest, watermarked windows, stateful sessions
  pipelines   training-data ops: dedup, similarity, text stats, multimodal
"""

__version__ = "0.2.0"
