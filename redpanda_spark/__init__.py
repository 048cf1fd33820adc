"""redpanda_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Redpanda (Kafka-compatible streaming platform).

The reference (`/root/reference`, redpanda-data/redpanda) is a C++/Seastar
distributed log. This package re-expresses its computational surface —
the ~45 Kafka RPCs, log-storage operators (offset-range fetch, timequery,
retention, key compaction), consumer-group coordination, idempotence /
transactional visibility, per-record transforms, and the datalake sink —
as idiomatic Spark DataFrame / SQL / Structured Streaming plans, designed
for 100 TB scale (partition-parallel, shuffle-minimal, no driver data path).

Layout:
  datamodel    — canonical record/topic schemas (SURVEY.md §1.4)
  session      — tuned SparkSession builder
  sources      — table loaders + topic-view builders over parquet/testdata
  operators    — log ops: fetch, list_offsets, compaction, retention, groups, tx
  functions    — scalar kernels: murmur2 partitioner, text stats, vector math
  dedup        — exact / minhash-LSH / simhash / ngram-jaccard / embedding dedup
  similarity   — ANN over embedding columns (brute-force + LSH-bucketed)
  streaming    — readStream/writeStream topic views, per-record transforms
  registry     — schema registry (subjects/versions/compatibility)
"""

__version__ = "0.1.0"
