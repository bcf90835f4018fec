"""flechasdb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of codemonger-io/flechasdb (IVF+PQ vector
database), re-expressed Spark-first, plus large-scale LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing).

Architecture (see SURVEY.md for the full blueprint):

- ``functions/``  — vector + text kernels as Catalyst SQL expressions
  (JVM-side, codegen'd; reference: ``src/linalg.rs``).
- ``operators/``  — index build (sample-trained IVF+PQ, fused encode),
  kNN query paths, index maintenance (upsert/delete), dedup family
  (incl. connected components), similarity search, text analysis,
  multimodal plumbing, attribute-log replay.
- ``sources/``    — index dataset layout: Parquet datasets + JSON manifest
  with load-time invariant validation (reference: ``src/db/stored.rs``).
- ``plans/``      — two-phase IVF query planning (driver-side nprobe
  selection -> partition-pruned scan) and plan inspection helpers.
- ``streaming/``  — Structured Streaming ingest: incremental PQ encode and
  stream-static kNN join (extension; no reference counterpart).
"""

__version__ = "0.1.0"
