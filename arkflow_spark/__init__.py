"""arkflow_spark — a PySpark-native analytics/stream-processing engine.

Re-expresses the capability surface of arkflow-rs/arkflow (a YAML-configured
Arrow/DataFusion micro-batch stream engine) on top of Apache Spark:

- data plane  : Input -> [Buffer/Window] -> Pipeline(processors...) -> Output
  becomes     : readStream/read -> transforms -> foreachBatch/write
- per-batch SQL (DataFusion session on table ``flow``) becomes temp-view +
  ``spark.sql`` with Catalyst doing what DataFusion did
  (reference: crates/arkflow-plugin/src/processor/sql.rs)
- Arrow RecordBatch "MessageBatch" becomes a DataFrame; the ``__value__`` /
  ``__meta_*`` column conventions are kept verbatim
  (reference: crates/arkflow-core/src/lib.rs:52-69)

Beyond reference parity, the package adds large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing)
designed for 100 TB scale: broadcast-able dims, map-side combines, no
driver-side collects in any hot path.
"""

__version__ = "0.1.0"

from arkflow_spark.session import get_spark  # noqa: F401
