"""jira_cdc_git_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference system (chambridge/jira-cdc-git),
re-expressed Spark-first.

The reference is a Go JIRA->Git CDC/ETL pipeline; this package re-expresses
what it computes — its data model, JQL query semantics, incremental-sync/CDC
semantics, relationship/graph materialization, and aggregations — as idiomatic
Spark DataFrame / SQL / Structured Streaming, plus the LLM-data-pipeline
extension operators (dedup, similarity search, text analysis, multimodal
columns) designed for 100 TB scale.

Layout:
  session     SparkSession factory tuned for local[N] and cluster use
  schemas     StructTypes for the JIRA-shaped data model (SURVEY §1.3)
  fixtures    deterministic FIXTURES.md-shaped tables, dialect-shared SQL
  sources     parquet/testdata registry (incl. nanos-timestamp handling)
  functions   scalar function library (SURVEY §2.7 F1-F14)
  jql         JQL-subset parser + compiler to DataFrame plans (§2.2, §4.2)
  operators   relational/graph/jira/text/vectors/timeseries/multimodal
  state       sync_state CDC store: versioned MERGE, history, reconcile
  sinks       partitioned issues / edge table / commit-log writers (§2.1)
  streaming   foreachBatch incremental sync + windowed streaming (§2.8)
  plans       profiles, usage stats, job specs (§3)
"""

__version__ = "0.1.0"
