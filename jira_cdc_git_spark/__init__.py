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
  fixtures    deterministic generator of FIXTURES.md-shaped tables
  sources     parquet/testdata registry + YAML-document edge ingest
  functions   scalar function library (SURVEY §2.7) — all Column-returning
  jql         JQL-subset parser + Catalyst compiler (SURVEY §2.2)
  operators   relational + graph + extension operators (SURVEY §2.3–2.6)
  streaming   incremental CDC core + Structured Streaming pipeline (§2.8)
  plans       profiles / saved queries / job specs (§3)
"""

__version__ = "0.1.0"
