"""YAML document I/O (SURVEY §2.1 S4/S6 file-level parity).

The reference stores one YAML document per issue at
``projects/{proj}/issues/{KEY}.yaml`` (pkg/schema/yaml.go:32-84,118-122)
and reads them back with ``FromYAML`` (yaml.go:157-176). The engine's
native storage is columnar (sinks.py), but the YAML edge remains useful for
interop — implemented distributed:

* write: ``foreachPartition`` — executors write their partition's files
  (same layout as the reference); driver never sees row data.
* read: ``binaryFile`` source → ``mapInPandas`` PyYAML parse — file
  listing and parsing both scale out; one Arrow batch of documents per
  task, not one Python call per file.

One-file-per-record is inherently the small-corpus regime (the reference
caps around 33k issues); at 100 TB you keep parquet and emit YAML only at
the serving edge.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_FLAT_FIELDS = [
    "key",
    "project_key",
    "summary",
    "description",
    "priority",
    "issuetype",
    "epic_link",
    "parent_issue",
]

READ_SCHEMA = (
    "key string, project_key string, summary string, description string,"
    "priority string, issuetype string, epic_link string, parent_issue string,"
    "status_name string, assignee_name string, path string"
)


def issue_yaml_path(base: str, project_key: str, key: str) -> str:
    return os.path.join(base, "projects", project_key, "issues", f"{key}.yaml")


def write_yaml_issues(issues: DataFrame, base: str) -> None:
    """S6 file-level twin: one YAML per issue in the reference's directory
    layout. Executor-side writes; atomic per file (tmp+rename, mirroring
    pkg/schema/yaml.go:74-80)."""
    cols = issues.select(
        *_FLAT_FIELDS,
        F.col("status.name").alias("status_name"),
        F.col("assignee.name").alias("assignee_name"),
    )

    def _write(rows) -> None:
        import yaml

        for r in rows:
            d = {k: r[k] for k in _FLAT_FIELDS}
            d["status"] = {"name": r["status_name"]}
            d["assignee"] = (
                {"name": r["assignee_name"]} if r["assignee_name"] else None
            )
            path = issue_yaml_path(base, r["project_key"], r["key"])
            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = path + ".tmp"
            with open(tmp, "w") as f:
                yaml.safe_dump(d, f, sort_keys=True)
            os.replace(tmp, path)

    cols.foreachPartition(_write)


def read_yaml_issues(spark: SparkSession, base: str) -> DataFrame:
    """S4 — FromYAML, distributed: binaryFile listing + Arrow-batched
    PyYAML parse. Corrupt documents are QUARANTINED as null-keyed rows
    (the reference errors per file, yaml.go:164-170)."""
    files = spark.read.format("binaryFile").load(
        os.path.join(base, "projects", "*", "issues", "*.yaml")
    )

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import yaml

        for pdf in batches:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    d = yaml.safe_load(bytes(content).decode("utf-8")) or {}
                except yaml.YAMLError:
                    d = {}
                status = d.get("status") or {}
                assignee = d.get("assignee") or {}
                out.append(
                    {
                        **{k: d.get(k) for k in _FLAT_FIELDS},
                        "status_name": status.get("name"),
                        "assignee_name": assignee.get("name"),
                        "path": path,
                    }
                )
            yield pd.DataFrame(out)

    return files.select("path", "content").mapInPandas(_parse, READ_SCHEMA)
