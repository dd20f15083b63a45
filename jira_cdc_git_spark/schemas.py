"""JIRA-shaped schema definitions (SURVEY §1.3, FIXTURES.md).

Re-expresses the reference's Go structs (pkg/client/client.go:31-84,
pkg/state/types.go:8-100, pkg/profile/types.go:8-53) as Spark StructTypes:
fixed typed core + a MAP column for the untyped custom-field escape hatch
(pkg/client/client.go:340-349), real TimestampType instead of the
reference's ISO strings (client.go:293-300).
"""

from __future__ import annotations

from pyspark.sql import types as T

USER = T.StructType(
    [
        T.StructField("name", T.StringType(), True),
        T.StructField("email", T.StringType(), True),
    ]
)

STATUS = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("category", T.StringType(), False),
    ]
)

ISSUE_LINK = T.StructType(
    [
        T.StructField("type", T.StringType(), False),
        T.StructField("direction", T.StringType(), False),
        T.StructField("issue_key", T.StringType(), False),
        T.StructField("summary", T.StringType(), True),
    ]
)

ISSUES = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("project_key", T.StringType(), False),
        T.StructField("summary", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("status", STATUS, False),
        T.StructField("assignee", USER, True),
        T.StructField("reporter", USER, True),
        T.StructField("created", T.TimestampType(), False),
        T.StructField("updated", T.TimestampType(), False),
        T.StructField("priority", T.StringType(), True),
        T.StructField("issuetype", T.StringType(), False),
        T.StructField("epic_link", T.StringType(), True),
        T.StructField("parent_issue", T.StringType(), True),
        T.StructField("subtasks", T.ArrayType(T.StringType()), True),
        T.StructField("issue_links", T.ArrayType(ISSUE_LINK), True),
        T.StructField("custom_fields", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

ISSUE_LINKS_EDGES = T.StructType(
    [
        T.StructField("src_key", T.StringType(), False),
        T.StructField("project_key", T.StringType(), False),
        T.StructField("link_type", T.StringType(), False),
        T.StructField("direction", T.StringType(), False),
        T.StructField("dst_key", T.StringType(), False),
        T.StructField("dst_summary", T.StringType(), True),
    ]
)

SYNC_STATE = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("project_key", T.StringType(), False),
        T.StructField("last_synced", T.TimestampType(), False),
        T.StructField("last_updated", T.TimestampType(), True),
        T.StructField("version", T.IntegerType(), True),
        T.StructField("file_path", T.StringType(), False),
        T.StructField("file_size", T.LongType(), True),
        T.StructField("checksum", T.StringType(), True),
        T.StructField("sync_status", T.StringType(), False),
        T.StructField("error_message", T.StringType(), True),
        T.StructField("sync_count", T.IntegerType(), False),
    ]
)

SYNC_HISTORY = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("type", T.StringType(), False),
        T.StructField("query", T.StringType(), True),
        T.StructField("start_time", T.TimestampType(), False),
        T.StructField("end_time", T.TimestampType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("status", T.StringType(), False),
        T.StructField("total_issues", T.IntegerType(), True),
        T.StructField("processed_issues", T.IntegerType(), True),
        T.StructField("successful_sync", T.IntegerType(), True),
        T.StructField("failed_sync", T.IntegerType(), True),
        T.StructField("skipped_issues", T.IntegerType(), True),
        T.StructField("error_count", T.IntegerType(), True),
    ]
)

FILES = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("size", T.LongType(), True),
        T.StructField("sha256", T.StringType(), True),
    ]
)

PROFILES = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("description", T.StringType(), True),
        T.StructField("jql", T.StringType(), True),
        T.StructField("epic_key", T.StringType(), True),
        T.StructField("issue_keys", T.ArrayType(T.StringType()), True),
        T.StructField("repository", T.StringType(), True),
        T.StructField("concurrency", T.IntegerType(), True),
        T.StructField("rate_limit", T.StringType(), True),
        T.StructField("incremental", T.BooleanType(), True),
        T.StructField("force", T.BooleanType(), True),
        T.StructField("dry_run", T.BooleanType(), True),
        T.StructField("include_links", T.BooleanType(), True),
        T.StructField("tags", T.ArrayType(T.StringType()), True),
        T.StructField("times_used", T.IntegerType(), True),
        T.StructField("last_used", T.TimestampType(), True),
        T.StructField("avg_sync_time_ms", T.LongType(), True),
        T.StructField("success_rate", T.DoubleType(), True),
    ]
)
