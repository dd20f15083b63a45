"""Deterministic JIRA-shaped fixtures derived from the driver's `orders`
table (FIXTURES.md; reference fixture semantics: pkg/client/mock.go:281-341).

The derivation is ONE SQL template written in a dialect subset that runs
verbatim on both Spark and DuckDB (verified: `||`, CASE, CAST AS STRING,
floor-division, `INTERVAL 1 DAY * n`, md5; only sha256 spelling differs) —
so every operator over these fixtures stays oracle-checkable: the Spark side
consumes the nested DataFrame built here, the DuckDB oracle embeds
``duckdb_cte()`` and computes the same flat values.

Derivation rules (k = o_orderkey, dense 0..N-1):
  block = k div 20 — 20 issues per epic-block; the block's slot-0 row is
      the Epic (mirrors the reference's epic-sized corpora,
      performance_benchmark_test.go:27).
  project — 5 names + the multi-dash 'MY-PROJECT' edge case for
      block%97==13 (exercises the F1 extraction divergence,
      pkg/schema/yaml.go:126-134 vs pkg/links/links.go:335-341).
  epic_link — 80%% of non-epics point at their block's epic (mock.go:310).
  parent/subtasks — Sub-task slots 15,16 ↔ parent Bug slots 13,14, with
      deliberate dangling keys (broken-link case, jira_analyzer.go:339-354).
  issue_links — ≤1 typed link per issue by k%%4, with a dangling
      'Documents' target every 100th issue.
  sync_state — strict subset of issues (k%%3<>2; new-issue case) plus
      GONE-* keys absent from issues (missing-file case), mixed
      last_synced watermarks (C1 both ways), ~3%% checksum drift.
  files — state paths minus every 41st (missing, J4) plus ORPHAN-* paths
      (J3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jira_cdc_git_spark.sources.registry import load_table

PROJECTS = ["PROJ", "BENCH", "MEM", "CONC", "RHOAIENG"]


def _block(j: str) -> str:
    return f"CAST(floor(({j}) / 20.0) AS BIGINT)"


def _pk(j: str) -> str:
    cases = " ".join(
        f"WHEN {i} THEN '{p}'" for i, p in enumerate(PROJECTS[:-1])
    )
    return (
        f"(CASE WHEN {_block(j)} % 97 = 13 THEN 'MY-PROJECT' "
        f"ELSE CASE {_block(j)} % 5 {cases} ELSE '{PROJECTS[-1]}' END END)"
    )


def _key(j: str) -> str:
    return f"({_pk(j)} || '-' || CAST({j} AS STRING))"


def _sha(expr: str, dialect: str) -> str:
    return f"sha2({expr}, 256)" if dialect == "spark" else f"sha256({expr})"


_CONTENT = "(key || '|' || summary || '|' || status_name)"


def flat_issues_sql(orders: str) -> str:
    """Flat issue columns (+ helper cols k/slot/link parts) from `orders`."""
    k = "o_orderkey"
    return f"""
        SELECT
          {k} AS k,
          {_block(k)} AS block,
          {k} % 20 AS slot,
          {_key(k)} AS key,
          {_pk(k)} AS project_key,
          CASE WHEN {k} % 20 = 0 THEN 'Epic'
               WHEN {k} % 20 <= 8 THEN 'Story'
               WHEN {k} % 20 <= 12 THEN 'Task'
               WHEN {k} % 20 <= 14 THEN 'Bug'
               WHEN {k} % 20 <= 16 THEN 'Sub-task'
               WHEN {k} % 20 = 17 THEN 'Improvement'
               WHEN {k} % 20 = 18 THEN 'Documentation'
               ELSE 'Test' END AS issuetype,
          CASE WHEN o_orderstatus = 'F' THEN 'Done'
               WHEN o_orderstatus = 'P' THEN 'Closed'
               ELSE CASE {k} % 3 WHEN 0 THEN 'To Do'
                                 WHEN 1 THEN 'In Progress'
                                 ELSE 'In Review' END END AS status_name,
          CASE WHEN o_orderstatus = 'F' OR o_orderstatus = 'P' THEN 'done'
               WHEN o_orderstatus = 'O' AND {k} % 3 = 0 THEN 'new'
               ELSE 'indeterminate' END AS status_category,
          CASE o_orderpriority WHEN '1-URGENT' THEN 'Blocker'
                               WHEN '2-HIGH' THEN 'Critical'
                               WHEN '3-MEDIUM' THEN 'High'
                               WHEN '4-NOT SPECIFIED' THEN 'Medium'
                               ELSE 'Low' END AS priority,
          (CASE WHEN {k} % 20 = 0 THEN 'Epic: ' ELSE '' END
             || 'Issue ' || {_key(k)}) AS summary,
          CASE WHEN {k} % 7 = 0 THEN ''
               ELSE 'Description for ' || {_key(k)} END AS description,
          CASE WHEN {k} % 9 = 0 THEN NULL
               ELSE 'user' || CAST(o_custkey % 50 AS STRING) END AS assignee_name,
          CASE WHEN {k} % 9 = 0 THEN NULL
               ELSE 'user' || CAST(o_custkey % 50 AS STRING) || '@example.com'
               END AS assignee_email,
          'user' || CAST((o_custkey + 7) % 50 AS STRING) AS reporter_name,
          'user' || CAST((o_custkey + 7) % 50 AS STRING) || '@example.com'
            AS reporter_email,
          o_orderdate AS created,
          o_orderdate + INTERVAL 1 DAY * ({k} % 30)
                      + INTERVAL 1 HOUR * ({k} % 24) AS updated,
          CASE WHEN {k} % 20 <> 0 AND {k} % 5 <> 4
               THEN {_pk(k)} || '-' || CAST({_block(k)} * 20 AS STRING)
               END AS epic_link,
          CASE WHEN {k} % 20 = 15 OR {k} % 20 = 16
               THEN CASE WHEN {k} % 100 = 15 THEN {_pk(k)} || '-99999'
                         ELSE {_pk(k)} || '-' || CAST({k} - 2 AS STRING) END
               END AS parent_issue,
          CASE WHEN {k} % 20 = 13 OR {k} % 20 = 14
               THEN {_pk(k)} || '-' || CAST({k} + 2 AS STRING)
               END AS subtask_key,
          CASE WHEN {k} % 100 = 33 THEN 'PROJ-99998' END AS subtask_extra,
          CASE WHEN {k} % 4 = 0 THEN 'Blocks'
               WHEN {k} % 4 = 1 THEN 'Clones'
               WHEN {k} % 100 = 2 THEN 'Documents' END AS link_type,
          CASE WHEN {k} % 4 = 0 THEN 'outward'
               WHEN {k} % 4 = 1 THEN 'inward'
               WHEN {k} % 100 = 2 THEN 'outward' END AS link_direction,
          CASE WHEN {k} % 4 = 0 THEN {_key(f"{k} + 4")}
               WHEN {k} % 4 = 1 THEN {_key(f"{k} - 1")}
               WHEN {k} % 100 = 2 THEN 'PROJ-99997' END AS link_dst,
          CASE WHEN {k} % 4 = 0 THEN 'Issue ' || {_key(f"{k} + 4")}
               WHEN {k} % 4 = 1 THEN 'Issue ' || {_key(f"{k} - 1")}
               WHEN {k} % 100 = 2 THEN 'Ghost' END AS link_dst_summary,
          'team' || CAST({k} % 8 AS STRING) AS team
        FROM {orders}
    """


def sync_state_sql(orders: str, dialect: str) -> str:
    """sync_state rows (subset of issues + GONE keys) — shared dialect."""
    sha = _sha(_CONTENT, dialect)
    return f"""
        SELECT key, project_key,
               CASE WHEN k % 4 = 0 THEN updated + INTERVAL 1 HOUR
                    ELSE updated - INTERVAL 1 DAY END AS last_synced,
               updated AS last_updated,
               CAST(k % 5 + 1 AS INT) AS version,
               'projects/' || project_key || '/issues/' || key || '.yaml'
                 AS file_path,
               CAST(100 + k % 900 AS BIGINT) AS file_size,
               CASE WHEN k % 37 = 0 THEN 'deadbeef' ELSE {sha} END AS checksum,
               CASE WHEN k % 13 = 0 THEN 'failed' ELSE 'success' END
                 AS sync_status,
               CASE WHEN k % 13 = 0 THEN 'sync failed: timeout' END
                 AS error_message,
               CAST(k % 7 + 1 AS INT) AS sync_count
        FROM ({flat_issues_sql(orders)}) fi
        WHERE k % 3 <> 2
        UNION ALL
        SELECT 'GONE-' || CAST(o_orderkey AS STRING), 'PROJ',
               o_orderdate, o_orderdate, 1,
               'projects/PROJ/issues/GONE-' || CAST(o_orderkey AS STRING)
                 || '.yaml',
               CAST(50 AS BIGINT),
               {_sha("'gone' || CAST(o_orderkey AS STRING)", dialect)},
               'success', NULL, 1
        FROM {orders}
        WHERE o_orderkey % 500 = 1
    """


def changelog_sql(orders: str) -> str:
    """Issue changelog (the JIRA `changelog.histories` surface backing JQL
    WAS / CHANGED — Atlassian JQL history operators). One row per field
    transition: (key, field, from_value, to_value, changed_at, author).

    Unlike a real JIRA changelog, a CREATION row (from_value NULL,
    to_value = initial value, changed_at = created) is materialized per
    (key, field) so the value-interval timeline is self-contained: the
    value held during [changed_at, next changed_at) is to_value, no join
    back to issues needed. WAS scans all rows; CHANGED excludes creation
    rows (from_value IS NULL is not a transition).

    Derivation (deterministic, dialect-shared like every fixture here):
      status: every issue is created 'Open'; k%2=0 issues jump straight
        to their current status at created + (k%12+1) hours; odd-k issues
        pass through an intermediate ('In Progress', or 'In Review' when
        the current status IS 'In Progress') before landing on the
        current status (k%5+1) days later. Authors: reporter for the
        first hop, assignee (or 'user0') for the second.
      assignee: k%6=3 issues (with a non-null assignee) were reassigned
        from 'user<(k+13)%50>' one-to-three days after creation.
    """
    fi = f"({flat_issues_sql(orders)}) fi"
    t1 = "created + INTERVAL 1 HOUR * (k % 12 + 1)"
    t2 = f"{t1} + INTERVAL 1 DAY * (k % 5 + 1)"
    mid = ("CASE WHEN status_name = 'In Progress' THEN 'In Review' "
           "ELSE 'In Progress' END")
    return f"""
        SELECT key, 'status' AS field, CAST(NULL AS STRING) AS from_value,
               'Open' AS to_value, created AS changed_at,
               reporter_name AS author
        FROM {fi}
        UNION ALL
        SELECT key, 'status', 'Open', status_name, {t1}, reporter_name
        FROM {fi} WHERE k % 2 = 0
        UNION ALL
        SELECT key, 'status', 'Open', {mid}, {t1}, reporter_name
        FROM {fi} WHERE k % 2 = 1
        UNION ALL
        SELECT key, 'status', {mid}, status_name, {t2},
               CASE WHEN assignee_name IS NULL THEN 'user0'
                    ELSE assignee_name END
        FROM {fi} WHERE k % 2 = 1
        UNION ALL
        SELECT key, 'assignee', CAST(NULL AS STRING),
               'user' || CAST((k + 13) % 50 AS STRING),
               created, reporter_name
        FROM {fi} WHERE k % 6 = 3 AND assignee_name IS NOT NULL
        UNION ALL
        SELECT key, 'assignee',
               'user' || CAST((k + 13) % 50 AS STRING),
               assignee_name, created + INTERVAL 1 DAY * (k % 3 + 1),
               reporter_name
        FROM {fi} WHERE k % 6 = 3 AND assignee_name IS NOT NULL
    """


def files_sql(orders: str, dialect: str) -> str:
    """Simulated directory listing: state paths minus missing plus orphans."""
    sha = _sha(_CONTENT, dialect)
    return f"""
        SELECT 'projects/' || project_key || '/issues/' || key || '.yaml'
                 AS path,
               CAST(100 + k % 900 AS BIGINT) AS size,
               {sha} AS sha256
        FROM ({flat_issues_sql(orders)}) fi
        WHERE k % 3 <> 2 AND k % 41 <> 0
        UNION ALL
        SELECT 'projects/PROJ/issues/ORPHAN-' || CAST(o_orderkey AS STRING)
                 || '.yaml',
               CAST(10 AS BIGINT),
               {_sha("'orphan' || CAST(o_orderkey AS STRING)", dialect)}
        FROM {orders}
        WHERE o_orderkey % 61 = 0
    """


# ---------------------------------------------------------------------------
# Spark-side loaders
# ---------------------------------------------------------------------------

# Derived-fixture cache: every JIRA-family query re-derives its issue
# frames from `orders` (the driver hands us TPC-H tables, not an issues
# table); a real deployment would read the materialized issues table once.
# Caching the materialized derivation per (session, table, sf_dir) gives
# every consumer after the first the read-a-table cost instead of the
# derive-from-orders cost — same values (materialize() cuts the plan after
# the deterministic derivation), so oracle parity is unaffected.
_FRAME_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def _cached_frame(spark: SparkSession, name: str, sf_dir: str, build) -> DataFrame:
    from jira_cdc_git_spark.materialize import materialize

    # Keyed by applicationId (stable per SparkSession, never recycled the way
    # id() can be after GC) so a new session never sees frames bound to a
    # stopped one; stale sessions' entries are evicted on sight.
    app_id = spark.sparkContext.applicationId
    for k in [k for k in _FRAME_CACHE if k[0] != app_id]:
        del _FRAME_CACHE[k]
    key = (app_id, name, sf_dir)
    df = _FRAME_CACHE.get(key)
    if df is None:
        df = materialize(build())
        _FRAME_CACHE[key] = df
    return df


def issues_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    def _build() -> DataFrame:
        orders = load_table(spark, "orders", sf_dir)
        return spark.sql(flat_issues_sql("{orders}"), orders=orders)

    return _cached_frame(spark, "issues_flat", sf_dir, _build)


def issues(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The nested `issues` table (schemas.ISSUES shape): structs for
    status/assignee/reporter, subtask + link arrays, custom_fields map —
    the P1-P4 projection/explode surface operates on THIS frame."""
    flat = issues_flat(spark, sf_dir)
    link = F.when(
        F.col("link_type").isNotNull(),
        F.array(
            F.struct(
                F.col("link_type").alias("type"),
                F.col("link_direction").alias("direction"),
                F.col("link_dst").alias("issue_key"),
                F.col("link_dst_summary").alias("summary"),
            )
        ),
    ).otherwise(F.array().cast("array<struct<type:string,direction:string,issue_key:string,summary:string>>"))
    subtasks = F.filter(
        F.array("subtask_key", "subtask_extra"), lambda x: x.isNotNull()
    )
    custom = F.map_filter(
        F.map_from_arrays(
            F.array(F.lit("customfield_12311140"), F.lit("team")),
            F.array(F.col("epic_link"), F.col("team")),
        ),
        lambda _, v: v.isNotNull(),
    )
    return flat.select(
        "key",
        "project_key",
        "summary",
        "description",
        F.struct(
            F.col("status_name").alias("name"),
            F.col("status_category").alias("category"),
        ).alias("status"),
        F.when(
            F.col("assignee_name").isNotNull(),
            F.struct(
                F.col("assignee_name").alias("name"),
                F.col("assignee_email").alias("email"),
            ),
        ).alias("assignee"),
        F.struct(
            F.col("reporter_name").alias("name"),
            F.col("reporter_email").alias("email"),
        ).alias("reporter"),
        "created",
        "updated",
        "priority",
        "issuetype",
        "epic_link",
        "parent_issue",
        subtasks.alias("subtasks"),
        link.alias("issue_links"),
        custom.alias("custom_fields"),
    )


def sync_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    def _build() -> DataFrame:
        orders = load_table(spark, "orders", sf_dir)
        return spark.sql(sync_state_sql("{orders}", "spark"), orders=orders)

    return _cached_frame(spark, "sync_state", sf_dir, _build)


def files(spark: SparkSession, sf_dir: str) -> DataFrame:
    def _build() -> DataFrame:
        orders = load_table(spark, "orders", sf_dir)
        return spark.sql(files_sql("{orders}", "spark"), orders=orders)

    return _cached_frame(spark, "files", sf_dir, _build)


def changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    def _build() -> DataFrame:
        orders = load_table(spark, "orders", sf_dir)
        return spark.sql(changelog_sql("{orders}"), orders=orders)

    return _cached_frame(spark, "changelog", sf_dir, _build)


# ---------------------------------------------------------------------------
# DuckDB-side CTE fragments for oracle SQL (driver pre-registers `orders`)
# ---------------------------------------------------------------------------

def duckdb_issues_cte() -> str:
    return f"issues_flat AS ({flat_issues_sql('orders')})"


def duckdb_sync_state_cte() -> str:
    return f"sync_state AS ({sync_state_sql('orders', 'duckdb')})"


def duckdb_files_cte() -> str:
    return f"files AS ({files_sql('orders', 'duckdb')})"


def duckdb_changelog_cte() -> str:
    return f"changelog AS ({changelog_sql('orders')})"
