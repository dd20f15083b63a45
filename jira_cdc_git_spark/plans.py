"""Profiles, saved queries and job specs (SURVEY §2.4 A7-A9, §2.5 W8, §3;
reference: pkg/profile, pkg/jobs).

The reference persists named sync configurations with usage statistics in a
YAML collection (pkg/profile/types.go:8-53) and turns API requests into
Kubernetes Jobs (pkg/jobs/scheduler.go:49-88). Spark-first: profiles are a
small DataFrame-backed table; a "job" is just a compiled query run whose
status lands in a jobs table — no Kubernetes dependency (SURVEY §3.3
restatement).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jira_cdc_git_spark import schemas
from jira_cdc_git_spark.jql import TEMPLATES, build_from_template

# the 7 builtin profile templates (pkg/profile/templates.go:10-) — each pairs
# a JQL template with default run options
PROFILE_TEMPLATES: list[dict] = [
    {"name": "epic-sync", "jql_template": "epic-all-issues", "concurrency": 5, "tags": ["epic"]},
    {"name": "epic-stories", "jql_template": "epic-stories-only", "concurrency": 5, "tags": ["epic"]},
    {"name": "project-full", "jql_template": "project-all-issues", "concurrency": 8, "tags": ["project"]},
    {"name": "project-active", "jql_template": "project-active-issues", "concurrency": 5, "tags": ["project"]},
    {"name": "recent-changes", "jql_template": "recent-updates", "concurrency": 3, "tags": ["incremental"]},
    {"name": "my-sprint", "jql_template": "my-current-sprint", "concurrency": 2, "tags": ["personal"]},
    {"name": "single-issues", "jql_template": None, "concurrency": 1, "tags": ["adhoc"]},
]


def builtin_profiles(spark: SparkSession) -> DataFrame:
    rows = []
    for p in PROFILE_TEMPLATES:
        jql = None
        if p["jql_template"] and not TEMPLATES[p["jql_template"]]["required"]:
            jql = build_from_template(p["jql_template"])
        rows.append(
            (
                p["name"],
                f"builtin profile for {p['jql_template'] or 'issue lists'}",
                jql,
                None,
                None,
                "repo",
                p["concurrency"],
                "500ms",
                True,
                False,
                False,
                True,
                p["tags"],
                0,
                None,
                None,
                None,
            )
        )
    return spark.createDataFrame(rows, schemas.PROFILES)


def record_usage(
    profiles: DataFrame, name: str, sync_ms: int, success: bool, at: datetime
) -> DataFrame:
    """A8 — per-profile usage statistics update (pkg/profile/manager.go:
    423-463): times_used++, rolling average sync time, success rate as a
    running mean. Pure column expressions; persist via overwrite of the
    (tiny) profiles table."""
    hit = F.col("name") == name
    n = F.coalesce(F.col("times_used"), F.lit(0))
    avg = F.coalesce(F.col("avg_sync_time_ms"), F.lit(0).cast("long"))
    rate = F.coalesce(F.col("success_rate"), F.lit(0.0))
    return profiles.select(
        *[c for c in profiles.columns if c not in (
            "times_used", "last_used", "avg_sync_time_ms", "success_rate")],
        F.when(hit, n + 1).otherwise(n).cast("int").alias("times_used"),
        F.when(hit, F.lit(at)).otherwise(F.col("last_used")).alias("last_used"),
        F.when(hit, ((avg * n + sync_ms) / (n + 1)).cast("long"))
        .otherwise(avg)
        .alias("avg_sync_time_ms"),
        F.when(hit, (rate * n + (1.0 if success else 0.0)) / (n + 1))
        .otherwise(rate)
        .alias("success_rate"),
    )


def most_used(profiles: DataFrame, k: int = 5) -> DataFrame:
    """A9/W7 — GetMostUsedProfiles (manager.go:475-497)."""
    return profiles.orderBy(
        F.col("times_used").desc(), F.col("name")
    ).limit(k)


def sort_profiles(profiles: DataFrame, by: str = "name", desc: bool = False) -> DataFrame:
    """W8 — dynamic multi-key profile sort (manager.go:663-697)."""
    col = F.col(by)
    return profiles.orderBy(col.desc() if desc else col.asc(), F.col("name"))


def search_profiles(
    profiles: DataFrame,
    query: str | None = None,
    tags: list[str] | None = None,
    repository: str | None = None,
    include_jql: bool = False,
) -> DataFrame:
    """SearchProfiles / profileMatches (manager.go:499-516,699-758) as
    one filter expression: a free-text `query` substring-matches name /
    description / tags (and jql when include_jql) case-insensitively —
    and when given, SHORT-CIRCUITS the other criteria, exactly like the
    reference's early `return` on query; otherwise tag overlap and
    exact repository both must hold. Deterministic name order."""
    if query:
        q = query.lower()
        hit = (
            F.contains(F.lower("name"), F.lit(q))
            | F.contains(F.lower(F.coalesce("description", F.lit(""))), F.lit(q))
            | F.exists(
                F.coalesce("tags", F.array()),
                lambda t: F.contains(F.lower(t), F.lit(q)),
            )
        )
        if include_jql:
            hit = hit | F.contains(
                F.lower(F.coalesce("jql", F.lit(""))), F.lit(q)
            )
        cond = hit
    else:
        cond = F.lit(True)
        if tags:
            cond = cond & (
                F.size(
                    F.array_intersect(
                        F.coalesce("tags", F.array()),
                        F.array(*[F.lit(t) for t in tags]),
                    )
                )
                > 0
            )
        if repository:
            cond = cond & (F.col("repository") == repository)
    return profiles.filter(cond).orderBy("name")


def similar_profiles(
    profiles: DataFrame,
    name: str,
    limit: int = 5,
    threshold: float = 0.5,
) -> DataFrame:
    """GetSimilarProfiles (manager.go:519-546) — the reference's
    calculateSimilarity (manager.go:761-838) as column expressions,
    combined through functions.scalar.similarity_score whose fixed
    0.3/0.3/0.2/0.2 weights are exactly the reference's jql/options/
    repository/tags split:

    * jql (0.3): 1.0 on mutual containment, else common-word fraction
      over the larger lowercased word set;
    * options (0.3): mean of 4 null-safe equality indicators
      (concurrency, rate_limit, incremental, include_links);
    * repository (0.2): exact equality;
    * tags (0.2): |common| / max(|a|, |b|) when both tagged.

    Candidates above `threshold` (strict >, the reference's 50% gate),
    ordered by times_used desc then name (the reference's usage sort
    with a deterministic tie-break). The target row is a broadcast
    1-row frame — the plan stays a narrow map over the collection."""
    from jira_cdc_git_spark.functions.scalar import similarity_score

    target = profiles.filter(F.col("name") == name).select(
        *[F.col(c).alias(f"t_{c}") for c in profiles.columns]
    )
    cand = profiles.filter(F.col("name") != name).crossJoin(
        F.broadcast(target)
    )

    def frac_eq(col: str) -> F.Column:
        return F.col(col).eqNullSafe(F.col(f"t_{col}")).cast("double")

    options_frac = (
        frac_eq("concurrency")
        + frac_eq("rate_limit")
        + frac_eq("incremental")
        + frac_eq("include_links")
    ) / 4.0
    a_tags = F.coalesce("tags", F.array())
    b_tags = F.coalesce("t_tags", F.array())
    tags_frac = F.when(
        (F.size(a_tags) > 0) & (F.size(b_tags) > 0),
        F.size(F.array_intersect(a_tags, b_tags))
        / F.greatest(F.size(a_tags), F.size(b_tags)).cast("double"),
    ).otherwise(F.lit(0.0))
    a_jql = F.lower(F.coalesce("jql", F.lit("")))
    b_jql = F.lower(F.coalesce("t_jql", F.lit("")))
    a_words = F.array_distinct(F.split(a_jql, r"\s+"))
    b_words = F.array_distinct(F.split(b_jql, r"\s+"))
    jql_frac = F.when(
        (a_jql != "") & (b_jql != ""),
        F.when(
            F.contains(a_jql, b_jql) | F.contains(b_jql, a_jql), F.lit(1.0)
        ).otherwise(
            F.size(F.array_intersect(a_words, b_words))
            / F.greatest(F.size(a_words), F.size(b_words)).cast("double")
        ),
    ).otherwise(F.lit(0.0))
    score = similarity_score(
        jql_frac,
        options_frac,
        F.col("repository").eqNullSafe(F.col("t_repository")).cast("double"),
        tags_frac,
    )
    return (
        cand.withColumn("similarity", F.round(score, 6))
        .filter(F.col("similarity") > threshold)
        .select(*profiles.columns, "similarity")
        .orderBy(F.col("times_used").desc_nulls_last(), "name")
        .limit(limit)
    )


def profile_usage_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 (aggregate-table form) — per-profile usage rollup over a
    deterministic usage-event stream derived from orders (each order is one
    profile run: profile by orderkey mod 7, duration from totalprice,
    success = order fulfilled). One groupBy with partial aggregation —
    the scale form of record_usage's row-at-a-time running means."""
    from jira_cdc_git_spark.functions.text import round_half_up
    from jira_cdc_git_spark.sources.registry import load_table

    orders = load_table(spark, "orders", sf_dir)
    names = F.array(*[F.lit(p["name"]) for p in PROFILE_TEMPLATES])
    usage = orders.select(
        F.element_at(names, (F.col("o_orderkey") % 7).cast("int") + 1).alias(
            "profile"
        ),
        F.floor(F.col("o_totalprice") * 10).alias("sync_ms"),
        (F.col("o_orderstatus") == "F").cast("int").alias("ok"),
    )
    return usage.groupBy("profile").agg(
        F.count("*").cast("int").alias("times_used"),
        round_half_up(F.avg("sync_ms"), 2).alias("avg_sync_ms"),
        round_half_up(F.avg("ok"), 4).alias("success_rate"),
    )


def top_profiles(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """A9/W7 — most-used profiles (GetMostUsedProfiles,
    pkg/profile/manager.go:475-497) over the A8 rollup; deterministic
    tie-break by name. TakeOrderedAndProject over 7 rows."""
    stats = profile_usage_stats(spark, sf_dir)
    return stats.orderBy(
        F.col("times_used").desc(), F.col("profile")
    ).limit(k)


# ---------------------------------------------------------------------------
# Job specs (§3.2/§3.3 thin orchestration parity)
# ---------------------------------------------------------------------------

@dataclass
class SyncJobSpec:
    """JIRASyncSpec shape (internal/operator/types/types.go:12-67) kept as
    the declarative job IR; no Kubernetes — the driver interprets it."""

    sync_type: str  # single | jql | incremental | full
    jql: str | None = None
    issue_keys: list[str] = field(default_factory=list)
    project_key: str | None = None
    epic_key: str | None = None
    destination: str = "repo"
    concurrency: int = 5
    dry_run: bool = False

    def validate(self) -> list[str]:
        """validateSyncSpec (jirasync_controller.go:713-741) + the
        CLI's XOR rules (internal/cli/sync.go:96-107)."""
        errors = []
        if self.sync_type not in ("single", "jql", "incremental", "full"):
            errors.append(f"unknown sync_type {self.sync_type!r}")
        if bool(self.jql) == bool(self.issue_keys) and self.sync_type != "full":
            errors.append("exactly one of jql / issue_keys required")
        if not 1 <= self.concurrency <= 10:
            errors.append("concurrency must be in 1..10")
        return errors


def queue_status(jobs: DataFrame) -> DataFrame:
    """A7 — job counts by status pivoted to one row
    (pkg/jobs/scheduler.go:244-271)."""
    counted = jobs.groupBy("status").agg(F.count("*").alias("n"))
    return counted.groupBy().pivot(
        "status", ["pending", "running", "completed", "failed"]
    ).sum("n")


def run_job(
    spark: SparkSession,
    spec: SyncJobSpec,
    issues: DataFrame,
    store,
    out_root: str,
    jql_ctx=None,
    now: datetime | None = None,
) -> dict:
    """S11 restatement — the job-launch sink without Kubernetes: validate
    the spec (admission), select candidates (JQL-compiled or key list),
    run the shared incremental batch body, return the job record
    (scheduler.go:49-88 + generateContainerArgs 383-414 collapse into
    this dispatch — there is no container to re-encode args for)."""
    from jira_cdc_git_spark.jql import run_jql
    from jira_cdc_git_spark.streaming.pipeline import incremental_sync_batch

    errors = spec.validate()
    if errors:
        return {"status": "rejected", "errors": errors}
    if spec.jql:
        candidates = run_jql(spec.jql, issues, jql_ctx)
    elif spec.issue_keys:
        candidates = issues.filter(F.col("key").isin(spec.issue_keys))
    else:
        candidates = issues
    counts = incremental_sync_batch(
        spark,
        candidates,
        store,
        out_root,
        now=now,
        force=spec.sync_type == "full",
        dry_run=spec.dry_run,
    )
    return {"status": "completed", **counts}
