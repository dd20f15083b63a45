"""REST API facade — the reference's second user surface (SURVEY §3.2)
mapped onto the Spark engine with ONLY the standard library.

The reference runs an HTTP server that turns sync requests into
Kubernetes Jobs (internal/api/server.go:115-173 route table,
handlers_sync.go:143-164 JQL handler, handlers_jobs.go job status /
logs / queue endpoints). Here the same routes front the repo's job
IR (plans.SyncJobSpec) and the composed incremental sync loop
(streaming.pipeline.run_incremental_sync): a POST validates the
request exactly as validateJQLSyncRequest / validateBatchSyncRequest
do (handlers_sync.go:208-244 — jql >= 5 chars, parallelism 0..10,
concurrency 0..10, incremental XOR force), creates a job row, and a
worker thread drives the REST fetch → change filter → issues + edges +
commit-log + state MERGE pipeline. Status polling, logs, queue counts
and the response envelope ({success, data, error, meta} —
server.go:262-301) all match the reference's shapes.

Spark-first posture: the server is a THIN control plane (SURVEY §3.3);
every data-touching step inside a job is a Spark job. The job table is
exposed as a DataFrame (jobs_frame) so the A7 queue-status pivot
(plans.queue_status) runs over the live queue.
"""

from __future__ import annotations

import json
import re
import threading
import time
import urllib.parse
from datetime import datetime, timezone
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import DataFrame, SparkSession

from jira_cdc_git_spark import status_conditions as SC

API_VERSION = "0.5.0-spark"

#: job lifecycle (pkg/jobs JobStatus*; the repo's A7 pivot vocabulary)
PENDING, RUNNING, COMPLETED, FAILED, CANCELLED = (
    "pending", "running", "completed", "failed", "cancelled",
)

_ISSUE_KEY_RE = re.compile(r".+-[0-9]+$")


def _valid_issue_key(key: str) -> bool:
    """isValidIssueKey (handlers_sync.go:247-263): PROJECT-NUMBER with a
    numeric tail, non-empty, < 50 chars."""
    return bool(key) and len(key) < 50 and bool(_ISSUE_KEY_RE.fullmatch(key))


def validate_jql_sync_request(req: dict) -> str | None:
    """validateJQLSyncRequest (handlers_sync.go:208-227): first failing
    rule's message, None when valid."""
    jql = req.get("jql") or ""
    if not jql:
        return "jql is required"
    if not req.get("repository"):
        return "repository is required"
    if len(jql) < 5:
        return "JQL query too short, minimum 5 characters"
    if not 0 <= int(req.get("parallelism") or 0) <= 10:
        return "parallelism must be between 0 and 10"
    return _validate_sync_options(req.get("options"))


def validate_batch_sync_request(req: dict) -> str | None:
    """validateBatchSyncRequest (handlers_sync.go:184-206)."""
    keys = req.get("issue_keys") or []
    if not keys:
        return "issue_keys is required and cannot be empty"
    if not req.get("repository"):
        return "repository is required"
    for key in keys:
        if not _valid_issue_key(key):
            return f"invalid issue key format: {key}"
    if not 0 <= int(req.get("parallelism") or 0) <= 10:
        return "parallelism must be between 0 and 10"
    return _validate_sync_options(req.get("options"))


def validate_single_sync_request(req: dict) -> str | None:
    """validateSingleSyncRequest (handlers_sync.go:167-182)."""
    key = req.get("issue_key") or ""
    if not key:
        return "issue_key is required"
    if not req.get("repository"):
        return "repository is required"
    if not _valid_issue_key(key):
        return f"invalid issue key format: {key}"
    return _validate_sync_options(req.get("options"))


def _validate_sync_options(options: dict | None) -> str | None:
    """validateSyncOptions (handlers_sync.go:229-244)."""
    if not options:
        return None
    if not 0 <= int(options.get("concurrency") or 0) <= 10:
        return "concurrency must be between 0 and 10"
    if options.get("incremental") and options.get("force"):
        return "incremental and force options are mutually exclusive"
    return None


# ---------------------------------------------------------------------------
# X-Sync-Mode / X-Prefer-CRD dispatch + API->CRD conversion
# (internal/api/handlers_sync_enhanced.go + crd_converter.go)
# ---------------------------------------------------------------------------

#: SyncMode (handlers_sync_enhanced.go:17-23)
SYNC_MODE_DIRECT_JOB = "direct-job"
SYNC_MODE_CRD = "crd"
SYNC_MODE_HYBRID = "hybrid"
SYNC_MODES = (SYNC_MODE_DIRECT_JOB, SYNC_MODE_CRD, SYNC_MODE_HYBRID)

#: CRD-grade validation patterns (crd_converter.go:322-352). The
#: reference's repo pattern spells the optional ``.git`` suffix as
#: ``\\.git`` inside a Go backtick literal — a doubled backslash that
#: makes the suffix unmatchable; we implement the evident intent
#: (optional literal ``.git``).
_CRD_ISSUE_KEY_RE = re.compile(r"[A-Z][A-Z0-9]*-[1-9][0-9]*")
_CRD_HOST = r"[a-zA-Z0-9][a-zA-Z0-9.-]*[a-zA-Z0-9]"
_CRD_SEG = r"[a-zA-Z0-9_.-]+"
_CRD_REPO_RE = re.compile(
    rf"(https://{_CRD_HOST}/{_CRD_SEG}/{_CRD_SEG}(\.git)?"
    rf"|git@{_CRD_HOST}:{_CRD_SEG}/{_CRD_SEG}(\.git)?)"
)
_CRD_JQL_RE = re.compile(r'[^;\\<>"\x00-\x1f]*')


def _crd_issue_key_ok(key: str) -> bool:
    """isValidIssueKeySecure (crd_converter.go:322-331)."""
    return bool(_CRD_ISSUE_KEY_RE.fullmatch(key or "")) and 4 <= len(key) <= 50


def _crd_repo_ok(repo: str) -> bool:
    """isValidRepositoryURLSecure (crd_converter.go:333-341)."""
    return bool(_CRD_REPO_RE.fullmatch(repo or "")) and 1 <= len(repo) <= 500


def _crd_jql_ok(jql: str) -> bool:
    """isValidJQLSecure (crd_converter.go:343-352)."""
    return bool(_CRD_JQL_RE.fullmatch(jql or "")) and 1 <= len(jql) <= 1000


#: CRDConverter defaults (crd_converter.go:62-75)
_CRD_DEFAULTS = {
    "branch": "main",
    "path": "/",
    "priority": "normal",
    "timeout": 1800,
    "retryPolicy": {
        "maxRetries": 3,
        "backoffMultiplier": 2.0,
        "initialDelay": 30,
    },
}


def _crd_options_labels(options: dict | None) -> dict:
    """applySyncOptionsToSpec (crd_converter.go:354-379): API options map
    to CRD labels for controller interpretation."""
    labels: dict[str, str] = {}
    if not options:
        return labels
    if options.get("incremental"):
        labels["sync.jira.io/incremental"] = "true"
    if options.get("force"):
        labels["sync.jira.io/force"] = "true"
    if options.get("dry_run"):
        labels["sync.jira.io/dry-run"] = "true"
    if options.get("include_links"):
        labels["sync.jira.io/include-links"] = "true"
    if int(options.get("concurrency") or 0) > 0:
        labels["sync.jira.io/concurrency"] = str(int(options["concurrency"]))
    if options.get("rate_limit"):
        labels["sync.jira.io/rate-limit"] = str(options["rate_limit"])
    return labels


def convert_sync_to_crd(kind: str, req: dict, name: str) -> dict:
    """API request -> JIRASync CR document (crd_converter.go
    ConvertSingleSync/ConvertBatchSync/ConvertJQLSync:77-224 +
    createCRDResource:380-418). Raises ValueError with the reference's
    message on the CRD-grade validation failures that are STRICTER than
    the route validators (issue-key pattern, repository URL shape, JQL
    character set, batch cap of 100) — the hybrid mode's fallback
    trigger. Returns {"spec", "resource", "annotations", "crd_fields"}.
    """
    options = req.get("options")
    repo = req.get("repository") or ""
    if kind == "single":
        keys = [req.get("issue_key") or ""]
        if not _crd_issue_key_ok(keys[0]):
            raise ValueError(
                f"invalid issue key format: {keys[0]} (must match pattern "
                "^[A-Z][A-Z0-9]*-[1-9][0-9]*$)"
            )
        target = {"issueKeys": keys}
        annotations = {
            "sync.jira.io/safe-mode": str(bool(req.get("safe_mode"))).lower(),
            "sync.jira.io/async": str(bool(req.get("async"))).lower(),
            "sync.jira.io/source": "api-single-sync",
        }
        crd_fields = {"issueKeys": f"{keys}"}
    elif kind == "batch":
        keys = list(req.get("issue_keys") or [])
        if len(keys) > 100:
            raise ValueError(
                f"too many issue keys: {len(keys)} (maximum 100 allowed)"
            )
        for key in keys:
            if not _crd_issue_key_ok(key):
                raise ValueError(
                    f"invalid issue key format: {key} (must match pattern "
                    "^[A-Z][A-Z0-9]*-[1-9][0-9]*$)"
                )
        target = {"issueKeys": keys}
        annotations = {
            "sync.jira.io/safe-mode": str(bool(req.get("safe_mode"))).lower(),
            "sync.jira.io/async": str(bool(req.get("async"))).lower(),
            "sync.jira.io/parallelism": str(int(req.get("parallelism") or 0)),
            "sync.jira.io/source": "api-batch-sync",
            "sync.jira.io/issue-count": str(len(keys)),
        }
        crd_fields = {"issueKeys": f"{keys}", "issueCount": str(len(keys))}
    elif kind == "jql":
        jql = req.get("jql") or ""
        if not _crd_jql_ok(jql):
            raise ValueError(
                "invalid JQL query contains prohibited characters "
                '(;\\<>" or control characters)'
            )
        target = {"jqlQuery": jql}
        annotations = {
            "sync.jira.io/safe-mode": str(bool(req.get("safe_mode"))).lower(),
            "sync.jira.io/async": str(bool(req.get("async"))).lower(),
            "sync.jira.io/parallelism": str(int(req.get("parallelism") or 0)),
            "sync.jira.io/source": "api-jql-sync",
            "sync.jira.io/jql-query": jql,
        }
        crd_fields = {"jqlQuery": jql}
    else:  # pragma: no cover - route table guards kinds
        raise ValueError(f"unknown sync kind: {kind}")
    if not _crd_repo_ok(repo):
        raise ValueError(
            f"invalid repository URL: {repo} (must be HTTPS or SSH)"
        )

    spec = {
        "syncType": kind if kind != "jql" else "jql",
        "target": target,
        "destination": {
            "repository": repo,
            "branch": _CRD_DEFAULTS["branch"],
            "path": _CRD_DEFAULTS["path"],
        },
        "priority": _CRD_DEFAULTS["priority"],
        "timeout": _CRD_DEFAULTS["timeout"],
        "retryPolicy": dict(_CRD_DEFAULTS["retryPolicy"]),
    }
    labels = _crd_options_labels(options)
    if labels:
        spec["labels"] = labels
    crd_fields = {
        "syncType": spec["syncType"],
        "repository": repo,
        **crd_fields,
    }
    resource = {
        "apiVersion": "sync.jira.io/v1alpha1",
        "kind": "JIRASync",
        "metadata": {
            "name": name,
            "namespace": "default",
            "annotations": dict(annotations),
            "labels": {
                "app.kubernetes.io/name": "jira-sync-operator",
                "app.kubernetes.io/component": "sync-job",
                "sync.jira.io/type": kind,
                "sync.jira.io/source": "api",
            },
        },
        "spec": spec,
    }
    return {
        "spec": spec,
        "resource": resource,
        "annotations": annotations,
        "crd_fields": crd_fields,
    }


class JobManager:
    """In-process job queue replacing the reference's Kubernetes Job
    dispatch (pkg/jobs/scheduler.go:49-88): a pool of worker threads
    drains a FIFO of SyncJobSpec-shaped requests, each executed as the
    composed Spark sync (run_incremental_sync). Pool size mirrors the
    reference's scheduler default (pkg/jobs/jobs.go MaxConcurrency=10);
    Spark accepts concurrent job submission from multiple driver
    threads, so two submitted syncs genuinely overlap. Jobs targeting
    the SAME repository serialize (per-repo FIFO) — the sync-state
    store is single-writer per repo, the moral equivalent of the
    reference's per-JIRASync reconcile lock; *within* a job the
    parallelism knob maps to distributed fetch tasks."""

    def __init__(
        self,
        spark: SparkSession,
        base_url: str,
        out_root: str,
        *,
        token: str | None = None,
        limiter=None,
        max_concurrency: int = 10,
    ):
        self.spark = spark
        self.base_url = base_url
        self.out_root = out_root
        self.token = token
        self.limiter = limiter
        self._jobs: dict[str, dict] = {}
        self._order: list[str] = []
        self._lock = threading.Lock()
        self._wake = threading.Condition(self._lock)
        self._n = 0
        self._stop = False
        self._reload()
        self._workers = [
            threading.Thread(target=self._run_loop, daemon=True)
            for _ in range(max(1, max_concurrency))
        ]
        for w in self._workers:
            w.start()

    # -- durability ----------------------------------------------------
    # The reference's job state lives in Kubernetes objects and survives
    # an api-server restart; here each job row journals to one JSON file
    # under {out_root}/_jobs so a restarted server answers GET
    # /api/v1/jobs/{id} for jobs run before the restart. Pending jobs
    # found on reload were never executed — they resume automatically
    # (the worker scans in submission order).

    @property
    def _jobs_dir(self) -> str:
        import os

        return os.path.join(self.out_root, "_jobs")

    def _journal(self, job: dict) -> None:
        import os

        os.makedirs(self._jobs_dir, exist_ok=True)
        tmp = os.path.join(self._jobs_dir, f".{job['job_id']}.tmp")
        with open(tmp, "w") as fh:
            json.dump(job, fh)
        os.replace(tmp, os.path.join(self._jobs_dir, f"{job['job_id']}.json"))

    def _unjournal(self, job_id: str) -> None:
        import contextlib
        import os

        with contextlib.suppress(FileNotFoundError):
            os.remove(os.path.join(self._jobs_dir, f"{job_id}.json"))

    def _reload(self) -> None:
        import glob
        import os

        for path in sorted(glob.glob(os.path.join(self._jobs_dir, "*.json"))):
            try:
                with open(path) as fh:
                    job = json.load(fh)
            except (OSError, json.JSONDecodeError):
                continue
            if job.get("status") == RUNNING:
                # died mid-run before the journal caught the outcome —
                # surfaced as failed, the honest at-most-once answer
                job["status"] = FAILED
                job["errors"] = job.get("errors", []) + [
                    "server restarted while job was running"
                ]
            self._jobs[job["job_id"]] = job
            self._order.append(job["job_id"])
        # next id continues past the highest seen (ids stay unique even
        # when earlier jobs were deleted and the count is sparse)
        suffixes = [
            int(m.group(1))
            for j in self._order
            if (m := re.search(r"(\d+)$", j))
        ]
        self._n = max(suffixes, default=0)

    # -- submission ----------------------------------------------------

    def submit(
        self,
        job_type: str,
        jql: str,
        repository: str,
        req: dict,
        issue_keys: list[str] | None = None,
    ) -> dict:
        opts = req.get("options") or {}
        retry = _normalize_retry_policy(
            req.get("retry_policy") or req.get("retryPolicy") or opts.get("retry_policy")
        )
        with self._lock:
            self._n += 1
            job_id = f"sync-job-{self._n:05d}"
            job = {
                "job_id": job_id,
                "type": job_type,
                "status": PENDING,
                "jql": jql,
                "issue_keys": issue_keys or [],
                "repository": repository,
                "parallelism": int(req.get("parallelism") or 0),
                "dry_run": bool(opts.get("dry_run")),
                "incremental": bool(opts.get("incremental")),
                "force": bool(opts.get("force")),
                "batch_size": int(opts.get("batch_size") or 0),
                "created_at": _now_iso(),
                "started_at": None,
                "completed_at": None,
                "total_issues": 0,
                "processed_issues": 0,
                "successful_sync": 0,
                "failed_sync": 0,
                # RetryPolicy parity (internal/operator/types/types.go:
                # 57-67): attempts journal + retry bookkeeping live on
                # the job row the way the reference keeps retryCount in
                # an annotation.
                "retry_policy": retry,
                "retry_count": 0,
                "retry_at": None,
                "attempts": [],
                # ProgressInfo parity (types.go:129-152) — surfaced on
                # GET /api/v1/jobs/{id} like the status subresource.
                "progress": _progress_info(0, 0, None, "queued", "Pending"),
                # typed condition history + health rollup (StatusManager
                # parity, status_manager.go:35-76; r8 verdict task 7)
                "conditions": [],
                "health": SC.HEALTH_UNKNOWN,
                "error_cleared": False,
                "errors": [],
                "logs": [f"job {job_id} created ({job_type}): {jql}"],
            }
            # submit-time transitions (jirasync_controller.go:384-393):
            # the spec passed validation before reaching submit, and the
            # job is initialized but not yet scheduled.
            self._set_conditions(
                job,
                [
                    (SC.CONDITION_VALIDATED, True, SC.REASON_VALIDATING,
                     "Sync specification validated successfully"),
                    (SC.CONDITION_READY, False, SC.REASON_INITIALIZING,
                     "Sync initialized, waiting for scheduling"),
                ],
            )
            self._jobs[job_id] = job
            self._order.append(job_id)
            self._journal(job)
            self._wake.notify()
        return job

    def create_crd(self, kind: str, req: dict) -> dict:
        """CRD-mode dispatch: convert the sync request to a JIRASync CR
        and persist it instead of launching a job — the analog of
        createCRDResource's dynamic-client Create (handlers_sync_
        enhanced.go:333-357): one YAML document per CR under
        {out_root}/crds/{namespace}/. Name = jirasync-{type}-{unix}
        (crd_converter.go:381-382) with a collision counter appended
        when two CRs land in the same second (the reference would
        collide in-cluster; a local store must not). Raises ValueError
        on conversion/validation failure — hybrid mode's fallback
        trigger."""
        import os
        import time as _time

        import yaml

        base = f"jirasync-{kind}-{int(_time.time())}"
        with self._lock:
            name, n = base, 1
            root = os.path.join(self.out_root, "crds", "default")
            while os.path.exists(os.path.join(root, f"{name}.yaml")):
                name = f"{base}-{n}"
                n += 1
            result = convert_sync_to_crd(kind, req, name)
            os.makedirs(root, exist_ok=True)
            with open(os.path.join(root, f"{name}.yaml"), "w") as fh:
                yaml.safe_dump(result["resource"], fh, sort_keys=True)
        return {**result, "name": name, "namespace": "default"}

    def _set_conditions(
        self,
        job: dict,
        updates: list[tuple],
        clear_error: bool = False,
    ) -> None:
        """Apply condition transitions + recompute the health rollup —
        the UpdateStatus shape (status_manager.go:80-169). Caller holds
        the lock (or owns the job row pre-publication)."""
        conds = job.setdefault("conditions", [])
        now = _now_iso()
        for ctype, status, reason, message in updates:
            SC.set_condition(conds, ctype, status, reason, message, now)
        if clear_error:
            # ClearError parity (SetFailedCondition(false) zeroes
            # RetryCount before the health rollup); the raw counter
            # stays on the row for the retries_total metric.
            job["error_cleared"] = True
        job["health"] = SC.calculate_health(
            conds, job.get("retry_count", 0), job.get("error_cleared", False)
        )
        job["last_status_update"] = now

    # -- worker --------------------------------------------------------

    def _next_pending(self) -> dict | None:
        now = time.time()
        # per-repo serialization: a repository with a RUNNING job (or an
        # earlier runnable PENDING job) yields no candidate — the state
        # store is single-writer per repo; different repos overlap freely
        # across the worker pool (MaxConcurrency posture, pkg/jobs).
        busy_repos = {
            j["repository"]
            for j in self._jobs.values()
            if j["status"] == RUNNING
        }
        for jid in self._order:
            job = self._jobs[jid]
            if job["status"] != PENDING:
                continue
            repo = job["repository"]
            if repo in busy_repos:
                continue
            # a retry waits out its backoff delay (handleFailed →
            # updateStatusWithDelay, jirasync_controller.go:613-647);
            # retry_at is wall-clock ISO so it survives a restart.
            # The repo stays reserved while its head-of-line retry
            # waits, so FIFO-per-repo holds across backoff too.
            ra = job.get("retry_at")
            if ra is not None and _iso_to_ts(ra) > now:
                busy_repos.add(repo)
                continue
            return job
        return None

    def _run_loop(self) -> None:
        while True:
            with self._lock:
                job = self._next_pending()
                while job is None and not self._stop:
                    self._wake.wait(timeout=0.5)
                    job = self._next_pending()
                if self._stop:
                    return
                job["status"] = RUNNING
                job["retry_at"] = None
                if job["started_at"] is None:
                    job["started_at"] = _now_iso()
                attempt = job.get("retry_count", 0) + 1
                job["logs"].append(f"sync started (attempt {attempt})")
                self._set_conditions(
                    job,
                    [(SC.CONDITION_PROCESSING, True, SC.REASON_PROCESSING,
                      f"sync started (attempt {attempt})")],
                )
                self._journal(job)
            try:
                counts = self._execute(job)
                with self._lock:
                    job.update(
                        status=COMPLETED,
                        completed_at=_now_iso(),
                        total_issues=counts["total"],
                        processed_issues=counts["processed"],
                        successful_sync=counts["successful"],
                        failed_sync=counts["failed"],
                    )
                    done_pi = _progress_info(
                        counts["total"], counts["total"],
                        _iso_to_ts(job["started_at"]), "sync", "Completed",
                    )
                    done_pi["percentage"] = 100  # 0-change syncs finish too
                    job["progress"] = done_pi
                    job["attempts"].append(
                        {"attempt": attempt, "outcome": "completed",
                         "at": _now_iso()}
                    )
                    job["logs"].append(
                        "sync completed: "
                        + ", ".join(f"{k}={v}" for k, v in sorted(counts.items()))
                    )
                    # completion transitions: Ready=True, Processing off,
                    # Failed cleared (ClearError path) — the combination
                    # ValidateStatus requires for a Completed phase
                    self._set_conditions(
                        job,
                        [
                            (SC.CONDITION_READY, True, SC.REASON_COMPLETED,
                             "Sync completed successfully"),
                            (SC.CONDITION_PROCESSING, False,
                             SC.REASON_COMPLETED, "Sync completed"),
                            (SC.CONDITION_FAILED, False, SC.REASON_COMPLETED,
                             "Sync completed"),
                        ],
                        clear_error=True,
                    )
                    self._journal(job)
                    # a same-repo job may have been waiting on this one
                    self._wake.notify()
            except Exception as exc:  # job-scoped failure, server stays up
                self._handle_failed(job, attempt, exc)

    def _handle_failed(self, job: dict, attempt: int, exc: Exception) -> None:
        """handleFailed parity (jirasync_controller.go:613-647): with a
        RetryPolicy and retries left, re-queue as pending after
        delay = initial_delay * multiplier^retry_count; otherwise the
        failure is terminal. Every attempt journals to the job row."""
        with self._lock:
            job["errors"].append(f"{type(exc).__name__}: {exc}")
            job["attempts"].append(
                {"attempt": attempt, "outcome": "failed",
                 "error": f"{type(exc).__name__}: {exc}", "at": _now_iso()}
            )
            pol = job.get("retry_policy")
            retries_done = job.get("retry_count", 0)
            if pol and retries_done < pol["max_retries"]:
                delay = pol["initial_delay_s"]
                for _ in range(retries_done):
                    delay *= pol["backoff_multiplier"]
                job["retry_count"] = retries_done + 1
                job["retry_at"] = _ts_to_iso(time.time() + delay)
                job["status"] = PENDING
                job["error_cleared"] = False
                job["logs"].append(
                    f"sync failed: {exc}; retrying "
                    f"(attempt {retries_done + 1}/{pol['max_retries']}) "
                    f"in {delay:.2f}s"
                )
                # a retrying failure is Failed=True with ReasonRetrying
                # (status_manager.go:51) — health reads Unhealthy until
                # the retry clears it, Degraded once retries pile up
                self._set_conditions(
                    job,
                    [
                        (SC.CONDITION_FAILED, True, SC.REASON_RETRYING,
                         f"sync failed: {exc}; retrying"),
                        (SC.CONDITION_PROCESSING, False, SC.REASON_RETRYING,
                         "waiting for retry backoff"),
                    ],
                )
            else:
                job.update(status=FAILED, completed_at=_now_iso())
                job["error_cleared"] = False
                job["logs"].append(f"sync failed: {exc}")
                self._set_conditions(
                    job,
                    [
                        (SC.CONDITION_FAILED, True, SC.REASON_JOB_ERROR,
                         f"sync failed: {exc}"),
                        (SC.CONDITION_READY, False, SC.REASON_FAILED,
                         "Sync failed"),
                        (SC.CONDITION_PROCESSING, False, SC.REASON_FAILED,
                         "Sync failed"),
                    ],
                )
            self._journal(job)
            self._wake.notify()

    def _execute(self, job: dict) -> dict:
        from pyspark.sql import functions as F

        from jira_cdc_git_spark.sources import jira_rest as JR
        from jira_cdc_git_spark.state import SyncStateStore
        from jira_cdc_git_spark.streaming.pipeline import incremental_sync_batch

        out = f"{self.out_root}/{job['repository']}"
        store = SyncStateStore(f"{out}/state")
        # engine select parity (internal/cli/sync.go:174 via the job
        # container args): force sweeps everything; plain incremental and
        # dry-run preview both run state-filtered
        force = job["force"] or not (job["incremental"] or job["dry_run"])
        kw: dict = {"token": self.token}
        if job["parallelism"] > 0:
            kw.update(distributed=True, max_concurrent=job["parallelism"])
        elif self.limiter is not None:
            kw["limiter"] = self.limiter
        job["logs"].append(f"fetching: {job['jql']}")
        self._set_progress(job, 0, 0, "fetch", "Fetching")
        issues = JR.search_query(
            self.spark,
            self.base_url,
            job["jql"],
            distributed=job["parallelism"] > 0,
            **kw,
        )
        if job["issue_keys"]:
            # single/batch jobs sync EXACTLY the listed keys (the
            # reference fetches them one by one, batch_test.go posture) —
            # enforced engine-side even if the server over-returns
            issues = issues.filter(F.col("key").isin(job["issue_keys"]))
        sync_kw: dict = {
            "force": force,
            "dry_run": job["dry_run"],
            "edges_dir": f"{out}/edges",
        }
        bs = job.get("batch_size") or 0
        if bs <= 0:
            counts = incremental_sync_batch(
                self.spark, issues, store, out, **sync_kw
            )
            self._set_progress(
                job, counts["total"], counts["total"], "sync", "Syncing"
            )
            return counts
        # batched execution (internal/sync/batch.go posture): the fetch
        # set splits into ceil(total/batch_size) hash buckets, each
        # chunk runs the full batch body, and the job's ProgressInfo
        # (percentage / rate / ETA) updates + journals after every
        # chunk — the StatusManager.UpdateProgress loop.
        issues = issues.persist()
        try:
            total = issues.count()
            n_batches = max(1, -(-total // bs))
            bucket = F.pmod(F.xxhash64("key"), F.lit(n_batches))
            self._set_progress(job, total, 0, "sync", "Syncing")
            agg: dict[str, int] = {}
            done = 0
            for b in range(n_batches):
                chunk = issues.filter(bucket == b)
                done_b = chunk.count()
                c = incremental_sync_batch(
                    self.spark, chunk, store, out, **sync_kw
                )
                for key, val in c.items():
                    agg[key] = agg.get(key, 0) + val
                done += done_b
                self._set_progress(job, total, done, "sync", "Syncing")
            return agg
        finally:
            issues.unpersist()

    def _set_progress(
        self, job: dict, total: int, completed: int, op: str, stage: str
    ) -> None:
        with self._lock:
            started = job.get("started_at")
            pi = _progress_info(
                total,
                completed,
                _iso_to_ts(started) if started else None,
                op,
                stage,
            )
            job["progress"] = pi
            # UpdateProgress parity (status_manager.go:216-239): every
            # progress tick refreshes the Processing condition with the
            # "<operation> (N% complete)" message
            self._set_conditions(
                job,
                [(SC.CONDITION_PROCESSING, True, SC.REASON_PROCESSING,
                  f"{op} ({pi['percentage']}% complete)")],
            )
            self._journal(job)

    # -- queries -------------------------------------------------------

    def get(self, job_id: str) -> dict | None:
        with self._lock:
            return dict(self._jobs[job_id]) if job_id in self._jobs else None

    def list(self, statuses=None, types=None, limit: int = 20) -> list[dict]:
        with self._lock:
            rows = [dict(self._jobs[j]) for j in self._order]
        if statuses:
            rows = [r for r in rows if r["status"] in statuses]
        if types:
            rows = [r for r in rows if r["type"] in types]
        return rows[:limit]

    def wait_job(
        self,
        job_id: str,
        since_logs: int = 0,
        last_status: str | None = None,
        timeout_s: float = 10.0,
    ) -> dict | None:
        """Long-poll primitive behind the WatchJob parity routes
        (pkg/jobs/scheduler.go:152-199 streams {status, progress,
        message} events over a k8s watch channel; an HTTP facade blocks
        until something changed instead): return a job snapshot as soon
        as new log lines exist past ``since_logs`` OR the status differs
        from ``last_status`` OR the job is terminal — else when the
        timeout lapses. A 50 ms poll under the manager lock is plenty
        for a control-plane route (job mutations are seconds apart);
        the ThreadingHTTPServer gives every long-poll its own thread."""
        deadline = time.time() + max(0.0, min(timeout_s, 30.0))
        while True:
            with self._lock:
                job = self._jobs.get(job_id)
                if job is None:
                    return None
                terminal = job["status"] in (COMPLETED, FAILED, CANCELLED)
                changed = len(job["logs"]) > since_logs or (
                    last_status is not None and job["status"] != last_status
                )
                if terminal or changed or time.time() >= deadline:
                    return dict(job)
            time.sleep(0.05)

    def cancel(self, job_id: str) -> bool:
        """Cancel a job that has not started (a running Spark action is
        not interruptible from here — matching the reference, which can
        only delete the Kubernetes Job object)."""
        with self._lock:
            job = self._jobs.get(job_id)
            if job is None or job["status"] != PENDING:
                return False
            job["status"] = CANCELLED
            job["completed_at"] = _now_iso()
            job["logs"].append("job cancelled")
            self._journal(job)
            return True

    def delete(self, job_id: str) -> bool:
        with self._lock:
            if job_id not in self._jobs or self._jobs[job_id]["status"] in (
                PENDING, RUNNING,
            ):
                return False
            del self._jobs[job_id]
            self._order.remove(job_id)
            self._unjournal(job_id)
            return True

    def queue_counts(self) -> dict:
        """QueueStatusResponse (handlers_jobs.go:36-43)."""
        with self._lock:
            st = [self._jobs[j]["status"] for j in self._order]
        return {
            "total_jobs": len(st),
            "pending_jobs": st.count(PENDING),
            "running_jobs": st.count(RUNNING),
            "completed_jobs": st.count(COMPLETED),
            "failed_jobs": st.count(FAILED),
        }

    def render_metrics(self) -> str:
        """Prometheus text exposition of the job-queue counters — the
        HTTP face of the reference's metric registry (initMetrics,
        jirasync_controller.go:99-181): jirasync_jobs_total{phase},
        jirasync_sync_issues_total{result}, jirasync_retries_total,
        jirasync_job_duration_seconds (sum+count per type) and
        jirasync_progress_percentage{name,stage} for in-flight jobs.
        The driver-checked tabular twin is operators/jira.
        job_metrics_rollup; this route serves the LIVE queue."""
        with self._lock:
            jobs = [dict(self._jobs[j]) for j in self._order]
        lines = [
            "# HELP jirasync_jobs_total Jobs by phase",
            "# TYPE jirasync_jobs_total gauge",
        ]
        by_phase: dict[str, int] = {}
        for j in jobs:
            by_phase[j["status"]] = by_phase.get(j["status"], 0) + 1
        for phase in (PENDING, RUNNING, COMPLETED, FAILED, CANCELLED):
            lines.append(
                f'jirasync_jobs_total{{phase="{phase}"}} '
                f"{by_phase.get(phase, 0)}"
            )
        ok = sum(j.get("successful_sync", 0) for j in jobs)
        bad = sum(j.get("failed_sync", 0) for j in jobs)
        retries = sum(j.get("retry_count", 0) for j in jobs)
        lines += [
            "# HELP jirasync_sync_issues_total Issues synced by result",
            "# TYPE jirasync_sync_issues_total counter",
            f'jirasync_sync_issues_total{{result="successful"}} {ok}',
            f'jirasync_sync_issues_total{{result="failed"}} {bad}',
            "# HELP jirasync_retries_total Job retry attempts",
            "# TYPE jirasync_retries_total counter",
            f"jirasync_retries_total {retries}",
            "# HELP jirasync_job_duration_seconds Completed job durations",
            "# TYPE jirasync_job_duration_seconds summary",
        ]
        dur: dict[str, tuple[float, int]] = {}
        for j in jobs:
            if j.get("started_at") and j.get("completed_at"):
                s, c = dur.get(j["type"], (0.0, 0))
                dur[j["type"]] = (
                    s + _iso_to_ts(j["completed_at"]) - _iso_to_ts(j["started_at"]),
                    c + 1,
                )
        for jt, (s, c) in sorted(dur.items()):
            lines.append(
                f'jirasync_job_duration_seconds_sum{{type="{jt}"}} {s:.6f}'
            )
            lines.append(
                f'jirasync_job_duration_seconds_count{{type="{jt}"}} {c}'
            )
        lines += [
            "# HELP jirasync_progress_percentage In-flight job progress",
            "# TYPE jirasync_progress_percentage gauge",
        ]
        for j in jobs:
            if j["status"] == RUNNING and j.get("progress"):
                p = j["progress"]
                lines.append(
                    f'jirasync_progress_percentage{{name="{j["job_id"]}",'
                    f'stage="{p.get("stage", "")}"}} '
                    f'{p.get("percentage", 0)}'
                )
        return "\n".join(lines) + "\n"

    def jobs_frame(self, spark: SparkSession) -> DataFrame:
        """The queue as a Spark DataFrame — feeds plans.queue_status
        (A7 pivot) and any job-table analytics."""
        with self._lock:
            rows = [
                (j["job_id"], j["type"], j["status"], j["jql"],
                 j["repository"], j["total_issues"])
                for j in (self._jobs[jid] for jid in self._order)
            ]
        return spark.createDataFrame(
            rows,
            "job_id string, type string, status string, jql string,"
            " repository string, total_issues long",
        )

    def wait(self, job_id: str, timeout_s: float = 120.0) -> dict:
        """Block until the job reaches a terminal status (test helper —
        HTTP clients poll GET /api/v1/jobs/{id})."""
        deadline = time.monotonic() + timeout_s
        while time.monotonic() < deadline:
            job = self.get(job_id)
            if job is None or job["status"] in (COMPLETED, FAILED, CANCELLED):
                return job
            time.sleep(0.05)
        raise TimeoutError(f"job {job_id} still {self.get(job_id)['status']}")

    def shutdown(self) -> None:
        with self._lock:
            self._stop = True
            self._wake.notify_all()
        # Shared 5 s deadline across ALL workers (r7 ADVICE): joining
        # each of the 10 workers with its own timeout=5 let one wedged
        # _execute stretch shutdown to ~50 s where the old single-worker
        # path capped at 5 s. Each join gets only the time remaining.
        deadline = time.monotonic() + 5.0
        for w in self._workers:
            w.join(timeout=max(0.0, deadline - time.monotonic()))


def _now_iso() -> str:
    return datetime.now(timezone.utc).isoformat()


def _ts_to_iso(ts: float) -> str:
    return datetime.fromtimestamp(ts, tz=timezone.utc).isoformat()


def _iso_to_ts(iso: str) -> float:
    return datetime.fromisoformat(iso).timestamp()


def _normalize_retry_policy(raw) -> dict | None:
    """RetryPolicy (internal/operator/types/types.go:57-67): maxRetries,
    backoffMultiplier, initialDelay (seconds) — accepted in either the
    reference's camelCase JSON tags or snake_case; None disables retry
    (the reference's `MaxRetries > 0` gate, handleFailed)."""
    if not raw:
        return None
    max_retries = int(raw.get("maxRetries") or raw.get("max_retries") or 0)
    if max_retries <= 0:
        return None
    return {
        "max_retries": max_retries,
        "backoff_multiplier": float(
            raw.get("backoffMultiplier") or raw.get("backoff_multiplier") or 2.0
        ),
        "initial_delay_s": float(
            raw.get("initialDelay") or raw.get("initial_delay") or 1.0
        ),
    }


def _progress_info(
    total: int,
    completed: int,
    started_ts: float | None,
    operation: str,
    stage: str,
) -> dict:
    """ProgressInfo parity (types.go:129-152 + status_manager.go:497-521):
    percentage = completed/total, processing rate in ops/minute from the
    job's own elapsed time, ETA = now + remaining/rate."""
    pct = int(completed / total * 100) if total else 0
    rate = 0.0
    eta = None
    if started_ts is not None and completed > 0:
        elapsed_min = max((time.time() - started_ts) / 60.0, 1e-9)
        rate = round(completed / elapsed_min, 2)
        remaining = total - completed
        if rate > 0 and remaining > 0:
            eta = _ts_to_iso(time.time() + remaining / rate * 60.0)
    return {
        "percentage": pct,
        "current_operation": operation,
        "total_operations": total,
        "completed_operations": completed,
        "estimated_completion": eta,
        "processing_rate": rate,
        "stage": stage,
    }


def _json_safe(obj: dict) -> dict:
    return {
        k: (v.isoformat() if isinstance(v, datetime) else v)
        for k, v in obj.items()
    }


def validate_create_profile_request(req: dict) -> str | None:
    """validateCreateProfileRequest (handlers_profiles.go:172-196): name +
    repository required, EXACTLY one sync method (epic_key | jql |
    issue_keys). Unlike the reference — whose profile handlers stop at
    501 NOT_IMPLEMENTED after validating — the routes here are live
    against ProfileStore."""
    if not req.get("name"):
        return "name is required"
    if not req.get("repository"):
        return "repository is required"
    methods = sum(
        1
        for m in (req.get("epic_key"), req.get("jql"), req.get("issue_keys"))
        if m
    )
    if methods == 0:
        return "at least one sync method is required (epic_key, jql, or issue_keys)"
    if methods > 1:
        return "only one sync method may be specified"
    return None


def _job_response(job: dict) -> dict:
    """JobResponse (handlers_jobs.go:10-25) — logs stay behind /logs.
    `status_issues` carries the StatusManager consistency validator's
    findings (ValidateStatus, status_manager.go:312-358) so a watcher
    sees phase/condition drift the moment it exists — empty on every
    healthy row (asserted across the e2e transition tests)."""
    out = {k: v for k, v in job.items() if k != "logs"}
    out["status_issues"] = SC.validate_status(job)
    # kubectl printer-column parity (jirasync-crd.yaml:306-331): the
    # list view carries the same compact cells `kubectl get jirasyncs`
    # shows, including the canonical-order conditions summary
    out["printer_columns"] = SC.printer_columns(job)
    out["conditions_summary"] = out["printer_columns"]["conditions"]
    return out


class TokenBucket:
    """Server-side request rate limiter (the withRateLimit middleware
    slot, server.go:196-204 — the reference leaves it a pass-through
    stub 'for now'; here it is a real token bucket, the same
    live-upgrade posture as the profile routes). allow() returns
    (ok, retry_after_seconds)."""

    def __init__(self, rate_per_sec: float, burst: int | None = None, clock=None):
        self.rate = float(rate_per_sec)
        self.capacity = float(burst if burst is not None else max(1, rate_per_sec))
        self.tokens = self.capacity
        self.clock = clock or time.monotonic
        self.last = self.clock()
        self._lock = threading.Lock()

    def allow(self) -> tuple[bool, float]:
        with self._lock:
            now = self.clock()
            self.tokens = min(
                self.capacity, self.tokens + (now - self.last) * self.rate
            )
            self.last = now
            if self.tokens >= 1.0:
                self.tokens -= 1.0
                return True, 0.0
            return False, (1.0 - self.tokens) / self.rate


#: route inventory served by GET /api/v1/docs (handleAPIDocs parity,
#: internal/api/server.go:150-172 — same table, Kubernetes-free).
API_ROUTES = [
    "GET /metrics",
    "GET /api/v1/health",
    "GET /api/v1/system/info",
    "GET /api/v1/docs",
    "POST /api/v1/sync/single",
    "POST /api/v1/sync/batch",
    "POST /api/v1/sync/jql",
    "GET /api/v1/jobs",
    "GET /api/v1/jobs/{id}",
    "DELETE /api/v1/jobs/{id}",
    "POST /api/v1/jobs/{id}/cancel",
    "GET /api/v1/jobs/{id}/logs",
    "GET /api/v1/jobs/{id}/watch",
    "GET /api/v1/jobs/queue/status",
    "GET /api/v1/profiles",
    "GET /api/v1/profiles/{name}",
    "POST /api/v1/profiles",
    "PUT /api/v1/profiles/{name}",
    "DELETE /api/v1/profiles/{name}",
    # profile ops verbs (FileProfileManager parity, manager.go:372-645)
    "GET /api/v1/profiles/search",
    "GET /api/v1/profiles/validate",
    "GET /api/v1/profiles/{name}/similar",
    "POST /api/v1/profiles/{name}/duplicate",
    "POST /api/v1/profiles/{name}/rename",
    "POST /api/v1/profiles/backup",
    "POST /api/v1/profiles/restore",
    "POST /api/v1/profiles/repair",
]


class _Handler(BaseHTTPRequestHandler):
    server_version = "jira-sync-api/" + API_VERSION
    manager: JobManager = None  # injected by SyncAPIServer
    profiles = None  # injected ProfileStore
    enable_cors = True  # withCORS (server.go:206-226)
    ratelimit: TokenBucket | None = None  # withRateLimit slot
    sync_mode = SYNC_MODE_DIRECT_JOB  # server-default SyncMode

    def log_message(self, *a):  # quiet; the job log is the record
        pass

    # -- envelope (server.go:262-301) ----------------------------------

    def _write(self, status: int, data=None, error: dict | None = None) -> None:
        body = json.dumps(
            {
                "success": status < 400,
                "data": data,
                "error": error,
                "meta": {"timestamp": _now_iso(), "version": API_VERSION},
            }
        ).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self._cors_headers()
        self.end_headers()
        self.wfile.write(body)

    def _cors_headers(self) -> None:
        if self.enable_cors:
            self.send_header("Access-Control-Allow-Origin", "*")
            self.send_header(
                "Access-Control-Allow-Methods", "GET, POST, PUT, DELETE, OPTIONS"
            )
            self.send_header(
                "Access-Control-Allow-Headers", "Content-Type, Authorization"
            )

    def do_OPTIONS(self):
        # CORS preflight (server.go:218-222): 200 with the allow headers
        self.send_response(200)
        self._cors_headers()
        self.send_header("Content-Length", "0")
        self.end_headers()

    def _gate(self) -> bool:
        """Rate-limit gate run before every routed request: 429 +
        Retry-After when the bucket is dry (the contract our own REST
        client's RateLimiter.backoff honors from the other side)."""
        if self.ratelimit is None:
            return True
        ok, retry_after = self.ratelimit.allow()
        if ok:
            return True
        body = json.dumps(
            {
                "success": False,
                "data": None,
                "error": {
                    "code": "RATE_LIMITED",
                    "message": "Too many requests",
                    "details": f"retry after {retry_after:.3f}s",
                },
                "meta": {"timestamp": _now_iso(), "version": API_VERSION},
            }
        ).encode()
        self.send_response(429)
        self.send_header("Retry-After", str(max(1, round(retry_after))))
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self._cors_headers()
        self.end_headers()
        self.wfile.write(body)
        return False

    def _error(self, status: int, code: str, message: str, details: str = "") -> None:
        self._write(
            status, error={"code": code, "message": message, "details": details}
        )

    def _body_json(self) -> dict | None:
        try:
            n = int(self.headers.get("Content-Length") or 0)
            return json.loads(self.rfile.read(n) or b"{}")
        except (ValueError, json.JSONDecodeError):
            return None

    # -- routing (server.go:148-173) -----------------------------------

    def do_GET(self):
        if not self._gate():
            return
        path = urllib.parse.urlparse(self.path).path.rstrip("/")
        parts = path.strip("/").split("/")
        if path == "/api/v1/health":
            self._write(200, {"status": "healthy"})
        elif path == "/metrics":
            # Prometheus exposition format — text/plain, no JSON envelope
            body = self.manager.render_metrics().encode()
            self.send_response(200)
            self.send_header(
                "Content-Type", "text/plain; version=0.0.4; charset=utf-8"
            )
            self.send_header("Content-Length", str(len(body)))
            self._cors_headers()
            self.end_headers()
            self.wfile.write(body)
        elif path == "/api/v1/system/info":
            self._write(200, {"version": API_VERSION, "engine": "pyspark"})
        elif path == "/api/v1/docs":
            self._write(200, {"version": API_VERSION, "routes": API_ROUTES})
        elif path == "/api/v1/profiles":
            names = self.profiles.list_names()
            self._write(
                200,
                {
                    "profiles": [
                        _json_safe(self.profiles.get(n)) for n in names
                    ],
                    "count": len(names),
                },
            )
        elif path == "/api/v1/profiles/search":
            qs = urllib.parse.parse_qs(urllib.parse.urlparse(self.path).query)
            from jira_cdc_git_spark import plans as PL

            hits = PL.search_profiles(
                self.profiles.as_df(self.manager.spark),
                query=qs.get("q", [""])[0] or None,
                tags=[
                    t
                    for t in (qs.get("tags", [""])[0] or "").split(",")
                    if t
                ]
                or None,
                repository=qs.get("repository", [""])[0] or None,
                include_jql=qs.get("include_jql", [""])[0]
                in ("1", "true", "yes"),
            ).collect()
            out = [_json_safe(r.asDict()) for r in hits]
            self._write(200, {"profiles": out, "count": len(out)})
        elif path == "/api/v1/profiles/validate":
            self._write(200, self.profiles.validate_collection())
        elif (
            len(parts) == 5
            and parts[:3] == ["api", "v1", "profiles"]
            and parts[4] == "similar"
        ):
            if not self.profiles.exists(parts[3]):
                return self._error(
                    404, "PROFILE_NOT_FOUND", "Profile not found"
                )
            qs = urllib.parse.parse_qs(urllib.parse.urlparse(self.path).query)
            try:
                limit = int(qs.get("limit", ["5"])[0])
            except ValueError:
                return self._error(
                    400, "INVALID_REQUEST", "limit must be an integer"
                )
            from jira_cdc_git_spark import plans as PL

            hits = PL.similar_profiles(
                self.profiles.as_df(self.manager.spark), parts[3], limit=limit
            ).collect()
            out = [_json_safe(r.asDict()) for r in hits]
            self._write(200, {"profiles": out, "count": len(out)})
        elif len(parts) == 4 and parts[:3] == ["api", "v1", "profiles"]:
            try:
                self._write(200, _json_safe(self.profiles.get(parts[3])))
            except KeyError:
                self._error(404, "PROFILE_NOT_FOUND", "Profile not found")
        elif path == "/api/v1/jobs/queue/status":
            self._write(200, self.manager.queue_counts())
        elif path == "/api/v1/jobs":
            qs = urllib.parse.parse_qs(urllib.parse.urlparse(self.path).query)
            statuses = (qs.get("status", [""])[0] or None) and set(
                s.strip() for s in qs["status"][0].split(",")
            )
            types = (qs.get("type", [""])[0] or None) and set(
                t.strip() for t in qs["type"][0].split(",")
            )
            try:
                page_size = int(qs.get("page_size", ["20"])[0])
            except ValueError:
                return self._error(
                    400, "INVALID_PARAMETER", "Invalid page_size parameter"
                )
            if not 1 <= page_size <= 100:
                page_size = 20
            jobs = [
                _job_response(j)
                for j in self.manager.list(statuses, types, page_size)
            ]
            self._write(
                200,
                {
                    "jobs": jobs,
                    "total_count": len(jobs),
                    "page": 1,
                    "page_size": page_size,
                    "has_more": len(jobs) == page_size,
                },
            )
        elif len(parts) == 4 and parts[:3] == ["api", "v1", "jobs"]:
            job = self.manager.get(parts[3])
            if job is None:
                return self._error(404, "JOB_NOT_FOUND", "Job not found")
            self._write(200, _job_response(job))
        elif (
            len(parts) == 5
            and parts[:3] == ["api", "v1", "jobs"]
            and parts[4] == "logs"
        ):
            qs = urllib.parse.parse_qs(urllib.parse.urlparse(self.path).query)
            try:
                since = int((qs.get("since") or ["0"])[0])
                timeout_s = float((qs.get("timeout") or ["10"])[0])
            except ValueError:
                return self._error(
                    400, "INVALID_PARAMETER", "Invalid since/timeout parameter"
                )
            follow = (qs.get("follow") or ["false"])[0].lower() == "true"
            if follow:
                job = self.manager.wait_job(
                    parts[3], since_logs=since, timeout_s=timeout_s
                )
            else:
                job = self.manager.get(parts[3])
            if job is None:
                return self._error(404, "JOB_NOT_FOUND", "Job not found")
            self._write(
                200,
                {
                    "job_id": job["job_id"],
                    "status": job["status"],
                    "logs": job["logs"][since:],
                    "next_since": len(job["logs"]),
                },
            )
        elif (
            len(parts) == 5
            and parts[:3] == ["api", "v1", "jobs"]
            and parts[4] == "watch"
        ):
            # WatchJob parity (scheduler.go:152-199): one JobMonitor
            # event per long-poll — {status, progress, message} — the
            # HTTP shape of the reference's watch channel; clients loop
            # passing back last_status until a terminal status arrives.
            qs = urllib.parse.parse_qs(urllib.parse.urlparse(self.path).query)
            last = (qs.get("last_status") or [None])[0]
            try:
                timeout_s = float((qs.get("timeout") or ["10"])[0])
            except ValueError:
                return self._error(
                    400, "INVALID_PARAMETER", "Invalid timeout parameter"
                )
            job = self.manager.wait_job(
                parts[3], since_logs=10**9, last_status=last,
                timeout_s=timeout_s,
            )
            if job is None:
                return self._error(404, "JOB_NOT_FOUND", "Job not found")
            self._write(
                200,
                {
                    "job_id": job["job_id"],
                    "status": job["status"],
                    "progress": job.get("progress"),
                    "message": job["logs"][-1] if job["logs"] else None,
                    "last_check": _now_iso(),
                },
            )
        else:
            self._error(404, "NOT_FOUND", f"no route for GET {path}")

    def do_POST(self):
        if not self._gate():
            return
        path = urllib.parse.urlparse(self.path).path.rstrip("/")
        parts = path.strip("/").split("/")
        req = self._body_json()
        if req is None:
            return self._error(400, "INVALID_REQUEST", "Invalid JSON request body")
        if path == "/api/v1/sync/jql":
            err = validate_jql_sync_request(req)
            if err:
                return self._error(
                    400, "VALIDATION_ERROR", "Request validation failed", err
                )
            if self._crd_dispatch("jql", req):
                return
            job = self.manager.submit("jql", req["jql"], req["repository"], req)
            self._write(202, self._sync_response(job))
        elif path == "/api/v1/sync/batch":
            err = validate_batch_sync_request(req)
            if err:
                return self._error(
                    400, "VALIDATION_ERROR", "Request validation failed", err
                )
            if self._crd_dispatch("batch", req):
                return
            jql = "key in (" + ", ".join(req["issue_keys"]) + ")"
            job = self.manager.submit(
                "batch", jql, req["repository"], req, req["issue_keys"]
            )
            self._write(202, self._sync_response(job))
        elif path == "/api/v1/sync/single":
            err = validate_single_sync_request(req)
            if err:
                return self._error(
                    400, "VALIDATION_ERROR", "Request validation failed", err
                )
            if self._crd_dispatch("single", req):
                return
            jql = f"key = {req['issue_key']}"
            job = self.manager.submit(
                "single", jql, req["repository"], req, [req["issue_key"]]
            )
            if req.get("async"):
                return self._write(202, self._sync_response(job))
            # small single-issue syncs run synchronously (handlers_sync.go
            # :97-115): wait for the worker and return the result inline
            try:
                done = self.manager.wait(job["job_id"])
            except TimeoutError as exc:
                return self._error(
                    500, "SYNC_ERROR", "Sync operation timed out", str(exc)
                )
            resp = self._sync_response(done)
            resp["result"] = {
                "total_issues": done["total_issues"],
                "processed_issues": done["processed_issues"],
                "successful_sync": done["successful_sync"],
                "failed_sync": done["failed_sync"],
            }
            self._write(200 if done["status"] == COMPLETED else 500, resp)
        elif (
            len(parts) == 5
            and parts[:3] == ["api", "v1", "jobs"]
            and parts[4] == "cancel"
        ):
            if not self.manager.cancel(parts[3]):
                return self._error(
                    500, "JOB_CANCEL_ERROR", "Failed to cancel job"
                )
            self._write(
                200, {"message": "Job cancelled successfully", "job_id": parts[3]}
            )
        elif path == "/api/v1/profiles":
            err = validate_create_profile_request(req)
            if err:
                return self._error(
                    400, "VALIDATION_ERROR", "Request validation failed", err
                )
            try:
                self.profiles.create(req)
            except ValueError as exc:
                return self._error(
                    409, "PROFILE_EXISTS", "Profile already exists", str(exc)
                )
            self._write(201, _json_safe(self.profiles.get(req["name"])))
        elif path == "/api/v1/profiles/backup":
            try:
                bak = self.profiles.backup()
            except FileNotFoundError:
                return self._error(
                    404, "PROFILES_NOT_FOUND", "No profile collection to back up"
                )
            self._write(200, {"message": "Profiles backed up", "path": bak})
        elif path == "/api/v1/profiles/restore":
            try:
                self.profiles.restore()
            except FileNotFoundError:
                return self._error(
                    404, "BACKUP_NOT_FOUND", "No backup to restore"
                )
            self._write(200, {"message": "Profiles restored"})
        elif path == "/api/v1/profiles/repair":
            removed = self.profiles.repair_collection()
            self._write(200, {"removed": removed, "count": len(removed)})
        elif (
            len(parts) == 5
            and parts[:3] == ["api", "v1", "profiles"]
            and parts[4] in ("duplicate", "rename")
        ):
            if req is None:
                return self._error(
                    400, "INVALID_REQUEST", "Invalid JSON request body"
                )
            target = req.get(
                "target_name" if parts[4] == "duplicate" else "new_name"
            )
            if not target:
                return self._error(
                    400,
                    "VALIDATION_ERROR",
                    "Request validation failed",
                    f"{'target_name' if parts[4] == 'duplicate' else 'new_name'}"
                    " is required",
                )
            try:
                if parts[4] == "duplicate":
                    self.profiles.duplicate(parts[3], target)
                else:
                    self.profiles.rename(parts[3], target)
            except KeyError:
                return self._error(
                    404, "PROFILE_NOT_FOUND", "Profile not found"
                )
            except ValueError as exc:
                return self._error(
                    409 if "exists" in str(exc) else 400,
                    "PROFILE_CONFLICT" if "exists" in str(exc)
                    else "VALIDATION_ERROR",
                    str(exc),
                )
            self._write(200, _json_safe(self.profiles.get(target)))
        else:
            self._error(404, "NOT_FOUND", f"no route for POST {path}")

    def do_PUT(self):
        if not self._gate():
            return
        parts = self.path.rstrip("/").strip("/").split("/")
        if len(parts) == 4 and parts[:3] == ["api", "v1", "profiles"]:
            req = self._body_json()
            if req is None:
                return self._error(
                    400, "INVALID_REQUEST", "Invalid JSON request body"
                )
            try:
                self.profiles.update(parts[3], req)
            except KeyError:
                return self._error(404, "PROFILE_NOT_FOUND", "Profile not found")
            self._write(200, _json_safe(self.profiles.get(parts[3])))
        else:
            self._error(404, "NOT_FOUND", "no route")

    def do_DELETE(self):
        if not self._gate():
            return
        parts = self.path.rstrip("/").strip("/").split("/")
        if len(parts) == 4 and parts[:3] == ["api", "v1", "jobs"]:
            if not self.manager.delete(parts[3]):
                return self._error(500, "JOB_DELETE_ERROR", "Failed to delete job")
            self._write(
                200, {"message": "Job deleted successfully", "job_id": parts[3]}
            )
        elif len(parts) == 4 and parts[:3] == ["api", "v1", "profiles"]:
            try:
                self.profiles.delete(parts[3])
            except KeyError:
                return self._error(404, "PROFILE_NOT_FOUND", "Profile not found")
            self._write(
                200,
                {"message": "Profile deleted successfully", "name": parts[3]},
            )
        else:
            self._error(404, "NOT_FOUND", "no route")

    @staticmethod
    def _sync_response(job: dict) -> dict:
        """SyncResponse (handlers_sync.go:56-63)."""
        return {
            "job_id": job["job_id"],
            "status": job["status"],
            "created_at": job["created_at"],
            "started_at": job["started_at"],
        }

    def _sync_mode(self) -> str:
        """determineSyncMode (handlers_sync_enhanced.go:315-330):
        explicit X-Sync-Mode header (invalid values fall through, not
        400) -> X-Prefer-CRD: true -> server default."""
        mode = self.headers.get("X-Sync-Mode") or ""
        if mode in SYNC_MODES:
            return mode
        if (self.headers.get("X-Prefer-CRD") or "").lower() == "true":
            return SYNC_MODE_CRD
        return self.sync_mode

    def _crd_dispatch(self, kind: str, req: dict) -> bool:
        """Per-request sync-mode dispatch (HandleEnhancedSingleSync /
        BatchSync / JQLSync, handlers_sync_enhanced.go:62-185). Returns
        True when a response was written (crd success, or crd-mode
        failure -> 500); False when the caller should run the
        direct-job path (direct-job mode, or hybrid fallback after a
        failed conversion). The response mirrors CRDSyncResponse
        (handlers_sync_enhanced.go:34-48) with the EFFECTIVE mode in
        ``mode`` (the reference echoes the server-config mode there
        even when a header overrode it — we report what actually
        ran)."""
        mode = self._sync_mode()
        if mode == SYNC_MODE_DIRECT_JOB:
            return False
        try:
            crd = self.manager.create_crd(kind, req)
        except ValueError as exc:
            if mode == SYNC_MODE_HYBRID:
                return False  # fallback to direct job
            self._error(
                500, "CRD_SYNC_ERROR",
                f"Failed to create CRD {kind} sync", str(exc),
            )
            return True
        original = {
            "single": "SingleSyncRequest",
            "batch": "BatchSyncRequest",
            "jql": "JQLSyncRequest",
        }[kind]
        self._write(202, {
            "job_id": f"crd-{crd['name']}",
            "status": "crd-created",
            "created_at": _now_iso(),
            "started_at": None,
            "crd_name": crd["name"],
            "crd_namespace": crd["namespace"],
            "mode": mode,
            "conversion_info": {
                "original_request_type": original,
                "crd_fields": crd["crd_fields"],
                "annotations": crd["annotations"],
            },
        })
        return True


class SyncAPIServer:
    """The bound HTTP server: construct, .start(), drive with any HTTP
    client, .stop(). Port 0 picks a free port (test posture — the same
    one the repo's mock JIRA fixture uses)."""

    def __init__(
        self,
        spark: SparkSession,
        jira_base_url: str,
        out_root: str,
        *,
        host: str = "127.0.0.1",
        port: int = 0,
        token: str | None = None,
        limiter=None,
        enable_cors: bool = True,
        rate_limit_per_sec: float | None = None,
        rate_limit_burst: int | None = None,
        sync_mode: str = SYNC_MODE_DIRECT_JOB,
    ):
        from jira_cdc_git_spark.profile_store import ProfileStore

        # The reference's mode switch has a default arm that rejects
        # unknown modes (handlers_sync_enhanced.go switch default ->
        # 500 INVALID_MODE); header-level invalid values fall through in
        # _sync_mode, but a bogus SERVER-default would otherwise be
        # silently treated as CRD-ish by _crd_dispatch — fail fast here.
        if sync_mode not in SYNC_MODES:
            raise ValueError(
                f"invalid sync_mode {sync_mode!r}; expected one of {SYNC_MODES}"
            )

        self.manager = JobManager(
            spark, jira_base_url, out_root, token=token, limiter=limiter
        )
        self.profiles = ProfileStore(f"{out_root}/profiles")
        handler = type(
            "_BoundHandler",
            (_Handler,),
            {
                "manager": self.manager,
                "profiles": self.profiles,
                "enable_cors": enable_cors,
                "sync_mode": sync_mode,
                "ratelimit": (
                    TokenBucket(rate_limit_per_sec, rate_limit_burst)
                    if rate_limit_per_sec
                    else None
                ),
            },
        )
        self._httpd = ThreadingHTTPServer((host, port), handler)
        self._thread: threading.Thread | None = None

    @property
    def url(self) -> str:
        host, port = self._httpd.server_address[:2]
        return f"http://{host}:{port}"

    def start(self) -> "SyncAPIServer":
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        if self._thread:
            self._thread.join(timeout=5)
        self.manager.shutdown()
