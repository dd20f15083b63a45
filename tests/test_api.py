"""REST API facade tests (SURVEY §3.2) — validation parity with the
reference's test/api_validation_test.go plus the e2e job lifecycle the
round-4 verdict specified: POST creates a job row, the job runs the
composed incremental sync against the mock JIRA server, status
transitions pending→running→completed with A7 counts, and a second
POST with unchanged upstream syncs 0."""

import json
import urllib.error
import urllib.request

import pytest
from test_jira_rest import N_ISSUES, _Handler, mock_jira  # noqa: F401

from jira_cdc_git_spark import api as A


# ---------------------------------------------------------------------------
# pure validation (no server needed) — api_validation_test.go parity
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "req,msg",
    [
        ({}, "jql is required"),
        ({"jql": "project = X"}, "repository is required"),
        ({"jql": "a=b", "repository": "r"}, "JQL query too short"),
        (
            {"jql": "project = X", "repository": "r", "parallelism": 11},
            "parallelism must be between 0 and 10",
        ),
        (
            {"jql": "project = X", "repository": "r", "parallelism": -1},
            "parallelism must be between 0 and 10",
        ),
        (
            {
                "jql": "project = X",
                "repository": "r",
                "options": {"concurrency": 11},
            },
            "concurrency must be between 0 and 10",
        ),
        (
            {
                "jql": "project = X",
                "repository": "r",
                "options": {"incremental": True, "force": True},
            },
            "incremental and force options are mutually exclusive",
        ),
    ],
)
def test_jql_request_validation(req, msg):
    err = A.validate_jql_sync_request(req)
    assert err is not None and msg in err


def test_jql_request_valid():
    assert (
        A.validate_jql_sync_request(
            {"jql": "project = PROJ", "repository": "repo", "parallelism": 5}
        )
        is None
    )


@pytest.mark.parametrize(
    "req,msg",
    [
        ({}, "issue_keys is required"),
        ({"issue_keys": ["PROJ-1"]}, "repository is required"),
        (
            {"issue_keys": ["PROJ-1", "not a key"], "repository": "r"},
            "invalid issue key format: not a key",
        ),
        (
            {"issue_keys": ["PROJ-"], "repository": "r"},
            "invalid issue key format",
        ),
    ],
)
def test_batch_request_validation(req, msg):
    err = A.validate_batch_sync_request(req)
    assert err is not None and msg in err


def test_single_request_validation():
    assert "issue_key is required" in A.validate_single_sync_request({})
    assert A.validate_single_sync_request(
        {"issue_key": "PROJ-7", "repository": "r"}
    ) is None
    assert "invalid issue key" in A.validate_single_sync_request(
        {"issue_key": "nodash", "repository": "r"}
    )


# ---------------------------------------------------------------------------
# HTTP round trips against the live facade + mock JIRA
# ---------------------------------------------------------------------------

@pytest.fixture
def api_server(spark, mock_jira, tmp_path):  # noqa: F811
    url, state = mock_jira
    from test_jira_rest import _fast_limiter

    srv = A.SyncAPIServer(
        spark, url, str(tmp_path / "repos"), limiter=_fast_limiter()
    ).start()
    try:
        yield srv, state
    finally:
        srv.stop()


def _req(method, url, body=None):
    data = json.dumps(body).encode() if body is not None else None
    r = urllib.request.Request(url, data=data, method=method)
    if data:
        r.add_header("Content-Type", "application/json")
    try:
        with urllib.request.urlopen(r, timeout=120) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_http_validation_and_envelope(api_server):
    srv, _ = api_server
    status, body = _req(
        "POST", f"{srv.url}/api/v1/sync/jql", {"jql": "abc", "repository": "r"}
    )
    assert status == 400
    assert body["success"] is False
    assert body["error"]["code"] == "VALIDATION_ERROR"
    assert "minimum 5 characters" in body["error"]["details"]
    assert "timestamp" in body["meta"]

    # malformed JSON body
    r = urllib.request.Request(
        f"{srv.url}/api/v1/sync/jql", data=b"{not json", method="POST"
    )
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(r, timeout=30)
    assert ei.value.code == 400
    assert json.loads(ei.value.read())["error"]["code"] == "INVALID_REQUEST"

    status, body = _req("GET", f"{srv.url}/api/v1/health")
    assert (status, body["data"]["status"]) == (200, "healthy")

    status, body = _req("GET", f"{srv.url}/api/v1/jobs/nope-1")
    assert (status, body["error"]["code"]) == (404, "JOB_NOT_FOUND")


def test_jql_sync_job_lifecycle(api_server, spark):
    srv, state = api_server
    status, body = _req(
        "POST",
        f"{srv.url}/api/v1/sync/jql",
        {"jql": "project = PROJ", "repository": "main-repo"},
    )
    assert status == 202 and body["success"]
    job_id = body["data"]["job_id"]
    assert body["data"]["status"] in (A.PENDING, A.RUNNING)

    done = srv.manager.wait(job_id)
    assert done["status"] == A.COMPLETED

    # GET /jobs/{id}: JobResponse counts reflect the full first sync
    status, body = _req("GET", f"{srv.url}/api/v1/jobs/{job_id}")
    assert status == 200
    job = body["data"]
    assert job["total_issues"] == N_ISSUES
    assert job["successful_sync"] == N_ISSUES
    assert job["failed_sync"] == 0
    assert job["started_at"] and job["completed_at"]
    assert "logs" not in job  # logs live behind /logs

    # the optimized JQL reached the JIRA server (the sync really ran)
    assert "ORDER BY" in state["jql"]

    # GET /jobs/{id}/logs
    status, body = _req("GET", f"{srv.url}/api/v1/jobs/{job_id}/logs")
    assert status == 200
    logs = body["data"]["logs"]
    assert any("created" in line for line in logs)
    assert any("completed" in line for line in logs)

    # queue status (handlers_jobs.go:229-) + the A7 pivot over jobs_frame
    status, body = _req("GET", f"{srv.url}/api/v1/jobs/queue/status")
    assert status == 200
    assert body["data"]["completed_jobs"] == 1
    assert body["data"]["total_jobs"] == 1
    from jira_cdc_git_spark.plans import queue_status

    pivot = queue_status(srv.manager.jobs_frame(spark)).collect()[0]
    assert pivot["completed"] == 1 and pivot["pending"] is None

    # second POST, unchanged upstream → incremental sync of 0 (C4 via API)
    status, body = _req(
        "POST",
        f"{srv.url}/api/v1/sync/jql",
        {
            "jql": "project = PROJ",
            "repository": "main-repo",
            "options": {"incremental": True},
        },
    )
    assert status == 202
    done2 = srv.manager.wait(body["data"]["job_id"])
    assert done2["status"] == A.COMPLETED
    assert done2["total_issues"] == 0

    # GET /jobs list filtered by status
    status, body = _req(
        "GET", f"{srv.url}/api/v1/jobs?status=completed&page_size=50"
    )
    assert status == 200
    assert {j["job_id"] for j in body["data"]["jobs"]} == {
        job_id, done2["job_id"],
    }


def test_single_sync_synchronous(api_server):
    srv, _ = api_server
    status, body = _req(
        "POST",
        f"{srv.url}/api/v1/sync/single",
        {"issue_key": "PROJ-3", "repository": "single-repo"},
    )
    assert status == 200 and body["success"]
    assert body["data"]["status"] == A.COMPLETED
    assert body["data"]["result"]["total_issues"] == 1
    assert body["data"]["result"]["successful_sync"] == 1


def test_batch_sync_and_cancel_delete(api_server):
    srv, _ = api_server
    status, body = _req(
        "POST",
        f"{srv.url}/api/v1/sync/batch",
        {"issue_keys": ["PROJ-1", "PROJ-2"], "repository": "batch-repo"},
    )
    assert status == 202
    jid = body["data"]["job_id"]
    done = srv.manager.wait(jid)
    assert done["status"] == A.COMPLETED and done["total_issues"] == 2

    # cancel only works on pending jobs — this one already finished
    status, body = _req("POST", f"{srv.url}/api/v1/jobs/{jid}/cancel")
    assert (status, body["error"]["code"]) == (500, "JOB_CANCEL_ERROR")

    # delete a terminal job, then it 404s
    status, body = _req("DELETE", f"{srv.url}/api/v1/jobs/{jid}")
    assert status == 200
    status, body = _req("GET", f"{srv.url}/api/v1/jobs/{jid}")
    assert status == 404


def test_dry_run_previews_incremental_change_set(api_server, spark):
    """ADVICE r4 #1 (engine-select parity, applied API-side too): dry-run
    WITHOUT force routes to the state-filtered incremental engine — after
    a full sync, a dry-run previews 0 pending changes and writes nothing."""
    srv, _ = api_server
    _, body = _req(
        "POST",
        f"{srv.url}/api/v1/sync/jql",
        {"jql": "project = PROJ", "repository": "dr-repo"},
    )
    first = srv.manager.wait(body["data"]["job_id"])
    assert first["total_issues"] == N_ISSUES

    _, body = _req(
        "POST",
        f"{srv.url}/api/v1/sync/jql",
        {
            "jql": "project = PROJ",
            "repository": "dr-repo",
            "options": {"dry_run": True},
        },
    )
    preview = srv.manager.wait(body["data"]["job_id"])
    assert preview["status"] == A.COMPLETED
    # incremental preview: nothing changed upstream → 0 candidates
    assert preview["total_issues"] == 0
    assert preview["processed_issues"] == 0


def test_profile_crud_over_http(api_server):
    """Profile routes (server.go:166-172): the reference registers them
    but answers 501 NOT_IMPLEMENTED after validation
    (handlers_profiles.go:103,121); here the same routes + the same
    validation rules are live against ProfileStore."""
    srv, _ = api_server
    # validation parity with validateCreateProfileRequest
    status, body = _req("POST", f"{srv.url}/api/v1/profiles", {"name": "p"})
    assert (status, body["error"]["code"]) == (400, "VALIDATION_ERROR")
    assert "repository is required" in body["error"]["details"]
    status, body = _req(
        "POST",
        f"{srv.url}/api/v1/profiles",
        {"name": "p", "repository": "r"},
    )
    assert status == 400 and "sync method" in body["error"]["details"]
    status, body = _req(
        "POST",
        f"{srv.url}/api/v1/profiles",
        {"name": "p", "repository": "r", "jql": "project = X",
         "epic_key": "PROJ-1"},
    )
    assert status == 400 and "only one sync method" in body["error"]["details"]

    # create / list / get / update / delete round trip
    spec = {"name": "epics", "repository": "r", "epic_key": "PROJ-0"}
    status, body = _req("POST", f"{srv.url}/api/v1/profiles", spec)
    assert status == 201 and body["data"]["name"] == "epics"
    status, body = _req("POST", f"{srv.url}/api/v1/profiles", spec)
    assert (status, body["error"]["code"]) == (409, "PROFILE_EXISTS")
    status, body = _req("GET", f"{srv.url}/api/v1/profiles")
    assert status == 200 and body["data"]["count"] == 1
    status, body = _req("GET", f"{srv.url}/api/v1/profiles/epics")
    assert status == 200 and body["data"]["epic_key"] == "PROJ-0"
    status, body = _req(
        "PUT", f"{srv.url}/api/v1/profiles/epics", {"epic_key": "PROJ-20"}
    )
    assert status == 200 and body["data"]["epic_key"] == "PROJ-20"
    status, body = _req("DELETE", f"{srv.url}/api/v1/profiles/epics")
    assert status == 200
    status, body = _req("GET", f"{srv.url}/api/v1/profiles/epics")
    assert status == 404
    status, body = _req("PUT", f"{srv.url}/api/v1/profiles/ghost", {})
    assert (status, body["error"]["code"]) == (404, "PROFILE_NOT_FOUND")

    # docs route lists the full table
    status, body = _req("GET", f"{srv.url}/api/v1/docs")
    assert status == 200
    from jira_cdc_git_spark.api import API_ROUTES

    assert body["data"]["routes"] == API_ROUTES


def test_job_state_survives_server_restart(spark, mock_jira, tmp_path):
    """The reference's job objects live in Kubernetes and outlive an
    api-server restart; our journal gives the same property — a
    restarted server answers GET /jobs/{id} for pre-restart jobs, and
    new ids never collide with journaled ones."""
    from test_jira_rest import _fast_limiter

    url, _ = mock_jira
    out = str(tmp_path / "repos")
    srv = A.SyncAPIServer(spark, url, out, limiter=_fast_limiter()).start()
    try:
        _, body = _req(
            "POST",
            f"{srv.url}/api/v1/sync/jql",
            {"jql": "project = PROJ", "repository": "r1"},
        )
        jid = body["data"]["job_id"]
        done = srv.manager.wait(jid)
        assert done["status"] == A.COMPLETED
    finally:
        srv.stop()

    srv2 = A.SyncAPIServer(spark, url, out, limiter=_fast_limiter()).start()
    try:
        status, body = _req("GET", f"{srv2.url}/api/v1/jobs/{jid}")
        assert status == 200
        assert body["data"]["status"] == A.COMPLETED
        assert body["data"]["total_issues"] == N_ISSUES
        status, body = _req("GET", f"{srv2.url}/api/v1/jobs/queue/status")
        assert body["data"]["completed_jobs"] == 1
        # a new submission continues the id sequence past the journal
        _, body = _req(
            "POST",
            f"{srv2.url}/api/v1/sync/jql",
            {"jql": "project = PROJ", "repository": "r2"},
        )
        jid2 = body["data"]["job_id"]
        assert jid2 != jid
        assert srv2.manager.wait(jid2)["status"] == A.COMPLETED
    finally:
        srv2.stop()


def test_cors_preflight_and_headers(api_server):
    """withCORS parity (server.go:206-226): allow headers on every
    response, OPTIONS preflight answers 200."""
    srv, _ = api_server
    import urllib.request

    with urllib.request.urlopen(f"{srv.url}/api/v1/health", timeout=30) as r:
        assert r.headers["Access-Control-Allow-Origin"] == "*"
        assert "DELETE" in r.headers["Access-Control-Allow-Methods"]
    req = urllib.request.Request(
        f"{srv.url}/api/v1/sync/jql", method="OPTIONS"
    )
    with urllib.request.urlopen(req, timeout=30) as r:
        assert r.status == 200
        assert r.headers["Access-Control-Allow-Origin"] == "*"


def test_rate_limit_bucket():
    """The token bucket itself, on a fake clock: burst drains, refills
    at the configured rate, reports a usable Retry-After."""
    clock = {"t": 0.0}
    rl = A.TokenBucket(rate_per_sec=2.0, burst=3, clock=lambda: clock["t"])
    assert [rl.allow()[0] for _ in range(3)] == [True, True, True]
    ok, retry = rl.allow()
    assert not ok and 0 < retry <= 0.5
    clock["t"] += retry
    assert rl.allow()[0]


def test_rate_limited_server_returns_429(spark, mock_jira, tmp_path):
    """withRateLimit slot made real: a dry bucket answers 429 +
    Retry-After (the contract the repo's own REST client honors from
    the consumer side), then recovers."""
    import time as _time

    url, _ = mock_jira
    srv = A.SyncAPIServer(
        spark, url, str(tmp_path / "r"),
        rate_limit_per_sec=5, rate_limit_burst=2,
    ).start()
    try:
        codes = []
        for _ in range(4):
            status, body = _req("GET", f"{srv.url}/api/v1/health")
            codes.append(status)
        assert codes[:2] == [200, 200] and 429 in codes
        status, body = _req("GET", f"{srv.url}/api/v1/health")
        if status == 429:
            assert body["error"]["code"] == "RATE_LIMITED"
            _time.sleep(0.5)
            status, _ = _req("GET", f"{srv.url}/api/v1/health")
        assert status == 200
    finally:
        srv.stop()


# ---------------------------------------------------------------------------
# round-6: RetryPolicy parity (types.go:57-67; handleFailed,
# jirasync_controller.go:613-647) + ProgressInfo/ETA (types.go:129-152;
# status_manager.go:497-521)
# ---------------------------------------------------------------------------

def _job_manager(spark, mock_jira, tmp_path):  # noqa: F811
    from test_jira_rest import _fast_limiter

    url, state = mock_jira
    return (
        A.JobManager(spark, url, str(tmp_path / "repos"), limiter=_fast_limiter()),
        state,
    )


def test_retry_policy_transient_failure_recovers(spark, mock_jira, tmp_path):  # noqa: F811
    mgr, state = _job_manager(spark, mock_jira, tmp_path)
    try:
        # attempt 1's first page exhausts the client's 5 retries (6
        # requests) and raises; every later request succeeds — the
        # flaky-network sync the reference's RetryPolicy exists for
        state["fail_at"] = set(range(1, 7))
        job = mgr.submit(
            "jql",
            "project = PROJ",
            "retry-ok",
            {
                "retry_policy": {
                    "maxRetries": 2,
                    "initialDelay": 0.2,
                    "backoffMultiplier": 2.0,
                }
            },
        )
        done = mgr.wait(job["job_id"], timeout_s=180)
        assert done["status"] == "completed"
        assert done["retry_count"] == 1
        assert [a["outcome"] for a in done["attempts"]] == [
            "failed",
            "completed",
        ]
        assert done["attempts"][0]["error"].startswith("HTTPError")
        assert any("retrying (attempt 1/2)" in line for line in done["logs"])
        assert done["total_issues"] == N_ISSUES
    finally:
        mgr.shutdown()


def test_retry_policy_exhaustion_is_terminal_with_growing_gaps(
    spark, mock_jira, tmp_path  # noqa: F811
):
    mgr, state = _job_manager(spark, mock_jira, tmp_path)
    try:
        state["fail_at"] = set(range(1, 1000))  # permanent outage
        job = mgr.submit(
            "jql",
            "project = PROJ",
            "retry-dead",
            {
                "retry_policy": {
                    "maxRetries": 2,
                    "initialDelay": 0.2,
                    "backoffMultiplier": 2.0,
                }
            },
        )
        done = mgr.wait(job["job_id"], timeout_s=180)
        assert done["status"] == "failed"
        assert done["retry_count"] == 2
        assert [a["outcome"] for a in done["attempts"]] == ["failed"] * 3
        logs = "\n".join(done["logs"])
        # backoff curve: initialDelay, then ×multiplier per retry
        assert "(attempt 1/2) in 0.20s" in logs
        assert "(attempt 2/2) in 0.40s" in logs
        assert len(done["errors"]) == 3
    finally:
        mgr.shutdown()


def test_no_retry_policy_fails_immediately(spark, mock_jira, tmp_path):  # noqa: F811
    mgr, state = _job_manager(spark, mock_jira, tmp_path)
    try:
        state["fail_at"] = set(range(1, 1000))
        job = mgr.submit("jql", "project = PROJ", "no-retry", {})
        done = mgr.wait(job["job_id"], timeout_s=120)
        assert done["status"] == "failed"
        assert done["retry_count"] == 0
        assert [a["outcome"] for a in done["attempts"]] == ["failed"]
    finally:
        mgr.shutdown()


def test_progress_and_eta_on_multibatch_sync(spark, mock_jira, tmp_path):  # noqa: F811
    mgr, _ = _job_manager(spark, mock_jira, tmp_path)
    hist = []
    orig = mgr._set_progress

    def record(job, total, completed, op, stage):
        orig(job, total, completed, op, stage)
        hist.append(dict(job["progress"]))

    mgr._set_progress = record
    try:
        job = mgr.submit(
            "jql",
            "project = PROJ",
            "progress-repo",
            {"options": {"batch_size": 100}},
        )
        done = mgr.wait(job["job_id"], timeout_s=300)
        assert done["status"] == "completed"
        # monotone percentage across the journaled updates, ending at 100
        pcts = [h["percentage"] for h in hist]
        assert pcts == sorted(pcts)
        assert done["progress"]["percentage"] == 100
        assert done["progress"]["stage"] == "Completed"
        # the per-chunk updates carry a positive rate and a sane ETA
        mids = [h for h in hist if 0 < h["percentage"] < 100]
        assert mids, f"no intermediate progress recorded: {pcts}"
        for h in mids:
            assert h["processing_rate"] > 0
            assert h["estimated_completion"] is not None
            assert h["total_operations"] == N_ISSUES
        # GET surface carries the same shape
        got = mgr.get(job["job_id"])["progress"]
        assert set(got) == {
            "percentage",
            "current_operation",
            "total_operations",
            "completed_operations",
            "estimated_completion",
            "processing_rate",
            "stage",
        }
    finally:
        mgr.shutdown()


def test_watch_and_follow_long_poll(api_server):
    """WatchJob parity (pkg/jobs/scheduler.go:152-199): the watch route
    blocks until the status moves past the client's last_status and
    returns a JobMonitor-shaped event; logs?follow blocks until new
    lines exist past `since`. Driven against the live threaded server
    while a real job runs."""
    srv, _ = api_server
    status, body = _req(
        "POST",
        f"{srv.url}/api/v1/sync/jql",
        {"jql": "project = PROJ", "repository": "r1"},
    )
    assert status in (200, 201, 202)
    jid = body["data"]["job_id"]

    # watch: block until the job leaves 'pending'; then follow it to a
    # terminal state — each poll is one JobMonitor event
    seen = []
    last = "pending"
    for _ in range(40):
        st, env = _req(
            "GET",
            f"{srv.url}/api/v1/jobs/{jid}/watch?last_status={last}&timeout=5",
        )
        assert st == 200
        ev = env["data"]
        assert ev["job_id"] == jid and "progress" in ev and "last_check" in ev
        seen.append(ev["status"])
        if ev["status"] in ("completed", "failed", "cancelled"):
            break
        last = ev["status"]
    assert seen[-1] == "completed"
    assert seen[0] != "pending" or len(set(seen)) > 1  # it moved

    # follow: since=next_since on a terminal job returns immediately
    # with no new lines; since=0 returns the full log
    st, env = _req("GET", f"{srv.url}/api/v1/jobs/{jid}/logs?since=0")
    full = env["data"]
    assert st == 200 and full["logs"]
    st, env = _req(
        "GET",
        f"{srv.url}/api/v1/jobs/{jid}/logs"
        f"?since={full['next_since']}&follow=true&timeout=2",
    )
    tail = env["data"]
    assert st == 200
    assert tail["logs"] == []
    assert tail["status"] == "completed"

    # unknown job 404s through the long-poll path too
    st, _ = _req("GET", f"{srv.url}/api/v1/jobs/nope/watch?timeout=1")
    assert st == 404


# ---------------------------------------------------------------------------
# round-7: worker pool (MaxConcurrency parity) + /metrics exposition
# ---------------------------------------------------------------------------

def _patched_manager(spark, tmp_path, execute):
    """JobManager with _execute stubbed (no JIRA/Spark I/O) — isolates
    the queue/worker-pool scheduling behavior."""
    mgr = A.JobManager.__new__(A.JobManager)
    import threading as _t

    mgr.spark = spark
    mgr.base_url = "http://unused"
    mgr.out_root = str(tmp_path / "pool")
    mgr.token = None
    mgr.limiter = None
    mgr._jobs = {}
    mgr._order = []
    mgr._lock = _t.Lock()
    mgr._wake = _t.Condition(mgr._lock)
    mgr._n = 0
    mgr._stop = False
    mgr._execute = execute
    mgr._workers = [
        _t.Thread(target=mgr._run_loop, daemon=True) for _ in range(10)
    ]
    for w in mgr._workers:
        w.start()
    return mgr


def test_worker_pool_overlaps_jobs_across_repos(spark, tmp_path):
    """pkg/jobs MaxConcurrency posture: two jobs targeting DIFFERENT
    repositories run concurrently (the r6 verdict's single-worker gap).
    Proven with a rendezvous: each job blocks until the other has
    started, so completion is impossible unless they overlap."""
    import threading as _t

    started = {"n": 0}
    both_started = _t.Event()
    gate = _t.Lock()

    def execute(job):
        with gate:
            started["n"] += 1
            if started["n"] >= 2:
                both_started.set()
        assert both_started.wait(timeout=30), "jobs never overlapped"
        return {"total": 1, "processed": 1, "successful": 1, "failed": 0}

    mgr = _patched_manager(spark, tmp_path, execute)
    try:
        j1 = mgr.submit("jql", "project = A", "repo-a", {})
        j2 = mgr.submit("jql", "project = B", "repo-b", {})
        assert mgr.wait(j1["job_id"])["status"] == A.COMPLETED
        assert mgr.wait(j2["job_id"])["status"] == A.COMPLETED
    finally:
        mgr.shutdown()


def test_worker_pool_serializes_same_repo(spark, tmp_path):
    """Jobs for the SAME repository must not overlap (the sync-state
    store is single-writer per repo) and must run in FIFO order."""
    import threading as _t
    import time as _time

    intervals = []
    ilock = _t.Lock()

    def execute(job):
        t0 = _time.monotonic()
        _time.sleep(0.3)
        with ilock:
            intervals.append((job["job_id"], t0, _time.monotonic()))
        return {"total": 1, "processed": 1, "successful": 1, "failed": 0}

    mgr = _patched_manager(spark, tmp_path, execute)
    try:
        j1 = mgr.submit("jql", "project = A", "same-repo", {})
        j2 = mgr.submit("jql", "project = A", "same-repo", {})
        assert mgr.wait(j1["job_id"])["status"] == A.COMPLETED
        assert mgr.wait(j2["job_id"])["status"] == A.COMPLETED
    finally:
        mgr.shutdown()
    assert len(intervals) == 2
    by_id = sorted(intervals)  # job ids are sequence-ordered
    # FIFO: first-submitted finishes before second starts (no overlap)
    assert by_id[0][2] <= by_id[1][1] + 1e-6


def test_metrics_route_prometheus_exposition(api_server):
    """GET /metrics — text exposition of the reference's metric registry
    (initMetrics, jirasync_controller.go:99-181)."""
    srv, _ = api_server
    _, body = _req(
        "POST",
        f"{srv.url}/api/v1/sync/jql",
        {"jql": "project = PROJ", "repository": "metrics-repo"},
    )
    srv.manager.wait(body["data"]["job_id"])
    r = urllib.request.Request(f"{srv.url}/metrics")
    with urllib.request.urlopen(r, timeout=30) as resp:
        assert resp.status == 200
        assert resp.headers["Content-Type"].startswith("text/plain")
        text = resp.read().decode()
    assert 'jirasync_jobs_total{phase="completed"} 1' in text
    assert 'jirasync_sync_issues_total{result="successful"}' in text
    assert "jirasync_retries_total 0" in text
    assert 'jirasync_job_duration_seconds_count{type="jql"} 1' in text


def test_profile_ops_verbs_over_http(api_server):
    """r8: the FileProfileManager ops verbs (manager.go:372-645) over
    HTTP — duplicate resets usage, rename preserves it, search/similar
    run the plans.py DataFrame queries, backup/restore round-trip,
    validate/repair report and prune invalid profiles."""
    srv, _ = api_server
    mk = lambda n, **kw: {  # noqa: E731
        "name": n, "repository": "repo-a", "jql": f"project = {n.upper()}",
        "tags": ["epic"], "concurrency": 5, "rate_limit": "500ms",
        "incremental": True, "include_links": True, **kw,
    }
    assert _req("POST", f"{srv.url}/api/v1/profiles", mk("base"))[0] == 201
    assert _req("POST", f"{srv.url}/api/v1/profiles", mk("twin"))[0] == 201

    # duplicate: fresh usage stats, 'Copy of' description
    status, body = _req(
        "POST", f"{srv.url}/api/v1/profiles/base/duplicate",
        {"target_name": "base-copy"},
    )
    assert status == 200 and body["data"]["times_used"] == 0
    assert body["data"]["description"].startswith("Copy of")
    status, body = _req(
        "POST", f"{srv.url}/api/v1/profiles/base/duplicate",
        {"target_name": "base-copy"},
    )
    assert (status, body["error"]["code"]) == (409, "PROFILE_CONFLICT")
    status, body = _req(
        "POST", f"{srv.url}/api/v1/profiles/ghost/duplicate",
        {"target_name": "x"},
    )
    assert status == 404

    # rename: record moves, old key gone
    status, body = _req(
        "POST", f"{srv.url}/api/v1/profiles/base-copy/rename",
        {"new_name": "base2"},
    )
    assert status == 200 and body["data"]["name"] == "base2"
    assert _req("GET", f"{srv.url}/api/v1/profiles/base-copy")[0] == 404
    status, body = _req(
        "POST", f"{srv.url}/api/v1/profiles/base2/rename",
        {"new_name": "bad name!"},
    )
    assert (status, body["error"]["code"]) == (400, "VALIDATION_ERROR")

    # search: free-text and repository filters
    status, body = _req("GET", f"{srv.url}/api/v1/profiles/search?q=twin")
    assert status == 200
    assert [p["name"] for p in body["data"]["profiles"]] == ["twin"]
    status, body = _req(
        "GET", f"{srv.url}/api/v1/profiles/search?repository=repo-a"
    )
    assert body["data"]["count"] == 3

    # similar: base2 (the duplicate) shares everything incl. jql -> 1.0;
    # twin differs only in the jql's last word (2/3 overlap) -> 0.9
    status, body = _req("GET", f"{srv.url}/api/v1/profiles/base/similar")
    assert status == 200
    sims = {p["name"]: p["similarity"] for p in body["data"]["profiles"]}
    assert sims.get("base2") == 1.0
    assert sims.get("twin") == 0.9
    assert _req("GET", f"{srv.url}/api/v1/profiles/ghost/similar")[0] == 404

    # backup -> mutate -> restore
    assert _req("POST", f"{srv.url}/api/v1/profiles/backup")[0] == 200
    assert _req("DELETE", f"{srv.url}/api/v1/profiles/twin")[0] == 200
    assert _req("POST", f"{srv.url}/api/v1/profiles/restore")[0] == 200
    assert _req("GET", f"{srv.url}/api/v1/profiles/twin")[0] == 200

    # validate + repair: an invalid profile (two sync modes) is pruned
    srv.profiles.create(
        {"name": "broken", "jql": "project = X", "epic_key": "E-1"}
    )
    status, body = _req("GET", f"{srv.url}/api/v1/profiles/validate")
    assert status == 200 and body["data"]["valid"] is False
    status, body = _req("POST", f"{srv.url}/api/v1/profiles/repair")
    assert status == 200 and body["data"]["removed"] == ["broken"]
    status, body = _req("GET", f"{srv.url}/api/v1/profiles/validate")
    assert status == 200 and body["data"]["valid"] is True


# ---------------------------------------------------------------------------
# X-Sync-Mode / X-Prefer-CRD header dispatch
# (handlers_sync_enhanced.go:62-185, 315-330; crd_converter.go)
# ---------------------------------------------------------------------------

def _req_h(method, url, body=None, headers=None):
    data = json.dumps(body).encode() if body is not None else None
    r = urllib.request.Request(url, data=data, method=method)
    if data:
        r.add_header("Content-Type", "application/json")
    for k, v in (headers or {}).items():
        r.add_header(k, v)
    try:
        with urllib.request.urlopen(r, timeout=120) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_crd_mode_header_creates_cr_not_job(api_server, tmp_path):
    """X-Sync-Mode: crd emits a JIRASync CR document instead of
    launching a job (HandleEnhancedSingleSync's SyncModeCRD arm)."""
    import glob
    import os

    import yaml

    srv, _ = api_server
    status, body = _req_h(
        "POST",
        f"{srv.url}/api/v1/sync/single",
        {
            "issue_key": "PROJ-7",
            "repository": "https://github.com/org/repo.git",
            "options": {"incremental": True, "concurrency": 3},
        },
        headers={"X-Sync-Mode": "crd"},
    )
    assert status == 202 and body["success"]
    data = body["data"]
    assert data["status"] == "crd-created"
    assert data["job_id"] == f"crd-{data['crd_name']}"
    assert data["crd_name"].startswith("jirasync-single-")
    assert data["crd_namespace"] == "default"
    assert data["mode"] == "crd"
    info = data["conversion_info"]
    assert info["original_request_type"] == "SingleSyncRequest"
    assert info["crd_fields"]["syncType"] == "single"
    assert info["annotations"]["sync.jira.io/source"] == "api-single-sync"

    # no job was queued
    status, q = _req_h("GET", f"{srv.url}/api/v1/jobs/queue/status")
    assert q["data"]["total_jobs"] == 0

    # the CR document landed in the store with spec + labels intact
    paths = glob.glob(
        os.path.join(srv.manager.out_root, "crds", "default", "*.yaml")
    )
    assert len(paths) == 1
    cr = yaml.safe_load(open(paths[0]))
    assert cr["kind"] == "JIRASync"
    assert cr["apiVersion"] == "sync.jira.io/v1alpha1"
    assert cr["metadata"]["name"] == data["crd_name"]
    assert cr["spec"]["target"]["issueKeys"] == ["PROJ-7"]
    assert cr["spec"]["destination"]["branch"] == "main"
    assert cr["spec"]["retryPolicy"]["maxRetries"] == 3
    assert cr["spec"]["labels"]["sync.jira.io/incremental"] == "true"
    assert cr["spec"]["labels"]["sync.jira.io/concurrency"] == "3"


def test_prefer_crd_header_and_jql_fields(api_server):
    """X-Prefer-CRD: true routes to CRD mode when no X-Sync-Mode is
    given (determineSyncMode's second probe)."""
    srv, _ = api_server
    status, body = _req_h(
        "POST",
        f"{srv.url}/api/v1/sync/jql",
        {
            "jql": "project = PROJ AND status = Open",
            "repository": "git@github.com:org/repo.git",
        },
        headers={"X-Prefer-CRD": "true"},
    )
    assert status == 202
    data = body["data"]
    assert data["status"] == "crd-created"
    assert data["crd_name"].startswith("jirasync-jql-")
    info = data["conversion_info"]
    assert info["original_request_type"] == "JQLSyncRequest"
    assert info["crd_fields"]["jqlQuery"] == "project = PROJ AND status = Open"
    assert (
        info["annotations"]["sync.jira.io/jql-query"]
        == "project = PROJ AND status = Open"
    )


def test_crd_mode_strict_validation_500(api_server):
    """CRD mode applies the converter's STRICTER checks: a repository
    that passes the route validator (non-empty) but is not an
    HTTPS/SSH URL fails conversion -> 500 CRD_SYNC_ERROR."""
    srv, _ = api_server
    status, body = _req_h(
        "POST",
        f"{srv.url}/api/v1/sync/jql",
        {"jql": "project = PROJ", "repository": "main-repo"},
        headers={"X-Sync-Mode": "crd"},
    )
    assert status == 500
    assert body["error"]["code"] == "CRD_SYNC_ERROR"
    assert "invalid repository URL" in body["error"]["details"]

    # batch cap of 100 is converter-only too
    status, body = _req_h(
        "POST",
        f"{srv.url}/api/v1/sync/batch",
        {
            "issue_keys": [f"PROJ-{i}" for i in range(1, 102)],
            "repository": "https://github.com/org/repo.git",
        },
        headers={"X-Sync-Mode": "crd"},
    )
    assert status == 500
    assert "too many issue keys: 101" in body["error"]["details"]


def test_hybrid_mode_falls_back_to_direct_job(api_server):
    """SyncModeHybrid: CRD conversion fails (local-path repo) -> the
    request falls back to the v0.4.0 direct-job path."""
    srv, _ = api_server
    status, body = _req_h(
        "POST",
        f"{srv.url}/api/v1/sync/jql",
        {"jql": "project = PROJ", "repository": "main-repo"},
        headers={"X-Sync-Mode": "hybrid"},
    )
    assert status == 202
    assert body["data"]["job_id"].startswith("sync-job-")
    srv.manager.wait(body["data"]["job_id"])

    # hybrid with a CONVERTIBLE request goes CRD
    status, body = _req_h(
        "POST",
        f"{srv.url}/api/v1/sync/jql",
        {"jql": "project = PROJ", "repository": "https://github.com/o/r"},
        headers={"X-Sync-Mode": "hybrid"},
    )
    assert status == 202
    assert body["data"]["status"] == "crd-created"
    assert body["data"]["mode"] == "hybrid"


def test_invalid_sync_mode_header_falls_through(api_server):
    """determineSyncMode ignores unknown X-Sync-Mode values (no 400) —
    falls through to the server default (direct-job here)."""
    srv, _ = api_server
    status, body = _req_h(
        "POST",
        f"{srv.url}/api/v1/sync/jql",
        {"jql": "project = PROJ", "repository": "main-repo"},
        headers={"X-Sync-Mode": "bogus-mode"},
    )
    assert status == 202
    assert body["data"]["job_id"].startswith("sync-job-")
    srv.manager.wait(body["data"]["job_id"])


def test_job_list_printer_columns(api_server):
    """GET /jobs rows carry the jirasync CRD's printer columns (Type/
    Phase/Progress/Duration/Age) plus a conditions_summary cell that is
    BYTE-DERIVED from the row's own condition list via the canonical
    transition-table order — the API list view matches what
    `kubectl get jirasyncs -o wide` shows (r10 verdict task 5)."""
    from jira_cdc_git_spark import status_conditions as SC

    srv, _ = api_server
    status, body = _req(
        "POST",
        f"{srv.url}/api/v1/sync/jql",
        {"jql": "project = PROJ", "repository": "main-repo"},
    )
    assert status == 202
    srv.manager.wait(body["data"]["job_id"])
    status, body = _req("GET", f"{srv.url}/api/v1/jobs")
    assert status == 200
    assert body["data"]["jobs"]
    for row in body["data"]["jobs"]:
        pc = row["printer_columns"]
        assert set(pc) == {
            "type", "phase", "progress", "duration", "age", "health",
            "conditions",
        }
        assert pc["type"] == row["type"]
        assert pc["phase"] == row["status"]
        # the summary is exactly the canonical-order projection of the
        # row's condition list — recompute it from the transition table
        assert row["conditions_summary"] == SC.conditions_summary(
            row["conditions"]
        )
        types = [c["type"] for c in row["conditions"]]
        order = [t for t in SC.CONDITION_ORDER if t in types]
        assert row["conditions_summary"] == ",".join(
            f"{t}={dict((c['type'], c['status']) for c in row['conditions'])[t]}"
            for t in order
        )
    done = [
        r for r in body["data"]["jobs"] if r["status"] == "completed"
    ]
    assert done, "the finished job must appear in the list"
    for row in done:
        assert "Ready=True" in row["conditions_summary"]
        assert "Processing=False" in row["conditions_summary"]
        assert row["printer_columns"]["duration"] is not None
        d, t = row["printer_columns"]["progress"].split("/")
        assert d == t != "0"


def test_invalid_server_default_sync_mode_rejected():
    """The reference's mode switch rejects unknown modes in its default
    arm (500 INVALID_MODE); our constructor is the equivalent choke
    point for the SERVER default — a bogus value must fail fast, not be
    silently treated as CRD-ish by _crd_dispatch (r10 advice)."""
    import pytest

    from jira_cdc_git_spark.api import SyncAPIServer

    with pytest.raises(ValueError, match="sync_mode"):
        SyncAPIServer(None, "http://unused", "/tmp/unused", sync_mode="bogus")
