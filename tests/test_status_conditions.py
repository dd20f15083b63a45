"""StatusManager condition semantics (status_manager.go parity):
update-in-place transition rule, lastTransitionTime preservation,
health rollup tiers, and the phase/condition consistency validator —
plus the e2e transition table across submit -> running -> complete /
fail -> retry on a real JobManager worker pool (r8 verdict task 7)."""

from __future__ import annotations

import jira_cdc_git_spark.status_conditions as SC


def test_set_condition_bumps_ltt_only_on_status_or_reason_change():
    conds: list[dict] = []
    SC.set_condition(conds, SC.CONDITION_PROCESSING, True,
                     SC.REASON_PROCESSING, "fetch (10% complete)", "t1")
    assert conds[0]["last_transition_time"] == "t1"
    # same status+reason, new message, later clock: LTT preserved
    SC.set_condition(conds, SC.CONDITION_PROCESSING, True,
                     SC.REASON_PROCESSING, "fetch (90% complete)", "t2")
    assert len(conds) == 1
    assert conds[0]["message"] == "fetch (90% complete)"
    assert conds[0]["last_transition_time"] == "t1"
    # status flips: LTT bumps (this IS the transition)
    SC.set_condition(conds, SC.CONDITION_PROCESSING, False,
                     SC.REASON_COMPLETED, "done", "t3")
    assert conds[0]["last_transition_time"] == "t3"
    # reason-only change also bumps (status_manager.go:434)
    SC.set_condition(conds, SC.CONDITION_PROCESSING, False,
                     SC.REASON_FAILED, "failed", "t4")
    assert conds[0]["last_transition_time"] == "t4"
    # a different type appends instead of replacing
    SC.set_condition(conds, SC.CONDITION_READY, True,
                     SC.REASON_COMPLETED, "ready", "t5")
    assert [c["type"] for c in conds] == [
        SC.CONDITION_PROCESSING, SC.CONDITION_READY,
    ]


def test_calculate_health_tiers():
    conds: list[dict] = []
    assert SC.calculate_health(conds, 0) == SC.HEALTH_UNKNOWN
    SC.set_condition(conds, SC.CONDITION_PROCESSING, True,
                     SC.REASON_PROCESSING, "m", "t")
    assert SC.calculate_health(conds, 0) == SC.HEALTH_HEALTHY
    # retry pile-up degrades even while processing
    assert SC.calculate_health(conds, SC.DEGRADED_RETRIES) == SC.HEALTH_DEGRADED
    # ... unless the error was cleared (ClearError zeroes RetryCount)
    assert (
        SC.calculate_health(conds, SC.DEGRADED_RETRIES, error_cleared=True)
        == SC.HEALTH_HEALTHY
    )
    # Failed=True dominates everything
    SC.set_condition(conds, SC.CONDITION_FAILED, True,
                     SC.REASON_JOB_ERROR, "m", "t")
    assert SC.calculate_health(conds, 0) == SC.HEALTH_UNHEALTHY
    # Failed=False + Ready=True is plain healthy
    conds = []
    SC.set_condition(conds, SC.CONDITION_FAILED, False,
                     SC.REASON_COMPLETED, "m", "t")
    SC.set_condition(conds, SC.CONDITION_READY, True,
                     SC.REASON_COMPLETED, "m", "t")
    assert SC.calculate_health(conds, 0) == SC.HEALTH_HEALTHY


def test_validate_status_consistency_checks():
    ok = {
        "status": "completed",
        "conditions": [],
        "progress": {"percentage": 100, "total_operations": 5,
                     "completed_operations": 5},
    }
    issues = SC.validate_status(ok)
    assert issues == ["Phase is Completed but Ready condition is not True"]
    SC.set_condition(ok["conditions"], SC.CONDITION_READY, True,
                     SC.REASON_COMPLETED, "m", "t")
    assert SC.validate_status(ok) == []
    bad = {
        "status": "failed",
        "conditions": [],
        "progress": {"percentage": 120, "total_operations": 3,
                     "completed_operations": 4},
    }
    issues = SC.validate_status(bad)
    assert "Phase is Failed but Failed condition is not True" in issues
    assert "Progress percentage must be between 0 and 100" in issues
    assert "Completed operations cannot exceed total operations" in issues


def _cond(job, ctype):
    return next(c for c in job["conditions"] if c["type"] == ctype)


def test_job_conditions_transition_table(spark, tmp_path):
    """E2E transitions on a real worker pool with a stubbed execute:
    submit (Validated/Initializing) -> running (Processing) ->
    completed (Ready + ClearError) for a healthy job; Failed/Retrying ->
    recovery for a flaky one; Failed/JobError terminal for a dead one.
    Each row's health + ValidateStatus consistency is asserted at its
    terminal state."""
    from tests.test_api import _patched_manager

    calls = {"flaky": 0}

    def execute(job):
        if job["repository"] == "dead":
            raise RuntimeError("boom")
        if job["repository"] == "flaky":
            calls["flaky"] += 1
            if calls["flaky"] == 1:
                raise RuntimeError("transient")
        return {"total": 3, "processed": 3, "successful": 3, "failed": 0}

    mgr = _patched_manager(spark, tmp_path, execute)
    try:
        ok = mgr.submit("jql", "project = PROJ", "okrepo", {})
        # submit-time conditions visible immediately
        assert _cond(ok, SC.CONDITION_VALIDATED)["status"] == "True"
        assert _cond(ok, SC.CONDITION_VALIDATED)["reason"] == SC.REASON_VALIDATING
        assert _cond(ok, SC.CONDITION_READY)["status"] == "False"
        assert _cond(ok, SC.CONDITION_READY)["reason"] == SC.REASON_INITIALIZING

        flaky = mgr.submit(
            "jql", "project = PROJ", "flaky",
            {"retry_policy": {"maxRetries": 2, "initialDelay": 0.05,
                              "backoffMultiplier": 2.0}},
        )
        dead = mgr.submit("jql", "project = PROJ", "dead", {})

        ok = mgr.wait(ok["job_id"], timeout_s=60)
        assert ok["status"] == "completed"
        assert _cond(ok, SC.CONDITION_READY)["status"] == "True"
        assert _cond(ok, SC.CONDITION_READY)["reason"] == SC.REASON_COMPLETED
        assert _cond(ok, SC.CONDITION_PROCESSING)["status"] == "False"
        assert _cond(ok, SC.CONDITION_FAILED)["status"] == "False"
        assert ok["health"] == SC.HEALTH_HEALTHY
        assert SC.validate_status(ok) == []

        flaky = mgr.wait(flaky["job_id"], timeout_s=60)
        assert flaky["status"] == "completed"
        # the transient failure left a Retrying transition in history...
        assert flaky["retry_count"] == 1
        # ...but recovery cleared it: Failed=False, health Healthy
        assert _cond(flaky, SC.CONDITION_FAILED)["status"] == "False"
        assert _cond(flaky, SC.CONDITION_READY)["status"] == "True"
        assert flaky["health"] == SC.HEALTH_HEALTHY
        assert flaky["error_cleared"] is True
        assert SC.validate_status(flaky) == []

        dead = mgr.wait(dead["job_id"], timeout_s=60)
        assert dead["status"] == "failed"
        fc = _cond(dead, SC.CONDITION_FAILED)
        assert fc["status"] == "True" and fc["reason"] == SC.REASON_JOB_ERROR
        assert _cond(dead, SC.CONDITION_READY)["status"] == "False"
        assert _cond(dead, SC.CONDITION_READY)["reason"] == SC.REASON_FAILED
        assert _cond(dead, SC.CONDITION_PROCESSING)["status"] == "False"
        assert dead["health"] == SC.HEALTH_UNHEALTHY
        assert SC.validate_status(dead) == []
    finally:
        mgr.shutdown()


def test_retrying_job_reports_unhealthy_then_degraded(spark, tmp_path):
    """Mid-retry posture: after a failure with retries left the row is
    Failed=True/Retrying (Unhealthy); once retry_count reaches
    DEGRADED_RETRIES with Failed cleared the rollup reads Degraded —
    the status_manager.go:459-483 tier order."""
    from tests.test_api import _patched_manager

    def execute(job):
        raise RuntimeError("always down")

    mgr = _patched_manager(spark, tmp_path, execute)
    try:
        job = mgr.submit(
            "jql", "project = PROJ", "down",
            {"retry_policy": {"maxRetries": 1, "initialDelay": 30.0,
                              "backoffMultiplier": 1.0}},
        )
        jid = job["job_id"]
        import time as _time

        deadline = _time.time() + 30
        row = mgr.get(jid)
        while _time.time() < deadline:
            row = mgr.get(jid)
            if row["retry_count"] == 1 and row["status"] == "pending":
                break
            _time.sleep(0.05)
        fc = _cond(row, SC.CONDITION_FAILED)
        assert fc["status"] == "True" and fc["reason"] == SC.REASON_RETRYING
        assert row["health"] == SC.HEALTH_UNHEALTHY
        assert _cond(row, SC.CONDITION_PROCESSING)["status"] == "False"
    finally:
        mgr.shutdown()


def test_job_response_surfaces_status_issues():
    """GET /jobs/{id} rows carry the ValidateStatus findings; a
    consistent row reports an empty list, a torn one names the drift
    (pure shape test — no Spark, no HTTP)."""
    from jira_cdc_git_spark.api import _job_response

    ok = {
        "job_id": "j1", "status": "completed", "logs": ["x"],
        "conditions": [], "progress": {"percentage": 100},
    }
    SC.set_condition(ok["conditions"], SC.CONDITION_READY, True,
                     SC.REASON_COMPLETED, "m", "t")
    resp = _job_response(ok)
    assert "logs" not in resp
    assert resp["status_issues"] == []
    torn = dict(ok, conditions=[])
    assert _job_response(torn)["status_issues"] == [
        "Phase is Completed but Ready condition is not True"
    ]
