"""CLI facade tests — the reference's `jira-sync` verb surface
(internal/cli/sync.go flag validation, query/profile/saved flows)
driven end-to-end through jira_cdc_git_spark.cli.main()."""

import json

import pytest

from jira_cdc_git_spark import cli

from test_jira_rest import mock_jira  # noqa: F401  (fixture reuse)


def run(capsys, *argv):
    rc = cli.main(list(argv))
    out = capsys.readouterr()
    return rc, out.out, out.err


# ---------- flag validation (sync.go:96-107 parity) ----------


def test_sync_requires_exactly_one_selector():
    with pytest.raises(SystemExit):
        cli.main(["sync", "--base-url", "x", "--out", "y"])
    with pytest.raises(SystemExit):
        cli.main([
            "sync", "--jql", "project = P", "--issues", "P-1",
            "--base-url", "x", "--out", "y",
        ])


def test_sync_incremental_xor_force():
    with pytest.raises(SystemExit):
        cli.main([
            "sync", "--jql", "project = P", "--base-url", "x", "--out", "y",
            "--incremental", "--force",
        ])


def test_issues_list_is_validated():
    with pytest.raises(SystemExit):
        cli._issues_to_jql("lowercase-1")
    assert cli._issues_to_jql(" PROJ-1 , PROJ-2 ") == "key in (PROJ-1, PROJ-2)"


# ---------- query / validate / template ----------


def test_query_template_runs(capsys, spark, sf_dir):
    rc, out, err = run(
        capsys, "query", "--template", "project-active-issues",
        "--param", "project=MEM", "--data", sf_dir, "--limit", "5",
    )
    assert rc == 0
    rows = [json.loads(l) for l in out.strip().splitlines()]
    assert rows and all(r["project_key"] == "MEM" for r in rows)
    assert all(r["status"]["name"] not in ("Closed", "Done") for r in rows)


def test_query_raw_jql(capsys, spark, sf_dir):
    rc, out, _ = run(
        capsys, "query", "--jql", 'project = MEM ORDER BY key ASC',
        "--data", sf_dir, "--limit", "3",
    )
    assert rc == 0
    assert len(out.strip().splitlines()) == 3


def test_validate_exit_codes(capsys):
    rc, _, _ = run(capsys, "validate", "--jql", "project = P AND status = Open")
    assert rc == 0
    rc, _, err = run(capsys, "validate", "--jql", "project = (unbalanced")
    assert rc == 1 and err.strip()


def test_template_list(capsys):
    rc, out, _ = run(capsys, "template")
    assert rc == 0
    assert "project-active-issues" in out and "epic-all-issues" in out


# ---------- profile / saved stores ----------


def test_profile_roundtrip(capsys, tmp_path):
    store = str(tmp_path / "profiles")
    spec = json.dumps({"name": "p1", "jql_template": "project-all-issues"})
    assert cli.main(["profile", "create", "--store", store, "--spec", spec]) == 0
    rc, out, _ = run(capsys, "profile", "list", "--store", store)
    assert rc == 0 and "p1" in out
    rc, out, _ = run(capsys, "profile", "show", "--store", store, "--name", "p1")
    assert json.loads(out)["name"] == "p1"
    assert cli.main(["profile", "delete", "--store", store, "--name", "p1"]) == 0
    rc, out, _ = run(capsys, "profile", "list", "--store", store)
    assert "p1" not in out


def test_saved_query_save_list_run(capsys, tmp_path, spark, sf_dir):
    store = str(tmp_path / "saved")
    assert cli.main([
        "saved", "save", "--store", store, "--name", "active",
        "--jql", 'project = MEM AND status NOT IN ("Closed", "Done")',
        "--description", "active MEM",
    ]) == 0
    rc, out, _ = run(capsys, "saved", "list", "--store", store)
    assert rc == 0 and "active" in out
    rc, out, _ = run(
        capsys, "saved", "run", "--store", store, "--name", "active",
        "--data", sf_dir, "--limit", "4",
    )
    assert rc == 0
    rows = [json.loads(l) for l in out.strip().splitlines()]
    assert rows and all(r["project_key"] == "MEM" for r in rows)
    # usage bumped
    from jira_cdc_git_spark.query_store import SavedQueryStore

    assert SavedQueryStore(store).get("active")["usage_count"] == 1


# ---------- sync against the mock server ----------


def test_cli_sync_end_to_end(capsys, spark, tmp_path, mock_jira):  # noqa: F811
    url, _ = mock_jira
    out_dir = str(tmp_path / "out")
    rc, out, _ = run(
        capsys, "sync", "--jql", "project = PROJ",
        "--base-url", url, "--out", out_dir, "--incremental",
    )
    assert rc == 0
    result = json.loads(out.strip().splitlines()[-1])
    assert result["total"] > 0 and result["new"] == result["total"]
    from jira_cdc_git_spark.sinks import latest_issues

    assert latest_issues(spark, f"{out_dir}/issues").count() == result["total"]
    # idempotent re-run syncs nothing
    rc, out, _ = run(
        capsys, "sync", "--jql", "project = PROJ",
        "--base-url", url, "--out", out_dir, "--incremental",
    )
    assert json.loads(out.strip().splitlines()[-1])["total"] == 0


def test_version(capsys):
    rc, out, _ = run(capsys, "version")
    assert rc == 0 and out.strip() == cli.ENGINE_VERSION


def test_cli_sync_plain_mode_is_full_sweep(capsys, spark, tmp_path, mock_jira):  # noqa: F811
    """No mode flag = the reference's plain BatchSyncEngine: every run
    syncs everything the JQL matches (no state filtering)."""
    url, _ = mock_jira
    out_dir = str(tmp_path / "out")
    for _ in range(2):
        rc, out, _ = run(
            capsys, "sync", "--jql", "project = PROJ",
            "--base-url", url, "--out", out_dir,
        )
        assert rc == 0
        result = json.loads(out.strip().splitlines()[-1])
        assert result["total"] > 0
