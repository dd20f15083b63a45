"""Profile persistence round-trips (A8/A9 CRUD; pkg/profile/manager.go
FileProfileManager parity)."""

from datetime import datetime

import pytest

from jira_cdc_git_spark import plans
from jira_cdc_git_spark.profile_store import ProfileStore

T0 = datetime(2026, 1, 1, 12, 0, 0)


@pytest.fixture
def store(tmp_path):
    return ProfileStore(str(tmp_path))


def _mk(name, **kw):
    return {"name": name, "description": f"d-{name}",
            "jql": f"project = {name.upper()}", "tags": ["t"], **kw}


def test_crud_round_trip(store):
    store.create(_mk("alpha"))
    store.create(_mk("beta"))
    assert store.list_names() == ["alpha", "beta"]
    assert store.get("alpha")["jql"] == "project = ALPHA"
    store.update("alpha", {"description": "changed"})
    assert store.get("alpha")["description"] == "changed"
    store.delete("beta")
    assert store.list_names() == ["alpha"]
    with pytest.raises(KeyError):
        store.get("beta")
    with pytest.raises(ValueError):
        store.create(_mk("alpha"))  # duplicate


def test_create_use_reload_most_used_order(store, spark):
    """The verdict's round-trip: create → use (usage bumps) → reload →
    most_used order matches (GetMostUsedProfiles manager.go:475-497)."""
    for n in ("a", "b", "c"):
        store.create(_mk(n))
    for i in range(5):
        store.record_usage("b", 100 + i, True, T0)
    for i in range(2):
        store.record_usage("c", 50, i == 0, T0)
    # reload from disk through a FRESH store — persistence, not memory
    reloaded = ProfileStore(store.base)
    df = reloaded.as_df(spark)
    top = plans.most_used(df, k=3).collect()
    assert [r["name"] for r in top] == ["b", "c", "a"]
    b = reloaded.get("b")
    assert b["times_used"] == 5
    # running mean of 100..104 with per-step integer truncation stays 100
    assert b["avg_sync_time_ms"] == 100
    assert b["success_rate"] == 1.0
    c = reloaded.get("c")
    assert c["times_used"] == 2 and c["success_rate"] == 0.5


def test_columnar_usage_update_round_trips(store, spark):
    """plans.record_usage (the DataFrame-side A8 update) persists through
    save_df and reloads identically."""
    for n in ("x", "y"):
        store.create(_mk(n))
    df = store.as_df(spark)
    df2 = plans.record_usage(df, "x", sync_ms=200, success=True, at=T0)
    store.save_df(df2)
    again = store.get("x")
    assert again["times_used"] == 1
    assert again["avg_sync_time_ms"] == 200
    assert again["success_rate"] == 1.0
    assert store.get("y")["times_used"] == 0


def test_atomic_save_leaves_valid_file(store, tmp_path):
    store.create(_mk("solo"))
    # no stray tmp file; file parses
    import os

    assert not os.path.exists(store.path + ".tmp")
    import yaml

    with open(store.path) as f:
        doc = yaml.safe_load(f)
    assert doc["profiles"][0]["name"] == "solo"


# -- r8 ops verbs (r7 verdict task 5; manager.go:372-645) -------------------


def test_rename_preserves_usage_stats(store):
    store.create(_mk("alpha", repository="repo-a"))
    store.record_usage("alpha", 120, True, T0)
    store.record_usage("alpha", 80, False, T0)
    store.rename("alpha", "omega")
    assert store.list_names() == ["omega"]
    p = store.get("omega")
    assert p["name"] == "omega"
    assert p["times_used"] == 2
    assert p["avg_sync_time_ms"] == 100
    assert p["success_rate"] == 0.5
    assert p["jql"] == "project = ALPHA"  # payload untouched
    with pytest.raises(KeyError):
        store.get("alpha")


def test_rename_rejects_existing_and_bad_names(store):
    store.create(_mk("alpha"))
    store.create(_mk("beta"))
    with pytest.raises(ValueError, match="exists"):
        store.rename("alpha", "beta")
    with pytest.raises(ValueError, match="letters"):
        store.rename("alpha", "bad name!")
    with pytest.raises(KeyError):
        store.rename("ghost", "new")


def test_duplicate_resets_usage_and_prefixes_description(store):
    store.create(_mk("alpha"))
    store.record_usage("alpha", 100, True, T0)
    store.duplicate("alpha", "alpha-copy")
    src, cp = store.get("alpha"), store.get("alpha-copy")
    assert src["times_used"] == 1  # source untouched
    assert cp["times_used"] == 0 and cp["last_used"] is None
    assert cp["description"] == "Copy of d-alpha"
    assert cp["jql"] == src["jql"]
    with pytest.raises(ValueError):
        store.duplicate("alpha", "alpha-copy")  # target exists


def test_backup_restore_round_trip(store):
    store.create(_mk("alpha"))
    store.backup()
    store.create(_mk("beta"))
    store.delete("alpha")
    assert store.list_names() == ["beta"]
    store.restore()
    assert store.list_names() == ["alpha"]
    assert store.get("alpha")["description"] == "d-alpha"


def test_validate_and_repair_collection(store):
    store.create(_mk("good", repository="repo"))
    # invalid: two sync modes AND no repository
    store.create(
        {"name": "two-modes", "jql": "project = X", "epic_key": "E-1"}
    )
    # warning only: out-of-range concurrency (still valid)
    store.create(_mk("warned", repository="repo", concurrency=50))
    report = store.validate_collection()
    assert not report["valid"]
    assert any("two-modes" in e for e in report["errors"])
    assert all("good" not in e for e in report["errors"])
    assert any("warned" in w for w in report["warnings"])
    removed = store.repair_collection()
    assert removed == ["two-modes"]
    assert store.list_names() == ["good", "warned"]
    assert store.validate_collection()["valid"]
    assert store.repair_collection() == []  # idempotent


def test_search_profiles_matches_reference_semantics(store, spark):
    store.create(_mk("epic-sync", repository="repo-a", tags=["epic", "team"]))
    store.create(_mk("project-full", repository="repo-b", tags=["project"]))
    store.create(
        _mk("adhoc", repository="repo-a", tags=["personal"],
            description="one-off widget sync")
    )
    df = store.as_df(spark)
    # free-text query short-circuits other criteria; hits name OR desc OR tag
    assert [r["name"] for r in plans.search_profiles(df, query="epic").collect()] == ["epic-sync"]
    assert [r["name"] for r in plans.search_profiles(df, query="widget").collect()] == ["adhoc"]
    assert [r["name"] for r in plans.search_profiles(df, query="personal").collect()] == ["adhoc"]
    # jql only searched when include_jql
    assert plans.search_profiles(df, query="adhoc", include_jql=False).count() == 1  # name hit
    assert [r["name"] for r in plans.search_profiles(df, query="= epic", include_jql=False).collect()] == []
    assert [r["name"] for r in plans.search_profiles(df, query="project =", include_jql=True).collect()] == ["adhoc", "epic-sync", "project-full"]
    # tag + repository conjunction when no query
    assert [r["name"] for r in plans.search_profiles(df, tags=["epic", "personal"]).collect()] == ["adhoc", "epic-sync"]
    assert [r["name"] for r in plans.search_profiles(df, tags=["epic"], repository="repo-b").collect()] == []
    assert [r["name"] for r in plans.search_profiles(df, repository="repo-b").collect()] == ["project-full"]


def test_similar_profiles_weighted_ranking(store, spark):
    base = _mk(
        "base", repository="repo-a", tags=["epic", "team"],
        concurrency=5, rate_limit="500ms", incremental=True,
        include_links=True,
    )
    base["jql"] = "project = CORE and status = open"
    store.create(base)
    # twin: same everything -> score 1.0
    twin = dict(base, name="twin")
    store.create(twin)
    # cousin: same repo + 2/4 options, disjoint tags, unrelated jql
    store.create(
        _mk("cousin", repository="repo-a", tags=["misc"], concurrency=5,
            rate_limit="1s", incremental=False, include_links=True,
            jql="labels in (infra)")
    )
    # stranger: nothing in common
    store.create(
        _mk("stranger", repository="repo-z", tags=["x"], concurrency=1,
            rate_limit="2s", incremental=False, include_links=False,
            jql="reporter = bob")
    )
    df = store.as_df(spark)
    rows = plans.similar_profiles(df, "base", limit=5).collect()
    names = [r["name"] for r in rows]
    assert "twin" in names
    assert "stranger" not in names  # below the 0.5 gate
    by_name = {r["name"]: r["similarity"] for r in rows}
    assert by_name["twin"] == 1.0
    # self never returned
    assert "base" not in names


def test_export_import_round_trip(store, tmp_path):
    """import_export.go:15-170 semantics: names filter wins over tags;
    --no-stats resets usage; import skips conflicts unless overwrite,
    applies prefix and default tags, validates on request."""
    store.create(_mk("alpha", repository="r", tags=["prod"]))
    store.create(_mk("beta", repository="r", tags=["dev"]))
    store.record_usage("alpha", 100, True, T0)
    f = str(tmp_path / "out.yaml")

    # tags filter
    assert store.export_profiles(f, tags=["prod"]) == 1
    # names filter beats tags
    assert store.export_profiles(f, names=["beta"], tags=["prod"]) == 1
    # no-stats export resets usage in the FILE, not the store
    assert store.export_profiles(f, include_stats=False) == 2
    other = ProfileStore(str(tmp_path / "other"))
    out = other.import_profiles(f)
    assert out == {"imported": ["alpha", "beta"], "conflicts": []}
    assert other.get("alpha")["times_used"] == 0
    assert store.get("alpha")["times_used"] == 1

    # conflicts skip unless overwrite; prefix + default tags apply
    out = other.import_profiles(f)
    assert out == {"imported": [], "conflicts": ["alpha", "beta"]}
    out = other.import_profiles(f, prefix="team-", default_tags=["ext"])
    assert out["imported"] == ["team-alpha", "team-beta"]
    assert other.get("team-alpha")["tags"] == ["prod", "ext"]

    # validate rejects an invalid file atomically
    bad = str(tmp_path / "bad.yaml")
    import yaml

    with open(bad, "w") as fh:
        yaml.safe_dump(
            {"version": 1,
             "profiles": [{"name": "x", "jql": "a", "epic_key": "b"}]},
            fh,
        )
    with pytest.raises(ValueError, match="invalid"):
        other.import_profiles(bad, validate=True)
    assert not other.exists("x")


def test_cli_profile_verbs(store, tmp_path, capsys):
    """The profile CLI verb surface routes to the store (profile.go
    subcommand parity, minus the Spark-session search/similar arms
    covered by the plans tests)."""
    from jira_cdc_git_spark.cli import main

    s = ["--store", store.base]
    spec = json.dumps(_mk("alpha", repository="r"))
    assert main(["profile", "create", *s, "--spec", spec]) == 0
    assert main(["profile", "rename", *s, "--name", "alpha",
                 "--target", "omega"]) == 0
    assert main(["profile", "duplicate", *s, "--name", "omega",
                 "--target", "omega2"]) == 0
    assert main(["profile", "update", *s, "--name", "omega2",
                 "--spec", json.dumps({"description": "upd"})]) == 0
    f = str(tmp_path / "x.yaml")
    assert main(["profile", "export", *s, "--file", f]) == 0
    assert main(["profile", "backup", *s]) == 0
    assert main(["profile", "delete", *s, "--name", "omega2"]) == 0
    assert main(["profile", "restore", *s]) == 0
    assert store.exists("omega2")
    assert main(["profile", "validate", *s]) == 0
    capsys.readouterr()
    assert main(["profile", "list", *s]) == 0
    assert capsys.readouterr().out.split() == ["omega", "omega2"]


import json  # noqa: E402


def test_profile_templates_instantiation():
    """templates.go:10-530 parity: 7 builtin templates; required-var
    validation; defaults; the recent-updates conditional project filter;
    issue_keys comma-split; invalid instantiation rejected."""
    from jira_cdc_git_spark import profile_templates as PT

    ids = [t["id"] for t in PT.get_templates()]
    assert ids == [
        "epic-all-issues", "epic-stories-only", "project-active-issues",
        "my-current-sprint", "recent-updates", "custom-jql", "issue-list",
    ]
    assert sorted(PT.templates_by_category()) == [
        "custom", "epic", "monitoring", "personal", "project",
    ]
    with pytest.raises(KeyError):
        PT.get_template("nope")

    p = PT.create_from_template(
        "epic-all-issues", "my-epic",
        {"epic_key": "PROJ-123", "repository": "./repo"},
    )
    assert p["epic_key"] == "PROJ-123"
    assert p["description"] == "Sync for EPIC PROJ-123 - all associated issues"
    assert p["concurrency"] == 5 and p["tags"] == ["epic", "comprehensive"]
    with pytest.raises(ValueError, match="epic_key"):
        PT.create_from_template(
            "epic-all-issues", "x", {"repository": "./r"}
        )

    # default days=7; conditional project filter only when provided
    p = PT.create_from_template(
        "recent-updates", "weekly", {"repository": "./r"}
    )
    assert p["jql"] == "updated >= -7d"
    p = PT.create_from_template(
        "recent-updates", "ai",
        {"repository": "./r", "days": "3", "project_filter": "A,B"},
    )
    assert p["jql"] == "updated >= -3d AND project in (A,B)"

    p = PT.create_from_template(
        "issue-list", "rel",
        {"issue_keys": "P-1, P-2 ,P-3", "repository": "./r"},
    )
    assert p["issue_keys"] == ["P-1", "P-2", "P-3"]
    assert p["description"] == "Specific issues: P-1, P-2 ,P-3"


def test_cli_profile_template_create(store, capsys):
    from jira_cdc_git_spark.cli import main

    s = ["--store", store.base]
    assert main(["profile", "templates", *s]) == 0
    out = capsys.readouterr().out
    assert "epic-all-issues\tepic" in out
    assert main([
        "profile", "create", *s, "--template", "project-active-issues",
        "--name", "proj", "--vars",
        json.dumps({"project_key": "PROJ", "repository": "./r"}),
    ]) == 0
    p = store.get("proj")
    assert p["jql"].startswith("project = PROJ AND status != Closed")
    assert p["concurrency"] == 8
