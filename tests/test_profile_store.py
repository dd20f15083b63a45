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
