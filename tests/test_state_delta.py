"""Delta backend parity for the sync-state store: the parquet backend's
core MERGE contracts (insert-then-idempotent-bump, restore time travel)
re-run against DeltaSyncStateStore. Import-skips when delta-spark is not
installed — this sandbox ships without it, so these tests are the
contract a Delta-equipped deployment runs; the shared update projection
(state.merge_updates) is covered either way by test_state_sinks.py.
"""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

delta = pytest.importorskip("delta")

from jira_cdc_git_spark import fixtures as FX
from jira_cdc_git_spark.state_delta import DeltaSyncStateStore, open_state_store

T0 = datetime(2002, 1, 1)


@pytest.fixture
def store(tmp_path):
    return DeltaSyncStateStore(str(tmp_path / "state"))


@pytest.fixture(scope="module")
def issues(spark, sf_dir):
    df = FX.issues(spark, sf_dir).limit(200).cache()
    df.count()
    return df


def test_factory_selects_delta(tmp_path):
    st = open_state_store(str(tmp_path / "s"), backend="delta")
    assert isinstance(st, DeltaSyncStateStore)


def test_merge_then_all_synced(store, spark, issues):
    store.merge(spark, issues, T0)
    st = store.load(spark)
    assert st.count() == issues.count()
    assert st.filter(F.col("sync_count") != 1).count() == 0
    # idempotent re-merge: same keys, sync_count bumps, no dup rows
    store.merge(spark, issues, T0 + timedelta(hours=1))
    st2 = store.load(spark)
    assert st2.count() == issues.count()
    assert st2.filter(F.col("sync_count") != 2).count() == 0


def test_restore_time_travel(store, spark, issues):
    store.merge(spark, issues.limit(50), T0)
    v1 = store.current_version()
    store.merge(spark, issues, T0 + timedelta(hours=1))
    assert store.load(spark).count() == issues.count()
    store.restore(v1 - 1)  # Delta versions are 0-based commit ids
    assert store.load(spark).count() == 50
