"""S8 git materialization round-trip: sync N issues → a real git repo with
one conventional commit per issue (pkg/git/git.go:214-357 parity)."""

import re
import subprocess

import pytest
from pyspark.sql import functions as F

from jira_cdc_git_spark import fixtures as FX
from jira_cdc_git_spark import sinks_git

SUBJECT_RE = re.compile(
    r"^(feat|fix|chore|refactor|docs|test)\([A-Z][A-Z0-9-]*\): add issue "
    r"[A-Z][A-Z0-9-]*-\d+ - .+"
)


@pytest.fixture(scope="module")
def fifty(spark, sf_dir):
    df = FX.issues(spark, sf_dir).orderBy("key").limit(50).cache()
    df.count()
    return df


def _assert_repo_matches(repo, fifty):
    subjects = sinks_git.git_log_subjects(repo)
    assert len(subjects) == 50
    assert all(SUBJECT_RE.match(s) for s in subjects), subjects[:3]
    # spot-check author propagation: an assigned issue's commit carries F7
    log = subprocess.run(
        ["git", "-C", repo, "log", "--format=%an <%ae>|%s"],
        check=True, capture_output=True, text=True,
    ).stdout.splitlines()
    authored = [line for line in log if not line.startswith("jira-sync")]
    assert authored and all(re.match(r"^user\d+ <user\d+@example.com>\|", a)
                            for a in authored)
    # files exist in the reference layout and parse back (S4 round trip)
    n_files = subprocess.run(
        ["git", "-C", repo, "ls-files"], check=True, capture_output=True,
        text=True,
    ).stdout.splitlines()
    assert len(n_files) == 50
    assert all(f.startswith("projects/") and f.endswith(".yaml")
               for f in n_files)
    # every tracked file is present in the working tree
    import os

    assert all(os.path.isfile(os.path.join(repo, f)) for f in n_files)


def test_fast_import_fifty_commits(spark, fifty, tmp_path):
    repo = str(tmp_path / "repo_fi")
    n = sinks_git.materialize_fast_import(fifty, repo)
    assert n == 50
    _assert_repo_matches(repo, fifty)


def test_porcelain_matches_fast_import_subjects(spark, fifty, tmp_path):
    repo_a = str(tmp_path / "repo_fi")
    repo_b = str(tmp_path / "repo_pc")
    sinks_git.materialize_fast_import(fifty, repo_a)
    n = sinks_git.materialize_porcelain(fifty, repo_b)
    assert n == 50
    assert (
        sinks_git.git_log_subjects(repo_a)
        == sinks_git.git_log_subjects(repo_b)
    )
    _assert_repo_matches(repo_b, fifty)


def test_yaml_round_trip_from_materialized_repo(spark, fifty, tmp_path):
    from jira_cdc_git_spark.sources.yaml_io import read_yaml_issues

    repo = str(tmp_path / "repo_rt")
    sinks_git.materialize_fast_import(fifty, repo)
    back = read_yaml_issues(spark, repo)
    assert back.count() == 50
    keys_in = {r["key"] for r in fifty.select("key").collect()}
    keys_out = {r["key"] for r in back.select("key").collect()}
    assert keys_in == keys_out
    assert back.filter(F.col("status_name").isNull()).count() == 0
