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


def test_fan_out_one_repo_per_project(spark, sf_dir, tmp_path):
    """Round-3 verdict task 4: per-project git fan-out. A multi-project
    batch materializes into one repo per project via executor-side
    fast-import; per-repo git log counts match per-project issue counts."""
    import os

    from pyspark.sql import Window

    w = Window.partitionBy("project_key").orderBy("key")
    df = (
        FX.issues(spark, sf_dir)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 20)
        .drop("__rn")
        .cache()
    )
    df.count()
    per_project = {
        r["project_key"]: r["n"]
        for r in df.groupBy("project_key").agg(F.count("*").alias("n")).collect()
    }
    assert len(per_project) >= 2, "fixture must span several projects"
    root = str(tmp_path / "repos")
    counts = sinks_git.materialize_fan_out(df, root)
    assert counts == per_project
    for project, n in per_project.items():
        repo = os.path.join(root, project)
        subjects = sinks_git.git_log_subjects(repo)
        assert len(subjects) == n
        assert all(SUBJECT_RE.match(s) for s in subjects), subjects[:3]
        # every commit in this repo belongs to this project
        assert all(f"({project})" in s for s in subjects)
    df.unpersist()


def test_fan_out_rerun_appends(spark, sf_dir, tmp_path):
    """Incremental batches APPEND: a second fan-out run grafts onto each
    repo's branch tip instead of fast-import refusing the rewrite."""
    df = FX.issues(spark, sf_dir).orderBy("key").cache()
    first = df.limit(30)
    second = (
        df.join(first.select("key").withColumnRenamed("key", "__k"),
                F.col("key") == F.col("__k"), "left_anti")
        .limit(20)
    )
    root = str(tmp_path / "repos")
    c1 = sinks_git.materialize_fan_out(first, root)
    c2 = sinks_git.materialize_fan_out(second, root)
    import os

    for project in set(c1) | set(c2):
        got = len(sinks_git.git_log_subjects(os.path.join(root, project)))
        assert got == c1.get(project, 0) + c2.get(project, 0)
    df.unpersist()


def test_symlink_tree_materializes(spark, sf_dir, tmp_path):
    """The reference's full on-disk contract (README.md:53-73): after
    issue materialization + symlink fan-out, each project repo holds
    REAL symlinks under projects/{pk}/relationships/... whose targets
    resolve to existing issue YAML files, with the reference's exact
    path algebra (links.go:241-307)."""
    import os

    from jira_cdc_git_spark.operators.jira import link_edges_frame

    root = str(tmp_path / "repos")
    df = FX.issues(spark, sf_dir).orderBy("key").limit(400).cache()
    sinks_git.materialize_fan_out(df, root)
    edges = link_edges_frame(df)
    counts = sinks_git.materialize_symlinks_fan_out(edges, root)
    assert sum(counts.values()) == edges.count() > 0

    checked = broken = 0
    for project in counts:
        repo = os.path.join(root, project)
        rel_root = os.path.join(repo, "projects", project, "relationships")
        assert os.path.isdir(rel_root)
        for dirpath, _dirs, files in os.walk(rel_root):
            for name in files:
                p = os.path.join(dirpath, name)
                assert os.path.islink(p), p
                tgt = os.readlink(p)
                assert tgt.endswith(".yaml") and "issues/" in tgt
                resolved = os.path.normpath(os.path.join(dirpath, tgt))
                if os.path.isfile(resolved):
                    checked += 1
                else:
                    # fixture edges include deliberately broken targets
                    # (J2's PROJ-99997/99998/99999 ghosts) — and targets
                    # in OTHER projects' repos; both dangle here
                    broken += 1
    assert checked > 0
    # epic links: exact reference path shape for a known-good edge
    some = (
        edges.filter(F.col("link_type") == "epic").orderBy("src_key").first()
    )
    link = os.path.join(
        root, some["project_key"], "projects", some["project_key"],
        "relationships", "epic", some["src_key"],
    )
    assert os.path.islink(link)
    assert os.readlink(link) == f"../../issues/{some['dst_key']}.yaml"
    df.unpersist()
