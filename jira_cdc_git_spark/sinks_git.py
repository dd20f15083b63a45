"""S8 file-level git materialization — turn commit_log rows into REAL git
commits (reference: pkg/git/git.go:214-357, the system's entire output
contract per README.md:53-73: one YAML file per issue, one conventional
commit per issue).

Two writers over the same commit_log frame (sinks.commit_log_rows):

* ``materialize_fast_import`` — the default: stream every (file, commit)
  pair into ONE ``git fast-import`` process with inline blobs. Commits are
  ordered deterministically by (commit_ts, key); author/date/message come
  from the row. This is how you land 100k+ commits in seconds — the git
  repository itself is a single-writer medium, so the right shape is one
  streaming process fed from ``toLocalIterator`` (constant driver memory),
  not a distributed write. The heavy lifting (selecting, formatting,
  deduplicating the batch) stays in Spark.
* ``materialize_porcelain`` — reference-parity loop: ``git add`` +
  ``git commit`` per issue (git.go:253-287 stages then commits each file).
  Kept for fidelity and for repos with hooks that must fire; O(n)
  subprocess pairs, use only for small batches.

The YAML document written per issue matches sources/yaml_io.py's layout, so
``read_yaml_issues`` round-trips a materialized repo.
"""

from __future__ import annotations

import os
import subprocess
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jira_cdc_git_spark import sinks

DEFAULT_AUTHOR = "jira-sync <jira-sync@example.com>"


def _ensure_repo(repo_dir: str) -> None:
    os.makedirs(repo_dir, exist_ok=True)
    if not os.path.isdir(os.path.join(repo_dir, ".git")):
        subprocess.run(
            ["git", "init", "-q", "-b", "main", repo_dir], check=True
        )
        subprocess.run(
            ["git", "-C", repo_dir, "config", "user.name", "jira-sync"],
            check=True,
        )
        subprocess.run(
            ["git", "-C", repo_dir, "config", "user.email",
             "jira-sync@example.com"],
            check=True,
        )


def _author_or_default(author: str | None) -> str:
    """F7 output ('Name <email>') or the sync-bot identity (git.go:268-276
    falls back to the configured committer when the issue has no assignee).
    """
    if author and "<" in author:
        return author
    return DEFAULT_AUTHOR


def _yaml_doc(row) -> str:
    import yaml

    d = {
        "key": row["key"],
        "summary": row["summary"],
        "issuetype": row["issuetype"],
        "status": {"name": row["status_name"]},
        "updated": str(row["updated"]),
    }
    return yaml.safe_dump(d, sort_keys=True)


def _commit_stream(rows) -> Iterator[bytes]:
    """Render commit_log-ish rows as a git fast-import stream (inline
    blobs, one commit per issue)."""
    mark = 0
    for r in rows:
        mark += 1
        author = _author_or_default(r["author"])
        when = int(r["commit_ts"].timestamp())
        msg = (r["subject"] + "\n\n" + (r["body"] or "")).encode()
        blob = _yaml_doc(r).encode()
        yield b"commit refs/heads/main\n"
        yield f"mark :{mark}\n".encode()
        yield f"author {author} {when} +0000\n".encode()
        yield f"committer {author} {when} +0000\n".encode()
        yield f"data {len(msg)}\n".encode() + msg + b"\n"
        yield f"M 644 inline {r['file_path']}\n".encode()
        yield f"data {len(blob)}\n".encode() + blob + b"\n"
    yield b"done\n"


def _commit_frame(issues: DataFrame) -> DataFrame:
    """commit_log rows + the flat fields the YAML document needs, ordered
    deterministically (commit_ts, key) — the order the reference produces
    by syncing sorted keys (jira_builder.go:222-225 ORDER BY injection)."""
    log = sinks.commit_log_rows(issues)
    flat = issues.select(
        F.col("key").alias("__k"),
        "summary",
        "issuetype",
        F.col("status.name").alias("status_name"),
        "updated",
    )
    return (
        log.join(flat, log.key == flat.__k)
        .drop("__k")
        .orderBy("commit_ts", "key")
    )


def materialize_fast_import(issues: DataFrame, repo_dir: str) -> int:
    """Materialize one commit per issue via a single streaming
    ``git fast-import``. Returns the number of commits written."""
    _ensure_repo(repo_dir)
    frame = _commit_frame(issues)
    proc = subprocess.Popen(
        ["git", "-C", repo_dir, "fast-import", "--quiet", "--done"],
        stdin=subprocess.PIPE,
    )
    n = 0
    try:
        for chunk in _commit_stream(frame.toLocalIterator()):
            proc.stdin.write(chunk)
            if chunk.startswith(b"commit "):
                n += 1
        proc.stdin.close()
        rc = proc.wait()
        if rc != 0:
            raise RuntimeError(f"git fast-import failed rc={rc}")
    finally:
        if proc.poll() is None:
            proc.kill()
    # fast-import writes refs/objects only; sync the working tree
    subprocess.run(
        ["git", "-C", repo_dir, "checkout", "-q", "-f", "main"], check=True
    )
    return n


def materialize_porcelain(issues: DataFrame, repo_dir: str) -> int:
    """Reference-parity per-issue staging loop (git.go:253-287): write the
    YAML, ``git add`` it, ``git commit`` with the conventional message and
    the issue's author/date. Small batches only."""
    _ensure_repo(repo_dir)
    n = 0
    for r in _commit_frame(issues).toLocalIterator():
        path = os.path.join(repo_dir, r["file_path"])
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(_yaml_doc(r))
        os.replace(tmp, path)
        subprocess.run(
            ["git", "-C", repo_dir, "add", "--", r["file_path"]], check=True
        )
        author = _author_or_default(r["author"])
        when = f"{int(r['commit_ts'].timestamp())} +0000"
        env = dict(
            os.environ,
            GIT_AUTHOR_DATE=when,
            GIT_COMMITTER_DATE=when,
        )
        subprocess.run(
            [
                "git", "-C", repo_dir, "commit", "-q",
                "--author", author,
                "-m", r["subject"] + "\n\n" + (r["body"] or ""),
                "--only", "--", r["file_path"],
            ],
            check=True,
            env=env,
        )
        n += 1
    return n


def git_log_subjects(repo_dir: str) -> list[str]:
    """Oldest-first commit subjects — the round-trip check surface."""
    out = subprocess.run(
        ["git", "-C", repo_dir, "log", "--reverse", "--format=%s"],
        check=True,
        capture_output=True,
        text=True,
    )
    return [line for line in out.stdout.splitlines() if line]
