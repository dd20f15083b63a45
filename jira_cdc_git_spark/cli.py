"""CLI facade — the reference's `jira-sync` command surface
(internal/cli/root.go:20, sync.go:74-326, query/profile subcommands)
mapped onto the Spark engine, so a user of the reference drives the
same verbs here:

    sync     --jql/--issues + --out, --incremental|--force, --dry-run,
             --concurrency, --distributed, --git-root
    query    --jql or --template NAME --param k=v [--limit N] over the
             issue table derived from a testdata dir
    validate --jql  (the F9 lint; exit 1 on findings)
    template list
    profile  list|show|create|delete  (ProfileStore)
    saved    save|list|run|delete     (SavedQueryStore)
    version

The reference validates --issues XOR --jql and --incremental XOR
--force (sync.go:96-107) — mirrored here. `sync` drives the composed
run_incremental_sync loop (REST fetch → change filter → partitioned
write + edges + commit log + state MERGE); `query` compiles through the
same JQL pipeline the sync path uses.

Driver-side by design: this is the thin control layer SURVEY §3.3 says
replaces the operator/API plumbing — every data-touching step inside is
a Spark job.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession

ENGINE_VERSION = "0.4.0-spark"


def _spark() -> SparkSession:
    from jira_cdc_git_spark.session import get_spark

    return get_spark(app_name="jira-sync-cli")


def _issues_to_jql(issues: str) -> str:
    """--issues KEY-1,KEY-2 → `key in (...)` (the parseIssueList shape,
    internal/cli/sync.go:365-424): split, trim, drop empties, validate."""
    import re

    from jira_cdc_git_spark.functions.scalar import ISSUE_KEY_PATTERN

    keys = [k.strip() for k in issues.split(",") if k.strip()]
    if not keys:
        raise SystemExit("--issues: no keys given")
    bad = [k for k in keys if not re.fullmatch(ISSUE_KEY_PATTERN, k)]
    if bad:
        raise SystemExit(f"--issues: invalid keys {bad}")
    return "key in (" + ", ".join(keys) + ")"


def cmd_sync(args: argparse.Namespace) -> int:
    if bool(args.jql) == bool(args.issues):
        raise SystemExit("exactly one of --jql / --issues is required")
    if args.incremental and args.force:
        raise SystemExit("--incremental and --force are mutually exclusive")
    jql = args.jql or _issues_to_jql(args.issues)
    # engine select (sync.go:174, `incremental || force || dryRun`):
    # --incremental and --dry-run both route to the state-filtered CDC
    # engine (dry-run previews the INCREMENTAL change set, Force=false);
    # plain and --force run the full BatchSyncEngine sweep (sync
    # everything the JQL matches, state refreshed as a side effect)
    force = args.force or not (args.incremental or args.dry_run)
    from jira_cdc_git_spark.state import SyncStateStore
    from jira_cdc_git_spark.streaming.pipeline import run_incremental_sync

    spark = _spark()
    store = SyncStateStore(f"{args.out}/state")
    result = run_incremental_sync(
        spark,
        args.base_url,
        jql,
        store,
        args.out,
        distributed=args.distributed,
        max_concurrent=args.concurrency if args.distributed else None,
        token=args.token,
        force=force,
        dry_run=args.dry_run,
        git_repos_root=args.git_root,
    )
    print(json.dumps(result))
    return 0


def cmd_query(args: argparse.Namespace) -> int:
    from jira_cdc_git_spark import fixtures as FX
    from jira_cdc_git_spark.jql import build_from_template, run_jql
    from jira_cdc_git_spark.operators.jira import _ctx

    if bool(args.jql) == bool(args.template):
        raise SystemExit("exactly one of --jql / --template is required")
    bad = [p for p in args.param or [] if "=" not in p]
    if bad:
        raise SystemExit(f"--param expects k=v, got: {bad}")
    params = dict(p.split("=", 1) for p in args.param or [])
    jql = args.jql or build_from_template(args.template, params)
    spark = _spark()
    # the nested issue frame + the membership/history context the JQL
    # compiler's issuesInEpic()/linkedIssues()/WAS terms resolve against
    df = run_jql(jql, FX.issues(spark, args.data), _ctx(spark, args.data))
    rows = df.limit(args.limit).collect()
    for r in rows:
        print(json.dumps(r.asDict(recursive=True), default=str))
    print(f"# {len(rows)} row(s) shown (limit {args.limit}) for: {jql}",
          file=sys.stderr)
    return 0


def cmd_validate(args: argparse.Namespace) -> int:
    from jira_cdc_git_spark.jql import validate

    errs = validate(args.jql)
    for e in errs:
        print(e, file=sys.stderr)
    return 1 if errs else 0


def cmd_template(args: argparse.Namespace) -> int:
    from jira_cdc_git_spark.jql import TEMPLATES

    for name, tpl in sorted(TEMPLATES.items()):
        print(f"{name}\trequired={','.join(tpl['required']) or '-'}\t{tpl['jql']}")
    return 0


def _require(args: argparse.Namespace, *flags: str) -> None:
    missing = [f for f in flags if getattr(args, f, None) is None]
    if missing:
        raise SystemExit(
            f"{args.cmd} {args.action}: missing required "
            + ", ".join(f"--{f}" for f in missing)
        )


def cmd_profile(args: argparse.Namespace) -> int:
    """Profile verb surface (internal/cli/profile.go: list/create/show/
    update/delete/export/import + the manager.go:372-645 ops verbs)."""
    from jira_cdc_git_spark.profile_store import ProfileStore

    if args.action in ("show", "delete", "similar"):
        _require(args, "name")
    elif args.action == "create" and not args.template:
        _require(args, "spec")
    elif args.action == "update":
        _require(args, "name", "spec")
    elif args.action in ("rename", "duplicate"):
        _require(args, "name", "target")
    elif args.action in ("export", "import"):
        _require(args, "file")
    store = ProfileStore(args.store)
    if args.action == "list":
        for n in store.list_names():
            print(n)
    elif args.action == "templates":
        from jira_cdc_git_spark.profile_templates import (
            templates_by_category,
        )

        for cat, ts in sorted(templates_by_category().items()):
            for t in ts:
                print(f"{t['id']}\t{cat}\t{t['name']}")
    elif args.action == "show":
        print(json.dumps(store.get(args.name), default=str))
    elif args.action == "create":
        if args.template:
            from jira_cdc_git_spark.profile_templates import (
                create_from_template,
            )

            _require(args, "name")
            store.create(
                create_from_template(
                    args.template,
                    args.name,
                    json.loads(args.vars) if args.vars else {},
                )
            )
        else:
            store.create(json.loads(args.spec))
    elif args.action == "update":
        store.update(args.name, json.loads(args.spec))
    elif args.action == "delete":
        store.delete(args.name)
    elif args.action == "rename":
        store.rename(args.name, args.target)
    elif args.action == "duplicate":
        store.duplicate(args.name, args.target)
    elif args.action == "backup":
        print(store.backup())
    elif args.action == "restore":
        store.restore()
    elif args.action == "validate":
        report = store.validate_collection()
        print(json.dumps(report))
        return 0 if report["valid"] else 1
    elif args.action == "repair":
        print(json.dumps({"removed": store.repair_collection()}))
    elif args.action == "export":
        n = store.export_profiles(
            args.file,
            names=args.names.split(",") if args.names else None,
            tags=args.tags.split(",") if args.tags else None,
            include_stats=not args.no_stats,
        )
        print(f"exported {n} profiles to {args.file}")
    elif args.action == "import":
        out = store.import_profiles(
            args.file,
            overwrite=args.overwrite,
            prefix=args.prefix or "",
            default_tags=args.tags.split(",") if args.tags else None,
            validate=args.validate,
        )
        print(json.dumps(out))
    elif args.action == "search":
        from jira_cdc_git_spark import plans

        hits = plans.search_profiles(
            store.as_df(_spark()),
            query=args.query,
            tags=args.tags.split(",") if args.tags else None,
            repository=args.repository,
            include_jql=args.include_jql,
        ).collect()
        for r in hits:
            print(r["name"])
    elif args.action == "similar":
        from jira_cdc_git_spark import plans

        for r in plans.similar_profiles(
            store.as_df(_spark()), args.name
        ).collect():
            print(f"{r['name']}\t{r['similarity']}")
    return 0


def cmd_saved(args: argparse.Namespace) -> int:
    from jira_cdc_git_spark.query_store import SavedQueryStore

    if args.action == "save":
        _require(args, "name", "jql")
    elif args.action in ("run", "delete"):
        _require(args, "name")
    store = SavedQueryStore(args.store)
    if args.action == "save":
        store.save(args.name, args.description or "", args.jql)
    elif args.action == "list":
        for row in store.list():
            print(f"{row['name']}\t{row['jql']}")
    elif args.action == "delete":
        store.delete(args.name)
    elif args.action == "run":
        row = store.get(args.name)
        store.record_usage(args.name)
        ns = argparse.Namespace(
            jql=row["jql"], template=None, param=[], data=args.data,
            limit=args.limit,
        )
        return cmd_query(ns)
    return 0


def cmd_serve(args: argparse.Namespace) -> int:
    """The reference's second binary (cmd/api-server) as a CLI verb:
    bind the REST facade and serve until interrupted."""
    from jira_cdc_git_spark.api import SyncAPIServer

    srv = SyncAPIServer(
        _spark(), args.base_url, args.out,
        host=args.host, port=args.port, token=args.token,
    ).start()
    print(srv.url, flush=True)
    try:
        while True:
            import time

            time.sleep(3600)
    except KeyboardInterrupt:
        srv.stop()
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="jira-sync", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("sync", help="sync issues from a JIRA REST endpoint")
    s.add_argument("--jql")
    s.add_argument("--issues")
    s.add_argument("--base-url", required=True)
    s.add_argument("--out", required=True)
    s.add_argument("--token")
    s.add_argument("--incremental", action="store_true")
    s.add_argument("--force", action="store_true")
    s.add_argument("--dry-run", action="store_true")
    s.add_argument("--distributed", action="store_true")
    s.add_argument("--concurrency", type=int, default=5)
    s.add_argument("--git-root")
    s.set_defaults(fn=cmd_sync)

    q = sub.add_parser("query", help="run a JQL query over the issue table")
    q.add_argument("--jql")
    q.add_argument("--template")
    q.add_argument("--param", action="append")
    q.add_argument("--data", default="/root/testdata/sf0.001")
    q.add_argument("--limit", type=int, default=20)
    q.set_defaults(fn=cmd_query)

    v = sub.add_parser("validate", help="lint a JQL string")
    v.add_argument("--jql", required=True)
    v.set_defaults(fn=cmd_validate)

    t = sub.add_parser("template", help="list builtin JQL templates")
    t.set_defaults(fn=cmd_template)

    pr = sub.add_parser(
        "profile", help="profile store CRUD + ops verbs + export/import"
    )
    pr.add_argument(
        "action",
        choices=[
            "list", "show", "create", "update", "delete", "rename",
            "duplicate", "backup", "restore", "validate", "repair",
            "export", "import", "search", "similar", "templates",
        ],
    )
    pr.add_argument("--store", required=True)
    pr.add_argument("--name")
    pr.add_argument("--spec")
    pr.add_argument("--target", help="new name for rename/duplicate")
    pr.add_argument(
        "--template", help="create: instantiate a builtin profile template"
    )
    pr.add_argument(
        "--vars", help="create --template: JSON object of template variables"
    )
    pr.add_argument("--file", help="export/import file path")
    pr.add_argument("--names", help="export: comma-separated name filter")
    pr.add_argument("--tags", help="tag filter / import default tags")
    pr.add_argument(
        "--no-stats", action="store_true",
        help="export without usage statistics",
    )
    pr.add_argument(
        "--overwrite", action="store_true",
        help="import: replace existing profiles",
    )
    pr.add_argument("--prefix", help="import: name prefix")
    pr.add_argument(
        "--validate", action="store_true",
        help="import: validate the file first",
    )
    pr.add_argument("--query", help="search: free-text query")
    pr.add_argument("--repository", help="search: repository filter")
    pr.add_argument(
        "--include-jql", action="store_true", dest="include_jql",
        help="search: match the query against jql too",
    )
    pr.set_defaults(fn=cmd_profile)

    sv = sub.add_parser("saved", help="saved-query store")
    sv.add_argument("action", choices=["save", "list", "run", "delete"])
    sv.add_argument("--store", required=True)
    sv.add_argument("--name")
    sv.add_argument("--jql")
    sv.add_argument("--description")
    sv.add_argument("--data", default="/root/testdata/sf0.001")
    sv.add_argument("--limit", type=int, default=20)
    sv.set_defaults(fn=cmd_saved)

    sr = sub.add_parser("serve", help="run the REST API server (SURVEY §3.2)")
    sr.add_argument("--base-url", required=True)
    sr.add_argument("--out", required=True)
    sr.add_argument("--host", default="127.0.0.1")
    sr.add_argument("--port", type=int, default=8080)
    sr.add_argument("--token")
    sr.set_defaults(fn=cmd_serve)

    ver = sub.add_parser("version")
    ver.set_defaults(fn=lambda a: (print(ENGINE_VERSION), 0)[1])
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
