"""Per-query profiler for the optimization rounds (guide §1: measure
first). For each named query it reports, on the bench session profile
(local[$SPARK_GRAFT_CPUS], same confs as bench.py):

* wall seconds for plan construction (Python DataFrame assembly — this
  includes any eager materialize()/first() driver loops the operator
  runs) and for the final noop-sink execution, two runs each (min);
* Spark job/stage/task counts attributed to the query via a dedicated
  job group (statusTracker);
* the formatted physical plan, optionally written to plans/r12/.

Usage:
    python tools/profile_query.py q1 q2 ...       # profile queries
    python tools/profile_query.py --plans q1 ...  # also write *_before.txt
    python tools/profile_query.py --suffix after --plans q1 ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E
from jira_cdc_git_spark.session import get_spark


def profile(names: list[str], write_plans: bool, suffix: str) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="profile")
    sc = spark.sparkContext
    qs = E.queries()
    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_DIR", "r13"),
    )
    os.makedirs(plans_dir, exist_ok=True)

    # warmup (same as bench)
    spark.read.parquet(f"{sf_dir}/nation.parquet").write.format("noop").mode(
        "overwrite"
    ).save()

    out = {}
    for name in names:
        fn = qs[name]
        runs = []
        for i in range(2):
            spark.catalog.clearCache()
            tracker = sc.statusTracker()
            before_jobs = set(tracker.getJobIdsForGroup(None) or [])
            sc.setJobGroup(f"prof_{name}_{i}", name)
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t_build = time.perf_counter() - t0
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t_exec = time.perf_counter() - t1
            group_jobs = tracker.getJobIdsForGroup(f"prof_{name}_{i}") or []
            n_stages = 0
            n_tasks = 0
            for jid in group_jobs:
                ji = tracker.getJobInfo(jid)
                if ji is None:
                    continue
                for sid in ji.stageIds:
                    si = tracker.getStageInfo(sid)
                    if si is not None:
                        n_stages += 1
                        n_tasks += si.numTasks
            sc.setJobGroup(None, None)
            runs.append(
                {
                    "build_s": round(t_build, 3),
                    "exec_s": round(t_exec, 3),
                    "total_s": round(t_build + t_exec, 3),
                    "n_jobs": len(group_jobs),
                    "n_stages": n_stages,
                    "n_tasks": n_tasks,
                }
            )
            if i == 0 and write_plans:
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
                with open(
                    os.path.join(plans_dir, f"{name}_{suffix}.txt"), "w"
                ) as fh:
                    fh.write(plan)
        best = min(runs, key=lambda r: r["total_s"])
        out[name] = {"best": best, "runs": runs}
        print(
            f"{name:40s} total={best['total_s']:7.3f}s "
            f"build={best['build_s']:7.3f}s exec={best['exec_s']:6.3f}s "
            f"jobs={best['n_jobs']:3d} stages={best['n_stages']:3d} "
            f"tasks={best['n_tasks']:4d}",
            flush=True,
        )
    print(json.dumps(out))


if __name__ == "__main__":
    args = [a for a in sys.argv[1:]]
    write_plans = "--plans" in args
    if write_plans:
        args.remove("--plans")
    suffix = "before"
    if "--suffix" in args:
        i = args.index("--suffix")
        suffix = args[i + 1]
        del args[i : i + 2]
    profile(args, write_plans, suffix)
