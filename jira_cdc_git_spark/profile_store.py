"""Persistent profile store — YAML-collection CRUD (A8/A9/W8 persistence;
reference: pkg/profile/manager.go FileProfileManager, collection layout
pkg/profile/types.go:139-144: ``.jira-sync-profiles/profiles.yaml``).

The profiles table is tiny (tens of rows), so the Spark-first split is:
persistence and CRUD are plain-file operations (atomic tmp+rename, like the
reference's SaveCollection manager.go:112-152), while every QUERY over
profiles — usage rollups, most-used, dynamic sort, similarity — is a
DataFrame op in plans.py operating on ``as_df()``. Nothing here ever
becomes a scale bottleneck; it's the driver-side config edge of the engine.
"""

from __future__ import annotations

import os
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession

from jira_cdc_git_spark import schemas

PROFILES_DIR = ".jira-sync-profiles"  # types.go:141
PROFILES_FILE = "profiles.yaml"  # types.go:142

_FIELDS = [f.name for f in schemas.PROFILES.fields]
_TS_FIELDS = {"last_used"}


class ProfileStore:
    """YAML-collection-backed profile manager (CreateProfile / GetProfile /
    UpdateProfile / DeleteProfile / RecordUsage / GetMostUsedProfiles,
    manager.go:155-497)."""

    def __init__(self, base_dir: str):
        self.base = base_dir
        self.dir = os.path.join(base_dir, PROFILES_DIR)
        self.path = os.path.join(self.dir, PROFILES_FILE)

    # -- collection I/O (manager.go:50-152) --------------------------------

    def _load(self) -> dict[str, dict]:
        import yaml

        if not os.path.isfile(self.path):
            return {}
        with open(self.path) as f:
            doc = yaml.safe_load(f) or {}
        out = {}
        for p in doc.get("profiles", []):
            if "last_used" in p and isinstance(p["last_used"], str):
                p["last_used"] = datetime.fromisoformat(p["last_used"])
            out[p["name"]] = p
        return out

    def _save(self, profiles: dict[str, dict]) -> None:
        """Atomic tmp+rename (SaveCollection manager.go:112-152)."""
        import yaml

        os.makedirs(self.dir, exist_ok=True)
        rows = []
        for name in sorted(profiles):
            p = dict(profiles[name])
            if isinstance(p.get("last_used"), datetime):
                p["last_used"] = p["last_used"].isoformat()
            rows.append(p)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            yaml.safe_dump({"version": 1, "profiles": rows}, f, sort_keys=True)
        os.replace(tmp, self.path)

    # -- CRUD (manager.go:155-251) -----------------------------------------

    def create(self, profile: dict) -> None:
        profiles = self._load()
        name = profile.get("name")
        if not name:
            raise ValueError("profile needs a name")
        if name in profiles:
            raise ValueError(f"profile {name!r} already exists")
        defaults = {"times_used": 0, "success_rate": None,
                    "avg_sync_time_ms": None, "last_used": None}
        profiles[name] = {**defaults, **profile}
        self._save(profiles)

    def get(self, name: str) -> dict:
        profiles = self._load()
        if name not in profiles:
            raise KeyError(name)
        return profiles[name]

    def update(self, name: str, changes: dict) -> None:
        profiles = self._load()
        if name not in profiles:
            raise KeyError(name)
        profiles[name].update(changes)
        self._save(profiles)

    def delete(self, name: str) -> None:
        profiles = self._load()
        if name not in profiles:
            raise KeyError(name)
        del profiles[name]
        self._save(profiles)

    def exists(self, name: str) -> bool:
        return name in self._load()

    def list_names(self) -> list[str]:
        return sorted(self._load())

    # -- A8 usage stats (RecordUsage manager.go:423-463) -------------------

    def record_usage(self, name: str, sync_ms: int, success: bool,
                     at: datetime) -> None:
        """times_used++, rolling mean sync time and success rate — the
        same running-mean update plans.record_usage applies columnar."""
        p = self.get(name)
        n = p.get("times_used") or 0
        avg = p.get("avg_sync_time_ms") or 0
        rate = p.get("success_rate") or 0.0
        self.update(
            name,
            {
                "times_used": n + 1,
                "last_used": at,
                "avg_sync_time_ms": int((avg * n + sync_ms) / (n + 1)),
                "success_rate": (rate * n + (1.0 if success else 0.0))
                / (n + 1),
            },
        )

    # -- DataFrame view: every profile QUERY runs on this ------------------

    def as_df(self, spark: SparkSession) -> DataFrame:
        rows = []
        for p in self._load().values():
            rows.append(tuple(p.get(f) for f in _FIELDS))
        return spark.createDataFrame(rows, schemas.PROFILES)

    def save_df(self, profiles: DataFrame) -> None:
        """Persist a (small) profiles DataFrame back to the collection —
        the bridge from plans.record_usage's columnar update."""
        out = {}
        for r in profiles.collect():
            d = r.asDict()
            out[d["name"]] = {
                k: (list(v) if isinstance(v, (list, tuple)) else v)
                for k, v in d.items()
            }
        self._save(out)
