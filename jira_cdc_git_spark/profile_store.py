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
import re
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession

from jira_cdc_git_spark import schemas

PROFILES_DIR = ".jira-sync-profiles"  # types.go:141
PROFILES_FILE = "profiles.yaml"  # types.go:142

#: validateProfileName (manager.go:647-661): alphanumeric + hyphen +
#: underscore only, non-empty.
_NAME_RE = re.compile(r"^[a-zA-Z0-9_-]+$")

#: ParseDuration-style rate-limit strings accepted by functions.scalar
#: .duration_ms — the Spark-side F10 parser; validation mirrors it.
_DURATION_RE = re.compile(r"^\d+(ms|s|m|h)$")

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

    # -- ops verbs (r7 verdict task 5; manager.go:372-645) -----------------

    @staticmethod
    def validate_name(name: str) -> str | None:
        """validateProfileName (manager.go:647-661) — returns the error
        string or None."""
        if not name:
            return "profile name cannot be empty"
        if not _NAME_RE.match(name):
            return (
                "profile name can only contain letters, numbers, "
                "hyphens, and underscores"
            )
        return None

    def duplicate(self, source_name: str, target_name: str) -> None:
        """DuplicateProfile (manager.go:372-389): copy under a new name,
        description prefixed 'Copy of', creation metadata and usage
        stats RESET — the copy starts life unused."""
        err = self.validate_name(target_name)
        if err:
            raise ValueError(err)
        src = self.get(source_name)  # KeyError if missing
        copy = dict(src)
        copy["name"] = target_name
        copy["description"] = f"Copy of {src.get('description') or ''}"
        copy.update(
            times_used=0, success_rate=None,
            avg_sync_time_ms=None, last_used=None,
        )
        self.create(copy)  # ValueError if target exists

    def rename(self, old_name: str, new_name: str) -> None:
        """RenameProfile (manager.go:392-420): same record under the new
        key — usage stats and options are PRESERVED (unlike duplicate);
        refuses an existing target."""
        err = self.validate_name(new_name)
        if err:
            raise ValueError(err)
        profiles = self._load()
        if old_name not in profiles:
            raise KeyError(old_name)
        if new_name in profiles:
            raise ValueError(f"profile {new_name!r} already exists")
        p = profiles.pop(old_name)
        p["name"] = new_name
        profiles[new_name] = p
        self._save(profiles)

    def backup(self) -> str:
        """BackupProfiles (manager.go:549-563): byte-copy the collection
        file to `<file>.backup`. Returns the backup path."""
        bak = self.path + ".backup"
        with open(self.path, "rb") as f:
            data = f.read()
        tmp = bak + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, bak)
        return bak

    def restore(self) -> None:
        """RestoreProfiles (manager.go:566-579): byte-copy the backup
        over the live collection (atomic replace)."""
        bak = self.path + ".backup"
        with open(bak, "rb") as f:
            data = f.read()
        tmp = self.path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, self.path)

    @staticmethod
    def validate_profile(p: dict) -> dict:
        """ValidateProfile (manager.go:254-313): name charset, EXACTLY
        one sync mode (jql | issue_keys | epic_key), repository
        required, rate-limit parseable, incremental+force mutually
        exclusive; out-of-range concurrency is a warning. Static — the
        template instantiator validates before any store exists."""
        errors, warnings = [], []
        name_err = ProfileStore.validate_name(p.get("name") or "")
        if name_err:
            errors.append(name_err)
        n_modes = sum(
            1
            for v in (p.get("jql"), p.get("epic_key"), p.get("issue_keys"))
            if v
        )
        if n_modes == 0:
            errors.append(
                "profile must specify at least one sync mode "
                "(JQL, issue keys, or epic key)"
            )
        elif n_modes > 1:
            errors.append(
                "profile can only specify one sync mode "
                "(JQL, issue keys, or epic key)"
            )
        if not p.get("repository"):
            errors.append("repository path is required")
        conc = p.get("concurrency")
        if conc is not None and not (1 <= conc <= 10):
            warnings.append("concurrency should be between 1 and 10")
        rl = p.get("rate_limit")
        if rl and not _DURATION_RE.match(rl):
            errors.append(f"invalid rate limit format: {rl!r}")
        if p.get("incremental") and p.get("force"):
            errors.append(
                "incremental and force options are mutually exclusive"
            )
        return {"valid": not errors, "errors": errors, "warnings": warnings}

    def validate_collection(self) -> dict:
        """ValidateCollection (manager.go:582-614): per-profile results
        folded into one report, messages prefixed with the profile
        name."""
        errors, warnings = [], []
        for name, p in sorted(self._load().items()):
            r = self.validate_profile(p)
            errors += [f"profile '{name}': {e}" for e in r["errors"]]
            warnings += [f"profile '{name}': {w}" for w in r["warnings"]]
        return {"valid": not errors, "errors": errors, "warnings": warnings}

    def repair_collection(self) -> list[str]:
        """RepairCollection — the reference stubs this ('not fully
        implemented', manager.go:617-636) but enumerates the intended
        behavior in its comment; this implements that enumeration:
        drop profiles that fail validation, keep the rest, return the
        removed names (empty when the collection was already valid)."""
        profiles = self._load()
        removed = sorted(
            name
            for name, p in profiles.items()
            if not self.validate_profile(p)["valid"]
        )
        if removed:
            for name in removed:
                del profiles[name]
            self._save(profiles)
        return removed

    # -- export / import (pkg/profile/import_export.go:15-170) -------------

    _STATS_DEFAULTS = {
        "times_used": 0, "success_rate": None,
        "avg_sync_time_ms": None, "last_used": None,
    }

    def export_profiles(
        self,
        path: str,
        names: list[str] | None = None,
        tags: list[str] | None = None,
        include_stats: bool = True,
    ) -> int:
        """ExportProfiles/ExportToFile (import_export.go:15-95): an
        explicit `names` list wins over the `tags` overlap filter (the
        reference's precedence); stats are optionally reset so shared
        profiles start clean. Returns the exported count."""
        profiles = self._load()
        if names:
            selected = {n: profiles[n] for n in names if n in profiles}
        elif tags:
            selected = {
                n: p
                for n, p in profiles.items()
                if set(p.get("tags") or []) & set(tags)
            }
        else:
            selected = dict(profiles)
        if not include_stats:
            selected = {
                n: {**p, **self._STATS_DEFAULTS}
                for n, p in selected.items()
            }
        import yaml

        rows = []
        for name in sorted(selected):
            p = dict(selected[name])
            if isinstance(p.get("last_used"), datetime):
                p["last_used"] = p["last_used"].isoformat()
            rows.append(p)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            yaml.safe_dump({"version": 1, "profiles": rows}, f,
                           sort_keys=True)
        os.replace(tmp, path)
        return len(rows)

    def import_profiles(
        self,
        path: str,
        overwrite: bool = False,
        prefix: str = "",
        default_tags: list[str] | None = None,
        validate: bool = False,
    ) -> dict:
        """ImportProfiles/ImportFromFile (import_export.go:97-200):
        prefix applies to every imported name; existing names are
        CONFLICTS skipped unless overwrite; default tags append
        deduplicated; optional pre-validation rejects the whole file on
        the first invalid profile (the reference's early return).
        Returns {'imported': [...], 'conflicts': [...]}."""
        import yaml

        with open(path) as f:
            doc = yaml.safe_load(f) or {}
        incoming = {p["name"]: dict(p) for p in doc.get("profiles", [])}
        if validate:
            for name, p in sorted(incoming.items()):
                r = self.validate_profile(p)
                if not r["valid"]:
                    raise ValueError(
                        f"profile {name!r} is invalid: "
                        + "; ".join(r["errors"])
                    )
        profiles = self._load()
        imported, conflicts = [], []
        for name in sorted(incoming):
            p = dict(incoming[name])
            final = prefix + name
            if final in profiles and not overwrite:
                conflicts.append(final)
                continue
            p["name"] = final
            if default_tags:
                seen = list(p.get("tags") or [])
                p["tags"] = seen + [
                    t for t in default_tags if t not in seen
                ]
            if isinstance(p.get("last_used"), str):
                p["last_used"] = datetime.fromisoformat(p["last_used"])
            profiles[final] = {**self._STATS_DEFAULTS, **p}
            imported.append(final)
        self._save(profiles)
        return {"imported": imported, "conflicts": conflicts}

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
