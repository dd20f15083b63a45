"""Delta Lake backend for the sync-state store (SURVEY §7 names Delta as
the guiding transactional-table choice; state.py's versioned-parquet +
pointer-flip store is the dependency-free restatement of the same ideas).

When the ``delta-spark`` package is importable, ``DeltaSyncStateStore``
replaces the hand-rolled version directories with a real transactional
table:

* S7 atomic save        → one Delta commit (optimistic concurrency)
* C5 partition-scoped   → ``MERGE INTO`` with an ``s.project_key IN
  MERGE                   (...)`` merge condition — Delta file-skips
                          every untouched partition, the same write
                          scoping the hard-link carry-forward provides
* S10 backup/restore    → ``RESTORE TABLE ... VERSION AS OF`` (native
                          time travel instead of pointer flips)
* vacuum                → ``VACUUM`` (retention-checked file GC)

The update projection (latest-per-key dedup, checksum, yaml path) is
shared with the parquet backend via :func:`state.merge_updates`, so both
backends upsert byte-identical values and the parquet backend's
idempotence tests apply verbatim (tests/test_state_delta.py runs them
against this class whenever delta-spark is present; it import-skips
otherwise — this sandbox has no delta-spark, so the class is exercised
only where a deployment provides it).

Select a backend with :func:`open_state_store` (explicit arg or
``SPARK_GRAFT_STATE_BACKEND=delta``).
"""

from __future__ import annotations

import os
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jira_cdc_git_spark import schemas
from jira_cdc_git_spark.state import SyncStateStore, merge_updates


def delta_available() -> bool:
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


def open_state_store(root: str, backend: str | None = None) -> SyncStateStore:
    """Factory: ``backend`` = 'parquet' (default) or 'delta';
    ``SPARK_GRAFT_STATE_BACKEND`` overrides when ``backend`` is None.
    Asking for delta without delta-spark installed raises ImportError
    rather than silently degrading (state format is not a thing to
    switch by accident)."""
    choice = backend or os.environ.get("SPARK_GRAFT_STATE_BACKEND", "parquet")
    if choice == "delta":
        if not delta_available():
            raise ImportError(
                "SPARK_GRAFT_STATE_BACKEND=delta but delta-spark is not "
                "importable"
            )
        return DeltaSyncStateStore(root)
    return SyncStateStore(root)


class DeltaSyncStateStore(SyncStateStore):
    """SyncStateStore with the state table held in Delta Lake.

    History/operation-log methods are inherited unchanged (the append-
    and-recap history table is format-agnostic); only the state table's
    load/save/merge/restore/vacuum move to Delta primitives.
    """

    @property
    def _table_path(self) -> str:
        return os.path.join(self.state_dir, "delta")

    def _exists(self, spark: SparkSession) -> bool:
        from delta.tables import DeltaTable

        return DeltaTable.isDeltaTable(spark, self._table_path)

    # -- versioning: Delta's own commit log --------------------------------

    def current_version(self) -> int:  # type: ignore[override]
        spark = SparkSession.getActiveSession()
        if spark is None or not self._exists(spark):
            return 0
        from delta.tables import DeltaTable

        last = (
            DeltaTable.forPath(spark, self._table_path)
            .history(1)
            .select("version")
            .collect()
        )
        return int(last[0]["version"]) + 1 if last else 0

    def load(self, spark: SparkSession) -> DataFrame:
        if not self._exists(spark):
            return spark.createDataFrame([], schemas.SYNC_STATE)
        df = spark.read.format("delta").load(self._table_path)
        return df.select(*[f.name for f in schemas.SYNC_STATE.fields])

    def save(self, df: DataFrame) -> int:
        (
            df.write.format("delta")
            .mode("overwrite")
            .option("overwriteSchema", "true")
            .partitionBy("project_key")
            .save(self._table_path)
        )
        return self.current_version()

    def restore(self, version: int) -> None:
        from delta.tables import DeltaTable

        spark = SparkSession.getActiveSession()
        DeltaTable.forPath(spark, self._table_path).restoreToVersion(version)

    def vacuum(self, keep: int = 5) -> None:
        from delta.tables import DeltaTable

        spark = SparkSession.getActiveSession()
        if self._exists(spark):
            DeltaTable.forPath(spark, self._table_path).vacuum()

    # -- C5: the one-line MERGE the parquet backend hand-rolls -------------

    def merge(
        self, spark: SparkSession, synced: DataFrame, now: datetime
    ) -> int:
        updates = merge_updates(synced)
        if not self._exists(spark):
            self.save(self._updates_as_state(updates, now))
            return self.current_version()

        from delta.tables import DeltaTable

        touched = sorted(
            r["u_project"]
            for r in updates.select("u_project").distinct().collect()
        )
        proj_list = ", ".join(f"'{p}'" for p in touched)
        tbl = DeltaTable.forPath(spark, self._table_path)
        (
            tbl.alias("s")
            .merge(
                updates.alias("u"),
                # project_key in the condition → partition/file skipping:
                # untouched projects are never read or rewritten (the
                # Delta-native form of the hard-link carry-forward)
                f"s.key = u.u_key AND s.project_key IN ({proj_list})",
            )
            .whenMatchedUpdate(
                set={
                    "last_synced": F.lit(now),
                    "last_updated": F.col("u.u_updated"),
                    "file_path": F.col("u.u_path"),
                    "checksum": F.col("u.u_checksum"),
                    "sync_status": F.lit("success"),
                    "error_message": F.lit(None).cast("string"),
                    "sync_count": F.col("s.sync_count") + F.lit(1),
                }
            )
            .whenNotMatchedInsert(
                values={
                    "key": F.col("u.u_key"),
                    "project_key": F.col("u.u_project"),
                    "last_synced": F.lit(now),
                    "last_updated": F.col("u.u_updated"),
                    "version": F.lit(1),
                    "file_path": F.col("u.u_path"),
                    "file_size": F.lit(0).cast("long"),
                    "checksum": F.col("u.u_checksum"),
                    "sync_status": F.lit("success"),
                    "error_message": F.lit(None).cast("string"),
                    "sync_count": F.lit(1).cast("int"),
                }
            )
            .execute()
        )
        return self.current_version()

    @staticmethod
    def _updates_as_state(updates: DataFrame, now: datetime) -> DataFrame:
        """First-batch bootstrap: the insert arm of the MERGE, as a plain
        projection (Delta requires an existing table to merge into)."""
        return updates.select(
            F.col("u_key").alias("key"),
            F.col("u_project").alias("project_key"),
            F.lit(now).alias("last_synced"),
            F.col("u_updated").alias("last_updated"),
            F.lit(1).alias("version"),
            F.col("u_path").alias("file_path"),
            F.lit(0).cast("long").alias("file_size"),
            F.col("u_checksum").alias("checksum"),
            F.lit("success").alias("sync_status"),
            F.lit(None).cast("string").alias("error_message"),
            F.lit(1).cast("int").alias("sync_count"),
        )
