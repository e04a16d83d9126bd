"""Versioned parquet table layer with Iceberg-shaped semantics.

The target design is Iceberg (`MERGE INTO`, snapshot reads, partition
pruning — SURVEY.md §1 "Spark mapping"); this container ships no Iceberg
runtime jar, so this module provides the same semantics on plain parquet:

  table_dir/
    snapshots/v{N:08d}/   ← immutable parquet snapshot (atomic: temp + rename)
    _CURRENT              ← pointer file, atomically replaced (os.replace)

* ``merge_upsert`` = MERGE INTO … WHEN MATCHED UPDATE WHEN NOT MATCHED
  INSERT, implemented as union + row_number-per-key (latest wins).
* old snapshots are retained → time travel / incremental diff reads, the
  analog of Iceberg snapshot reads the reference's date-window landing-file
  pruning approximates (/root/reference/pipelines/helpers/s3.py:301-326).
* the reference's refuse-to-overwrite guard (s3.py:48-50,293-295 —
  ALLOW_OVERRIDE) is unnecessary: snapshots are append-only and the pointer
  swap is atomic, so a crashed writer never corrupts the current version.

On a real cluster this module is swapped for the Iceberg catalog — call
sites only use read/overwrite/merge_upsert.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


class CommitConflict(RuntimeError):
    """A concurrent writer committed a newer version between this commit's
    base read and its pointer swap — the optimistic-commit conflict
    Iceberg's catalog CAS rejects. Callers whose content derives from the
    table's prior state must re-read and re-derive (append/merge_upsert do
    this automatically, bounded)."""


class Table:
    def __init__(self, root: str, name: str):
        self.dir = os.path.join(root, name)
        self.snap_dir = os.path.join(self.dir, "snapshots")
        self.pointer = os.path.join(self.dir, "_CURRENT")

    # -- snapshot bookkeeping -------------------------------------------------
    def current_version(self) -> int | None:
        try:
            with open(self.pointer) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return None

    def exists(self) -> bool:
        return self.current_version() is not None

    def _snap_path(self, v: int) -> str:
        return os.path.join(self.snap_dir, f"v{v:08d}")

    def _max_snapshot_on_disk(self) -> int:
        """Highest version directory under snapshots/ — including ORPHANS
        (committed directory, pointer never swapped because the writer
        crashed between the two steps). The next version must clear every
        directory that exists, not just the pointer: reusing an orphan's
        number makes os.rename(tmp, path) fail forever (ENOTEMPTY) and
        bricks the table."""
        try:
            vs = [
                int(n[1:])
                for n in os.listdir(self.snap_dir)
                if n.startswith("v") and n[1:].isdigit()
            ]
        except FileNotFoundError:
            return 0
        return max(vs, default=0)

    def _swap_pointer(self, v: int) -> bool:
        """Monotone compare-and-set pointer swap under a file lock.

        A bare os.replace let a STALLED winner of an older version number
        move the pointer BACKWARD over a newer concurrent commit (claim
        v=5, stall, another writer commits v=6 and swaps, resume, swap to
        5 — latest-snapshot readers silently regress). The flock + re-read
        only ever ADVANCES the pointer; returns False when a newer version
        is already current. Single-host stand-in for Iceberg's catalog CAS
        commit."""
        import fcntl
        import uuid

        ptmp = f"{self.pointer}.tmp.{os.getpid()}.{uuid.uuid4().hex[:8]}"
        os.makedirs(self.dir, exist_ok=True)
        with open(ptmp, "w") as f:
            f.write(str(v))
        with open(self.pointer + ".lock", "w") as lk:
            fcntl.flock(lk, fcntl.LOCK_EX)
            try:
                if (self.current_version() or 0) < v:
                    os.replace(ptmp, self.pointer)  # atomic pointer swap
                    return True
                os.remove(ptmp)  # a newer commit already won
                return False
            finally:
                fcntl.flock(lk, fcntl.LOCK_UN)

    def _commit(
        self,
        df: DataFrame,
        partition_by: list[str] | None = None,
        base_independent: bool = False,
    ) -> int:
        # The tmp dir is PER-ATTEMPT unique (pid + random suffix) and the
        # version is claimed by an atomic os.rename that FAILS if another
        # writer already committed that number — two concurrent writers
        # (orchestrator retry racing a live driver) each produce a
        # self-consistent snapshot instead of interleaving part-files in
        # a shared tmp dir; the loser retries under the next version
        # (Iceberg's optimistic-commit shape).
        #
        # Losing the POINTER CAS after winning the snapshot claim means a
        # newer version became current between this commit's base read and
        # its swap. ``base_independent=True`` (overwrite: the content does
        # not derive from the table's prior state) simply re-claims the
        # next version; otherwise CommitConflict propagates so the caller
        # re-reads the new current state and re-derives — returning the
        # claimed version as a success would silently drop this commit's
        # rows from the current table (the never-current snapshot stays on
        # disk as an orphan, like Iceberg's orphan files, until pruned).
        import uuid

        for _ in range(3):
            v = max(self.current_version() or 0, self._max_snapshot_on_disk()) + 1
            path = self._snap_path(v)
            tmp = f"{path}.tmp.{os.getpid()}.{uuid.uuid4().hex[:8]}"
            w = df.write
            if partition_by:
                w = w.partitionBy(*partition_by)
            w.mode("overwrite").parquet(tmp)
            try:
                os.rename(tmp, path)
            except OSError:
                shutil.rmtree(tmp, ignore_errors=True)  # lost the race
                continue
            if self._swap_pointer(v):
                return v
            if not base_independent:
                raise CommitConflict(
                    f"table {self.dir}: version {v} was claimed but a newer "
                    "version became current before the pointer swap; "
                    "re-derive from the new current state and retry"
                )
        raise RuntimeError(
            f"table {self.dir}: lost the commit race 3 times in a row"
        )

    # -- public API -----------------------------------------------------------
    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        v = version if version is not None else self.current_version()
        if v is None:
            raise FileNotFoundError(f"table {self.dir} has no current snapshot")
        return spark.read.parquet(self._snap_path(v))

    def overwrite(self, df: DataFrame, partition_by: list[str] | None = None) -> int:
        return self._commit(df, partition_by, base_independent=True)

    def append(self, spark: SparkSession, df: DataFrame, retries: int = 3) -> int:
        # optimistic-commit retry: on conflict, re-read the NEW current
        # snapshot and re-derive (the stale union must not be committed)
        for _ in range(retries):
            try:
                base = df
                if self.exists():
                    base = self.read(spark).unionByName(
                        df, allowMissingColumns=True
                    )
                return self._commit(base)
            except CommitConflict:
                continue
        raise CommitConflict(
            f"table {self.dir}: append lost {retries} optimistic-commit races"
        )

    def merge_upsert(
        self,
        spark: SparkSession,
        updates: DataFrame,
        keys: list[str],
        order_col: str = "last_update_dt",
    ) -> int:
        """MERGE INTO this USING updates ON keys — latest row per key wins.

        Matches the reference's MERGE … ON CREATE SET … ON MATCH SET …
        upserts (helpers/queries.py:21-38 and every cyphers file): idempotent
        by natural key, updates overwrite stale property values.

        ON CREATE / ON MATCH audit split (queries.py:29-33): when both the
        base table and the updates carry a ``created_dt`` column, a matched
        key keeps the EARLIEST created_dt (the original creation stamp)
        while last_update_dt/ingested_by come from the winning (newest)
        row — so re-ingesting an unchanged entity bumps last_update_dt but
        never rewrites created_dt.

        Optimistic-commit retry: a CommitConflict (another writer swapped
        the pointer between this merge's base read and its commit) re-runs
        the whole read+merge against the NEW current snapshot, bounded.
        """
        for _ in range(3):
            try:
                return self._merge_once(spark, updates, keys, order_col)
            except CommitConflict:
                continue
        raise CommitConflict(
            f"table {self.dir}: merge_upsert lost 3 optimistic-commit races"
        )

    def _merge_once(
        self,
        spark: SparkSession,
        updates: DataFrame,
        keys: list[str],
        order_col: str,
    ) -> int:
        updates = updates.withColumn("_src_rank", F.lit(1))
        if self.exists():
            base = self.read(spark).withColumn("_src_rank", F.lit(0))
            merged = base.unionByName(updates, allowMissingColumns=True)
        else:
            merged = updates
        # deterministic tiebreak: update rows from one run commonly share
        # a single order_col stamp, and a bare (_src_rank, order_col)
        # ordering would let the shuffle pick the survivor — every
        # remaining ORDERABLE column joins the ordering so re-running the
        # same merge always keeps the same row (idempotence, and
        # Table.diff reports no phantom changes between reruns). Map
        # columns (and arrays/structs containing them) are excluded:
        # Spark rejects them in ORDER BY at plan time, and a merge that
        # worked before the tiebreak must not start throwing. Rows that
        # differ ONLY in an unorderable column keep an arbitrary-but-
        # stable-per-run survivor — the pre-tiebreak behavior, now
        # confined to that residual case.
        def _orderable(dt) -> bool:
            from pyspark.sql import types as T

            if isinstance(dt, T.MapType):
                return False
            if isinstance(dt, T.ArrayType):
                return _orderable(dt.elementType)
            if isinstance(dt, T.StructType):
                return all(_orderable(f.dataType) for f in dt.fields)
            return True

        orderable = {
            f.name for f in merged.schema.fields if _orderable(f.dataType)
        }
        tie_cols = [
            c
            for c in merged.columns
            if c not in (*keys, order_col, "_src_rank") and c in orderable
        ]
        w = Window.partitionBy(*keys).orderBy(
            F.col("_src_rank").desc(),
            F.col(order_col).desc_nulls_last(),
            *[F.col(c).desc_nulls_last() for c in tie_cols],
        )
        merged = merged.withColumn("_rn", F.row_number().over(w))
        if "created_dt" in merged.columns:
            # same partitioning as the row_number window → one exchange
            merged = merged.withColumn(
                "_created_first", F.min("created_dt").over(Window.partitionBy(*keys))
            )
            dedup = (
                merged.where(F.col("_rn") == 1)
                .withColumn(
                    "created_dt", F.coalesce(F.col("_created_first"), F.col("created_dt"))
                )
                .drop("_rn", "_src_rank", "_created_first")
            )
        else:
            dedup = merged.where(F.col("_rn") == 1).drop("_rn", "_src_rank")
        return self._commit(dedup)

    def diff(
        self,
        spark: SparkSession,
        keys: list[str],
        v_old: int,
        v_new: int | None = None,
    ) -> DataFrame:
        """Change-data-capture between two snapshots: (keys..., change)
        with change ∈ {'added', 'removed', 'changed'}; unchanged keys are
        omitted. ``v_new`` defaults to the current version.

        The reference diffs table states driver-side in pandas (reconcile
        scripts); here it is one full-outer join on the keys comparing an
        xxhash64 over the NON-KEY columns common to both versions — each
        side shuffles once on the keys and only (key, hash) rows move, so
        the diff never transports row payloads. Assumes keys are unique
        per snapshot (the merge_upsert contract); duplicate keys would
        fan out in the join.

        The hash goes through ``to_json(struct(...))``, not bare
        ``xxhash64(cols...)``: Spark's hash functions fold NULL inputs as
        a no-op (the seed passes through unchanged), so a value *moving
        between* NULL-holding columns — (NULL,'x') → ('x',NULL) — would
        hash identically and be reported unchanged. JSON encoding omits
        NULL fields by name, so any such shift changes the encoded text.
        Blind spot (by construction): columns present in only ONE version
        are excluded via the common-columns intersection — adding or
        dropping a column is a schema change, not a row change, and does
        not mark rows 'changed' by itself.
        """
        old, new = self.read(spark, v_old), self.read(spark, v_new)
        common = sorted(set(old.columns) & set(new.columns))
        non_keys = [c for c in common if c not in keys]
        hash_col = (
            F.xxhash64(F.to_json(F.struct(*non_keys)))
            if non_keys
            else F.lit(0).cast("long")
        )
        oh = old.select(*keys, hash_col.alias("_ho"))
        nh = new.select(*keys, hash_col.alias("_hn"))
        j = oh.join(nh, keys, "full_outer")
        change = (
            F.when(F.col("_ho").isNull(), F.lit("added"))
            .when(F.col("_hn").isNull(), F.lit("removed"))
            .when(F.col("_ho") != F.col("_hn"), F.lit("changed"))
        )
        return (
            j.withColumn("change", change)
            .where(F.col("change").isNotNull())
            .select(*keys, "change")
        )


class Warehouse:
    """A directory of named tables — the local stand-in for an Iceberg catalog."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def table(self, name: str) -> Table:
        return Table(self.root, name)
