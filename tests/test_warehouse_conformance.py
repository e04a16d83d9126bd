"""Conformance suite: pin the parquet+pointer warehouse stand-in to Apache
Iceberg's DOCUMENTED table behavior (VERDICT round-4 item 9 — no Iceberg
runtime jar ships in this container, so the swap-compatibility claim in
sources/warehouse.py is proven against the spec's observable contract
instead of the real format).

Each test names the Iceberg behavior it pins (public docs: the Iceberg
table spec https://iceberg.apache.org/spec/ and the Spark DDL/queries
pages). Where the stand-in DELIBERATELY diverges, the test pins the
divergent behavior and the docstring says so — a silent divergence is the
failure mode this suite exists to catch, not divergence itself.

Reference analog for the MERGE divergence: the reference's Cypher
``MERGE … ON CREATE SET … ON MATCH SET`` (helpers/queries.py:21-38) is
last-write-wins per natural key, never a cardinality error.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from web3_knowledge_graph_spark.sources.warehouse import Table, Warehouse


def _rows(df):
    return {tuple(r) for r in df.collect()}


# ---------------------------------------------------------------- snapshots


def test_time_travel_every_version_immutable(spark, tmp_path):
    """Iceberg spec: snapshots are immutable; ``VERSION AS OF n`` returns
    the table exactly as committed. Every historical version must stay
    byte-stable under later commits."""
    t = Table(str(tmp_path), "t")
    v1 = t.overwrite(spark.createDataFrame([(1, "a")], "id long, v string"))
    v2 = t.overwrite(spark.createDataFrame([(2, "b")], "id long, v string"))
    v3 = t.append(spark, spark.createDataFrame([(3, "c")], "id long, v string"))
    assert (v1, v2, v3) == (1, 2, 3)
    assert _rows(t.read(spark, version=1)) == {(1, "a")}
    assert _rows(t.read(spark, version=2)) == {(2, "b")}
    assert _rows(t.read(spark, version=3)) == {(2, "b"), (3, "c")}
    # current == latest, and history is complete (no version GC'd)
    assert _rows(t.read(spark)) == _rows(t.read(spark, version=3))


def test_reader_pins_snapshot_not_pointer(spark, tmp_path):
    """Iceberg readers resolve a snapshot ONCE and scan its manifests; a
    concurrent commit never changes what an in-flight reader sees
    (serializable snapshot isolation for reads). The stand-in must give a
    read() handle the same guarantee: it resolves the version at call
    time and scans that immutable directory, not the mutable pointer."""
    t = Table(str(tmp_path), "t")
    t.overwrite(spark.createDataFrame([(1,)], "id long"))
    handle = t.read(spark)  # resolved against v1
    t.overwrite(spark.createDataFrame([(99,)], "id long"))  # commit v2
    assert _rows(handle) == {(1,)}  # the old handle still reads v1
    assert _rows(t.read(spark)) == {(99,)}  # a new read sees v2


def test_commit_atomicity_crash_never_visible(spark, tmp_path):
    """Iceberg spec: a commit is the atomic swap of the metadata pointer;
    a writer that dies before the swap leaves NOTHING visible to readers.
    Simulate the crash window (snapshot directory fully written, pointer
    not swapped): reads — current and time-travel — are unaffected, and
    the half-commit is not readable as any version."""
    t = Table(str(tmp_path), "t")
    t.overwrite(spark.createDataFrame([(1,)], "id long"))
    orphan = t._snap_path(2)
    os.makedirs(orphan)  # crashed writer's committed-but-unpointed snapshot
    with open(os.path.join(orphan, "part-0.parquet"), "w") as f:
        f.write("partial")
    assert t.current_version() == 1
    assert _rows(t.read(spark)) == {(1,)}
    # recovery: the NEXT commit must clear the orphan's number and win
    v = t.overwrite(spark.createDataFrame([(2,)], "id long"))
    assert v == 3 and _rows(t.read(spark)) == {(2,)}


def test_versions_monotonic_per_commit(spark, tmp_path):
    """Iceberg's snapshot log is append-only and strictly ordered; every
    commit — even one writing identical data — creates a NEW snapshot.
    Pin: version ids increase by exactly 1 per successful commit."""
    t = Table(str(tmp_path), "t")
    df = spark.createDataFrame([(1,)], "id long")
    assert [t.overwrite(df), t.overwrite(df), t.overwrite(df)] == [1, 2, 3]


# -------------------------------------------------------------------- MERGE


def test_merge_matched_update_not_matched_insert_rest_untouched(spark, tmp_path):
    """The MERGE INTO contract (Iceberg Spark writes doc): WHEN MATCHED →
    UPDATE, WHEN NOT MATCHED → INSERT, and target rows with no matching
    source row are carried through unchanged."""
    t = Table(str(tmp_path), "t")
    t.overwrite(
        spark.createDataFrame(
            [(1, "a", "t0"), (2, "b", "t0")], "id long, v string, last_update_dt string"
        )
    )
    t.merge_upsert(
        spark,
        spark.createDataFrame(
            [(2, "B", "t1"), (3, "c", "t1")], "id long, v string, last_update_dt string"
        ),
        keys=["id"],
    )
    assert _rows(t.read(spark).select("id", "v")) == {(1, "a"), (2, "B"), (3, "c")}


def test_merge_cardinality_divergence_latest_wins_deterministic(spark, tmp_path):
    """DOCUMENTED DIVERGENCE. Iceberg/Spark MERGE raises
    MERGE_CARDINALITY_VIOLATION when one target row matches multiple
    source rows; the stand-in instead resolves latest-wins on
    ``order_col`` — the reference's Cypher MERGE semantics
    (helpers/queries.py:21-38), which every call site expects. Pin that
    the resolution is DETERMINISTIC: one surviving row per key, the
    max-order_col row, regardless of input partitioning or row order."""
    t = Table(str(tmp_path), "t")
    dup = [(1, "old", "t1"), (1, "new", "t9"), (1, "mid", "t5")]
    for perm in (dup, dup[::-1], [dup[2], dup[0], dup[1]]):
        t2 = Table(str(tmp_path), f"t{hash(tuple(perm)) & 0xFFFF}")
        t2.merge_upsert(
            spark,
            spark.createDataFrame(perm, "id long, v string, last_update_dt string")
            .repartition(4),
            keys=["id"],
        )
        assert _rows(t2.read(spark).select("id", "v")) == {(1, "new")}


def test_merge_idempotent_replay_content_stable(spark, tmp_path):
    """Re-running the same MERGE must be a content no-op (the pipeline's
    resume-equals-fresh contract; Iceberg still writes a new snapshot, and
    so does the stand-in — pin both halves)."""
    t = Table(str(tmp_path), "t")
    ups = spark.createDataFrame(
        [(1, "a", "t1"), (2, "b", "t1")], "id long, v string, last_update_dt string"
    )
    v1 = t.merge_upsert(spark, ups, keys=["id"])
    before = _rows(t.read(spark))
    v2 = t.merge_upsert(spark, ups, keys=["id"])
    assert v2 == v1 + 1  # a new snapshot exists …
    assert _rows(t.read(spark)) == before  # … with identical content
    assert _rows(t.diff(spark, ["id"], v1, v2)) == set()  # and an empty changelog


# --------------------------------------------------------- schema evolution


def test_schema_evolution_added_column_reads_null_for_old_rows(spark, tmp_path):
    """Iceberg schema evolution: a newly added column is nullable and old
    data files read NULL for it — no rewrite of existing files. The
    stand-in's unionByName(allowMissingColumns=True) paths must behave
    identically for both append and merge."""
    t = Table(str(tmp_path), "t")
    t.overwrite(spark.createDataFrame([(1, "a")], "id long, v string"))
    t.append(
        spark,
        spark.createDataFrame([(2, "b", "x")], "id long, v string, extra string"),
    )
    assert _rows(t.read(spark)) == {(1, "a", None), (2, "b", "x")}

    m = Table(str(tmp_path), "m")
    m.merge_upsert(
        spark,
        spark.createDataFrame([(1, "a", "t1")], "id long, v string, last_update_dt string"),
        keys=["id"],
    )
    m.merge_upsert(
        spark,
        spark.createDataFrame(
            [(2, "b", "t2", "x")],
            "id long, v string, last_update_dt string, extra string",
        ),
        keys=["id"],
    )
    got = {(r.id, r.v, r.extra) for r in m.read(spark).collect()}
    assert got == {(1, "a", None), (2, "b", "x")}


# --------------------------------------------------------------- partitions


def test_partitioned_snapshot_prunes_at_scan(spark, tmp_path):
    """Iceberg's partition pruning: a filter on the partition column must
    reach the scan as a partition filter (file skipping), not a post-scan
    row filter. The stand-in writes hive-layout parquet, so Spark's
    PartitionFilters must carry the predicate."""
    t = Table(str(tmp_path), "t")
    df = spark.range(100).withColumn(
        "d", F.when(F.col("id") % 2 == 0, "even").otherwise("odd")
    )
    t.overwrite(df, partition_by=["d"])
    q = t.read(spark).where(F.col("d") == "even")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "even" in plan, plan
    assert q.count() == 50


# --------------------------------------------------------------- changelog


def test_diff_matches_changelog_semantics(spark, tmp_path):
    """Iceberg CDC (``table_changes``) semantics restated over two
    snapshots: inserted / deleted / updated keys, unchanged keys omitted."""
    t = Table(str(tmp_path), "t")
    v1 = t.overwrite(
        spark.createDataFrame(
            [(1, "same"), (2, "was"), (3, "gone")], "id long, v string"
        )
    )
    v2 = t.overwrite(
        spark.createDataFrame(
            [(1, "same"), (2, "now"), (4, "new")], "id long, v string"
        )
    )
    got = {(r.id, r.change) for r in t.diff(spark, ["id"], v1, v2).collect()}
    assert got == {(2, "changed"), (3, "removed"), (4, "added")}


def test_diff_detects_null_shift_between_columns(spark, tmp_path):
    """(NULL,'x') → ('x',NULL) must report 'changed' — Spark's hash
    functions fold NULL inputs as a no-op, so a naive xxhash64(cols) would
    miss it (the warehouse.diff docstring's stated reason for hashing the
    JSON encoding). Pin the guarantee, not the implementation."""
    t = Table(str(tmp_path), "t")
    v1 = t.overwrite(
        spark.createDataFrame([(1, None, "x")], "id long, a string, b string")
    )
    v2 = t.overwrite(
        spark.createDataFrame([(1, "x", None)], "id long, a string, b string")
    )
    got = {(r.id, r.change) for r in t.diff(spark, ["id"], v1, v2).collect()}
    assert got == {(1, "changed")}


def test_diff_column_add_is_schema_change_not_row_change(spark, tmp_path):
    """Iceberg: adding a column is a schema evolution, not a row-level
    change — ``table_changes`` reports nothing for untouched rows. The
    stand-in compares only the column intersection, giving the same
    answer; pin it so a future 'hash all columns' rewrite can't silently
    turn every schema migration into a full-table 'changed' storm."""
    t = Table(str(tmp_path), "t")
    v1 = t.overwrite(spark.createDataFrame([(1, "a")], "id long, v string"))
    v2 = t.overwrite(
        spark.createDataFrame([(1, "a", "x")], "id long, v string, extra string")
    )
    assert _rows(t.diff(spark, ["id"], v1, v2)) == set()


def test_warehouse_catalog_namespacing(spark, tmp_path):
    """Catalog behavior: tables are independent namespaces — commits to one
    never move another's pointer (the Warehouse root is the stand-in for
    an Iceberg catalog; sources/warehouse.py:200-208)."""
    wh = Warehouse(str(tmp_path / "wh"))
    a, b = wh.table("a"), wh.table("b")
    a.overwrite(spark.createDataFrame([(1,)], "id long"))
    assert not b.exists()
    b.overwrite(spark.createDataFrame([(2,)], "id long"))
    a.overwrite(spark.createDataFrame([(3,)], "id long"))
    assert a.current_version() == 2 and b.current_version() == 1
    assert _rows(b.read(spark)) == {(2,)}


def test_pointer_cas_never_regresses(spark, tmp_path):
    """Iceberg catalog commits are compare-and-set: a stalled writer
    holding an OLDER claimed version must not move the current pointer
    backward over a newer concurrent commit. _swap_pointer is that CAS."""
    t = Table(str(tmp_path), "t")
    t.overwrite(spark.createDataFrame([(1, "a")], "id long, v string"))
    t.overwrite(spark.createDataFrame([(2, "b")], "id long, v string"))
    assert t.current_version() == 2
    # the stalled writer resumes with its older claim: refused, no regress
    assert t._swap_pointer(1) is False
    assert t.current_version() == 2
    # a genuinely newer claim still advances
    assert t._swap_pointer(5) is True
    assert t.current_version() == 5


def test_commit_conflict_surfaces_not_silent_success(spark, tmp_path):
    """Iceberg rejects an optimistic commit whose base is stale; returning
    success while the pointer points elsewhere would silently drop the
    writer's rows from the current table. merge_upsert must re-derive
    from the NEW current state when its commit loses the pointer CAS."""
    from web3_knowledge_graph_spark.sources.warehouse import CommitConflict

    t = Table(str(tmp_path), "t")
    t.overwrite(
        spark.createDataFrame([(1, "a", 1)], "id long, v string, ts long")
    )

    # simulate one lost pointer race: the first swap attempt is refused
    real_swap = t._swap_pointer
    fails = {"left": 1}

    def flaky_swap(v):
        if fails["left"]:
            fails["left"] -= 1
            return False
        return real_swap(v)

    t._swap_pointer = flaky_swap
    v = t.merge_upsert(
        spark,
        spark.createDataFrame([(2, "b", 2)], "id long, v string, ts long"),
        keys=["id"],
        order_col="ts",
    )
    assert _rows(t.read(spark)) == {(1, "a", 1), (2, "b", 2)}
    assert t.current_version() == v

    # a swap that NEVER succeeds surfaces as CommitConflict, not success
    t._swap_pointer = lambda v: False
    with pytest.raises(CommitConflict):
        t.merge_upsert(
            spark,
            spark.createDataFrame([(3, "c", 3)], "id long, v string, ts long"),
            keys=["id"],
            order_col="ts",
        )


def test_merge_tiebreak_skips_unorderable_columns(spark, tmp_path):
    """A map-typed column must not join the deterministic tiebreak ORDER
    BY (Spark rejects map types in ordering at plan time) — the merge
    succeeds and the tiebreak still runs over the orderable columns."""
    t = Table(str(tmp_path), "t")
    df = spark.createDataFrame(
        [(1, "a", {"k": "v"}, 10)],
        "id long, v string, props map<string,string>, ts long",
    )
    t.overwrite(df)
    up = spark.createDataFrame(
        # two update rows share (id, ts): the orderable tiebreak column v
        # decides the survivor deterministically ('z' > 'y' descending)
        [(1, "z", {"k": "w"}, 20), (1, "y", {"k": "x"}, 20)],
        "id long, v string, props map<string,string>, ts long",
    )
    for _ in range(2):  # deterministic across replays
        t.merge_upsert(spark, up, keys=["id"], order_col="ts")
        got = t.read(spark).collect()
        assert len(got) == 1 and got[0].v == "z" and got[0].ts == 20
