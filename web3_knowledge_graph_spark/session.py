"""SparkSession factory tuned for the KG-construction workload.

The reference parallelizes I/O with a joblib thread pool of
``max(8, 2*cpu_count)`` threads (/root/reference/pipelines/helpers/
multiprocessing.py:11); here parallelism is Spark task parallelism and the
session carries the scale-oriented configuration the north rule requires:
AQE (runtime re-plan + skew-join splitting), Arrow for vectorized pandas
UDFs, and shuffle-partition counts sized to the core count rather than the
default 200.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_cores() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)


def local_dir_conf(min_free_gb: int = 32) -> dict[str, str]:
    """Shuffle/spill scratch on tmpfs when the host provides one.

    Spark never fsyncs shuffle files, but routing them through a disk
    filesystem still pays block-layer + journaling overhead that all
    executors on one box contend on — measured 24% off the 4-executor
    full-stage wall time here. On a real cluster the equivalent is one
    NVMe/SSD spark.local.dir per node (each added executor brings its
    own), so using /dev/shm locally models the per-node scratch a cluster
    has, rather than granting every executor a shared spinning disk.
    Applied identically at every parallelism level; skipped when tmpfs is
    absent or small (falls back to Spark's java.io.tmpdir default).
    """
    shm = os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/dev/shm")
    try:
        st = os.statvfs(shm)
        if st.f_bavail * st.f_frsize >= min_free_gb * (1 << 30):
            path = os.path.join(shm, "wkg-spark-local")
            os.makedirs(path, exist_ok=True)
            return {"spark.local.dir": path}
    except OSError:
        pass
    return {}


def session_conf(
    cores: int | None = None, shuffle_partitions: int | None = None
) -> dict[str, str]:
    """The workload's SQL/runtime configuration, master-agnostic — shared
    by get_spark (local sessions) and cli._submitted_session (spark-submit,
    where --master/--driver-memory belong to the submitter). Every key here
    is safe under any master; spark.sql.* keys are also runtime-settable on
    an already-running session (apply_sql_conf)."""
    if cores is None:
        cores = default_cores()
    if shuffle_partitions is None:
        # 2x cores: enough tasks for AQE to coalesce, few enough to avoid
        # per-task overhead dominating at local scale. On a 1000-executor
        # cluster this would be sized to ~2-3x total executor cores.
        shuffle_partitions = max(2 * cores, 8)
    return {
        "spark.sql.shuffle.partitions": str(shuffle_partitions),
        "spark.default.parallelism": str(shuffle_partitions),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # let AQE coalesce INSIDE persist()-cached plans: off, a cached
        # multi-branch union materializes at sum-of-branches raw shuffle
        # partitions (22 feeds × 64 ≈ 1400 blocks here) and that degenerate
        # partitioning poisons every consumer stage; the trade (cached
        # output partitioning may change across re-materializations) is
        # irrelevant because all caches here are eagerly counted once
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning": "true",
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
        # pipeline date partitions / lineage marks / formatted timestamps
        # must not depend on the cluster's local timezone
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.files.maxPartitionBytes": str(64 * 1024 * 1024),
    }


def apply_sql_conf(spark: SparkSession) -> None:
    """Set the runtime-settable (spark.sql.*) subset on a live session —
    the fallback when spark-submit already created the session before our
    code ran."""
    for k, v in session_conf().items():
        if k.startswith("spark.sql."):
            spark.conf.set(k, v)


def gc_opts(cores: int) -> str:
    """GC worker threads scaled to the JVM's OWN core budget (~cores/2,
    capped), not the machine's vCPU count.

    G1's default one-GC-worker-per-vCPU storms the kernel on oversubscribed
    VMs (lock-holder preemption → 90% sys time), and even ParallelGC
    workers compete with task threads on allocation-heavy stages when
    over-provisioned. CRITICAL for multi-executor masters: each executor
    JVM sizes its GC pools to the MACHINE's vCPUs by default, so 4
    co-located 2-core executors spawn 4×32 GC threads — measured 25% off
    the 4-executor fused-stage wall (tools/scaling_probe.py noudf vs
    noudf+gc). Pass the PER-EXECUTOR core count.
    """
    gc_threads = max(2, min(8, cores // 2))
    return (
        f"-XX:+UseParallelGC -XX:ParallelGCThreads={gc_threads} "
        f"-XX:ConcGCThreads={max(1, gc_threads // 4)}"
    )


def get_spark(
    app_name: str = "web3_knowledge_graph_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores`` defaults to $SPARK_GRAFT_CPUS or all local cores. On a real
    cluster the same confs apply unchanged — nothing here is local-mode
    specific except the master URL.
    """
    if cores is None:
        cores = default_cores()

    opts = gc_opts(cores)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.driver.extraJavaOptions", opts)
        .config("spark.executor.extraJavaOptions", opts)
        # modest heap: a 48g heap measurably degrades GC at high thread
        # counts (old-gen scans + first-touch page faults); local sf0.1
        # workloads fit comfortably in 8g
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in {**session_conf(cores, shuffle_partitions), **local_dir_conf()}.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
