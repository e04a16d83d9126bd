"""Attribution probe for the full-stage executor-process scaling gap.

Runs the production extract stage at local-cluster[1,2,3072] (N) vs
local-cluster[4,2,3072] (4N), fresh JVM per measurement, in variants that
isolate one suspect each:

  full     — the stage as benched (Arrow UDF pass over NULL html + fused
             regex/dict/author projection + run-length counts + explode)
  noudf    — identical plan minus the ArrowEvalPython node (text used
             directly; valid here because the bench corpus carries
             pre-extracted text, so results are identical)
  arrowN   — full with spark.sql.execution.arrow.maxRecordsPerBatch=N

Usage: python tools/scaling_probe.py [variant ...]   (default: full noudf)
Worker: python tools/scaling_probe.py --worker <cores> <master> <variant>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, ".")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REP = 64


def worker(cores: int, master: str, variant: str) -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from web3_knowledge_graph_spark.driver_queries import _vocab_dict
    from web3_knowledge_graph_spark.functions import extraction
    from web3_knowledge_graph_spark.plans import pipeline as P
    from web3_knowledge_graph_spark.session import local_dir_conf, session_conf
    from web3_knowledge_graph_spark.sources.pages import synthesize_pages

    conf = {**session_conf(cores), **local_dir_conf()}
    if variant.startswith("arrow"):
        conf["spark.sql.execution.arrow.maxRecordsPerBatch"] = variant[5:]
    if variant.endswith("+gc"):
        # cap GC workers to the EXECUTOR's 2 cores: each executor JVM
        # otherwise sizes its GC pools to the machine's 32 vCPUs, so 4
        # executors spawn 4x32 GC threads (the documented kernel-storm
        # pathology get_spark already guards against in local mode)
        gc = "-XX:+UseParallelGC -XX:ParallelGCThreads=2 -XX:ConcGCThreads=1"
        conf["spark.executor.extraJavaOptions"] = gc
        conf["spark.driver.extraJavaOptions"] = gc
        variant = variant[: -len("+gc")]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    builder = (
        SparkSession.builder.master(master)
        .appName(f"probe-{variant}-{cores}")
        .config("spark.executorEnv.PYTHONPATH", repo)
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if variant == "noudf":
        # drop only the ArrowEvalPython node: the bench corpus has text
        # pre-extracted, so the coalesce(text, udf(html)) is text anyway
        P.with_extracted_text = lambda df, **kw: df

    pages = synthesize_pages(spark, SF_DIR)
    big = (
        pages.crossJoin(spark.range(REP).select(F.col("id").alias("_rep")))
        .withColumn("url", F.concat_ws("#", "url", F.col("_rep").cast("string")))
        .drop("_rep")
    )
    if variant == "realhtml":
        # the PRODUCTION extraction path: every row carries real html bytes
        # and the Arrow UDF does the actual HTML→text work (the null-html
        # bench corpus makes the UDF pass pure round-trip overhead instead)
        big = big.withColumn(
            "html",
            F.to_binary(
                F.concat(
                    F.lit("<html><head><script>var t='x';</script></head>"
                          "<body><!-- c --><div id=\"m\"><p>"),
                    F.col("text"),
                    F.lit("</p></div></body></html>"),
                ),
                F.lit("utf-8"),
            ),
        ).withColumn("text", F.lit(None).cast("string"))
    big = big.repartition(16 * cores).localCheckpoint()
    n = big.count()
    P.extract_stage(big.limit(2000).localCheckpoint(), _vocab_dict(spark)).count()
    times = []
    for _ in range(2):
        t0 = time.time()
        P.extract_stage(big, _vocab_dict(spark)).count()
        times.append(round(time.time() - t0, 3))
    print(json.dumps({"variant": variant, "cores": cores, "docs": n,
                      "secs": min(times), "all": times}))


def main(variants: list[str]) -> None:
    variants = variants or ["full", "noudf"]
    for v in variants:
        rs = {}
        for n, cores in ((1, 2), (4, 8)):
            out = subprocess.run(
                [sys.executable, __file__, "--worker", str(cores),
                 f"local-cluster[{n},2,3072]", v],
                capture_output=True, text=True, timeout=560,
            )
            lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
            if not lines:
                print(out.stdout[-2000:], out.stderr[-2000:])
                raise SystemExit(1)
            rs[n] = json.loads(lines[-1])
        sp = rs[1]["secs"] / rs[4]["secs"]
        print(
            f"{v}: n1={rs[1]['secs']}s n4={rs[4]['secs']}s "
            f"speedup={sp:.2f} raw_eff={sp / 4:.3f} "
            f"(n1 {rs[1]['all']} / n4 {rs[4]['all']})"
        )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), sys.argv[3], sys.argv[4])
    else:
        main(sys.argv[1:])
