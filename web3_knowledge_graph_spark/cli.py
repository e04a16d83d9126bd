"""spark-submit entry point — the production ship path of the north rule:

    zip -r /tmp/wkg.zip web3_knowledge_graph_spark
    spark-submit --master <cluster> --py-files /tmp/wkg.zip \\
        web3_knowledge_graph_spark/cli.py \\
        --job pipeline --sf-dir /root/testdata/sf0.001 --out /tmp/wh

Jobs:
    pipeline  — full resumable KG construction (extract → mentions → link →
                canonicalize → materialize) into a checkpointed warehouse;
                re-running with the same --out resumes from the lineage log.
    triples   — one-shot flagship query; writes the triples table to --out.
    mentions  — extraction stage only; writes mentions(url, kind, value, n).
    bench     — headline queries; prints one JSON line.

The session is obtained WITHOUT a master override so spark-submit's
--master (YARN/k8s/local) wins; session tuning (AQE, Arrow, GC) matches
session.get_spark.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import SparkSession


def _submitted_session(app_name: str) -> SparkSession:
    from web3_knowledge_graph_spark.session import (
        apply_sql_conf,
        get_spark,
        session_conf,
    )

    # spark-submit provides the master; only fall back to local[*] when run
    # directly as a script. Workload tuning (AQE, Arrow, UTC session tz,
    # shuffle sizing) comes from the same session_conf dict get_spark uses —
    # minus master/driver-memory, which belong to the submitter.
    active = SparkSession.getActiveSession()
    if active is not None:
        apply_sql_conf(active)
        return active
    builder = SparkSession.builder.appName(app_name)
    for k, v in session_conf().items():
        builder = builder.config(k, v)
    try:
        spark = builder.getOrCreate()
        apply_sql_conf(spark)  # in case a pre-existing context won getOrCreate
        return spark
    except Exception:
        return get_spark(app_name)


def _side_tables(spark: SparkSession, sf_dir: str):
    from pyspark.sql import functions as F

    from web3_knowledge_graph_spark.driver_queries import _page_alias_relations

    reg, th = _page_alias_relations(spark, sf_dir)
    registrations = reg.select(
        F.col("ens").alias("name"), F.col("wallet").alias("owner")
    ).withColumns(
        {
            "resolved_address": F.col("owner"),
            "registrant": F.col("owner"),
            "transaction_id": F.lit(None).cast("string"),
            "block_number": F.lit(None).cast("long"),
        }
    )
    profiles = th.groupBy("handle").agg(
        F.concat_ws(" ", F.collect_set(F.col("ens"))).alias("bio")
    ).withColumns(
        {
            "name": F.col("handle"),
            "verified": F.lit(None).cast("boolean"),
            "user_id": F.lit(None).cast("string"),
            "follower_count": F.lit(None).cast("long"),
            "website": F.lit(None).cast("string"),
            "language": F.lit(None).cast("string"),
        }
    )
    balances = spark.createDataFrame(
        [], "address string, contract_address string, snapshot int"
    )
    from web3_knowledge_graph_spark.fixtures.dictionaries import alias_dict_rows
    from web3_knowledge_graph_spark.schemas import ALIAS_DICT

    alias_dict = spark.createDataFrame(alias_dict_rows(), ALIAS_DICT)
    return {
        "registrations": registrations,
        "profiles": profiles,
        "balances": balances,
        "alias_dict": alias_dict,
    }


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="web3_knowledge_graph_spark")
    ap.add_argument("--job", required=True,
                    choices=("pipeline", "triples", "mentions", "bench"))
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default=None, help="output dir (warehouse/parquet)")
    ap.add_argument("--run-id", default="cli")
    args = ap.parse_args(argv)

    spark = _submitted_session(f"wkg-{args.job}")
    t0 = time.time()

    if args.job == "pipeline":
        assert args.out, "--out (warehouse dir) required"
        from web3_knowledge_graph_spark.plans.pipeline import run_pipeline
        from web3_knowledge_graph_spark.sources.pages import synthesize_pages

        pages = synthesize_pages(spark, args.sf_dir)
        trip = run_pipeline(
            spark, pages, _side_tables(spark, args.sf_dir), args.out,
            run_id=args.run_id, buckets=4,
        )
        n = trip.count()
        print(json.dumps({"job": "pipeline", "triples": n,
                          "warehouse": args.out, "secs": round(time.time() - t0, 2)}))
    elif args.job == "triples":
        assert args.out, "--out required"
        from web3_knowledge_graph_spark.driver_queries import flagship_triples

        df = flagship_triples(spark, args.sf_dir)
        df.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
        print(json.dumps({"job": "triples", "rows": n, "out": args.out,
                          "secs": round(time.time() - t0, 2)}))
    elif args.job == "mentions":
        assert args.out, "--out required"
        from web3_knowledge_graph_spark.driver_queries import _vocab_dict
        from web3_knowledge_graph_spark.plans.pipeline import extract_stage
        from web3_knowledge_graph_spark.sources.pages import synthesize_pages

        pages = synthesize_pages(spark, args.sf_dir)
        extract_stage(pages, _vocab_dict(spark)).write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
        print(json.dumps({"job": "mentions", "rows": n, "out": args.out,
                          "secs": round(time.time() - t0, 2)}))
    else:  # bench
        import bench

        bench.main()
    return 0


if __name__ == "__main__":
    sys.exit(main())
