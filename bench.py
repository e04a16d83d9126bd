"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

value = total wall seconds across headline queries (best of 3 trials per
query — steady-state; first-trial times, which include one-time plan
compilation, are under "queries_first_trial"); per-query seconds under
"queries". Also reports docs_per_sec for the flagship extraction pipeline
(the BASELINE.md target denominator). Run with SPARK_GRAFT_CPUS=8 and =32 on
the same input to measure the N→4N scaling efficiency (BENCH.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from web3_knowledge_graph_spark.driver_queries import all_queries  # noqa: E402
from web3_knowledge_graph_spark.session import get_spark  # noqa: E402

# Headline set: one per pillar — full KG pipeline, mention extraction,
# linking, CC, dedup ladder, similarity, text analysis, windowed agg.
HEADLINE = [
    "flagship_triples",
    "mention_wallets",
    "dict_mentions",
    "two_hop_links",
    "scored_links",
    "cc_components",
    "dedup_exact",
    "minhash_signatures",
    "lsh_pairs",
    "simhash",
    "embed_knn",
    "lang_id",
    "quality",
    "events_hourly",
    "sessionization",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # Default to 8 threads unless SPARK_GRAFT_CPUS says otherwise: this VM
    # advertises 32 vCPUs but the hypervisor backs ~8 — beyond that, guest
    # sys-time/steal collapse makes timings worse AND noisier (measured;
    # see BENCH.md "environment calibration").
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or min(os.cpu_count() or 8, 8)
    spark = get_spark("bench", cores=cores)
    qs = all_queries()

    # warm the JVM/session so fixed startup cost doesn't pollute query times
    spark.range(1000).selectExpr("sum(id)").collect()

    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    # extraction throughput (the BASELINE docs/sec denominator stage)
    from web3_knowledge_graph_spark.driver_queries import _vocab_dict
    from web3_knowledge_graph_spark.plans.pipeline import extract_stage
    from web3_knowledge_graph_spark.sources.pages import synthesize_pages

    pages = synthesize_pages(spark, sf_dir).localCheckpoint()
    extract_stage(pages.limit(500), _vocab_dict(spark)).count()  # warm
    t0 = time.time()
    extract_stage(pages, _vocab_dict(spark)).count()
    extract_secs = time.time() - t0

    # Per query: best of 3 trials. The first trial pays one-time Catalyst
    # analysis + whole-stage-codegen (Janino) compilation of the plan — a
    # fixed cost of seconds that is noise at any real data scale but 30-50%
    # of wall time at sf0.1 — and the multi-tenant host swings ±30% on
    # minute scales, so later trials are the steady-state number a cluster
    # actually runs at; first-trial times are reported alongside under
    # "queries_first_trial" for transparency.
    timings: dict[str, float] = {}
    first_trial: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        trials = []
        for _ in range(3):
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            n = df.count()  # full materialization of the result
            trials.append(time.time() - t0)
        dt = min(trials)
        first_trial[name] = round(trials[0], 3)
        timings[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {n} rows in {dt:.2f}s (trials {[round(x,2) for x in trials]})",
              file=sys.stderr)

    docs_per_sec = n_docs / timings["flagship_triples"] if timings.get("flagship_triples") else None
    out = {
        "metric": "headline_queries_total_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "queries_first_trial": first_trial,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cores": cores,
        "n_docs": n_docs,
        "flagship_docs_per_sec": round(docs_per_sec, 2) if docs_per_sec else None,
        "extract_docs_per_sec": round(n_docs / extract_secs, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
