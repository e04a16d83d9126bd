"""Fuzz the as-of and interval joins against brute-force pure-Python
references over randomized tapes: random key collisions, timestamp ties,
empty sides, probes before any state, and intervals straddling or vastly
exceeding the bucket width (both the short/bucketed and long/broadcast
branches exercised in one run).

Seeded RNG + ONE Spark job per operator (scenario id folded into the join
key), following test_fuzz_mentions' batched style — per-example Spark
jobs would take minutes for no extra coverage.
"""

from __future__ import annotations

import datetime as dt
import random

from web3_knowledge_graph_spark.operators.asof import asof_join
from web3_knowledge_graph_spark.operators.interval import interval_join

EPOCH = dt.datetime(2024, 1, 1)


def _ts(minutes: int) -> dt.datetime:
    return EPOCH + dt.timedelta(minutes=minutes)


def test_fuzz_asof_join_vs_bruteforce(spark):
    rng = random.Random(0xA50F)
    state_rows, probe_rows = [], []
    sid = 0
    for scen in range(60):
        for _ in range(rng.randint(0, 10)):
            sid += 1
            state_rows.append(
                (scen, rng.choice("ab"), rng.randint(0, 40), sid, float(sid))
            )
        for p in range(rng.randint(1, 10)):
            probe_rows.append((scen, rng.choice("ab"), rng.randint(0, 40)))
    probe_rows = [(i,) + r for i, r in enumerate(probe_rows)]

    state = spark.createDataFrame(
        [(s, k, _ts(m), x, v) for s, k, m, x, v in state_rows],
        "scen int, k string, sts timestamp, okey long, oval double",
    )
    probe = spark.createDataFrame(
        [(pid, s, k, _ts(m)) for pid, s, k, m in probe_rows],
        "pid long, scen int, k string, pts timestamp",
    )
    got = {
        r.pid: r.okey
        for r in asof_join(
            probe, state, key=["scen", "k"], probe_ts="pts", state_ts="sts",
            value_cols=["okey", "oval"], tiebreak="okey",
        ).collect()
    }
    for pid, scen, k, m in probe_rows:
        cands = [
            (sm, sx)
            for ss, sk, sm, sx, _ in state_rows
            if ss == scen and sk == k and sm <= m
        ]
        want = max(cands)[1] if cands else None  # (ts, tiebreak) lexicographic
        assert got[pid] == want, (pid, scen, k, m)


def test_fuzz_interval_join_vs_bruteforce(spark):
    rng = random.Random(0x17E6)
    iv_rows, pt_rows = [], []
    for scen in range(60):
        for j in range(rng.randint(0, 6)):
            s = rng.randint(0, 300)
            # mix: short (within a couple 60s buckets), straddling, and
            # LONG spans (>> long_bucket_limit buckets → broadcast branch),
            # plus occasional invalid end < start
            e = s + rng.choice([0, 1, 2, 5, 30, 250, -3])
            iv_rows.append((scen, s, e, len(iv_rows)))
        for _ in range(rng.randint(1, 8)):
            pt_rows.append((scen, rng.randint(0, 320), len(pt_rows)))

    iv = spark.createDataFrame(
        [(s, _ts(a), _ts(b), i) for s, a, b, i in iv_rows],
        "scen int, ws timestamp, we timestamp, iv_id long",
    )
    pts = spark.createDataFrame(
        [(s, _ts(m), p) for s, m, p in pt_rows],
        "scen int, ts timestamp, pid long",
    )
    got = {
        (r.pid, r.iv_id)
        for r in interval_join(
            pts, iv, point_ts="ts", start_col="ws", end_col="we",
            key="scen", bucket_width_s=60, long_bucket_limit=3,
        ).collect()
    }
    want = {
        (pid, ivid)
        for ps, pm, pid in pt_rows
        for is_, a, b, ivid in iv_rows
        if is_ == ps and a <= b and a <= pm <= b
    }
    assert got == want
