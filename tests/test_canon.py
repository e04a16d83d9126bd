"""Connected-components correctness vs a pure-python union-find oracle
(SURVEY.md §5.4 — scipy is not in the container, so the oracle is local)."""

import random

from web3_knowledge_graph_spark.operators.canon import connected_components


class UnionFind:
    def __init__(self):
        self.p = {}

    def find(self, x):
        self.p.setdefault(x, x)
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


def _check(spark, edges):
    uf = UnionFind()
    for a, b in edges:
        uf.union(a, b)
    want = {n: uf.find(n) for n in uf.p}
    # canonical = min member per component
    comp_min = {}
    for n in want:
        r = uf.find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    want = {n: comp_min[uf.find(n)] for n in want}

    df = spark.createDataFrame(edges, "src long, dst long")
    # both execution paths must agree with the oracle: driver union-find
    # (small graphs) and the distributed star loop (driver_threshold=0)
    for thr in (200_000, 0):
        got = {
            r["id"]: r["component"]
            for r in connected_components(df, driver_threshold=thr).collect()
        }
        assert got == want, f"driver_threshold={thr}"


def test_cc_simple_chain(spark):
    _check(spark, [(1, 2), (2, 3), (3, 4), (10, 11), (20, 20)])


def test_cc_star_and_cycles(spark):
    edges = [(100, i) for i in range(1, 50)] + [(200, 201), (201, 202), (202, 200)]
    _check(spark, edges)


def test_cc_random_graphs(spark):
    rng = random.Random(42)
    for trial in range(3):
        n = 120
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(rng.randrange(30, 140))
        ]
        edges = [(a, b) for a, b in edges if a != b]
        _check(spark, edges)


def test_cc_negative_ids(spark):
    # xxhash64 node ids are frequently negative; min-id must still be stable
    _check(spark, [(-5, 3), (3, -1), (7, 8)])
