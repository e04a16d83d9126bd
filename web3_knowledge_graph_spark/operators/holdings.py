"""Holdings snapshot rotation — HOLDS → HELD (SCD-2-style).

Reference: /root/reference/pipelines/postProcessing/tokenHolders/cypher.py:
104-148 (duplicated at curatedTokenHolding/cypher.py:242-270) runs three
mutation passes against Neo4j: mark current HOLDS edges ``toUpdate``, upsert
the fresh holder set, then retype still-marked edges HOLDS→HELD /
HOLDS_TOKEN→HELD_TOKEN. The mark-and-sweep exists only because the store is
mutated in place.

Spark restatement: one full-outer join between the previous holder set and
the new snapshot per (holder, token) — rows only in the old set flip to
HELD, everything in the new set is HOLDS; no marking, atomic by
construction. The join shuffles both sides once on the composite key; a hub
token (30% of wallets hold it — FIXTURES.md F4) skews the key, which AQE
skew-join splitting absorbs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KEY = ["holder", "token"]


def rotate_holdings(previous: DataFrame, snapshot: DataFrame) -> DataFrame:
    """previous(holder, token, pred∈{HOLDS,HELD}, props…) × snapshot(holder,
    token, props…) → new holdings state.

    * in snapshot                → HOLDS (fresh props win)
    * previously HOLDS, now gone → HELD  (cypher.py:126-148 retype)
    * previously HELD            → stays HELD
    """
    prev = previous.select(
        *KEY, F.col("pred").alias("_old_pred"), F.col("weight").alias("_old_weight")
    )
    new = snapshot.select(*KEY, F.col("weight")).withColumn("_in_new", F.lit(True))
    joined = prev.join(new, KEY, "full_outer")
    return joined.select(
        *KEY,
        F.when(F.col("_in_new"), F.lit("HOLDS"))
        .otherwise(F.lit("HELD"))
        .alias("pred"),
        F.coalesce(F.col("weight"), F.col("_old_weight")).alias("weight"),
    )
