"""Deterministic source feeds for the widened edge vocabulary.

The reference grows its graph from many per-source scrape landings —
token transfers, Twitter follower lists, Snapshot governance spaces /
proposals / votes, Gitcoin grants + donations, delegation event streams,
contract deployments, multisig signer sets, Mirror article NFTs. Each
lands as dated CSV/JSON in S3 and is MERGEd edge-by-edge into Neo4j
(citations on each SQL text below). Here every feed is ONE SQL text
derived from the driver testdata tables (events / orders / customer),
valid in BOTH Spark SQL and DuckDB — the same trick as
``sources/pages.py``: both engines synthesize byte-identical feed rows,
so the Spark rule output can be hash-compared against a DuckDB oracle.

Only dual-dialect constructs appear: ``||``, md5, substr, CAST(.. AS
STRING), %, CASE WHEN. Wallet identities reuse the exact generator of
``PAGES_SQL`` (md5('w'||k%97)-style), so feed-derived edges share the
Wallet keyspace with page-mention edges — one connected graph, as in
the reference where every source resolves to the same :Wallet nodes.
"""

from __future__ import annotations

WALLET_MOD = 97  # must match sources/pages.py WALLET_MOD


def wallet_sql(expr: str) -> str:
    """The PAGES_SQL wallet generator: 40-hex address keyed by an integer
    SQL expression (already reduced mod WALLET_MOD by the caller)."""
    return (
        f"'0x' || md5('w' || CAST({expr} AS STRING))"
        f" || substr(md5('wx' || CAST({expr} AS STRING)), 1, 8)"
    )


_W_USER = wallet_sql(f"user_id % {WALLET_MOD}")

# --- token transfers (ingestion/tokenHolders/ingest.py:29-41 prepares the
# scrape; cyphers.py:55-70 MERGEs (from)-[TRANSFERRED]->(to); RECEIVED is
# helpers/queries.py:142-151). Purchase events become transfers; the
# (event_id - event_id % 2) basis makes consecutive purchase pairs share a
# tx hash WITHOUT sharing endpoints, and every third row is emitted twice
# upstream in spirit via the % 3 filter overlap — the rule must dedup on
# (from,to,hash) exactly as ingest.py:31 drop_duplicates does.
TRANSFERS_SQL = f"""
SELECT
  {_W_USER} AS from_address,
  {wallet_sql(f"(user_id + 1 + event_id % 13) % {WALLET_MOD}")} AS to_address,
  '0x' || md5('tx' || CAST(event_id - (event_id % 2) AS STRING)) AS tx_hash,
  '0x' || md5('tok' || CAST(event_id % 11 AS STRING)) AS contract_address,
  CAST(value AS DECIMAL(18,2)) AS amount
FROM events
WHERE event_type = 'purchase'
"""

# --- follower lists (postProcessing/twitterFollowers/cyphers.py:129-166:
# merge_followers_relationships emits follower->handle, and
# merge_following_relationships the handle->follower direction).
FOLLOWERS_SQL = f"""
SELECT
  'user_' || CAST(user_id % 41 AS STRING) AS handle,
  'user_' || CAST((user_id + 1 + event_id % 7) % 41 AS STRING) AS follower,
  CASE WHEN event_id % 3 = 0 THEN 'following' ELSE 'follower' END AS list_kind
FROM events
WHERE event_type = 'click'
"""

# --- Snapshot governance (ingestion/snapshot/ingest.py:100-217 shapes
# spaces/proposals/votes; cyphers.py:140-270 MERGEs HAS_PROPOSAL, AUTHOR,
# CONTRIBUTOR(member|admin), VOTED, HAS_STRATEGY). Proposals come from
# orders; the % 3 = 0 keys are withheld so votes on them are negatives the
# MATCH-join must drop.
PROPOSALS_SQL = f"""
SELECT
  'prop' || CAST(o_orderkey % 1000 AS STRING) AS proposal_id,
  'space' || CAST(o_orderkey % 8 AS STRING) || '.eth' AS space_id,
  {wallet_sql(f"o_custkey % {WALLET_MOD}")} AS author
FROM orders
WHERE o_orderkey < 1000 AND o_orderkey % 3 <> 0
"""

VOTES_SQL = f"""
SELECT
  '0x' || md5('v' || CAST(event_id AS STRING)) AS vote_id,
  {_W_USER} AS voter,
  'prop' || CAST((event_id * 7) % 1000 AS STRING) AS proposal_id
FROM events
WHERE event_type = 'view'
"""

SPACE_MEMBERS_SQL = f"""
SELECT
  'space' || CAST(c_custkey % 8 AS STRING) || '.eth' AS space_id,
  {wallet_sql(f"c_custkey % {WALLET_MOD}")} AS address,
  CASE WHEN c_custkey % 5 = 0 THEN 'admin' ELSE 'member' END AS member_type
FROM customer
WHERE c_custkey < 120
"""

# strategy params: rows where the address fails ^0x[40 hex]$ must be
# dropped (ingest.py:150-158 isAddress gate) — the % 4 = 0 rows carry a
# truncated 10-hex address as that negative.
STRATEGIES_SQL = """
SELECT
  'space' || CAST(c_custkey % 8 AS STRING) || '.eth' AS space_id,
  CASE WHEN c_custkey % 4 = 0
       THEN '0x' || substr(md5('tok' || CAST(c_custkey % 11 AS STRING)), 1, 10)
       ELSE '0x' || md5('tok' || CAST(c_custkey % 11 AS STRING)) END AS token_address
FROM customer
WHERE c_custkey < 40
"""

# --- Gitcoin grants (ingestion/gitcoin/cyphers.py:168-186 IS_ADMIN;
# :223-248 DONATION — note the rule: the donation joins its grant ONLY
# through (grant)<-[IS_ADMIN]-(wallet {address: donations.destination}),
# so a donation whose destination is not that grant's admin is dropped).
GRANT_ADMINS_SQL = f"""
SELECT
  'grant' || CAST(o_orderkey % 12 AS STRING) AS grant_id,
  {wallet_sql(f"(o_custkey * 13 + 2) % {WALLET_MOD}")} AS address
FROM orders
WHERE o_orderkey < 12
"""

DONATIONS_SQL = f"""
SELECT
  '0x' || md5('don' || CAST(event_id AS STRING)) AS tx_hash,
  {_W_USER} AS donor,
  'grant' || CAST(event_id % 12 AS STRING) AS grant_id,
  CASE WHEN event_id % 4 = 0
       THEN {wallet_sql(f"(event_id * 17 + 5) % {WALLET_MOD}")}
       ELSE {wallet_sql(f"((event_id % 12) * 13 + 2) % {WALLET_MOD}")} END
    AS destination,
  CAST(value AS DECIMAL(18,2)) AS amount
FROM events
WHERE event_type = 'error'
"""

# --- delegation changes (scraping/delegation/scrape.py:64-102 pulls
# delegateChanges ordered by blockNumber; cyphers.py:156-199: the current
# DELEGATES_TO edge is the LATEST change per (protocol, delegator) — older
# targets are detached. cyphers.py:110-127 IS_DELEGATING, :130-152
# IS_DELEGATE keep every participant linked to the protocol node.)
DELEGATIONS_SQL = f"""
SELECT
  CASE WHEN event_id % 2 = 0 THEN 'compound' ELSE 'uniswap' END AS protocol,
  {wallet_sql("user_id % 30")} AS delegator,
  {wallet_sql(f"(user_id + 3 + event_id % 11) % {WALLET_MOD}")} AS delegate,
  CAST(1000 + event_id AS BIGINT) AS block_number,
  '0x' || md5('dg' || CAST(event_id AS STRING)) AS tx_hash
FROM events
WHERE event_type = 'purchase' AND event_id % 5 < 2
"""

# --- contract deployments (postProcessing/contractDeployers/cyphers.py:
# 43-60 MERGE (wallet)-[DEPLOYED {txHash}]->(contract)).
DEPLOYMENTS_SQL = f"""
SELECT
  '0x' || substr(md5('ct' || CAST(o_orderkey AS STRING)), 1, 32)
      || substr(md5('ctx' || CAST(o_orderkey AS STRING)), 1, 8) AS contract_address,
  {wallet_sql(f"(o_custkey * 3 + 7) % {WALLET_MOD}")} AS deployer,
  '0x' || md5('dep' || CAST(o_orderkey AS STRING)) AS tx_hash
FROM orders
WHERE o_orderkey % 40 = 0
"""

# --- multisig signers (ingestion/multisig/cyphers.py:46-57 MERGE
# (signer)-[IS_SIGNER]->(multisig) — both endpoints :Wallet).
MULTISIG_SIGNERS_SQL = f"""
SELECT
  {wallet_sql(f"(c_custkey * 31 + 60) % {WALLET_MOD}")} AS multisig,
  {wallet_sql(f"(c_custkey * 4 + (c_custkey % 3)) % {WALLET_MOD}")} AS owner_address
FROM customer
WHERE c_custkey < 45
"""

# --- Mirror article NFTs (ingestion/mirror/cyphers.py:111-152:
# (article)-[HAS_NFT]->(nft) and (wallet)-[IS_OWNER]->(nft); article urls
# reuse the PAGES_SQL url generator so the NFT edges attach to the same
# Page nodes the mention edges use).
NFTS_SQL = f"""
SELECT
  'https://site' || CAST(o_orderkey % 20 AS STRING) || '.example/p/'
      || CAST(o_orderkey AS STRING) AS article_url,
  '0x' || md5('nft' || CAST(o_orderkey % 9 AS STRING)) || ':'
      || CAST(o_orderkey % 50 AS STRING) AS nft_id,
  {wallet_sql(f"(o_custkey * 11 + 2) % {WALLET_MOD}")} AS owner
FROM orders
WHERE o_orderkey % 25 = 0 AND o_orderkey < 2000
"""

ALL_FEEDS: dict[str, str] = {
    "transfers": TRANSFERS_SQL,
    "followers": FOLLOWERS_SQL,
    "proposals": PROPOSALS_SQL,
    "votes": VOTES_SQL,
    "space_members": SPACE_MEMBERS_SQL,
    "strategies": STRATEGIES_SQL,
    "grant_admins": GRANT_ADMINS_SQL,
    "donations": DONATIONS_SQL,
    "delegations": DELEGATIONS_SQL,
    "deployments": DEPLOYMENTS_SQL,
    "multisig_signers": MULTISIG_SIGNERS_SQL,
    "nfts": NFTS_SQL,
}


def _register_views(spark, sf_dir: str) -> None:
    for t in ("events", "orders", "customer"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)


def feed(spark, sf_dir: str, name: str):
    """Spark-side feed: evaluate the shared SQL over the sf_dir tables."""
    _register_views(spark, sf_dir)
    return spark.sql(ALL_FEEDS[name])


def all_feeds(spark, sf_dir: str) -> dict:
    """All twelve feeds with ONE view registration — ``feed()`` in a loop
    re-reads the parquet footers 3× per feed (36 schema inferences, ~7 s of
    driver time at sf0.1); this does 3 total."""
    _register_views(spark, sf_dir)
    return {name: spark.sql(sql) for name, sql in ALL_FEEDS.items()}


def feed_cte(*names: str) -> str:
    """DuckDB oracle prologue: WITH <name> AS (…), … for the given feeds
    (the driver pre-registers events/orders/customer as views)."""
    parts = [f"{n} AS ({ALL_FEEDS[n]})" for n in names]
    return "WITH " + ",\n".join(parts)
