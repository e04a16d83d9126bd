"""Per-source edge-rule library — the widened (subj, pred, obj) vocabulary.

Each rule restates ONE reference ingest/postProcessing MERGE site as a
native DataFrame expression over a feed table (sources/feeds.py synthesizes
the feeds; production would read the real scrape landings). Rules emit a
uniform natural-key relation

    (subj_label, subj_key, pred, obj_label, obj_key, weight, citation)

with keys lowercased at the boundary (the reference lowercases every MERGE
key — helpers/queries.py:28,46,84). Adapters at the bottom convert to the
driver-query 'Label:key' triple surface and to the node-id edge/node shape
``plans.pipeline.build_graph`` consumes.

Scale notes (100 TB): every rule is filter/project/groupBy on its own feed
— no corpus access. The only joins are feed↔feed (votes↔proposals,
donations↔grant_admins), both equi-joins where one side is dimension-sized
(proposals, admins) and marked broadcast; nothing here can shuffle more
than the feed itself. Weights fold with map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.normalize import WALLET_RE, canonical_key, node_id

EDGE_COLS = (
    "subj_label", "subj_key", "pred", "obj_label", "obj_key", "weight", "citation"
)


def _edges(
    df: DataFrame,
    subj_label: str,
    subj_key,
    pred: str,
    obj_label: str,
    obj_key,
    weight=None,
    citation: str | None = None,
    citation_col=None,
) -> DataFrame:
    w = weight if weight is not None else F.lit(1.0)
    cit = citation_col if citation_col is not None else F.lit(citation).cast("string")
    return df.select(
        F.lit(subj_label).alias("subj_label"),
        canonical_key(subj_key).alias("subj_key"),
        F.lit(pred).alias("pred"),
        F.lit(obj_label).alias("obj_label"),
        canonical_key(obj_key).alias("obj_key"),
        w.cast("double").alias("weight"),
        cit.alias("citation"),
    )


# ---------------------------------------------------------------------------
# token transfers → TRANSFERRED / RECEIVED
# ---------------------------------------------------------------------------

def transfer_edges(transfers: DataFrame) -> DataFrame:
    """(from)-[:TRANSFERRED {nb_transfer}]->(to) plus (to)-[:RECEIVED]->(tx).

    Reference: ingestion/tokenHolders/ingest.py:29-41 dedups the scrape on
    ["from","to","hash"] before staging; cyphers.py:55-70 MERGEs the edge
    and increments ``nb_transfer`` ON MATCH — so the edge weight is the
    number of DISTINCT tx hashes between the pair, exactly what the
    groupBy computes set-oriented (no 10k-row periodic commit needed).
    RECEIVED restates helpers/queries.py:142-151's wallet→Transaction edge
    (the reference query binds the receiving side; one edge per tx hash).

    One shuffle on (from,to) with partial aggregation; RECEIVED is a pure
    projection + distinct on (wallet, tx).
    """
    deduped = transfers.select(
        canonical_key("from_address").alias("from_address"),
        canonical_key("to_address").alias("to_address"),
        canonical_key("tx_hash").alias("tx_hash"),
    ).dropDuplicates(["from_address", "to_address", "tx_hash"])
    transferred = _edges(
        deduped.groupBy("from_address", "to_address").agg(
            F.count(F.lit(1)).alias("nb_transfer")
        ),
        "Wallet", F.col("from_address"), "TRANSFERRED", "Wallet", F.col("to_address"),
        weight=F.col("nb_transfer"),
        citation="token transfer (tokenHolders/cyphers.py:55-70)",
    )
    received = _edges(
        deduped.select("to_address", "tx_hash").dropDuplicates(),
        "Wallet", F.col("to_address"), "RECEIVED", "Transaction", F.col("tx_hash"),
        citation="transfer receipt (helpers/queries.py:142-151)",
    )
    return transferred.unionByName(received)


# ---------------------------------------------------------------------------
# twitter follower / following lists → FOLLOWS
# ---------------------------------------------------------------------------

def follows_edges(followers: DataFrame) -> DataFrame:
    """(follower)-[:FOLLOWS]->(handle) for follower-list rows and
    (handle)-[:FOLLOWS]->(follower) for following-list rows.

    Reference: postProcessing/twitterFollowers/cyphers.py:129-144
    (merge_followers_relationships: f=follower, e=handle) and :146-166
    (merge_following_relationships: f=handle, e=follower). Both MERGE, so
    the pair dedups; direction comes from which list the row landed in.
    """
    is_following = F.col("list_kind") == "following"
    src = F.when(is_following, F.col("handle")).otherwise(F.col("follower"))
    dst = F.when(is_following, F.col("follower")).otherwise(F.col("handle"))
    rows = followers.select(
        canonical_key(src).alias("src"), canonical_key(dst).alias("dst")
    ).dropDuplicates()
    return _edges(
        rows, "Twitter", F.col("src"), "FOLLOWS", "Twitter", F.col("dst"),
        citation="follower list (twitterFollowers/cyphers.py:129-166)",
    )


# ---------------------------------------------------------------------------
# Snapshot governance → HAS_PROPOSAL / AUTHOR / VOTED / CONTRIBUTOR /
# HAS_STRATEGY
# ---------------------------------------------------------------------------

def governance_edges(
    proposals: DataFrame,
    votes: DataFrame,
    space_members: DataFrame,
    strategies: DataFrame,
) -> DataFrame:
    """The Snapshot edge families (ingestion/snapshot/cyphers.py):

      * (space)-[:HAS_PROPOSAL]->(proposal)      cyphers.py:140-149
      * (wallet)-[:AUTHOR]->(proposal)           cyphers.py:152-163
      * (wallet)-[:VOTED]->(proposal)            cyphers.py:243-259 — the
        MATCH on Proposal means votes whose proposal was never ingested
        drop (an inner join, not a left join)
      * (wallet)-[:CONTRIBUTOR {type}]->(space)  cyphers.py:165-207
        (member and admin variants MERGE the same edge; type rides in the
        citation since triples carry no property map)
      * (space)-[:HAS_STRATEGY]->(token)         cyphers.py:261-270, gated
        by the ^0x[40 hex]$ address check at ingest.py:150-158

    votes→proposals is the only join; proposals are dimension-sized
    (bounded by governance spaces, not by corpus), so it broadcasts.
    """
    prop = proposals.select(
        canonical_key("proposal_id").alias("proposal_id"),
        canonical_key("space_id").alias("space_id"),
        canonical_key("author").alias("author"),
    ).dropDuplicates(["proposal_id"])

    e_prop = _edges(
        prop, "Space", F.col("space_id"), "HAS_PROPOSAL", "Proposal",
        F.col("proposal_id"),
        citation="snapshot proposal (snapshot/cyphers.py:140-149)",
    )
    e_author = _edges(
        prop, "Wallet", F.col("author"), "AUTHOR", "Proposal", F.col("proposal_id"),
        citation="proposal author (snapshot/cyphers.py:152-163)",
    )

    v = votes.select(
        canonical_key("voter").alias("voter"),
        canonical_key("proposal_id").alias("proposal_id"),
    ).dropDuplicates()
    e_voted = _edges(
        v.join(F.broadcast(prop.select("proposal_id")), "proposal_id"),
        "Wallet", F.col("voter"), "VOTED", "Proposal", F.col("proposal_id"),
        citation="snapshot vote (snapshot/cyphers.py:243-259)",
    )

    mem = space_members.select(
        canonical_key("address").alias("address"),
        canonical_key("space_id").alias("space_id"),
        F.col("member_type"),
    ).dropDuplicates(["address", "space_id", "member_type"])
    e_contrib = _edges(
        mem, "Wallet", F.col("address"), "CONTRIBUTOR", "Space", F.col("space_id"),
        citation_col=F.concat(
            F.lit("space "), F.col("member_type"),
            F.lit(" (snapshot/cyphers.py:165-207)"),
        ),
    )

    strat = strategies.where(F.col("token_address").rlike(WALLET_RE)).select(
        canonical_key("space_id").alias("space_id"),
        canonical_key("token_address").alias("token_address"),
    ).dropDuplicates()
    e_strat = _edges(
        strat, "Space", F.col("space_id"), "HAS_STRATEGY", "Token",
        F.col("token_address"),
        citation="strategy token (snapshot/cyphers.py:261-270)",
    )

    return (
        e_prop.unionByName(e_author).unionByName(e_voted)
        .unionByName(e_contrib).unionByName(e_strat)
    )


# ---------------------------------------------------------------------------
# Gitcoin grants → IS_ADMIN / DONATION
# ---------------------------------------------------------------------------

def gitcoin_edges(grant_admins: DataFrame, donations: DataFrame) -> DataFrame:
    """(wallet)-[:IS_ADMIN]->(grant) and (donor)-[:DONATION]->(grant).

    Reference: ingestion/gitcoin/cyphers.py:168-186 (IS_ADMIN) and
    :223-248 (DONATION) — the donation MATCHes its grant through
    ``(grant)<-[:IS_ADMIN]-(wallet {address: donations.destination})``, so
    a donation whose destination is not that grant's admin wallet binds no
    grant and is DROPPED: restated as the inner equi-join on
    (grant_id, destination=admin address). DONATION MERGEs per txHash; the
    triple weight is the distinct-tx count per (donor, grant).

    grant_admins is dimension-sized → broadcast; one shuffle on
    (donor, grant) with partial agg for the weight.
    """
    admins = grant_admins.select(
        canonical_key("grant_id").alias("grant_id"),
        canonical_key("address").alias("address"),
    ).dropDuplicates()
    e_admin = _edges(
        admins, "Wallet", F.col("address"), "IS_ADMIN", "Grant", F.col("grant_id"),
        citation="grant admin (gitcoin/cyphers.py:168-186)",
    )

    don = donations.select(
        canonical_key("donor").alias("donor"),
        canonical_key("grant_id").alias("grant_id"),
        canonical_key("destination").alias("destination"),
        canonical_key("tx_hash").alias("tx_hash"),
    )
    valid = don.join(
        F.broadcast(admins),
        (don["grant_id"] == admins["grant_id"])
        & (don["destination"] == admins["address"]),
    ).select(don["donor"], don["grant_id"], don["tx_hash"]).dropDuplicates()
    e_don = _edges(
        valid.groupBy("donor", "grant_id").agg(F.count(F.lit(1)).alias("nb")),
        "Wallet", F.col("donor"), "DONATION", "Grant", F.col("grant_id"),
        weight=F.col("nb"),
        citation="grant donation (gitcoin/cyphers.py:223-248)",
    )
    return e_admin.unionByName(e_don)


# ---------------------------------------------------------------------------
# delegation event stream → DELEGATES_TO (latest change wins)
# ---------------------------------------------------------------------------

def delegation_edges(delegations: DataFrame) -> DataFrame:
    """(delegator)-[:DELEGATES_TO {protocol}]->(delegate): the CURRENT
    delegate per (protocol, delegator).

    Reference: scraping/delegation/scrape.py:64-102 pulls delegateChanges
    ordered by blockNumber; ingestion/delegation/cyphers.py:156-173 MERGEs
    the new target and :175-199 detaches the previous one — so graph state
    after ingest is the LATEST change per (protocol, delegator). Restated
    as max_by over the event stream (tiebreak on tx_hash for same-block
    determinism), one shuffle with partial agg — no iterative detach.

    The protocol scopes the edge key in the reference (an edge per
    protocol); it rides in the citation so two protocols' edges between
    the same pair stay distinct rows.
    """
    d = delegations.select(
        canonical_key("protocol").alias("protocol"),
        canonical_key("delegator").alias("delegator"),
        canonical_key("delegate").alias("delegate"),
        F.col("block_number").cast("long").alias("block_number"),
        canonical_key("tx_hash").alias("tx_hash"),
    )
    latest = d.groupBy("protocol", "delegator").agg(
        F.max_by("delegate", F.struct("block_number", "tx_hash")).alias("delegate")
    )
    return _edges(
        latest, "Wallet", F.col("delegator"), "DELEGATES_TO", "Wallet",
        F.col("delegate"),
        citation_col=F.concat(
            F.lit("delegation:"), F.col("protocol"),
            F.lit(" (delegation/cyphers.py:156-199)"),
        ),
    )


# ---------------------------------------------------------------------------
# contract deployments / multisig signers / article NFTs
# ---------------------------------------------------------------------------

def deployment_edges(deployments: DataFrame) -> DataFrame:
    """(wallet)-[:DEPLOYED {txHash}]->(contract) —
    postProcessing/contractDeployers/cyphers.py:43-60."""
    rows = deployments.select(
        canonical_key("deployer").alias("deployer"),
        canonical_key("contract_address").alias("contract_address"),
    ).dropDuplicates()
    return _edges(
        rows, "Wallet", F.col("deployer"), "DEPLOYED", "Contract",
        F.col("contract_address"),
        citation="contract deployment (contractDeployers/cyphers.py:43-60)",
    )


def signer_edges(multisig_signers: DataFrame) -> DataFrame:
    """(signer)-[:IS_SIGNER]->(multisig) — ingestion/multisig/cyphers.py:46-57
    (both endpoints :Wallet; the multisig wallet additionally carries the
    :MultiSig label in the reference's node dimension)."""
    rows = multisig_signers.select(
        canonical_key("owner_address").alias("owner_address"),
        canonical_key("multisig").alias("multisig"),
    ).dropDuplicates()
    return _edges(
        rows, "Wallet", F.col("owner_address"), "IS_SIGNER", "Wallet",
        F.col("multisig"),
        citation="multisig signer (multisig/cyphers.py:46-57)",
    )


def nft_edges(nfts: DataFrame) -> DataFrame:
    """(article)-[:HAS_NFT]->(nft) and (wallet)-[:IS_OWNER]->(nft) —
    ingestion/mirror/cyphers.py:111-135 (HAS_NFT) and :138-158 (IS_OWNER).
    Article urls reuse the Page keyspace so the NFT edges attach to the
    same Page nodes the mention edges reference."""
    rows = nfts.select(
        canonical_key("article_url").alias("article_url"),
        canonical_key("nft_id").alias("nft_id"),
        canonical_key("owner").alias("owner"),
    ).dropDuplicates()
    has_nft = _edges(
        rows.select("article_url", "nft_id").dropDuplicates(),
        "Page", F.col("article_url"), "HAS_NFT", "Nft", F.col("nft_id"),
        citation="article NFT (mirror/cyphers.py:111-135)",
    )
    is_owner = _edges(
        rows.select("owner", "nft_id").dropDuplicates(),
        "Wallet", F.col("owner"), "IS_OWNER", "Nft", F.col("nft_id"),
        citation="NFT owner (mirror/cyphers.py:138-158)",
    )
    return has_nft.unionByName(is_owner)


# ---------------------------------------------------------------------------
# adapters
# ---------------------------------------------------------------------------

def feed_edge_rules(feeds: dict[str, DataFrame]) -> DataFrame:
    """Union of every rule whose feed tables are present in ``feeds``
    (keys as in sources.feeds.ALL_FEEDS). Missing feeds skip their rules —
    a deployment ingests the sources it has."""
    outs: list[DataFrame] = []
    if "transfers" in feeds:
        outs.append(transfer_edges(feeds["transfers"]))
    if "followers" in feeds:
        outs.append(follows_edges(feeds["followers"]))
    if all(k in feeds for k in ("proposals", "votes", "space_members", "strategies")):
        outs.append(
            governance_edges(
                feeds["proposals"], feeds["votes"],
                feeds["space_members"], feeds["strategies"],
            )
        )
    if all(k in feeds for k in ("grant_admins", "donations")):
        outs.append(gitcoin_edges(feeds["grant_admins"], feeds["donations"]))
    if "delegations" in feeds:
        outs.append(delegation_edges(feeds["delegations"]))
    if "deployments" in feeds:
        outs.append(deployment_edges(feeds["deployments"]))
    if "multisig_signers" in feeds:
        outs.append(signer_edges(feeds["multisig_signers"]))
    if "nfts" in feeds:
        outs.append(nft_edges(feeds["nfts"]))
    if not outs:
        raise ValueError("no known feed tables present")
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def as_named_triples(rule_edges: DataFrame) -> DataFrame:
    """Natural-key relation → ('Label:key', pred, 'Label:key', weight,
    citation) — the driver-query / parity surface."""
    return rule_edges.select(
        F.concat_ws(":", "subj_label", "subj_key").alias("subj"),
        F.col("pred"),
        F.concat_ws(":", "obj_label", "obj_key").alias("obj"),
        F.col("weight"),
        F.col("citation"),
    )


def as_id_edges(rule_edges: DataFrame) -> DataFrame:
    """Natural-key relation → node-id edge rows (build_graph's edge shape)."""
    return rule_edges.select(
        node_id(F.col("subj_label"), F.col("subj_key")).alias("subj"),
        F.col("pred"),
        node_id(F.col("obj_label"), F.col("obj_key")).alias("obj"),
        F.col("weight"),
        F.col("citation"),
    )


def node_dim(rule_edges: DataFrame) -> DataFrame:
    """Both endpoints as (id, label, key) node rows (pre-dedup — the
    caller's node union dedups by id once, one shuffle total)."""
    subj = rule_edges.select(
        F.col("subj_label").alias("label"), F.col("subj_key").alias("key")
    )
    obj = rule_edges.select(
        F.col("obj_label").alias("label"), F.col("obj_key").alias("key")
    )
    both = subj.unionByName(obj)
    return both.select(
        node_id(F.col("label"), F.col("key")).alias("id"), "label", "key"
    )
