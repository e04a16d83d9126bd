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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.normalize import WALLET_RE, canonical_key, node_id

EDGE_COLS = (
    "subj_label", "subj_key", "pred", "obj_label", "obj_key", "weight", "citation"
)


def _edge_struct(
    subj_label: str,
    subj_key,
    pred: str,
    obj_label: str,
    obj_key,
    weight=None,
    citation=None,
):
    """One edge family as a struct expression — several families over the
    SAME feed scan explode from one array instead of re-scanning the feed
    per family (the one-pass CASE trick build_graph uses). Conditional
    families wrap this in F.when(cond, ...): the null elements filter out
    after the explode."""
    w = weight if weight is not None else F.lit(1.0)
    cit = citation if isinstance(citation, Column) else F.lit(citation)
    return F.struct(
        F.lit(subj_label).alias("subj_label"),
        canonical_key(subj_key).alias("subj_key"),
        F.lit(pred).alias("pred"),
        F.lit(obj_label).alias("obj_label"),
        canonical_key(obj_key).alias("obj_key"),
        w.cast("double").alias("weight"),
        cit.cast("string").alias("citation"),
    )


def _explode_families(df: DataFrame, *structs) -> DataFrame:
    """Explode the per-row edge-family array and drop the null (gated-out)
    elements; returns the uniform EDGE_COLS relation."""
    e = df.select(
        F.explode(F.array(*structs)).alias("e")
    ).where(F.col("e").isNotNull())
    return e.select(*[F.col(f"e.{c}").alias(c) for c in EDGE_COLS])


def _dedup_by_id(df: DataFrame, *keys: str) -> DataFrame:
    """One row per id key, DETERMINISTICALLY: keep the lexicographic MAX
    struct of the remaining columns. ``dropDuplicates([id])`` keeps an
    arbitrary row when a feed carries conflicting duplicate ids, which
    would diverge nondeterministically from the (dedup-free) DuckDB
    oracles; the feeds' contract is unique ids — on conforming input this
    is exactly dropDuplicates — and on a violating feed the pick is still
    reproducible. One shuffle on the key; MAX combines map-side."""
    others = [c for c in df.columns if c not in keys]
    if not others:
        return df.dropDuplicates(list(keys))
    return (
        df.groupBy(*keys)
        .agg(F.max(F.struct(*others)).alias("_r"))
        .select(*keys, *[F.col(f"_r.{c}").alias(c) for c in others])
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
    ).transform(lambda d: _dedup_by_id(d, "proposal_id"))

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
    — and (creator)-[:IS_CREATOR]->(multisig) — cyphers.py:60-70
    link_multisig_creators (all endpoints :Wallet; the multisig wallet
    additionally carries the :MultiSig label in the reference's node
    dimension). Both families ride one feed scan + one distinct."""
    rows = multisig_signers.select(
        canonical_key("owner_address").alias("owner_address"),
        canonical_key("multisig").alias("multisig"),
        canonical_key("creator").alias("creator"),
    )
    return _explode_families(
        rows,
        _edge_struct(
            "Wallet", F.col("owner_address"), "IS_SIGNER", "Wallet",
            F.col("multisig"),
            citation="multisig signer (multisig/cyphers.py:46-57)",
        ),
        # NULL creator → no edge: the reference's MERGE would MATCH the
        # creator wallet first, silently dropping unknown-creator rows
        F.when(
            F.col("creator").isNotNull(),
            _edge_struct(
                "Wallet", F.col("creator"), "IS_CREATOR", "Wallet",
                F.col("multisig"),
                citation="multisig creator (multisig/cyphers.py:60-70)",
            ),
        ),
    ).dropDuplicates(list(EDGE_COLS))


def nft_edges(nfts: DataFrame) -> DataFrame:
    """(article)-[:HAS_NFT]->(nft), (wallet)-[:IS_OWNER]->(nft), and
    (wallet)-[:IS_RECEIPIENT]->(nft) — ingestion/mirror/cyphers.py:111-135
    (HAS_NFT), :138-158 (IS_OWNER), :158-176 (link_NFTs_to_receipient: the
    article's funding recipient; the reference keeps its misspelled
    predicate). Article urls reuse the Page keyspace so the NFT edges
    attach to the same Page nodes the mention edges reference. Three
    families, one feed scan, one distinct."""
    rows = nfts.select(
        canonical_key("article_url").alias("article_url"),
        canonical_key("nft_id").alias("nft_id"),
        canonical_key("owner").alias("owner"),
        canonical_key("funding_recipient").alias("funding_recipient"),
    )
    return _explode_families(
        rows,
        _edge_struct(
            "Page", F.col("article_url"), "HAS_NFT", "Nft", F.col("nft_id"),
            citation="article NFT (mirror/cyphers.py:111-135)",
        ),
        F.when(
            F.col("owner").isNotNull(),
            _edge_struct(
                "Wallet", F.col("owner"), "IS_OWNER", "Nft", F.col("nft_id"),
                citation="NFT owner (mirror/cyphers.py:138-158)",
            ),
        ),
        # sparse real feeds can carry NULL recipients; the reference's
        # endpoint MATCH drops them (round-4 advice)
        F.when(
            F.col("funding_recipient").isNotNull(),
            _edge_struct(
                "Wallet", F.col("funding_recipient"), "IS_RECEIPIENT", "Nft",
                F.col("nft_id"),
                citation="NFT funding recipient (mirror/cyphers.py:158-176)",
            ),
        ),
    ).dropDuplicates(list(EDGE_COLS))


# ---------------------------------------------------------------------------
# NFT per-tokenId holdings → HOLDS_TOKEN / HELD_TOKEN
# ---------------------------------------------------------------------------

def nft_holding_edges(nft_holdings: DataFrame) -> DataFrame:
    """(wallet)-[:HOLDS_TOKEN {tokenId}]->(token) for current holders, and
    the mark-and-sweep rotation to HELD_TOKEN for holders absent from the
    latest snapshot.

    Reference: postProcessing/tokenHolders/cypher.py:57-76 MERGEs one
    HOLDS_TOKEN edge per (wallet, token, tokenId); :28-41 zeroes every
    current balance before the re-merge and :118-150 moves the still-zero
    edges to HELD_TOKEN — graph state after a run is therefore
    curr-holders → HOLDS_TOKEN, (prev-holders − curr-holders) → HELD_TOKEN.
    Restated set-oriented: an anti-join of the two snapshots on the full
    (wallet, token, tokenId) key. The triple surface carries no property
    map, so the per-tokenId granularity folds into the weight: the number
    of distinct tokenIds the pair's edge set holds (resp. rotated).

    Scale: both snapshots shuffle once on the 3-part key; the anti-join is
    co-partitioned with the agg that follows (same key prefix), and
    nothing touches the corpus.
    """
    def holders(snap: str) -> DataFrame:
        return (
            nft_holdings.where(
                (F.col("snapshot") == snap) & (F.col("balance") > 0)
            )
            .select(
                canonical_key("address").alias("address"),
                canonical_key("contract_address").alias("contract"),
                canonical_key("token_id").alias("token_id"),
            )
            .dropDuplicates()
        )

    curr, prev = holders("curr"), holders("prev")
    holds = _edges(
        curr.groupBy("address", "contract").agg(
            F.count(F.lit(1)).alias("n_ids")
        ),
        "Wallet", F.col("address"), "HOLDS_TOKEN", "Token", F.col("contract"),
        weight=F.col("n_ids"),
        citation="NFT holding (tokenHolders/cypher.py:57-76)",
    )
    rotated = prev.join(
        curr, ["address", "contract", "token_id"], "left_anti"
    )
    held = _edges(
        rotated.groupBy("address", "contract").agg(
            F.count(F.lit(1)).alias("n_ids")
        ),
        "Wallet", F.col("address"), "HELD_TOKEN", "Token", F.col("contract"),
        weight=F.col("n_ids"),
        citation="NFT holding rotation (tokenHolders/cypher.py:118-150)",
    )
    return holds.unionByName(held)


# ---------------------------------------------------------------------------
# DAOhaus moloch flow → SUMMONER / HAS_TOKEN / IS_MEMBER / HAS_PROPOSAL /
# AUTHOR / SPONSORED / EXECUTED / IS_APPLICANT / IS_TRIBUTING / IS_PAYING /
# VOTED / IS_VOTER
# ---------------------------------------------------------------------------

def moloch_edges(
    daos: DataFrame,
    members: DataFrame,
    proposals: DataFrame,
    votes: DataFrame,
) -> DataFrame:
    """The DAOhaus edge families (ingestion/daohaus/cyphers.py):

      * (summoner)-[:SUMMONER]->(dao)            cyphers.py:190-207
      * (dao)-[:HAS_TOKEN]->(token)              cyphers.py:370-388
      * (member)-[:IS_MEMBER {shares}]->(dao)    cyphers.py:336-360 —
        MATCHes the dao, so rows naming a never-ingested dao drop
      * (dao)-[:HAS_PROPOSAL]->(proposal)        cyphers.py:391-408 (dao
        MATCH — same drop rule)
      * (proposer)-[:AUTHOR]->(proposal)         cyphers.py:250-268
      * (sponsor)-[:SPONSORED]->(proposal)       cyphers.py:210-228 — the
        reference stages only sponsored proposals into this CSV; here the
        NULL-sponsor rows restate that absence
      * (processor)-[:EXECUTED]->(proposal)      cyphers.py:230-248
      * (applicant)-[:IS_APPLICANT]->(proposal)  cyphers.py:270-288
      * (applicant)-[:IS_TRIBUTING]->(proposal)  cyphers.py:310-330, only
        rows with tributeOffered > 0
      * (proposal)-[:IS_PAYING]->(applicant)     cyphers.py:288-308, only
        rows with paymentRequested > 0
      * (voter)-[:VOTED]->(proposal)             cyphers.py:140-165 —
        MATCHes the proposal (inner join)
      * (voter)-[:IS_VOTER]->(dao)               cyphers.py:167-188 —
        MATCHes the dao

    Scale: daos are a handful of rows and proposals are bounded by
    governance activity — both broadcast; votes (the only corpus-scale
    feed here) shuffle once for their fused distinct. Families sharing a
    feed explode from ONE scan (dao: 2, proposal: 7, vote: 2) — the
    MATCH-join gates become broadcast left-join flags consumed by
    F.when inside the family array, so the whole 12-family rule costs 4
    scans + 2 small exchanges instead of 12 scans + 4.
    """
    d = daos.select(
        canonical_key("dao_id").alias("dao_id"),
        canonical_key("summoner").alias("summoner"),
        canonical_key("token_address").alias("token_address"),
    ).transform(lambda d: _dedup_by_id(d, "dao_id"))
    dao_known = F.broadcast(
        d.select("dao_id").withColumn("_dao_known", F.lit(True))
    )

    dao_fams = _explode_families(
        d,
        _edge_struct(
            "Wallet", F.col("summoner"), "SUMMONER", "Dao", F.col("dao_id"),
            citation="dao summoner (daohaus/cyphers.py:190-207)",
        ),
        _edge_struct(
            "Dao", F.col("dao_id"), "HAS_TOKEN", "Token", F.col("token_address"),
            citation="dao token (daohaus/cyphers.py:370-388)",
        ),
    )

    # max-shares fold instead of the reference's first-CSV-row-wins ON
    # CREATE (which is load-order-dependent): deterministic under
    # duplicate member rows
    mem = members.select(
        canonical_key("dao_id").alias("dao_id"),
        canonical_key("member").alias("member"),
        F.col("shares").cast("long").alias("shares"),
    ).groupBy("dao_id", "member").agg(
        F.max("shares").alias("shares")
    ).join(dao_known, "dao_id")
    e_member = _edges(
        mem, "Wallet", F.col("member"), "IS_MEMBER", "Dao", F.col("dao_id"),
        weight=F.col("shares"),
        citation="dao member (daohaus/cyphers.py:336-360)",
    )

    prop = proposals.select(
        canonical_key("proposal_id").alias("proposal_id"),
        canonical_key("dao_id").alias("dao_id"),
        canonical_key("proposer").alias("proposer"),
        canonical_key("sponsor").alias("sponsor"),
        canonical_key("processor").alias("processor"),
        canonical_key("applicant").alias("applicant"),
        F.col("tribute_offered").cast("double").alias("tribute_offered"),
        F.col("payment_requested").cast("double").alias("payment_requested"),
    ).transform(lambda d: _dedup_by_id(d, "proposal_id"))

    pid = F.col("proposal_id")
    prop_fams = _explode_families(
        prop.join(dao_known, "dao_id", "left"),
        F.when(
            F.col("_dao_known"),
            _edge_struct(
                "Dao", F.col("dao_id"), "HAS_PROPOSAL", "Proposal", pid,
                citation="dao proposal (daohaus/cyphers.py:391-408)",
            ),
        ),
        _edge_struct(
            "Wallet", F.col("proposer"), "AUTHOR", "Proposal", pid,
            citation="proposal proposer (daohaus/cyphers.py:250-268)",
        ),
        F.when(
            F.col("sponsor").isNotNull(),
            _edge_struct(
                "Wallet", F.col("sponsor"), "SPONSORED", "Proposal", pid,
                citation="proposal sponsor (daohaus/cyphers.py:210-228)",
            ),
        ),
        F.when(
            F.col("processor").isNotNull(),
            _edge_struct(
                "Wallet", F.col("processor"), "EXECUTED", "Proposal", pid,
                citation="proposal processor (daohaus/cyphers.py:230-248)",
            ),
        ),
        _edge_struct(
            "Wallet", F.col("applicant"), "IS_APPLICANT", "Proposal", pid,
            citation="proposal applicant (daohaus/cyphers.py:270-288)",
        ),
        F.when(
            F.col("tribute_offered") > 0,
            _edge_struct(
                "Wallet", F.col("applicant"), "IS_TRIBUTING", "Proposal", pid,
                weight=F.col("tribute_offered"),
                citation="proposal tribute (daohaus/cyphers.py:310-330)",
            ),
        ),
        F.when(
            F.col("payment_requested") > 0,
            _edge_struct(
                "Proposal", pid, "IS_PAYING", "Wallet", F.col("applicant"),
                weight=F.col("payment_requested"),
                citation="proposal payment (daohaus/cyphers.py:288-308)",
            ),
        ),
    )

    prop_known = F.broadcast(
        prop.select("proposal_id").withColumn("_prop_known", F.lit(True))
    )
    v = votes.select(
        canonical_key("voter").alias("voter"),
        canonical_key("proposal_id").alias("proposal_id"),
        canonical_key("dao_id").alias("dao_id"),
    ).join(prop_known, "proposal_id", "left").join(dao_known, "dao_id", "left")
    vote_fams = _explode_families(
        v,
        F.when(
            F.col("_prop_known"),
            _edge_struct(
                "Wallet", F.col("voter"), "VOTED", "Proposal",
                F.col("proposal_id"),
                citation="moloch vote (daohaus/cyphers.py:140-165)",
            ),
        ),
        F.when(
            F.col("_dao_known"),
            _edge_struct(
                "Wallet", F.col("voter"), "IS_VOTER", "Dao", F.col("dao_id"),
                citation="dao voter (daohaus/cyphers.py:167-188)",
            ),
        ),
    ).dropDuplicates(list(EDGE_COLS))  # MERGE dedup for both vote families

    return (
        dao_fams.unionByName(e_member).unionByName(prop_fams)
        .unionByName(vote_fams)
    )


# ---------------------------------------------------------------------------
# NFTfi loans → BORROWED / LENT / IS_COLLATERAL / IS_DENOMINATION
# ---------------------------------------------------------------------------

def loan_edges(loans: DataFrame) -> DataFrame:
    """(borrower)-[:BORROWED]->(loan), (lender)-[:LENT]->(loan),
    (collateral token)-[:IS_COLLATERAL {tokenId}]->(loan) and
    (denomination token)-[:IS_DENOMINATION]->(loan).

    Reference: ingestion/NFTfi/cyphers.py:51-58 (BORROWED), :65-72 (LENT),
    :79-88 (IS_COLLATERAL — tokenId rides in the citation, the triple
    surface carries no property map) and :93-103 (IS_DENOMINATION — the
    MATCH on :Token:ERC20 by address is restated as the same
    ^0x[40 hex]$ validity gate the snapshot strategy rule uses). The
    per-venue surface the traders analyzers MATCH —
    (wallet)-[:BORROWER|LENDER]->(:Marketplace {name}),
    analytics/wic/traders/cyphers.py:55-180 — rides as two extra
    families keyed on the feed's ``marketplace`` column (optional: an
    NFTfi-only feed without the column emits just the four loan
    families, matching the reference's venue-less NFTfi ingestor).

    One feed scan: the six families explode from a single array — no
    joins, no corpus access, no per-family re-scan.
    """
    has_mkt = "marketplace" in loans.columns
    mkt = (
        canonical_key("marketplace") if has_mkt else F.lit(None).cast("string")
    )
    ln = loans.select(
        canonical_key("loan_id").alias("loan_id"),
        canonical_key("borrower").alias("borrower"),
        canonical_key("lender").alias("lender"),
        canonical_key("collateral_contract").alias("collateral_contract"),
        canonical_key("collateral_token_id").alias("collateral_token_id"),
        canonical_key("denomination_token").alias("denomination_token"),
        mkt.alias("marketplace"),
    ).transform(lambda d: _dedup_by_id(d, "loan_id"))
    lid = F.col("loan_id")
    return _explode_families(
        ln,
        _edge_struct(
            "Wallet", F.col("borrower"), "BORROWED", "Loan", lid,
            citation="loan borrower (NFTfi/cyphers.py:51-58)",
        ),
        _edge_struct(
            "Wallet", F.col("lender"), "LENT", "Loan", lid,
            citation="loan lender (NFTfi/cyphers.py:65-72)",
        ),
        _edge_struct(
            "Token", F.col("collateral_contract"), "IS_COLLATERAL", "Loan", lid,
            citation=F.concat(
                F.lit("loan collateral tokenId="), F.col("collateral_token_id"),
                F.lit(" (NFTfi/cyphers.py:79-88)"),
            ),
        ),
        F.when(
            F.col("denomination_token").rlike(WALLET_RE),
            _edge_struct(
                "Token", F.col("denomination_token"), "IS_DENOMINATION",
                "Loan", lid,
                citation="loan denomination (NFTfi/cyphers.py:93-103)",
            ),
        ),
        F.when(
            F.col("marketplace").isNotNull(),
            _edge_struct(
                "Wallet", F.col("borrower"), "BORROWER",
                "Marketplace", F.col("marketplace"),
                citation="marketplace borrower (traders/cyphers.py:55-120)",
            ),
        ),
        F.when(
            F.col("marketplace").isNotNull(),
            _edge_struct(
                "Wallet", F.col("lender"), "LENDER",
                "Marketplace", F.col("marketplace"),
                citation="marketplace lender (traders/cyphers.py:125-180)",
            ),
        ),
    )


# ---------------------------------------------------------------------------
# Github repositories → OWNER / CONTRIBUTOR / SUBSCRIBER
# ---------------------------------------------------------------------------

def repo_edges(repos: DataFrame) -> DataFrame:
    """(handle)-[:OWNER|CONTRIBUTOR|SUBSCRIBER]->(repo), one rule per
    role list.

    Reference: postProcessing/github/cyphers.py:231-246 (link_owners),
    :248-263 (link_contributors), :265-280 (link_subscribers) — each
    guarded by ``WHERE data.X IS NOT NULL AND data.full_name IS NOT
    NULL``, restated as the isNotNull filter. The role→predicate CASE
    replaces the reference's three per-CSV loops with one scan.

    The same scan also emits (token)-[:HAS_REPOSITORY]->(repo) for rows
    whose token_address is set — the token-metadata social parser's
    create_or_merge_socials(..., "HAS_REPOSITORY") hop
    (postProcessing/tokenMetadata/process.py:152); NULL-token rows emit
    no such edge.
    """
    rows = repos.where(F.col("full_name").isNotNull()).select(
        canonical_key("handle").alias("handle"),
        canonical_key("full_name").alias("full_name"),
        canonical_key("role").alias("role"),
        canonical_key("token_address").alias("token_address"),
    )
    pred = (
        F.when(F.col("role") == "owner", F.lit("OWNER"))
        .when(F.col("role") == "contributor", F.lit("CONTRIBUTOR"))
        .otherwise(F.lit("SUBSCRIBER"))
    )
    cit = F.concat(
        F.lit("github "), F.col("role"),
        F.lit(" (github/cyphers.py:231-280)"),
    )
    role_struct = F.when(
        F.col("handle").isNotNull(),
        F.struct(
            F.lit("Github").alias("subj_label"),
            F.col("handle").alias("subj_key"),
            pred.alias("pred"),
            F.lit("Repository").alias("obj_label"),
            F.col("full_name").alias("obj_key"),
            F.lit(1.0).cast("double").alias("weight"),
            cit.cast("string").alias("citation"),
        ),
    )
    token_struct = F.when(
        F.col("token_address").isNotNull(),
        F.struct(
            F.lit("Token").alias("subj_label"),
            F.col("token_address").alias("subj_key"),
            F.lit("HAS_REPOSITORY").alias("pred"),
            F.lit("Repository").alias("obj_label"),
            F.col("full_name").alias("obj_key"),
            F.lit(1.0).cast("double").alias("weight"),
            F.lit(
                "token repository (tokenMetadata/process.py:152)"
            ).cast("string").alias("citation"),
        ),
    )
    return _explode_families(rows, role_struct, token_struct).dropDuplicates(
        list(EDGE_COLS)
    )


# ---------------------------------------------------------------------------
# Gitcoin team members → MEMBER_OF
# ---------------------------------------------------------------------------

def member_of_edges(grant_members: DataFrame, grant_admins: DataFrame) -> DataFrame:
    """(member account)-[:MEMBER_OF]->(grant).

    Reference: ingestion/gitcoin/cyphers.py:139-160 MATCHes the grant
    before the MERGE, so members naming a never-ingested grant drop —
    restated as the inner join against the grant registry (the admins
    feed carries every ingested grant id, same CSV family in the
    reference). Registry is dimension-sized → broadcast.
    """
    grants = F.broadcast(
        grant_admins.select(
            canonical_key("grant_id").alias("grant_id")
        ).dropDuplicates()
    )
    mem = grant_members.select(
        canonical_key("grant_id").alias("grant_id"),
        canonical_key("user_id").alias("user_id"),
    ).dropDuplicates().join(grants, "grant_id")
    return _edges(
        mem, "GitcoinAccount", F.col("user_id"), "MEMBER_OF", "Grant",
        F.col("grant_id"),
        citation="grant team member (gitcoin/cyphers.py:139-160)",
    )


# ---------------------------------------------------------------------------
# profile websites → HAS_DOMAIN
# ---------------------------------------------------------------------------

def domain_edges(websites: DataFrame) -> DataFrame:
    """(website)-[:HAS_DOMAIN]->(domain) — postProcessing/twitterRelations/
    cyphers.py:130-150; domain = urlparse(url).netloc (process.py:55-73),
    natively ``try_parse_url(url, 'HOST')`` (the try_ variant: ANSI-mode
    parse_url THROWS on a malformed url; here a malformed row must drop,
    as the reference's urlparse guard does). HOST strips userinfo@ and
    :port where urlparse().netloc keeps them — a deliberate divergence
    (the domain NODE should not split on port), mirrored exactly by the
    oracle regex and exercised by port/userinfo-bearing feed rows."""
    rows = websites.select(
        canonical_key("website_url").alias("website_url"),
        F.lower(F.try_parse_url(F.trim("website_url"), F.lit("HOST"))).alias("domain"),
    ).where(
        F.col("domain").isNotNull() & (F.col("domain") != "")
    ).dropDuplicates()
    return _edges(
        rows, "Website", F.col("website_url"), "HAS_DOMAIN", "Domain",
        F.col("domain"),
        citation="website domain (twitterRelations/cyphers.py:130-150)",
    )


# ---------------------------------------------------------------------------
# delegation participants → IS_DELEGATING / IS_DELEGATE / HAS_DELEGATION
# ---------------------------------------------------------------------------

def delegation_role_edges(delegations: DataFrame) -> DataFrame:
    """The per-protocol Delegation hub node's edges: the reference keeps
    ONE :Delegation node per protocol and links every participant to it.

      * (entity {name: protocol})-[:HAS_DELEGATION]->(delegation)
        ingestion/delegation/cyphers.py:91-109
      * (delegator)-[:IS_DELEGATING]->(delegation)   cyphers.py:111-128
      * (delegate)-[:IS_DELEGATE]->(delegation)      cyphers.py:130-152

      * (delegation)-[:USE_TOKEN]->(token)           cyphers.py:71-88
        (the protocol's governance token; functionally determined by the
        protocol in the event stream)

    All four explode from ONE scan of the event stream the DELEGATES_TO
    rule consumes, sharing ONE distinct exchange (every family's rows are
    MERGE-distinct per (protocol, wallet/token), so a single dedup over
    the exploded relation implements all four).
    """
    d = delegations.select(
        canonical_key("protocol").alias("protocol"),
        canonical_key("delegator").alias("delegator"),
        canonical_key("delegate").alias("delegate"),
        canonical_key("contract_address").alias("contract_address"),
    )
    return _explode_families(
        d,
        _edge_struct(
            "Entity", F.col("protocol"), "HAS_DELEGATION", "Delegation",
            F.col("protocol"),
            citation="protocol delegation hub (delegation/cyphers.py:91-109)",
        ),
        _edge_struct(
            "Wallet", F.col("delegator"), "IS_DELEGATING", "Delegation",
            F.col("protocol"),
            citation="delegator link (delegation/cyphers.py:111-128)",
        ),
        _edge_struct(
            "Wallet", F.col("delegate"), "IS_DELEGATE", "Delegation",
            F.col("protocol"),
            citation="delegate link (delegation/cyphers.py:130-152)",
        ),
        F.when(
            F.col("contract_address").isNotNull(),
            _edge_struct(
                "Delegation", F.col("protocol"), "USE_TOKEN", "Token",
                F.col("contract_address"),
                citation="delegation token (delegation/cyphers.py:71-88)",
            ),
        ),
    ).dropDuplicates(list(EDGE_COLS))


# ---------------------------------------------------------------------------
# Unlock protocol → CREATED / HAS_KEY / HOLDS
# ---------------------------------------------------------------------------

def unlock_edges(locks: DataFrame) -> DataFrame:
    """Unlock membership locks and their key NFTs.

      * (manager)-[:CREATED]->(lock)   ingestion/unlock/cyphers.py:71-85
      * (lock)-[:HAS_KEY]->(key)       cyphers.py:88-105
      * (holder)-[:HOLDS]->(lock)      cyphers.py:108-124 (the reference
        MATCHes the lock by holders.keyId — the holder row's lock column)
      * (holder)-[:HOLDS]->(key)       cyphers.py:127-140

    Lock and key are :Nft nodes in the reference (:Lock / :Instance
    sublabels ride in the citation). Four families, one feed scan, one
    distinct exchange."""
    rows = locks.select(
        canonical_key("lock_address").alias("lock_address"),
        canonical_key("key_address").alias("key_address"),
        canonical_key("manager").alias("manager"),
        canonical_key("holder").alias("holder"),
    )
    # manager/holder NULL-gates: the reference MATCHes the wallet endpoint
    # before each MERGE, so rows with no known manager/holder emit nothing
    # (round-4 advice)
    return _explode_families(
        rows,
        F.when(
            F.col("manager").isNotNull(),
            _edge_struct(
                "Wallet", F.col("manager"), "CREATED", "Nft",
                F.col("lock_address"),
                citation="lock manager (unlock/cyphers.py:71-85)",
            ),
        ),
        _edge_struct(
            "Nft", F.col("lock_address"), "HAS_KEY", "Nft", F.col("key_address"),
            citation="lock key (unlock/cyphers.py:88-105)",
        ),
        F.when(
            F.col("holder").isNotNull(),
            _edge_struct(
                "Wallet", F.col("holder"), "HOLDS", "Nft",
                F.col("lock_address"),
                citation="lock holder (unlock/cyphers.py:108-124)",
            ),
        ),
        F.when(
            F.col("holder").isNotNull(),
            _edge_struct(
                "Wallet", F.col("holder"), "HOLDS", "Nft",
                F.col("key_address"),
                citation="key holder (unlock/cyphers.py:127-140)",
            ),
        ),
    ).dropDuplicates(list(EDGE_COLS))


# ---------------------------------------------------------------------------
# PropHouse → HAS_STRATEGY / HAS_TOKEN / HAS_AUCTION / HAS_PROPOSAL /
#             AUTHOR / VOTED
# ---------------------------------------------------------------------------

def prophouse_edges(
    ph_communities: DataFrame,
    ph_auctions: DataFrame,
    ph_proposals: DataFrame,
    ph_votes: DataFrame,
) -> DataFrame:
    """The PropHouse governance surface (ingestion/propHouse/cyphers.py).

      * (community entity)-[:HAS_STRATEGY]->(token) and
        (community entity)-[:HAS_TOKEN]->(token)       cyphers.py:55-67 —
        the Token:ERC721 MATCH restated as the 40-hex address gate
      * (auction)-[:HAS_AUCTION]->(community)          cyphers.py:101-113
        (reference direction: auction → entity)
      * (auction)-[:HAS_PROPOSAL]->(proposal)          cyphers.py:136-148
      * (wallet)-[:AUTHOR]->(proposal)                 cyphers.py:150-162
      * (community)-[:HAS_PROPOSAL]->(proposal)        cyphers.py:165-177
      * (wallet)-[:VOTED {weight}]->(proposal)         cyphers.py:193-206

    Every cross-feed MATCH is an inner join against a dimension-sized
    registry (communities, proposals) — broadcast; votes on never-ingested
    proposals and auctions/proposals naming unknown communities drop
    exactly as the Cypher MATCH does."""
    comm = F.broadcast(
        _dedup_by_id(
            ph_communities.select(
                canonical_key("community_id").alias("community_id"),
                canonical_key("contract_address").alias("contract_address"),
            ),
            "community_id",
        )
    )
    comm_ids = F.broadcast(comm.select("community_id"))
    tok = comm.where(F.col("contract_address").rlike(WALLET_RE))
    e_strategy = _explode_families(
        tok,
        _edge_struct(
            "Entity", F.col("community_id"), "HAS_STRATEGY", "Token",
            F.col("contract_address"),
            citation="community token (propHouse/cyphers.py:55-67)",
        ),
        _edge_struct(
            "Entity", F.col("community_id"), "HAS_TOKEN", "Token",
            F.col("contract_address"),
            citation="community token (propHouse/cyphers.py:55-67)",
        ),
    )
    auc = _dedup_by_id(
        ph_auctions.select(
            canonical_key("auction_id").alias("auction_id"),
            canonical_key("community_id").alias("community_id"),
        ),
        "auction_id",
    )
    e_auction = _edges(
        auc.join(comm_ids, "community_id"),
        "Auction", F.col("auction_id"), "HAS_AUCTION", "Entity",
        F.col("community_id"),
        citation="auction community (propHouse/cyphers.py:101-113)",
    )
    auc_ids = F.broadcast(auc.select("auction_id"))
    prop = _dedup_by_id(
        ph_proposals.select(
            canonical_key("proposal_id").alias("proposal_id"),
            canonical_key("auction_id").alias("auction_id"),
            canonical_key("community_id").alias("community_id"),
            canonical_key("address").alias("address"),
        ),
        "proposal_id",
    )
    e_auction_prop = _edges(
        prop.join(auc_ids, "auction_id"),
        "Auction", F.col("auction_id"), "HAS_PROPOSAL", "Proposal",
        F.col("proposal_id"),
        citation="auction proposal (propHouse/cyphers.py:136-148)",
    )
    e_author = _edges(
        prop, "Wallet", F.col("address"), "AUTHOR", "Proposal",
        F.col("proposal_id"),
        citation="proposal author (propHouse/cyphers.py:150-162)",
    )
    e_comm_prop = _edges(
        prop.join(comm_ids, "community_id"),
        "Entity", F.col("community_id"), "HAS_PROPOSAL", "Proposal",
        F.col("proposal_id"),
        citation="community proposal (propHouse/cyphers.py:165-177)",
    )
    prop_ids = F.broadcast(prop.select("proposal_id"))
    votes = ph_votes.select(
        canonical_key("address").alias("address"),
        canonical_key("proposal_id").alias("proposal_id"),
        F.col("weight").cast("double").alias("weight"),
    ).join(prop_ids, "proposal_id")
    e_voted = _edges(
        votes.groupBy("address", "proposal_id").agg(
            F.max("weight").alias("weight")
        ),
        "Wallet", F.col("address"), "VOTED", "Proposal", F.col("proposal_id"),
        weight=F.col("weight"),
        citation="prop house vote (propHouse/cyphers.py:193-206)",
    )
    out = e_strategy
    for e in (e_auction, e_auction_prop, e_author, e_comm_prop, e_voted):
        out = out.unionByName(e)
    return out


# ---------------------------------------------------------------------------
# Twitter threads → AUTHOR / REPLIED
# ---------------------------------------------------------------------------

def thread_edges(threads: DataFrame) -> DataFrame:
    """(account)-[:AUTHOR]->(thread) / (account)-[:REPLIED]->(thread) —
    postProcessing/twitterThreads/cyphers.py:92-105 (authors) and
    :108-124 (replies); handles lowercase at the MATCH boundary. One scan,
    role→predicate CASE, one distinct."""
    rows = threads.select(
        canonical_key("conversation_id").alias("conversation_id"),
        canonical_key("handle").alias("handle"),
        canonical_key("role").alias("role"),
    ).dropDuplicates()
    pred = F.when(F.col("role") == "author", F.lit("AUTHOR")).otherwise(
        F.lit("REPLIED")
    )
    cit = F.concat(
        F.lit("thread "), F.col("role"),
        F.lit(" (twitterThreads/cyphers.py:92-124)"),
    )
    return rows.select(
        F.lit("Twitter").alias("subj_label"),
        F.col("handle").alias("subj_key"),
        pred.alias("pred"),
        F.lit("Thread").alias("obj_label"),
        F.col("conversation_id").alias("obj_key"),
        F.lit(1.0).cast("double").alias("weight"),
        cit.cast("string").alias("citation"),
    ).dropDuplicates(list(EDGE_COLS))


# ---------------------------------------------------------------------------
# ENS registry events → REGISTERED / TRANSFERRED / BURNED
# ---------------------------------------------------------------------------

def ens_registry_edges(ens_events: DataFrame) -> DataFrame:
    """The ENS subgraph event stream (ingestion/ens/cyphers.py).

      * kind='registration' → (owner)-[:REGISTERED {txHash}]->(ens)
        cyphers.py:66-81
      * kind='transfer'     → (from)-[:TRANSFERRED {txHash, type:ENS}]->(to)
        cyphers.py:84-99 (wallet→wallet; the name rides the edge property)
      * kind='burn'         → (from)-[:BURNED {txHash}]->(ens)
        cyphers.py:101-116
      * kind='registration' → (ens)-[:HAS_NAME]->(alias) — the entity→
        alias name edge (helpers/queries.py:170-183 link_ens_alias MERGEs
        (e:Ens {{editionId}})-[:HAS_NAME]->(a:Alias {{name}})); this
        engine keys Ens nodes by their name rather than the editionId
        (the edition↔name mapping is one-to-one in the reference CSVs),
        so the edge lands the Ens node into the same Alias keyspace the
        HAS_ALIAS mention rules populate.

    The HAS_ALIAS / IS_OWNER domain links from the same scrape ride the
    registrations side-table path (plans/pipeline.build_graph). Edges are
    MERGE-keyed by txHash in the reference, so the dedup key here includes
    the citation (which carries the tx) — one scan, one distinct (the
    tx-free HAS_NAME family is name-keyed, like the reference MERGE)."""
    rows = ens_events.select(
        canonical_key("name").alias("name"),
        canonical_key("owner").alias("owner"),
        canonical_key("to_address").alias("to_address"),
        canonical_key("tx_hash").alias("tx_hash"),
        canonical_key("kind").alias("kind"),
    )
    reg = F.when(
        F.col("kind") == "registration",
        F.struct(
            F.lit("Wallet").alias("subj_label"),
            F.col("owner").alias("subj_key"),
            F.lit("REGISTERED").alias("pred"),
            F.lit("Ens").alias("obj_label"),
            F.col("name").alias("obj_key"),
            F.lit(1.0).cast("double").alias("weight"),
            F.concat(
                F.lit("ens registration tx:"), F.col("tx_hash"),
                F.lit(" (ens/cyphers.py:66-81)"),
            ).cast("string").alias("citation"),
        ),
    )
    tra = F.when(
        F.col("kind") == "transfer",
        F.struct(
            F.lit("Wallet").alias("subj_label"),
            F.col("owner").alias("subj_key"),
            F.lit("TRANSFERRED").alias("pred"),
            F.lit("Wallet").alias("obj_label"),
            F.col("to_address").alias("obj_key"),
            F.lit(1.0).cast("double").alias("weight"),
            F.concat(
                F.lit("ens transfer "), F.col("name"), F.lit(" tx:"),
                F.col("tx_hash"), F.lit(" (ens/cyphers.py:84-99)"),
            ).cast("string").alias("citation"),
        ),
    )
    burn = F.when(
        F.col("kind") == "burn",
        F.struct(
            F.lit("Wallet").alias("subj_label"),
            F.col("owner").alias("subj_key"),
            F.lit("BURNED").alias("pred"),
            F.lit("Ens").alias("obj_label"),
            F.col("name").alias("obj_key"),
            F.lit(1.0).cast("double").alias("weight"),
            F.concat(
                F.lit("ens burn tx:"), F.col("tx_hash"),
                F.lit(" (ens/cyphers.py:101-116)"),
            ).cast("string").alias("citation"),
        ),
    )
    has_name = F.when(
        F.col("kind") == "registration",
        F.struct(
            F.lit("Ens").alias("subj_label"),
            F.col("name").alias("subj_key"),
            F.lit("HAS_NAME").alias("pred"),
            F.lit("Alias").alias("obj_label"),
            F.col("name").alias("obj_key"),
            F.lit(1.0).cast("double").alias("weight"),
            F.lit(
                "ens name alias (helpers/queries.py:170-183)"
            ).cast("string").alias("citation"),
        ),
    )
    return _explode_families(rows, reg, tra, burn, has_name).dropDuplicates(
        list(EDGE_COLS)
    )


# ---------------------------------------------------------------------------
# Gitcoin bounties → HAS_TAG / HAS_BOUNTY / HAS_FULLFILLED / HAS_INTEREST /
#                    HAS_WALLET
# ---------------------------------------------------------------------------

def bounty_edges(
    bounties: DataFrame, grant_tags: DataFrame, grant_admins: DataFrame
) -> DataFrame:
    """The Gitcoin bounty/tag surface (ingestion/gitcoin/cyphers.py).

      * (grant)-[:HAS_TAG]->(tag)            cyphers.py:94-110 — MATCHes
        the grant: inner join vs the broadcast grant registry (the admins
        feed carries every ingested grant id)
      * (org entity)-[:HAS_BOUNTY]->(bounty) cyphers.py:322-345
      * (github user)-[:IS_OWNER]->(bounty)  cyphers.py:367-385 (the
        bounty creator link the GitcoinBountyAdmin WIC rule walks,
        publicGoods/cyphers.py:89-114)
      * status='fulfilled' → (github user)-[:HAS_FULLFILLED]->(bounty)
        cyphers.py:453-475
      * status='interested' → (github user)-[:HAS_INTEREST]->(bounty)
        cyphers.py:538-555
      * user_wallet set → (github user)-[:HAS_WALLET]->(wallet) — the
        out-of-band account link the accounts/WIC stages MATCH
        (accounts/cyphers.py:57, publicGoods/cyphers.py:118); NULL-wallet
        rows emit none."""
    grants = F.broadcast(
        grant_admins.select(
            canonical_key("grant_id").alias("grant_id")
        ).dropDuplicates()
    )
    tags = grant_tags.select(
        canonical_key("grant_id").alias("grant_id"),
        canonical_key("label").alias("label"),
    ).dropDuplicates().join(grants, "grant_id")
    e_tags = _edges(
        tags, "Grant", F.col("grant_id"), "HAS_TAG", "Tag", F.col("label"),
        citation="grant tag (gitcoin/cyphers.py:94-110)",
    )
    b = bounties.select(
        canonical_key("bounty_id").alias("bounty_id"),
        canonical_key("org_name").alias("org_name"),
        canonical_key("owner_id").alias("owner_id"),
        canonical_key("user_id").alias("user_id"),
        canonical_key("user_wallet").alias("user_wallet"),
        canonical_key("status").alias("status"),
    )
    fams = _explode_families(
        b,
        _edge_struct(
            "Entity", F.col("org_name"), "HAS_BOUNTY", "Bounty",
            F.col("bounty_id"),
            citation="org bounty (gitcoin/cyphers.py:322-345)",
        ),
        F.when(
            F.col("owner_id").isNotNull(),
            _edge_struct(
                "Github", F.col("owner_id"), "IS_OWNER", "Bounty",
                F.col("bounty_id"),
                citation="bounty owner (gitcoin/cyphers.py:367-385)",
            ),
        ),
        F.when(
            F.col("status") == "fulfilled",
            _edge_struct(
                "Github", F.col("user_id"), "HAS_FULLFILLED", "Bounty",
                F.col("bounty_id"),
                citation="bounty fulfiller (gitcoin/cyphers.py:453-475)",
            ),
        ),
        F.when(
            F.col("status") == "interested",
            _edge_struct(
                "Github", F.col("user_id"), "HAS_INTEREST", "Bounty",
                F.col("bounty_id"),
                citation="bounty interest (gitcoin/cyphers.py:538-555)",
            ),
        ),
        F.when(
            F.col("user_wallet").isNotNull(),
            _edge_struct(
                "Github", F.col("user_id"), "HAS_WALLET", "Wallet",
                F.col("user_wallet"),
                citation="github wallet link (accounts/cyphers.py:57)",
            ),
        ),
    ).dropDuplicates(list(EDGE_COLS))
    return e_tags.unionByName(fams)


# ---------------------------------------------------------------------------
# webhook watch-lists + incubator seeds → IS_WATCHED_BY / INCUBATED
# ---------------------------------------------------------------------------

def watch_edges(webhooks: DataFrame, incubators: DataFrame) -> DataFrame:
    """(item:Wallet|Token)-[:IS_WATCHED_BY]->(webhook) —
    postProcessing/alchemyWebhooks/cyphers.py:94-110 (the item label comes
    from the watch-list kind; addresses arrive lowercased) — plus the
    incubator seed dimension (incubator entity)-[:INCUBATED]->(org
    entity) that analytics/wic/publicGoods/cyphers.py:181 MATCHes (seeded
    out-of-band in the reference)."""
    # the reference restricts the watched item to :Wallet|:Token via the
    # MATCH label (alchemyWebhooks/cyphers.py:94-110); a junk or miscased
    # kind must not mint a new node-label keyspace (round-4 advice)
    wh = webhooks.select(
        canonical_key("webhook_id").alias("webhook_id"),
        canonical_key("address").alias("address"),
        F.col("item_kind").cast("string").alias("item_kind"),
    ).where(F.col("item_kind").isin("Wallet", "Token")).dropDuplicates()
    e_watch = wh.select(
        F.col("item_kind").alias("subj_label"),
        F.col("address").alias("subj_key"),
        F.lit("IS_WATCHED_BY").alias("pred"),
        F.lit("Webhook").alias("obj_label"),
        F.col("webhook_id").alias("obj_key"),
        F.lit(1.0).cast("double").alias("weight"),
        F.lit(
            "webhook watch (alchemyWebhooks/cyphers.py:94-110)"
        ).cast("string").alias("citation"),
    )
    inc = incubators.select(
        canonical_key("incubator").alias("incubator"),
        canonical_key("entity").alias("entity"),
    ).dropDuplicates()
    e_inc = _edges(
        inc, "Entity", F.col("incubator"), "INCUBATED", "Entity",
        F.col("entity"),
        citation="incubator seed (publicGoods/cyphers.py:181 MATCH)",
    )
    return e_watch.unionByName(e_inc)


# ---------------------------------------------------------------------------
# adapters
# ---------------------------------------------------------------------------

_CIT_PLATFORM = (
    "platform account (creators/cyphers.py:35-63; "
    "professionals/cyphers.py:60-90)"
)


def platform_account_edges(accounts: DataFrame) -> DataFrame:
    """(wallet)-[:HAS_ACCOUNT]->(platform account) for the creator /
    professional platforms.

    Reference: analytics/wic/creators/cyphers.py:35-47 matches
    (wallet)-[:HAS_ACCOUNT]->(:Sound:Account) for Web3Musician and
    :49-63 (:Dune:Account) ``WHERE dune.follows > 0`` for
    Web3DataAnalyst; professionals/cyphers.py:60-90 walks the same
    HAS_ACCOUNT hop from bio-matched accounts. The account's ``follows``
    property rides as the EDGE WEIGHT (the triple surface carries no node
    properties), so the reference's property gate becomes the
    ``subjects_weight_gt`` WIC rule kind; the bio text stays on the feed
    row for ``wic.profession_labels`` (bio rules never join the graph).

    Scale: pure project + dropDuplicates on the feed — no joins; the
    dedup key includes follows (account-keyed, functionally determined),
    so the distinct is exactly the reference's MERGE idempotence.
    """
    ded = accounts.select(
        canonical_key(F.col("address")).alias("subj_key"),
        F.col("platform").alias("obj_label"),
        canonical_key(F.col("account_id")).alias("obj_key"),
        F.col("follows").cast("double").alias("weight"),
    ).dropDuplicates(["subj_key", "obj_label", "obj_key", "weight"])
    return ded.select(
        F.lit("Wallet").alias("subj_label"),
        "subj_key",
        F.lit("HAS_ACCOUNT").alias("pred"),
        "obj_label",
        "obj_key",
        "weight",
        F.lit(_CIT_PLATFORM).cast("string").alias("citation"),
    )


def feed_edge_rules(feeds: dict[str, DataFrame]) -> DataFrame:
    """Union of every rule whose feed tables are present in ``feeds``
    (keys as in sources.feeds.ALL_FEEDS). Missing feeds skip their rules —
    a deployment ingests the sources it has.

    The family plans are CONSTRUCTED on a thread pool: each rule builds
    an independent expression tree through py4j, and that driver-side
    chatter (not Spark execution) measured ~6 s serially for the full
    vocabulary cold — the dominant term of the flagship's first-trial
    plan-compilation cost (round-5 perf item). py4j is thread-safe (one
    gateway connection per thread) and the union is folded in the fixed
    declaration order below, so the output plan is byte-identical to the
    serial construction."""
    rules: list = []  # (guard tables present, thunk) in declaration order
    def _rule(keys, thunk):
        if all(k in feeds for k in keys):
            rules.append(thunk)

    _rule(("transfers",), lambda: transfer_edges(feeds["transfers"]))
    _rule(("followers",), lambda: follows_edges(feeds["followers"]))
    _rule(
        ("proposals", "votes", "space_members", "strategies"),
        lambda: governance_edges(
            feeds["proposals"], feeds["votes"],
            feeds["space_members"], feeds["strategies"],
        ),
    )
    _rule(
        ("grant_admins", "donations"),
        lambda: gitcoin_edges(feeds["grant_admins"], feeds["donations"]),
    )
    _rule(("delegations",), lambda: delegation_edges(feeds["delegations"]))
    _rule(("delegations",), lambda: delegation_role_edges(feeds["delegations"]))
    _rule(("deployments",), lambda: deployment_edges(feeds["deployments"]))
    _rule(("multisig_signers",), lambda: signer_edges(feeds["multisig_signers"]))
    _rule(("nfts",), lambda: nft_edges(feeds["nfts"]))
    _rule(("nft_holdings",), lambda: nft_holding_edges(feeds["nft_holdings"]))
    _rule(
        ("moloch_daos", "moloch_members", "moloch_proposals", "moloch_votes"),
        lambda: moloch_edges(
            feeds["moloch_daos"], feeds["moloch_members"],
            feeds["moloch_proposals"], feeds["moloch_votes"],
        ),
    )
    _rule(("loans",), lambda: loan_edges(feeds["loans"]))
    _rule(("repos",), lambda: repo_edges(feeds["repos"]))
    _rule(
        ("grant_members", "grant_admins"),
        lambda: member_of_edges(feeds["grant_members"], feeds["grant_admins"]),
    )
    _rule(("websites",), lambda: domain_edges(feeds["websites"]))
    _rule(
        ("platform_accounts",),
        lambda: platform_account_edges(feeds["platform_accounts"]),
    )
    _rule(("locks",), lambda: unlock_edges(feeds["locks"]))
    _rule(
        ("ph_communities", "ph_auctions", "ph_proposals", "ph_votes"),
        lambda: prophouse_edges(
            feeds["ph_communities"], feeds["ph_auctions"],
            feeds["ph_proposals"], feeds["ph_votes"],
        ),
    )
    _rule(("threads",), lambda: thread_edges(feeds["threads"]))
    _rule(("ens_events",), lambda: ens_registry_edges(feeds["ens_events"]))
    _rule(
        ("bounties", "grant_tags", "grant_admins"),
        lambda: bounty_edges(
            feeds["bounties"], feeds["grant_tags"], feeds["grant_admins"]
        ),
    )
    _rule(
        ("webhooks", "incubators"),
        lambda: watch_edges(feeds["webhooks"], feeds["incubators"]),
    )
    if not rules:
        raise ValueError("no known feed tables present")
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(8, len(rules))) as pool:
        outs = list(pool.map(lambda f: f(), rules))
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
