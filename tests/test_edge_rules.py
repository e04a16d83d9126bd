"""Hand-traced semantics tests for the widened edge vocabulary
(operators/edge_rules.py): every negative trap each reference MERGE site
implies — dedup-before-count, MATCH-join drops, address gates, latest-wins
delegation — on literal mini-feeds."""

from pyspark.sql import functions as F

from web3_knowledge_graph_spark.operators import edge_rules as ER

W1 = "0x" + "a" * 40
W2 = "0x" + "b" * 40
W3 = "0x" + "c" * 40


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_transfer_edges_dedup_and_nb_transfer(spark):
    # duplicate (from,to,hash) rows collapse BEFORE counting
    # (ingest.py:31 drop_duplicates) — weight counts distinct hashes
    t = spark.createDataFrame(
        [
            (W1, W2, "0xh1"),
            (W1, W2, "0xH1"),  # same hash, case-folded → dedup
            (W1, W2, "0xh2"),
            (W2, W3, "0xh3"),
        ],
        "from_address string, to_address string, tx_hash string",
    )
    out = ER.transfer_edges(t)
    tr = _rows(
        out.where(F.col("pred") == "TRANSFERRED").select(
            "subj_key", "obj_key", "weight"
        )
    )
    assert tr == {(W1, W2, 2.0), (W2, W3, 1.0)}
    rc = _rows(
        out.where(F.col("pred") == "RECEIVED").select("subj_key", "obj_key")
    )
    assert rc == {(W2, "0xh1"), (W2, "0xh2"), (W3, "0xh3")}
    assert {r[0] for r in _rows(out.select("obj_label", "pred"))} >= {
        "Wallet", "Transaction"
    }


def test_follows_edges_direction(spark):
    # follower-list row: follower→handle; following-list row: handle→follower
    f = spark.createDataFrame(
        [
            ("Alice", "bob", "follower"),
            ("alice", "carol", "following"),
            ("alice", "BOB", "follower"),  # dup after lowering
        ],
        "handle string, follower string, list_kind string",
    )
    got = _rows(ER.follows_edges(f).select("subj_key", "obj_key"))
    assert got == {("bob", "alice"), ("alice", "carol")}


def test_governance_votes_require_matched_proposal(spark):
    # link_votes MATCHes the Proposal node — a vote on an uningested
    # proposal binds nothing (snapshot/cyphers.py:243-259)
    props = spark.createDataFrame(
        [("p1", "space1.eth", W1)], "proposal_id string, space_id string, author string"
    )
    votes = spark.createDataFrame(
        [("v1", W2, "p1"), ("v2", W3, "p9"), ("v3", W2, "p1")],
        "vote_id string, voter string, proposal_id string",
    )
    members = spark.createDataFrame(
        [("space1.eth", W3, "admin")],
        "space_id string, address string, member_type string",
    )
    strategies = spark.createDataFrame(
        [("space1.eth", "0x" + "d" * 40), ("space1.eth", "0x" + "e" * 10)],
        "space_id string, token_address string",
    )
    out = ER.governance_edges(props, votes, members, strategies)
    by_pred = {
        p: _rows(out.where(F.col("pred") == p).select("subj_key", "obj_key"))
        for p in ("HAS_PROPOSAL", "AUTHOR", "VOTED", "CONTRIBUTOR", "HAS_STRATEGY")
    }
    assert by_pred["HAS_PROPOSAL"] == {("space1.eth", "p1")}
    assert by_pred["AUTHOR"] == {(W1, "p1")}
    assert by_pred["VOTED"] == {(W2, "p1")}  # p9 vote dropped, v1/v3 dedup
    assert by_pred["CONTRIBUTOR"] == {(W3, "space1.eth")}
    # 10-hex strategy address fails the ^0x[40 hex]$ gate (ingest.py:150-158)
    assert by_pred["HAS_STRATEGY"] == {("space1.eth", "0x" + "d" * 40)}
    cit = out.where(F.col("pred") == "CONTRIBUTOR").first()["citation"]
    assert "admin" in cit


def test_gitcoin_donation_destination_gate(spark):
    # a donation binds its grant only via destination == grant admin
    # (gitcoin/cyphers.py:227-229 MATCH through IS_ADMIN)
    admins = spark.createDataFrame(
        [("g1", W1)], "grant_id string, address string"
    )
    donations = spark.createDataFrame(
        [
            ("0xt1", W2, "g1", W1, 5.0),
            ("0xt2", W2, "g1", W3, 5.0),  # wrong destination → dropped
            ("0xt3", W2, "g1", W1, 5.0),
            ("0xt4", W3, "g2", W1, 5.0),  # no admin row for g2 → dropped
        ],
        "tx_hash string, donor string, grant_id string, destination string,"
        " amount double",
    )
    out = ER.gitcoin_edges(admins, donations)
    don = _rows(
        out.where(F.col("pred") == "DONATION").select("subj_key", "obj_key", "weight")
    )
    assert don == {(W2, "g1", 2.0)}
    assert _rows(
        out.where(F.col("pred") == "IS_ADMIN").select("subj_key", "obj_key")
    ) == {(W1, "g1")}


def test_gitcoin_donor_threshold_nontrivial_at_fixture_scale(spark):
    """The GitcoinGrantDonor WIC context (> 2 distinct grants per donor,
    publicGoods/cyphers.py:8-18) must label REAL rows on the driver
    fixtures — guards sources/feeds.DONATIONS_SQL keying valid
    destinations by the grant's actual admin. A prior revision keyed them
    by the grant id itself, so no donation survived the destination gate
    past 1 grant per donor and the driver oracle row was trivially 0≡0."""
    from web3_knowledge_graph_spark.sources.feeds import feed

    sf = "/root/testdata/sf0.001"
    out = ER.gitcoin_edges(
        feed(spark, sf, "grant_admins"), feed(spark, sf, "donations")
    )
    donors_over = (
        out.where(F.col("pred") == "DONATION")
        .groupBy("subj_key")
        .agg(F.countDistinct("obj_key").alias("g"))
        .where(F.col("g") > 2)
        .count()
    )
    assert donors_over > 0


def test_delegation_latest_change_wins(spark):
    # DELEGATES_TO reflects the latest change per (protocol, delegator);
    # per-protocol edges stay distinct (delegation/cyphers.py:156-199)
    d = spark.createDataFrame(
        [
            ("compound", W1, W2, 10, "0xa"),
            ("compound", W1, W3, 20, "0xb"),  # later block wins
            ("uniswap", W1, W2, 5, "0xc"),
        ],
        "protocol string, delegator string, delegate string,"
        " block_number long, tx_hash string",
    )
    out = ER.delegation_edges(d)
    got = _rows(out.select("subj_key", "obj_key", "citation"))
    assert got == {
        (W1, W3, "delegation:compound (delegation/cyphers.py:156-199)"),
        (W1, W2, "delegation:uniswap (delegation/cyphers.py:156-199)"),
    }


def test_nft_and_ownership_edges(spark):
    nfts = spark.createDataFrame(
        [
            ("https://s.example/p/1", "0xn:1", W1, W3),
            ("https://s.example/p/1", "0xn:1", W2, W3),
        ],
        "article_url string, nft_id string, owner string, funding_recipient string",
    )
    out = ER.nft_edges(nfts)
    assert _rows(out.select("pred", "subj_key", "obj_key")) == {
        ("HAS_NFT", "https://s.example/p/1", "0xn:1"),
        ("IS_OWNER", W1, "0xn:1"),
        ("IS_OWNER", W2, "0xn:1"),
        ("IS_RECEIPIENT", W3, "0xn:1"),
    }
    dep = ER.deployment_edges(
        spark.createDataFrame(
            [("0x" + "f" * 40, W1, "0xt")],
            "contract_address string, deployer string, tx_hash string",
        )
    )
    assert _rows(dep.select("subj_key", "pred", "obj_key")) == {
        (W1, "DEPLOYED", "0x" + "f" * 40)
    }
    sig = ER.signer_edges(
        spark.createDataFrame(
            [(W2, W3, W1)], "multisig string, owner_address string, creator string"
        )
    )
    assert _rows(sig.select("subj_key", "pred", "obj_key")) == {
        (W3, "IS_SIGNER", W2),
        (W1, "IS_CREATOR", W2),
    }


def test_adapters_roundtrip(spark):
    t = spark.createDataFrame(
        [(W1, W2, "0xh1")],
        "from_address string, to_address string, tx_hash string",
    )
    edges = ER.transfer_edges(t)
    named = ER.as_named_triples(edges)
    assert set(named.columns) == {"subj", "pred", "obj", "weight", "citation"}
    assert _rows(named.select("subj", "pred", "obj")) == {
        (f"Wallet:{W1}", "TRANSFERRED", f"Wallet:{W2}"),
        (f"Wallet:{W2}", "RECEIVED", "Transaction:0xh1"),
    }
    ids = ER.as_id_edges(edges)
    dim = ER.node_dim(edges).dropDuplicates(["id"])
    # every edge endpoint resolves in the node dimension
    resolved = (
        ids.join(dim.select(F.col("id").alias("subj")), "subj")
        .join(dim.select(F.col("id").alias("obj")), "obj")
        .count()
    )
    assert resolved == ids.count() == 2


def test_feed_edge_rules_union_and_missing_feeds(spark):
    t = spark.createDataFrame(
        [(W1, W2, "0xh1")],
        "from_address string, to_address string, tx_hash string",
    )
    f = spark.createDataFrame(
        [("a", "b", "follower")], "handle string, follower string, list_kind string"
    )
    out = ER.feed_edge_rules({"transfers": t, "followers": f})
    assert _rows(out.select("pred")) == {("TRANSFERRED",), ("RECEIVED",), ("FOLLOWS",)}
    try:
        ER.feed_edge_rules({})
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_nft_holding_rotation_anti_join(spark):
    # curr holders → HOLDS_TOKEN (weight = distinct tokenIds); prev holders
    # absent from curr rotate to HELD_TOKEN (tokenHolders/cypher.py:28-150);
    # balance-0 rows are not holders on either side
    h = spark.createDataFrame(
        [
            (W1, "0xtok", "1", 1, "prev"),
            (W1, "0xtok", "2", 2, "prev"),   # id 2 absent from curr → rotates
            (W1, "0xtok", "3", 0, "prev"),   # zero balance: never a holder
            (W1, "0xtok", "1", 1, "curr"),
            (W1, "0xtok", "4", 1, "curr"),
            (W1, "0xtok", "5", 0, "curr"),   # zeroed in curr: not held NOW,
            (W1, "0xtok", "5", 1, "prev"),   # so its prev twin rotates
            (W2, "0xtok", "1", 1, "curr"),
        ],
        "address string, contract_address string, token_id string,"
        " balance long, snapshot string",
    )
    out = ER.nft_holding_edges(h)
    holds = _rows(
        out.where(F.col("pred") == "HOLDS_TOKEN").select(
            "subj_key", "obj_key", "weight"
        )
    )
    assert holds == {(W1, "0xtok", 2.0), (W2, "0xtok", 1.0)}
    held = _rows(
        out.where(F.col("pred") == "HELD_TOKEN").select(
            "subj_key", "obj_key", "weight"
        )
    )
    assert held == {(W1, "0xtok", 2.0)}  # ids 2 and 5 rotated


def test_moloch_edges_gates_and_joins(spark):
    daos = spark.createDataFrame(
        [("dao1", W1, "0xtok")],
        "dao_id string, summoner string, token_address string",
    )
    members = spark.createDataFrame(
        [
            ("dao1", W2, 3),
            ("dao1", W2, 9),      # duplicate member: max-shares fold
            ("dao9", W3, 5),      # dao9 never ingested → drops
        ],
        "dao_id string, member string, shares long",
    )
    proposals = spark.createDataFrame(
        [
            # sponsored, processed, tribute>0, payment=0
            ("p1", "dao1", W1, W2, W3, W2, 4.0, 0.0),
            # unsponsored, unprocessed, tribute=0, payment>0, dao unknown
            ("p2", "dao9", W2, None, None, W3, 0.0, 7.0),
        ],
        "proposal_id string, dao_id string, proposer string, sponsor string,"
        " processor string, applicant string, tribute_offered double,"
        " payment_requested double",
    )
    votes = spark.createDataFrame(
        [
            ("v1", "p1", "dao1", W3, 2),
            ("v2", "p9", "dao1", W3, 2),  # proposal p9 never ingested
            ("v3", "p2", "dao9", W2, 1),  # p2 exists; dao9 doesn't
        ],
        "vote_id string, proposal_id string, dao_id string, voter string,"
        " shares long",
    )
    out = ER.moloch_edges(daos, members, proposals, votes)
    by = {
        p: _rows(out.where(F.col("pred") == p).select("subj_key", "obj_key", "weight"))
        for p in (
            "SUMMONER", "HAS_TOKEN", "IS_MEMBER", "HAS_PROPOSAL", "AUTHOR",
            "SPONSORED", "EXECUTED", "IS_APPLICANT", "IS_TRIBUTING",
            "IS_PAYING", "VOTED", "IS_VOTER",
        )
    }
    assert by["SUMMONER"] == {(W1, "dao1", 1.0)}
    assert by["HAS_TOKEN"] == {("dao1", "0xtok", 1.0)}
    assert by["IS_MEMBER"] == {(W2, "dao1", 9.0)}          # max(3, 9); dao9 dropped
    assert by["HAS_PROPOSAL"] == {("dao1", "p1", 1.0)}     # p2's dao unknown
    assert by["AUTHOR"] == {(W1, "p1", 1.0), (W2, "p2", 1.0)}
    assert by["SPONSORED"] == {(W2, "p1", 1.0)}            # NULL sponsor drops
    assert by["EXECUTED"] == {(W3, "p1", 1.0)}
    assert by["IS_APPLICANT"] == {(W2, "p1", 1.0), (W3, "p2", 1.0)}
    assert by["IS_TRIBUTING"] == {(W2, "p1", 4.0)}         # tribute 0 drops
    assert by["IS_PAYING"] == {("p2", W3, 7.0)}            # payment 0 drops
    assert by["VOTED"] == {(W3, "p1", 1.0), (W2, "p2", 1.0)}   # p9 drops
    assert by["IS_VOTER"] == {(W3, "dao1", 1.0)}           # dao9 drops


def test_loan_edges_denomination_gate_and_collateral_citation(spark):
    loans = spark.createDataFrame(
        [
            ("l1", W1, W2, "0xnft", "7", "0x" + "d" * 40),
            ("l2", W2, W3, "0xnft", "9", "0x" + "e" * 10),  # truncated → no denom
        ],
        "loan_id string, borrower string, lender string,"
        " collateral_contract string, collateral_token_id string,"
        " denomination_token string",
    )
    out = ER.loan_edges(loans)
    assert _rows(
        out.where(F.col("pred") == "BORROWED").select("subj_key", "obj_key")
    ) == {(W1, "l1"), (W2, "l2")}
    assert _rows(
        out.where(F.col("pred") == "LENT").select("subj_key", "obj_key")
    ) == {(W2, "l1"), (W3, "l2")}
    assert _rows(
        out.where(F.col("pred") == "IS_DENOMINATION").select("subj_key", "obj_key")
    ) == {("0x" + "d" * 40, "l1")}
    coll = {
        (r.obj_key, r.citation)
        for r in out.where(F.col("pred") == "IS_COLLATERAL").collect()
    }
    assert coll == {
        ("l1", "loan collateral tokenId=7 (NFTfi/cyphers.py:79-88)"),
        ("l2", "loan collateral tokenId=9 (NFTfi/cyphers.py:79-88)"),
    }
    # venue-less feed (no marketplace column): no BORROWER/LENDER families
    assert out.where(F.col("pred").isin("BORROWER", "LENDER")).count() == 0


def test_loan_edges_marketplace_families(spark):
    """The traders-analyzer venue surface (traders/cyphers.py:55-180):
    a marketplace column adds (wallet)-[:BORROWER|LENDER]->(Marketplace)
    per loan row."""
    loans = spark.createDataFrame(
        [
            ("l1", W1, W2, "0xnft", "7", "0x" + "d" * 40, "x2y2"),
            ("l2", W2, W3, "0xnft", "9", "0x" + "e" * 40, "bend"),
        ],
        "loan_id string, borrower string, lender string,"
        " collateral_contract string, collateral_token_id string,"
        " denomination_token string, marketplace string",
    )
    out = ER.loan_edges(loans)
    assert _rows(
        out.where(F.col("pred") == "BORROWER").select("subj_key", "obj_key")
    ) == {(W1, "x2y2"), (W2, "bend")}
    assert _rows(
        out.where(F.col("pred") == "LENDER")
        .select("subj_key", "obj_label", "obj_key")
    ) == {(W2, "Marketplace", "x2y2"), (W3, "Marketplace", "bend")}


def test_repo_edges_null_drop_and_role_map(spark):
    tok = "0x" + "a" * 40
    repos = spark.createDataFrame(
        [
            ("Org/Repo", "Dev1", "owner", None),
            ("org/repo", "dev1", "owner", None),     # case-fold dup
            # NULL handle drops the role family but keeps the token hop
            ("org/repo", None, "contributor", tok),
            ("org/repo2", "dev2", "subscriber", None),
            (None, "dev3", "contributor", tok),      # NULL repo drops both
        ],
        "full_name string, handle string, role string, token_address string",
    )
    got = _rows(ER.repo_edges(repos).select("subj_key", "pred", "obj_key"))
    assert got == {
        ("dev1", "OWNER", "org/repo"),
        ("dev2", "SUBSCRIBER", "org/repo2"),
        (tok, "HAS_REPOSITORY", "org/repo"),
    }


def test_member_of_requires_ingested_grant(spark):
    members = spark.createDataFrame(
        [("g1", "u1"), ("g9", "u2"), ("G1", "U1")],  # g9 unknown; case dup
        "grant_id string, user_id string",
    )
    admins = spark.createDataFrame(
        [("g1", W1)], "grant_id string, address string"
    )
    got = _rows(
        ER.member_of_edges(members, admins).select(
            "subj_label", "subj_key", "obj_key"
        )
    )
    assert got == {("GitcoinAccount", "u1", "g1")}


def test_domain_edges_host_extraction_and_malformed_drop(spark):
    sites = spark.createDataFrame(
        [
            ("https://User3.example/about",),
            ("https://user3.example/other",),  # same host, different url
            ("not a url",),                    # no host → drops
            ("https://user3.example:8443/port",),   # :port strips
            ("https://bob@user3.example/auth",),    # userinfo@ strips
        ],
        "website_url string",
    )
    got = _rows(ER.domain_edges(sites).select("subj_key", "obj_key"))
    assert got == {
        ("https://user3.example/about", "user3.example"),
        ("https://user3.example/other", "user3.example"),
        ("https://user3.example:8443/port", "user3.example"),
        ("https://bob@user3.example/auth", "user3.example"),
    }


def test_delegation_role_edges_distinct_hub(spark):
    tok_c, tok_u = "0x" + "c" * 40, "0x" + "d" * 40
    d = spark.createDataFrame(
        [
            ("compound", W1, W2, 1, "0xh1", tok_c),
            ("compound", W1, W3, 2, "0xh2", tok_c),  # same delegator, later target
            ("uniswap", W2, W3, 1, "0xh3", tok_u),
        ],
        "protocol string, delegator string, delegate string,"
        " block_number long, tx_hash string, contract_address string",
    )
    out = ER.delegation_role_edges(d)
    assert _rows(
        out.where(F.col("pred") == "HAS_DELEGATION").select("subj_key", "obj_key")
    ) == {("compound", "compound"), ("uniswap", "uniswap")}
    assert _rows(
        out.where(F.col("pred") == "IS_DELEGATING").select("subj_key", "obj_key")
    ) == {(W1, "compound"), (W2, "uniswap")}
    # BOTH targets of the delegator stay linked to the hub (the reference
    # never detaches IS_DELEGATE on a re-delegation, only DELEGATES_TO)
    assert _rows(
        out.where(F.col("pred") == "IS_DELEGATE").select("subj_key", "obj_key")
    ) == {(W2, "compound"), (W3, "compound"), (W3, "uniswap")}
    # one USE_TOKEN hop per protocol (delegation/cyphers.py:71-88)
    assert _rows(
        out.where(F.col("pred") == "USE_TOKEN").select("subj_key", "obj_key")
    ) == {("compound", tok_c), ("uniswap", tok_u)}


def test_dedup_by_id_conflicting_duplicates_deterministic(spark):
    """A feed violating the unique-id contract must still produce ONE
    deterministic row per id — the lexicographic MAX of the remaining
    columns — not an arbitrary partition-order-dependent pick
    (_dedup_by_id; round-3 advice on dropDuplicates([id]))."""
    loans = spark.createDataFrame(
        [
            # same loan_id, conflicting borrower/lender: the max struct
            # (W3 > W1 lexicographically on the first field) must win
            ("l1", W1, W2, "0xnft", "7", "0x" + "d" * 40),
            ("l1", W3, W2, "0xnft", "7", "0x" + "d" * 40),
        ],
        "loan_id string, borrower string, lender string,"
        " collateral_contract string, collateral_token_id string,"
        " denomination_token string",
    )
    for _ in range(3):  # stable across repeated evaluations
        out = ER.loan_edges(loans)
        assert _rows(
            out.where(F.col("pred") == "BORROWED").select("subj_key", "obj_key")
        ) == {(W3, "l1")}

    # unique-id (contract-conforming) input: identical to dropDuplicates
    rows = spark.createDataFrame(
        [("p1", "s1", W1), ("p2", "s2", W2)],
        "proposal_id string, space_id string, author string",
    )
    ded = ER._dedup_by_id(rows, "proposal_id")
    assert ded.columns == ["proposal_id", "space_id", "author"]
    assert _rows(ded) == {("p1", "s1", W1), ("p2", "s2", W2)}


def test_unlock_edges_four_families(spark):
    locks = spark.createDataFrame(
        [("0xL1", "0xK1", W1, W2), ("0xL1", "0xK1", W1, W3)],  # two holders
        "lock_address string, key_address string, manager string, holder string",
    )
    got = _rows(ER.unlock_edges(locks).select("subj_key", "pred", "obj_key"))
    assert got == {
        (W1, "CREATED", "0xl1"),
        ("0xl1", "HAS_KEY", "0xk1"),
        (W2, "HOLDS", "0xl1"),
        (W2, "HOLDS", "0xk1"),
        (W3, "HOLDS", "0xl1"),
        (W3, "HOLDS", "0xk1"),
    }


def test_prophouse_match_drops_and_gates(spark):
    tok = "0x" + "e" * 40
    comm = spark.createDataFrame(
        [("c1", tok), ("c2", tok[:12])],  # c2: truncated-token gate
        "community_id string, contract_address string",
    )
    auct = spark.createDataFrame(
        [("a1", "c1"), ("a2", "c9")],  # c9 unknown → HAS_AUCTION drops
        "auction_id string, community_id string",
    )
    prop = spark.createDataFrame(
        [
            ("p1", "a1", "c1", W1),
            ("p2", "a9", "c9", W2),  # both joins drop; AUTHOR survives
        ],
        "proposal_id string, auction_id string, community_id string, address string",
    )
    votes = spark.createDataFrame(
        [
            (W3, "p1", 4, 1),
            (W3, "p1", 2, 0),   # same voter re-votes → max weight wins
            (W3, "p9", 9, 1),   # unknown proposal → drops
        ],
        "address string, proposal_id string, weight long, direction long",
    )
    out = ER.prophouse_edges(comm, auct, prop, votes)
    got = _rows(out.select("subj_key", "pred", "obj_key", "weight"))
    assert got == {
        ("c1", "HAS_STRATEGY", tok, 1.0),
        ("c1", "HAS_TOKEN", tok, 1.0),
        ("a1", "HAS_AUCTION", "c1", 1.0),
        ("a1", "HAS_PROPOSAL", "p1", 1.0),
        (W1, "AUTHOR", "p1", 1.0),
        (W2, "AUTHOR", "p2", 1.0),
        ("c1", "HAS_PROPOSAL", "p1", 1.0),
        (W3, "VOTED", "p1", 4.0),
    }


def test_thread_edges_casefold_roles(spark):
    t = spark.createDataFrame(
        [
            ("Conv1", "Alice", "author"),
            ("conv1", "alice", "author"),  # case-fold dup
            ("conv1", "bob", "reply"),
        ],
        "conversation_id string, handle string, role string",
    )
    got = _rows(ER.thread_edges(t).select("subj_key", "pred", "obj_key"))
    assert got == {
        ("alice", "AUTHOR", "conv1"),
        ("bob", "REPLIED", "conv1"),
    }


def test_ens_registry_event_kinds(spark):
    e = spark.createDataFrame(
        [
            ("n1.eth", W1, W2, "0xt1", 1, "registration"),
            ("n1.eth", W1, W2, "0xt2", 2, "transfer"),
            ("n1.eth", W2, W3, "0xt3", 3, "burn"),
        ],
        "name string, owner string, to_address string, tx_hash string,"
        " block_number long, kind string",
    )
    got = _rows(ER.ens_registry_edges(e).select("subj_key", "pred", "obj_key"))
    assert got == {
        (W1, "REGISTERED", "n1.eth"),
        (W1, "TRANSFERRED", W2),
        (W2, "BURNED", "n1.eth"),
        # registrations also land the entity→alias name edge
        # (helpers/queries.py:170-183), name-keyed — one row per name
        ("n1.eth", "HAS_NAME", "n1.eth"),
    }


def test_bounty_edges_gates(spark):
    bounties = spark.createDataFrame(
        [
            ("b1", "org1", "o1", "u1", W1, "fulfilled"),
            # NULL wallet → no HAS_WALLET
            ("b2", "org1", "o1", "u2", None, "interested"),
            # no engagement family; NULL owner → no IS_OWNER
            ("b3", "org2", None, "u3", W3, "open"),
        ],
        "bounty_id string, org_name string, owner_id string, user_id string,"
        " user_wallet string, status string",
    )
    tags = spark.createDataFrame(
        [("g1", "DeFi"), ("g9", "NFT")],  # g9 never ingested → drops
        "grant_id string, label string",
    )
    admins = spark.createDataFrame(
        [("g1", W2)], "grant_id string, address string"
    )
    got = _rows(
        ER.bounty_edges(bounties, tags, admins).select(
            "subj_key", "pred", "obj_key"
        )
    )
    assert got == {
        ("g1", "HAS_TAG", "defi"),
        ("org1", "HAS_BOUNTY", "b1"),
        ("org1", "HAS_BOUNTY", "b2"),
        ("org2", "HAS_BOUNTY", "b3"),
        ("o1", "IS_OWNER", "b1"),
        ("o1", "IS_OWNER", "b2"),
        ("u1", "HAS_FULLFILLED", "b1"),
        ("u2", "HAS_INTEREST", "b2"),
        ("u1", "HAS_WALLET", W1),
        ("u3", "HAS_WALLET", W3),
    }


def test_watch_edges_item_label_and_seeds(spark):
    wh = spark.createDataFrame(
        [("w1", "Wallet", W1), ("w1", "Token", "0xT")],
        "webhook_id string, item_kind string, address string",
    )
    inc = spark.createDataFrame(
        [("inc1", "org1")], "incubator string, entity string"
    )
    got = _rows(
        ER.watch_edges(wh, inc).select("subj_label", "subj_key", "pred", "obj_key")
    )
    assert got == {
        ("Wallet", W1, "IS_WATCHED_BY", "w1"),
        ("Token", "0xt", "IS_WATCHED_BY", "w1"),
        ("Entity", "inc1", "INCUBATED", "org1"),
    }


def test_null_endpoint_gates_drop_rows(spark):
    # sparse real feeds carry NULL endpoint columns; the reference's
    # endpoint MATCH silently drops such rows — no NULL-keyed edges
    # (round-4 advice: IS_CREATOR / IS_OWNER / IS_RECEIPIENT / USE_TOKEN /
    # unlock manager & holder)
    sig = spark.createDataFrame(
        [(W1, W2, None), (W3, W2, W1)],
        "owner_address string, multisig string, creator string",
    )
    out = ER.signer_edges(sig)
    assert out.where(F.col("subj_key").isNull()).count() == 0
    assert _rows(
        out.where(F.col("pred") == "IS_CREATOR").select("subj_key")
    ) == {(W1,)}

    nft = spark.createDataFrame(
        [("u1", "n1", None, None), ("u2", "n2", W1, W2)],
        "article_url string, nft_id string, owner string,"
        " funding_recipient string",
    )
    nout = ER.nft_edges(nft)
    assert nout.where(F.col("subj_key").isNull()).count() == 0
    assert _rows(nout.select("pred", "subj_key", "obj_key")) == {
        ("HAS_NFT", "u1", "n1"),
        ("HAS_NFT", "u2", "n2"),
        ("IS_OWNER", W1, "n2"),
        ("IS_RECEIPIENT", W2, "n2"),
    }

    locks = spark.createDataFrame(
        [("l1", "k1", None, None), ("l2", "k2", W1, W2)],
        "lock_address string, key_address string, manager string,"
        " holder string",
    )
    lout = ER.unlock_edges(locks)
    assert lout.where(F.col("subj_key").isNull()).count() == 0
    assert lout.where(F.col("obj_key").isNull()).count() == 0
    preds = _rows(lout.select("pred", "subj_key"))
    assert ("CREATED", W1) in preds and ("HOLDS", W2) in preds
    assert lout.where(F.col("pred") == "CREATED").count() == 1
    assert lout.where(F.col("pred") == "HOLDS").count() == 2

    dele = spark.createDataFrame(
        [("p1", W1, W2, None), ("p2", W1, W2, "0xT")],
        "protocol string, delegator string, delegate string,"
        " contract_address string",
    )
    dout = ER.delegation_role_edges(dele)
    assert dout.where(F.col("obj_key").isNull()).count() == 0
    assert _rows(
        dout.where(F.col("pred") == "USE_TOKEN").select("subj_key", "obj_key")
    ) == {("p2", "0xt")}


def test_watch_edges_junk_kind_dropped(spark):
    # a miscased or junk item_kind must not mint a node-label keyspace —
    # the reference MATCH restricts to :Wallet|:Token (round-4 advice)
    wh = spark.createDataFrame(
        [("w1", "Wallet", W1), ("w1", "wallet", W2), ("w1", "NFT", "0xT")],
        "webhook_id string, item_kind string, address string",
    )
    inc = spark.createDataFrame(
        [("inc1", "org1")], "incubator string, entity string"
    )
    got = _rows(
        ER.watch_edges(wh, inc)
        .where(F.col("pred") == "IS_WATCHED_BY")
        .select("subj_label", "subj_key")
    )
    assert got == {("Wallet", W1)}
