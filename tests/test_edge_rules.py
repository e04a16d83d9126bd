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
        [("https://s.example/p/1", "0xn:1", W1), ("https://s.example/p/1", "0xn:1", W2)],
        "article_url string, nft_id string, owner string",
    )
    out = ER.nft_edges(nfts)
    assert _rows(out.select("pred", "subj_key", "obj_key")) == {
        ("HAS_NFT", "https://s.example/p/1", "0xn:1"),
        ("IS_OWNER", W1, "0xn:1"),
        ("IS_OWNER", W2, "0xn:1"),
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
            [(W2, W3)], "multisig string, owner_address string"
        )
    )
    assert _rows(sig.select("subj_key", "pred", "obj_key")) == {
        (W3, "IS_SIGNER", W2)
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
