"""Mention-detection unit tests — positive/negative strings matched to the
reference's extraction rules (citations in functions/mentions.py), plus
whole-corpus parity against the analytic golden mentions."""

import pandas as pd
from pyspark.sql import functions as F

from web3_knowledge_graph_spark.fixtures import corpus
from web3_knowledge_graph_spark.fixtures.corpus import pages_df
from web3_knowledge_graph_spark.functions import mentions as M
from web3_knowledge_graph_spark.functions.extraction import with_extracted_text
from web3_knowledge_graph_spark.plans.pipeline import extract_stage

WALLET = "0x" + "a1" * 20


def _one(spark, text, extractor):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(extractor(F.col("text")).alias("v")).first()["v"]


def test_wallet_regex(spark):
    f = M.extract_wallets
    assert _one(spark, f"send to {WALLET} now", f) == [WALLET]
    assert _one(spark, f"MIXED 0x{'A1'*20}", f) == [WALLET]  # lowercased
    assert _one(spark, "0x" + "a1" * 19 + "a", f) == []  # 39 chars
    assert _one(spark, "0x" + "a1" * 20 + "b", f) == []  # 41 chars
    assert _one(spark, "0x" + "g1" * 20, f) == []  # bad hex


def test_ens_regex(spark):
    f = M.extract_ens_names
    assert _one(spark, "hi alice.eth!", f) == ["alice.eth"]
    # reference regex is case-sensitive on the .eth suffix
    # (twitterBiosENS/process.py:22) — mixed-case labels match, .ETH does not
    assert _one(spark, "sub.Name.eth ok", f) == ["sub.name.eth"]
    assert _one(spark, "sub.name.ETH ok", f) == []
    assert _one(spark, "trap fake.ethereum.org here", f) == []
    assert _one(spark, "a-b_c.eth and x.eth", f) == ["a-b_c.eth", "x.eth"]


def test_handle_regex(spark):
    f = M.extract_handles
    assert _one(spark, "cc @Alice_9 ok", f) == ["alice_9"]
    assert _one(spark, "@thishandleisdefinitelytoolong nope", f) == []
    assert _one(spark, "mail a@b.com", f) == ["b"]  # reference @\w+ behavior


def test_url_and_twitter(spark):
    assert _one(spark, "see https://x.example/a and https://cdn.example/p.png", M.extract_urls) == [
        "https://x.example/a"
    ]
    assert _one(spark, "https://twitter.com/Bob https://twitter.com/bob", M.extract_twitter_handles) == [
        "bob",
        "bob",
    ]


def test_corpus_mentions_parity(spark):
    """Pipeline extract stage == analytic golden mentions, exactly."""
    n = 400
    pages = pages_df(spark, n, partitions=4)
    alias_dict = spark.createDataFrame(corpus.alias_dict_pdf())
    got = extract_stage(pages, alias_dict).toPandas()
    want = corpus.golden_mentions(n)
    key = ["url", "kind", "value"]
    g = got.sort_values(key).reset_index(drop=True)
    w = want.sort_values(key).reset_index(drop=True)
    merged = g.merge(w, on=key, how="outer", suffixes=("_got", "_want"), indicator=True)
    only_got = merged[merged._merge == "left_only"]
    only_want = merged[merged._merge == "right_only"]
    assert only_got.empty, f"unexpected mentions:\n{only_got.head(10)}"
    assert only_want.empty, f"missed mentions:\n{only_want.head(10)}"
    bad_n = merged[(merged._merge == "both") & (merged.n_got != merged.n_want)]
    assert bad_n.empty, f"count mismatches:\n{bad_n.head(10)}"


URL_FULL_CASES = [
    "visit https://site3.example/p/42 now",
    "docs at docs3.example.com/guide mirror ftp://files2.backup.org/data",
    "homepage example1.com wow",
    "plain example.com",
    "email user@site.com should shift",  # lookbehind wart kept verbatim
    "media https://cdn1.example/a.jpg dropped later",
    "paren (https://en.org/wiki_(x)) text",
    "trailing https://a.example/x. end",
    "bare domain.ac/ slash",
    "two example1.com example2.com adjacent",
    "A wallet: 0xabc and time:30 edge",
    "start.com leads",
    "nothing here at all",
]


def test_url_full_re2_matches_verbatim():
    """The RE2-safe oracle emulation (no lookarounds) produces the exact
    findall output of the reference-verbatim pattern on adversarial
    strings — including the email case where the lookbehind shifts the
    match by one char rather than suppressing it."""
    import re

    import duckdb

    con = duckdb.connect()
    for s in URL_FULL_CASES:
        py = re.findall(M.URL_FULL_RE, s)
        dd = con.execute(
            "select regexp_extract_all(?, ?, 1)", [s, M.URL_FULL_RE_RE2]
        ).fetchone()[0]
        assert py == dd, f"{s!r}: python={py} duckdb={dd}"


def test_url_full_spark_matches_verbatim(spark):
    """Spark (Java regex) runs the verbatim pattern identically to the
    reference's Python re.findall, including the media-containment drop."""
    import re

    for s in URL_FULL_CASES:
        py = [
            u
            for u in re.findall(M.URL_FULL_RE, s)
            if not any(e in u for e in M.MEDIA_EXTS)
        ]
        got = _one(spark, s, M.extract_urls_full)
        assert got == py, f"{s!r}: spark={got} python={py}"


def test_dictionary_mentions_chunked_large_dict(spark):
    """>256 aliases forces multiple alternation chunks; matches must equal
    the single-pattern semantics (tokenizer-charset boundaries, counts)."""
    n = 600
    rows = [("eid%03d" % i, "token", ["alias%03d" % i]) for i in range(n)]
    d = spark.createDataFrame(rows, "entity_id string, kind string, aliases array<string>")
    text = "alias000 alias299 alias299! alias599 alias600 xalias001 alias002x alias003.tail"
    df = spark.createDataFrame([("u1", text)], "url string, text string")
    got = {
        (r.value, r.n)
        for r in M.dictionary_mentions(df, d).collect()
    }
    # alias600 doesn't exist; embedded/suffixed/charset-joined forms don't
    # match (x-prefix, x-suffix, '.'-joined stays one token)
    assert got == {("eid000", 1), ("eid299", 2), ("eid599", 1)}


def test_positive_complement_equivalence(spark):
    """positive_complement_class(X) denotes EXACTLY the codepoints of
    [^X]: equal match counts on adversarial strings (unicode, astral,
    boundary chars) for every hot charset, Java-regex side."""
    from pyspark.sql import functions as F

    from web3_knowledge_graph_spark.functions.charclass import (
        ASCII_LOWER,
        ASCII_UPPER,
        DIGITS,
        JAVA_WS,
        positive_complement_class,
    )

    cases = [
        ("a-z0-9_.@-", ASCII_LOWER + DIGITS + "_.@-"),
        ("a-z0-9", ASCII_LOWER + DIGITS),
        (r"A-Za-z0-9\s", ASCII_UPPER + ASCII_LOWER + DIGITS + JAVA_WS),
        ("\\s<>\"'", JAVA_WS + "<>\"'"),
    ]
    texts = [
        "plain words 0x123 under_score dot.dash-at@ MIX eD",
        "unicode: émoji 🎉 «quotes» – dash\u2014em \u00a0nbsp \uffff high",
        "edge`~!#$%^&*()[]{}|;:,/?\\+=",
        "",
        " \t\n\x0b\f\r",
        "\U0001F600\U0010FFFF astral",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    for neg_body, chars in cases:
        neg = f"[^{neg_body}]"
        pos = positive_complement_class(chars)
        row = df.select(
            F.sum(F.regexp_count(F.col("t"), F.lit(neg))).alias("a"),
            F.sum(F.regexp_count(F.col("t"), F.lit(pos))).alias("b"),
        ).collect()[0]
        assert row.a == row.b, (neg_body, row.a, row.b)
