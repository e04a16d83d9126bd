"""Fuzz the mention extractors against an independent pure-Python reference
implementation of the same spec (candidate regex → filter → lower), over
adversarial generated text: near-miss wallets (39/41 hex), substring traps
(fake.ethereum.org), over-long handles, glued tokens, unicode noise.

One Spark job covers all generated rows (batched, not per-example)."""

from __future__ import annotations

import random
import re

from pyspark.sql import functions as F

from web3_knowledge_graph_spark.functions import mentions as M

WALLET_CAND = re.compile(r"0x[a-fA-F0-9]+")
ENS_TOKEN = re.compile(r"[-a-zA-Z0-9@:%._+~#=]+")
ENS_TRAIL = re.compile(r"[-@:%._+~#=]+$")
ENS_FULL = re.compile(r"^[-a-zA-Z0-9@:%._+~#=]{1,256}\.eth$")
# Python \w is UNICODE — the upstream reference's semantics; the engine's
# widened [\w\p{L}] candidate classes exist exactly to match this model
# on non-ASCII-adjacent text (mentions.py module docstring).
HANDLE_CAND = re.compile(r"@\w+")
HANDLE_OK = re.compile(r"^[A-Za-z0-9_]{1,15}$")
URL = re.compile(r"https?://[^\s<>\"']+")
MEDIA = re.compile(r"\.(gif|jpg|jpeg|png|mp4|mp3)")
TWITTER = re.compile(r"twitter\.com/(\w+)")


def ref_wallets(t):
    return [m.lower() for m in WALLET_CAND.findall(t) if len(m) == 42]


def ref_ens(t):
    toks = [ENS_TRAIL.sub("", m) for m in ENS_TOKEN.findall(t)]
    return [m.lower() for m in toks if ENS_FULL.match(m)]


def ref_handles(t):
    out = []
    for m in HANDLE_CAND.findall(t):
        s = m[1:][:16]
        if HANDLE_OK.match(s):
            out.append(s.lower())
    return out


def ref_urls(t):
    return [u for u in URL.findall(t) if not MEDIA.search(u.lower())]


def ref_twitter(t):
    return [m.lower() for m in TWITTER.findall(t)]


def _gen_text(rng: random.Random) -> str:
    frags = []
    hexc = "0123456789abcdefABCDEF"
    for _ in range(rng.randint(1, 14)):
        kind = rng.randint(0, 11)
        if kind == 0:
            frags.append("0x" + "".join(rng.choice(hexc) for _ in range(rng.choice([39, 40, 41, 42]))))
        elif kind == 1:
            frags.append(rng.choice([
                "alice.eth", "a.b.eth", "-x.eth", "fake.ethereum.org",
                "nope.ether", ".eth", "x" * 260 + ".eth",
                # sentence-final punctuation (trailing-strip recovery)
                "vitalik.eth.", "bob.eth:", "carol.eth-@", "dave.eth...",
            ]))
        elif kind == 2:
            frags.append("@" + "".join(rng.choice("abcZ09_") for _ in range(rng.randint(1, 20))))
        elif kind == 3:
            frags.append(rng.choice([
                "https://x.example/a", "http://y.z/p?q=1", "https://c.example/i.jpg",
                "https://d.example/v.mp4?x=1", "HTTPS://caps.example/a",
            ]))
        elif kind == 4:
            frags.append("twitter.com/" + "".join(rng.choice("abc_9") for _ in range(rng.randint(1, 8))))
        elif kind == 5:
            frags.append("".join(rng.choice("aeiou bcdfg\t.") for _ in range(rng.randint(1, 30))))
        elif kind == 6:
            frags.append(rng.choice(["0x", "0xZZ", "@", "@@@", "https://", "ether.eth.x"]))
        elif kind == 7:
            frags.append(rng.choice([
                "héllo wörld", "中文文本", "emoji🙂here",
                # unicode ADJACENT to handle/twitter tokens: Java's ASCII
                # \w would truncate these into bogus ASCII mentions the
                # unicode reference never emits
                "@josé", "@niño_x", "twitter.com/peña", "twitter.com/日本",
                "@abc٣x", "twitter.com/x٣",  # unicode DIGIT adjacency
            ]))
        elif kind == 8:  # glued entities
            frags.append("0x" + "ab" * 20 + "alice.eth@bob")
        elif kind == 9:
            frags.append("name%s.eth" % rng.randint(0, 99))
        elif kind == 10:
            frags.append("@valid_handle twitter.com/Nested0x" + "f" * 40)
        else:
            frags.append("")
    sep = rng.choice([" ", "  ", "\n", ",", " | "])
    return sep.join(frags)


def test_fuzz_extractors_match_python_reference(spark):
    rng = random.Random(42)
    texts = [_gen_text(rng) for _ in range(300)]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    got = df.select(
        "i",
        M.extract_wallets(F.col("text")).alias("w"),
        M.extract_ens_names(F.col("text")).alias("e"),
        M.extract_handles(F.col("text")).alias("h"),
        M.extract_urls(F.col("text")).alias("u"),
        M.extract_twitter_handles(F.col("text")).alias("t"),
    ).collect()
    for r in got:
        t = texts[r.i]
        assert r.w == ref_wallets(t), (r.i, t)
        assert r.e == ref_ens(t), (r.i, t)
        assert r.h == ref_handles(t), (r.i, t)
        assert r.u == ref_urls(t), (r.i, t)
        assert r.t == ref_twitter(t), (r.i, t)