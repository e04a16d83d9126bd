"""Small curated dictionaries — the broadcast side inputs.

Mirrors the reference's curated seed CSVs (/root/reference/pipelines/
analytics/wic/traders/analyze.py:98-100 reads blur.csv etc.;
ingestion/wallets/contracts.csv) and the language/stopword heuristics the
text-analysis operators need. Everything here is deterministic and tiny
(broadcast-sized by construction — FIXTURES.md F6).
"""

from __future__ import annotations

import hashlib

N_TOKEN_ENTITIES = 30

# Per-language stopword seeds for the n-gram/stopword language-ID heuristic
# and quality scoring. Deliberately small and frozen: these lists are part of
# the operator contract (the DuckDB oracle inlines the same lists).
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "for", "on", "with"),
    "es": ("el", "la", "de", "y", "que", "en", "un", "por", "con", "para"),
    "de": ("der", "die", "das", "und", "zu", "den", "von", "mit", "auf", "ist"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une", "du", "est"),
    "zh": ("的", "是", "在", "了", "和", "有", "我", "不", "这", "他"),
}
LANGS = tuple(sorted(STOPWORDS))  # deterministic tie-break order

# Filler vocabulary for synthetic page bodies — disjoint from every alias in
# the token dictionary below so dictionary matches stay analytic.
FILLER_WORDS = (
    "ledger", "block", "archive", "proof", "record", "digest", "epoch",
    "beacon", "quorum", "merkle", "vertex", "cursor", "shard", "replica",
)


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def det_int(salt: str, i: int, mod: int) -> int:
    """Deterministic pseudo-random int in [0, mod) from (salt, i)."""
    return int(_md5(f"{salt}:{i}")[:8], 16) % mod


def wallet_address(k: int) -> str:
    """Deterministic valid wallet address (0x + 40 lowercase hex)."""
    return "0x" + _md5(f"w{k}") + _md5(f"w{k}x")[:8]


def ens_name(k: int) -> str:
    return f"name{k}.eth"


def twitter_handle(k: int) -> str:
    return f"handle{k}"


def token_contract(k: int) -> str:
    return "0x" + _md5(f"tok{k}") + _md5(f"tok{k}x")[:8]


def alias_dict_rows() -> list[dict]:
    """FIXTURES.md F6 — curated entity dictionary (~broadcast-sized).

    Token entities k carry a twitter handle overlapping the handle pool
    (handle(k+50)) to drive the token↔twitter dictionary join golden
    (reference: toLower(token.twitterUsername)=twitter.handle,
    postProcessing/accounts/cyphers.py:183-201). Entities 0 and 1 share a
    colliding alias ("dualtoken") to exercise the threshold/proportion
    scorer on ambiguous aliases.
    """
    rows = []
    for k in range(N_TOKEN_ENTITIES):
        aliases = [f"token{k}", f"tok{k}sym"]
        if k in (0, 1):
            aliases.append("dualtoken")
        rows.append(
            {
                "entity_id": f"tok{k}",
                "kind": "token",
                "name": f"Token{k}",
                "aliases": aliases,
                "address": token_contract(k),
                "handle": twitter_handle(k + 50),
                "weight": 1.0 + (k % 5),
            }
        )
    for k in range(8):
        rows.append(
            {
                "entity_id": f"dao{k}",
                "kind": "dao",
                "name": f"Dao{k}",
                "aliases": [f"dao{k}", f"dao{k}gov"],
                "address": None,
                "handle": None,
                "weight": 2.0,
            }
        )
    return rows
