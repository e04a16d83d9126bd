"""Mention detection — the reference's regex-findall layer, re-expressed as
native Spark regexp functions (JVM-side, whole-stage codegen) instead of
per-row Python ``re.findall`` + pandas ``.apply``/``.explode``.

Reference extraction rules (all cited into /root/reference/):
  wallets   (0x[a-zA-Z0-9]{40})            postProcessing/twitterThreads/process.py:21,32-35
  ens       ([-a-zA-Z0-9@:%._+~#=]{1,256}\\.eth)
                                           postProcessing/twitterBiosENS/process.py:22,25-30
  handles   @\\w+  (validity ^[A-Za-z0-9_]{1,15}$)
                                           postProcessing/twitterRelations/process.py:31-47;
                                           postProcessing/twitter/process.py:27-35
  urls      (https?://\\S+)                postProcessing/twitterWebsites/process.py:17-20
  twitter   twitter.com/[\\w]+  + Counter  scraping/mirror/scrape.py:188-202
  media cut urls containing .gif/.jpg/...  scraping/mirror/helpers/arweave.py:90-96

Divergences (deliberate, encoded in the fixture goldens):
  * wallets use the stricter hex class from web3Utils.py:31 and reject
    over-length runs (a 41-hex-char blob is NOT a wallet; the reference's
    findall would match its 40-char prefix).
  * ENS matches must END at ``.eth`` (``fake.ethereum.org`` is rejected; the
    reference's findall would extract ``fake.eth``). Trailing punctuation
    from the token class (``vitalik.eth.`` at sentence end) is stripped
    before the end-anchor test, so only the embedded-domain family
    diverges — sentence-final names extract exactly as the reference's
    findall does.
  * extract_urls' media cut is case-INsensitive (drops ``BANNER.GIF``) —
    deliberately stricter than the reference's case-sensitive containment
    (arweave.py:90-96), whose verbatim behavior lives in
    extract_urls_full; the two URL surfaces differ on upper-case media
    links by design.
All regexes below are RE2-safe (no lookarounds) so the DuckDB oracle can run
the identical patterns. Candidate classes use
``[\\w\\p{L}\\p{N}\\p{M}\\p{Pc}]`` (not bare ``\\w``): Java's default
``\\w`` is ASCII-only while the reference's Python ``\\w`` is Unicode
(letters, digits, marks, connector punctuation), so an ASCII-only
candidate would TRUNCATE ``@josé`` to a bogus valid handle ``jos`` —
widening the candidate makes the validity filter see (and reject) the
same token the reference sees; the ``\\p{...}`` categories parse
identically in Java and RE2.

Known reference-inherited hazard (NOT fixed, by design): URL_FULL_RE is the
reference's verbatim mega-regex and its nested quantifier alternation
backtracks exponentially on adversarial non-matching text (e.g.
``https://`` + ~40 commas) in any backtracking engine — the reference's
Python ``re`` hangs on the same inputs. The Spark side (Java regex) shares
the behavior for byte-parity; the DuckDB oracle's RE2 translation is
immune (RE2 is linear-time). Corpus-scale callers should bound input with
``extract_urls`` (linear) unless the mega-regex's bare-domain semantics
are required.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .charclass import (
    ASCII_LOWER,
    ASCII_UPPER,
    DIGITS,
    JAVA_WS,
    positive_complement_class,
)

# Candidate-then-filter pairs (RE2-safe; see module docstring).
WALLET_CANDIDATE_RE = r"0x[a-fA-F0-9]+"
WALLET_LEN = 42  # 0x + 40 hex
ENS_TOKEN_RE = r"[-a-zA-Z0-9@:%._+~#=]+"
ENS_FULL_RE = r"^[-a-zA-Z0-9@:%._+~#=]{1,256}\.eth$"
# trailing token-class punctuation stripped before the end-anchor test
# (sentence-final 'vitalik.eth.' — see module docstring)
ENS_TRAIL_RE = r"[-@:%._+~#=]+$"
HANDLE_CANDIDATE_RE = r"@[\w\p{L}\p{N}\p{M}\p{Pc}]+"
# URL body: any char but whitespace/<>/quotes — the complement written as
# positive ranges (charclass.py: negated classes are ~20x slower on this
# JVM). DuckDB oracles keep the equivalent [^\s<>"'] spelling.
URL_BODY_CLASS = positive_complement_class(JAVA_WS + "<>\"'")
URL_RE = r"https?://" + URL_BODY_CLASS + "+"
MEDIA_URL_RE = r"\.(gif|jpg|jpeg|png|mp4|mp3)"
MEDIA_EXTS = (".gif", ".jpg", ".png", ".jpeg", ".mp4", ".mp3")
TWITTER_MENTION_RE = r"twitter\.com/([\w\p{L}\p{N}\p{M}\p{Pc}]+)"

# Reference-verbatim full URL pattern (scraping/mirror/helpers/arweave.py:87):
# scheme'd URLs (https/http/ftp), bare domains with a path (.com/.org/.uk/),
# and bare domains without one (.com/.uk/.ac, guarded against emails by
# lookarounds). Java regex (Spark) runs it as-is.
URL_FULL_RE = r"""((?:(?:https|ftp|http)?:(?:/{1,3}|[a-z0-9%])|[a-z0-9.\-]+[.](?:com|org|uk)/)(?:[^\s()<>{}\[\]]+|\([^\s()]*?\([^\s()]+\)[^\s()]*?\)|\([^\s]+?\))+(?:\([^\s()]*?\([^\s()]+\)[^\s()]*?\)|\([^\s]+?\)|[^\s`!()\[\]{};:'".,<>?«»“”‘’])|(?:(?<!@)[a-z0-9]+(?:[.\-][a-z0-9]+)*[.](?:com|uk|ac)\b/?(?!@)))"""

# RE2-safe emulation for the DuckDB oracle (RE2 has no lookarounds): the
# (?<!@) lookbehind becomes a consumed (^|[^@]) prefix outside the capture
# group — identical findall output because the backtracking engine, when the
# lookbehind fails at position p, matches the same shorter token at p+1 that
# the consumed-prefix version produces. The trailing (?!@) is dropped: a
# char following a scheme'd match can never be '@' (it would have been
# consumed), and 'domain.com@' never occurs in the corpus; equivalence is
# pinned by tests/test_mentions.py::test_url_full_re2_matches_verbatim over
# adversarial strings including emails.
URL_FULL_RE_RE2 = r"""(?:^|[^@])((?:(?:https|ftp|http)?:(?:/{1,3}|[a-z0-9%])|[a-z0-9.\-]+[.](?:com|org|uk)/)(?:[^\s()<>{}\[\]]+|\([^\s()]*?\([^\s()]+\)[^\s()]*?\)|\([^\s]+?\))+(?:\([^\s()]*?\([^\s()]+\)[^\s()]*?\)|\([^\s]+?\)|[^\s`!()\[\]{};:'".,<>?«»“”‘’])|[a-z0-9]+(?:[.\-][a-z0-9]+)*[.](?:com|uk|ac)\b/?)"""


def extract_wallets(text: Column) -> Column:
    """array<string> of lowercased wallet addresses in ``text``."""
    cands = F.regexp_extract_all(text, F.lit(f"({WALLET_CANDIDATE_RE})"), 1)
    return F.transform(
        F.filter(cands, lambda x: F.length(x) == WALLET_LEN), F.lower
    )


def extract_ens_names(text: Column) -> Column:
    """array<string> of lowercased ``*.eth`` names in ``text`` (trailing
    punctuation stripped first — module docstring, ENS divergence)."""
    toks = F.regexp_extract_all(text, F.lit(f"({ENS_TOKEN_RE})"), 1)
    trimmed = F.transform(
        toks, lambda x: F.regexp_replace(x, F.lit(ENS_TRAIL_RE), F.lit(""))
    )
    return F.transform(
        F.filter(trimmed, lambda x: x.rlike(ENS_FULL_RE)), F.lower
    )


def extract_handles(text: Column) -> Column:
    """array<string> of lowercased valid @-handles (@ stripped)."""
    cands = F.regexp_extract_all(text, F.lit(f"({HANDLE_CANDIDATE_RE})"), 1)
    stripped = F.transform(cands, lambda x: F.substring(x, 2, 15 + 1))
    # validity rule from postProcessing/twitter/process.py:28
    return F.transform(
        F.filter(stripped, lambda x: x.rlike(r"^[A-Za-z0-9_]{1,15}$")), F.lower
    )


def extract_urls(text: Column, drop_media: bool = True) -> Column:
    """array<string> of http(s) URLs; media extensions dropped per
    scraping/mirror/helpers/arweave.py:90-96."""
    urls = F.regexp_extract_all(text, F.lit(f"({URL_RE})"), 1)
    if drop_media:
        urls = F.filter(urls, lambda x: ~F.lower(x).rlike(MEDIA_URL_RE))
    return urls


def extract_urls_full(text: Column) -> Column:
    """array<string> of URLs via the reference-verbatim mega-regex
    (scraping/mirror/helpers/arweave.py:87-96): scheme'd URLs, ftp, bare
    domains. Media URLs dropped by case-sensitive substring containment,
    exactly as the reference's list comprehensions (arweave.py:90-95)."""
    urls = F.regexp_extract_all(text, F.lit(URL_FULL_RE), 1)

    def _non_media(x):
        cond = F.lit(False)
        for ext in MEDIA_EXTS:
            cond = cond | x.contains(ext)
        return ~cond

    return F.filter(urls, _non_media)


def extract_twitter_handles(text: Column) -> Column:
    """array<string> of lowercased handles from twitter.com/<handle> URLs
    (scraping/mirror/scrape.py:188-202); one element per occurrence so the
    caller can count (the reference uses collections.Counter)."""
    return F.transform(
        F.regexp_extract_all(text, F.lit(TWITTER_MENTION_RE), 1), F.lower
    )


# Social-profile URL parsers (postProcessing/tokenMetadata/process.py:111-168):
# re.match-anchored (^), \w* segments; group 2 empty → no sub-path.
REDDIT_URL_RE = r"^https://www\.reddit\.com/(\w*)/?(\w*)"
GITHUB_URL_RE = r"^https://github\.com/(\w*)/?(\w*)"
TWITTER_URL_RE = r"^https://twitter\.com/(\w*)"


def parse_social_urls(df: DataFrame, url_col: str = "link") -> DataFrame:
    """links(…, link) → rows with (platform, handle, extra) parsed per the
    reference's per-platform regexes (tokenMetadata/process.py:111-168):

      reddit  — handle = second path segment; extra = 'user' for /u/…
                (HAS_ACCOUNT in the reference), 'subreddit' for /r/…
                (HAS_HUB), NULL otherwise (process.py:112-135)
      github  — handle = account; extra = account/repository full name when
                a repository segment exists (process.py:137-153)
      twitter — handle = first path segment, falling back to the raw URL
                when the regex does not match (process.py:155-168)

    Non-social URLs are dropped. Pure native regexp_extract — RE2-safe, so
    the DuckDB oracle runs the identical patterns.
    """
    u = F.col(url_col)
    is_reddit = u.rlike(r"^https://www\.reddit\.com/")
    is_github = u.rlike(r"^https://github\.com/")
    is_twitter = u.rlike(r"^https://twitter\.com/")
    r1 = F.regexp_extract(u, REDDIT_URL_RE, 1)
    r2 = F.regexp_extract(u, REDDIT_URL_RE, 2)
    acc = F.regexp_extract(u, GITHUB_URL_RE, 1)
    rep = F.regexp_extract(u, GITHUB_URL_RE, 2)
    tw = F.regexp_extract(u, TWITTER_URL_RE, 1)
    platform = (
        F.when(is_reddit, F.lit("reddit"))
        .when(is_github, F.lit("github"))
        .when(is_twitter, F.lit("twitter"))
    )
    handle = (
        F.when(is_reddit, r2)
        .when(is_github, acc)
        .when(is_twitter, F.when(tw != "", tw).otherwise(u))
    )
    extra = F.when(
        is_reddit,
        F.when(r1 == "u", F.lit("user")).when(r1 == "r", F.lit("subreddit")),
    ).when(is_github & (rep != ""), F.concat(acc, F.lit("/"), rep))
    return (
        df.withColumn("platform", platform)
        .withColumn("handle", handle)
        .withColumn("extra", extra)
        .where(F.col("platform").isNotNull())
    )


_KIND_EXTRACTORS = {
    "wallet": extract_wallets,
    "ens": extract_ens_names,
    "handle": extract_handles,
    "url": extract_urls,
    "url_full": extract_urls_full,
    "twitter": extract_twitter_handles,
}


def tagged_mention_array(
    text: Column, kinds: tuple[str, ...] = ("wallet", "ens", "handle", "url", "twitter")
) -> Column:
    """array<struct<kind,value>> of every mention of every requested kind —
    the one-projection form all extractors share (extract_mentions and the
    fused pipeline extract stage), so the corpus is scanned once however
    many kinds are requested."""

    def _tag(kind: str):
        return lambda v: F.struct(F.lit(kind).alias("kind"), v.alias("value"))

    return F.concat(*[F.transform(_KIND_EXTRACTORS[k](text), _tag(k)) for k in kinds])


def _count_runs(srt: Column, starts: Column) -> Column:
    """array<struct<kind,value>> (SORTED) + its run-start positions →
    array<struct<kind,value,n>>: the per-array equivalent of
    GROUP BY (kind, value) COUNT(*). ``starts`` must be
    ``_run_starts(srt)``; split out so callers can materialize both as
    columns (one evaluation each) before this final transform."""
    return F.transform(
        starts,
        lambda s, j: F.struct(
            F.try_element_at(srt, s)["kind"].alias("kind"),
            F.try_element_at(srt, s)["value"].alias("value"),
            (F.coalesce(F.try_element_at(starts, j + F.lit(2)), F.size(srt) + 1) - s)
            .cast("long")
            .alias("n"),
        ),
    )


def _run_starts(srt: Column) -> Column:
    """1-based positions where a new (kind, value) run begins in the sorted
    tagged array. greatest(size, 1) keeps ANSI ``sequence`` from producing
    a DESCENDING [1, 0] on empty arrays; the i <= size guard then empties
    the result (typed correctly) for zero-mention pages."""
    return F.filter(
        F.sequence(F.lit(1), F.greatest(F.size(srt), F.lit(1))),
        lambda i: (i <= F.size(srt))
        & ((i == F.lit(1)) | (F.try_element_at(srt, i) != F.try_element_at(srt, i - 1))),
    )


def extract_mentions(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "url",
    kinds: tuple[str, ...] = ("wallet", "ens", "handle", "url", "twitter"),
    carry_cols: tuple[str, ...] = (),
    key_is_unique: bool = True,
) -> DataFrame:
    """pages → mentions(url, [carry...,] kind, value, n).

    ONE scan: all extractors run in a single projection, their results
    tagged (kind, value) and concatenated. (A union of per-kind
    projections — the naive shape — scans the corpus len(kinds)×; at
    100 TB that is 5 corpus reads and 5× the map tasks.)

    Occurrence counts fold WITHOUT A SHUFFLE when ``key_is_unique`` (the
    default — ``key_col`` is the page primary key, one input row each):
    the groupBy key (url, kind, value) is then functionally row-local, so
    a corpus-wide exchange computes something each row already knows. The
    tagged array is sorted and run-length-encoded in place (array_sort →
    run starts → counts), turning the whole mention stage into a pure map
    — the exchange this removes was the full pipeline's only
    corpus-proportional shuffle, the term that capped N→4N scaling.
    The three HOF lambdas run interpreted, but over ~tens-of-element
    arrays; A/B vs the explode→groupBy shape is recorded in PLANS.md.

    With ``key_is_unique=False`` (duplicate keys possible — e.g. a
    tweet-keyed corpus with retweets) the classic explode → groupBy path
    runs instead: same output, counts summed across rows per key.

    ``carry_cols`` must be functionally dependent on ``key_col``
    (constant per page, e.g. the page's ingest date): they thread through
    either path so callers can partition the output without joining it
    back to the corpus (a corpus-sized shuffle join at 10^12 pages).
    """
    combined = tagged_mention_array(F.col(text_col), kinds)
    if not key_is_unique:
        return (
            df.select(F.col(key_col).alias("url"), *carry_cols, F.explode(combined).alias("m"))
            .select("url", *carry_cols, F.col("m.kind").alias("kind"), F.col("m.value").alias("value"))
            .groupBy("url", *carry_cols, "kind", "value")
            .agg(F.count(F.lit(1)).alias("n"))
        )
    # staged projections: each intermediate is a materialized column, so
    # the regex extractors and the sort run ONCE per row even though the
    # downstream expressions reference them repeatedly (CollapseProject
    # keeps multiply-referenced non-cheap aliases un-inlined).
    srt = df.select(
        F.col(key_col).alias("url"), *carry_cols, F.array_sort(combined).alias("_srt")
    )
    runs = srt.select(
        "url", *carry_cols, "_srt", _run_starts(F.col("_srt")).alias("_starts")
    )
    return (
        runs.select(
            "url",
            *carry_cols,
            F.explode(_count_runs(F.col("_srt"), F.col("_starts"))).alias("m"),
        )
        .select(
            "url",
            *carry_cols,
            F.col("m.kind").alias("kind"),
            F.col("m.value").alias("value"),
            F.col("m.n").alias("n"),
        )
    )


# Dictionary-token charset (the tokenizer the boundary guards reproduce);
# its complement is written positively — charclass.py pathology.
DICT_TOKEN_CHARS = ASCII_LOWER + DIGITS + "_.@-"
DICT_BOUNDARY_CLASS = positive_complement_class(DICT_TOKEN_CHARS)


def _dict_hit_arrays(
    alias_dict: DataFrame, text: Column, alias_strings: list[str] | None = None
) -> list[Column]:
    """Per-chunk arrays of dictionary-alias matches in ``lower(text)``.
    ``alias_strings`` lets a caller that already collected the (tiny,
    driver-sized) alias list skip the per-call collect — a streaming
    foreachBatch otherwise re-runs it every micro-batch.

    Native regex alternation with token-boundary guards, CHUNKED at 256
    aliases per pattern: every pass stays a codegen'd JVM regex scan.
    Aliases are disjoint across chunks and each chunk scans the text
    independently, so concat(per-chunk matches) ≡ one giant alternation
    (and ≡ tokenize+set-membership: the boundary guards reproduce the
    tokenizer's charset exactly). An interpreted fallback for >256 aliases
    — F.filter(tokens, isin(set)) — is a higher-order function with no
    codegen (BENCH.md finding: 3-8x slower); chunking keeps the
    alternation small enough for the JVM regex compiler while never
    leaving the codegen path. The guard classes are positive complements
    of the token charset ([^a-z0-9_.@-] in the DuckDB replay) — measured
    ~18x faster per pass on this JVM (charclass.py).
    """
    import re as _re

    if alias_strings is None:
        alias_strings = [
            r[0] for r in alias_dict.select(F.explode("aliases")).distinct().collect()
        ]
    alias_set = sorted({a.lower() for a in alias_strings})
    chunk = 256
    arrays = []
    for i in range(0, len(alias_set), chunk):
        pat = (
            f"(?:^|{DICT_BOUNDARY_CLASS})("
            + "|".join(_re.escape(a) for a in alias_set[i : i + chunk])
            + f")(?=$|{DICT_BOUNDARY_CLASS})"
        )
        arrays.append(F.regexp_extract_all(F.lower(text), F.lit(pat), 1))
    return arrays


def _alias_entity_map(alias_dict: DataFrame):
    """Broadcast (alias → entity_id, entity_kind) relation, lowercased."""
    return F.broadcast(
        alias_dict.select(
            F.explode("aliases").alias("alias"),
            F.col("entity_id"),
            F.col("kind").alias("entity_kind"),
        ).withColumn("alias", F.lower(F.col("alias")))
    )


def dictionary_mentions(
    df: DataFrame,
    alias_dict: DataFrame,
    text_col: str = "text",
    key_col: str = "url",
    carry_cols: tuple[str, ...] = (),
    alias_strings: list[str] | None = None,
) -> DataFrame:
    """Trie/dictionary entity matches via tokenize + broadcast join.

    The reference does dictionary lookup as Neo4j fulltext containment
    queries, ~120 call sites (analytics/wic/interests/cyphers.py:33-43;
    index defs helpers/indexes.py:90-99). Spark-first restatement: explode
    lowercased word tokens, broadcast-join the (alias → entity) map — no
    LIKE scan, no Python. alias_dict must stay broadcast-sized (FIXTURES.md
    F6: ~2k rows).

    Returns mentions(url, kind='dict:<kind>', value=entity_id, n).
    """
    # The dictionary is broadcast-sized by contract, so its alias set is
    # also driver-sized: match aliases BEFORE the explode (_dict_hit_arrays,
    # chunked codegen'd alternations) instead of exploding every token
    # (~100/doc) into the join — that moves two orders of magnitude more
    # rows than the ~1/doc that match.
    arrays = _dict_hit_arrays(alias_dict, F.col(text_col), alias_strings=alias_strings)
    if not arrays:  # empty dictionary: no aliases → no mentions, not a crash
        hits = F.array().cast("array<string>")
    else:
        hits = F.concat(*arrays) if len(arrays) > 1 else arrays[0]
    tokens = df.select(
        F.col(key_col).alias("url"), *carry_cols, F.explode(hits).alias("alias")
    )
    return (
        tokens.join(_alias_entity_map(alias_dict), "alias")
        .groupBy(
            "url",
            *carry_cols,
            F.concat(F.lit("dict:"), F.col("entity_kind")).alias("kind"),
            F.col("entity_id").alias("value"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


# NOTE (measured, not assumed): a fully-fused variant of
# extract_mentions + dictionary_mentions — dict alternation hits tagged
# into the same combined explode, broadcast-mapped alias→entity before one
# shared (url, kind, value) groupBy — was built and A/B-benchmarked at
# sf0.1×16 (interleaved trials, same session): 15-20% SLOWER than the two
# separate operators. With the corpus page-cached, regex CPU dominates and
# the per-exploded-row join + larger codegen expression cost more than the
# saved text-column access. The separate operators are kept as the
# canonical shape; revisit only on evidence of a scan-bandwidth-bound
# profile (cold object-store reads of very wide rows).
