"""Training-data operators: dedup ladder, similarity search, text stats,
multimodal plumbing — verified against independent Python/numpy references
on small inputs (the DuckDB oracles in driver_queries cover the sf0.01
tier; these pin the semantics with zero-dependency reimplementations)."""

from __future__ import annotations

import hashlib
import itertools
import math
import re

import pytest
from pyspark.sql import functions as F

from web3_knowledge_graph_spark.datasets import dedup as D
from web3_knowledge_graph_spark.datasets import multimodal as MM
from web3_knowledge_graph_spark.datasets import similarity as S
from web3_knowledge_graph_spark.datasets import textstats as TS

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
    (2, "the quick brown fox leaps over the lazy dog"),  # near dup
    (3, "lorem ipsum dolor sit amet consectetur adipiscing elit"),
    (4, "dog lazy the over jumps fox brown quick the"),  # bag-equal to 0
    (5, ""),
    (6, "el perro y el gato en la casa de la abuela"),
    (7, "short"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def py_tokens(text):
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def py_shingles(text, k):
    toks = py_tokens(text)
    if k == 1:
        return set(toks)
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def test_exact_dedup(spark, docs):
    rows = {r.doc_id: r for r in D.exact_dedup(docs).collect()}
    assert rows[1].canonical_doc_id == 0 and rows[1].is_dup
    assert rows[0].canonical_doc_id == 0 and not rows[0].is_dup
    assert rows[2].canonical_doc_id == 2 and not rows[2].is_dup
    assert rows[0].fingerprint == hashlib.md5(DOCS[0][1].encode()).hexdigest()


def test_jaccard_pairs_vs_python(spark, docs):
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in D.jaccard_pairs(docs, k=1, threshold=0.5).collect()
    }
    expect = {}
    for (ia, ta), (ib, tb) in itertools.combinations(DOCS, 2):
        sa, sb = py_shingles(ta, 1), py_shingles(tb, 1)
        if not sa or not sb:
            continue
        j = len(sa & sb) / len(sa | sb)
        if j >= 0.5:
            expect[(ia, ib)] = j
    assert set(got) == set(expect)
    for k in got:
        assert got[k] == pytest.approx(expect[k])
    assert (0, 1) in got and got[(0, 1)] == 1.0
    assert (0, 4) in got and got[(0, 4)] == 1.0  # bag-equal


def test_minhash_identical_docs_share_signature(spark, docs):
    sig = D.minhash_signatures(docs, k=1, num_hashes=8)
    rows = sig.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, {})[r.i] = r.minhash
    assert by_doc[0] == by_doc[1] == by_doc[4]  # same shingle set
    assert by_doc[0] != by_doc[3]
    assert all(len(v) == 8 for v in by_doc.values())
    # doc 5 (empty) and 7 participate only if they have >= k tokens
    assert 5 not in by_doc


def test_lsh_recovers_exact_dups(spark, docs):
    pairs = {
        (r.doc_a, r.doc_b)
        for r in D.lsh_candidate_pairs(docs, k=1, num_hashes=8, rows_per_band=2).collect()
    }
    assert {(0, 1), (0, 4), (1, 4)} <= pairs
    assert (0, 3) not in pairs


def test_simhash_properties(spark, docs):
    rows = {r.doc_id: r.simhash for r in D.simhash(docs, bits=16).collect()}
    assert rows[0] == rows[1]  # identical docs
    assert 0 <= rows[0] < 2**16
    # near-dup differs in few bits; unrelated differs in many
    def ham(a, b):
        return bin(a ^ b).count("1")

    assert ham(rows[0], rows[2]) <= ham(rows[0], rows[3])


def test_cosine_topk_vs_numpy(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    vecs = rng.randn(30, 16).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    got = S.cosine_topk(df, df.where(F.col("vec_id") < 3), k=4).collect()
    v = vecs.astype("float64")
    sims = v @ v.T / (np.linalg.norm(v, axis=1)[:, None] * np.linalg.norm(v, axis=1)[None, :])
    for q in range(3):
        order = [
            n for n in np.argsort(-sims[q]) if n != q
        ][:4]
        mine = sorted([r for r in got if r.query_id == q], key=lambda r: r.rank)
        assert [r.neighbor_id for r in mine] == order
        for r in mine:
            assert r.cosine == pytest.approx(sims[q][r.neighbor_id], abs=1e-9)


def test_ivf_topk_mostly_agrees_with_exact(spark):
    import numpy as np

    rng = np.random.RandomState(11)
    vecs = rng.randn(60, 8).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(60)],
        "vec_id long, embedding array<float>",
    )
    q = df.where(F.col("vec_id") < 4)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.cosine_topk(df, q, k=3).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in S.ivf_topk(df, q, k=3, n_centroids=8, n_probe=4).collect()
    }
    # IVF with half the cells probed should recover a solid majority
    assert len(exact & approx) >= len(exact) * 0.5


def test_lsh_buckets_collide_for_identical_vectors(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0, 4.0]), (1, [1.0, 2.0, 3.0, 4.0]), (2, [-1.0, -2.0, -3.0, -4.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {r.vec_id: r.bucket for r in S.lsh_buckets(df, dim=4, n_bits=6).collect()}
    assert rows[0] == rows[1]
    assert rows[0] != rows[2]  # antipodal → all bits flip


def test_language_id(spark, docs):
    rows = {r.doc_id: r for r in TS.language_id(docs).collect()}
    assert rows[0].guessed_lang == "en"  # 'the' x2, 'over'... 'the' hits
    assert rows[6].guessed_lang == "es"
    assert rows[5].guessed_lang == "und" and rows[5].hits == 0
    assert rows[7].guessed_lang == "und"


def test_quality_and_token_counts(spark, docs):
    q = {r.doc_id: r for r in TS.quality_features(docs).collect()}
    t = {r.doc_id: r for r in TS.token_counts(docs).collect()}
    text0 = DOCS[0][1]
    assert q[0].n_tokens == len(py_tokens(text0))
    assert q[0].n_chars == len(text0)
    assert q[5].n_tokens == 0 and q[5].quality == pytest.approx(0.2)
    assert t[0].ws_tokens == 9
    assert t[0].bpe_tokens == 9  # no punctuation
    assert 0.0 <= q[0].quality <= 1.0
    # stopword-rich English text scores above stopword-free latin filler
    assert q[0].quality > q[3].quality


def test_fingerprints_order_insensitive(spark, docs):
    rows = {r.doc_id: r for r in TS.content_fingerprint(docs).collect()}
    assert rows[0].exact_md5 == rows[1].exact_md5
    assert rows[0].bag_md5 == rows[4].bag_md5  # shuffled words
    assert rows[0].exact_md5 != rows[4].exact_md5
    assert rows[0].bag_md5 != rows[3].bag_md5


def test_multimodal_decode_and_frames(spark):
    media = MM.synthesize_media(spark, n=24)
    feats = MM.decode_features(media).collect()
    assert len(feats) == 24
    for r in feats:
        assert r.ok and len(r.features) == MM.FEATURE_DIM
        assert all(0.0 <= x <= 1.0 for x in r.features)
    frames = MM.sample_frames(media, fps=1.0, max_frames=4).collect()
    vids = {r.media_id for r in frames}
    assert vids  # every video row sampled
    per_vid = {}
    for r in frames:
        per_vid.setdefault(r.media_id, []).append(r)
    for rows in per_vid.values():
        assert len(rows) <= 4
        assert sorted(r.frame_idx for r in rows) == list(range(len(rows)))
    rez = MM.resize_metadata(media, max_side=128).collect()
    for r in rez:
        assert max(r.target_width, r.target_height) <= 128
        if max(r.width, r.height) <= 128:
            assert (r.target_width, r.target_height) == (r.width, r.height)


def test_multimodal_unknown_modality_raises():
    with pytest.raises(NotImplementedError):
        MM._decode_payload(b"xx", "hologram")


def test_bipartite_projection(spark):
    from web3_knowledge_graph_spark.operators.projection import bipartite_project

    rel = spark.createDataFrame(
        [("p1", "a"), ("p1", "b"), ("p2", "a"), ("p2", "b"), ("p3", "a"), ("p3", "c")],
        "page string, ent string",
    )
    rows = {
        (r.top_a, r.top_b): r.shared
        for r in bipartite_project(rel, "page", "ent", threshold=1).collect()
    }
    assert rows[("a", "b")] == 2
    assert rows[("a", "c")] == 1
    assert ("b", "c") not in rows

def test_near_dedup_clusters(spark):
    """LSH→verify→CC pipeline: exact dups + transitive near-dups collapse
    to the min-id canonical; unrelated docs stay their own canonical."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (0, base),
            (1, base),                                  # exact dup of 0
            (2, base.replace("kappa", "lambda")),       # near dup of 0/1
            (3, "one two three four five six seven eight nine ten"),
            (4, "completely different words entirely here today folks"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.canonical_doc_id, r.is_dup)
        for r in __import__(
            "web3_knowledge_graph_spark.datasets.dedup", fromlist=["near_dedup"]
        ).near_dedup(docs, k=2, jaccard_threshold=0.5).collect()
    }
    assert got[0] == (0, False)
    assert got[1] == (0, True)
    assert got[2] == (0, True)   # transitive via CC
    assert got[3] == (3, False)
    assert got[4] == (4, False)

def test_embed_neardup_bucketed_subset_of_exact(spark):
    """The banded-LSH scale path emits a subset of the exact all-pairs
    result (never a false positive — candidates are exact-verified) with
    recall ≥ the single-band floor; exact path stays the baseline."""
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {
        (r.vec_a, r.vec_b)
        for r in S.cosine_neardup_pairs(e, threshold=0.35).collect()
    }
    banded = {
        (r.vec_a, r.vec_b)
        for r in S.cosine_neardup_pairs(
            e, threshold=0.35, dim=64, n_bits=3, n_bands=4
        ).collect()
    }
    assert banded <= exact
    assert len(banded) >= 0.4 * len(exact)  # OR-of-4-bands recall floor
    single = {
        (r.vec_a, r.vec_b)
        for r in S.cosine_neardup_pairs(
            e, threshold=0.35, dim=64, n_bits=4, n_bands=1
        ).collect()
    }
    assert len(banded) > len(single)  # banding is the recall lever


def test_repetition_stats_hand_traced(spark):
    """Hand-traced repetition fractions: 'a a a a b' has dup_word_frac
    1 - 2/5 = 0.6 and top bigram 'a a' 3/4 = 0.75 → dropped; an all-unique
    doc keeps. Single-token and empty docs defend the guards."""
    from web3_knowledge_graph_spark.datasets.textstats import repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "a a a a b"),
            # long enough that an all-unique doc's top bigram share (1/9)
            # clears the 0.2 threshold — short docs always "fail" a share
            # threshold, which is why Gopher applies it to long documents
            (2, "one two three four five six seven eight nine ten"),
            (3, "solo"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in repetition_stats(docs).collect()}
    assert abs(got[1].dup_word_frac - 0.6) < 1e-12
    assert abs(got[1].top_bigram_frac - 0.75) < 1e-12
    assert not got[1].keep
    assert got[2].dup_word_frac == 0.0 and got[2].keep
    assert got[3].n_tokens == 1 and got[3].top_bigram_frac == 0.0 and got[3].keep
    assert got[4].n_tokens == 0 and got[4].keep


def test_boilerplate_ngrams_hand_traced(spark):
    """A 5-gram shared verbatim by two docs is flagged with its doc count;
    within-doc repetition does NOT inflate the count (distinct per doc)."""
    from web3_knowledge_graph_spark.datasets.textstats import boilerplate_ngrams

    tpl = "all rights reserved contact us"
    docs = spark.createDataFrame(
        [
            (1, f"page one body {tpl}"),
            (2, f"other page {tpl} and {tpl} again"),
            (3, "unrelated content entirely here today"),
        ],
        "doc_id long, text string",
    )
    got = {r.shingle: r.n_docs for r in boilerplate_ngrams(docs, k=5, min_docs=2).collect()}
    assert got[tpl] == 2  # doc 2's double occurrence counts once


def test_pii_scan_and_redact_hand_traced(spark):
    """Crafted PII strings: counts per kind, flag, and redaction order
    (placeholders contain no digits so later passes cannot re-match)."""
    from web3_knowledge_graph_spark.datasets import curation as CU

    docs = spark.createDataFrame(
        [
            (1, "mail me at bob.smith+x@sub.example.co.uk or call +44 20 7946 0958"),
            (2, "servers 10.0.3.17 and 192.168.1.1 are internal"),
            (3, "no pii here at all"),
            (4, "two mails a@b.io c@d.org one ip 8.8.8.8"),
        ],
        "doc_id long, text string",
    )
    scan = {r.doc_id: r for r in CU.pii_scan(docs).collect()}
    assert (scan[1].n_emails, scan[1].n_phones, scan[1].n_ipv4) == (1, 1, 0)
    assert (scan[2].n_emails, scan[2].n_phones, scan[2].n_ipv4) == (0, 0, 2)
    assert not scan[3].has_pii and scan[3].n_emails == 0
    assert (scan[4].n_emails, scan[4].n_ipv4) == (2, 1)

    red = {r.doc_id: r.clean_text for r in CU.pii_redact(docs).collect()}
    assert red[1] == "mail me at <EMAIL> or call <PHONE>"
    assert red[2] == "servers <IP> and <IP> are internal"
    assert red[3] == "no pii here at all"
    assert red[4] == "two mails <EMAIL> <EMAIL> one ip <IP>"


def test_c4_line_filter_hand_traced(spark):
    """Line rules (terminal punct, >=5 words, no 'javascript') and the
    doc-level lorem-ipsum / brace / zero-kept-lines drops."""
    from web3_knowledge_graph_spark.datasets import curation as CU

    good = "This line is long enough and ends properly."
    docs = spark.createDataFrame(
        [
            (1, good + "\nshort one.\nno terminal punctuation on this line here\n"
                "Please enable javascript to continue with this page."),
            (2, "Lorem Ipsum dolor sit amet and more words here."),
            (3, "var x = { a: 1 };\n" + good),
            (4, "every line here lacks punctuation\nand so does this one"),
            (5, good + "\n" + good),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in CU.c4_line_filter(docs).collect()}
    assert got[1].n_lines == 4 and got[1].n_kept == 1 and got[1].keep_doc
    assert got[1].kept_text == good
    assert not got[2].keep_doc  # lorem ipsum (case-insensitive)
    assert not got[3].keep_doc  # curly brace
    assert not got[4].keep_doc and got[4].n_kept == 0
    assert got[5].n_kept == 2 and got[5].kept_text == good + "\n" + good


def test_host_downsample_cap_and_determinism(spark):
    """Per-host cap respected; picks are the md5-order prefix and stable
    across reruns."""
    from web3_knowledge_graph_spark.datasets import curation as CU

    rows = [(i, f"host{i % 3}") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    got = CU.host_downsample(docs, cap=4).collect()
    by_host = {}
    for r in got:
        by_host.setdefault(r.source, []).append(r)
    assert set(by_host) == {"host0", "host1", "host2"}
    for host, picks in by_host.items():
        assert len(picks) == 4
        ids = {i for i, s in rows if s == host}
        expected = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))[:4]
        assert sorted(r.doc_id for r in picks) == sorted(expected)
    again = CU.host_downsample(docs, cap=4).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_token_budget_two_pass_equals_single_scan(spark):
    """The 256-bucket two-pass prefix sum equals the sequential spec:
    walk docs in md5 order, keep while the running total fits."""
    from web3_knowledge_graph_spark.datasets import curation as CU

    rows = [(i, " ".join(["w"] * (5 + i % 17))) for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    budget = 1200
    got = {r.doc_id: (r.n_tokens, r.cum_tokens)
           for r in CU.token_budget_sample(docs, budget=budget).collect()}

    order = sorted(rows, key=lambda r: hashlib.md5(str(r[0]).encode()).hexdigest())
    cum, expected = 0, {}
    for i, text in order:
        n = len(text.split())
        cum += n
        if cum > budget:
            break
        expected[i] = (n, cum)
    assert got == expected


def test_line_dedup_hand_traced(spark):
    """Lines shared by >= min_docs docs are struck everywhere; docs are
    reassembled in original line order; unique lines survive."""
    from web3_knowledge_graph_spark.datasets import curation as CU

    rows = [
        (0, "alpha\ncookie banner\nbravo"),
        (1, "cookie banner\ncharlie"),
        (2, "delta\ncookie banner"),
        (3, "echo\nfoxtrot"),
        (4, "echo\ngolf"),  # "echo" appears in only 2 docs -> kept at min_docs=3
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in CU.line_dedup(docs, min_docs=3).collect()}
    assert len(got) == 5
    assert (got[0].n_lines, got[0].n_dropped, got[0].clean_text) == (3, 1, "alpha\nbravo")
    assert (got[1].n_lines, got[1].n_dropped, got[1].clean_text) == (2, 1, "charlie")
    assert (got[2].n_lines, got[2].n_dropped, got[2].clean_text) == (2, 1, "delta")
    assert (got[3].n_lines, got[3].n_dropped, got[3].clean_text) == (2, 0, "echo\nfoxtrot")
    assert (got[4].n_lines, got[4].n_dropped, got[4].clean_text) == (2, 0, "echo\ngolf")
    # min_docs=2 strikes "echo" too, and a fully-boilerplate doc ends empty
    got2 = {r.doc_id: r for r in CU.line_dedup(docs, min_docs=2).collect()}
    assert got2[4].clean_text == "golf"
    only = spark.createDataFrame([(0, "x"), (1, "x")], "doc_id long, text string")
    got3 = {r.doc_id: r for r in CU.line_dedup(only, min_docs=2).collect()}
    assert got3[0].clean_text == "" and got3[0].n_dropped == 1


def test_decontaminate_hand_traced(spark):
    """A doc sharing any word k-gram with the benchmark is flagged; n_hits
    counts its distinct overlapping shingles."""
    from web3_knowledge_graph_spark.datasets import curation as CU

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps"),     # shares "the quick brown", "quick brown fox"
            (1, "completely different words here"),
            (2, "quick brown fox runs far"),      # shares "quick brown fox"
            (3, "aa bb"),                          # too short for a 3-gram
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox sleeps")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in CU.decontaminate(docs, bench, k=3).collect()}
    assert len(got) == 4
    assert (got[0].n_hits, got[0].contaminated) == (2, True)
    assert (got[1].n_hits, got[1].contaminated) == (0, False)
    assert (got[2].n_hits, got[2].contaminated) == (1, True)
    assert (got[3].n_hits, got[3].contaminated) == (0, False)


def test_curate_corpus_stage_composition(spark):
    """The composed pipeline's audit equals applying the five stages
    sequentially by hand on a small corpus that exercises every stage."""
    from web3_knowledge_graph_spark.datasets import curation as CU

    rows = [
        # doc 0/1: exact dup pair after c4 (identical multi-line text)
        (0, "This pair is a duplicated page of boilerplate text.\nA second sentence keeps the page alive today."),
        (1, "This pair is a duplicated page of boilerplate text.\nA second sentence keeps the page alive today."),
        # 2/3/4: share a boilerplate line (struck by line dedup at min_docs=3)
        (2, "Subscribe to our newsletter for updates every day.\nDocument two has its own unique closing sentence."),
        (3, "Subscribe to our newsletter for updates every day.\nDocument three has its own unique closing sentence."),
        (4, "Subscribe to our newsletter for updates every day.\nDocument four has its own unique closing sentence."),
        # 5: contaminated (shares a 5-gram with the benchmark)
        (5, "The held out benchmark sentence appears verbatim right here."),
        # 6: dropped by c4 (no line with >= 5 words ending in punctuation)
        (6, "short\nno punct line"),
        # 7: survives everything
        (7, "A perfectly ordinary document sails through every filter stage."),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame(
        [(100, "the held out benchmark sentence appears verbatim in the suite")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in CU.curate_corpus(
        docs, bench, min_docs=3, k=5, budget=10_000).collect()}
    assert len(got) == 8
    assert not got[6].c4_keep and not got[6].selected
    assert got[0].is_canonical and not got[1].is_canonical and not got[1].selected
    for i in (2, 3, 4):
        assert got[i].n_dropped_lines == 1  # the shared subscribe line
    assert got[5].contaminated and not got[5].selected
    assert got[7].c4_keep and got[7].is_canonical and not got[7].contaminated
    assert got[7].selected and got[7].n_tokens == 9
    # budget selection covers all survivors at this budget
    survivors = [i for i in range(8) if got[i].selected]
    assert sorted(survivors) == [0, 2, 3, 4, 7]


def test_lm_surprisal_hand_traced(spark):
    """Reference-corpus bigrams are cheap, out-of-model bigrams expensive;
    scores replayed exactly in integer micro-units."""
    from web3_knowledge_graph_spark.datasets import textstats as T

    ref = spark.createDataFrame(
        [(100, "the cat sat on the mat"), (101, "the cat sat down")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (0, "the cat sat"),          # both bigrams in the model
            (1, "zebra quantum flux"),   # fully out-of-model
            (2, "x"),                    # no bigram
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in T.lm_surprisal(
        docs, ref, min_count=1, threshold_micro=5_000_000).collect()}
    # threshold mean-inverse-prob 5.0: doc0 scores 2.2, doc1 (out-of-model,
    # every bigram IP = V*1e6 = 6e6) scores 6.0 — separated.
    # replay: unigram counts over ref tokens:
    # the(3) cat(2) sat(2) on(1) mat(1) down(1) => V=6
    uni = {"the": 3, "cat": 2, "sat": 2, "on": 1, "mat": 1, "down": 1}
    bi = {("the","cat"): 2, ("cat","sat"): 2, ("sat","on"): 1, ("on","the"): 1,
          ("the","mat"): 1, ("sat","down"): 1}
    V = len(uni)
    def ip(w1, w2):
        return (1_000_000 * (2 * uni.get(w1, 0) + V)) // (2 * bi.get((w1, w2), 0) + 1)
    assert got[0].surprisal_micro == ip("the", "cat") + ip("cat", "sat")
    assert got[1].surprisal_micro == ip("zebra", "quantum") + ip("quantum", "flux")
    assert got[0].surprisal_micro < got[1].surprisal_micro
    assert got[0].keep and not got[1].keep
    assert got[2].n_bigrams == 0 and not got[2].keep and got[2].mean_inverse_prob == 0.0


def test_distinctive_terms_hand_traced(spark):
    """tf and rarity both raise the score; ties break on term asc; exactly
    k rows per doc with enough vocabulary."""
    from web3_knowledge_graph_spark.datasets import textstats as T

    docs = spark.createDataFrame(
        [
            (0, "common common rare0"),
            (1, "common rare1 rare1 rare1"),
            (2, "common rare2"),
        ],
        "doc_id long, text string",
    )
    got = T.distinctive_terms(docs, k=2).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append((r.rnk, r.term, r.tf, r.df, r.score_micro))
    n = 3
    def score(tf, df):
        return tf * ((1_000_000 * n) // df)
    # doc 0: common tf=2 df=3 -> 2*1e6; rare0 tf=1 df=1 -> 3e6 => rare0 first
    assert sorted(by_doc[0]) == [
        (1, "rare0", 1, 1, score(1, 1)), (2, "common", 2, 3, score(2, 3))]
    # doc 1: rare1 tf=3 df=1 -> 9e6 first; common 1e6 second
    assert by_doc[1][0][1] == "rare1" if by_doc[1][0][0] == 1 else True
    assert sorted(by_doc[1])[0] == (1, "rare1", 3, 1, score(3, 1))
    # doc 2: rare2 3e6 beats common 1e6
    assert sorted(by_doc[2]) == [
        (1, "rare2", 1, 1, score(1, 1)), (2, "common", 1, 3, score(1, 3))]


def test_semantic_dedup_hand_traced(spark):
    """Within-cell lower-id representative keeps; near-identical vectors in
    the same cell collapse; distinct directions survive."""
    from web3_knowledge_graph_spark.datasets import similarity as SIM

    # The codebook is the first n_centroids ids, so the three distinct
    # directions come first (each its own cell) and the near-dups after
    # (assigned to the matching cell, collapsed onto the centroid id).
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0]),
        (2, [0.0, 0.0, 1.0]),
        (3, [0.999, 0.01, 0.0]),   # ~same direction as 0 -> dup_of 0
        (4, [0.01, 0.999, 0.0]),   # ~same as 1 -> dup_of 1
    ]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r.vec_id: r for r in SIM.semantic_dedup(
        vecs, threshold=0.95, n_centroids=3).collect()}
    assert len(got) == 5
    assert got[0].keep and got[1].keep and got[2].keep
    assert not got[3].keep and got[3].dup_of == 0
    assert not got[4].keep and got[4].dup_of == 1
    assert got[0].dup_of == -1


def test_tfidf_similar_pairs_vs_python(spark, docs):
    """Inverted-index tf-idf cosine equals the brute-force Python replay
    (integer weights w = tf * (100000 // df), df-pruned vocabulary)."""
    max_df, threshold = 5, 0.3
    texts = {i: t for i, t in DOCS}
    tf = {i: {} for i in texts}
    for i, t in texts.items():
        for tok in py_tokens(t):
            tf[i][tok] = tf[i].get(tok, 0) + 1
    df = {}
    for i in texts:
        for tok in tf[i]:
            df[tok] = df.get(tok, 0) + 1
    w = {
        i: {
            tok: c * (100000 // df[tok])
            for tok, c in tf[i].items()
            if df[tok] <= max_df
        }
        for i in texts
    }
    expect = {}
    for a, b in itertools.combinations(sorted(texts), 2):
        dot = sum(w[a][t] * w[b][t] for t in w[a] if t in w[b])
        ssa, ssb = sum(x * x for x in w[a].values()), sum(x * x for x in w[b].values())
        if dot and ssa and ssb:
            cos = dot / math.sqrt(float(ssa) * float(ssb))
            if cos >= threshold:
                expect[(a, b)] = (dot, cos)
    got = {
        (r.doc_a, r.doc_b): (r.dot, r.cosine)
        for r in TS.tfidf_similar_pairs(
            docs, threshold=threshold, max_df=max_df
        ).collect()
    }
    assert got.keys() == expect.keys() and len(got) > 0
    for k in got:
        assert got[k][0] == expect[k][0]
        assert got[k][1] == pytest.approx(expect[k][1], abs=0)


def test_tfidf_max_df_prunes_hot_terms(spark, docs):
    """A df cap of 1 keeps only unique-to-one-doc terms -> no pair can
    share a term -> empty output (the posting-list quadratic is bounded)."""
    assert TS.tfidf_similar_pairs(docs, threshold=0.0, max_df=1).count() == 0


def _py_kmeans(rows, k, iters):
    """Reference Lloyd's with the same floor-micro integer arithmetic."""
    vm = {i: [math.floor(x * 1_000_000) for x in v] for i, v in rows}
    cents = {i: list(vm[i]) for i in sorted(vm)[:k]}

    def assign():
        out = {}
        for i, v in vm.items():
            best = min(
                (sum((a - b) ** 2 for a, b in zip(v, c)), cid)
                for cid, c in cents.items()
            )
            out[i] = (best[1], best[0])
        return out

    for _ in range(iters):
        a = assign()
        member = {}
        for i, (cid, _) in a.items():
            member.setdefault(cid, []).append(vm[i])
        cents = {
            cid: [
                math.floor(sum(col) * 1.0 / len(vs))
                for col in zip(*vs)
            ]
            for cid, vs in member.items()
        }
    return assign()


def test_kmeans_vs_python(spark):
    from web3_knowledge_graph_spark.datasets import clustering as CL

    rows = [
        (0, [0.0, 0.1]), (1, [10.0, 10.2]), (2, [0.2, -0.1]),
        (3, [9.8, 10.0]), (4, [0.05, 0.0]), (5, [10.1, 9.9]),
        (6, [-5.0, -5.1]), (7, [-4.9, -5.3]),
    ]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r.vec_id: (r.cluster, r.dist) for r in CL.kmeans_assign(
        vecs, k=3, iters=2).collect()}
    expect = _py_kmeans(rows, k=3, iters=2)
    assert got == expect
    # the three planted blobs separate
    clusters = {got[i][0] for i in (0, 2, 4)}
    assert len(clusters) == 1
    assert len({got[1][0], got[3][0], got[5][0]}) == 1
    assert len({got[0][0], got[1][0], got[6][0]}) == 3


def test_kmeans_empty_cluster_drops(spark):
    """A centroid that attracts no members disappears; remaining clusters
    still partition every vector (standard Lloyd's, mirrored by the
    oracle)."""
    from web3_knowledge_graph_spark.datasets import clustering as CL

    # ids 0,1 initialize two centroids at nearly the same point: one loses
    # all members after the first assignment
    rows = [(0, [0.0, 0.0]), (1, [0.0, 0.001]), (2, [0.1, 0.0]), (3, [5.0, 5.0])]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r.vec_id: r.cluster for r in CL.kmeans_assign(
        vecs, k=2, iters=2).collect()}
    expect = {i: c for i, (c, _) in _py_kmeans(rows, k=2, iters=2).items()}
    assert got == expect and len(got) == 4


def test_mixture_sample_vs_python(spark):
    """Bucketed prefix ranking equals the single-window spec: per-group
    targets hit exactly when available, under-filled groups keep all."""
    import hashlib

    from web3_knowledge_graph_spark.datasets import curation as CU

    rows = [(i, "en" if i % 3 else "de") for i in range(60)]  # 40 en, 20 de
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    weights, budget = {"en": 0.5, "de": 0.5}, 50  # de target 25 > 20 avail
    got = {r.doc_id: (r.grp, r.grp_rank) for r in CU.mixture_sample(
        docs, weights, budget).collect()}
    by_grp = {}
    for i, g in rows:
        by_grp.setdefault(g, []).append(i)
    expect = {}
    for g, ids in by_grp.items():
        target = int(weights[g] * budget)
        ranked = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        for rank, i in enumerate(ranked[:target], start=1):
            expect[i] = (g, rank)
    assert got == expect
    n_by_grp = {}
    for g, _ in got.values():
        n_by_grp[g] = n_by_grp.get(g, 0) + 1
    assert n_by_grp == {"en": 25, "de": 20}  # en hits target, de under-fills


def test_mixture_targets_exact_decimal():
    """Targets are exact-decimal floors: 0.58 × 50 must be 29, not
    int(28.999999999999996) — the IEEE truncation bug class."""
    from web3_knowledge_graph_spark.datasets.curation import mixture_targets

    assert mixture_targets({"en": 0.58}, 50) == {"en": 29}
    assert mixture_targets({"a": 0.29}, 100) == {"a": 29}
    assert mixture_targets({"a": 0.15, "b": 0.4}, 200) == {"a": 30, "b": 80}
    # genuinely fractional targets still floor
    assert mixture_targets({"a": 0.33}, 10) == {"a": 3}


def test_kmeans_oracle_dim_matches_fixtures():
    """The unrolled kmeans oracle hardcodes generate_series(1, 64): if the
    fixture embedding dimension ever changes, fail HERE with a clear
    message instead of as a confusing selfcheck value mismatch."""
    import pyarrow.parquet as pq

    for sf in ("sf0.001", "sf0.01"):
        t = pq.read_table(f"/root/testdata/{sf}/embeddings.parquet",
                          columns=["embedding"])
        dim = len(t.column("embedding")[0])
        assert dim == 64, (
            f"{sf} embeddings are {dim}-dim; update _kmeans_oracle(dim=...)"
        )


def test_sequence_pack_vs_python(spark):
    """Concat-and-chunk packing equals the sequential replay: contiguous
    md5-order starts, pack/offset from integer division, empty docs out."""
    import hashlib

    from web3_knowledge_graph_spark.datasets import curation as CU

    rows = [(i, " ".join(["tok"] * (3 + i % 7)) if i % 5 else "") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_tokens, r.pack_id, r.offset)
           for r in CU.sequence_pack(docs, seq_len=16).collect()}
    order = sorted(
        [(i, t) for i, t in rows if t],
        key=lambda it: (hashlib.md5(str(it[0]).encode()).hexdigest(), it[0]),
    )
    expect, start = {}, 0
    for i, t in order:
        n = len(t.split())
        expect[i] = (n, start // 16, start % 16)
        start += n
    assert got == expect and len(got) == 32


def test_length_quantiles_vs_python(spark):
    """Histogram quantiles equal the sorted-list inverted-CDF spec,
    including the IEEE trap q=0.1 over N=500 (ceil must be 50, not 51)."""
    import math
    from fractions import Fraction

    rows = [(i, " ".join(["w"] * (1 + (i * 7) % 23))) for i in range(500)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    qs = (0.1, 0.5, 0.9)
    got = {r.q: r.n_tokens for r in TS.length_quantiles(docs, qs=qs).collect()}
    lens = sorted(len(t.split()) for _, t in rows)
    expect = {}
    for q in qs:
        fq = Fraction(str(q)) * len(lens)
        rank = max(1, math.ceil(fq))
        expect[q] = lens[rank - 1]
    assert got == expect
    # the trap explicitly: ceil(Fraction('0.1')*500) == 50
    assert math.ceil(Fraction("0.1") * 500) == 50


def test_hash_split_vs_python(spark):
    """Split ranges equal the exact-decimal spec; membership depends only
    on the doc's own id (stable under corpus growth)."""
    import hashlib
    from fractions import Fraction

    from web3_knowledge_graph_spark.datasets import curation as CU

    fr = {"train": 0.9, "val": 0.05, "test": 0.05}
    docs = spark.createDataFrame([(i,) for i in range(1000)], "doc_id long")
    got = {r.doc_id: r.split for r in CU.hash_split(docs, fr).collect()}
    names = sorted(fr)
    space = 1 << 32
    cuts, acc = [], Fraction(0)
    for n in names[:-1]:
        acc += Fraction(str(fr[n])) * space
        cuts.append(int(acc))
    expect = {}
    for i in range(1000):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        expect[i] = next(
            (n for n, c in zip(names[:-1], cuts) if h < c), names[-1]
        )
    assert got == expect
    # roughly proportional and stable under growth: first 500 unchanged
    got_half = {r.doc_id: r.split for r in CU.hash_split(
        spark.createDataFrame([(i,) for i in range(500)], "doc_id long"), fr
    ).collect()}
    assert got_half == {i: expect[i] for i in range(500)}
    from collections import Counter
    c = Counter(got.values())
    assert c["train"] > 850 and 20 < c["val"] < 80 and 20 < c["test"] < 80


def test_length_quantiles_and_pack_null_text(spark):
    """NULL text must not crash the driver-side CDF walk (dropped from
    the distribution) nor sequence packing (no tokens -> no pack slot)."""
    from web3_knowledge_graph_spark.datasets import curation as CU

    rows = [(0, "a b c"), (1, None), (2, "d e")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.q: r.n_tokens for r in TS.length_quantiles(docs, qs=(0.5,)).collect()}
    assert got == {0.5: 2}  # NULL row excluded: lens [2, 3], ceil(0.5*2)=1 -> 2
    packed = {r.doc_id for r in CU.sequence_pack(docs, seq_len=4).collect()}
    assert packed == {0, 2}


def test_dup_spans_vs_python(spark):
    """Window-hash duplication profile equals a sequential replay: shared
    8-token spans across docs AND a span repeated inside one doc both
    count; short docs get (0, 0, 0.0)."""
    import hashlib
    import re

    from web3_knowledge_graph_spark.datasets.dedup import dup_spans

    shared = "the quick brown fox jumps over the lazy dog tonight"
    docs = [
        (1, shared + " alpha beta gamma delta"),
        (2, shared + " epsilon zeta eta theta"),           # shares spans with 1
        (3, "one two three four five six seven eight " * 2),  # self-repeat
        (4, "totally unique words without any repetition here present now"),
        (5, "short doc"),                                   # < 8 tokens → 0 windows
    ]
    k = 8

    def toks(t):
        return [x for x in re.split(r"[^a-z0-9]+", t.lower()) if x]

    wins = {}  # (doc, pos) -> hash
    for d, t in docs:
        tt = toks(t)
        for i in range(max(0, len(tt) - k + 1)):
            h = hashlib.md5(" ".join(tt[i : i + k]).encode()).hexdigest()[:15]
            wins[(d, i)] = int(h, 16)
    from collections import Counter
    occ = Counter(wins.values())
    expect = {}
    for d, t in docs:
        ws = [h for (dd, _), h in wins.items() if dd == d]
        nd = sum(1 for h in ws if occ[h] >= 2)
        expect[d] = (len(ws), nd, (nd / len(ws)) if ws else 0.0)

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_windows, r.n_dup_windows, r.dup_frac)
        for r in dup_spans(df, k=k).collect()
    }
    assert got == expect
    assert got[5] == (0, 0, 0.0)
    assert got[1][1] > 0 and got[2][1] > 0   # cross-doc shared spans detected
    assert got[3][1] > 0                     # within-doc repetition detected
    assert got[4][1] == 0                    # unique doc clean


def test_cms_heavy_hitters_vs_python(spark):
    """Sketch counters, estimates, and hitters equal a sequential CMS
    replay; estimates never under-count (the one-sided CMS guarantee)."""
    import hashlib
    from collections import Counter

    from web3_knowledge_graph_spark.datasets.sketches import (
        cms_build, cms_estimate, heavy_hitters,
    )

    d, w = 2, 8  # tiny: force collisions
    keys = [1] * 20 + [2] * 15 + [3] * 3 + [4] * 2 + [5] * 1
    df = spark.createDataFrame([(k,) for k in keys], "user_id long")

    def h(i, k):
        return int(hashlib.md5(f"{i}:{k}".encode()).hexdigest()[:15], 16) % w

    sk = Counter()
    for k in keys:
        for i in range(d):
            sk[(i, h(i, k))] += 1
    got_sketch = {
        (r.i, r.bucket): r.c
        for r in cms_build(df, "user_id", d=d, w=w).collect()
    }
    assert got_sketch == dict(sk)

    exact = Counter(keys)
    probes = spark.createDataFrame([(k,) for k in set(keys)], "user_id long")
    got_est = {
        r.user_id: r.est
        for r in cms_estimate(
            cms_build(df, "user_id", d=d, w=w), probes, "user_id", d=d, w=w
        ).collect()
    }
    for k in set(keys):
        want = min(sk[(i, h(i, k))] for i in range(d))
        assert got_est[k] == want
        assert got_est[k] >= exact[k]  # never under-counts

    hh = {
        r.user_id: (r.est, r.exact, r.is_true_hitter)
        for r in heavy_hitters(df, "user_id", threshold=15, d=d, w=w).collect()
    }
    assert set(hh) == {k for k in set(keys) if got_est[k] >= 15}
    assert all(est >= 15 and (flag == (ex >= 15)) for est, ex, flag in hh.values())
    assert hh[1][2] and hh[2][2]  # the two true hitters survive with flag


def test_overlapping_chunks_vs_python(spark):
    """Chunk boundaries, tail handling, short docs, and empty docs equal
    a sequential replay; consecutive chunks overlap by size - stride."""
    import re

    import pytest as _pytest

    from web3_knowledge_graph_spark.datasets.curation import overlapping_chunks

    docs = [
        (1, " ".join(f"w{i}" for i in range(25))),  # 25 toks: chunks at 0,8,16
        (2, "a b c"),                                # short: one chunk
        (3, ""),                                     # empty: one empty chunk
    ]
    size, stride = 10, 8

    def toks(t):
        return [x for x in re.split(r"[^a-z0-9]+", t.lower()) if x]

    expect = set()
    for d, t in docs:
        tt = toks(t)
        n_win = 1 + max(0, -(-max(0, len(tt) - size) // stride))
        for c in range(n_win):
            w = tt[c * stride : c * stride + size]
            expect.add((d, c, len(w), " ".join(w)))

    got = {
        (r.doc_id, r.chunk_id, r.n_tokens, r.chunk_text)
        for r in overlapping_chunks(
            spark.createDataFrame(docs, "doc_id long, text string"),
            size=size, stride=stride,
        ).collect()
    }
    assert got == expect
    assert (3, 0, 0, "") in got            # empty doc → one empty chunk
    # doc 1 chunk 1 starts at token 8 (overlap of size-stride=2 tokens)
    assert (1, 1, 10, " ".join(f"w{i}" for i in range(8, 18))) in got
    with _pytest.raises(ValueError):
        overlapping_chunks(
            spark.createDataFrame(docs, "doc_id long, text string"),
            size=4, stride=5,
        )


def test_bm25_vs_python(spark):
    """Linear-idf BM25 equals the sequential replay bit-for-bit (same IEEE
    op order); docs without any query term are absent."""
    import re

    from web3_knowledge_graph_spark.datasets.textstats import bm25_scores

    docs = [
        (1, "alpha beta alpha gamma"),
        (2, "beta beta beta delta epsilon zeta"),
        (3, "nothing relevant here at all"),
        (4, "alpha"),
    ]
    terms, k1, b = ["alpha", "beta"], 1.2, 0.75

    def toks(t):
        return [x for x in re.split(r"[^a-z0-9]+", t.lower()) if x]

    tt = {d: toks(t) for d, t in docs}
    n = len(docs)
    sumdl = sum(len(v) for v in tt.values())
    df = {q: sum(1 for v in tt.values() if q in v) for q in terms}
    expect = {}
    for d, v in tt.items():
        score = 0.0
        for q in sorted(terms):
            tf = float(v.count(q))
            idf = (n - df[q] + 0.5) / (df[q] + 0.5)
            score = score + idf * (
                (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * (len(v) / (sumdl / n))))
            )
        if any(q in v for q in terms):
            expect[d] = score

    got = {
        r.doc_id: r.score
        for r in bm25_scores(
            spark.createDataFrame(docs, "doc_id long, text string"), terms
        ).collect()
    }
    assert got == expect  # exact float equality — same op order by design
    assert 3 not in got
    # length normalization: the 1-token alpha doc outranks the 6-token doc
    # whose 3 betas saturate under k1
    assert got[4] > got[2]


def test_dsir_weights_hand_traced(spark):
    """Per-bucket add-1 count ratios in exact micro-units, summed over a
    doc's bigram occurrences; bigram->bucket via the md5-derived hash60."""
    from web3_knowledge_graph_spark.datasets import curation as CU

    # guard the hand trace: the four distinct bigrams must land in four
    # distinct buckets at B=1024 (computed with the same md5 formula)
    buckets = {
        bg: int(hashlib.md5(bg.encode()).hexdigest()[:15], 16) % 1024
        for bg in ("a b", "b a", "c d", "b c")
    }
    assert len(set(buckets.values())) == 4

    docs = spark.createDataFrame(
        [(0, "a b a b"), (1, "c d"), (2, "a b c d"), (3, "z")],
        "doc_id long, text string",
    )
    target = docs.where(F.col("doc_id") == 0)
    got = {
        r.doc_id: r
        for r in CU.dsir_weights(
            docs, target, n_buckets=1024, threshold_micro=800_000
        ).collect()
    }
    # raw counts: "a b":3, "b a":1, "c d":2, "b c":1; target: "a b":2, "b a":1
    # lr_micro: a b = 3e6//4 = 750000; b a = 2e6//2 = 1000000;
    #           c d = 1e6//3 = 333333; b c = 1e6//2 = 500000
    assert (got[0].n_bigrams, got[0].weight_micro) == (3, 2_500_000)
    assert (got[1].n_bigrams, got[1].weight_micro) == (1, 333_333)
    assert (got[2].n_bigrams, got[2].weight_micro) == (3, 1_583_333)
    assert (got[3].n_bigrams, got[3].weight_micro) == (0, 0)
    assert got[0].keep and not got[1].keep and not got[2].keep and not got[3].keep
    assert got[0].mean_weight == 2_500_000 / 3_000_000.0


def test_gopher_rules_hand_traced(spark):
    """Every Gopher §A1.1 rule at its boundary: integer-exact flags can't
    be flipped by float rounding, so the boundary cases are decidable."""
    base_words = ("the quick brown fox runs with grace and even that rhythm "
                  "of pace they have shown ") * 4  # 64 words, all alpha
    rows = [
        (0, base_words),                                # passes everything
        (1, "tiny doc here"),                           # < 50 words
        # 10 lines, 9 bullets -> 90 <= 90 keeps; doc 3: 10/10 fails
        (2, "plain line\n" + "\n".join(["- item"] * 9)),
        (3, "\n".join(["* item"] * 10)),
        # 10 lines, 3 ellipsis ends -> 30 <= 30 keeps; doc 5: 4 fails
        (4, "\n".join(["wait..."] * 3 + ["solid line"] * 7)),
        (5, "\n".join(["wait…"] * 4 + ["solid line"] * 6)),
        # 10 words, 1 symbol -> 10*1 <= 10 keeps; doc 7: 2 symbols fail
        (6, "alpha beta gamma delta epsilon zeta eta theta iota kappa#"),
        (7, "alpha beta gamma delta epsilon zeta eta theta iota # kappa..."),
        # 5 words, 4 alphabetic -> 80% keeps; doc 9: 3/5 fails
        (8, "12 ab cd ef gh"),
        (9, "12 34 ab cd ef"),
        # mean word length: 3 exactly keeps, 2 fails
        (10, "abc def ghi"),
        (11, "ab cd ef"),
        (12, None),                                     # NULL text -> ''
    ]
    got = {
        r.doc_id: r
        for r in TS.gopher_rules(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert got[0].keep and got[0].n_words == 64 and got[0].n_stop_types >= 2
    assert not got[1].ok_word_count and not got[1].keep
    assert got[2].ok_bullet and got[2].n_bullet_lines == 9 and got[2].n_lines == 10
    assert not got[3].ok_bullet and got[3].bullet_line_ratio == 1.0
    assert got[4].ok_ellipsis and got[4].n_ellipsis_lines == 3
    assert not got[5].ok_ellipsis and got[5].n_ellipsis_lines == 4
    assert got[6].ok_symbol_ratio and got[6].n_symbols == 1
    assert not got[7].ok_symbol_ratio and got[7].n_symbols == 2
    assert got[8].ok_alpha and got[8].alpha_word_ratio == 0.8
    assert not got[9].ok_alpha
    assert got[10].ok_word_len and got[10].mean_word_len == 3.0
    assert not got[11].ok_word_len
    # NULL text: one empty line, zero words, every word-rule fails closed
    assert got[12].n_words == 0 and got[12].n_lines == 1
    assert not got[12].ok_word_len and not got[12].ok_alpha and not got[12].keep
    assert got[12].ok_bullet and got[12].ok_ellipsis  # 0 of 1 line


def _py_unimax(totals: dict[str, int], budget: int, epoch_cap: int):
    """Independent reimplementation of the integer waterfill spec
    (curation.unimax_budgets docstring) for the tests."""
    caps = sorted(((epoch_cap * t, g) for g, t in totals.items()))
    n = len(caps)
    alloc, prefix, k, csum = {}, 0, 0, 0
    for idx, (cap, g) in enumerate(caps, start=1):
        if cap * (n - idx + 1) <= budget - prefix:
            alloc[g] = cap
            k, csum = idx, csum + cap
        prefix += cap
    m = n - k
    if m:
        spill = budget - csum
        base, extra = divmod(spill, m)
        for j, (cap, g) in enumerate(caps[k:], start=1):
            alloc[g] = base + 1 if j <= extra else base
    return alloc


def test_fuzz_unimax_waterfill_invariants():
    """Seeded fuzz of the integer waterfill spec (pure Python — the Spark
    op equals _py_unimax by the 4-case test above; here the SPEC itself is
    checked against waterfill theory on 400 random instances):

      * Σ alloc == min(budget, Σ caps)  (exact budget exhaustion)
      * 0 ≤ alloc_l ≤ cap_l             (epoch cap never exceeded)
      * uncapped allocs differ by ≤ 1   (uniformity — the integer
                                         residue of the paper's equal
                                         division)
      * every capped cap ≤ every uncapped alloc  (waterfill level: a
        language is only capped when its cap sits below the water line)
      * alloc is monotone in budget (+1 budget never lowers any alloc
        by more than the shifted remainder — checked as Σ monotone and
        per-language no-decrease-beyond-1)
    """
    import random

    rng = random.Random(0x0417)
    for _ in range(400):
        n = rng.randint(1, 8)
        totals = {
            f"l{i}": rng.choice([0, rng.randint(1, 50), rng.randint(1, 5000)])
            for i in range(n)
        }
        epochs = rng.randint(1, 4)
        budget = rng.randint(0, int(2.5 * epochs * max(1, sum(totals.values()))))
        alloc = _py_unimax(totals, budget, epochs)
        caps = {g: epochs * t for g, t in totals.items()}
        assert set(alloc) == set(totals)
        assert sum(alloc.values()) == min(budget, sum(caps.values()))
        for g in totals:
            assert 0 <= alloc[g] <= caps[g]
        uncapped = [alloc[g] for g in totals if alloc[g] < caps[g]]
        if uncapped:
            assert max(uncapped) - min(uncapped) <= 1
            capped_caps = [caps[g] for g in totals if alloc[g] == caps[g]]
            if capped_caps:
                assert max(capped_caps) <= min(uncapped)
        # budget monotonicity (spot, not every instance: one extra token)
        alloc2 = _py_unimax(totals, budget + 1, epochs)
        assert sum(alloc2.values()) >= sum(alloc.values())
        for g in totals:
            assert alloc2[g] >= alloc[g] - 1


def test_unimax_budgets_vs_python(spark):
    from web3_knowledge_graph_spark.datasets import curation as CU

    cases = [
        # mixed capped/uncapped with a nonzero mod-m remainder
        ({"de": 100, "fr": 110, "en": 400}, 500, 2),
        # budget beyond every cap: all capped, shortfall visible
        ({"a": 10, "b": 20}, 1000, 3),
        # zero-token group + single big group
        ({"empty": 0, "en": 50}, 70, 2),
        ({"only": 33}, 10, 4),
    ]
    for totals, budget, epochs in cases:
        want = _py_unimax(totals, budget, epochs)
        df = spark.createDataFrame(
            list(totals.items()), "grp string, total long"
        )
        got = {r.grp: r for r in CU.unimax_budgets(df, budget, epochs).collect()}
        assert {g: r.alloc for g, r in got.items()} == want, (totals, budget)
        # waterfill invariants: never above cap, total = min(B, sum caps)
        for g, r in got.items():
            assert r.alloc <= r.cap == epochs * totals[g]
        assert sum(want.values()) == min(
            budget, epochs * sum(totals.values())
        )


def test_unimax_sample_hand_traced(spark):
    """Full epochs + md5-prefix partial epoch per group, against a
    sequential replay of the same md5 walk."""
    from web3_knowledge_graph_spark.datasets import curation as CU

    rows = [
        (0, "en", "w1 w2 w3 w4"),      # 4 tokens
        (1, "en", "w1 w2 w3 w4 w5 w6"),  # 6
        (2, "en", "w1 w2"),            # 2
        (3, "de", "a b c"),            # 3
        (4, "de", "d e"),              # 2
        # NULL group: excluded up front — consumes no budget, emits no row
        (5, None, "x y z q r s t u v w"),
    ]
    # totals: en=12, de=5. epoch_cap=2 -> caps de=10, en=24; budget 20:
    # de capped? 10*2 <= 20 -> yes. en: spill 10, m=1 -> alloc 10.
    # de: f=2, r=0 (every de doc twice, no partial epoch).
    # en: f=0, r=10 -> md5-order prefix of en docs with cum tokens <= 10.
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {
        r.doc_id: r
        for r in CU.unimax_sample(docs, budget=20, epoch_cap=2).collect()
    }
    assert got[3].n_epochs == 2 and got[4].n_epochs == 2
    order = sorted(
        (hashlib.md5(str(i).encode()).hexdigest(), i, n)
        for i, n in ((0, 4), (1, 6), (2, 2))
    )
    cum, want = 0, {}
    for _, i, n in order:
        cum += n
        if cum <= 10:
            want[i] = 1
    assert {i: r.n_epochs for i, r in got.items() if r.grp == "en"} == want
    assert sum(r.n_tokens * r.n_epochs for r in got.values()) <= 20
    assert 5 not in got


def test_semantic_dedup_multiprobe_crosses_cell_boundary(spark):
    """A near-dup pair straddling a cell boundary is invisible at
    n_probes=1 (different top-1 cells) and found at n_probes=2 (shared
    probe cell): vecs 2/3 sit at cos 0.96 to each other but 0.8/0.6 to
    the two centroids, landing in different cells."""
    from web3_knowledge_graph_spark.datasets import similarity as SIM

    rows = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [0.8, 0.6]),   # top-1 cell 0, probe-2 cell 1
        (3, [0.6, 0.8]),   # top-1 cell 1, probe-2 cell 0
    ]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    one = {r.vec_id: r for r in SIM.semantic_dedup(
        vecs, threshold=0.95, n_centroids=2, n_probes=1).collect()}
    assert all(one[i].keep for i in range(4))  # pair split across cells
    two = {r.vec_id: r for r in SIM.semantic_dedup(
        vecs, threshold=0.95, n_centroids=2, n_probes=2).collect()}
    assert two[2].keep and not two[3].keep and two[3].dup_of == 2
    # reported cell stays the top-1 assignment under multi-probe
    assert (two[2].cell, two[3].cell) == (one[2].cell, one[3].cell)
