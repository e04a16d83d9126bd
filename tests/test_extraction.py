"""Text-extraction parity: byte-identical extracted text per url
(BASELINE.json input_hint per-row invariant)."""

import pandas as pd
from pyspark.sql import functions as F

from web3_knowledge_graph_spark.fixtures import corpus
from web3_knowledge_graph_spark.functions.extraction import (
    extract_text_py,
    with_extracted_text,
)

N = 300


def test_pure_function_basics():
    assert extract_text_py(None) is None
    assert extract_text_py(b"") == ""
    assert extract_text_py(b"<html><body></body></html>") == ""
    out = extract_text_py(b"<p>a</p><script>var x=1;</script><p>b &amp; c</p>")
    assert out == "a\n\nb & c"
    # comments and style dropped, entities decoded, whitespace collapsed
    assert (
        extract_text_py(b"<!-- no @ghost --><style>p{}</style><p>x   y</p>")
        == "x y"
    )


def test_malformed_html_does_not_crash():
    assert extract_text_py(b"<p>open <div><b>bold") == "open\nbold"
    assert extract_text_py(b"\xff\xfe<p>junk</p>") is not None


def test_corpus_text_parity_python():
    """Pure-python path: extracted text == composed golden, byte for byte."""
    golden = corpus.golden_text(N).set_index("url")["text"]
    for i in range(N):
        m = corpus.page_manifest(i)
        rec = corpus.page_record(i)
        got = rec["text"] if rec["html"] is None else extract_text_py(rec["html"])
        assert got == golden[m["url"]], f"text mismatch for page {i}"


def test_corpus_text_parity_spark(spark):
    """Arrow-UDF path agrees with the pure function on every url."""
    pages = corpus.pages_df(spark, N, partitions=4)
    got = (
        with_extracted_text(pages)
        .select("url", "text")
        .toPandas()
        .set_index("url")["text"]
    )
    golden = corpus.golden_text(N).set_index("url")["text"]
    assert len(got) == N
    mism = [u for u in golden.index if got[u] != golden[u]]
    assert not mism, f"{len(mism)} byte-mismatched urls, e.g. {mism[:3]}"
