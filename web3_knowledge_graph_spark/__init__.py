"""web3_knowledge_graph_spark — a from-scratch PySpark-native knowledge-graph
construction engine with the query/data-processing capabilities of
Chainverse-Data/web3-knowledge-graph (reference at /root/reference, cited by
file:line in docstrings throughout).

Architecture (Spark-first, NOT a port):

    pages (url, warc_ts, html, text, lang)          -- Common-Crawl-style input
      └─ functions.extraction.extract_text          -- vectorized Arrow UDF
      └─ functions.mentions.*                       -- native regexp + trie join
      └─ operators.linking.*                        -- blocking + scored joins
      └─ operators.canon.connected_components       -- large-star/small-star
      └─ plans.pipeline.build_graph                 -- nodes/edges triple tables
      └─ sources.checkpoint                         -- per-partition lineage/resume

The reference's bespoke scrapers + per-record Neo4j Cypher upserts become a
declarative DataFrame pipeline; Neo4j's property graph becomes two partitioned
parquet tables nodes(id,label,props...) / edges(subj,pred,obj,props...).
"""

__version__ = "0.1.0"
