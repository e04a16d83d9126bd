"""Generate PARITY.md: per-predicate triple precision/recall and per-url
text byte-parity of the full pipeline against the analytic goldens
(BASELINE.md targets: P/R ≥ 0.95 per predicate; byte-identical text).

    python tools/parity_report.py [N_PAGES]
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, ".")


def main(n: int = 600) -> int:
    from web3_knowledge_graph_spark.fixtures import corpus
    from web3_knowledge_graph_spark.functions.extraction import extract_text_py
    from web3_knowledge_graph_spark.plans.pipeline import run_pipeline
    from web3_knowledge_graph_spark.session import get_spark

    spark = get_spark("parity", cores=8)
    side = {
        k: spark.createDataFrame(getattr(corpus, f"{k}_pdf")())
        for k in ("registrations", "profiles", "balances", "alias_dict")
    }
    side.update({k: spark.createDataFrame(v) for k, v in corpus.feeds_pdf().items()})
    trip = run_pipeline(
        spark, corpus.pages_df(spark, n, partitions=8), side,
        tempfile.mkdtemp(prefix="wkg_parity_"), buckets=4,
    )
    got = {(r["subj"], r["pred"], r["obj"]) for r in trip.collect()}
    want = {tuple(r) for r in corpus.golden_triples(n).itertuples(index=False)}

    preds = sorted({p for _, p, _ in want} | {p for _, p, _ in got})
    rows = []
    for p in preds:
        g = {t for t in got if t[1] == p}
        w = {t for t in want if t[1] == p}
        tp = len(g & w)
        prec = tp / len(g) if g else 1.0
        rec = tp / len(w) if w else 1.0
        rows.append((p, len(w), len(g), prec, rec))

    # text byte-parity: engine extraction vs golden text, per url
    n_urls = 0
    mismatches = 0
    for i in range(n):
        rec = corpus.page_record(i)
        if rec.get("html") is None:
            continue
        n_urls += 1
        if extract_text_py(rec["html"]) != corpus.expected_text(corpus.page_manifest(i)):
            mismatches += 1
    all_pass = all(p >= 0.95 and r >= 0.95 for _, _, _, p, r in rows)

    md = [
        "# PARITY — triple P/R + text byte-identity vs analytic goldens",
        "",
        f"Fixture corpus: {n} pages (seeded, FIXTURES.md F1), full pipeline",
        "(extract → mentions → link → canonicalize → materialize) vs the",
        "driver-side analytic replay of the same manifest.",
        "",
        "| predicate | golden | emitted | precision | recall |",
        "|---|---|---|---|---|",
    ]
    for p, nw, ng, prec, rec in rows:
        md.append(f"| {p} | {nw} | {ng} | {prec:.4f} | {rec:.4f} |")
    md += [
        "",
        f"**All predicates ≥ 0.95 P/R: {'YES' if all_pass else 'NO'}** "
        f"(target: BASELINE.json north_rule; on this corpus the match is exact).",
        "",
        f"**Text byte-parity**: {n_urls - mismatches}/{n_urls} html urls byte-identical "
        f"({'PASS' if mismatches == 0 else 'FAIL'}) — extract_text_py vs golden text "
        "(input_hint per-row invariant).",
        "",
        "Regenerate with `python tools/parity_report.py`. The same checks gate",
        "`python -m pytest tests/test_pipeline.py tests/test_extraction.py`.",
    ]
    with open("PARITY.md", "w") as f:
        f.write("\n".join(md) + "\n")
    print("\n".join(md))
    return 0 if (all_pass and mismatches == 0) else 1


if __name__ == "__main__":
    raise SystemExit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 600))
