"""End-to-end pipeline: per-predicate P/R ≥ 0.95 vs analytic golden triples
(BASELINE.md target — in fact exact match is expected on the fixture corpus),
plus partition-granular kill/resume equivalence (north rule)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from web3_knowledge_graph_spark.fixtures import corpus
from web3_knowledge_graph_spark.plans.pipeline import run_pipeline
from web3_knowledge_graph_spark.sources.checkpoint import CheckpointLog
from web3_knowledge_graph_spark.sources.warehouse import Warehouse

N = 600
BUCKETS = 4


def _side(spark):
    side = {
        "registrations": spark.createDataFrame(corpus.registrations_pdf()),
        "profiles": spark.createDataFrame(corpus.profiles_pdf()),
        "balances": spark.createDataFrame(corpus.balances_pdf()),
        "alias_dict": spark.createDataFrame(corpus.alias_dict_pdf()),
    }
    side.update(
        {k: spark.createDataFrame(v) for k, v in corpus.feeds_pdf().items()}
    )
    return side


def _pr(got: set, want: set) -> dict:
    preds = {p for _, p, _ in want} | {p for _, p, _ in got}
    out = {}
    for p in preds:
        g = {t for t in got if t[1] == p}
        w = {t for t in want if t[1] == p}
        tp = len(g & w)
        out[p] = (
            tp / len(g) if g else 1.0,  # precision
            tp / len(w) if w else 1.0,  # recall
        )
    return out


@pytest.fixture(scope="module")
def triples_run(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("wh"))
    pages = corpus.pages_df(spark, N, partitions=8)
    trip = run_pipeline(spark, pages, _side(spark), root, buckets=BUCKETS)
    return trip, root


def test_triple_parity(triples_run):
    trip, _ = triples_run
    got = {(r["subj"], r["pred"], r["obj"]) for r in trip.collect()}
    want = {tuple(r) for r in corpus.golden_triples(N).itertuples(index=False)}
    pr = _pr(got, want)
    bad = {p: v for p, v in pr.items() if v[0] < 0.95 or v[1] < 0.95}
    if bad:
        for p in bad:
            g = sorted(t for t in got if t[1] == p)[:5]
            w = sorted(t for t in want if t[1] == p)[:5]
            print(f"pred {p}: P/R={bad[p]} got~{g} want~{w}")
    assert not bad, f"predicates below 0.95 P/R: {bad}"
    # and on the synthetic corpus we expect EXACT parity
    assert got == want


def _n_dates(spark, n):
    return (
        corpus.pages_df(spark, n)
        .selectExpr("count(distinct to_date(warc_ts))")
        .first()[0]
    )


def test_lineage_rows_written(triples_run, spark):
    _, root = triples_run
    log = CheckpointLog(root).to_spark(spark).toPandas()
    extract = log[log.stage == "extract"]
    # one lineage mark per event DATE (the resume/incremental unit)
    assert len(extract) == _n_dates(spark, N)
    assert (extract.status == "done").all()
    assert (extract.rows_out > 0).all()
    assert extract.watermark.notna().all()


def test_resume_equals_fresh(spark, tmp_path):
    """Kill after k extract partitions; resume must (a) skip completed
    partitions and (b) produce byte-identical triples."""
    pages = corpus.pages_df(spark, 200, partitions=4)
    side = _side(spark)

    fresh_root = str(tmp_path / "fresh")
    fresh = run_pipeline(spark, pages, side, fresh_root, buckets=3)
    fresh_set = {(r["subj"], r["pred"], r["obj"]) for r in fresh.collect()}

    killed_root = str(tmp_path / "killed")

    class Boom(Exception):
        pass

    import web3_knowledge_graph_spark.plans.pipeline as P

    real_extract = P.extract_stage
    calls = {"n": 0}

    def dying_extract(*a, **kw):
        calls["n"] += 1
        if calls["n"] > 2:  # die during the 3rd partition
            raise Boom()
        return real_extract(*a, **kw)

    P.extract_stage = dying_extract
    try:
        with pytest.raises(Boom):
            run_pipeline(spark, pages, side, killed_root, buckets=3)
    finally:
        P.extract_stage = real_extract

    import math

    nd = _n_dates(spark, 200)
    size = max(1, math.ceil(nd / 3))  # batch size used by run_pipeline
    done_before = CheckpointLog(killed_root).completed("extract")
    # the first two date-batches committed (one mark per date) before the kill
    assert len(done_before) == 2 * size

    resumed = run_pipeline(spark, pages, side, killed_root, buckets=3)
    resumed_set = {(r["subj"], r["pred"], r["obj"]) for r in resumed.collect()}
    assert resumed_set == fresh_set

    # resume really skipped the committed dates: every date marked exactly once
    marks = CheckpointLog(killed_root).to_spark(spark).toPandas()
    assert len(marks[marks.stage == "extract"]) == nd


def test_incremental_new_dates(spark, tmp_path):
    """Incremental ingest: pages for NEW dates arriving later must be
    processed (not skipped as already-done partitions), and the final graph
    must equal a fresh full run."""
    from pyspark.sql import functions as F

    side = _side(spark)
    all_pages = corpus.pages_df(spark, 200, partitions=4)
    cutoff = all_pages.selectExpr(
        "percentile_approx(to_date(warc_ts), 0.5)"
    ).first()[0]
    early = all_pages.where(F.to_date("warc_ts") <= F.lit(cutoff))
    root = str(tmp_path / "inc")

    run_pipeline(spark, early, side, root, buckets=3)
    marks1 = CheckpointLog(root).completed("extract")

    # new dates arrive: run the SAME warehouse with the full corpus
    full = run_pipeline(spark, all_pages, side, root, buckets=3)
    marks2 = CheckpointLog(root).completed("extract")
    assert marks1 < marks2  # strictly more completed date partitions

    fresh = run_pipeline(
        spark, all_pages, side, str(tmp_path / "fresh"), buckets=3
    )
    assert (
        {(r["subj"], r["pred"], r["obj"]) for r in full.collect()}
        == {(r["subj"], r["pred"], r["obj"]) for r in fresh.collect()}
    )


def test_audit_columns_on_graph_tables(triples_run, spark):
    """Every materialized node & edge carries the audit stamps
    (helpers/cypher.py:14-16, queries.py:29-33)."""
    _, root = triples_run
    for tname in ("nodes", "edges"):
        df = Warehouse(root).table(tname).read(spark)
        for c in ("created_dt", "last_update_dt", "ingested_by"):
            assert c in df.columns, f"{tname} missing {c}"
        bad = df.where(
            F.col("created_dt").isNull()
            | F.col("last_update_dt").isNull()
            | F.col("ingested_by").isNull()
        ).count()
        assert bad == 0


def test_merge_upsert_audit_on_match(spark, tmp_path):
    """ON CREATE vs ON MATCH: re-merging the same keys keeps the original
    created_dt and bumps only last_update_dt/ingested_by."""
    from web3_knowledge_graph_spark.functions.normalize import audit_columns

    t = Warehouse(str(tmp_path / "wh")).table("accts")
    rows = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    t.merge_upsert(spark, audit_columns(rows, "run1", now="2024-01-01 00:00:00"), keys=["id"])
    first = {r.id: r for r in t.read(spark).collect()}

    rows2 = spark.createDataFrame([(2, "b2"), (3, "c")], "id long, v string")
    t.merge_upsert(spark, audit_columns(rows2, "run2", now="2024-02-01 00:00:00"), keys=["id"])
    second = {r.id: r for r in t.read(spark).collect()}

    assert set(second) == {1, 2, 3}
    # untouched row: everything stable
    assert second[1].created_dt == first[1].created_dt
    assert second[1].last_update_dt == first[1].last_update_dt
    # matched row: created stable, last_update bumped, value updated
    assert second[2].created_dt == first[2].created_dt
    assert second[2].last_update_dt > first[2].last_update_dt
    assert second[2].v == "b2" and second[2].ingested_by == "run2"
    # created row: fresh stamps
    assert second[3].created_dt == second[3].last_update_dt
    assert second[3].ingested_by == "run2"


def test_incremental_grown_dates(spark, tmp_path):
    """Late-arriving pages for ALREADY-COMPLETED dates must be reprocessed
    (input is not append-only-by-date): run on a 200-page corpus, then
    re-run the same warehouse with 400 pages whose extra rows land on the
    SAME dates — the result must equal a fresh 400-page run."""
    side = _side(spark)
    root = str(tmp_path / "grow")
    run_pipeline(spark, corpus.pages_df(spark, 200, partitions=4), side, root, buckets=3)

    grown = run_pipeline(
        spark, corpus.pages_df(spark, 400, partitions=4), side, root, buckets=3
    )
    fresh = run_pipeline(
        spark, corpus.pages_df(spark, 400, partitions=4), side,
        str(tmp_path / "fresh400"), buckets=3,
    )
    assert (
        {(r["subj"], r["pred"], r["obj"]) for r in grown.collect()}
        == {(r["subj"], r["pred"], r["obj"]) for r in fresh.collect()}
    )


def test_incremental_changed_content(spark, tmp_path):
    """An in-place edit that keeps a date's ROW COUNT constant must still be
    reprocessed: the lineage mark's input_fp (bit_xor of per-row xxhash64)
    detects the content change where rows_in alone cannot. Edit the text of
    one url, re-run the same warehouse, and expect the fresh-run result."""
    side = _side(spark)
    root = str(tmp_path / "edit")
    pages = corpus.pages_df(spark, 200, partitions=4)
    run_pipeline(spark, pages, side, root, buckets=3)

    victim = pages.select("url").orderBy("url").limit(1).collect()[0]["url"]
    # an ENS mention is guaranteed to emit a MENTIONS_ENS edge, so a stale
    # (skipped) resume is guaranteed to differ from the fresh run
    edited = pages.withColumn(
        "text",
        F.when(
            F.col("url") == victim,
            F.concat(F.col("text"), F.lit(" edited-in-place fpcheck.eth")),
        ).otherwise(F.col("text")),
    )
    assert edited.count() == pages.count()  # same per-date counts by design

    resumed = run_pipeline(spark, edited, side, root, buckets=3)
    fresh = run_pipeline(
        spark, edited, side, str(tmp_path / "freshedit"), buckets=3
    )
    assert (
        {(r["subj"], r["pred"], r["obj"]) for r in resumed.collect()}
        == {(r["subj"], r["pred"], r["obj"]) for r in fresh.collect()}
    )


def test_author_first_valid_vs_first_raw(spark):
    """Pin the deliberate asymmetry the flagship oracle replicates: the
    AUTHOR mention takes the first VALID wallet in the page, while the
    alias relations (_page_alias_relations) require the first RAW regex
    match to be valid and otherwise drop the page."""
    from web3_knowledge_graph_spark.driver_queries import _page_alias_relations
    from web3_knowledge_graph_spark.plans.pipeline import _author_mentions

    bad = "0x" + "a" * 39  # 41 chars — regex-matchable, invalid length
    good = "0x" + "b" * 40
    text = f"Author wallet: {bad} then Author wallet: {good} and name1.eth @h1"
    pages = spark.createDataFrame(
        [("u1", text, "2024-01-05 00:00:00")], "url string, text string, warc_ts string"
    )
    authors = _author_mentions(pages).collect()
    assert [(r.url, r.value, r.n) for r in authors] == [("u1", good, 1)]
    reg, th = _page_alias_relations(spark, None, pages=pages)
    # first RAW match is the 41-char candidate → page excluded entirely
    assert reg.count() == 0 and th.count() == 0


def test_extract_stage_fused_equals_branch_union(spark):
    """The fused single-pass extract stage emits exactly the rows of the
    former 3-branch union (regex + dictionary + author), on both sides of
    the FUSE_DICT_MAX_ALIASES cutover."""
    import web3_knowledge_graph_spark.plans.pipeline as P
    from web3_knowledge_graph_spark.functions import mentions as M
    from web3_knowledge_graph_spark.functions.extraction import with_extracted_text

    pages = corpus.pages_df(spark, 120, partitions=4)
    texted = with_extracted_text(pages).where(
        F.col("text").isNotNull() & (F.length("text") > 0)
    )

    def union_ref(vocab):
        return (
            M.extract_mentions(texted)
            .unionByName(M.dictionary_mentions(texted, vocab))
            .unionByName(P._author_mentions(texted))
        )

    small = spark.createDataFrame(corpus.alias_dict_pdf())
    got, want = P.extract_stage(pages, small), union_ref(small)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0

    # force the >FUSE_DICT_MAX_ALIASES broadcast-join branch: pad the dict
    # with aliases that never occur, plus the real ones.
    pad = [("pad%04d" % i, "token", ["zzpad%04d" % i]) for i in range(600)]
    rows = [
        (r.entity_id, r.kind, list(r.aliases))
        for r in small.collect()
    ] + pad
    bigd = spark.createDataFrame(
        rows, "entity_id string, kind string, aliases array<string>"
    )
    got2, want2 = P.extract_stage(pages, bigd), union_ref(bigd)
    assert got2.exceptAll(want2).count() == 0
    assert want2.exceptAll(got2).count() == 0
    # and the two dict sizes agree on everything except nothing (pads
    # never match): fused small-dict output == fallback big-dict output
    assert got.exceptAll(got2).count() == 0
    assert got2.exceptAll(got).count() == 0


def test_resume_after_crash_between_extract_and_graph(spark, tmp_path, monkeypatch):
    """Crash window: a run ingests new dates, writes their extract marks,
    then dies BEFORE the graph stage. The next resume has todo == [] and
    an OLD run's graph mark still reads done — the corpus-signature check
    must force the rebuild (regression: stale graph served forever)."""
    import web3_knowledge_graph_spark.plans.pipeline as P
    from web3_knowledge_graph_spark.fixtures import corpus

    root, fresh_root = str(tmp_path / "wh"), str(tmp_path / "fresh")
    side = _side(spark)
    early = corpus.pages_df(spark, 150, partitions=4)
    all_pages = corpus.pages_df(spark, 260, partitions=4)
    run_pipeline(spark, early, side, root, buckets=3)

    real = P.build_graph
    monkeypatch.setattr(
        P, "build_graph",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("simulated crash")),
    )
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="simulated crash"):
        run_pipeline(spark, all_pages, side, root, buckets=3)
    monkeypatch.setattr(P, "build_graph", real)

    resumed = run_pipeline(spark, all_pages, side, root, buckets=3)
    fresh = run_pipeline(spark, all_pages, _side(spark), fresh_root, buckets=3)
    assert sorted(map(tuple, resumed.collect())) == sorted(
        map(tuple, fresh.collect())
    )


def test_extract_stage_empty_dictionary(spark):
    """An empty alias dictionary is a legal deployment state: regex +
    author mentions still extract; no IndexError (regression)."""
    from web3_knowledge_graph_spark.fixtures import corpus
    from web3_knowledge_graph_spark.functions.mentions import dictionary_mentions
    from web3_knowledge_graph_spark.plans.pipeline import extract_stage
    from web3_knowledge_graph_spark.schemas import ALIAS_DICT

    pages = corpus.pages_df(spark, 40, partitions=2)
    empty = spark.createDataFrame([], ALIAS_DICT)
    out = extract_stage(pages, empty)
    kinds = {r.kind for r in out.select("kind").distinct().collect()}
    assert len(kinds) > 0 and not any(k.startswith("dict:") for k in kinds)
    assert dictionary_mentions(pages, empty).count() == 0


def test_extract_stage_duplicate_alias_fans_out(spark):
    """An alias shared by two entities must produce a mention PER entity in
    the fused literal-map branch, exactly like the broadcast-join branch
    (regression: last-wins dict silently dropped one entity)."""
    import datetime as dt

    from web3_knowledge_graph_spark.functions.extraction import with_extracted_text
    from web3_knowledge_graph_spark.functions.mentions import dictionary_mentions
    from web3_knowledge_graph_spark.plans.pipeline import extract_stage
    from web3_knowledge_graph_spark.schemas import ALIAS_DICT, PAGES

    pages = spark.createDataFrame(
        [("u1", dt.datetime(2024, 1, 1), None, "both entities call it zorb today", "en")],
        PAGES,
    )
    dup = spark.createDataFrame(
        [
            ("ent:A", "token", "Zorb A", ["zorb"], None, None, None),
            ("ent:B", "token", "Zorb B", ["zorb"], None, None, None),
        ],
        ALIAS_DICT,
    )
    fused = {
        (r.kind, r.value, r.n)
        for r in extract_stage(pages, dup).where(F.col("kind") == "dict:token").collect()
    }
    assert fused == {("dict:token", "ent:A", 1), ("dict:token", "ent:B", 1)}
    broadcast_side = {
        (r.kind, r.value, r.n)
        for r in dictionary_mentions(with_extracted_text(pages), dup).collect()
    }
    assert fused == broadcast_side


def test_warehouse_orphan_snapshot_recovery(spark, tmp_path):
    """A writer that crashed between the snapshot rename and the pointer
    swap leaves an orphan version directory; the next commit must skip
    past it instead of failing os.rename forever (regression)."""
    import os

    from web3_knowledge_graph_spark.sources.warehouse import Table

    t = Table(str(tmp_path), "t")
    t.overwrite(spark.createDataFrame([(1,)], "x long"))  # v1
    # orphan v2: committed directory, pointer still at 1
    orphan = t._snap_path(2)
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-000.parquet"), "w") as f:
        f.write("garbage")
    v = t.overwrite(spark.createDataFrame([(2,)], "x long"))
    assert v == 3 and t.current_version() == 3
    assert [r.x for r in t.read(spark).collect()] == [2]


def test_resume_date_shrinks_to_zero_mentions(spark, tmp_path):
    """Every date's re-extraction yielding ZERO mentions must (a) remove
    the stale mention partitions (dynamic overwrite alone would keep them)
    and (b) leave the warehouse READABLE — a mentions_data dir holding
    only _SUCCESS used to crash the same run's read-back, and every later
    resume, with 'Unable to infer schema' (regression). Triples keep the
    documented Cypher-MERGE contract: the graph never shrinks."""
    import os

    from web3_knowledge_graph_spark.fixtures import corpus

    root = str(tmp_path / "wh")
    side = _side(spark)
    rich = corpus.pages_df(spark, 60, partitions=2)
    n1 = run_pipeline(spark, rich, side, root, buckets=2).count()

    # same urls + dates, content edited so extraction finds nothing —
    # this run reads mentions_data AFTER the zero-count cleanup emptied it
    empty = rich.withColumn("html", F.lit(None).cast("binary")).withColumn(
        "text", F.lit("plain words only")
    )
    n2 = run_pipeline(spark, empty, side, root, buckets=2).count()
    assert n2 == n1  # MERGE never deletes (reference Cypher-MERGE contract)
    # stale mention partitions really are gone (not resurrectable state)
    assert not any(
        e.startswith("_d=") for e in os.listdir(f"{root}/mentions_data")
    )
    # and a further resume off the partitionless dir also works
    n3 = run_pipeline(spark, empty, side, root, buckets=2).count()
    assert n3 == n2


def test_table_diff_cdc(spark, tmp_path):
    """Snapshot CDC classifies added/removed/changed between versions and
    omits unchanged keys; schema-evolved columns outside the common set
    are ignored."""
    from web3_knowledge_graph_spark.sources.warehouse import Table

    t = Table(str(tmp_path), "t")
    t.overwrite(spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "k long, v double"))
    # v2: 1 unchanged, 2 changed, 3 removed, 4 added; extra column ignored
    t.overwrite(spark.createDataFrame(
        [(1, 10.0, "x"), (2, 99.0, "y"), (4, 40.0, "z")],
        "k long, v double, extra string"))
    got = {r.k: r.change for r in t.diff(spark, keys=["k"], v_old=1).collect()}
    assert got == {2: "changed", 3: "removed", 4: "added"}


def test_side_table_edit_triggers_graph_rebuild(spark, tmp_path):
    """Editing a side table with an UNCHANGED corpus must rebuild the graph
    on resume (the graph mark's signature covers side tables, not just page
    ingest — closes the former stale-graph blind spot)."""
    pages = corpus.pages_df(spark, 150, partitions=4)
    root = str(tmp_path / "wh")
    side = _side(spark)
    run_pipeline(spark, pages, side, root, buckets=3)

    # edit one registration: ens(0) now resolves to wallet(7)
    reg = corpus.registrations_pdf()
    reg.loc[0, "owner"] = corpus.D.wallet_address(7)
    edited = dict(side)
    edited["registrations"] = spark.createDataFrame(reg)

    resumed = run_pipeline(spark, pages, edited, root, buckets=3)
    got = {(r["subj"], r["pred"], r["obj"]) for r in resumed.collect()}
    # the new alias edge exists — the graph was rebuilt from the edit
    new_edge = (
        f"Wallet:{corpus.D.wallet_address(7)}",
        "HAS_ALIAS",
        f"Ens:{corpus.D.ens_name(0)}",
    )
    assert new_edge in got
    # and extraction was NOT redone (corpus unchanged): one mark per date
    marks = CheckpointLog(root).to_spark(spark).toPandas()
    nd = _n_dates(spark, 150)
    assert len(marks[marks.stage == "extract"]) == nd
    # unchanged side tables on a third run: graph mark is reused (no new mark)
    n_graph = len(marks[marks.stage == "graph"])
    run_pipeline(spark, pages, edited, root, buckets=3)
    marks2 = CheckpointLog(root).to_spark(spark).toPandas()
    assert len(marks2[marks2.stage == "graph"]) == n_graph


def _crash_mark_once(monkeypatch, stage: str):
    """Make CheckpointLog.mark raise the FIRST time it commits ``stage`` —
    the crash window between the data write and its lineage mark."""
    real_mark = CheckpointLog.mark
    state = {"done": False}

    class Boom(Exception):
        pass

    def dying_mark(self, run_id, stg, part, **kw):
        if stg == stage and not state["done"]:
            state["done"] = True
            raise Boom()
        return real_mark(self, run_id, stg, part, **kw)

    monkeypatch.setattr(CheckpointLog, "mark", dying_mark)
    return Boom


def test_crash_between_extract_write_and_mark(spark, tmp_path, monkeypatch):
    """Kill AFTER the mentions parquet write but BEFORE the extract mark:
    resume must reprocess that date (dynamic overwrite rewrites exactly its
    partition) and end byte-identical to a fresh run."""
    import pytest as _pytest

    pages = corpus.pages_df(spark, 150, partitions=4)
    side = _side(spark)
    fresh = run_pipeline(spark, pages, side, str(tmp_path / "fresh"), buckets=3)
    fresh_set = {(r["subj"], r["pred"], r["obj"]) for r in fresh.collect()}

    root = str(tmp_path / "crashed")
    Boom = _crash_mark_once(monkeypatch, "extract")
    with _pytest.raises(Boom):
        run_pipeline(spark, pages, side, root, buckets=3)
    monkeypatch.undo()

    resumed = run_pipeline(spark, pages, side, root, buckets=3)
    got = {(r["subj"], r["pred"], r["obj"]) for r in resumed.collect()}
    assert got == fresh_set


def test_crash_between_merge_and_graph_mark(spark, tmp_path, monkeypatch):
    """Kill AFTER nodes/edges merge_upsert + triples overwrite but BEFORE
    the graph mark: resume must rebuild the graph (idempotent MERGE) and
    end byte-identical to a fresh run."""
    import pytest as _pytest

    pages = corpus.pages_df(spark, 150, partitions=4)
    side = _side(spark)
    fresh = run_pipeline(spark, pages, side, str(tmp_path / "fresh2"), buckets=3)
    fresh_set = {(r["subj"], r["pred"], r["obj"]) for r in fresh.collect()}

    root = str(tmp_path / "crashed2")
    Boom = _crash_mark_once(monkeypatch, "graph")
    with _pytest.raises(Boom):
        run_pipeline(spark, pages, side, root, buckets=3)
    monkeypatch.undo()

    resumed = run_pipeline(spark, pages, side, root, buckets=3)
    got = {(r["subj"], r["pred"], r["obj"]) for r in resumed.collect()}
    assert got == fresh_set
    # the merge really ran twice over the same updates — still one row per key
    wh = Warehouse(root)
    trip = wh.table("triples").read(spark)
    assert trip.count() == trip.dropDuplicates(["subj", "pred", "obj"]).count()
