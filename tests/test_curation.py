"""Curation gates + token-budget mixer vs independently computed
ground truth (pandas/DuckDB re-derivation over the same parquet)."""

from __future__ import annotations

import duckdb
import pytest

from exam_pdf_parser_spark.operators.curation import budget_sample, curate
from exam_pdf_parser_spark.sources.io import load

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    d = load(spark, SF, "documents").persist()
    yield d
    d.unpersist()


def test_curate_gate_order_and_provenance(spark, docs):
    rows = {r["doc_id"]: r for r in curate(docs, langs=["en", "de"]).collect()}
    assert len(rows) == docs.count()          # nothing silently dropped

    con = duckdb.connect()
    truth = con.sql(f"""
        WITH h AS (SELECT doc_id, lang, md5(text) AS th,
                          list_filter(string_split(text,' '), x -> x <> '')
                            AS words
                   FROM read_parquet('{SF}/documents.parquet')),
        c AS (SELECT *, min(doc_id) OVER (PARTITION BY th) AS canon,
                     len(words) AS tokens,
                     CASE WHEN len(words) > 0 THEN
                       CAST(len(list_distinct(words)) AS DOUBLE)/len(words)
                       ELSE 0 END AS uniq
              FROM h)
        SELECT doc_id,
               CASE WHEN doc_id <> canon THEN 'duplicate'
                    WHEN tokens < 20 OR uniq < 0.2 THEN 'quality'
                    WHEN lang NOT IN ('en','de') THEN 'lang'
                    END AS reason
        FROM c
    """).fetchall()
    for doc_id, reason in truth:
        assert rows[doc_id]["drop_reason"] == reason, doc_id
        assert rows[doc_id]["keep"] == (reason is None)
    # every gate exercised on real data
    reasons = {r["drop_reason"] for r in rows.values()}
    assert "lang" in reasons and None in reasons


def test_budget_sample_prefix_semantics(spark, docs):
    budget = 5000
    got = budget_sample(docs, budget).collect()
    by_lang: dict[str, list] = {}
    for r in got:
        by_lang.setdefault(r["lang"], []).append(r)

    all_docs = {}
    for r in curate(docs).collect():   # reuse stats computation
        all_docs.setdefault(r["lang"], []).append(r)

    assert by_lang  # non-empty sample
    for lang, kept in by_lang.items():
        total = sum(r["tokens"] for r in kept)
        assert total <= budget
        # greedy prefix: kept set == the ranked prefix under the budget
        ranked = sorted(all_docs[lang],
                        key=lambda r: (-r["uniq_ratio"], r["doc_id"]))
        want_ids, cum = [], 0
        for r in ranked:
            if cum + r["tokens"] > budget:
                break
            cum += r["tokens"]
            want_ids.append(r["doc_id"])
        assert sorted(r["doc_id"] for r in kept) == sorted(want_ids), lang


def test_budget_sample_deterministic_across_partitionings(spark, docs):
    a = sorted((r["lang"], r["doc_id"]) for r in
               budget_sample(docs, 3000).collect())
    b = sorted((r["lang"], r["doc_id"]) for r in
               budget_sample(docs.repartition(13), 3000).collect())
    assert a == b


def test_budget_sample_durable_pin_identical(spark, docs, tmp_path):
    """Round-4 ask: the opt-in durable boundary pin (parquet write +
    pid-regathered re-read) must produce output identical to the
    default localCheckpoint pin — including per-row cum_tokens — so an
    executor loss can resume a mixer run without changing the sample."""
    mem = sorted((r["lang"], r["doc_id"], r["cum_tokens"]) for r in
                 budget_sample(docs, 3000).collect())
    dur = sorted((r["lang"], r["doc_id"], r["cum_tokens"]) for r in
                 budget_sample(docs, 3000,
                               durable_pin=str(tmp_path / "pin")).collect())
    assert mem == dur
    # the pin really is on disk (resumable) and carries the pids
    import pyarrow.parquet as pq
    files = list((tmp_path / "pin").glob("*.parquet"))
    assert files
    assert "_pid" in pq.read_schema(str(files[0])).names


def test_curate_null_text_and_duplicate_ids(spark):
    """NULL text is a quality drop (never 'duplicate'); non-unique
    doc_ids still yield exactly one keeper per identical-text group."""
    rows = [
        (1, "the same exact text body here repeated", "en"),
        (1, "the same exact text body here repeated", "en"),  # dup id!
        (2, None, "en"),
        (3, None, "en"),
        (4, " ".join(f"w{i}" for i in range(30)), "en"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string, lang: string")
    out = curate(df, min_tokens=5).collect()
    assert len(out) == 5
    same = [r for r in out if r["doc_id"] == 1]
    assert sorted(r["keep"] for r in same) == [False, True]
    assert [r["drop_reason"] for r in same if not r["keep"]] == ["duplicate"]
    for r in out:
        if r["doc_id"] in (2, 3):
            assert r["drop_reason"] == "quality"    # never 'duplicate'
            assert r["tokens"] == 0                 # not -1
    assert next(r for r in out if r["doc_id"] == 4)["keep"]


def test_budget_sample_ignores_null_text(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e", "en"), (2, None, "en"), (3, "f g h", "en")],
        "doc_id: long, text: string, lang: string")
    got = budget_sample(df, 6).collect()
    # cumsum stays monotonic: null-text doc contributes 0 tokens
    assert sum(r["tokens"] for r in got) <= 6
    assert all(r["tokens"] >= 0 for r in got)


def test_budget_sample_no_per_group_window(spark, docs):
    # ranking is a range-partitioned sort + two-pass cumsum — there
    # must be NO per-group Window (one giant task per language at scale)
    plan = budget_sample(docs, 1000)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Window" not in plan
    # cumsum runs in the Arrow-batched stage over the checkpointed
    # range-sorted frame (the checkpoint truncates lineage, so the
    # RangePartitioning itself lives upstream of this plan)
    assert "MapInPandas" in plan


def test_budget_sample_null_group_key(spark):
    """NULL lang rows form their own budget group (pandas groupby drops
    NaN keys — the sentinel path keeps their running sums exact)."""
    df = spark.createDataFrame(
        [(1, "a b c", None), (2, "d e", None), (3, "f g h i", "en"),
         (4, "j", None)],
        "doc_id: long, text: string, lang: string")
    got = {r["doc_id"]: r["cum_tokens"]
           for r in budget_sample(df, 100).collect()}
    assert len(got) == 4                       # nothing silently dropped
    # null-lang group cumsums are a real running total (order within
    # the group: uniq_ratio desc then doc_id — all uniq here, so the
    # 4-token doc sorts by its ratio; just check totals are consistent)
    null_cums = sorted(v for k, v in got.items() if k in (1, 2, 4))
    assert null_cums[-1] == 6                  # 3 + 2 + 1 tokens total
    assert got[3] == 4
