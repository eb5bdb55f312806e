"""Physical-plan shape assertions: the optimizations we claim must be
visible in `.explain` output (pushed filters, broadcasts, codegen,
no stray shuffles) — guarding against plan regressions."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pair_scope_filter_pushed_to_scan(spark):
    from exam_pdf_parser_spark.operators.dedupe import jaccard_pairs

    plan = _plan(jaccard_pairs(spark, SF))
    assert "PushedFilters" in plan
    assert "LessThan(doc_id," in plan.replace(" ", "").replace(
        "LessThan(doc_id,", "LessThan(doc_id,")  # pushed predicate present
    assert "IsNotNull(doc_id)" in plan or "LessThan" in plan


def test_dim_joins_are_broadcast(spark):
    from exam_pdf_parser_spark.plans.relational import revenue_by_nation

    plan = _plan(revenue_by_nation(spark, SF))
    assert "BroadcastHashJoin" in plan


def test_column_pruning_reaches_scan(spark):
    from exam_pdf_parser_spark.plans.relational import top10_orders

    plan = _plan(top10_orders(spark, SF))
    # only the two needed columns are read
    assert "ReadSchema" in plan
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "o_orderkey" in read and "o_totalprice" in read
    assert "o_custkey" not in read and "o_orderdate" not in read


def test_textstats_whole_stage_codegen(spark):
    from exam_pdf_parser_spark.operators.textstats import doc_token_stats

    plan = _plan(doc_token_stats(spark, SF))
    # JVM-side expressions only — no Python evaluation nodes
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "MapInPandas" not in plan
    # reads exactly the needed columns
    assert "struct<doc_id:bigint,text:string>" in plan.replace(" ", "")


def test_extraction_reads_only_url_and_html(spark):
    from exam_pdf_parser_spark.operators.extract import (
        DOCUMENTS_SCHEMA, extract,
    )

    docs = spark.createDataFrame([], DOCUMENTS_SCHEMA)
    plan = _plan(extract(docs))
    assert "Exchange" not in plan          # zero-shuffle core
    assert "MapInPandas" in plan


def test_simhash_pairs_banded_not_all_pairs(spark):
    # pigeonhole banding replaced the O(n²) theta join: candidates come
    # from a (chunk_idx, chunk_val) equi-join, never a nested loop
    from exam_pdf_parser_spark.operators.dedupe import simhash_near_pairs

    plan = _plan(simhash_near_pairs(spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_minhash_band_join_carries_ids_only(spark):
    # the band self-join must shuffle (doc_id, band_idx, band_key)
    # only — token sets join back onto the small candidate-pair set,
    # never ride through the band explode
    from exam_pdf_parser_spark.operators.dedupe import minhash_lsh_pairs

    plan = _plan(minhash_lsh_pairs(spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    for line in plan.splitlines():
        assert not ("band_idx" in line and "toks" in line), line


def test_ann_topk_broadcasts_queries(spark):
    from exam_pdf_parser_spark.operators.similarity import ann_topk_dot

    plan = _plan(ann_topk_dot(spark, SF))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_eval_single_shuffle_per_cogroup(spark):
    # evaluation co-locates by url: exactly the planned shuffles, no more
    from exam_pdf_parser_spark.operators.evaluation import evaluate_questions
    from exam_pdf_parser_spark.operators.parsed import (
        ANSWER_KEY_SCHEMA, PARSED_SCHEMA,
    )

    p = spark.createDataFrame([], PARSED_SCHEMA)
    k = spark.createDataFrame([], ANSWER_KEY_SCHEMA)
    plan = _plan(evaluate_questions(p, k))
    assert plan.count("Exchange hashpartitioning") == 2  # one per side
    assert "FlatMapCoGroupsInPandas" in plan


def test_time_partition_pruning(spark, tmp_path):
    """Iceberg-style time partitioning on the parquet substitute: a
    crawl-date predicate must prune at the PARTITION level (visible as
    PartitionFilters in the scan), not row-filter the full corpus."""
    from pyspark.sql import functions as F

    from exam_pdf_parser_spark.operators.extract import corpus_df

    docs = corpus_df(spark, 200, partitions=2).withColumn(
        "crawl_date", F.to_date("warc_ts"))
    path = str(tmp_path / "docs_by_date")
    docs.write.partitionBy("crawl_date").parquet(path)

    back = spark.read.parquet(path)
    dates = sorted(r["crawl_date"] for r in
                   back.select("crawl_date").distinct().collect())
    assert len(dates) >= 2          # the corpus spans multiple dates
    pick = dates[0]

    pruned = back.filter(F.col("crawl_date") == F.lit(pick))
    plan = _plan(pruned)
    seg = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "crawl_date" in seg       # predicate prunes partitions
    want = docs.filter(F.col("crawl_date") == F.lit(pick)).count()
    assert pruned.count() == want > 0
