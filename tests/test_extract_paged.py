"""Paged (giant-doc skew) path: byte-identical to the whole-doc path,
with the expected single url shuffle."""

from __future__ import annotations

import pytest

from exam_pdf_parser_spark.operators.extract import corpus_df, extract
from exam_pdf_parser_spark.operators.extract_paged import (
    extract_paged, paged_corpus_df,
)

N_DOCS = 25


@pytest.fixture(scope="module")
def tables(spark):
    docs = corpus_df(spark, N_DOCS, partitions=3).persist()
    paged = paged_corpus_df(spark, N_DOCS, partitions=3).persist()
    yield docs, paged
    docs.unpersist()
    paged.unpersist()


def test_paged_equals_whole_doc_byte_for_byte(spark, tables):
    docs, paged = tables
    whole = {r["url"]: r for r in extract(docs).collect()}
    by_page = {r["url"]: r for r in extract_paged(paged).collect()}
    assert set(whole) == set(by_page)
    for url, w in whole.items():
        p = by_page[url]
        assert p["extracted_text"] == w["extracted_text"], url
        assert [s.asDict() for s in p["spans"]] == \
               [s.asDict() for s in w["spans"]], url
        assert p["status"] == w["status"] == "ok"


def test_paged_plan_has_single_url_shuffle(spark, tables):
    _, paged = tables
    plan = extract_paged(paged)._jdf.queryExecution(
    ).executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "FlatMapGroupsInPandas" in plan


def test_page_rows_outnumber_docs(spark, tables):
    docs, paged = tables
    # the paged table really is page-granular (parallelism units)
    assert paged.count() > docs.count() * 5
