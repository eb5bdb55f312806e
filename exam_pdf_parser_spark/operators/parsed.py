"""Stage C as Spark operators: the ``parsed`` table (structured
question fields) and the ``answer_key`` table.

Both are single ``mapInPandas`` passes — no shuffle; cross-document
work stays relational downstream (validation/evaluation).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType, BooleanType, IntegerType, StringType, StructField, StructType,
)

from ..core.answerkey import parse_answer_md
from ..core.assemble import extract_document
from ..core.fields import parse_exam_title, parse_question_fields

CHOICE_STRUCT = ArrayType(StructType([
    StructField("number", IntegerType(), False),
    StructField("text", StringType(), False),
]))

VOCAB_STRUCT = ArrayType(StructType([
    StructField("word", StringType(), False),
    StructField("meaning", StringType(), False),
]))

PARSED_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("number", IntegerType(), False),
    StructField("question_text", StringType(), False),
    StructField("question_type", StringType(), False),
    StructField("passage", StringType(), True),
    StructField("choices", CHOICE_STRUCT, False),
    StructField("points", IntegerType(), False),
    StructField("group_range", StringType(), True),
    StructField("spans_page", BooleanType(), False),
    StructField("n_regions", IntegerType(), False),
    StructField("vocabulary_notes", VOCAB_STRUCT, False),
    StructField("has_image", BooleanType(), False),
    StructField("has_table", BooleanType(), False),
    StructField("image_description", StringType(), True),
    StructField("sub_questions", ArrayType(StringType()), False),
    StructField("exam_title", StringType(), True),
])

ANSWER_KEY_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("number", IntegerType(), False),
    StructField("question_text", StringType(), False),
    StructField("passage", StringType(), True),
    StructField("choices", CHOICE_STRUCT, False),
    StructField("points", IntegerType(), False),
])

_PARSED_COLS = [f.name for f in PARSED_SCHEMA.fields if f.name != "url"]


def parse_documents(documents: DataFrame,
                    min_q: int = 1, max_q: int = 50) -> DataFrame:
    """documents(url, html) → parsed question rows (FIXTURES.md §4).

    One decode+detect+field pass per row; corrupt payloads are skipped
    silently here (they surface via ``extract``'s quarantine)."""
    docs = documents.select("url", "html")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {c: [] for c in ["url", *_PARSED_COLS]}
            for url, html in zip(pdf["url"], pdf["html"]):
                try:
                    _, regions = extract_document(bytes(html), min_q, max_q)
                except Exception:
                    continue
                title = parse_exam_title(regions)
                for row in parse_question_fields(regions):
                    out["url"].append(url)
                    for c in _PARSED_COLS:
                        out[c].append(title if c == "exam_title"
                                      else row[c])
            if out["url"]:
                # empty frames infer float64 columns, which Arrow cannot
                # convert to list<struct> — emit nothing instead
                yield pd.DataFrame(out)

    return docs.mapInPandas(run, PARSED_SCHEMA)


def exam_info_table(parsed: DataFrame) -> DataFrame:
    """Per-url exam_info (A11 total_questions sync src/schema.py:109-113
    + F10 exam-type detection).

    exam_type mirrors the reference cascade src/validator.py:61-75
    exactly: title keywords 수능/대학수학능력 → 수능; 모의 → 모의고사;
    any written-response question OR workbook title keywords
    (final test / chapter test / 워크북 / 연습) → 워크북; else 기타."""
    from pyspark.sql import functions as F

    from ..core.fields import WRITTEN_TYPES

    agg = parsed.groupBy("url").agg(
        F.first("exam_title").alias("title"),
        F.count("*").alias("total_questions"),
        F.sum(F.when(F.col("question_type") == "듣기", 1).otherwise(0))
        .alias("n_listening"),
        F.sum(F.when(F.col("question_type").isin(*WRITTEN_TYPES), 1)
              .otherwise(0)).alias("n_written"),
        F.min("number").alias("first_number"),
        F.max("number").alias("last_number"),
        F.sum(F.when(F.col("points") == 3, 1).otherwise(0))
        .alias("n_three_point"),
    )
    t = F.lower(F.coalesce(F.col("title"), F.lit("")))
    workbook_kw = (t.contains("final test") | t.contains("chapter test")
                   | t.contains("워크북") | t.contains("연습"))
    exam_type = (
        F.when(t.contains("수능") | t.contains("대학수학능력"), "수능")
        .when(t.contains("모의"), "모의고사")
        .when((F.col("n_written") > 0) | workbook_kw, "워크북")
        .otherwise("기타")
    )
    return agg.withColumn("exam_type", exam_type)


def answer_key_table(corpus_with_md: DataFrame) -> DataFrame:
    """(url, answer_md) → exploded answer-key rows (S6)."""
    src = corpus_with_md.select("url", "answer_md")
    cols = [f.name for f in ANSWER_KEY_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {c: [] for c in cols}
            for url, md in zip(pdf["url"], pdf["answer_md"]):
                for e in parse_answer_md(md):
                    out["url"].append(url)
                    for c in cols[1:]:
                        out[c].append(e[c])
            if out["url"]:
                yield pd.DataFrame(out)

    return src.mapInPandas(run, ANSWER_KEY_SCHEMA)
