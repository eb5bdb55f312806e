"""Determinism evidence at scale: the same input must produce a
bit-identical result set across reruns AND across parallelism levels
(order-insensitive content hash of every span row + extracted text).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def content_hash(spark, corpus_path: str) -> tuple[int, int]:
    from pyspark.sql import functions as F

    from exam_pdf_parser_spark.operators.extract import (
        extract, extracted_table, spans_table,
    )

    docs = spark.read.parquet(corpus_path)
    ext = extract(docs).persist()
    h_spans = (
        spans_table(ext)
        .select(F.xxhash64("url", "question_number", "page_idx", "x0", "y0",
                           "x1", "y1", "text_preview", "spans_page",
                           "group_range", "region_idx").alias("h"))
        .agg(F.expr("bit_xor(h)")).collect()[0][0]
    )
    h_text = (
        extracted_table(ext)
        .select(F.xxhash64("url", "extracted_text").alias("h"))
        .agg(F.expr("bit_xor(h)")).collect()[0][0]
    )
    ext.unpersist()
    return int(h_spans), int(h_text)


def main() -> None:
    from exam_pdf_parser_spark.session import get_spark

    corpus = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaling_corpus"
    results = {}
    for master, tag in (("local[8]", "local8_run1"),
                        ("local[8]", "local8_run2"),
                        ("local[32]", "local32")):
        spark = get_spark(f"determinism-{tag}", master=master)
        results[tag] = content_hash(spark, corpus)
        spark.stop()
        print(tag, results[tag])
    assert results["local8_run1"] == results["local8_run2"], "rerun drift!"
    assert results["local8_run1"] == results["local32"], "parallelism drift!"
    print("DETERMINISTIC: identical content hashes across reruns and "
          "parallelism levels")


if __name__ == "__main__":
    main()
