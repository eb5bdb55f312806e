"""§2.9 scalar UDFs agree exactly with the shared pure functions."""

from __future__ import annotations

from exam_pdf_parser_spark.core.textfuncs import (
    detect_question_start, is_section_header, normalize_text, similarity,
)
from exam_pdf_parser_spark.functions.udfs import (
    normalize_udf, qstart_udf, section_header_udf, seqmatch_ratio,
)

SAMPLES = [
    "  a\t\nb　c  ", "[41~42] long body text here", "【18】 text",
    "18.다음", "99. out of range", "[31~34]", "그냥 텍스트", "",
]


def test_udfs_match_pure_functions(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], "s string")
    rows = df.select(
        "s",
        normalize_udf("s").alias("norm"),
        qstart_udf("s").alias("qs"),
        section_header_udf("s").alias("hdr"),
        seqmatch_ratio("s", "s").alias("self_sim"),
    ).collect()
    for r in rows:
        assert r["norm"] == normalize_text(r["s"])
        num, grp = detect_question_start(r["s"])
        assert (r["qs"]["q_num"], r["qs"]["group_range"]) == (num, grp)
        assert r["hdr"] == is_section_header(r["s"])
        assert r["self_sim"] == similarity(r["s"], r["s"])
