"""End-to-end pipeline composition + extractor-plugin registry
(§2.9 extension points: the reference's OCR-engine registry
src/ocr/__init__.py:9-24 becomes a dict of DataFrame→DataFrame
stage functions).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from ..operators.extract import extract, extracted_table, spans_table
from ..operators.htmlstrip import strip_html_documents
from ..operators.parsed import answer_key_table, exam_info_table, parse_documents
from ..operators.validation import validate, validity_rollup

# extractor plugins: name → (documents → (url, extracted_text)).
# Uniform output contract so engines are interchangeable; register new
# engines exactly like the reference registers OCR engines
# (src/ocr/__init__.py:19-24).  'layout' consumes XLAY1 payloads,
# 'htmlstrip' consumes real HTML bytes — pick per source corpus.
EXTRACTORS: dict[str, Callable[[DataFrame], DataFrame]] = {
    "layout": lambda docs: extracted_table(extract(docs)),
    "htmlstrip": lambda docs: strip_html_documents(docs).withColumnRenamed(
        "main_content", "extracted_text"),
}


def get_extractor(name: str) -> Callable[[DataFrame], DataFrame]:
    if name not in EXTRACTORS:
        raise KeyError(
            f"unknown extractor {name!r}; available: {sorted(EXTRACTORS)}")
    return EXTRACTORS[name]


def full_pipeline(documents: DataFrame,
                  answer_key_src: DataFrame | None = None) -> dict:
    """All derived tables from one documents DataFrame.  Lazy — callers
    pick which outputs to materialize (each is its own Catalyst plan;
    persist ``documents`` upstream if materializing several)."""
    ext = extract(documents)
    parsed = parse_documents(documents)
    out = {
        "extracted": extracted_table(ext),
        "spans": spans_table(ext),
        "parsed": parsed,
        "exam_info": exam_info_table(parsed),
    }
    key = answer_key_table(answer_key_src) if answer_key_src is not None else None
    out["issues"] = validate(parsed, key, documents=documents)
    out["validity"] = validity_rollup(out["issues"], parsed)
    if key is not None:
        from ..operators.evaluation import evaluate_questions, score_urls

        out["answer_key"] = key
        out["qevals"] = evaluate_questions(parsed, key)
        out["scores"] = score_urls(out["qevals"])
    return out
