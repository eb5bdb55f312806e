"""Regenerate static golden files (oracle outputs, byte-stable JSON).

Run ONLY when extraction semantics intentionally change; tests compare
the live oracle against these to catch accidental drift.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exam_pdf_parser_spark.core.oracle import oracle_spans_and_text
from exam_pdf_parser_spark.core.assemble import extract_document
from exam_pdf_parser_spark.core.fields import parse_question_fields
from exam_pdf_parser_spark.corpus.generator import generate_rows
from exam_pdf_parser_spark.sources.report import dump_golden_json

N = 20
rows = generate_rows(N)
spans, extracted = oracle_spans_and_text(rows)
parsed = []
for r in rows:
    _, regions = extract_document(r["html"])
    for p in parse_question_fields(regions):
        parsed.append({"url": r["url"], **p})

os.makedirs("tests/goldens", exist_ok=True)
dump_golden_json(spans, "tests/goldens/spans_20.json")
dump_golden_json(extracted, "tests/goldens/extracted_20.json")
dump_golden_json(parsed, "tests/goldens/parsed_20.json")
print("goldens written:", len(spans), "spans,", len(extracted), "texts,", len(parsed), "parsed")
