"""Real-PDF ingestion: the stdlib PDF reader/writer (core/pdf.py) and
its dispatch through decode_payload — text byte-parity with the native
layout path, figure preservation, question-field parity, Spark
end-to-end, and real-world PDF smoke."""

from __future__ import annotations

import copy

import pytest

from exam_pdf_parser_spark.core.assemble import (
    annotate_block_texts, assemble_text, decode_payload,
)
from exam_pdf_parser_spark.core.pdf import build_pdf, parse_pdf_pages
from exam_pdf_parser_spark.corpus.generator import build_document

N_DOCS = 12


def _native_pages(i: int) -> list[dict]:
    return decode_payload(build_document(i)["html"])["pages"]


def test_pdf_roundtrip_text_byte_identical():
    """PDF-rendered corpus docs extract to BYTE-IDENTICAL text."""
    for i in range(N_DOCS):
        pages = _native_pages(i)
        p1 = copy.deepcopy(pages)
        annotate_block_texts(p1)
        p2 = parse_pdf_pages(build_pdf(pages))
        annotate_block_texts(p2)
        assert assemble_text(p1) == assemble_text(p2), i


def test_pdf_roundtrip_preserves_figures():
    """Image/table blocks survive as XObjects with exact geometry —
    including zero-area degenerate figures (the V22 plant)."""
    found_kinds = set()
    zero_area = 0
    for i in range(40):
        pages = _native_pages(i)
        src = [(p["page_idx"], b["type"], tuple(round(v, 1) for v in b["bbox"]))
               for p in pages for b in p["blocks"]
               if b.get("type") in ("image", "table")]
        if not src:
            continue
        back = parse_pdf_pages(build_pdf(pages))
        dst = [(p["page_idx"], b["type"], tuple(round(v, 1) for v in b["bbox"]))
               for p in back for b in p["blocks"]
               if b.get("type") in ("image", "table")]
        assert src == dst, i
        found_kinds |= {t for _p, t, _b in src}
        zero_area += sum(1 for _p, _t, b in src if b[1] == b[3])
    assert found_kinds == {"image", "table"}
    assert zero_area > 0            # degenerate plants round-trip too


def test_pdf_roundtrip_question_fields():
    """parse_question_fields over PDF-ingested layout matches the
    native path on every text-derived field (bbox-derived span
    geometry may differ — zero-text layout blocks are invisible in a
    real PDF, exactly as they would be on paper)."""
    from exam_pdf_parser_spark.core.detector import detect_regions
    from exam_pdf_parser_spark.core.fields import parse_question_fields

    checked = 0
    for i in range(N_DOCS):
        pages = _native_pages(i)
        p1 = copy.deepcopy(pages)
        annotate_block_texts(p1)
        native = {q["number"]: q for q in
                  parse_question_fields(detect_regions(p1))}
        p2 = parse_pdf_pages(build_pdf(pages))
        annotate_block_texts(p2)
        via_pdf = {q["number"]: q for q in
                   parse_question_fields(detect_regions(p2))}
        assert set(native) == set(via_pdf), i
        for n, q in native.items():
            g = via_pdf[n]
            for k in ("question_text", "passage", "choices", "points",
                      "question_type", "group_range", "sub_questions",
                      "vocabulary_notes", "has_image", "has_table"):
                assert g[k] == q[k], (i, n, k)
            checked += 1
    assert checked > 100


def test_pdf_extract_spark_end_to_end(spark):
    """extract() ingests raw PDF bytes through the same mapInPandas
    stage: PDF corpus output text == native corpus output text, and a
    garbage %PDF payload quarantines instead of failing the job."""
    from exam_pdf_parser_spark.operators.extract import extract

    rows_native, rows_pdf = [], []
    for i in range(8):
        d = build_document(i)
        pages = decode_payload(d["html"])["pages"]
        rows_native.append((d["url"], d["html"]))
        rows_pdf.append((d["url"], build_pdf(pages)))
    rows_pdf.append(("https://bad.example/pdf", b"%PDF-1.4 garbage"))

    native = {r["url"]: r["extracted_text"] for r in extract(
        spark.createDataFrame(rows_native, "url string, html binary")
    ).collect()}
    got = {r["url"]: r for r in extract(
        spark.createDataFrame(rows_pdf, "url string, html binary")
    ).collect()}

    for url, text in native.items():
        assert got[url]["status"] == "ok"
        assert got[url]["extracted_text"] == text, url
    assert got["https://bad.example/pdf"]["status"] == "error"


def test_pdf_real_world_files():
    """Foreign PDFs (TeX/docbook toolchains) parse: readable,
    word-segmented text, plausible page structure."""
    import os

    candidates = [
        "/usr/share/doc/libtasn1-doc/libtasn1.pdf",
        "/usr/share/doc/shared-mime-info/shared-mime-info-spec.pdf",
    ]
    files = [f for f in candidates if os.path.exists(f)]
    if not files:
        pytest.skip("no system PDFs on this machine")
    for f in files:
        pages = parse_pdf_pages(open(f, "rb").read())
        assert len(pages) > 1
        text = " ".join(sp["content"] for p in pages for b in p["blocks"]
                        for ln in b["lines"] for sp in ln["spans"])
        assert len(text) > 1000
        # word segmentation worked (kerned gaps became spaces)
        words = text.split(" ")
        assert sum(1 for w in words if 2 <= len(w) <= 12) > len(words) * 0.5


def test_pdf_rejects_unsupported_loudly():
    with pytest.raises(ValueError):
        parse_pdf_pages(b"not a pdf at all")
    with pytest.raises(Exception):
        parse_pdf_pages(b"%PDF-1.4\njunk without any objects")


def test_pdf_multispan_lines_and_tounicode_ranges():
    """Review regressions: a multi-span line needs no space char
    elsewhere in the document (glyph table is built from the rendered
    strings), and bfrange destinations with surrogate pairs parse
    without raising."""
    from exam_pdf_parser_spark.core.pdf import _parse_tounicode

    pages = [{"page_idx": 0, "page_size": [842, 1191], "blocks": [
        {"type": "text", "bbox": [50, 60, 400, 90],
         "lines": [{"spans": [{"content": "abc"}, {"content": "def"}]}]}]}]
    back = parse_pdf_pages(build_pdf(pages))
    assert back[0]["blocks"][0]["lines"][0]["spans"][0]["content"] \
        == "abc def"

    cmap = (b"1 beginbfrange <0001> <0003> <D835DC00> endbfrange\n"
            b"1 beginbfchar <0010> <D835DC00> endbfchar")
    m = _parse_tounicode(cmap)
    assert m[0x10] == "\U0001d400"         # bfchar surrogate pair OK
    assert m[1] == "𝐀" or len(m[1]) == 2  # range: last unit
    # incremented without chr() overflow
    assert 2 in m and 3 in m


def test_pdf_scan_ignores_obj_patterns_inside_streams():
    """A stream body containing bytes that look like 'N 0 obj' must
    not shadow the real object N."""
    import zlib

    from exam_pdf_parser_spark.core.pdf import PdfDocument

    pages = [{"page_idx": 0, "page_size": [842, 1191], "blocks": [
        {"type": "text", "bbox": [50, 60, 400, 90],
         "lines": [{"spans": [{"content": "hello world sample"}]}]}]}]
    pdf = bytearray(build_pdf(pages))
    # append an incremental-update style stream whose BODY embeds a
    # fake redefinition of object 1
    fake = b"1 0 obj\n<< /Type /Catalog >>\nendobj\n"
    body = fake + b"\x00" * 16
    extra = (b"99 0 obj\n<< /Length " + str(len(body)).encode()
             + b" >>\nstream\n" + body + b"\nendstream\nendobj\n")
    pdf = pdf.replace(b"xref\n", extra + b"xref\n", 1)
    doc = PdfDocument(bytes(pdf))
    # object 1 must still be the real ToUnicode stream, not the fake
    assert not (isinstance(doc.objs.get(1), dict)
                and doc.objs[1].get("Type") == "Catalog")
    assert parse_pdf_pages(bytes(pdf))      # still parses end-to-end


def test_pdf_parser_never_hangs_on_fuzz():
    """Deterministic byte fuzz: mutated/truncated PDFs either parse or
    raise — bounded time, no hangs, no non-ValueError crashes leaking
    through decode_payload's quarantine contract."""
    import random

    base = build_pdf(_native_pages(0))
    rng = random.Random(7)
    for trial in range(30):
        blob = bytearray(base)
        for _ in range(rng.randint(1, 40)):
            blob[rng.randrange(len(blob))] = rng.randrange(256)
        if rng.random() < 0.3:
            blob = blob[:rng.randrange(16, len(blob))]
        try:
            parse_pdf_pages(bytes(blob))
        except Exception:
            pass                      # any exception quarantines upstream
