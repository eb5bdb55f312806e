"""Unit tests for the shared text functions (SURVEY.md §2.7 F1-F3).

Expected values mirror the reference semantics (citations in
core/textfuncs.py docstrings).
"""

from exam_pdf_parser_spark.core.textfuncs import (
    block_text, detect_question_start, is_section_header, normalize_text,
    page_framed_text, similarity,
)


def test_normalize_collapses_unicode_ws():
    assert normalize_text("  a\t\nb　c  ") == "a b c"
    assert normalize_text("") == ""


def test_similarity_edges():
    assert similarity("", "") == 1.0
    assert similarity("a", "") == 0.0
    assert similarity("ABC", "abc") == 1.0
    assert 0.0 < similarity("kitten", "sitting") < 1.0


def test_qstart_patterns_priority():
    # group pattern wins and yields ASCII-tilde range
    assert detect_question_start("[41~42] long body") == (41, "41~42")
    assert detect_question_start("[41 ∼ 42] x") == (41, "41~42")
    assert detect_question_start("【18】 text") == (18, None)
    assert detect_question_start("[18] text") == (18, None)
    assert detect_question_start("18.다음") == (18, None)   # no space needed
    assert detect_question_start("18 다음") == (18, None)
    assert detect_question_start("없음") == (None, None)
    # out-of-range numbers fall through
    assert detect_question_start("99. text") == (None, None)
    assert detect_question_start("5. ok", min_q=1, max_q=50) == (5, None)


def test_section_header_vs_group_question():
    assert is_section_header("[31~34] 다음 글을 읽고")            # short → header
    assert is_section_header("[31~34]")
    assert not is_section_header("[41~42] " + "x" * 40)          # long → question
    assert not is_section_header("[18] text")                    # no tilde
    assert not is_section_header("그냥 텍스트")


def test_block_text_joins_spans():
    lines = [
        {"spans": [{"content": "a"}, {"content": ""}, {"content": "b"}]},
        {"spans": [{"content": "c"}]},
    ]
    assert block_text(lines) == "a b c"
    assert block_text([]) == ""


def test_page_framing():
    assert page_framed_text(["x", "y"]) == "--- Page 1 ---\nx\n\n--- Page 2 ---\ny"


def test_section_header_latex_sim_literal():
    # the reference also treats OCR'd LaTeX ranges as headers via the
    # literal '\\sim' check (src/cropper/detector.py:226)
    assert is_section_header(r"[31\sim34] 안내")
    assert not is_section_header(r"[31\sim34] " + "x" * 40)
