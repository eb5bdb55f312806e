"""Stage C: structured field extraction from detected regions
(SURVEY.md §2.7 F1-F9), shared verbatim by oracle and Spark UDFs.

The reference obtains structured fields from an LLM
(src/models/llm_backend.py:50-87); the north rule replaces that with a
deterministic rule-based parser.  Field semantics below are the
deterministic re-expression, reusing the reference's own parsing
conventions where it has them:

  * circled-digit choices ①-⑩   src/evaluator.py:45-48,72-93
  * [3점] / +N point markers     src/evaluator.py:134-145
  * whitespace normalization     src/evaluator.py:97-99
  * question-start patterns      src/cropper/detector.py:20-26
  * listening = positions 1-17   src/validator.py:318,342-356
"""

from __future__ import annotations

import re

from .detector import Region
from .textfuncs import CIRCLE_DIGITS, QNUM_PATTERNS, normalize_text

LISTENING_MAX = 17
TYPE_LISTENING = "듣기"
TYPE_OTHER = "기타"

# Deterministic QuestionType taxonomy (reference enum
# src/schema.py:20-45; the reference fills it via LLM, the north rule
# replaces that with a keyword cascade over the parsed question stem).
# Ordered — FIRST matching keyword wins, so classification is a pure
# function of (number, question_text).
QUESTION_TYPE_RULES: list[tuple[str, str]] = [
    ("서술", "서술형"),
    ("오류를 수정", "오류수정"),
    ("배열하시오", "배열"),
    ("문장으로 바꾸", "문장전환"),
    ("심경", "심경변화"),
    ("분위기", "심경변화"),
    ("목적", "목적"),
    ("주장", "주장"),
    ("함의", "함의"),
    ("요약", "요약"),
    ("빈칸", "빈칸"),
    ("순서", "순서"),
    ("들어가기에", "삽입"),
    ("무관한", "무관한문장"),
    ("가리키는", "지칭"),
    ("도표", "도표"),
    ("일치", "내용일치"),
    ("제목", "제목"),
    ("주제", "주제/요지"),
    ("요지", "주제/요지"),
    ("어법", "문법"),
    ("낱말", "어휘"),
    ("어휘", "어휘"),
]

# validator parity sets (src/validator.py:32-55)
WRITTEN_TYPES = {"서술형", "오류수정", "배열", "문장전환"}
PASSAGE_TYPES = {
    "주제/요지", "제목", "심경변화", "목적", "주장", "함의", "빈칸",
    "순서", "삽입", "요약", "무관한문장", "지칭", "내용일치", "장문",
}


def classify_question_type(number: int, question_text: str) -> str:
    """Deterministic type: positions 1-17 are listening
    (src/validator.py:318); otherwise the first keyword rule that
    matches the question stem; else 기타."""
    if number <= LISTENING_MAX:
        return TYPE_LISTENING
    for keyword, qtype in QUESTION_TYPE_RULES:
        if keyword in question_text:
            return qtype
    return TYPE_OTHER

_CIRCLE_ALT = "|".join(sorted(CIRCLE_DIGITS))
_CIRCLE_SPLIT_RE = re.compile(f"(?=(?:{_CIRCLE_ALT}))")


def strip_question_marker(text: str) -> str:
    """Remove the leading question-number marker that opened the region
    (the same ordered-pattern cascade that detected it)."""
    text = text.strip()
    for pattern in QNUM_PATTERNS:
        m = pattern.match(text)
        if m:
            return text[m.end():]
    return text


def parse_choices(text: str) -> list[dict]:
    """Split circled-digit choices out of region text.

    Returns ``[{"number": int, "text": str}, ...]`` sorted by number,
    first occurrence wins (dedup rule of src/evaluator.py:79-81).
    Also returns the residue (text before the first circle) via
    :func:`split_choices`.
    """
    choices: list[dict] = []
    seen: set[int] = set()
    parts = _CIRCLE_SPLIT_RE.split(text)
    for part in parts:
        if not part:
            continue
        circle = part[0]
        num = CIRCLE_DIGITS.get(circle)
        if num is None:
            continue
        body = normalize_text(part[1:])
        if num not in seen:
            choices.append({"number": num, "text": body})
            seen.add(num)
    choices.sort(key=lambda c: c["number"])
    return choices


def split_choices(text: str) -> tuple[str, list[dict]]:
    """(text-before-first-circle, parsed choices)."""
    m = re.search(_CIRCLE_ALT, text)
    if not m:
        return text, []
    return text[: m.start()], parse_choices(text[m.start():])


def parse_question_fields(regions: list[Region]) -> list[dict]:
    """Per-document ``parsed`` rows from the final region list.

    Cross-page questions merge their regions' text in region_idx
    order.  Continuation regions contribute their text to the body.
    Output row shape = FIXTURES.md §4 (minus exam_info, which has no
    deterministic source in the layout).
    """
    ordered = sorted(regions, key=lambda r: r.region_idx)
    # text chunks per question, in emission order; a region's pre_text
    # (pool blocks swallowed by the generous-crop bbox) belongs to the
    # PREVIOUS question in reading order — reattribute it there.  The
    # very first region's pre_text is the document banner (exam title),
    # not question content — it feeds exam_info (A11/V1), see
    # :func:`parse_exam_title`.
    chunks: dict[int, list[str]] = {}
    plus_by_num: dict[int, list[int]] = {}
    prev_num: int | None = None
    for r in ordered:
        if r.pre_text and prev_num is not None:
            chunks.setdefault(prev_num, []).append(r.pre_text)
        if r.pre_plus and prev_num is not None:
            plus_by_num.setdefault(prev_num, []).extend(r.pre_plus)
        if r.full_text:
            chunks.setdefault(r.question_number, []).append(r.full_text)
        if r.plus_markers:
            plus_by_num.setdefault(
                r.question_number, []).extend(r.plus_markers)
        prev_num = r.question_number

    by_num: dict[int, list[Region]] = {}
    for r in regions:
        by_num.setdefault(r.question_number, []).append(r)

    rows: list[dict] = []
    for num in sorted(by_num):
        group = sorted(by_num[num], key=lambda r: r.region_idx)
        full = " ".join(chunks.get(num, []))
        body, choices = split_choices(strip_question_marker(full))
        body, vocab = split_vocabulary(body)
        # question text = first sentence-ish run: up to the first
        # passage block; deterministic contract: the normalized body is
        # split nowhere — question_text is the whole pre-choice body for
        # listening, else its first segment before the passage.  We keep
        # the simple, reproducible rule: everything before the choices
        # normalized, passage = None for listening positions.
        body_norm = normalize_text(body)
        # +N point marker (parity src/evaluator.py:134-145): standalone
        # marker BLOCKS are captured at layout-scan time into
        # Region.plus_markers and never enter the region text — the
        # block-granular analogue of the reference's line-final +N
        # strip — so a legitimate mid-prose "+N" in passage prose
        # survives byte-identically.  Detection honors the marker
        # block first, else the first in-text \+(\d+) (the reference
        # searches the raw block; only the value 3 is honored — [3점]
        # in the stem is the canonical form).  Tie-break divergence
        # (marker block AND a different-valued in-text +N in one
        # question) is theoretical: the corpus plants at most one.
        qplus = plus_by_num.get(num, [])
        if qplus:
            plus_val: int | None = qplus[0]
        else:
            plus = _PLUS_POINTS_RE.search(body_norm)
            plus_val = int(plus.group(1)) if plus else None
        plus_three = plus_val == 3
        # sub-question markers are parsed only on choice-less bodies
        # (written/workbook items, the only place the reference's
        # sub_questions field applies — src/schema.py:86); a "(1)"
        # enumeration inside a reading passage stays passage text
        if choices:
            subs: list[str] = []
        else:
            body_norm, subs = split_sub_questions(body_norm)
        listening = num <= LISTENING_MAX
        if listening:
            question_text, passage = body_norm, None
        else:
            question_text, passage = _split_question_passage(body_norm)
        points = 3 if ("[3점]" in question_text or plus_three) else 2
        rows.append({
            "number": num,
            "question_text": question_text,
            "question_type": classify_question_type(num, question_text),
            "passage": passage,
            "choices": choices,
            "points": points,
            "group_range": next(
                (r.group_range for r in group if r.group_range), None),
            "spans_page": any(r.spans_page for r in group),
            "n_regions": len(group),
            "vocabulary_notes": vocab,
            "has_image": any(r.has_image for r in group),
            "has_table": any(r.has_table for r in group),
            "image_description": describe_figures(group),
            "sub_questions": subs,
        })

    # F9 group-passage propagation (src/evaluator.py:230-255): members
    # of a [a~b] group with no own passage inherit the group-first's.
    by_number = {r["number"]: r for r in rows}
    for row in rows:
        gr = row["group_range"]
        if not gr:
            continue
        m = re.match(r"^(\d+)~(\d+)$", gr)
        if not m or int(m.group(1)) != row["number"]:
            continue
        for member in range(int(m.group(1)) + 1, int(m.group(2)) + 1):
            mrow = by_number.get(member)
            if mrow is not None and mrow["passage"] is None:
                mrow["passage"] = row["passage"]
    return rows


def describe_figures(group: list[Region]) -> str | None:
    """Deterministic ``image_description`` (reference field
    src/schema.py:87-88, filled there by an LLM; consumed by V22
    src/validator.py:478-498): canonical ``kind WxH pN`` per figure
    block, region_idx order, joined with ``'; '``.

    Zero-area figure blocks are known-present (has_image/has_table
    still set) but carry no describable geometry → they contribute
    nothing, so a question whose only figures are degenerate keeps a
    NULL description and V22 fires — the deterministic analogue of
    "the describer failed on this figure"."""
    descs = [
        f"{kind} {w}x{h} p{page}"
        for r in sorted(group, key=lambda r: r.region_idx)
        for (kind, page, w, h) in r.figures
        if w > 0 and h > 0
    ]
    return "; ".join(descs) or None


def parse_exam_title(regions: list[Region]) -> str | None:
    """exam_info.title source: the pre-question banner above Q1 (the
    first region's pool text; reference field src/schema.py:92, checked
    by V1 src/validator.py:131-135)."""
    ordered = sorted(regions, key=lambda r: r.region_idx)
    if ordered and ordered[0].pre_text:
        return normalize_text(ordered[0].pre_text) or None
    return None


_PLUS_POINTS_RE = re.compile(r"\+(\d+)")            # detection (ref parity)
_SUB_Q_RE = re.compile(r"\((\d+)\)\s*")


def split_sub_questions(body: str) -> tuple[str, list[str]]:
    """Extract ``(1) …`` ``(2) …`` sub-question prompts from the body
    (reference field sub_questions src/schema.py:86, for grouped /
    workbook items).  Each segment runs to the next ``(n)`` marker or
    end of body; the prefix before the first marker stays the question
    body.  An empty segment (marker with no prompt) is preserved — V6
    flags it (src/validator.py:179-189)."""
    matches = list(_SUB_Q_RE.finditer(body))
    if not matches:
        return body, []
    subs = []
    for i, m in enumerate(matches):
        end = matches[i + 1].start() if i + 1 < len(matches) else len(body)
        subs.append(body[m.end():end].strip())
    return body[: matches[0].start()].strip(), subs


_VOCAB_RE = re.compile(r"\*([A-Za-z]+) : ")


def split_vocabulary(body: str) -> tuple[str, list[dict]]:
    """Extract ``*word : meaning`` vocabulary notes from the body
    (reference: vocabulary_notes src/schema.py:80-82; the corpus plants
    them as standalone ``*word : meaning`` blocks).  Meaning runs until
    the next ``*`` marker or end of body."""
    matches = list(_VOCAB_RE.finditer(body))
    if not matches:
        return body, []
    notes = []
    for i, m in enumerate(matches):
        end = matches[i + 1].start() if i + 1 < len(matches) else len(body)
        notes.append({
            "word": m.group(1),
            "meaning": body[m.end():end].strip(),
        })
    return body[: matches[0].start()].strip(), notes


def _split_question_passage(body: str) -> tuple[str, str | None]:
    """Split a reading question's pre-choice body into (stem, passage).

    Deterministic rule: the stem is the leading run of tokens that
    contain non-ASCII characters (Korean instruction text); the
    passage starts at the first all-ASCII token (the English prose
    block).  No ASCII token → whole body is the stem.
    """
    tokens = body.split(" ")
    cut = len(tokens)
    for i, tok in enumerate(tokens):
        if tok and all(ord(ch) < 128 for ch in tok):
            cut = i
            break
    stem = " ".join(tokens[:cut]).strip()
    passage = " ".join(tokens[cut:]).strip() or None
    return stem, passage
