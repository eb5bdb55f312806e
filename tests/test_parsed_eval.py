"""Byte-identity + semantics for stage C (parsed), validation (V-rules)
and evaluation (scores) — Spark vs shared-code oracle.
"""

from __future__ import annotations

import math

import pytest

from exam_pdf_parser_spark.core.answerkey import parse_answer_md
from exam_pdf_parser_spark.core.assemble import extract_document
from exam_pdf_parser_spark.core.fields import parse_question_fields
from exam_pdf_parser_spark.core.scoring import eval_questions, summarize
from exam_pdf_parser_spark.corpus.generator import generate_rows
from exam_pdf_parser_spark.operators.evaluation import (
    evaluate_questions, score_urls,
)
from exam_pdf_parser_spark.operators.extract import corpus_df
from exam_pdf_parser_spark.operators.parsed import (
    answer_key_table, parse_documents,
)
from exam_pdf_parser_spark.operators.validation import validate, validity_rollup

N_DOCS = 30


@pytest.fixture(scope="module")
def corpus_rows():
    return generate_rows(N_DOCS)


@pytest.fixture(scope="module")
def spark_tables(spark):
    full = corpus_df(spark, N_DOCS, partitions=4, with_answer_key=True)
    full = full.persist()
    parsed = parse_documents(full).persist()
    key = answer_key_table(full).persist()
    yield {"full": full, "parsed": parsed, "key": key}
    full.unpersist()
    parsed.unpersist()
    key.unpersist()


def _oracle_parsed(corpus_rows):
    out = {}
    for r in corpus_rows:
        _, regions = extract_document(r["html"])
        out[r["url"]] = parse_question_fields(regions)
    return out


def test_parsed_table_matches_oracle(spark_tables, corpus_rows):
    gold = _oracle_parsed(corpus_rows)
    got: dict[str, dict[int, dict]] = {}
    for row in spark_tables["parsed"].collect():
        d = row.asDict(recursive=True)
        got.setdefault(d.pop("url"), {})[d["number"]] = d
    assert set(got) == set(gold)
    for url, rows in gold.items():
        assert len(got[url]) == len(rows)
        for want in rows:
            have = got[url][want["number"]]
            for k in ("question_text", "question_type", "passage", "points",
                      "group_range", "spans_page", "n_regions",
                      "vocabulary_notes", "has_image", "has_table",
                      "image_description", "sub_questions"):
                # exam_title checked separately (url-level)
                assert have[k] == want[k], (url, want["number"], k)
            assert have["choices"] == want["choices"], (url, want["number"])


def test_answer_key_matches_oracle(spark_tables, corpus_rows):
    for url, md in [(r["url"], r["answer_md"]) for r in corpus_rows[:10]]:
        want = parse_answer_md(md)
        have = sorted(
            (r.asDict(recursive=True)
             for r in spark_tables["key"].filter(f"url = '{url}'").collect()),
            key=lambda r: r["number"],
        )
        assert len(have) == len(want)
        for h, w in zip(have, want):
            assert h["number"] == w["number"]
            assert h["question_text"] == w["question_text"]
            assert h["passage"] == w["passage"]
            assert h["choices"] == w["choices"]
            assert h["points"] == w["points"]


def test_scores_byte_identical_to_oracle(spark_tables, corpus_rows):
    gold_parsed = _oracle_parsed(corpus_rows)
    want = {}
    for r in corpus_rows:
        key_rows = parse_answer_md(r["answer_md"])
        q = eval_questions(gold_parsed[r["url"]], key_rows)
        want[r["url"]] = summarize(q)

    qe = evaluate_questions(spark_tables["parsed"], spark_tables["key"])
    got = {r["url"]: r.asDict() for r in score_urls(qe).collect()}
    assert set(got) == set(want)
    for url, w in want.items():
        g = got[url]
        for k, v in w.items():
            # exact float equality — same code, same order, both sides
            assert g[k] == v, (url, k, g[k], v)
        assert not math.isnan(g["overall_score"])


def test_validation_issue_semantics(spark_tables):
    issues = validate(spark_tables["parsed"], spark_tables["key"]).persist()
    by_rule = {
        r["rule"]: r["n"]
        for r in issues.groupBy("rule").count()
        .withColumnRenamed("count", "n").collect()
    }
    # structural invariants of the corpus:
    # all questions have text, valid points, types set
    assert "V3" not in by_rule
    assert "V4" not in by_rule
    assert "V5" not in by_rule
    # positions 1-17 are listening by construction
    assert "V15b" not in by_rule
    # group ranges are well-formed ASCII-tilde
    assert "V16" not in by_rule
    # generator plants fire the taxonomy-dependent rules: V14
    # (passage-required type, passage omitted) and V6 (empty
    # sub-question entry on written items)
    assert by_rule.get("V14", 0) > 0
    assert by_rule.get("V6", 0) > 0
    # V22 fires ONLY for the planted degenerate (zero-area) figures;
    # ordinary figures carry a derived geometry description
    parsed = spark_tables["parsed"]
    n_fig = parsed.filter("has_image OR has_table").count()
    n_described = parsed.filter(
        "(has_image OR has_table) AND image_description IS NOT NULL"
    ).count()
    assert 0 < n_described < n_fig              # both branches exist
    assert by_rule.get("V22", 0) == n_fig - n_described
    rollup = validity_rollup(issues, spark_tables["parsed"])
    assert rollup.count() == N_DOCS
    # every url has the rollup columns populated
    row = rollup.first()
    assert row["errors"] >= 0 and row["warnings"] >= 0
    issues.unpersist()


def test_validation_catches_planted_defects(spark):
    # plant a defective parsed table and check each rule fires
    from exam_pdf_parser_spark.operators.parsed import PARSED_SCHEMA

    def q(number, text="질문 텍스트", qtype="독해", passage="p" * 30,
          choices=None, points=2, group_range=None, vocab=None,
          has_image=False, sub_questions=None, image_description=None):
        if choices is None:
            choices = [{"number": i, "text": f"choice {i}"}
                       for i in range(1, 6)]
        return ("u1", number, text, qtype, passage, choices, points,
                group_range, False, 1, vocab or [], has_image, False,
                image_description, sub_questions or [], "모의고사 제목")

    rows = [
        q(18),
        q(19, text=""),                                   # V3
        q(20, points=9),                                  # V4
        q(21, points=4),                                  # V4b
        q(22, choices=[{"number": 2, "text": "x"},
                       {"number": 3, "text": "x"}]),      # V10,V11,V21
        q(23, choices=[{"number": 1, "text": " "}]),      # V12 (+V10)
        q(24, choices=[]),                                # V13
        q(25, passage="short"),                           # V20
        q(26, text="질문 텍스트"),                        # V19 (dup of 18)
        q(27, group_range="41-42"),                       # V16
        q(41, group_range="41~43", passage=None),         # V17(42 43... ),V18
        q(30), q(30),                                     # V7
        q(31, vocab=[{"word": "x", "meaning": " "}]),     # V6b
        q(32, sub_questions=["ok", " "]),                 # V6
        q(33, has_image=True),                            # V22 fires
        q(34, qtype="주제/요지", passage=None),           # V14
        q(35, qtype="서술형", choices=[]),                # written: NOT V13
        q(36, has_image=True,
          image_description="image 340x120 p1"),          # V22 silent
        # V8: gap at 28-29 etc. exists by construction
    ]
    parsed = spark.createDataFrame(rows, PARSED_SCHEMA)
    issues = validate(parsed)
    got = {r["rule"] for r in issues.select("rule").distinct().collect()}
    for rule in ["V3", "V4", "V4b", "V6", "V6b", "V7", "V8", "V10", "V11",
                 "V12", "V13", "V14", "V16", "V17", "V18", "V19", "V20",
                 "V21", "V22"]:
        assert rule in got, rule
    # written-response types are exempt from V13 (src/validator.py:282)
    v13_nums = {r["question_number"]
                for r in issues.filter("rule = 'V13'").collect()}
    assert 24 in v13_nums and 35 not in v13_nums
    # V22 has BOTH branches: fires on the undescribed figure (33),
    # silent on the described one (36)
    v22_nums = {r["question_number"]
                for r in issues.filter("rule = 'V22'").collect()}
    assert 33 in v22_nums and 36 not in v22_nums


def test_validity_rollup_includes_zero_parsed_urls(spark):
    # a url that produced no parsed rows (V2) must appear as invalid
    from exam_pdf_parser_spark.operators.parsed import PARSED_SCHEMA

    parsed = spark.createDataFrame(
        [("u_ok", 1, "q", "듣기", None,
          [{"number": 1, "text": "a"}], 2, None, False, 1,
          [], False, False, None, [], "제목")],
        PARSED_SCHEMA)
    docs = spark.createDataFrame([("u_ok",), ("u_empty",)], "url string")
    issues = validate(parsed, documents=docs)
    rollup = {r["url"]: r for r in validity_rollup(issues, parsed).collect()}
    assert set(rollup) == {"u_ok", "u_empty"}
    assert not rollup["u_empty"]["is_valid"]


def test_plus_points_marker_parity(corpus_rows):
    """The bare '+3' layout marker (src/evaluator.py:134-145) must set
    points=3 on the parsed side, never leak into question_text or
    passage, and agree with the answer-key side for regular entries."""
    found = 0
    for r in corpus_rows:
        _, regions = extract_document(r["html"])
        key_points = {e["number"]: e["points"]
                      for e in parse_answer_md(r["answer_md"])}
        for q in parse_question_fields(regions):
            if q["points"] == 3 and "[3점]" not in q["question_text"]:
                found += 1
                assert "+3" not in q["question_text"]
                assert "+3" not in (q["passage"] or "")
                if not q["group_range"]:
                    assert key_points.get(q["number"]) == 3, q["number"]
    assert found > 0  # the generator plants the +3 dialect


def test_mid_prose_plus_survives_extraction():
    """Round-4 fix of the documented divergence: a legitimate
    mid-prose '+5' in passage prose survives byte-identically (the
    reference strips only line-final +N inside the passage,
    src/evaluator.py:134-145; our block-granular analogue strips only
    blocks that ARE the marker), while the standalone '+3' marker
    block still sets points=3 and never leaks into text."""
    import random

    from exam_pdf_parser_spark.core.detector import detect_regions
    from exam_pdf_parser_spark.core.fields import parse_question_fields
    from exam_pdf_parser_spark.corpus.generator import _PageFlow

    flow = _PageFlow(random.Random(7))
    flow.add_block("21.다음 글을 읽고 물음에 답하시오")
    flow.add_block(
        "The company profit rose +5 percent this quarter while costs fell")
    flow.add_block("+3", height=16.0)
    flow.add_block("① one ② two ③ three ④ four ⑤ five")
    rows = parse_question_fields(detect_regions(flow.pages))
    (q,) = [r for r in rows if r["number"] == 21]
    assert q["points"] == 3
    joined = (q["question_text"] or "") + " " + (q["passage"] or "")
    assert "+5" in joined      # mid-prose token survives verbatim
    assert "+3" not in joined  # the marker block never enters text

    # without the marker block, an in-text +5 is detected (value != 3)
    # but points stay 2 and the text is untouched
    flow2 = _PageFlow(random.Random(7))
    flow2.add_block("21.다음 글을 읽고 물음에 답하시오")
    flow2.add_block("Profit rose +5 percent overall")
    flow2.add_block("① one ② two ③ three ④ four ⑤ five")
    rows2 = parse_question_fields(detect_regions(flow2.pages))
    (q2,) = [r for r in rows2 if r["number"] == 21]
    assert q2["points"] == 2
    assert "+5" in (q2["question_text"] or "") + " " + (q2["passage"] or "")


def test_exam_title_matches_generator(spark_tables, corpus_rows):
    # parsed exam_title must equal the generator's planted banner
    got = {
        r["url"]: r["title"]
        for r in __import__(
            "exam_pdf_parser_spark.operators.parsed",
            fromlist=["exam_info_table"],
        ).exam_info_table(spark_tables["parsed"]).collect()
    }
    n_titled = n_untitled = 0
    for row in corpus_rows:
        want = row.get("exam_title")
        assert got[row["url"]] == want, row["url"]
        if want:
            n_titled += 1
        else:
            n_untitled += 1
    assert n_titled > 0 and n_untitled > 0  # both branches exercised

    # V1 fires exactly for the titleless urls
    issues = validate(spark_tables["parsed"])
    v1_urls = {r["url"] for r in issues.filter("rule = 'V1'").collect()}
    want_v1 = {r["url"] for r in corpus_rows if not r.get("exam_title")}
    assert v1_urls == want_v1


def test_x_oracle_validation_and_compare_parity(spark):
    """The plain-Python x_* oracle (core/oracle_x.py) and the Spark
    relational pipeline must produce identical issue/compare tables —
    the unit-scale pin of the XCHECK_X gate. The validation rules are
    REIMPLEMENTED in the oracle (not shared), so a wrong join/window
    on either side cannot self-confirm."""
    from exam_pdf_parser_spark.core.oracle_x import (
        x_compare_configs, x_validation_issues,
    )
    from exam_pdf_parser_spark.corpus.generator import generate_rows
    from exam_pdf_parser_spark.operators.compare import compare_runs
    from exam_pdf_parser_spark.operators.parsed import (
        answer_key_table, parse_documents,
    )

    rows = generate_rows(10)
    docs = spark.createDataFrame(
        [(r["url"], r["html"], r["answer_md"]) for r in rows],
        "url string, html binary, answer_md string").persist()

    got = sorted(
        (tuple(r) for r in validate(
            parse_documents(docs), answer_key_table(docs))
         .select("url", "level", "question_number", "rule", "message")
         .collect()), key=repr)    # None question_numbers sort by repr
    want = sorted(
        ((i["url"], i["level"], i["question_number"], i["rule"],
          i["message"]) for i in x_validation_issues(rows)), key=repr)
    assert got == want

    cmp_got = sorted(
        tuple(r) for r in compare_runs(
            parse_documents(docs, max_q=50), parse_documents(docs, max_q=20))
        .select("url", "number", "in_a", "in_b", "qtext_sim",
                "passage_sim", "points_delta", "choices_delta").collect())
    cmp_want = sorted(
        (c["url"], c["number"], c["in_a"], c["in_b"], c["qtext_sim"],
         c["passage_sim"], c["points_delta"], c["choices_delta"])
        for c in x_compare_configs(rows))
    docs.unpersist()
    assert cmp_got == cmp_want


def test_xoracle_artifacts_current():
    """Staleness pin for the committed DuckDB-gradable oracle tables
    (tests/goldens/xoracle_sf0.01): regenerating them from the LIVE
    generator + oracle must reproduce the committed parquet exactly.
    If this fails, the testdata or parse semantics changed — rerun
    scripts/make_xoracle_tables.py and commit (and say so)."""
    import os

    import pandas as pd

    from exam_pdf_parser_spark.core.oracle_x import build_xoracle_tables

    sf_dir = "/root/testdata/sf0.01"
    gold = os.path.join(os.path.dirname(__file__), "goldens",
                        "xoracle_sf0.01")
    live = build_xoracle_tables(sf_dir)
    assert sorted(live) == sorted(
        f[:-8] for f in os.listdir(gold) if f.endswith(".parquet"))
    for name, rows in live.items():
        committed = pd.read_parquet(os.path.join(gold, f"{name}.parquet"))
        regenerated = pd.DataFrame(rows)
        pd.testing.assert_frame_equal(regenerated, committed)
