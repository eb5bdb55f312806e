"""Evaluation scoring (J1/J4 + A5-A7), shared verbatim by the oracle
and the Spark cogrouped-applyInPandas stage.

Parity: src/evaluator.py:263-380 —
  * SequenceMatcher similarity with the empty-string edge rules;
  * choice correct iff same-number choice similarity ≥ 0.5; no GT
    choices → full credit (src/evaluator.py:334-335);
  * not-found questions contribute 0.0 to every average
    (src/evaluator.py:315-328);
  * weights 0.30 coverage + 0.30 passage + 0.25 choices + 0.15 qtext,
    rounded like src/evaluator.py:370-379.
"""

from __future__ import annotations

from .textfuncs import similarity

WEIGHTS = (0.30, 0.30, 0.25, 0.15)


def choice_accuracy(pred_choices: list[dict], gt_choices: list[dict]) -> tuple[int, int]:
    """(correct, total_gt). Parity: src/evaluator.py:272-290."""
    if not gt_choices:
        return 0, 0
    pred_map = {c["number"]: c["text"] for c in pred_choices or []}
    correct = 0
    for c in gt_choices:
        if similarity(pred_map.get(c["number"], ""), c["text"]) >= 0.5:
            correct += 1
    return correct, len(gt_choices)


def eval_questions(parsed_rows: list[dict], key_rows: list[dict]) -> list[dict]:
    """Per-question eval rows for one url (GT side preserved, left
    outer by number — src/evaluator.py:302-328)."""
    pred_by_number = {p["number"]: p for p in parsed_rows}
    out: list[dict] = []
    for gt in sorted(key_rows, key=lambda e: e["number"]):
        number = gt["number"]
        pred = pred_by_number.get(number)
        if pred is None:
            out.append({
                "number": number, "found": False,
                "passage_sim": 0.0,
                "choices_correct": 0,
                "choices_total": len(gt["choices"] or []),
                "qtext_sim": 0.0,
            })
            continue
        correct, total = choice_accuracy(pred["choices"], gt["choices"])
        out.append({
            "number": number, "found": True,
            "passage_sim": similarity(pred["passage"] or "", gt["passage"] or ""),
            "choices_correct": correct,
            "choices_total": total,
            "qtext_sim": similarity(pred["question_text"], gt["question_text"]),
        })
    return out


def summarize(qevals: list[dict]) -> dict:
    """Per-url rollup. Parity: src/evaluator.py:355-379.

    Computed in fixed number order (the list is already sorted) so the
    float accumulation order is deterministic — this is why the rollup
    runs in Python on both sides instead of a Spark ``avg()`` whose
    partial-aggregation order varies run to run.
    """
    total_expected = len(qevals)
    total_found = sum(1 for q in qevals if q["found"])
    coverage = total_found / total_expected if total_expected else 0.0

    passage_sims, choice_accs, qt_sims = [], [], []
    for q in qevals:
        if not q["found"]:
            passage_sims.append(0.0)
            choice_accs.append(0.0)
            qt_sims.append(0.0)
            continue
        passage_sims.append(q["passage_sim"])
        choice_accs.append(
            q["choices_correct"] / q["choices_total"]
            if q["choices_total"] > 0 else 1.0)
        qt_sims.append(q["qtext_sim"])

    avg_p = sum(passage_sims) / len(passage_sims) if passage_sims else 0.0
    avg_c = sum(choice_accs) / len(choice_accs) if choice_accs else 0.0
    avg_q = sum(qt_sims) / len(qt_sims) if qt_sims else 0.0
    w = WEIGHTS
    overall = w[0] * coverage + w[1] * avg_p + w[2] * avg_c + w[3] * avg_q
    return {
        "total_expected": total_expected,
        "total_found": total_found,
        "coverage_pct": round(coverage * 100, 2),
        "avg_passage_sim": round(avg_p, 4),
        "avg_choice_acc": round(avg_c, 4),
        "avg_qtext_sim": round(avg_q, 4),
        "overall_score": round(overall, 4),
    }
