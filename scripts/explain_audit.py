"""Dump formatted physical plans for the headline queries → PLANS.md.

The audit trail for "is this the plan you'd want at 100 TB": pushed
filters, broadcasts, shuffle counts, Python-eval placement.
"""
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AUDIT = [
    "pricing_summary", "revenue_by_nation", "top_parts_by_brand",
    "events_carry_forward", "doc_quality", "exact_dup_assignment",
    "minhash_lsh_pairs", "simhash_near_pairs", "ann_topk_dot",
    "event_sessions", "shipping_priority", "entity_order_membership",
    "lang_curation_rollup", "x_extract_spans",
]

# 100 TB posture note per audited query (kept here so PLANS.md
# regeneration preserves the commentary)
NOTES = {
    "pricing_summary": "single hash agg, integer-cent sums, pushed scan.",
    "revenue_by_nation": "nation (fixed 25 rows) force-broadcast; "
        "customer join left to AQE — it grows with the fact side, a "
        "forced hint would OOM the build side at 100x.",
    "top_parts_by_brand": "partial agg before the exchange; per-brand "
        "top-k via window over the agg output, not the fact table.",
    "events_carry_forward": "one shuffle on user_id; IGNORE NULLS "
        "running last inside the window, no self-join.",
    "doc_quality": "zero exchanges — pure per-row JVM expressions, "
        "whole-stage codegen.",
    "exact_dup_assignment": "ONE shuffle on md5(text); canonical pick "
        "+ group size as windows over the same partition (vs "
        "groupBy+join-back = 2 extra exchanges).",
    "minhash_lsh_pairs": "band self-join carries (doc_id, band_idx, "
        "band_key) only; candidate pairs localCheckpoint'd once, then "
        "token sets aggregated ONLY for candidate docs (semi join) — "
        "no corpus-sized token shuffle anywhere; sigs agg crosses the "
        "wire as partial min-hashes. Exchange count is higher than the "
        "naive plan but every added exchange is candidate-sized, not "
        "corpus-sized. Round-4: band keys route through the "
        "block_grid_self_join hot-key guard (ids-only checkpoint + "
        "count + one defaultParallelism grid exchange) so a "
        "duplicate-heavy band bucket is task-bounded at ~cap^2 — "
        "A/B in BENCH_SCALING.md, straggler 40.5s->7.6s.",
    "simhash_near_pairs": "7-chunk pigeonhole banding: equi-join on "
        "(chunk_idx, chunk_val) generates every hamming<=6 pair; no "
        "BroadcastNestedLoopJoin/CartesianProduct (pytest-asserted). "
        "Round-4: the chunk join shares the block_grid_self_join "
        "hot-key guard (identical pair set, task-bounded hot chunks); "
        "the added exchanges are ids+simhash-sized, never corpus-sized.",
    "ann_topk_dot": "query side broadcast, corpus streams; per-query "
        "top-k window after the scored join.",
    "event_sessions": "applyInPandas over user_id partitions — one "
        "exchange, state bounded per user.",
    "shipping_priority": "mktsegment filter pushed to the customer "
        "scan; join strategy left to AQE.",
    "entity_order_membership": "four membership plans (anti/semi/"
        "HAVING/EXCEPT) unioned; each branch prunes to its key columns.",
    "lang_curation_rollup": "three-branch union: lang hash agg "
        "(rollup), curate's ONE md5(text) shuffle (dedup window + "
        "gates in the same partition), and budget_sample's range sort "
        "+ two-pass prefix sum (no per-group Window node — the fat "
        "language never lands in one task, measured in "
        "BENCH_SCALING.md).",
    "x_extract_spans": "zero exchanges — mapInPandas extraction core "
        "+ narrow explode (pytest-asserted).",
}


def main() -> None:
    import __spark_entry__ as e
    from exam_pdf_parser_spark.session import get_spark

    sf = "/root/testdata/sf0.001"
    spark = get_spark("explain-audit", master="local[4]", shuffle_partitions=4)
    q = e.queries()
    out = ["# Physical plans (explain formatted), sf0.001\n"]
    for name in AUDIT:
        df = q[name](spark, sf)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        n_exchange = plan.count("Exchange")
        out.append(f"## {name}  (Exchange nodes: {n_exchange})\n")
        if name in NOTES:
            out.append(f"_Scale posture_: {NOTES[name]}\n")
        out.append("```\n" + plan.strip()[:4000] + "\n```\n")
    with open("PLANS.md", "w") as f:
        f.write("\n".join(out))
    print("PLANS.md written")
    spark.stop()


if __name__ == "__main__":
    main()
