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
    "minhash_lsh_pairs", "ann_topk_dot", "event_sessions",
    "shipping_priority", "x_extract_spans",
]


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
        out.append("```\n" + plan.strip()[:4000] + "\n```\n")
    with open("PLANS.md", "w") as f:
        f.write("\n".join(out))
    print("PLANS.md written")
    spark.stop()


if __name__ == "__main__":
    main()
