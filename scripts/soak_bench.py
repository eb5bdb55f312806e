"""End-to-end durable soak: extraction + bucketed parquet + atomic
manifest over a large corpus, then a resume no-op.

Exercises the full north-rule write path (``run_extraction``:
url-hash bucketing, dynamic partition overwrite, per-bucket metrics,
the round-4 atomic one-file-per-run manifest commit) and reports
honest end-to-end durable throughput — extraction AND parquet write
AND manifest — plus the resume cost when nothing is pending.

Usage: python scripts/soak_bench.py [n_docs] [n_buckets]
Prints one JSON line; results recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS_DIR = "/tmp/scaling_corpus"          # shared with scaling_bench
OUT_DIR = "/tmp/soak_out"


def main() -> None:
    from pyspark.sql import functions as F

    from exam_pdf_parser_spark.operators.extract import corpus_df
    from exam_pdf_parser_spark.session import get_spark
    from exam_pdf_parser_spark.sources.manifest import run_extraction

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    spark = get_spark("soak", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    marker = os.path.join(CORPUS_DIR, "_SOAK_N")
    if not (os.path.exists(marker)
            and open(marker).read() == str(n_docs)):
        corpus_df(spark, n_docs, partitions=128).write.mode(
            "overwrite").parquet(CORPUS_DIR)
        with open(marker, "w") as f:
            f.write(str(n_docs))
    docs = spark.read.parquet(CORPUS_DIR)

    shutil.rmtree(OUT_DIR, ignore_errors=True)
    t0 = time.perf_counter()
    s1 = run_extraction(spark, docs, OUT_DIR, "soak-r4",
                        n_buckets=n_buckets)
    wall = time.perf_counter() - t0

    t0 = time.perf_counter()
    s2 = run_extraction(spark, docs, OUT_DIR, "soak-r4-resume",
                        n_buckets=n_buckets)
    resume = time.perf_counter() - t0

    mdf = spark.read.parquet(f"{OUT_DIR}/manifest")
    agg = mdf.filter(F.col("run_id") == "soak-r4").agg(
        F.sum("rows_out").alias("rows"),
        F.sum("docs_in").alias("docs"),
        F.sum("errors").alias("errs"),
        F.min("docs_per_cpu_sec").alias("min_dps"),
        F.max("docs_per_cpu_sec").alias("max_dps"),
    ).first()

    # content hash of the durable output (url + text + error + spans,
    # order-insensitive): byte-identical reruns are provable from the
    # JSON lines alone instead of via a separate diff pass
    out_md5 = (
        spark.read.parquet(f"{OUT_DIR}/extracted")
        .select(F.md5(F.concat_ws(
            "\x00", "url",
            F.coalesce("extracted_text", F.lit("")),
            F.coalesce("error", F.lit("")),
            F.to_json("spans"))).alias("h"))
        .agg(F.md5(F.concat_ws(
            "", F.sort_array(F.collect_list("h")))).alias("H"))
        .first()["H"])

    # frozen-anchor host attribution (round-5 discipline): same-session
    # throughput on the byte-frozen r02 corpus, so a soak delta is
    # attributable to code vs host against BASELINE.md's anchor band
    import bench as _bench
    from exam_pdf_parser_spark.operators.extract import extract

    fz = _bench._frozen_corpus(spark, "/root/testdata/sf0.1") \
        .repartition(int(cpus) * 4).persist()
    n_frozen = fz.count()
    extract(fz).select(F.count("*")).collect()      # warm
    fruns = []
    for _ in range(2):
        t0 = time.perf_counter()
        extract(fz).select(F.count("*")).collect()
        fruns.append(time.perf_counter() - t0)
    fz.unpersist()
    anchor_dps = round(n_frozen / min(fruns), 1)

    print(json.dumps({
        "metric": "e2e-durable-soak",
        "n_docs": n_docs, "n_buckets": n_buckets, "cpus": int(cpus),
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(agg["docs"] / wall, 1),
        "span_rows": int(agg["rows"]), "errors": int(agg["errs"]),
        "buckets_processed": s1["buckets_processed"],
        "per_bucket_docs_per_cpu_sec": [round(agg["min_dps"], 1),
                                        round(agg["max_dps"], 1)],
        "resume_noop_sec": round(resume, 2),
        "resume_buckets_processed": s2["buckets_processed"],
        "output_md5": out_md5,
        "frozen_anchor_docs_per_sec": anchor_dps,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
