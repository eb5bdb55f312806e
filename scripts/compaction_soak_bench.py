"""Auto-compaction under soak load (round-7 verdict ask #5).

The 240k one-shot soak never fires ``compact_after`` (a single run
commits a single manifest file); the trigger was only unit-tested.
This soak drives the accretion mode the retention policy exists for —
a long-lived pipeline processing the corpus as SLICE RUNS
(``run_extraction(buckets=...)``, one manifest commit per slice) with
``compact_after`` forced low, so compaction fires repeatedly
MID-PIPELINE while later slices keep writing buckets — then asserts

  * the sliced+compacted output is byte-identical (order-insensitive
    md5) to a same-session one-shot run of the same corpus;
  * a final unrestricted resume is a clean no-op over the compacted
    manifest;
  * every compaction event is reported (files_before → files_after).

Usage: python scripts/compaction_soak_bench.py [n_docs] [n_slices]
                                               [compact_after]
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
OUT_ONESHOT = "/tmp/compact_soak_oneshot"
OUT_SLICED = "/tmp/compact_soak_sliced"
N_BUCKETS = 64


def _output_md5(spark, out_dir: str) -> str:
    """Same content hash as soak_bench.py: url + text + error + spans,
    order-insensitive."""
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(f"{out_dir}/extracted")
        .select(F.md5(F.concat_ws(
            "\x00", "url",
            F.coalesce("extracted_text", F.lit("")),
            F.coalesce("error", F.lit("")),
            F.to_json("spans"))).alias("h"))
        .agg(F.md5(F.concat_ws(
            "", F.sort_array(F.collect_list("h")))).alias("H"))
        .first()["H"])


def main() -> None:
    from exam_pdf_parser_spark.operators.extract import corpus_df
    from exam_pdf_parser_spark.session import get_spark
    from exam_pdf_parser_spark.sources.manifest import run_extraction

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 240_000
    n_slices = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    compact_after = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    spark = get_spark("compact-soak", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    marker = os.path.join(CORPUS_DIR, "_SOAK_N")
    if not (os.path.exists(marker)
            and open(marker).read() == str(n_docs)):
        corpus_df(spark, n_docs, partitions=128).write.mode(
            "overwrite").parquet(CORPUS_DIR)
        with open(marker, "w") as f:
            f.write(str(n_docs))
    docs = spark.read.parquet(CORPUS_DIR)

    # --- reference: one-shot run, same session -------------------------------
    shutil.rmtree(OUT_ONESHOT, ignore_errors=True)
    t0 = time.perf_counter()
    run_extraction(spark, docs, OUT_ONESHOT, "oneshot",
                   n_buckets=N_BUCKETS)
    oneshot_wall = time.perf_counter() - t0
    oneshot_md5 = _output_md5(spark, OUT_ONESHOT)

    # --- sliced pipeline with compaction firing mid-run ----------------------
    shutil.rmtree(OUT_SLICED, ignore_errors=True)
    per = N_BUCKETS // n_slices
    mdir = os.path.join(OUT_SLICED, "manifest")

    def visible_files() -> int:
        try:
            return sum(1 for f in os.listdir(mdir)
                       if f.endswith(".parquet") and not f.startswith("."))
        except FileNotFoundError:
            return 0

    events: list[dict] = []
    t0 = time.perf_counter()
    for i in range(n_slices):
        before = visible_files()
        # last slice absorbs the remainder so a non-divisor n_slices
        # still covers every bucket (otherwise the tail stays pending
        # and the "clean no-op resume" assert below fires spuriously)
        hi = N_BUCKETS if i == n_slices - 1 else (i + 1) * per
        stats = run_extraction(
            spark, docs, OUT_SLICED, f"slice-{i:02d}",
            n_buckets=N_BUCKETS,
            buckets=list(range(i * per, hi)),
            compact_after=compact_after)
        if stats["compaction"] is not None:
            events.append({"after_slice": i,
                           "files_before": stats["compaction"]["files_before"],
                           "files_after": stats["compaction"]["files_after"],
                           "visible_before_run": before})
    sliced_wall = time.perf_counter() - t0
    sliced_md5 = _output_md5(spark, OUT_SLICED)

    # clean resume no-op over the compacted manifest
    t0 = time.perf_counter()
    s = run_extraction(spark, docs, OUT_SLICED, "resume",
                       n_buckets=N_BUCKETS, compact_after=compact_after)
    resume = time.perf_counter() - t0
    assert s["buckets_processed"] == 0, s
    assert sliced_md5 == oneshot_md5, (sliced_md5, oneshot_md5)
    assert events, "compaction never fired — soak misconfigured"

    print(json.dumps({
        "metric": "compaction-soak",
        "n_docs": n_docs, "n_buckets": N_BUCKETS,
        "n_slices": n_slices, "compact_after": compact_after,
        "cpus": int(cpus),
        "oneshot_wall_sec": round(oneshot_wall, 2),
        "sliced_wall_sec": round(sliced_wall, 2),
        "sliced_docs_per_sec": round(n_docs / sliced_wall, 1),
        "compaction_events": events,
        "manifest_files_final": visible_files(),
        "resume_noop_sec": round(resume, 2),
        "resume_buckets_processed": s["buckets_processed"],
        "md5_identical": sliced_md5 == oneshot_md5,
        "output_md5": sliced_md5,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
