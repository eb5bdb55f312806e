"""Host-level skew A/B (north rule: "salted repartitioning to break
host-level skew").

The corpus plants skew by construction: host000 carries ~20% of all
urls (corpus/generator.py).  This bench runs the same extraction over
the same rows under two physical layouts:

  A. SKEWED  — input repartitioned BY HOST KEY, so one task owns the
     fat host (the layout an Iceberg read clustered by host produces);
  B. SALTED  — ``salted_repartition`` spreads every host (including
     re-crawled duplicate urls) across partitions.

Reported: wall seconds for each, speedup, and the max/mean partition
row counts that explain it.  Usage: python scripts/skew_bench.py [n_docs]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def partition_stats(df) -> tuple[int, float]:
    # mean over ALL partitions (empties included) so the skewed and
    # salted variants report max/mean on the same denominator
    sizes = df.rdd.glom().map(len).collect() or [0]
    return max(sizes), sum(sizes) / len(sizes)


def main() -> None:
    from pyspark.sql import functions as F

    from exam_pdf_parser_spark.operators.extract import (
        corpus_df, extract, salted_repartition,
    )
    from exam_pdf_parser_spark.session import get_spark

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000
    n_parts = 32
    spark = get_spark("skew-bench", master="local[8]",
                      shuffle_partitions=n_parts)

    docs = corpus_df(spark, n_docs, partitions=n_parts).persist()
    docs.count()  # materialize once; both variants read the same rows

    host = F.regexp_extract("url", r"host(\d+)", 1)
    skewed = docs.repartition(n_parts, host).persist()
    salted = salted_repartition(docs, n_parts).persist()
    skewed.count(), salted.count()

    skew_max, skew_mean = partition_stats(skewed)
    salt_max, salt_mean = partition_stats(salted)

    def run(df) -> float:
        t0 = time.perf_counter()
        extract(df).select(F.count("*")).collect()
        return round(time.perf_counter() - t0, 2)

    run(salted)  # warm python workers once, off the clock
    t_skew = run(skewed)
    t_salt = run(salted)

    print(json.dumps({
        "n_docs": n_docs, "partitions": n_parts,
        "skewed": {"wall_s": t_skew, "max_part_rows": skew_max,
                   "mean_part_rows": round(skew_mean, 1)},
        "salted": {"wall_s": t_salt, "max_part_rows": salt_max,
                   "mean_part_rows": round(salt_mean, 1)},
        "speedup": round(t_skew / t_salt, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
