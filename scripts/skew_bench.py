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


def mixer_skew(n_rows: int = 200_000, n_parts: int = 32) -> None:
    """Language-skew A/B for the token-budget mixer: 90% of rows share
    ONE language.  Proves curation.py's range-partition claim the way
    the host-skew claim was proven: a per-group window puts the fat
    language in ONE task; budget_sample's range-partitioned sort stays
    balanced.  Also asserts row-for-row parity between the two."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from exam_pdf_parser_spark.operators.curation import (
        _with_stats, budget_sample,
    )
    from exam_pdf_parser_spark.session import get_spark

    spark = get_spark("mixer-skew", master="local[8]",
                      shuffle_partitions=n_parts)
    # documents-shaped skewed table, built JVM-side: 90% 'ko', the
    # rest spread over 4 langs; deterministic pseudo-text gives varied
    # token counts and uniq ratios
    df = spark.range(0, n_rows, 1, n_parts).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", F.transform(
            F.sequence(F.lit(1), F.lit(20) + F.pmod("id", 30)),
            lambda x: F.concat(F.lit("w"), F.pmod(F.col("id") * x, 97)),
        )).alias("text"),
        F.when(F.pmod("id", 10) < 9, "ko").otherwise(
            F.concat(F.lit("l"), F.pmod("id", 4))).alias("lang"),
    ).persist()
    df.count()

    budget = 3_000_000  # keeps roughly half of the fat language
    d = _with_stats(df)
    sort_keys = [F.col("lang"), F.desc("uniq_ratio"), F.asc("doc_id")]
    range_max, range_mean = partition_stats(
        d.repartitionByRange(*sort_keys))
    group_max, group_mean = partition_stats(
        df.repartition(n_parts, "lang"))

    w = (Window.partitionBy("lang")
         .orderBy(F.desc("uniq_ratio"), F.asc("doc_id"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    window_twin = (d.withColumn("cum_tokens", F.sum("tokens").over(w))
                   .filter(F.col("cum_tokens") <= budget))

    def run(frame) -> float:
        t0 = time.perf_counter()
        frame.select(F.count("*")).collect()
        return round(time.perf_counter() - t0, 2)

    run(budget_sample(df, budget))  # warm workers off the clock
    t_window = run(window_twin)
    t_range = run(budget_sample(df, budget))
    # SET parity, not just counts: the kept (lang, doc_id, cum) rows
    # must be identical — an equal-sized wrong prefix would pass a
    # count check
    kept_window = {(r["lang"], r["doc_id"], r["cum_tokens"])
                   for r in window_twin.select(
                       "lang", "doc_id", "cum_tokens").collect()}
    kept_range = {(r["lang"], r["doc_id"], r["cum_tokens"])
                  for r in budget_sample(df, budget).select(
                      "lang", "doc_id", "cum_tokens").collect()}
    assert kept_window == kept_range, (
        len(kept_window), len(kept_range),
        sorted(kept_window ^ kept_range)[:5])
    n_range = len(kept_range)

    print(json.dumps({
        "mode": "mixer_skew", "n_rows": n_rows, "partitions": n_parts,
        "fat_lang_share": 0.9, "budget_tokens": budget,
        "kept_rows_both": n_range,
        "per_group_window": {"wall_s": t_window,
                             "max_part_rows": group_max,
                             "mean_part_rows": round(group_mean, 1)},
        "range_prefix_sum": {"wall_s": t_range,
                             "max_part_rows": range_max,
                             "mean_part_rows": round(range_mean, 1)},
        "speedup": round(t_window / t_range, 2),
    }))
    spark.stop()


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
    if len(sys.argv) > 1 and sys.argv[1] == "mixer":
        mixer_skew(int(sys.argv[2]) if len(sys.argv) > 2 else 200_000)
    else:
        main()
