"""Attribute the sf≈1 minhash gap (round-8 verdict ask #6).

CROSSCHECK_sf1.json: Spark 15.8 s vs DuckDB 10.7 s on
``minhash_lsh_pairs`` at 50k docs / PAIR_SCOPE=2000 — correct, but the
only heavyweight query where single-node DuckDB wins.  Two candidate
causes, each A/B'd here on the SAME sf1 scratch tables:

* **shuffle-partition count**: the 8-stage scan→md5→band-join pipeline
  runs at spark.sql.shuffle.partitions=32 (one per core); if the gap
  is scheduling-granularity/skew, 64/128 partitions move it.
* **md5 throughput**: the signature step computes 12 md5(token) per
  distinct token; an xxhash64 VARIANT (same pipeline shape, JVM
  long-hash instead of md5 strings — Spark-side timing only, DuckDB
  has no xxhash64 so the committed oracle stays md5) isolates hash +
  band-key-string cost.  A stage split (tokens→sigs materialization
  vs full pipeline) further separates signature cost from the
  band-join + verify tail.

Timings are best-of-N in one warm session, preceded by the bench.py
JVM anchor so the artifact self-describes host phase.  Results →
BENCH_SCALING.md §minhash-gap.

Usage: python scripts/minhash_gap_bench.py [scratch_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

# must precede repo imports (operators/dedupe.py reads it at import);
# 2000 = the CROSSCHECK_sf1 record scope under attribution
os.environ["SPARK_GRAFT_PAIR_SCOPE"] = "2000"


def _xxhash_variant(t):
    """lsh_pairs_from_tokens with xxhash64 signatures: identical plan
    shape (groupBy 12 mins → band explode → grid self-join → semi-join
    verify), but signature = min(xxhash64(seed:token)) LONG and the
    band key a concat of 3 longs — no md5, far fewer string bytes
    through the shuffle.  Attribution-only: the committed query/oracle
    pair stays md5 (DuckDB has no xxhash64)."""
    from pyspark.sql import functions as F

    from exam_pdf_parser_spark.operators.dedupe import (
        BAND_ROWS, JACCARD_DUP, MINHASH_SEEDS, block_grid_self_join,
    )

    sigs = t.groupBy("doc_id").agg(
        *[F.min(F.xxhash64(F.concat(F.lit(f"{s}:"), F.col("token"))))
          .alias(f"mh{s}") for s in range(MINHASH_SEEDS)])
    band_structs = [
        F.struct(
            F.lit(band).alias("band_idx"),
            F.concat_ws("|", *[F.col(f"mh{band * BAND_ROWS + r}")
                               for r in range(BAND_ROWS)]).alias("band_key"))
        for band in range(MINHASH_SEEDS // BAND_ROWS)]
    bands = (
        sigs.select("doc_id",
                    F.explode(F.array(*band_structs)).alias("b"))
        .select("doc_id", F.col("b.band_idx").alias("band_idx"),
                F.col("b.band_key").alias("band_key")))
    cands = block_grid_self_join(
        bands, "doc_id", ["band_idx", "band_key"],
        "doc_a", "doc_b", 5000).localCheckpoint(eager=False)
    cand_ids = (cands.select(F.col("doc_a").alias("doc_id"))
                .unionAll(cands.select(F.col("doc_b").alias("doc_id")))
                .distinct())
    toks = (t.join(cand_ids, "doc_id", "left_semi").groupBy("doc_id")
            .agg(F.collect_set("token").alias("toks"),
                 F.count("*").alias("n")))
    ta = toks.select(F.col("doc_id").alias("doc_a"),
                     F.col("toks").alias("toks_a"), F.col("n").alias("n_a"))
    tb = toks.select(F.col("doc_id").alias("doc_b"),
                     F.col("toks").alias("toks_b"), F.col("n").alias("n_b"))
    out = (cands.join(ta, "doc_a").join(tb, "doc_b")
           .select("doc_a", "doc_b",
                   F.size(F.array_intersect("toks_a", "toks_b"))
                   .alias("n_inter"),
                   (F.col("n_a") + F.col("n_b")
                    - F.size(F.array_intersect("toks_a", "toks_b")))
                   .alias("n_union")))
    return out.filter(
        F.col("n_inter").cast("double") / F.col("n_union") >= JACCARD_DUP)


def _tokens(spark, scratch):
    from pyspark.sql import functions as F

    from exam_pdf_parser_spark.operators.dedupe import PAIR_SCOPE, _words

    d = (spark.read.parquet(f"{scratch}/documents.parquet")
         .filter(F.col("doc_id") < PAIR_SCOPE))
    return d.select(
        "doc_id",
        F.explode(F.array_distinct(_words(F.col("text")))).alias("token"))


def main() -> int:
    scratch = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.environ.get("TMPDIR", "/tmp"), "epps_sf1")
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import duckdb

    import bench
    from exam_pdf_parser_spark.operators.dedupe import (
        MINHASH_SEEDS, lsh_pairs_from_tokens,
    )
    from exam_pdf_parser_spark.session import get_spark
    from sf1_crosscheck import build_tables

    con = duckdb.connect()
    counts = build_tables(con, "/root/testdata/sf0.1", scratch)
    con.close()
    print(f"scratch ready: {counts['documents']} docs")

    spark = get_spark("minhash-gap", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.range(1000).selectExpr("sum(id)").collect()
    jvm_anchor = min(bench._jvm_anchor_runs(spark, reps))

    def best_of(make_df) -> tuple[float, int]:
        runs, n = [], -1
        for _ in range(reps):
            t0 = time.perf_counter()
            n = make_df().count()
            runs.append(time.perf_counter() - t0)
        return min(runs), n

    from pyspark.sql import functions as F

    results: dict[str, dict] = {}
    # A: shuffle-partition sweep on the registered md5 pipeline
    for parts in (cpus, cpus * 2, cpus * 4):
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        sec, n = best_of(lambda: lsh_pairs_from_tokens(_tokens(spark, scratch)))
        results[f"md5_parts_{parts}"] = {"sec": round(sec, 2), "rows": n}
        print(f"md5 parts={parts}: {sec:.2f}s rows={n}")
    spark.conf.set("spark.sql.shuffle.partitions", str(cpus))

    # B: stage split — signature aggregation alone (12 md5-mins/token)
    sec, n = best_of(lambda: _tokens(spark, scratch).groupBy("doc_id").agg(
        *[F.min(F.md5(F.concat(F.lit(f"{s}:"), F.col("token"))))
          .alias(f"mh{s}") for s in range(MINHASH_SEEDS)]))
    results["md5_sigs_only"] = {"sec": round(sec, 2), "rows": n}
    print(f"md5 sigs-only: {sec:.2f}s")
    sec, n = best_of(lambda: _tokens(spark, scratch).groupBy("doc_id").agg(
        *[F.min(F.xxhash64(F.concat(F.lit(f"{s}:"), F.col("token"))))
          .alias(f"mh{s}") for s in range(MINHASH_SEEDS)]))
    results["xxh_sigs_only"] = {"sec": round(sec, 2), "rows": n}
    print(f"xxh sigs-only: {sec:.2f}s")

    # C: full xxhash64 variant (attribution-only)
    sec, n = best_of(lambda: _xxhash_variant(_tokens(spark, scratch)))
    results["xxh_full"] = {"sec": round(sec, 2), "rows": n}
    print(f"xxh full: {sec:.2f}s rows={n}")
    spark.stop()

    # r10 (r8 ADVICE #1): read the committed record instead of a
    # hardcoded literal — the keys and values moved when the sf1
    # crosscheck gained its cold/warm split (and again when round 10
    # optimized the query), so a baked copy goes stale silently.
    try:
        with open(os.path.join(REPO, "CROSSCHECK_sf1.json")) as f:
            rec = json.load(f)["results"].get("minhash_lsh_pairs", {})
        committed = {k: rec.get(k) for k in (
            "spark_cold_sec", "spark_warm_sec",
            "duck_cold_sec", "duck_warm_sec")}
        committed["source"] = "CROSSCHECK_sf1.json (committed)"
    except (OSError, KeyError, ValueError):
        committed = {"source": "CROSSCHECK_sf1.json unavailable"}
    out = {"metric": "minhash-gap-ab", "pair_scope": 2000,
           "cpus": cpus, "reps": reps,
           "jvm_anchor_sec": round(jvm_anchor, 3),
           "committed_sf1_record": committed,
           "results": results}
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
