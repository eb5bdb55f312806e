"""Scale-path mechanics: bucketed co-located joins, binaryFile
ingestion, salted repartitioning under host skew, streaming
extraction — each asserting the property that matters at 100 TB,
not just that code runs."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from exam_pdf_parser_spark.operators.extract import (
    corpus_df, extract, salted_repartition, spans_table,
)


def test_bucketed_join_has_no_exchange(spark):
    """Iceberg-style bucketing stand-in: two tables bucketed by url
    join WITHOUT a shuffle (SortMergeJoin over pre-bucketed scans)."""
    docs = corpus_df(spark, 40, partitions=4)
    ext = extract(docs)
    try:
        (docs.select("url", "lang").write.mode("overwrite")
         .bucketBy(8, "url").sortBy("url").saveAsTable("docs_b"))
        (spans_table(ext).write.mode("overwrite")
         .bucketBy(8, "url").sortBy("url").saveAsTable("spans_b"))
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("spans_b").join(spark.table("docs_b"), "url")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert j.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS docs_b")
        spark.sql("DROP TABLE IF EXISTS spans_b")


def test_binaryfile_ingestion_path(spark, tmp_path):
    """S5: raw-file ingestion via the binaryFile source with a glob
    filter — the WARC-dump-on-disk entry point."""
    from exam_pdf_parser_spark.corpus.generator import generate_rows

    rows = generate_rows(6)
    d = str(tmp_path / "raw")
    os.makedirs(d)
    for i, r in enumerate(rows):
        with open(f"{d}/doc{i:04d}.xlay", "wb") as f:
            f.write(r["html"])
        with open(f"{d}/ignore{i}.txt", "w") as f:
            f.write("junk")

    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.xlay")
        .load(d)
        .select(F.col("path").alias("url"), F.col("content").alias("html"))
    )
    assert raw.count() == 6
    out = extract(raw)
    assert out.filter("status = 'ok'").count() == 6
    # same spans as the table path, modulo url naming
    n_spans = spans_table(out).count()
    from exam_pdf_parser_spark.core.oracle import oracle_spans_and_text

    gold_spans, _ = oracle_spans_and_text(rows)
    assert n_spans == len(gold_spans)


def test_salted_repartition_breaks_host_skew(spark):
    """Host-level skew (20% of urls on host000): salted repartitioning
    must spread the hot host across many partitions."""
    docs = corpus_df(spark, 400, partitions=4)
    hot = docs.filter(F.col("url").contains("host000"))
    n_hot = hot.count()
    assert n_hot > 30  # generator plants ~20% on host000

    salted = salted_repartition(docs, 16, salt_mod=8)
    dist = (
        salted.filter(F.col("url").contains("host000"))
        .select(F.spark_partition_id().alias("pid"))
        .groupBy("pid").count().collect()
    )
    parts_with_hot = len(dist)
    max_share = max(r["count"] for r in dist) / n_hot
    assert parts_with_hot >= 6          # spread over many partitions
    assert max_share < 0.5              # no partition owns the host


def test_streaming_extraction(spark, tmp_path):
    """The extraction core runs unchanged on a file stream (stateless
    mapInPandas is streaming-compatible) — ingest-as-it-lands mode."""
    src = str(tmp_path / "stream_src")
    corpus_df(spark, 12, partitions=3).write.mode("overwrite").parquet(src)

    from exam_pdf_parser_spark.operators.extract import DOCUMENTS_SCHEMA

    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = extract(stream).select("url", "status", F.size("spans").alias("n"))
    q = (
        out.writeStream.format("memory").queryName("stream_extract")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from stream_extract").collect()
    assert len(rows) == 12
    assert all(r["status"] == "ok" and r["n"] > 0 for r in rows)
    q.stop()


def test_salted_repartition_spreads_identical_urls(spark):
    # duplicate urls (re-crawls) are THE skew case a key-derived salt
    # can never fix — the per-row salt must spread them
    one = spark.createDataFrame(
        [("https://hot.example/dup", i) for i in range(400)],
        "url string, i int")
    salted = salted_repartition(one, 16, salt_mod=8)
    dist = (
        salted.select(F.spark_partition_id().alias("pid"))
        .groupBy("pid").count().collect()
    )
    assert len(dist) >= 6
    assert max(r["count"] for r in dist) / 400 < 0.5


def test_partition_stats(spark):
    from exam_pdf_parser_spark.sources.io import partition_stats

    docs = corpus_df(spark, 64, partitions=4)
    stats = partition_stats(docs).collect()
    assert sum(r["n_rows"] for r in stats) == 64
    assert len(stats) == 4


def test_minhash_band_cap_drops_no_pairs(spark):
    """Round-4 hardening: a duplicate-heavy corpus puts many docs in
    one band bucket; the shared block-grid guard must change only
    task placement — the verified pair set is identical to the
    unguarded band join."""
    from exam_pdf_parser_spark.operators.dedupe import (
        _words, lsh_pairs_from_tokens,
    )
    from pyspark.sql import functions as F

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon")
    # 40 exact copies (one hot band key per band) + distinct noise docs
    rows = [(i, base) for i in range(40)] + [
        (100 + i, f"unique text body number {i} with words w{i} v{i}")
        for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id: long, text: string")
    t = docs.select(
        "doc_id",
        F.explode(F.array_distinct(_words(F.col("text")))).alias("token"))

    capped = {(r["doc_a"], r["doc_b"]) for r in
              lsh_pairs_from_tokens(t, band_cap=8).collect()}
    uncapped = {(r["doc_a"], r["doc_b"]) for r in
                lsh_pairs_from_tokens(t, band_cap=None).collect()}
    assert len(uncapped) >= 40 * 39 // 2    # the dup family is complete
    assert capped == uncapped


def test_block_grid_exchanges_resist_aqe_coalescing(spark):
    """The guard's whole point dies if AQE fuses the tiny-input grid
    join back into one partition (measured WORSE than unguarded in
    BENCH_SCALING.md) — both grid sides must shuffle with the
    numbered-repartition origin, which AQE never coalesces."""
    from exam_pdf_parser_spark.operators.dedupe import block_grid_self_join

    sigs = spark.createDataFrame(
        [(i, 0, i % 3) for i in range(50)],
        "doc_id: long, table: int, bucket: long")
    plan = block_grid_self_join(
        sigs, "doc_id", ["table", "bucket"], "a", "b", 5,
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("REPARTITION_BY_NUM") == 2
    assert "REPARTITION_BY_COL" not in plan


def test_simhash_chunk_cap_drops_no_pairs(spark):
    """Same guard, SimHash path: identical docs share every chunk key;
    capped and uncapped pigeonhole joins must emit the same pairs."""
    from exam_pdf_parser_spark.operators.dedupe import (
        simhash_pairs_from_hashes,
    )

    # 30 identical hashes (hot every chunk) + distinct tails
    rows = [(i, 0x5A5A5A5A) for i in range(30)] + [
        (100 + i, 0x5A5A5A5A ^ (1 << (i % 32)) ^ (0xFF << (i % 8)))
        for i in range(20)]
    sh = spark.createDataFrame(rows, "doc_id: long, simhash: long")
    capped = {(r["doc_a"], r["doc_b"], r["hamming"]) for r in
              simhash_pairs_from_hashes(sh, chunk_cap=8).collect()}
    uncapped = {(r["doc_a"], r["doc_b"], r["hamming"]) for r in
                simhash_pairs_from_hashes(sh, chunk_cap=None).collect()}
    assert len(uncapped) >= 30 * 29 // 2
    assert capped == uncapped


def test_shingle_minhash_order_sensitivity(spark):
    """Character shingles separate true near-copies from bag-of-words
    collisions: a word-permuted copy has token-Jaccard 1.0 but low
    shingle overlap."""
    from exam_pdf_parser_spark.operators.dedupe import shingle_minhash_pairs

    base = ("the quick brown fox jumps over the lazy dog while the "
            "patient cat watches from a warm windowsill every single day "
            "of the long winter season without ever losing interest")
    near = base.replace("warm", "cold", 1)          # one-word edit
    permuted = " ".join(reversed(base.split()))     # same word SET
    docs = spark.createDataFrame(
        [(0, base), (1, near), (2, permuted),
         (3, "a completely unrelated piece of text goes here")],
        "doc_id: long, text: string")

    got = {(r["doc_a"], r["doc_b"]): (r["n_inter"], r["n_union"])
           for r in shingle_minhash_pairs(docs, k=5, threshold=0.6).collect()}
    assert (0, 1) in got            # near-copy found
    assert (0, 2) not in got        # permutation correctly rejected
    assert (1, 2) not in got

    def shingle_set(t, k=5):
        return {t[i:i + k] for i in range(max(1, len(t) - k + 1))}

    a, b = shingle_set(base), shingle_set(near)
    assert got[(0, 1)] == (len(a & b), len(a | b))   # exact verification


def test_exact_tier_guard_raises_on_unbounded_input(spark):
    """The all-pairs demo tiers must fail loudly (naming their bucketed
    scale twin) instead of launching a quadratic join on a large
    input."""
    import pytest

    from exam_pdf_parser_spark.operators.dedupe import assert_exact_tier

    big = spark.range(25_000)
    with pytest.raises(ValueError, match="lsh_pairs_from_tokens"):
        assert_exact_tier(big, 20_000, "dedupe.lsh_pairs_from_tokens")
    small = spark.range(10)
    assert assert_exact_tier(small, 20_000, "unused") is small
