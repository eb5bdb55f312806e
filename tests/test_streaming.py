"""Structured Streaming tests: windowed counts match the batch
equivalent, watermark plan is present, sessionization state op runs."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from exam_pdf_parser_spark.sources.io import load
from exam_pdf_parser_spark.streaming.events import (
    rate_limit_counts, read_event_stream, run_to_memory, sessionize,
    windowed_event_counts,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark):
    # copy events into a dir the file-stream source can list
    d = tempfile.mkdtemp(prefix="events_stream_")
    load(spark, SF_DIR, "events").repartition(4).write.mode(
        "overwrite").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_windowed_counts_match_batch(spark, events_dir):
    stream = read_event_stream(spark, events_dir)
    q = run_to_memory(windowed_event_counts(stream), "win_counts")
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["value_c"])
        for r in spark.sql("select * from win_counts").collect()
    }
    batch = (
        spark.read.parquet(events_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"),
             F.sum(F.round(F.col("value") * 100).cast("bigint"))
             .alias("value_c"))
        .select(F.col("w.start").alias("ws"), "event_type", "n", "value_c")
        .collect()
    )
    want = {(r["ws"], r["event_type"]): (r["n"], r["value_c"])
            for r in batch}
    assert got == want
    q.stop()


def test_watermark_in_plan(spark, events_dir):
    stream = read_event_stream(spark, events_dir)
    plan = windowed_event_counts(stream)._jdf.queryExecution().analyzed().toString()
    assert "EventTimeWatermark" in plan


def test_rate_limit_counts_run(spark, events_dir):
    stream = read_event_stream(spark, events_dir)
    q = run_to_memory(rate_limit_counts(stream, limit=2), "rl_counts")
    rows = spark.sql("select * from rl_counts").collect()
    assert rows
    assert {"window_start", "user_id", "n", "over_limit"} <= set(rows[0].asDict())
    q.stop()


def test_sessionize_stateful(spark, events_dir):
    stream = read_event_stream(spark, events_dir)
    q = run_to_memory(sessionize(stream), "sessions", mode="append",
                      until_rows=1)
    rows = spark.sql("select * from sessions").collect()
    # sessions flush on gap within the data; events span days so gaps exist
    assert rows
    for r in rows:
        assert r["session_events"] >= 1
        assert r["session_start"] <= r["session_end"]
    q.stop()


@pytest.fixture(scope="module")
def docs_stream_dir(spark):
    import datetime

    d = tempfile.mkdtemp(prefix="docs_stream_")
    base = datetime.datetime(2025, 3, 1)
    rows = []
    # 12 rows, 3 distinct texts: "alpha" x3 urls, "beta" x2, rest unique
    for i in range(12):
        text = ("alpha text body" if i in (0, 4, 8)
                else "beta text body" if i in (1, 5)
                else f"unique text {i}")
        rows.append((f"https://h{i:02d}.example/d", base
                     + datetime.timedelta(minutes=i), b"payload", text, "en"))
    from exam_pdf_parser_spark.streaming.dedup import DOCS_STREAM_SCHEMA
    spark.createDataFrame(rows, DOCS_STREAM_SCHEMA).repartition(3) \
        .write.mode("overwrite").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_streaming_exact_dedup(spark, docs_stream_dir):
    from exam_pdf_parser_spark.streaming.dedup import (
        read_document_stream, streaming_exact_dedup,
    )

    stream = read_document_stream(spark, docs_stream_dir)
    q = run_to_memory(streaming_exact_dedup(stream), "dedup_out",
                      mode="append")
    rows = spark.sql("select * from dedup_out").collect()
    hashes = [r["content_hash"] for r in rows]
    assert len(hashes) == len(set(hashes))       # one row per hash
    assert len(hashes) == 9                      # 12 rows, 3 collapsed
    q.stop()


def test_streaming_dedup_null_text_passthrough(spark, tmp_path):
    """NULL text is never a duplicate (batch-curate parity): distinct
    quarantine-bound rows must NOT collapse through the NULL-equal
    semantics of dropDuplicatesWithinWatermark."""
    import datetime

    from exam_pdf_parser_spark.streaming.dedup import (
        DOCS_STREAM_SCHEMA, read_document_stream, streaming_exact_dedup,
    )

    d = str(tmp_path / "null_docs")
    base = datetime.datetime(2025, 3, 1)
    rows = [
        ("https://a.example/1", base, b"p", None, "en"),
        ("https://a.example/2", base + datetime.timedelta(minutes=1),
         b"p", None, "en"),
        ("https://a.example/3", base + datetime.timedelta(minutes=2),
         b"p", "same body", "en"),
        ("https://a.example/4", base + datetime.timedelta(minutes=3),
         b"p", "same body", "en"),
    ]
    spark.createDataFrame(rows, DOCS_STREAM_SCHEMA).write.parquet(d)

    q = run_to_memory(streaming_exact_dedup(read_document_stream(spark, d)),
                      "null_dedup", mode="append")
    out = spark.sql("select * from null_dedup").collect()
    q.stop()
    # both null-text rows survive; the two "same body" rows collapse
    assert len(out) == 3
    assert sum(1 for r in out if r["content_hash"] is None) == 2


def test_first_seen_filter_provenance(spark, docs_stream_dir):
    from exam_pdf_parser_spark.streaming.dedup import (
        first_seen_filter, read_document_stream,
    )

    stream = read_document_stream(spark, docs_stream_dir, 100)
    q = run_to_memory(first_seen_filter(stream), "first_seen",
                      mode="update", until_rows=9)
    rows = {r["content_hash"]: r
            for r in spark.sql("select * from first_seen").collect()}
    assert len(rows) == 9
    by_dups = sorted((r["n_duplicates"], r["first_url"])
                     for r in rows.values())
    # the alpha text (3 copies) canonicalizes to its earliest url h00
    assert by_dups[-1] == (2, "https://h00.example/d")
    # the beta text (2 copies) → earliest is h01
    assert by_dups[-2] == (1, "https://h01.example/d")
    assert all(n == 0 for n, _ in by_dups[:-2])
    q.stop()


def test_streaming_extraction_matches_batch(spark, tmp_path):
    """The zero-shuffle extraction core runs UNCHANGED over a streaming
    ingest feed (stateless mapInPandas): readStream → extract() →
    sink produces exactly the batch output."""
    from exam_pdf_parser_spark.operators.extract import corpus_df, extract
    from exam_pdf_parser_spark.streaming.dedup import read_document_stream

    d = str(tmp_path / "docs_feed")
    corpus_df(spark, 8, partitions=2).write.parquet(d)

    stream_out = extract(read_document_stream(spark, d, 2))
    assert stream_out.isStreaming
    q = run_to_memory(stream_out.drop("spans"), "stream_extract",
                      mode="append")
    got = {r["url"]: r["extracted_text"]
           for r in spark.sql("select * from stream_extract").collect()}
    q.stop()

    want = {r["url"]: r["extracted_text"]
            for r in extract(spark.read.parquet(d)).collect()}
    assert got == want          # byte-identical, batch == stream


def test_streaming_neardup_candidates_match_batch(spark, tmp_path):
    """The watermarked MinHash-band candidate stream equals the batch
    band join on the same rows, and covers every batch-VERIFIED near-dup
    pair (candidates are a superset of verified pairs by pigeonhole)."""
    import datetime

    from pyspark.sql import functions as F

    from exam_pdf_parser_spark.operators.dedupe import lsh_pairs_from_tokens
    from exam_pdf_parser_spark.streaming.dedup import (
        DOCS_STREAM_SCHEMA, read_document_stream,
    )
    from exam_pdf_parser_spark.streaming.neardup import (
        document_band_keys, streaming_neardup_candidates,
    )

    base = datetime.datetime(2025, 3, 1)
    words = [f"tok{i}" for i in range(40)]
    rows = []
    for g in range(4):                       # 4 groups x 3 near-dup docs
        shared = " ".join(words[g * 9:g * 9 + 30])
        for j in range(3):
            text = shared + f" uniq{g}{j}a uniq{g}{j}b"
            rows.append((f"https://g{g}.example/d{j}",
                         base + datetime.timedelta(minutes=len(rows)),
                         b"p", text, "en"))
    for k in range(6):                       # singletons, no near dup
        rows.append((f"https://solo.example/d{k}",
                     base + datetime.timedelta(minutes=len(rows)), b"p",
                     " ".join(words[i] for i in range(k, 40, 7)) + f" s{k}",
                     "en"))
    static = spark.createDataFrame(rows, DOCS_STREAM_SCHEMA).persist()

    # batch twin of the candidate set: same stateless projection,
    # alias-QUALIFIED static self-join (unqualified self-join columns
    # silently mis-bind — the bug this test pinned down)
    keys = document_band_keys(static).persist()
    kl, kr = keys.alias("l"), keys.alias("r")
    batch_pairs = {
        (r["url_a"], r["url_b"])
        for r in kl.join(
            kr, (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col("l.url") < F.col("r.url")))
        .select(F.col("l.url").alias("url_a"),
                F.col("r.url").alias("url_b")).collect()
    }

    # reuse-by-expression claim: the stateless array_min signature
    # equals the batch explode+groupBy min(md5) signature, band by band
    from exam_pdf_parser_spark.operators.dedupe import (
        BAND_ROWS, MINHASH_SEEDS,
    )

    toks = static.select(
        F.col("url").alias("doc_id"),
        F.explode(F.array_distinct(
            F.filter(F.split("text", " "), lambda x: x != ""))).alias("token"))
    sigs = toks.groupBy("doc_id").agg(
        *[F.min(F.md5(F.concat(F.lit(f"{s}:"), F.col("token"))))
          .alias(f"mh{s}") for s in range(MINHASH_SEEDS)])
    batch_keys = {
        (r["doc_id"], band,
         "".join(r[f"mh{band * BAND_ROWS + q}"] for q in range(BAND_ROWS)))
        for r in sigs.collect()
        for band in range(MINHASH_SEEDS // BAND_ROWS)
    }
    stream_keys = {(r["url"], r["band_idx"], r["band_key"])
                   for r in keys.collect()}
    assert stream_keys == batch_keys

    verified = {(r["doc_a"], r["doc_b"])
                for r in lsh_pairs_from_tokens(toks).collect()}
    assert verified                           # planted groups collide
    assert verified <= batch_pairs

    d = str(tmp_path / "neardup_docs")
    static.write.parquet(d)
    stream = read_document_stream(spark, d, 3)
    q = run_to_memory(streaming_neardup_candidates(stream), "nd_cands",
                      mode="append")
    got = {(r["url_a"], r["url_b"])
           for r in spark.sql("select * from nd_cands").collect()}
    q.stop()
    static.unpersist()
    keys.unpersist()
    assert got == batch_pairs                 # stream == batch, same rows


def _drain_stage1(spark, q, adm_dir, expect_rows, timeout_s=120):
    """Poll the stage-1 parquet sink until the expected row count
    lands (availableNow + processing-time state timeouts can keep
    empty batches running — run_to_memory caveat), then stop."""
    import time as _t

    deadline = _t.time() + timeout_s
    n = -1
    while _t.time() < deadline:
        if q.awaitTermination(2):
            break
        try:
            n = spark.read.parquet(adm_dir).count()
        except Exception:
            n = -1
        if n >= expect_rows:
            break
    q.stop()


def test_bounded_neardup_hot_band_state_capped(spark, tmp_path):
    """Round-4 ask #8: one viral band key must not concentrate
    unbounded join state.  The two-stage bounded tier admits band_cap
    rows per band — the rest flow as overflow MARKERS naming the band
    for batch reconciliation — so stage-2 join state and per-band pair
    output are capped regardless of how hot the band runs."""
    import datetime

    from pyspark.sql import functions as F

    from exam_pdf_parser_spark.operators.dedupe import (
        BAND_ROWS, MINHASH_SEEDS,
    )
    from exam_pdf_parser_spark.streaming.dedup import (
        DOCS_STREAM_SCHEMA, read_document_stream,
    )
    from exam_pdf_parser_spark.streaming.neardup import (
        BOUNDED_KEYS_SCHEMA, bounded_neardup_candidates,
        run_bounded_band_stage,
    )

    n_bands = MINHASH_SEEDS // BAND_ROWS
    base = datetime.datetime(2025, 3, 1)
    n_hot, cap, n_solo = 40, 5, 5
    rows = [(f"https://hot{i:03d}.example/d",
             base + datetime.timedelta(seconds=i), b"p",
             "the same viral boilerplate text body", "en")
            for i in range(n_hot)]
    rows += [(f"https://solo{i}.example/d",
              base + datetime.timedelta(seconds=100 + i), b"p",
              " ".join(f"tok{i}x{j}" for j in range(8)), "en")
             for i in range(n_solo)]
    d = str(tmp_path / "docs")
    adm_dir = str(tmp_path / "admitted")
    spark.createDataFrame(rows, DOCS_STREAM_SCHEMA).repartition(4) \
        .write.parquet(d)

    total_keys = (n_hot + n_solo) * n_bands
    q1 = run_bounded_band_stage(
        read_document_stream(spark, d, 2), adm_dir,
        str(tmp_path / "ck1"), band_cap=cap, available_now=True)
    _drain_stage1(spark, q1, adm_dir, total_keys)

    handoff = spark.read.schema(BOUNDED_KEYS_SCHEMA).parquet(adm_dir)
    assert handoff.count() == total_keys      # nothing silently dropped
    hot = handoff.filter(F.col("url").startswith("https://hot"))
    assert hot.filter("not overflow").count() == cap * n_bands
    assert hot.filter("overflow").count() == (n_hot - cap) * n_bands
    # the markers name exactly the hot band keys, none of the solos
    marked = handoff.filter("overflow")
    assert marked.select("band_idx", "band_key").distinct().count() \
        == n_bands
    assert marked.filter(
        F.col("url").startswith("https://solo")).count() == 0

    # stage 2: join state bounded by the cap, not by the hot band size
    q2 = run_to_memory(
        bounded_neardup_candidates(spark, adm_dir), "bounded_pairs",
        mode="append",
        until_rows=n_bands * cap * (cap - 1) // 2)
    pairs = spark.sql("select * from bounded_pairs").collect()
    progress = [p for p in (q2.recentProgress or [])
                if p.get("stateOperators")]
    state_rows = max(
        (op.get("numRowsTotal", 0)
         for p in progress for op in p["stateOperators"]), default=0)
    q2.stop()

    # exactly C(cap,2) pairs per band from the hot cluster, no solos
    per_band: dict[int, int] = {}
    for r in pairs:
        assert r["url_a"].startswith("https://hot")
        per_band[r["band_idx"]] = per_band.get(r["band_idx"], 0) + 1
    assert per_band == {b: cap * (cap - 1) // 2 for b in range(n_bands)}
    # state holds at most both sides of every ADMITTED row — and far
    # below what the unguarded tier would hold for this hot band
    admitted_total = (cap + n_solo) * n_bands
    assert 0 < state_rows <= 2 * admitted_total
    assert state_rows < 2 * n_hot * n_bands

    # generous cap ≡ unbounded tier on the same rows (bounding changes
    # nothing when no band overflows)
    from exam_pdf_parser_spark.streaming.neardup import (
        streaming_neardup_candidates,
    )

    adm2 = str(tmp_path / "admitted_wide")
    q3 = run_bounded_band_stage(
        read_document_stream(spark, d, 2), adm2,
        str(tmp_path / "ck3"), band_cap=10_000, available_now=True)
    _drain_stage1(spark, q3, adm2, total_keys)
    q4 = run_to_memory(
        bounded_neardup_candidates(spark, adm2), "wide_pairs",
        mode="append")
    q5 = run_to_memory(
        streaming_neardup_candidates(read_document_stream(spark, d, 3)),
        "unbounded_pairs", mode="append")
    wide = {(r["url_a"], r["url_b"], r["band_idx"])
            for r in spark.sql("select * from wide_pairs").collect()}
    unbounded = {(r["url_a"], r["url_b"], r["band_idx"])
                 for r in spark.sql(
                     "select * from unbounded_pairs").collect()}
    q4.stop()
    q5.stop()
    assert wide == unbounded

    # round-6 verdict ask #6 — the closing identity: the batch tier
    # consuming the overflow-marked bands, unioned with the capped
    # stream's pairs, recovers EXACTLY the unbounded ground truth.
    from exam_pdf_parser_spark.streaming.neardup import (
        reconcile_marked_bands,
    )

    bounded = {(r["url_a"], r["url_b"], r["band_idx"]) for r in pairs}
    recon = {(r["url_a"], r["url_b"], r["band_idx"])
             for r in reconcile_marked_bands(spark, adm_dir).collect()}
    assert bounded <= unbounded and recon <= unbounded
    assert bounded | recon == unbounded
    # and the reconciliation genuinely contributed the capped tail
    assert recon - bounded


def test_admit_fn_deterministic_across_chunkings():
    """One group's rows within a trigger can reach the
    applyInPandasWithState function as SEVERAL pandas chunks; which
    rows land past band_cap (overflow=true) must not depend on that
    chunking.  Drives _admit_fn directly with every 2-way split of a
    6-row group and asserts identical admission decisions.  Output
    ROW order is chunking-dependent by design (the bounded-buffer
    pass spills certain-overflow rows eagerly; the sink is
    unordered), so frames are compared after a canonical sort."""
    import datetime

    import pandas as pd

    from exam_pdf_parser_spark.streaming.neardup import _admit_fn

    class FakeState:
        hasTimedOut = False
        exists = False
        get = (0,)

        def update(self, v):
            self.get, self.exists = v, True

        def setTimeoutDuration(self, ms):
            pass

        def remove(self):
            self.exists = False

    base = datetime.datetime(2025, 3, 1)
    # deliberately out of order so sorting matters
    rows = pd.DataFrame({
        "url": [f"https://u{i}.example/d" for i in (3, 0, 5, 1, 4, 2)],
        "warc_ts": [base + datetime.timedelta(seconds=i)
                    for i in (3, 0, 5, 1, 4, 2)],
    })

    def run(chunks):
        fn = _admit_fn(band_cap=3, state_ttl_ms=1000)
        out = list(fn((7, "bandkey"), iter(chunks), FakeState()))
        if not out:
            return None
        return pd.concat(out, ignore_index=True).sort_values(
            "url", ignore_index=True)

    whole = run([rows])
    assert list(whole["url"]) == [
        f"https://u{i}.example/d" for i in range(6)]
    assert list(whole["overflow"]) == [False] * 3 + [True] * 3
    for cut in range(7):                  # every 2-way chunking + empties
        chunked = run([rows.iloc[:cut], rows.iloc[cut:]])
        pd.testing.assert_frame_equal(whole, chunked)
    # state counter still accumulates across triggers of one key
    fn = _admit_fn(band_cap=3, state_ttl_ms=1000)
    st = FakeState()
    list(fn((7, "bandkey"), iter([rows.iloc[:4]]), st))
    (trigger2,) = list(fn((7, "bandkey"), iter([rows.iloc[4:]]), st))
    assert list(trigger2["overflow"]) == [True, True]

def test_admit_fn_bounded_buffer_property():
    """Property pin for the bounded-buffer admission: for ANY trigger
    multiset, prior state count, cap, and chunking, the decisions must
    equal the one-line spec — sort the whole trigger by
    (warc_ts, url); with n rows already admitted, the first
    max(0, band_cap - n) are admitted, the rest overflow — and the
    state counter advances by the trigger size.  Rows with identical
    sort keys are interchangeable, so results compare as sorted
    (url, warc_ts, overflow) multisets."""
    import datetime

    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from exam_pdf_parser_spark.streaming.neardup import _admit_fn

    base = datetime.datetime(2025, 3, 1)

    @settings(max_examples=120, deadline=None)
    @given(
        rows=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 3)),
                      max_size=12),
        n0=st.integers(0, 8),
        cap=st.integers(1, 6),
        cuts=st.lists(st.integers(0, 12), max_size=4),
    )
    def check(rows, n0, cap, cuts):
        df = pd.DataFrame({
            "url": [f"https://u{u}.example/d" for u, _ in rows],
            "warc_ts": [base + datetime.timedelta(seconds=t)
                        for _, t in rows],
        })

        class S:
            hasTimedOut = False
            exists = True
            get = (n0,)

            def update(self, v):
                self.get = v

            def setTimeoutDuration(self, ms):
                pass

        bounds = sorted(min(c, len(df)) for c in cuts)
        chunks, prev = [], 0
        for b in bounds + [len(df)]:
            chunks.append(df.iloc[prev:b])
            prev = b

        state = S()
        fn = _admit_fn(band_cap=cap, state_ttl_ms=1000)
        out = list(fn((1, "k"), iter(chunks), state))
        got = sorted(
            (r.url, r.warc_ts, r.overflow)
            for o in out for r in o.itertuples())

        spec = df.sort_values(["warc_ts", "url"], ignore_index=True)
        admit = max(0, cap - n0)
        want = sorted(
            (r.url, r.warc_ts, i >= admit)
            for i, r in enumerate(spec.itertuples()))

        assert got == want
        assert state.get == (n0 + len(df),)

    check()
