"""Streaming near-duplicate tier: a watermarked MinHash-band candidate
stream over the document ingest feed — the streaming twin of the batch
``dedupe.lsh_pairs_from_tokens`` pipeline.

Reuse is by EXPRESSION, not by copy: the batch pipeline computes each
signature as ``min(md5(seed:token))`` over an exploded token table; a
streaming groupBy would make that a stateful aggregation (results held
until watermark close), so here the identical signature is computed as
a STATELESS projection — ``array_min(transform(tokens, md5(...)))``
over the per-row token array, which is the same min over the same md5
strings (Spark's ``min``/``array_min`` both order strings
lexicographically).  ``document_band_keys`` therefore runs unchanged
on a static frame or a stream, and the parity test pins stream ==
batch on the same rows.

Candidate semantics: two documents sharing ANY band key within the
event-time horizon emit a pair (the same pigeonhole contract as the
batch band join).  State is bounded by the watermark horizon — the
web-ingest assumption that near-duplicates arrive close together in
crawl time; corpus-wide pairing belongs to the batch layer.
Verification (exact Jaccard on token sets) stays batch-side /
downstream: the stream's job is the small candidate set.

Hot-band skew (round-4 verdict ask #8): the watermark bounds state by
TIME, not by KEY — one viral band key (template boilerplate, a mirror
burst) concentrates rate×horizon rows of join state in one partition
and emits ~n² pairs from it, the same adversarial shape the batch
side's ``block_grid_self_join`` guard bounds.  Streams cannot
grid-join (Spark allows neither a self-join on one
``applyInPandasWithState`` output — shared-lineage resolution — nor
two such operators in one query), so the bound is a TWO-STAGE
pipeline with a durable handoff, the standard chained-query shape:

  stage 1  ``bounded_band_keys``    per-band admission control
           (applyInPandasWithState keyed on the band; state = ONE
           counter per band key).  The first ``band_cap`` rows of a
           band pass with ``overflow=false``; every later row emits as
           an ``overflow=true`` MARKER — nothing is silently dropped,
           the markers name exactly the bands the batch layer must
           reconcile (its grid guard handles them at leisure).  Sink
           admitted+markers to parquet (``run_bounded_band_stage``).
  stage 2  ``bounded_neardup_candidates``  the same watermarked band
           self-join as the unbounded tier, reading the stage-1 sink
           and joining only ``overflow=false`` rows — join state is
           ≤ 2×band_cap×n_bands rows per horizon REGARDLESS of how hot
           a band runs, and a band's pair output is ≤ band_cap².
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType, IntegerType, StringType, StructField, StructType,
    TimestampType,
)

from ..operators.dedupe import BAND_ROWS, MINHASH_SEEDS


def _token_array(text_col: str = "text"):
    return F.array_distinct(
        F.filter(F.split(F.col(text_col), " "), lambda x: x != ""))


def document_band_keys(df: DataFrame, id_col: str = "url",
                       text_col: str = "text") -> DataFrame:
    """(id, …, text) → one row per (id, band_idx, band_key); stateless,
    identical on static and streaming frames.  Signature/banding
    parameters are the batch pipeline's (MINHASH_SEEDS × BAND_ROWS)."""
    toks = _token_array(text_col)

    def mh(s: int):
        # closure via factory, NOT a two-arg lambda default — PySpark
        # treats a 2-parameter transform lambda as (element, index)
        # and would silently bind the seed to the array index
        return F.array_min(F.transform(
            toks, lambda t: F.md5(F.concat(F.lit(f"{s}:"), t)),
        )).alias(f"mh{s}")

    mhs = [mh(s) for s in range(MINHASH_SEEDS)]
    sigs = df.select(id_col, "warc_ts", *mhs).filter(
        F.col("mh0").isNotNull())      # empty/NULL text → no bands
    band_structs = [
        F.struct(
            F.lit(band).alias("band_idx"),
            F.concat(*[F.col(f"mh{band * BAND_ROWS + r}")
                       for r in range(BAND_ROWS)]).alias("band_key"),
        )
        for band in range(MINHASH_SEEDS // BAND_ROWS)
    ]
    return sigs.select(
        id_col, "warc_ts",
        F.explode(F.array(*band_structs)).alias("b"),
    ).select(id_col, "warc_ts",
             F.col("b.band_idx").alias("band_idx"),
             F.col("b.band_key").alias("band_key"))


def _band_self_join(keys: DataFrame, horizon: str) -> DataFrame:
    """The watermarked band self-join shared by the unbounded and
    bounded candidate tiers; ``keys`` must already carry the
    watermark."""
    # alias-QUALIFIED self-join: unqualified renamed columns over a
    # shared lineage silently mis-bind (measured: nondeterministic
    # pair sets run to run) — every column in the condition names its
    # side explicitly
    left, right = keys.alias("l"), keys.alias("r")
    cond = (
        (F.col("l.band_idx") == F.col("r.band_idx"))
        & (F.col("l.band_key") == F.col("r.band_key"))
        & (F.col("l.url") < F.col("r.url"))
        & (F.col("r.warc_ts")
           >= F.col("l.warc_ts") - F.expr(f"INTERVAL {horizon}"))
        & (F.col("r.warc_ts")
           <= F.col("l.warc_ts") + F.expr(f"INTERVAL {horizon}"))
    )
    return left.join(right, cond).select(
        F.col("l.url").alias("url_a"), F.col("r.url").alias("url_b"),
        F.col("l.band_idx").alias("band_idx"),
        F.col("l.warc_ts").alias("ts_a"), F.col("r.warc_ts").alias("ts_b"),
    )


def streaming_neardup_candidates(stream: DataFrame,
                                 horizon: str = "24 hours") -> DataFrame:
    """Watermarked band self-join → candidate pairs
    ``(url_a, url_b, band_idx, ts_a, ts_b)`` with ``url_a < url_b``.

    Both join sides carry the watermark and the join condition bounds
    the event-time gap by the horizon, so Spark can evict band state —
    memory is (ingest rate × horizon × n_bands), never corpus size.
    A pair colliding in k bands emits k rows; dedup downstream if one
    row per pair is needed (the batch verifier dropDuplicates anyway).

    Key-skew caveat: the time bound does NOT bound a single hot band —
    use the two-stage bounded tier (``bounded_band_keys`` →
    ``bounded_neardup_candidates``) on feeds where one band key can go
    viral (see module docstring).
    """
    keys = document_band_keys(stream).withWatermark("warc_ts", horizon)
    return _band_self_join(keys, horizon)


BOUNDED_KEYS_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("warc_ts", TimestampType()),
    StructField("band_idx", IntegerType()),
    StructField("band_key", StringType()),
    StructField("overflow", BooleanType()),
])

_ADMIT_STATE_SCHEMA = "n long"


def _admit_fn(band_cap: int, state_ttl_ms: int):
    import pandas as pd

    def admit(key, pdfs, state):
        if state.hasTimedOut:
            state.remove()
            return
        n = state.get[0] if state.exists else 0
        # Admission is deterministic in CONTENT regardless of how the
        # group's trigger rows are chunked across the pdfs iterator:
        # the rows admitted (overflow=false) are exactly the first
        # ``band_cap - n`` of the whole trigger in (warc_ts, url)
        # order.  That top-set has at most band_cap rows, so a
        # bounded running buffer gives O(chunk + band_cap) task
        # memory even for a viral band whose entire trigger set
        # lands in this one task: each chunk is merged with the
        # ≤band_cap-row buffer, rows past the cutoff are certainly
        # overflow and stream out immediately, and the buffer is
        # emitted as admitted once the iterator is drained.  (Output
        # ROW order differs by chunking; the sink is unordered.)
        remaining = band_cap - n if band_cap > n else 0
        band_idx = int(key[0])

        def finish(pdf, overflow):
            out = pdf.copy()
            out["band_idx"] = band_idx
            out["band_key"] = key[1]
            out["overflow"] = overflow
            return out

        buf = None
        total = 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf[["url", "warc_ts"]]
            total += len(pdf)
            comb = (pdf if buf is None or not len(buf)
                    else pd.concat([buf, pdf], ignore_index=True))
            comb = comb.sort_values(["warc_ts", "url"],
                                    ignore_index=True)
            buf = comb.iloc[:remaining].copy()
            spill = comb.iloc[remaining:]
            if len(spill):
                yield finish(spill, True)
        n += total
        state.update((n,))
        state.setTimeoutDuration(state_ttl_ms)
        if buf is not None and len(buf):
            yield finish(buf, False)

    return admit


def bounded_band_keys(stream: DataFrame, band_cap: int = 64,
                      state_ttl_ms: int = 3_600_000) -> DataFrame:
    """Stage 1 of the hot-band-bounded candidate tier: per-band
    admission control.  State is ONE long counter per live band key
    (a hot band adds one row of state, not rate×horizon rows); rows
    past ``band_cap`` still flow — as ``overflow=true`` markers naming
    the band for batch reconciliation — so the stage never silently
    drops evidence.  Terminal stateful stage: sink its output (e.g.
    ``run_bounded_band_stage``) and run the join as a second query —
    Spark supports neither a self-join on this operator's output nor
    two such operators in one query."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    keys = document_band_keys(stream)
    return keys.groupBy("band_idx", "band_key").applyInPandasWithState(
        _admit_fn(band_cap, state_ttl_ms),
        outputStructType=BOUNDED_KEYS_SCHEMA,
        stateStructType=_ADMIT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def run_bounded_band_stage(stream: DataFrame, out_path: str,
                           checkpoint: str, band_cap: int = 64,
                           available_now: bool = False):
    """Start stage 1: admitted rows + overflow markers to a parquet
    handoff dir (exactly-once via the checkpoint).  Returns the
    StreamingQuery.  ``available_now=True`` drains the current input
    and stops (tests / catch-up runs); note the ``run_to_memory``
    caveat — a pending processing-time state timeout can keep empty
    batches running, so callers poll the sink and ``stop()``."""
    writer = (
        bounded_band_keys(stream, band_cap)
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def bounded_neardup_candidates(spark: SparkSession, admitted_path: str,
                               horizon: str = "24 hours",
                               max_files_per_trigger: int = 4) -> DataFrame:
    """Stage 2: the same watermarked band self-join as the unbounded
    tier, over the stage-1 handoff — only ``overflow=false`` rows
    join, so join state is ≤ 2 × band_cap × n_bands rows per horizon
    and a hot band's pair output is ≤ band_cap², no matter how many
    rows the band received.  Overflow markers remain in the handoff
    dir for the batch layer (read them with ``overflow=true``)."""
    adm = (
        spark.readStream.schema(BOUNDED_KEYS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(admitted_path)
        .filter(~F.col("overflow"))
        .withWatermark("warc_ts", horizon)
    )
    return _band_self_join(adm, horizon)


def reconcile_marked_bands(spark: SparkSession, admitted_path: str,
                           horizon: str = "24 hours") -> DataFrame:
    """Batch closure of the bounded tier: recompute EVERY candidate
    pair for exactly the bands the stage-1 overflow markers named.

    The stage-1 handoff holds every row of every band (admitted and
    overflow alike), so scoping the unbounded band self-join to the
    marked ``(band_idx, band_key)`` set — a tiny distinct list,
    broadcast — yields each hot band's full pair set at batch leisure,
    under the batch side's skew guards if composed with them.  By
    construction::

        stage-2 stream pairs  ∪  reconcile_marked_bands(...)
            ==  unbounded-tier pairs over the same rows

    (unmarked bands never overflow, so the stream already has their
    complete pairs; marked bands are recomputed here in full — the
    test pins this identity on a planted hot-band corpus).
    """
    rows = spark.read.schema(BOUNDED_KEYS_SCHEMA).parquet(admitted_path)
    marked = rows.filter(F.col("overflow")) \
        .select("band_idx", "band_key").distinct()
    scoped = rows.join(F.broadcast(marked), ["band_idx", "band_key"]) \
        .select("url", "warc_ts", "band_idx", "band_key")
    return _band_self_join(scoped, horizon)
