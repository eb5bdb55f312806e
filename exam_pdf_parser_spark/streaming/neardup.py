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
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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


def streaming_neardup_candidates(stream: DataFrame,
                                 horizon: str = "24 hours") -> DataFrame:
    """Watermarked band self-join → candidate pairs
    ``(url_a, url_b, band_idx, ts_a, ts_b)`` with ``url_a < url_b``.

    Both join sides carry the watermark and the join condition bounds
    the event-time gap by the horizon, so Spark can evict band state —
    memory is (ingest rate × horizon × n_bands), never corpus size.
    A pair colliding in k bands emits k rows; dedup downstream if one
    row per pair is needed (the batch verifier dropDuplicates anyway).
    """
    keys = document_band_keys(stream).withWatermark("warc_ts", horizon)
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
