"""Per-partition checkpoint manifest + resume (north rule).

Work is keyed by ``url_bucket = pmod(xxhash64(url), n_buckets)`` — the
same bucketing an Iceberg table would declare (``bucket(N, url)``).
A run writes extraction output partitioned by bucket with DYNAMIC
partition overwrite, then appends one manifest row per completed
bucket.  Crash recovery = anti-join pending buckets against the
manifest: finished buckets are never recomputed, half-written bucket
directories are overwritten idempotently on retry.

Reference analogues: the resumable job store (src/server.py:52-69),
batch CSV report (scripts/batch_parser.py:117-127), layout cache
(test_debug_blocks.py:36-39) — unified here into exactly-once-per-
bucket lineage (SURVEY.md §4 item 2).

Layout:
  {out_dir}/extracted/bucket=<n>/*.parquet   extraction output
  {out_dir}/manifest/*.parquet               (run_id, bucket, status,
                                              rows_out, docs_in,
                                              errors, wall_ms)
"""

from __future__ import annotations

import json
import logging
import os
import re
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

from ..operators.extract import extract

# Single source of truth for the manifest shape: the Spark DDL string
# and the pyarrow schema used by the atomic local commit are BOTH
# derived from this list, so a column added to one side cannot silently
# produce mixed-schema parquet files in the manifest dir.
_MANIFEST_FIELDS = [
    ("run_id", "string"), ("bucket", "int"), ("status", "string"),
    ("rows_out", "long"), ("docs_in", "long"), ("errors", "long"),
    ("wall_ms", "long"), ("cpu_ms", "long"),
    ("docs_per_cpu_sec", "double"),
]
MANIFEST_SCHEMA = ", ".join(f"{n} {t}" for n, t in _MANIFEST_FIELDS)
_DDL_TO_ARROW = {"string": "string", "int": "int32", "long": "int64",
                 "double": "float64"}


def _arrow_manifest_schema():
    import pyarrow as pa

    return pa.schema([(n, pa.type_for_alias(_DDL_TO_ARROW[t]))
                      for n, t in _MANIFEST_FIELDS])


def with_bucket(documents: DataFrame, n_buckets: int) -> DataFrame:
    return documents.withColumn(
        "bucket",
        F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int"))


def completed_buckets(spark: SparkSession, out_dir: str,
                      attempts: int = 3) -> list[int]:
    path = os.path.join(out_dir, "manifest")
    # a reader racing compact_manifest's unlink step can list a file
    # that vanishes before the scan — retry (the compacted file carries
    # the same rows), and fall back to "no manifest" (resume everything;
    # idempotent overwrite makes that correct, just not free)
    for i in range(attempts):
        try:
            mdf = spark.read.parquet(path)
            return [
                r["bucket"]
                for r in mdf.filter(F.col("status") == "done")
                .select("bucket").distinct().collect()
            ]
        except Exception:
            if not os.path.isdir(path) and "://" not in out_dir:
                return []
            time.sleep(0.05 * (i + 1))
    return []


# Blob-aware scan bound (round-8 1M-soak lesson, promoted from the
# soak script into the engine): extraction output rows are ~5-50 KB of
# text + spans, so Spark's default 4096-row columnar reader batches
# materialize ~40-150 MB of on-heap vectors PER SCAN TASK — 32
# concurrent tasks OOM'd an 8g heap at 1M docs.  256-row batches bound
# the same scan at a few MB/task with negligible per-batch overhead.
DEFAULT_READER_BATCH_ROWS = 256
_BATCH_SIZE_CONF = "spark.sql.parquet.columnarReaderBatchSize"
# Spark's shipped default for the conf above (sql/core SQLConf
# PARQUET_VECTORIZED_READER_BATCH_SIZE) — what restore_reader_batch
# returns a session to.
SPARK_DEFAULT_READER_BATCH_ROWS = 4096

_LOG = logging.getLogger(__name__)


def restore_reader_batch(spark: SparkSession,
                         rows: int = SPARK_DEFAULT_READER_BATCH_ROWS,
                         ) -> None:
    """Undo :func:`read_extracted`'s session-wide parquet batch-size
    lowering (symmetric to ``release_routed_cache`` on the cache
    side).  Call AFTER every extraction-output DataFrame built by
    ``read_extracted`` has been acted on (collected / written) —
    Spark's vectorized reader takes its capacity from the session
    SQLConf at action time, so restoring earlier silently re-widens
    those pending blob-heavy scans too.

    Caveat (r8 ADVICE #2): the default restores to Spark's own 4096
    even if the session ran at an intentionally LOWER value before
    ``read_extracted`` ever touched it — mixed-workload callers that
    tune the reader batch themselves should pass ``rows=`` explicitly
    with the value they want back."""
    spark.conf.set(_BATCH_SIZE_CONF, str(rows))


def read_extracted(spark: SparkSession, out_dir: str,
                   reader_batch_rows: int | None =
                   DEFAULT_READER_BATCH_ROWS) -> DataFrame:
    """The reader consumers should use for ``{out_dir}/extracted``.

    A directory accumulated across runs may MIX pre-shard and sharded
    bucket files (``run_extraction`` gained ``shard_chars`` in round
    7); plain ``spark.read.parquet`` infers the schema from one
    arbitrary file footer, which on such a directory can silently
    drop the ``shard_idx``/``n_shards`` columns — and a downstream
    ``reassemble_sharded`` then truncates every sharded document to
    its first chunk.  This reader merges footers instead
    (``mergeSchema`` — one extra footer pass, worth it on a possibly
    mixed directory; a dir written by a single run has a uniform
    schema and never needs it) and normalizes missing/NULL shard
    coordinates to ``(0, 1)`` — "this row is the whole document" —
    so the output is always reassembly-safe.

    ``reader_batch_rows`` (safe-by-default, round 8): LOWERS the
    session's parquet columnar batch size to this bound if it is
    currently larger, because these rows are blob-heavy (see
    ``DEFAULT_READER_BATCH_ROWS`` above).  This is deliberately a
    SESSION conf change, and it is sticky: Spark's vectorized reader
    takes its capacity from the session SQLConf at action time — there
    is no per-read option for it (verified against the Spark 4.1
    ``ParquetOptions``/``ParquetPartitionReaderFactory`` classes), and
    a set-and-restore around this lazy ``read`` would be a no-op lie.
    An already-lower session value is respected; pass ``None`` to
    leave the conf untouched entirely.  A mixed-workload session that
    later wants the wide default back for narrow tables should call
    :func:`restore_reader_batch` after its extraction reads have been
    ACTED on (collected/written), not merely built; the lowering
    itself is announced via a ``logging`` INFO line (r8 ADVICE)."""
    if reader_batch_rows is not None:
        current = int(spark.conf.get(_BATCH_SIZE_CONF))
        if current > reader_batch_rows:
            # announce the session-wide side effect once per lowering
            # (subsequent read_extracted calls are no-ops until
            # restore_reader_batch raises it again) — mixed-workload
            # consumers otherwise see unrelated narrow scans slow down
            # with no visible cause (r8 ADVICE)
            _LOG.info(
                "read_extracted: lowering session conf %s %d -> %d "
                "(blob-heavy extraction rows; call "
                "restore_reader_batch(spark) after extraction reads "
                "are acted on to get the wide default back)",
                _BATCH_SIZE_CONF, current, reader_batch_rows)
            spark.conf.set(_BATCH_SIZE_CONF, str(reader_batch_rows))
    df = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(out_dir, "extracted"))
    # normalize unconditionally: consumers always see the shard
    # coordinates, so a dir with no sharded generation at all (the
    # common case) feeds reassembly/dedup logic the same shape as a
    # mixed one — every row (0, 1) = "the whole document"
    if "shard_idx" in df.columns:
        df = (df.withColumn(
                  "shard_idx", F.coalesce("shard_idx", F.lit(0)))
                .withColumn(
                  "n_shards", F.coalesce("n_shards", F.lit(1))))
    else:
        df = (df.withColumn("shard_idx", F.lit(0))
                .withColumn("n_shards", F.lit(1)))
    return df


def _commit_manifest(out_dir: str, run_id: str, rows: list[tuple],
                     spark: SparkSession | None = None) -> None:
    """Atomic all-or-nothing manifest append: ONE parquet file per
    run, written under a dot-prefixed temp name (invisible to Spark /
    Hadoop readers) and ``os.rename``'d into place — atomic within a
    POSIX directory.  Readers therefore see either every bucket row of
    this run or none of them, and because the rename happens strictly
    after the data write returned, a killed run can never mark a
    bucket done without its data.  Concurrent writers each commit
    their own uniquely-named file; duplicate done-rows for a bucket
    are harmless (``completed_buckets`` is a distinct filter).

    Non-local ``out_dir`` (``hdfs://``, ``s3a://``…): the driver-local
    rename cannot reach it, so the rows commit through Spark as ONE
    coalesced file — the committer's task-file rename is atomic on
    HDFS; on S3-style stores (no atomic rename) commit through a
    transactional table format instead (an Iceberg append of the same
    rows is a single atomic snapshot).
    """
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    if "://" in out_dir:
        if spark is None:
            raise ValueError(
                "remote out_dir needs the SparkSession to commit")
        (spark.createDataFrame(rows, MANIFEST_SCHEMA).coalesce(1)
         .write.mode("append").parquet(os.path.join(out_dir, "manifest")))
        return

    mdir = os.path.join(out_dir, "manifest")
    os.makedirs(mdir, exist_ok=True)
    schema = _arrow_manifest_schema()
    table = pa.table(
        {f.name: [r[i] for r in rows]
         for i, f in enumerate(schema)}, schema=schema)
    token = uuid.uuid4().hex[:12]
    safe_run = re.sub(r"[^A-Za-z0-9_.-]", "_", run_id)[:64]
    tmp = os.path.join(mdir, f".tmp-{token}.parquet")
    final = os.path.join(mdir, f"part-{safe_run}-{token}.parquet")
    pq.write_table(table, tmp)
    os.rename(tmp, final)


def compact_manifest(out_dir: str, _race_hook=None,
                     _race_hook_read=None) -> dict:
    """Opt-in retention maintenance: rewrite the manifest directory's
    accumulated one-file-per-run commits into a SINGLE parquet file.
    A long-lived pipeline accretes one manifest file per run and the
    resume read degrades with the file count; compaction bounds it.

    Crash/race safety, same discipline as :func:`_commit_manifest`:

    * the merged file is written under a dot-temp name and
      ``os.rename``'d into place — a compactor killed mid-write leaves
      only an invisible temp, losing nothing;
    * only the files snapshotted BEFORE the merge are removed, so a
      writer committing concurrently keeps its new file;
    * between the rename and the removals, readers see old + compacted
      rows — duplicate done-rows are harmless (``completed_buckets``
      is distinct), and a compactor killed mid-removal just leaves
      some duplicates for the next compaction;
    * a reader that lists an old file right before its unlink retries
      (``completed_buckets``).

    Local-FS only: on object stores, commit through a transactional
    table format and use its compaction service (an Iceberg
    rewrite_data_files is the same operation as one atomic snapshot).
    ``_race_hook`` is test-only: called after the rename, before the
    removals, to plant concurrent-writer races deterministically
    (``_race_hook_read`` likewise, after the snapshot listing and
    before the merge reads).
    Returns ``{files_before, files_after, rows}``.
    """
    import uuid

    import pyarrow.parquet as pq

    if "://" in out_dir:
        raise ValueError(
            "compact_manifest is local-FS only; on object stores use a "
            "transactional table format's compaction instead")
    mdir = os.path.join(out_dir, "manifest")
    old = sorted(
        f for f in os.listdir(mdir)
        if f.endswith(".parquet") and not f.startswith("."))
    if len(old) <= 1:
        return {"files_before": len(old), "files_after": len(old),
                "rows": None}
    import pyarrow as pa

    if _race_hook_read is not None:
        _race_hook_read()
    # a rival compactor that snapshotted the same list may unlink a
    # file between our listing and our read; its rows are durable in
    # the rival's part-compact file (rivals rename BEFORE removing),
    # so a vanished file is safely skipped, not an error
    tables = []
    for f in old:
        try:
            tables.append(pq.read_table(os.path.join(mdir, f)))
        except FileNotFoundError:
            continue
    if not tables:
        remaining = [f for f in os.listdir(mdir)
                     if f.endswith(".parquet") and not f.startswith(".")]
        return {"files_before": len(old), "files_after": len(remaining),
                "rows": None}
    merged = pa.concat_tables(tables)
    token = uuid.uuid4().hex[:12]
    tmp = os.path.join(mdir, f".tmp-compact-{token}.parquet")
    final = os.path.join(mdir, f"part-compact-{token}.parquet")
    pq.write_table(merged, tmp)
    os.rename(tmp, final)
    if _race_hook is not None:
        _race_hook()
    for f in old:
        # a concurrent compactor that snapshotted the same file list
        # may have deleted it already; duplicate done-rows from both
        # merged files are harmless under the idempotent-read contract
        try:
            os.remove(os.path.join(mdir, f))
        except FileNotFoundError:
            pass
    remaining = [f for f in os.listdir(mdir)
                 if f.endswith(".parquet") and not f.startswith(".")]
    return {"files_before": len(old), "files_after": len(remaining),
            "rows": merged.num_rows}


def _check_run_meta(out_dir: str, n_buckets: int) -> None:
    """Pin ``n_buckets`` to the output directory for its lifetime.

    ``bucket = pmod(xxhash64(url), n_buckets)`` — resuming the same
    directory with a DIFFERENT ``n_buckets`` re-maps every url to a
    new bucket id while ``completed_buckets`` still reports ids from
    the old mapping: documents get silently double-processed or
    skipped and the per-bucket stats stop meaning anything.  First run
    records the value in ``run_meta.json`` (atomic write-then-rename);
    every later run must match or fails loudly.  Object-store paths
    skip the guard (local-FS op, like compaction); a pre-existing dir
    without the file (written before this guard) is stamped from the
    current call — the same trust-the-caller semantics it always had.
    """
    if "://" in out_dir:
        return
    meta_path = os.path.join(out_dir, "run_meta.json")

    def validate() -> bool:
        try:
            with open(meta_path) as f:
                meta = json.load(f)
            recorded = meta.get("n_buckets")
        except FileNotFoundError:
            return False
        except (json.JSONDecodeError, AttributeError) as e:
            raise ValueError(
                f"{meta_path} is corrupt ({e}) — it should hold "
                '{"n_buckets": N} for this output directory; restore '
                "it with the directory's original bucket count (or "
                "delete it to restamp from this run, if you are sure "
                f"n_buckets={n_buckets} matches the existing layout)")
        if recorded != n_buckets:
            raise ValueError(
                f"out_dir {out_dir} was written with n_buckets="
                f"{recorded}; resuming with n_buckets={n_buckets} "
                "would re-map every url to a different bucket id and "
                "silently double-process or skip documents — use the "
                "recorded value, or a fresh out_dir")
        return True

    if validate():
        return
    os.makedirs(out_dir, exist_ok=True)
    # exclusive link-based commit: write a private tmp, then hard-link
    # it to the final name — link is atomic and FAILS if the file
    # exists, so exactly one of two racing first runs stamps the dir
    # and the other validates against the (complete) winner's file
    tmp = f"{meta_path}.{os.getpid()}.tmp"
    with open(tmp, "w") as f:
        json.dump({"n_buckets": n_buckets}, f)
    try:
        os.link(tmp, meta_path)
    except FileExistsError:
        validate()   # raced: grade this run against the winner
    finally:
        os.unlink(tmp)


# sentinel: "caller did not choose" — resolves to the engine default
# (DEFAULT_SHARD_CHARS when routing is on, None when the caller turned
# routing off), so the safe default and the off-switch can coexist
_ENGINE_DEFAULT = object()


def run_extraction(
    spark: SparkSession,
    documents: DataFrame,
    out_dir: str,
    run_id: str,
    n_buckets: int = 64,
    min_q: int = 1,
    max_q: int = 50,
    route_giants: bool = True,
    compact_after: int | None = 64,
    shard_chars=_ENGINE_DEFAULT,
    buckets: list[int] | None = None,
) -> dict:
    """Execute (or resume) a bucketed extraction run.

    Returns summary stats.  Idempotent per bucket: rerunning after a
    crash only processes buckets absent from the manifest, and dynamic
    partition overwrite replaces any half-written bucket dirs.

    **Safe by default (round-8 verdict ask #2)**: giant routing AND
    output-row sharding are ON unless explicitly disabled — at 100 TB
    the fat tail arrives whether or not the caller remembered a flag,
    and the measured failure modes (a multi-thousand-page document
    stalling one task; a ~250 MB output row OOMing the bucketed write
    at 8g × 32 slots) are engine concerns, not ops guidance.  The
    explicit off-switch is ``route_giants=False`` (whole-doc path, no
    shard columns — the pre-round-8 behavior, kept for oracle-parity
    tests and single-footer consumers that cannot read shard
    coordinates).

    ``route_giants=True`` (default) runs the size-routed
    ``extract_auto`` so a pathological multi-thousand-page document
    takes the page-parallel path instead of stalling one task; its
    ``proc_us`` then covers the router's explode only (see
    ``extract_auto``), so giant-heavy buckets UNDERSTATE cpu_ms —
    docs/sec and error metrics are exact either way.

    ``shard_chars`` (default ``core.shard.DEFAULT_SHARD_CHARS`` when
    routing is on; requires ``route_giants=True`` when set
    explicitly): bound every output ROW — documents whose extracted
    text / span list exceed the threshold write as multiple
    ``(shard_idx, n_shards)`` rows under the ``core/shard.py`` rule,
    so the bucketed write never materializes one hundreds-of-MB row.
    Pass ``shard_chars=None`` for routing WITHOUT row sharding.  Read
    the output via :func:`read_extracted` (a mixed pre-shard/sharded
    directory needs schema MERGE, not single-footer inference);
    reassembly = ``operators.extract_paged.reassemble_sharded``
    over that reader's output; manifest metrics
    stay per-DOCUMENT (docs_in/errors count shard 0 only, rows_out
    sums span slices — a partition of the unsharded list).

    ``buckets`` (round-7): restrict THIS run to a bucket subset — the
    operational shape of a sharded backfill ("process buckets 0–127
    tonight"), and the natural long-lived-pipeline mode in which the
    manifest accretes one commit file per slice run.  Buckets outside
    the subset stay PENDING (no zero-row entries), so later runs pick
    them up; buckets inside that turn out empty are still marked done.
    Resume semantics inside the subset are unchanged.

    ``compact_after`` (retention policy, default 64): after this run's
    commit, if the manifest directory holds more than that many
    visible parquet files, :func:`compact_manifest` folds them into
    one — a long-lived pipeline's resume read stays O(compact_after)
    files instead of one-per-run forever.  Compaction keeps the
    commit-protocol guarantees (concurrent writers and killed runs
    lose nothing; see :func:`compact_manifest`).  ``None`` disables;
    object-store paths skip it automatically (local-FS-only op).
    """
    if shard_chars is _ENGINE_DEFAULT:
        from ..core.shard import DEFAULT_SHARD_CHARS
        shard_chars = DEFAULT_SHARD_CHARS if route_giants else None
    if buckets is not None:
        if not buckets:
            raise ValueError(
                "empty bucket slice — an inverted range like '31-16' "
                "parses to nothing; a silent no-op here would look "
                "like a completed backfill")
        bad = sorted(set(buckets) - set(range(n_buckets)))
        if bad:
            raise ValueError(
                f"bucket slice ids {bad} are outside "
                f"range(n_buckets={n_buckets}) — a silent intersect "
                "here would quietly shrink the backfill")
    _check_run_meta(out_dir, n_buckets)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    docs = with_bucket(documents, n_buckets)

    done = set(completed_buckets(spark, out_dir))
    # the id-space this run is responsible for: everything, or the
    # caller's bucket slice (sharded backfill / slice-run mode)
    scope = set(range(n_buckets)) if buckets is None \
        else set(buckets)
    target = sorted(scope - done)
    if buckets is None:
        pending = docs if not done \
            else docs.filter(~F.col("bucket").isin(*done))
    elif target:
        pending = docs.filter(F.col("bucket").isin(target))
    else:
        pending = docs.filter(F.lit(False))

    t0 = time.perf_counter()
    # bucket is a pure function of url — recompute it on the output
    # instead of joining back to the input (saves a full shuffle), then
    # co-locate each bucket in one task so partitionBy writes one file
    # per bucket dir instead of (tasks × buckets) small files.
    if shard_chars is not None and not route_giants:
        raise ValueError("shard_chars requires route_giants=True "
                         "(sharding lives on the routed path)")
    if route_giants:
        from ..operators.extract_paged import extract_auto
        extracted = extract_auto(pending, min_q, max_q, with_timing=True,
                                 shard_chars=shard_chars)
    else:
        extracted = extract(pending, min_q, max_q, with_timing=True)
    out = extracted.withColumn(
        "bucket", F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int"))

    ext_path = os.path.join(out_dir, "extracted")
    out_cols = ["url", "extracted_text", "spans", "status", "error"] \
        + (["shard_idx", "n_shards"] if shard_chars is not None else []) \
        + ["proc_us", "bucket"]
    sel = out.select(*out_cols)
    (sel.repartition(n_buckets, F.col("bucket"))
        .write.mode("overwrite").partitionBy("bucket").parquet(ext_path))
    wall_ms = int((time.perf_counter() - t0) * 1000)
    if route_giants:
        # the durable write above consumed the routed materialization;
        # release it so repeated runs in one session don't accumulate
        # cached extraction output (see extract_auto cache-lifetime note)
        from ..operators.extract_paged import release_routed_cache
        release_routed_cache(extracted)

    # per-bucket metrics from what was just written (read-back keeps the
    # numbers honest — they describe the durable output, not the plan).
    # Pending buckets are the id-space complement of the manifest — no
    # extra pass over the source.  Buckets that turned out empty still
    # get a zero-row manifest entry so resume never revisits them.
    # wall_ms is the RUN wall stamped on each of its bucket rows (group
    # by run_id for timing; the column is run-level).  cpu_ms and
    # docs_per_cpu_sec ARE per-bucket: summed from the in-task per-doc
    # proc_us column — the north rule's per-partition throughput metric.
    # read back under THIS run's explicit schema (all-nullable), never
    # schema inference: the stats below only describe pending buckets —
    # dirs the dynamic-partition overwrite just replaced with this
    # run's files — so the write schema IS their schema.  Inference
    # picks one arbitrary file footer, which on a mixed pre-shard /
    # sharded directory can hide shard_idx (a 75-shard giant would
    # count as docs_in=75), and fails outright when a slice run's
    # buckets produced zero rows (a partitioned write of no data emits
    # only _SUCCESS).  Files outside the pending buckets that lack a
    # column (old pre-proc_us or pre-shard dirs) read it as NULL and
    # are filtered out by the bucket predicate anyway.
    read_schema = StructType(
        [StructField(f.name, f.dataType, True) for f in sel.schema.fields])
    written = spark.read.schema(read_schema).parquet(ext_path)
    # coalesce: rows whose file lacks proc_us read NULL — sum as 0
    cpu_col = F.sum(F.coalesce(F.col("proc_us"), F.lit(0)))
    # sharded output: a document is counted once via its shard-0 row
    # (unsharded runs carry no shard_idx column — every row is the
    # document).  rows_out sums span-slice sizes, a partition of the
    # unsharded list, so it is shard-invariant by construction.
    doc0 = (F.coalesce(F.col("shard_idx"), F.lit(0)) == 0) \
        if "shard_idx" in read_schema.fieldNames() else F.lit(True)
    pending_buckets = target
    stats = {
        r["bucket"]: r
        for r in written.filter(F.col("bucket").isin(pending_buckets))
        .groupBy("bucket")
        .agg(
            F.sum(F.when(doc0, 1).otherwise(0)).alias("docs_in"),
            F.sum(F.size("spans")).alias("rows_out"),
            F.sum(F.when(doc0 & (F.col("status") == "error"), 1)
                  .otherwise(0)).alias("errors"),
            cpu_col.alias("cpu_us"),
        ).collect()
    } if pending_buckets else {}

    def row(b):
        s = stats.get(b)
        if s is None:
            return (run_id, b, "done", 0, 0, 0, wall_ms, 0, 0.0)
        cpu_us = s["cpu_us"] or 0
        cpu_ms = int(cpu_us // 1000)
        dps = float(s["docs_in"]) / (cpu_us / 1e6) if cpu_us else 0.0
        return (run_id, b, "done", int(s["rows_out"]), int(s["docs_in"]),
                int(s["errors"]), wall_ms, cpu_ms, dps)

    manifest_rows = [row(b) for b in pending_buckets]
    if manifest_rows:
        _commit_manifest(out_dir, run_id, manifest_rows, spark=spark)

    compaction = None
    if compact_after is not None and "://" not in out_dir:
        mdir = os.path.join(out_dir, "manifest")
        try:
            n_files = sum(
                1 for f in os.listdir(mdir)
                if f.endswith(".parquet") and not f.startswith("."))
        except FileNotFoundError:
            n_files = 0
        if n_files > compact_after:
            compaction = compact_manifest(out_dir)

    return {
        "run_id": run_id,
        "buckets_processed": len(pending_buckets),
        "buckets_skipped": len(scope & done),
        "wall_ms": wall_ms,
        "compaction": compaction,
    }
