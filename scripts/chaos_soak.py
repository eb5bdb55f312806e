"""Chaos soak: kill -9 mid-slice and mid-compaction at 240k docs,
then resume (round-8 verdict ask #3).

Killed-run atomicity is unit-tested
(``test_killed_run_never_marks_done_without_data``) but was never
demonstrated at soak scale with compaction mid-flight.  This script
drives the committed 240k / 64-bucket slice topology and injects two
real SIGKILLs:

  1. **mid-bucket**: a victim slice run is killed from OUTSIDE
     (``os.killpg`` → python AND the JVM) while its durable write is
     in flight — detected by the appearance of Spark's staging dir
     under ``extracted/`` plus a fixed in-write delay, so task files
     exist but the manifest commit has not happened;
  2. **mid-compaction**: ``compact_manifest`` self-kills via its
     ``_race_hook`` — after the compacted file's rename, before the
     old files are unlinked, i.e. the exact moment duplicate manifest
     rows are visible on disk.

A plain resume then completes the corpus, and the final output must be
byte-identical (order-insensitive md5, same hash recipe as
``compaction_soak_bench.py``) to the committed uninterrupted value
(BASELINE.md ``91ab2c7fa08b0d176876b8cacc6d3a10`` for the canonical
240k corpus), with

  * the killed slice's buckets absent from ``completed_buckets``
    after the kill (atomicity at scale);
  * the resume processing EXACTLY the not-yet-committed buckets
    (zero double-processed buckets: every bucket's manifest rows come
    from exactly one run_id);
  * a sane final manifest file count (compaction converges despite
    the mid-compaction corpse).

Every Spark phase runs in its own subprocess so a kill takes down a
real driver+JVM, not a thread.  Usage:

    python scripts/chaos_soak.py            # full orchestration
    python scripts/chaos_soak.py <child> …  # internal

Prints one JSON line; recorded in BASELINE.md §chaos-soak.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

CORPUS_DIR = "/tmp/scaling_corpus"      # shared with compaction_soak_bench
OUT = "/tmp/chaos_soak_out"
N_DOCS = 240_000
N_BUCKETS = 64
N_SLICES = 16                           # 4 buckets per slice
CLEAN_SLICES = 6                        # slices 0..5 commit normally
VICTIM = 6                              # slice 6 is SIGKILLed mid-write
# the committed uninterrupted-run md5 for this corpus+topology family
# (BASELINE.md, rounds 6/7/8 — invariant across defaults regimes)
EXPECTED_MD5 = "91ab2c7fa08b0d176876b8cacc6d3a10"


def _spark():
    from exam_pdf_parser_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return get_spark("chaos-soak", master=f"local[{cpus}]",
                     shuffle_partitions=int(cpus))


def _docs(spark):
    from exam_pdf_parser_spark.operators.extract import corpus_df

    marker = os.path.join(CORPUS_DIR, "_SOAK_N")
    if not (os.path.exists(marker)
            and open(marker).read() == str(N_DOCS)):
        corpus_df(spark, N_DOCS, partitions=128).write.mode(
            "overwrite").parquet(CORPUS_DIR)
        with open(marker, "w") as f:
            f.write(str(N_DOCS))
    return spark.read.parquet(CORPUS_DIR)


def _slice_buckets(i: int) -> list[int]:
    per = N_BUCKETS // N_SLICES
    hi = N_BUCKETS if i == N_SLICES - 1 else (i + 1) * per
    return list(range(i * per, hi))


# --- children (each its own driver+JVM) --------------------------------------

def child_slices(lo: int, hi: int) -> int:
    """Run slices lo..hi-1 cleanly (compaction deliberately off so
    manifest files ACCRETE — the mid-compaction kill needs them)."""
    from exam_pdf_parser_spark.sources.manifest import run_extraction

    spark = _spark()
    docs = _docs(spark)
    for i in range(lo, hi):
        run_extraction(spark, docs, OUT, f"slice-{i:02d}",
                       n_buckets=N_BUCKETS, buckets=_slice_buckets(i))
        print(f"SLICE-DONE {i}", flush=True)
    spark.stop()
    return 0


def child_victim(i: int) -> int:
    """Run slice i; the PARENT kills this process group mid-write."""
    from exam_pdf_parser_spark.sources.manifest import run_extraction

    spark = _spark()
    docs = _docs(spark)
    print(f"VICTIM-START {i}", flush=True)
    run_extraction(spark, docs, OUT, f"victim-{i:02d}",
                   n_buckets=N_BUCKETS, buckets=_slice_buckets(i))
    print(f"VICTIM-SURVIVED {i}", flush=True)   # parent treats as failure
    spark.stop()
    return 0


def child_compact_kill() -> int:
    """compact_manifest with a SIGKILL _race_hook: dies after the
    compacted file's rename, before the old files are unlinked.  No
    Spark needed — this is the pure pyarrow/os path."""
    from exam_pdf_parser_spark.sources.manifest import compact_manifest

    compact_manifest(
        OUT, _race_hook=lambda: os.kill(os.getpid(), signal.SIGKILL))
    print("COMPACT-SURVIVED", flush=True)       # unreachable on success
    return 1


def child_verify_killed() -> int:
    """Post-kill invariants: the victim's buckets are NOT marked done,
    everything the clean slices committed is."""
    from exam_pdf_parser_spark.sources.manifest import completed_buckets

    spark = _spark()
    done = set(completed_buckets(spark, OUT))
    want = {b for i in range(CLEAN_SLICES) for b in _slice_buckets(i)}
    assert done == want, (sorted(done), sorted(want))
    print(json.dumps({"done_after_kill": sorted(done)}), flush=True)
    spark.stop()
    return 0


def child_resume() -> int:
    """Unrestricted resume over the wreckage (killed write + killed
    compaction): must process exactly the un-committed buckets."""
    from exam_pdf_parser_spark.sources.manifest import run_extraction

    spark = _spark()
    docs = _docs(spark)
    t0 = time.perf_counter()
    stats = run_extraction(spark, docs, OUT, "resume",
                           n_buckets=N_BUCKETS, compact_after=4)
    stats["resume_wall_sec"] = round(time.perf_counter() - t0, 2)
    print("RESUME " + json.dumps(stats), flush=True)
    spark.stop()
    return 0


def child_final_verify() -> int:
    """Content + manifest invariants after the full chaos sequence."""
    from pyspark.sql import functions as F

    from compaction_soak_bench import _output_md5

    spark = _spark()
    md5 = _output_md5(spark, OUT)
    mdf = spark.read.parquet(os.path.join(OUT, "manifest")) \
        .filter(F.col("status") == "done")
    per_bucket = (mdf.groupBy("bucket")
                  .agg(F.countDistinct("run_id").alias("n_runs"))
                  .collect())
    multi = sorted(r["bucket"] for r in per_bucket if r["n_runs"] > 1)
    mdir = os.path.join(OUT, "manifest")
    n_files = sum(1 for f in os.listdir(mdir)
                  if f.endswith(".parquet") and not f.startswith("."))
    out = {
        "output_md5": md5,
        "md5_matches_committed": md5 == EXPECTED_MD5,
        "distinct_buckets_done": len(per_bucket),
        "double_processed_buckets": multi,
        "manifest_files_final": n_files,
        "output_rows": spark.read.parquet(f"{OUT}/extracted").count(),
    }
    print("FINAL " + json.dumps(out), flush=True)
    spark.stop()
    assert md5 == EXPECTED_MD5, (md5, EXPECTED_MD5)
    assert len(per_bucket) == N_BUCKETS
    assert not multi, multi
    return 0


# --- orchestration ------------------------------------------------------------

def _run_child(*args: str) -> subprocess.CompletedProcess:
    p = subprocess.run(
        [sys.executable, os.path.abspath(__file__), *args],
        capture_output=True, text=True)
    if p.returncode != 0:
        sys.stderr.write(p.stdout[-4000:] + p.stderr[-4000:])
        raise SystemExit(f"child {args} rc={p.returncode}")
    return p


def _kill_victim_mid_write() -> dict:
    """Spawn the victim slice in its own process GROUP and SIGKILL the
    whole group (python + JVM) once the durable write is in flight."""
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "victim",
         str(VICTIM)],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        start_new_session=True)
    staging = [os.path.join(OUT, "extracted", ".spark-staging-*"),
               os.path.join(OUT, "extracted", "_temporary")]
    trigger, deadline = None, time.monotonic() + 300
    while time.monotonic() < deadline:
        if proc.poll() is not None:
            raise SystemExit(
                "victim finished before the kill landed — staging dir "
                f"never observed (rc={proc.returncode}); the write "
                "window was missed, rerun")
        hits = [p for pat in staging for p in glob.glob(pat)]
        if hits:
            trigger = os.path.basename(hits[0])
            break
        time.sleep(0.05)
    if trigger is None:
        os.killpg(proc.pid, signal.SIGKILL)
        raise SystemExit("victim hung: no staging dir within 300s")
    time.sleep(1.0)                     # land INSIDE the write
    # r10 (r8 ADVICE #3): the fixed delay can lose the race — the
    # victim may finish its first bucket (or exit) inside the window,
    # in which case the downstream kill assertions would fail on a
    # bare assert instead of the explicit rerun exit used for the
    # pre-staging race.  Re-check before killing, and treat a
    # process that vanished between poll and killpg the same way.
    if proc.poll() is not None:
        raise SystemExit(
            f"victim exited (rc={proc.returncode}) before the kill "
            "landed; the write window was missed, rerun")
    t_kill = time.monotonic()
    try:
        os.killpg(proc.pid, signal.SIGKILL)
    except ProcessLookupError:
        raise SystemExit(
            "victim vanished between poll and killpg; the write "
            "window was missed, rerun") from None
    proc.wait()
    return {"trigger": trigger, "victim_rc": proc.returncode,
            "killed_at_monotonic": t_kill}


def orchestrate() -> int:
    shutil.rmtree(OUT, ignore_errors=True)

    # phase 1: clean slices (manifest files accrete, no compaction)
    t0 = time.perf_counter()
    _run_child("slices", "0", str(CLEAN_SLICES))
    clean_wall = round(time.perf_counter() - t0, 1)

    # phase 2: SIGKILL a slice mid-durable-write
    kill1 = _kill_victim_mid_write()
    assert kill1["victim_rc"] == -signal.SIGKILL, kill1

    # phase 3: atomicity check — victim committed nothing
    _run_child("verify-killed")

    # phase 4: SIGKILL compact_manifest between rename and cleanup
    p = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "compact-kill"],
        capture_output=True, text=True)
    assert p.returncode == -signal.SIGKILL, (
        p.returncode, p.stdout[-500:], p.stderr[-500:])
    mdir = os.path.join(OUT, "manifest")
    files_after_corpse = sorted(
        f for f in os.listdir(mdir)
        if f.endswith(".parquet") and not f.startswith("."))
    # the corpse state: compacted file VISIBLE, originals not yet
    # removed — duplicate rows on disk, which readers dedup
    assert any(f.startswith("part-compact-") for f in files_after_corpse)
    assert len(files_after_corpse) == CLEAN_SLICES + 1, files_after_corpse

    # phase 5: resume completes the corpus
    t0 = time.perf_counter()
    pr = _run_child("resume")
    resume_wall = round(time.perf_counter() - t0, 1)
    stats = json.loads(
        [ln for ln in pr.stdout.splitlines()
         if ln.startswith("RESUME ")][0][len("RESUME "):])
    expect_pending = N_BUCKETS - CLEAN_SLICES * (N_BUCKETS // N_SLICES)
    assert stats["buckets_processed"] == expect_pending, stats
    assert stats["buckets_skipped"] == N_BUCKETS - expect_pending, stats

    # phase 6: content + manifest invariants
    pf = _run_child("final-verify")
    final = json.loads(
        [ln for ln in pf.stdout.splitlines()
         if ln.startswith("FINAL ")][0][len("FINAL "):])

    print(json.dumps({
        "metric": "chaos-soak",
        "n_docs": N_DOCS, "n_buckets": N_BUCKETS,
        "topology": f"{N_SLICES} slices; {CLEAN_SLICES} clean, "
                    f"slice {VICTIM} SIGKILLed mid-write, "
                    "compact_manifest SIGKILLed post-rename, resume",
        "clean_slices_wall_sec": clean_wall,
        "kill1": kill1,
        "manifest_files_after_compact_corpse": len(files_after_corpse),
        "resume_stats": stats,
        "resume_child_wall_sec": resume_wall,
        **final,
    }))
    return 0


def main() -> int:
    if len(sys.argv) == 1:
        return orchestrate()
    cmd = sys.argv[1]
    if cmd == "slices":
        return child_slices(int(sys.argv[2]), int(sys.argv[3]))
    if cmd == "victim":
        return child_victim(int(sys.argv[2]))
    if cmd == "compact-kill":
        return child_compact_kill()
    if cmd == "verify-killed":
        return child_verify_killed()
    if cmd == "resume":
        return child_resume()
    if cmd == "final-verify":
        return child_final_verify()
    raise SystemExit(f"unknown child command {cmd!r}")


if __name__ == "__main__":
    raise SystemExit(main())
