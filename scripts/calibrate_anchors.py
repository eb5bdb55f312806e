"""Regenerate ANCHOR_BANDS.json (round-8 verdict ask #3).

The anchor bands define what "healthy host" means for every bench
artifact, so recalibration must be deliberate and leave a trail:

Measurement discipline (also summarized in the artifact's
``discipline`` field):

1. Run at the record config ONLY — sf0.1 input present, local[32],
   default PAIR_SCOPE (the script enforces all three).
2. Never concurrently with another CPU-heavy job (pytest gate, soak,
   scaling bench) — shared-VM contention would bake a degraded phase
   into the definition of healthy.
3. The script first grades this session's fresh probe mins against the
   EXISTING bands; if any anchor reads degraded, the host is in a bad
   phase and calibration is refused (``--force`` overrides, for the
   case where the code under the probe legitimately changed).
4. Bands = [min(runs) * LO_MARGIN, max(runs) * HI_MARGIN] over
   ``--reps`` warm runs (first run of each probe is discarded as
   plan-compile/JIT warmup, same discipline as bench.py's best-of-N).
5. Dry-run by default: prints the proposed JSON.  ``--write`` commits
   it to ANCHOR_BANDS.json; commit the file in the same change as the
   reason for recalibrating (test_anchor_bands_artifact pins age and
   shape).

Usage: python scripts/calibrate_anchors.py [--reps N] [--write] [--force]
"""

from __future__ import annotations

import argparse
import datetime
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LO_MARGIN = 0.80   # fast edge: generous — faster than band is healthy
HI_MARGIN = 1.15   # slow edge: the contention-signal boundary
DPS_LO, DPS_HI = 0.85, 1.15   # higher-is-better (docs/sec) margins


def current_round() -> int:
    """The round in progress = highest committed BENCH_r{N} + 1 (the
    driver writes BENCH_r{N}.json at the END of round N)."""
    rounds = [int(m.group(1)) for f in glob.glob(f"{REPO}/BENCH_r*.json")
              if (m := re.search(r"BENCH_r(\d+)\.json$", f))]
    return (max(rounds) + 1) if rounds else 1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=4,
                    help="timed runs per probe AFTER the discarded warmup")
    ap.add_argument("--write", action="store_true")
    ap.add_argument("--force", action="store_true",
                    help="calibrate even if the existing bands grade "
                         "this session degraded (probe code changed)")
    ap.add_argument("--note", default=None,
                    help="why this recalibration happened (host drift "
                         "vs original band tightness, which finding "
                         "triggered it) — stored as recalibration_note")
    args = ap.parse_args()

    import bench
    import __spark_entry__ as entrymod
    from exam_pdf_parser_spark.session import get_spark

    old = bench.load_anchor_bands()
    cfg = old["config"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").split("sf")[-1])
    if (sf, cpus, bench._pair_scope()) != (
            cfg["sf"], cfg["cpus"], cfg["pair_scope"]):
        raise SystemExit(
            f"calibration requires the record config sf={cfg['sf']} "
            f"local[{cfg['cpus']}] pair_scope={cfg['pair_scope']}; got "
            f"sf={sf} cpus={cpus} scope={bench._pair_scope()}")

    spark = get_spark("calibrate-anchors", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    qmap = entrymod.queries()
    spark.range(1000).selectExpr("sum(id)").collect()
    reps = args.reps + 1   # +1 warmup run, discarded below

    from pyspark.sql import functions as F

    from exam_pdf_parser_spark.operators.extract import extract

    print("probing (warm run discarded per probe)...")
    jvm = bench._jvm_anchor_runs(spark, reps)[1:]
    shuffle = bench._shuffle_anchor_runs(spark, reps)[1:]
    band = bench._band_anchor_runs(qmap, spark, reps)[1:]
    frozen_df = bench._frozen_corpus(spark, sf_dir).repartition(
        cpus * 4).persist()
    n_frozen = frozen_df.count()
    extract(frozen_df).select(F.count("*")).collect()   # warm pass
    dps = []
    for _ in range(args.reps):
        import time
        t0 = time.perf_counter()
        extract(frozen_df).select(F.count("*")).collect()
        dps.append(n_frozen / (time.perf_counter() - t0))
    frozen_df.unpersist()
    spark.stop()

    fresh = {
        "jvm_anchor_sec": jvm,
        "shuffle_anchor_sec": shuffle,
        "band_anchor_sec": band,
        "frozen_docs_per_sec": dps,
    }
    # refuse to redefine "healthy" from inside a degraded phase
    state = bench._host_state(
        min(jvm), min(shuffle), max(dps), calibrated=True,
        band_anchor=min(band) if band else None, bands_doc=old)
    print("fresh mins vs existing bands:",
          json.dumps(state["anchors"], indent=1))
    if state["verdict"] == "degraded" and not args.force:
        raise SystemExit(
            "host grades DEGRADED against the existing bands — "
            "calibrating now would bake contention into the healthy "
            "definition; retry in a healthy phase or --force if the "
            "probe code itself changed")

    rnd = current_round()
    doc = json.loads(json.dumps(old))   # deep copy, keep discipline text
    doc["round"] = rnd
    doc["date"] = datetime.date.today().isoformat()
    if args.note:
        doc["recalibration_note"] = args.note
    for name, runs in fresh.items():
        runs_r = [round(r, 3) for r in runs]
        spec = doc["bands"][name]
        if spec["lower_is_better"]:
            lo = round(min(runs) * LO_MARGIN, 3)
            hi = round(max(runs) * HI_MARGIN, 3)
        else:
            lo = round(min(runs) * DPS_LO, 1)
            hi = round(max(runs) * DPS_HI, 1)
        spec.update({
            "band": [lo, hi],
            "calibrated_round": rnd,
            "calibration_runs": runs_r,
            "provenance": (
                f"r{rnd:02d} calibrate_anchors.py: {len(runs_r)} warm "
                f"runs {min(runs_r)}-{max(runs_r)} (warmup discarded), "
                f"margins {LO_MARGIN}/{HI_MARGIN}"
                if spec["lower_is_better"] else
                f"r{rnd:02d} calibrate_anchors.py: {len(runs_r)} warm "
                f"runs {min(runs_r)}-{max(runs_r)} docs/s (warmup "
                f"discarded), margins {DPS_LO}/{DPS_HI}"),
        })
    out = json.dumps(doc, indent=1)
    if args.write:
        with open(os.path.join(REPO, "ANCHOR_BANDS.json"), "w") as f:
            f.write(out + "\n")
        print("wrote ANCHOR_BANDS.json")
    else:
        print(out)
        print("\n(dry run — pass --write to commit)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
