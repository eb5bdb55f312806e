"""Star-CC scale evidence (round-4 verdict ask #6): measured
rounds/wall for large-star/small-star connected components on a
planted ≥1M-edge graph mixing long chains (high diameter — the case
that kills O(diameter) propagation) with dense cliques, at local[8]
and local[32] via spark-submit --py-files.

The O(log² n) claim gets a number: rounds must be ≤ 2·⌈log₂ n⌉ and
identical at both parallelism levels (rounds are a property of the
graph, not the cluster).

Usage: python scripts/starcc_bench.py
Appends the measured table to BENCH_SCALING.md (§star-CC).
"""

from __future__ import annotations

import json
import math
import os
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EDGES_DIR = "/tmp/starcc_edges"
# ~8.2M edges: large enough that per-round task COMPUTE dominates the
# fixed per-round scheduling latency (12 rounds × ~6 barrier stages) —
# on a 1.2M-edge plant the wall was latency-bound and ADDING cores
# slowed it down (measured 57→81 s, 8→32 threads)
N_CLIQUES, CLIQUE = 2_000, 90
N_CHAINS, CHAIN_LEN = 100, 2_000
CHAIN_BASE = 1_000_000
# identical shuffle partitioning for both runs: the A/B isolates
# executor parallelism, not partition-count effects
SHUFFLE_PARTS = 32


def materialize_edges() -> dict:
    """Deterministic planted graph, generated distributed (no driver
    loops): N_CLIQUES dense cliques (near-dup clusters) + N_CHAINS long
    chains (diameter CHAIN_LEN-1 template chains)."""
    from pyspark.sql import functions as F

    from exam_pdf_parser_spark.session import get_spark

    n_edges = N_CLIQUES * CLIQUE * (CLIQUE - 1) // 2 \
        + N_CHAINS * (CHAIN_LEN - 1)
    n_nodes = N_CLIQUES * CLIQUE + N_CHAINS * CHAIN_LEN
    expected = {"n_edges": n_edges, "n_nodes": n_nodes,
                "n_components": N_CLIQUES + N_CHAINS}
    marker = os.path.join(EDGES_DIR, "_PLANT_OK")
    if os.path.exists(marker):
        return expected

    shutil.rmtree(EDGES_DIR, ignore_errors=True)
    spark = get_spark("starcc-plant", master="local[32]")
    cs2 = CLIQUE * CLIQUE
    cliques = (
        spark.range(N_CLIQUES * cs2)
        .select(
            (F.col("id") / cs2).cast("long").alias("c"),
            ((F.col("id") / CLIQUE) % CLIQUE).cast("long").alias("i"),
            (F.col("id") % CLIQUE).alias("j"))
        .filter(F.col("i") < F.col("j"))
        .select((F.col("c") * CLIQUE + F.col("i")).alias("a"),
                (F.col("c") * CLIQUE + F.col("j")).alias("b"))
    )
    chains = (
        spark.range(N_CHAINS * (CHAIN_LEN - 1))
        .select(
            (F.col("id") / (CHAIN_LEN - 1)).cast("long").alias("chain"),
            (F.col("id") % (CHAIN_LEN - 1)).alias("k"))
        .select((F.lit(CHAIN_BASE) + F.col("chain") * CHAIN_LEN
                 + F.col("k")).alias("a"),
                (F.lit(CHAIN_BASE) + F.col("chain") * CHAIN_LEN
                 + F.col("k") + 1).alias("b"))
    )
    cliques.unionAll(chains).repartition(SHUFFLE_PARTS).write.mode(
        "overwrite").parquet(EDGES_DIR)
    spark.stop()
    open(marker, "w").close()
    return expected


def submit(cpus: int, expected_components: int) -> dict:
    from exam_pdf_parser_spark.session import package_zip

    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.environ.get("SPARK_HOME", "/opt/spark"), "bin", "spark-submit")
    cmd = [
        spark_submit,
        "--master", f"local[{cpus}]",
        "--driver-memory", "8g",
        "--py-files", package_zip(),
        os.path.join(os.path.dirname(__file__), "_starcc_job.py"),
        EDGES_DIR, str(cpus), str(expected_components), str(SHUFFLE_PARTS),
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=1800)
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{") and "rounds" in line:
            return json.loads(line)
    raise RuntimeError(
        f"no result line from spark-submit local[{cpus}]:\n"
        f"{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    exp = materialize_edges()
    low = submit(8, exp["n_components"])
    high = submit(32, exp["n_components"])

    n = exp["n_nodes"]
    round_bound = 2 * math.ceil(math.log2(n))
    assert low["rounds"] == high["rounds"], (low, high)
    assert low["rounds"] <= round_bound, (low["rounds"], round_bound)
    result = {
        **exp,
        "rounds": low["rounds"],
        "round_bound_2log2n": round_bound,
        "local[8]": {"wall_sec": low["wall_sec"]},
        "local[32]": {"wall_sec": high["wall_sec"]},
        "speedup": round(low["wall_sec"] / high["wall_sec"], 3),
    }
    print(json.dumps(result))

    md = f"""
## Star-CC scale evidence ({exp['n_edges']:,} edges, {n:,} nodes: \
{N_CLIQUES:,}×{CLIQUE}-cliques + {N_CHAINS}×{CHAIN_LEN:,}-node chains)

| parallelism | rounds | wall (s) | components found |
|---|---|---|---|
| local[8]  | {low['rounds']} | {low['wall_sec']} | {low['n_components']:,} |
| local[32] | {high['rounds']} | {high['wall_sec']} | {high['n_components']:,} |

Convergence in **{low['rounds']} rounds** against the 2·⌈log₂ n⌉ = \
{round_bound} bound — diameter-independent (the planted chains have \
diameter 1,999; min-label propagation would need ~2,000 rounds).  \
Rounds are identical at both parallelism levels (a property of the \
graph, not the cluster); wall speedup 8→32 cores: \
{low['wall_sec'] / high['wall_sec']:.2f}×.
"""
    with open("BENCH_SCALING_latest.md", "a") as f:
        f.write(md)


if __name__ == "__main__":
    main()
