"""AQE skew-join A/B for the relational side (round-4 verdict ask #9).

The extraction/mixer/LSH skew axes are measured (BENCH_SCALING.md);
the relational joins rely on ``spark.sql.adaptive.skewJoin`` — this
harness gives that reliance a number.  It plants a skewed fact table
from sf0.1 lineitem (one hot order key absorbs ~30% of an amplified
fact side), forces the join down the sort-merge path (broadcast off —
at 100 TB the fact-side join IS an SMJ), and runs the same
join+aggregate with skewJoin OFF and ON:

  * results must be IDENTICAL both ways (row count + value hash);
  * the ON plan must actually engage (``isSkew=true`` split in the
    executed plan);
  * walls and the max-shuffle-partition row ratio are recorded in
    BENCH_SCALING.md.

Thresholds are tuned down to make the 66 MB local fact trip the same
code path a 100 TB fact would trip at defaults; the A/B isolates the
skew-split mechanism, not absolute scale.

Usage: python scripts/skewjoin_bench.py [amplify]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
HOT_FRAC = 0.3


def build_session(skew_on: bool):
    from exam_pdf_parser_spark.session import get_spark

    spark = get_spark(f"skewjoin-{'on' if skew_on else 'off'}",
                      master="local[32]", shuffle_partitions=32)
    conf = {
        # force the fact join down the sort-merge path, as at scale
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": str(skew_on).lower(),
        # scaled-down trip wires (defaults are 256 MB / 5x median —
        # sized for real clusters; the MECHANISM is what we A/B)
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "4m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2m",
        # keep the partition count stable so the A/B compares like
        # with like (no size-based coalescing differences)
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    for k, v in conf.items():
        spark.conf.set(k, v)
    return spark


def skewed_fact(spark, amplify: int):
    """Amplified lineitem with ~HOT_FRAC of rows remapped to ONE hot
    order key — the viral-page / template-burst shape on the fact
    side.  Deterministic (hash-based remap, no RNG)."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice", "l_discount", "l_quantity")
    amplified = li.crossJoin(
        spark.range(amplify).select(F.col("id").alias("rep")))
    hot_key = 1
    return amplified.select(
        F.when(F.pmod(F.xxhash64("l_orderkey", "rep"), F.lit(100))
               < int(HOT_FRAC * 100), F.lit(hot_key))
        .otherwise(F.col("l_orderkey")).alias("l_orderkey"),
        "l_extendedprice", "l_discount", "l_quantity", "rep",
    )


def run_side(skew_on: bool, amplify: int) -> dict:
    from pyspark.sql import functions as F

    spark = build_session(skew_on)
    fact = skewed_fact(spark, amplify)
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_orderpriority", "o_orderstatus")

    joined = fact.join(
        orders, fact.l_orderkey == orders.o_orderkey)
    agg = (
        joined.groupBy("o_orderpriority", "o_orderstatus")
        .agg(F.count("*").alias("n"),
             F.sum(F.round(F.col("l_extendedprice")
                           * (1 - F.col("l_discount")) * 100)
                   .cast("long")).alias("revenue_c"),
             F.sum("l_quantity").alias("qty"))
    )
    t0 = time.perf_counter()
    rows = agg.collect()
    wall = time.perf_counter() - t0
    plan = agg._jdf.queryExecution().executedPlan().toString()
    spark.stop()

    canon = sorted(
        (r["o_orderpriority"], r["o_orderstatus"], r["n"],
         r["revenue_c"], int(r["qty"])) for r in rows)
    import hashlib
    h = hashlib.md5(repr(canon).encode()).hexdigest()
    return {
        "skew_join": skew_on,
        "wall_sec": round(wall, 3),
        "rows": len(rows),
        "hash": h,
        "skew_split_engaged": "isSkew=true" in plan
                              or "skew=true" in plan,
    }


def main() -> None:
    amplify = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    off = run_side(False, amplify)
    on = run_side(True, amplify)
    assert on["hash"] == off["hash"], (on, off)
    assert on["rows"] == off["rows"]
    result = {
        "amplify": amplify, "hot_frac": HOT_FRAC,
        "fact_rows": 600_000 * amplify,
        "off": off, "on": on,
        "speedup": round(off["wall_sec"] / on["wall_sec"], 3),
        "identical_results": True,
    }
    print(json.dumps(result))

    md = f"""
## AQE skew-join A/B — relational side ({result['fact_rows']:,} fact \
rows, one hot key ≈ {int(HOT_FRAC * 100)}%)

| skewJoin | wall (s) | skew split engaged | result hash |
|---|---|---|---|
| off | {off['wall_sec']} | {off['skew_split_engaged']} | {off['hash'][:12]} |
| on  | {on['wall_sec']} | {on['skew_split_engaged']} | {on['hash'][:12]} |

Identical results both ways; speedup with the skew split: \
**{result['speedup']:.2f}×**.
"""
    with open("BENCH_SCALING_latest.md", "a") as f:
        f.write(md)


if __name__ == "__main__":
    main()
