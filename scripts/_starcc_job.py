"""spark-submit job for the star-CC scale bench: read the planted
edge parquet, run large-star/small-star connected components, print one
JSON line {wall_sec, rounds, n_components, n_nodes}.

Argv: edges_dir cpus expected_components shuffle_partitions
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    edges_dir, cpus, expected = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    shuffle_parts = int(sys.argv[4]) if len(sys.argv) > 4 else cpus * 4

    from pyspark.sql import SparkSession

    from exam_pdf_parser_spark.operators.dedupe import connected_components

    spark = (
        SparkSession.builder.appName(f"starcc-{cpus}")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_parts))
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    pairs = spark.read.parquet(edges_dir)
    n_edges = pairs.count()          # warm the input before timing

    stats: dict = {}
    t0 = time.perf_counter()
    labels = connected_components(
        pairs, src="a", dst="b", max_iter=50, stats=stats)
    n_nodes = labels.count()
    wall = time.perf_counter() - t0
    n_comp = labels.select("component").distinct().count()
    assert n_comp == expected, (n_comp, expected)

    print(json.dumps({
        "cpus": cpus, "n_edges": n_edges, "n_nodes": n_nodes,
        "n_components": n_comp, "rounds": stats["rounds"],
        "wall_sec": round(wall, 3),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
