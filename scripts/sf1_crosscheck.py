"""One-off ~10x-gate-scale (sf~1-equivalent) crosscheck of the five
shuffle-heaviest oracled queries vs DuckDB (round-7 verdict ask #6).

sf0.1 is 10x the driver gate but still small; this script builds a
deterministic 10x-sf0.1 relational dataset in a SCRATCH dir (testdata
is read-only) and hash-checks the heavy queries against their own
baked-in DuckDB oracles at that scale:

  * ``revenue_by_nation``  — lineitem/orders/customer replicated 10x
    with key offsets (6M lineitem rows), nation/region verbatim;
  * ``ann_topk_dot``       — embeddings replicated 10x, interleaved
    vec_id = orig*10 + copy, each copy deterministically perturbed
    (+copy*1e-4 per element) so the 20k-candidate scan has no
    artificial 10-way ties;
  * ``minhash_lsh_pairs`` / ``simhash_near_pairs`` /
    ``dedup_cluster_assignment`` — documents replicated 10x,
    interleaved doc_id = orig*10 + copy, copies > 0 get one appended
    token (`` v<copy>``) so every original spawns a 10-strong
    near-dup group; the pair scope is widened 200 -> 2000 via
    ``SPARK_GRAFT_PAIR_SCOPE`` (read at import by operators/dedupe.py,
    which bakes the SAME bound into both the Spark plan and the oracle
    SQL), giving 10x the gate's docs-in-scope and a far denser pair
    graph (each 10-group alone is 45 true near-dup pairs).

Everything is derived from /root/testdata/sf0.1 by pure SQL — no
randomness, no wall-clock — so the run is reproducible bit-for-bit.
Writes ``CROSSCHECK_sf1.json`` at the repo root (the committed
artifact) and exits non-zero on any mismatch.  Timings are recorded
as a COLD first run plus best-of-``WARM_REPS`` warm reruns per side
(r8 verdict ask #4 — the r07 single-cold-run numbers baked ~8.5 s of
one-time standup into the headline and invited misreading).

Usage: python scripts/sf1_crosscheck.py [scratch_dir] [src_sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

# Must be set BEFORE any repo import: operators/dedupe.py reads it at
# module load and bakes it into the oracle f-strings.
SCOPE = int(os.environ.setdefault("SPARK_GRAFT_PAIR_SCOPE", "2000"))
# setdefault lets a stale shell export (e.g. 200 from a bench session)
# silently win and commit a non-record-scope CROSSCHECK_sf1.json — the
# committed artifact is valid at scope 2000 ONLY (CLAUDE.md restore
# invariant), so refuse anything else unless explicitly overridden for
# a scratch experiment via SPARK_GRAFT_SF1_ALLOW_SCOPE=1.
if SCOPE != 2000 and not os.environ.get("SPARK_GRAFT_SF1_ALLOW_SCOPE"):
    raise SystemExit(
        f"SPARK_GRAFT_PAIR_SCOPE={SCOPE} (probably a stale shell "
        "export): the committed CROSSCHECK_sf1.json is recorded at "
        "scope 2000 — unset the variable, or set "
        "SPARK_GRAFT_SF1_ALLOW_SCOPE=1 for a deliberate non-record run "
        "(and do NOT commit its artifact)")

COPIES = 10
# Timed WARM runs after the hash-checked cold run (r8 verdict ask #4:
# the r07 artifact's single-cold-run numbers invited misreading one-
# time standup — JVM/Arrow/plan-compile on the Spark side, first-touch
# parquet cache on DuckDB's — as steady-state query cost; the minhash
# gap adjudication showed ~8.5 s of the committed 15.8 s was standup).
WARM_REPS = 3
HEAVY = [
    "minhash_lsh_pairs",
    "simhash_near_pairs",
    "dedup_cluster_assignment",
    "revenue_by_nation",
    "ann_topk_dot",
]


def build_tables(con, src: str, out: str) -> dict[str, int]:
    """Materialize the 10x dataset into ``out`` (idempotent: skips
    tables whose parquet already exists)."""
    os.makedirs(out, exist_ok=True)
    cbase = con.sql(
        f"SELECT max(c_custkey)+1 FROM read_parquet('{src}/customer.parquet')"
    ).fetchone()[0]
    obase = con.sql(
        f"SELECT max(o_orderkey)+1 FROM read_parquet('{src}/orders.parquet')"
    ).fetchone()[0]
    cp = f"(SELECT unnest(generate_series(0, {COPIES - 1})) AS c) cp"
    defs = {
        "region": f"SELECT * FROM read_parquet('{src}/region.parquet')",
        "nation": f"SELECT * FROM read_parquet('{src}/nation.parquet')",
        "customer": f"""
            SELECT c_custkey + cp.c * {cbase} AS c_custkey,
                   c_name, c_nationkey, c_acctbal, c_mktsegment
            FROM read_parquet('{src}/customer.parquet'), {cp}""",
        "orders": f"""
            SELECT o_orderkey + cp.c * {obase} AS o_orderkey,
                   o_custkey + cp.c * {cbase} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM read_parquet('{src}/orders.parquet'), {cp}""",
        "lineitem": f"""
            SELECT l_orderkey + cp.c * {obase} AS l_orderkey,
                   l_partkey, l_suppkey, l_linenumber, l_quantity,
                   l_extendedprice, l_discount, l_tax, l_returnflag,
                   l_linestatus, l_shipdate
            FROM read_parquet('{src}/lineitem.parquet'), {cp}""",
        "documents": f"""
            SELECT doc_id * {COPIES} + cp.c AS doc_id,
                   CASE WHEN cp.c = 0 THEN text
                        ELSE text || ' v' || cp.c END AS text,
                   lang, source,
                   length(CASE WHEN cp.c = 0 THEN text
                               ELSE text || ' v' || cp.c END) AS n_chars
            FROM read_parquet('{src}/documents.parquet'), {cp}""",
        "embeddings": f"""
            SELECT vec_id * {COPIES} + cp.c AS vec_id,
                   list_transform(embedding,
                       x -> CAST(x + cp.c * 0.0001 AS FLOAT)) AS embedding,
                   label
            FROM read_parquet('{src}/embeddings.parquet'), {cp}""",
    }
    counts = {}
    for name, sql in defs.items():
        path = f"{out}/{name}.parquet"
        if not os.path.exists(path):
            # write-then-rename: a killed prior run must leave no
            # torn file that a rerun's existence check would trust
            tmp = f"{path}.tmp"
            con.sql(f"COPY ({sql}) TO '{tmp}' (FORMAT PARQUET)")
            os.replace(tmp, path)
        counts[name] = con.sql(
            f"SELECT count(*) FROM read_parquet('{path}')").fetchone()[0]
        expect = con.sql(f"SELECT count(*) FROM ({sql})").fetchone()[0]
        if counts[name] != expect:
            raise SystemExit(
                f"stale scratch table {path}: {counts[name]} rows on "
                f"disk vs {expect} from the current recipe — delete "
                f"the scratch dir and rerun")
    return counts


def main() -> int:
    import hashlib

    import duckdb

    scratch = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.environ.get("TMPDIR", "/tmp"), "epps_sf1")
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    con = duckdb.connect()
    t0 = time.monotonic()
    counts = build_tables(con, src, scratch)
    gen_sec = round(time.monotonic() - t0, 2)
    print(f"tables ready in {gen_sec}s: {counts}")

    import __spark_entry__ as entrymod
    from crosscheck import canon
    from exam_pdf_parser_spark.session import get_spark

    assert entrymod  # imported after env so PAIR_SCOPE is widened
    from exam_pdf_parser_spark.operators import dedupe
    assert dedupe.PAIR_SCOPE == SCOPE, (dedupe.PAIR_SCOPE, SCOPE)

    for t in counts:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{scratch}/{t}.parquet')")

    spark = get_spark("sf1_crosscheck")  # local[$SPARK_GRAFT_CPUS]
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    report: dict[str, dict] = {}
    failures: list[str] = []
    for name in HEAVY:
        t0 = time.monotonic()
        sdf = queries[name](spark, scratch).toPandas()
        spark_cold = round(time.monotonic() - t0, 3)
        spark_warm_runs = []
        for _ in range(WARM_REPS):
            t0 = time.monotonic()
            queries[name](spark, scratch).toPandas()
            spark_warm_runs.append(round(time.monotonic() - t0, 3))
        t0 = time.monotonic()
        ddf = con.sql(oracles[name]).df()
        duck_cold = round(time.monotonic() - t0, 3)
        duck_warm_runs = []
        for _ in range(WARM_REPS):
            t0 = time.monotonic()
            con.sql(oracles[name]).df()
            duck_warm_runs.append(round(time.monotonic() - t0, 3))
        scols, dcols = sorted(sdf.columns), sorted(ddf.columns)
        entry = {"spark_rows": len(sdf), "oracle_rows": len(ddf),
                 "rows_match": len(sdf) == len(ddf),
                 "schema_match": scols == dcols, "hash_match": False,
                 "spark_cold_sec": spark_cold,
                 "spark_warm_sec": min(spark_warm_runs),
                 "spark_warm_runs": spark_warm_runs,
                 "duck_cold_sec": duck_cold,
                 "duck_warm_sec": min(duck_warm_runs),
                 "duck_warm_runs": duck_warm_runs}
        report[name] = entry
        if scols == dcols:
            a = canon(sdf.to_dict("records"), scols)
            b = canon(ddf.to_dict("records"), dcols)
            entry["hash_match"] = a == b
            entry["value_hash"] = hashlib.md5(
                json.dumps(a).encode()).hexdigest()
            if a != b:
                for i in [i for i, (x, y) in enumerate(zip(a, b))
                          if x != y][:2]:
                    print(f"   spark: {a[i] if i < len(a) else '-'}")
                    print(f"   duck : {b[i] if i < len(b) else '-'}")
        ok = (entry["rows_match"] and entry["schema_match"]
              and entry["hash_match"])
        if not ok:
            failures.append(name)
        print(f"{name:28s} {'OK' if ok else 'MISMATCH'} "
              f"rows={len(sdf)} "
              f"spark={spark_cold}s/warm {min(spark_warm_runs)}s "
              f"duck={duck_cold}s/warm {min(duck_warm_runs)}s")
    spark.stop()

    out = os.path.join(REPO, "CROSSCHECK_sf1.json")
    with open(out, "w") as f:
        json.dump({
            "recipe": {
                "src": src, "copies": COPIES, "pair_scope": SCOPE,
                "doc_variant": "interleaved doc_id*10+c; c>0 appends "
                               "' v<c>' token",
                "emb_variant": "interleaved vec_id*10+c; +c*1e-4/element",
                "keys": "custkey/orderkey offset by copy*max+1",
            },
            "table_rows": counts,
            "gen_sec": gen_sec,
            "timing_note": (
                "cold = first run in the session (carries one-time "
                "standup: plan compile / Arrow init on the Spark "
                "side, first-touch parquet cache on DuckDB's); warm "
                f"= best of {WARM_REPS} immediate reruns — the "
                "steady-state number (r8 minhash-gap lesson)"),
            "failures": failures,
            "results": report,
        }, f, indent=1)
    print(f"\n{len(failures)} failures: {failures} -> {out}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
