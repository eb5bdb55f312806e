"""Similarity search over the ``embeddings`` table
(``embedding: array<float>``, 64-dim).

Two tiers:
  * **driver-checked exact tier** (this module's QUERIES): embeddings
    quantized per-element to integers (``floor(x*1000 + 0.5)``) so dot
    products are order-independent integer sums — bit-exact in Spark
    AND DuckDB (integer-valued doubles below 2^53 sum exactly).
    Brute-force top-k and near-dup pairs are value-hash comparable.
  * **fast float tier** (``cosine_topk_pandas``): Arrow-batched numpy
    matmul Pandas-UDF path for real workloads, plus an LSH-bucketed
    variant (random-hyperplane signs) that prunes the candidate space
    — the 100 TB scale path where brute force is a cross join.
"""

from __future__ import annotations

import warnings
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.io import load

QUERIES: dict = {}
ORACLE: dict[str, str] = {}

N_QUERY_VECS = 25      # vec_id bound for the top-k demo
TOP_K = 5
NEAR_DUP_SCOPE = 300   # vec_id bound for pairwise near-dup
QUANT = 1000
# lsh_bucketed_topk: max estimated size of the exploded probe set we
# will force-broadcast; larger query frames fall back to a shuffle join
_BROADCAST_PROBE_CAP_BYTES = 128 << 20


def register(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn
    return deco


def _quantized(col):
    # floor(x*1000 + 0.5): identical IEEE result in both engines
    # (unlike round(), whose half-rule differs across dialects).
    return F.transform(
        col, lambda x: F.floor(x.cast("double") * QUANT + 0.5).cast("bigint"))


def _dot_q(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


_DUCK_QUANT = f"list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * {QUANT} + 0.5))"


# --- brute-force top-k by quantized inner product ---------------------------
@register("ann_topk_dot", f"""
    WITH q AS (SELECT vec_id, {_DUCK_QUANT} AS qv FROM embeddings
               WHERE vec_id < {N_QUERY_VECS}),
         c AS (SELECT vec_id, {_DUCK_QUANT} AS qv FROM embeddings)
    SELECT query_id, neighbor_id, dot_q, rk FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             CAST(list_dot_product(q.qv, c.qv) AS BIGINT) AS dot_q,
             row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY CAST(list_dot_product(q.qv, c.qv) AS BIGINT) DESC,
                          c.vec_id) AS rk
      FROM q, c WHERE q.vec_id <> c.vec_id)
    WHERE rk <= {TOP_K}
""")
def ann_topk_dot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k by quantized inner product.

    r10 optimization (guide §4.2): the old plan broadcast the ≤25
    query vectors into a BroadcastNestedLoopJoin and computed every
    dot product with Catalyst higher-order functions
    (``aggregate(zip_with(...))`` — interpreted per element, no
    codegen): 3.0 s of the 3.7 s query at sf1 was that scoring
    subtree.  Scoring now runs as ONE numpy int64 GEMM per Arrow
    batch inside ``mapInPandas`` with a per-task top-k prune, so the
    shuffle to the final ranking window carries ~tasks × 25 × k rows
    instead of 25 × corpus.  Exactness is unchanged: quantization is
    the same IEEE ``floor(cast(float as double) * 1000 + 0.5)``
    (float64 widening is exact), int64 dots of quantized values are
    order-independent exact integers, and the per-task prune keeps
    the k best under the SAME total order (dot_q desc, neighbor_id
    asc) the global window ranks by — the global top-k therefore
    survives pruning bit-for-bit (hash-checked against the unchanged
    DuckDB oracle).  The ≤``N_QUERY_VECS`` query rows are collected
    driver-side (bounded by contract, same pattern as
    ``cosine_topk_pandas``) and ship as one broadcast int64 matrix.
    """
    e = load(spark, sf_dir, "embeddings")
    qrows = (e.filter(F.col("vec_id") < N_QUERY_VECS)
             .select("vec_id", "embedding").collect())
    out_schema = "query_id: long, neighbor_id: long, dot_q: long"
    if not qrows:    # empty query set → empty result, same schema
        return spark.createDataFrame(
            [], out_schema + ", rk: int")
    q_ids = [int(r["vec_id"]) for r in qrows]
    # quantized query vectors; None stays None (NULL-embedding query).
    # The 25×64 matrix is tiny — it ships inside the task closure, so
    # there is no per-call sc.broadcast to leak over a long session.
    q_vecs = [
        None if r["embedding"] is None else
        np.floor(np.asarray(r["embedding"], dtype=np.float64)
                 * QUANT + 0.5).astype(np.int64)
        for r in qrows
    ]

    # NULL-tolerance contract (matches the replaced Catalyst
    # expression path exactly): zip_with pads length-mismatched arrays
    # with NULL and aggregate(+) absorbs it, so a NULL embedding on
    # EITHER side, or ANY length mismatch, produced dot_q = NULL —
    # ranked after every non-NULL dot by the window's DESC NULLS LAST,
    # tie-broken by neighbor_id asc.  The scorer therefore groups
    # corpus rows by array length, GEMMs each query against its own
    # length group (the hot path: one uniform group), and emits
    # null-dot candidates (the TOP_K+1 smallest neighbor ids per task
    # — enough to reconstruct any global top-k suffix) for everything
    # else, instead of crashing the task on a NULL/ragged row.
    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_q = len(q_ids)
        best_d = [[] for _ in range(n_q)]     # per-query valid pools
        best_n = [[] for _ in range(n_q)]
        null_n = [[] for _ in range(n_q)]     # per-query NULL-dot pools
        for pdf in batches:
            if not len(pdf):
                continue
            nids = pdf["vec_id"].to_numpy().astype(np.int64)
            embs = pdf["embedding"].to_numpy()
            lens = np.array([-1 if v is None else len(v) for v in embs])
            mats = {}
            for ln in np.unique(lens):
                if ln < 0:
                    continue
                idx = np.nonzero(lens == ln)[0]
                m = np.stack([embs[i] for i in idx]).astype(np.float64)
                mats[int(ln)] = (
                    idx, np.floor(m * QUANT + 0.5).astype(np.int64))
            for j in range(n_q):
                qv = q_vecs[j]
                grp = mats.get(len(qv)) if qv is not None else None
                if grp is not None:
                    idx, qc = grp
                    d = qc @ qv                       # exact int64 dots
                    n = nids[idx]
                    keep = n != q_ids[j]
                    d, n = d[keep], n[keep]
                    if len(n):
                        # same total order as the ranking window:
                        # dot desc, neighbor_id asc (lexsort: last
                        # key primary)
                        order = np.lexsort((n, -d))[:TOP_K]
                        best_d[j].append(d[order])
                        best_n[j].append(n[order])
                    null_mask = lens != len(qv)
                else:
                    null_mask = np.ones(len(nids), dtype=bool)
                nn = nids[null_mask]
                nn = nn[nn != q_ids[j]]
                if len(nn):
                    null_n[j].append(np.sort(nn)[:TOP_K + 1])
        out = {"query_id": [], "neighbor_id": [], "dot_q": []}
        for j in range(n_q):
            if best_n[j]:
                d = np.concatenate(best_d[j])
                n = np.concatenate(best_n[j])
                order = np.lexsort((n, -d))[:TOP_K]
                out["query_id"].extend([q_ids[j]] * len(order))
                out["neighbor_id"].extend(int(x) for x in n[order])
                out["dot_q"].extend(int(x) for x in d[order])
            if null_n[j]:
                nn = np.sort(np.concatenate(null_n[j]))[:TOP_K + 1]
                out["query_id"].extend([q_ids[j]] * len(nn))
                out["neighbor_id"].extend(int(x) for x in nn)
                out["dot_q"].extend([None] * len(nn))
        if out["query_id"]:
            yield pd.DataFrame(
                {k: pd.Series(v, dtype="object") for k, v in out.items()})

    scored = e.select("vec_id", "embedding").mapInPandas(score, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("dot_q"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
    )


# --- embedding near-duplicate pairs (quantized cosine threshold) -------------
# The synthetic embeddings are near-orthogonal (max pairwise cosine
# ≈ 0.51 at sf0.01), so a production-style 0.9+ near-dup threshold
# returns the empty set and the oracle hash proves nothing (round-4
# verdict: vacuous row).  The DEMO threshold sits in the distribution's
# upper tail instead — ~100 pairs at sf0.01 and sf0.1 — so the gate
# hash covers real values; semantics (thresholded quantized cosine) are
# unchanged, and the realistic-threshold behavior is covered by the LSH
# twin's planted-cluster tests.
NEAR_DUP_COS = 0.35


@register("embedding_near_dups", f"""
    WITH v AS (SELECT vec_id, {_DUCK_QUANT} AS qv FROM embeddings
               WHERE vec_id < {NEAR_DUP_SCOPE}),
         n AS (SELECT vec_id, qv,
                      CAST(list_dot_product(qv, qv) AS BIGINT) AS norm2
               FROM v)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           CAST(list_dot_product(a.qv, b.qv) AS BIGINT) AS dot_q
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE CAST(list_dot_product(a.qv, b.qv) AS BIGINT)
          / (sqrt(CAST(a.norm2 AS DOUBLE)) * sqrt(CAST(b.norm2 AS DOUBLE)))
          >= {NEAR_DUP_COS}
""")
def embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT (demo/oracle) tier: all-pairs quantized cosine over a
    pushed ``vec_id < NEAR_DUP_SCOPE`` slice.  Quadratic by
    construction — guarded by ``assert_exact_tier``.  The corpus-scale
    path is :func:`embedding_near_pairs_lsh` (hyperplane-LSH bucket
    join, ids-only candidates, exact-precision verify, recall ≥ 0.95
    gated in tests)."""
    from .dedupe import EXACT_TIER_MAX, assert_exact_tier

    e = load(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < NEAR_DUP_SCOPE)
    assert_exact_tier(e, EXACT_TIER_MAX,
                      "similarity.embedding_near_pairs_lsh")
    v = e.select("vec_id", _quantized(F.col("embedding")).alias("qv"))
    n = v.select(
        "vec_id", "qv", _dot_q(F.col("qv"), F.col("qv")).alias("norm2"))
    # alias-QUALIFIED self-join: unqualified renamed columns over a
    # shared lineage can silently mis-bind (pinned by the streaming
    # near-dup parity test) — qualify every condition column
    a, b = n.alias("a"), n.alias("b")
    pairs = (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(F.col("a.vec_id").alias("vec_a"),
                F.col("b.vec_id").alias("vec_b"),
                _dot_q(F.col("a.qv"), F.col("b.qv")).alias("dot_q"),
                F.col("a.norm2").alias("na"), F.col("b.norm2").alias("nb"))
    )
    cos = F.col("dot_q") / (
        F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double")))
    return pairs.filter(cos >= NEAR_DUP_COS).select("vec_a", "vec_b", "dot_q")


# --- IVF (inverted-file) ANN: coarse k-means quantizer + probed clusters -----
def ivf_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 10,
    n_clusters: int = 16, n_probe: int = 4, sample: int = 2048,
    seed: int = 7,
) -> DataFrame:
    """IVF index: a coarse quantizer (k-means on a deterministic,
    driver-side sample — index building is a small offline step even at
    10^12 rows) partitions the corpus into clusters; a query scores
    only its ``n_probe`` nearest clusters.  The cluster-id equi-join
    replaces the cross join, like the LSH variant but with
    data-adaptive cells."""
    rows = (embeddings.select("vec_id", "embedding")
            .orderBy("vec_id").limit(sample).collect())
    if not rows:       # empty corpus → empty result, same schema
        return embeddings.sparkSession.createDataFrame(
            [], "query_id: long, neighbor_id: long, score: double, rk: int")
    train = np.array([r["embedding"] for r in rows], dtype=np.float64)
    train /= np.linalg.norm(train, axis=1, keepdims=True) + 1e-12

    # tiny corpora: fewer cells than requested, probe what exists
    n_clusters = max(1, min(n_clusters, len(train)))
    n_probe = max(1, min(n_probe, n_clusters))

    rng = np.random.default_rng(seed)
    centroids = train[rng.choice(len(train), n_clusters, replace=False)]
    for _ in range(10):  # lite Lloyd iterations, deterministic
        assign = np.argmax(train @ centroids.T, axis=1)
        for c in range(n_clusters):
            members = train[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids /= np.linalg.norm(centroids, axis=1, keepdims=True) + 1e-12

    sc = embeddings.sparkSession.sparkContext
    bc = sc.broadcast(centroids)

    from pyspark.sql.types import (
        ArrayType, FloatType, IntegerType, LongType, StructField, StructType,
    )

    def assign_schema(col: str) -> StructType:
        return StructType([
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
            StructField(col, IntegerType()),
        ])

    def assigner(n_nearest: int, col: str):
        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            cents = bc.value
            for pdf in batches:
                m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
                m_n = m / (np.linalg.norm(m, axis=1, keepdims=True) + 1e-12)
                sims = m_n @ cents.T
                top = np.argsort(-sims, axis=1)[:, :n_nearest]
                frames = []
                for j in range(n_nearest):
                    frames.append(pd.DataFrame({
                        "vec_id": pdf["vec_id"],
                        "embedding": pdf["embedding"],
                        col: top[:, j].astype("int32"),
                    }))
                yield pd.concat(frames, ignore_index=True)
        return run

    corpus = embeddings.select("vec_id", "embedding").mapInPandas(
        assigner(1, "cluster"), assign_schema("cluster"))
    probes = queries.select("vec_id", "embedding").mapInPandas(
        assigner(n_probe, "cluster"), assign_schema("cluster")).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"), "cluster")

    joined = probes.join(corpus, "cluster")

    def _dot(a, b):
        return F.aggregate(
            F.zip_with(a.cast("array<double>"), b.cast("array<double>"),
                       lambda x, y: x * y),
            F.lit(0.0), lambda acc, x: acc + x)

    cos = _dot(F.col("q_emb"), F.col("embedding")) / (
        F.sqrt(_dot(F.col("q_emb"), F.col("q_emb")))
        * F.sqrt(_dot(F.col("embedding"), F.col("embedding"))) + F.lit(1e-12))
    scored = (
        joined.filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"),
                cos.alias("score"))
        .groupBy("query_id", "neighbor_id").agg(F.max("score").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= k)


# --- fast tier: Arrow/numpy brute-force cosine top-k --------------------------
def cosine_topk_pandas(
    embeddings: DataFrame, queries: DataFrame, k: int = 10
) -> DataFrame:
    """Float cosine top-k: numpy matmul per Arrow batch.

    ``queries`` (vec_id, embedding) is collected and broadcast — the
    standard design when queries ≪ corpus; the corpus streams through
    executors, each batch doing one (batch × dim) @ (dim × n_q) GEMM.
    """
    qrows = queries.select("vec_id", "embedding").collect()
    if not qrows:      # no queries → empty result, same schema
        return embeddings.sparkSession.createDataFrame(
            [], "query_id: long, neighbor_id: long, cosine: double, rk: int")
    q_ids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    q_mat = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True) + 1e-12
    sc = embeddings.sparkSession.sparkContext
    bq = sc.broadcast((q_ids, q_mat))

    from pyspark.sql.types import (
        DoubleType, LongType, StructField, StructType,
    )
    out_schema = StructType([
        StructField("query_id", LongType()),
        StructField("neighbor_id", LongType()),
        StructField("cosine", DoubleType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, mat = bq.value
        for pdf in batches:
            c = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            c /= np.linalg.norm(c, axis=1, keepdims=True) + 1e-12
            sims = c @ mat.T                       # (batch, n_q)
            n_ids = pdf["vec_id"].to_numpy()
            yield pd.DataFrame({
                "query_id": np.repeat(ids, len(n_ids)),
                "neighbor_id": np.tile(n_ids, len(ids)),
                "cosine": sims.T.ravel(),
            })

    scored = embeddings.select("vec_id", "embedding").mapInPandas(
        run, out_schema).filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= k)


def _bucket_candidate_pairs(sigs: DataFrame,
                            bucket_cap: int | None) -> DataFrame:
    """(vec_id, table, bucket) signatures → distinct candidate id
    pairs sharing any (table, bucket) key.

    ``bucket_cap=None``: plain self equi-join — a bucket of size m
    generates its m² joined rows inside ONE task per table.
    Otherwise, buckets above the cap are split into a g×g salted
    block grid (g = ceil(m/cap)): side A fixes block ba =
    xxhash64(vec_a) % g and replicates across the g values of bb,
    side B symmetrically, so every pair still meets in exactly one
    (ba, bb) block and per-task join work is bounded by ~cap²
    regardless of bucket size.  Output is identical either way
    (asserted in pytest); the hot-bucket list is a tiny broadcast.
    The TOTAL candidate volume of a hot bucket stays quadratic by
    definition — the guard bounds task granularity so no straggler /
    OOM task forms; when all-pairs output itself is the problem,
    dedup should consume clusters (``semantic_dedup``), not pairs.
    """
    from .dedupe import block_grid_self_join

    return block_grid_self_join(
        sigs, "vec_id", ["table", "bucket"], "vec_a", "vec_b", bucket_cap)


def embedding_near_pairs_lsh(
    embeddings: DataFrame, threshold: float = 0.8,
    n_planes: int = 8, n_tables: int = 8, seed: int = 7,
    bucket_cap: int | None = 5000,
) -> DataFrame:
    """Scale path for thresholded near-dup PAIR generation — replaces
    the exact tier's all-pairs theta join (`embedding_near_dups`) with
    multi-table random-hyperplane bucketing.

    Candidates are pairs sharing a (table, bucket) sign-pattern key in
    ANY of ``n_tables`` independent tables — an equi-join self-join
    whose shuffle carries ONLY (vec_id, table, bucket); the vectors
    join back onto the (small) candidate-pair set for exact cosine
    verification, so nothing heavy rides through the bucket explode
    (same design as the banded MinHash verification).  Precision is
    exact (every emitted pair passes the true cosine test); recall
    rises with ``n_tables`` — the pytest recall gate plants clustered
    near-dups and requires ≥ 0.95 vs the exact tier.

    Hot-bucket skew (round 4): a near-duplicate-heavy crawl can put a
    large fraction of vectors into ONE (table, bucket) key, and the
    self-join then goes quadratic inside a single task.  Buckets
    larger than ``bucket_cap`` are therefore split into a g×g salted
    block grid (g = ceil(size/cap)): side A is salted by
    xxhash64(vec_a) and replicated across the g B-blocks, side B
    symmetrically, so every pair still meets in exactly one block and
    per-task join work is bounded by cap² REGARDLESS of bucket size —
    output is identical to the unsalted join (asserted in pytest),
    only its placement changes.  The hot-bucket list itself is a tiny
    broadcast (one row per over-cap bucket).  ``bucket_cap=None``
    disables the guard (kept for the A/B bench).

    Returns (vec_a, vec_b, cosine) with cosine ≥ threshold.
    """
    first = embeddings.select("embedding").first()
    if first is None:   # empty corpus → empty pair table, same schema
        return embeddings.sparkSession.createDataFrame(
            [], "vec_a: long, vec_b: long, cosine: double")
    dim = len(first["embedding"])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim))
    sc = embeddings.sparkSession.sparkContext
    bp = sc.broadcast(planes)

    from pyspark.sql.types import (
        IntegerType, LongType, StructField, StructType,
    )
    sig_schema = StructType([
        StructField("vec_id", LongType()),
        StructField("table", IntegerType()),
        StructField("bucket", LongType()),
    ])

    def sig(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pls = bp.value
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            frames = []
            for t in range(pls.shape[0]):
                bits = (m @ pls[t].T) > 0
                buckets = bits @ (1 << np.arange(n_planes, dtype=np.int64))
                frames.append(pd.DataFrame({
                    "vec_id": pdf["vec_id"], "table": t, "bucket": buckets,
                }))
            yield pd.concat(frames, ignore_index=True)

    sigs = embeddings.select("vec_id", "embedding").mapInPandas(
        sig, sig_schema)
    cands = _bucket_candidate_pairs(sigs, bucket_cap)
    ea = embeddings.select(F.col("vec_id").alias("vec_a"),
                           F.col("embedding").alias("emb_a"))
    eb = embeddings.select(F.col("vec_id").alias("vec_b"),
                           F.col("embedding").alias("emb_b"))

    def _dot(x, y):
        return F.aggregate(
            F.zip_with(x.cast("array<double>"), y.cast("array<double>"),
                       lambda p, q: p * q),
            F.lit(0.0), lambda acc, v: acc + v)

    cos = _dot(F.col("emb_a"), F.col("emb_b")) / (
        F.sqrt(_dot(F.col("emb_a"), F.col("emb_a")))
        * F.sqrt(_dot(F.col("emb_b"), F.col("emb_b"))) + F.lit(1e-12))
    return (
        cands.join(ea, "vec_a").join(eb, "vec_b")
        .select("vec_a", "vec_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def semantic_dedup(
    embeddings: DataFrame, threshold: float = 0.9,
    n_planes: int = 8, n_tables: int = 8, seed: int = 7,
    max_iter: int = 50,
) -> DataFrame:
    """Embedding-level dedup decision table — the semantic twin of
    ``dedupe.dedup_clusters``: LSH-bucketed thresholded pair generation
    (``embedding_near_pairs_lsh``) → connected components (min-label
    propagation) → one keeper per cluster (smallest vec_id).

    Returns (vec_id, cluster_id, keep) for EVERY input vector;
    isolated vectors keep themselves.  Pair transitivity matters:
    A≈B, B≈C must collapse to one cluster even when cos(A,C) is below
    the threshold — pairs alone under-merge.
    """
    from .dedupe import connected_components

    pairs = embedding_near_pairs_lsh(
        embeddings, threshold, n_planes, n_tables, seed)
    comps = connected_components(
        pairs, src="vec_a", dst="vec_b", max_iter=max_iter)
    return (
        embeddings.select("vec_id")
        .join(comps, F.col("vec_id") == comps.node, "left_outer")
        .select(
            "vec_id",
            F.coalesce("component", F.col("vec_id")).alias("cluster_id"),
        )
        .withColumn("keep", F.col("vec_id") == F.col("cluster_id"))
    )


def lsh_bucketed_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 10,
    n_planes: int = 10, n_tables: int = 4, seed: int = 7,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Scale path: multi-table random-hyperplane LSH prunes the corpus
    before exact cosine scoring.  Each of ``n_tables`` independent
    sign-pattern hashes buckets every vector; a corpus vector is a
    candidate if it shares a query's bucket (or a 1-bit-flip probe of
    it) in ANY table.  Recall rises with tables, cost with
    tables × probes; at 10^12 rows this replaces the cross join with
    bucket-key equi-joins."""
    first = embeddings.select("embedding").first()
    if first is None:   # empty corpus → empty result, same schema
        return embeddings.sparkSession.createDataFrame(
            [], "query_id: long, neighbor_id: long, score: double, rk: int")
    dim = len(first["embedding"])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim))
    sc = embeddings.sparkSession.sparkContext
    bp = sc.broadcast(planes)

    from pyspark.sql.types import (
        ArrayType, FloatType, IntegerType, LongType, StructField, StructType,
    )
    sig_schema = StructType([
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("table", IntegerType()),
        StructField("bucket", LongType()),
    ])

    def sig(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pls = bp.value
        for pdf in batches:
            m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            frames = []
            for t in range(pls.shape[0]):
                bits = (m @ pls[t].T) > 0
                buckets = bits @ (1 << np.arange(n_planes, dtype=np.int64))
                frames.append(pd.DataFrame({
                    "vec_id": pdf["vec_id"], "embedding": pdf["embedding"],
                    "table": t, "bucket": buckets,
                }))
            yield pd.concat(frames, ignore_index=True)

    corpus_sig = embeddings.select("vec_id", "embedding").mapInPandas(
        sig, sig_schema)
    query_sig = queries.select("vec_id", "embedding").mapInPandas(
        sig, sig_schema)
    # probe buckets per table: the query's own bucket + all 1-bit flips
    probes = query_sig.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        "table",
        F.explode(F.array(
            F.col("bucket"),
            *[F.expr(f"bucket ^ {1 << i}") for i in range(n_planes)],
        )).alias("bucket"),
    )
    # Broadcast the PROBE side (queries ≪ corpus is the top-k search
    # contract; the probe explode is queries × tables × (1 + n_planes)
    # rows, 44× at the defaults — size the query set accordingly).
    # The corpus then never shuffles on the bucket key at all — a hot
    # bucket (near-duplicate-heavy crawl) stays spread across whatever
    # partitions already hold it, so bucket skew cannot create a
    # straggler task; candidate rows re-spread downstream on the
    # (query, neighbor) hash of the groupBy.  For query sets too large
    # to broadcast, pass broadcast_queries=False to let AQE choose the
    # join (restores skew exposure but never OOMs the build side).
    # Safety valve: the explode factor makes an innocent-looking query
    # frame balloon 44× before the join, so an oversized query set must
    # not ride the forced broadcast into an executor OOM.  The query
    # count is known exactly (one cheap count job over a frame that is
    # small by contract) → estimate the exploded build size and fall
    # back to the shuffle join past the cap.
    if broadcast_queries:
        n_q = queries.count()
        est_bytes = n_q * n_tables * (1 + n_planes) * (dim * 4 + 48)
        if est_bytes > _BROADCAST_PROBE_CAP_BYTES:
            warnings.warn(
                f"lsh_bucketed_topk: exploded probe set ≈{est_bytes >> 20} "
                f"MiB exceeds the {_BROADCAST_PROBE_CAP_BYTES >> 20} MiB "
                "broadcast cap; falling back to the shuffle join "
                "(slower but OOM-safe)", stacklevel=2)
            broadcast_queries = False
    probe_side = F.broadcast(probes) if broadcast_queries else probes
    joined = probe_side.join(corpus_sig, ["table", "bucket"])

    def _dot(a, b):
        return F.aggregate(
            F.zip_with(a.cast("array<double>"), b.cast("array<double>"),
                       lambda x, y: x * y),
            F.lit(0.0), lambda acc, x: acc + x)

    # rank by COSINE (same metric as the brute-force tier) — raw dot
    # products would mis-rank non-normalized embeddings
    cos = _dot(F.col("q_emb"), F.col("embedding")) / (
        F.sqrt(_dot(F.col("q_emb"), F.col("q_emb")))
        * F.sqrt(_dot(F.col("embedding"), F.col("embedding"))) + F.lit(1e-12))
    scored = (
        joined.filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"),
                cos.alias("score"))
        .groupBy("query_id", "neighbor_id").agg(F.max("score").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= k)
