"""Text-analysis operators for a training-data pipeline over the
``documents`` table: token counting, quality scoring, language-ID
scoring, document fingerprinting.

All expressions are JVM-side (whole-stage codegen) — no Python UDFs in
this family.  Each query has a DuckDB oracle; cross-engine parity
relies on: identical regexes (RE2-safe subset), integer arithmetic,
md5 (identical in both engines), and single-IEEE-op divisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.io import load

QUERIES: dict = {}
ORACLE: dict[str, str] = {}


def register(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn
    return deco


# BPE-ish token regex: letter runs, digit runs, single other non-space.
_BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

# generic stopword panels for the language-ID scorer
_STOP_A = ("the", "a", "of", "to", "and")            # article-ish
_STOP_B = ("table", "row", "column", "scan", "key")  # storage-ish
_STOP_C = ("join", "agg", "group", "window", "merge")  # relational-ish


def _words(col):
    return F.filter(F.split(col, " "), lambda x: x != "")


# --- token counting (whitespace + BPE-ish regex) ----------------------------
@register("doc_token_stats", """
    SELECT doc_id,
           len(list_filter(string_split(text, ' '), x -> x <> '')) AS ws_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS bpe_tokens,
           length(text) AS chars
    FROM documents
""")
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(_words(F.col("text"))).alias("ws_tokens"),
        F.regexp_count(F.col("text"), F.lit(_BPE_RE)).alias("bpe_tokens"),
        F.length("text").alias("chars"),
    )


# --- per-language rollup + curation provenance (union query) ------------------
# One registry row exercising the token rollup AND both curation gates
# (operators/curation.py) under a full DuckDB oracle arm: drop_reason
# counts replay curate()'s first-failure cascade; budget_cum_sum
# checksums EVERY prefix value of budget_sample()'s distributed prefix
# sum (not just the per-lang total) against a single-window SQL twin.
BUDGET_B = 2_000  # binds per lang at sf0.01 (≈5.4k tokens/lang) and up

_CURATION_SQL = f"""
    WITH s AS (
      SELECT doc_id, lang, text,
             CASE WHEN text IS NULL THEN 0
                  ELSE len(list_filter(string_split(text, ' '), x -> x <> ''))
             END AS tokens,
             CASE WHEN text IS NULL OR len(list_filter(string_split(text, ' '), x -> x <> '')) = 0
                  THEN 0.0
                  ELSE CAST(len(list_distinct(list_filter(string_split(text, ' '), x -> x <> ''))) AS DOUBLE)
                       / GREATEST(len(list_filter(string_split(text, ' '), x -> x <> '')), 1)
             END AS uniq_ratio
      FROM documents
    ), dedup AS (
      SELECT *, row_number() OVER (PARTITION BY md5(text)
                                   ORDER BY doc_id) AS rn
      FROM s
    ), cur AS (
      SELECT lang,
             CASE WHEN text IS NOT NULL AND rn > 1 THEN 'drop_duplicate'
                  WHEN tokens < 20 OR uniq_ratio < 0.2 THEN 'drop_quality'
                  ELSE 'keep' END AS metric
      FROM dedup
    ), bud AS (
      SELECT lang, tokens,
             sum(tokens) OVER (PARTITION BY lang
                               ORDER BY uniq_ratio DESC, doc_id
                               ROWS UNBOUNDED PRECEDING) AS cum
      FROM s
    )
    SELECT lang, 'docs' AS metric, count(*) AS value FROM documents GROUP BY lang
    UNION ALL
    SELECT lang, 'total_tokens', CAST(sum(tokens) AS BIGINT) FROM s GROUP BY lang
    UNION ALL
    SELECT lang, 'total_chars', CAST(sum(length(text)) AS BIGINT)
    FROM documents GROUP BY lang
    UNION ALL
    SELECT lang, 'avg_chars_x1000',
           CAST(FLOOR(CAST(sum(length(text)) AS DOUBLE) / count(*) * 1000 + 0.5) AS BIGINT)
    FROM documents GROUP BY lang
    UNION ALL
    SELECT lang, metric, count(*) FROM cur GROUP BY lang, metric
    UNION ALL
    SELECT lang, 'budget_docs', count(*) FROM bud
    WHERE cum <= {BUDGET_B} GROUP BY lang
    UNION ALL
    SELECT lang, 'budget_cum_sum', CAST(sum(cum) AS BIGINT) FROM bud
    WHERE cum <= {BUDGET_B} GROUP BY lang
"""


@register("lang_curation_rollup", _CURATION_SQL)
def lang_curation_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .curation import budget_sample, curate

    d = load(spark, sf_dir, "documents")
    v = lambda c: c.cast("bigint").alias("value")  # noqa: E731

    rollup = d.groupBy("lang").agg(
        F.count("*").alias("docs"),
        F.sum(F.size(_words(F.col("text")))).alias("total_tokens"),
        F.sum(F.length("text")).alias("total_chars"),
        F.floor(F.sum(F.length("text")).cast("double") / F.count("*")
                * 1000 + 0.5).alias("avg_x1000"),
    ).selectExpr(
        "lang",
        "stack(4, 'docs', docs, 'total_tokens', total_tokens, "
        "'total_chars', total_chars, 'avg_chars_x1000', avg_x1000) "
        "AS (metric, value)",
    ).select("lang", "metric", v(F.col("value")))

    drops = (
        curate(d)
        .groupBy("lang", F.when(F.col("drop_reason").isNotNull(),
                                F.concat(F.lit("drop_"), "drop_reason"))
                .otherwise("keep").alias("metric"))
        .agg(v(F.count("*")))
    )

    bud = budget_sample(d, BUDGET_B).groupBy("lang").agg(
        F.count("*").alias("budget_docs"),
        F.sum("cum_tokens").alias("budget_cum_sum"),
    ).selectExpr(
        "lang",
        "stack(2, 'budget_docs', budget_docs, "
        "'budget_cum_sum', budget_cum_sum) AS (metric, value)",
    ).select("lang", "metric", v(F.col("value")))

    return rollup.unionByName(drops).unionByName(bud)


# --- quality scoring: lexical-diversity + length heuristics ------------------
# score components are exact ints; the two ratios are single divisions.
@register("doc_quality", """
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS words,
             length(text) AS chars
      FROM documents
    )
    SELECT doc_id,
           len(words) AS tokens,
           len(list_distinct(words)) AS distinct_tokens,
           CAST(len(list_distinct(words)) AS DOUBLE) / len(words) AS uniq_ratio,
           CAST(chars - len(words) + 1 AS DOUBLE) / len(words) AS avg_word_len,
           len(words) >= 20 AND
             (CAST(len(list_distinct(words)) AS DOUBLE) / len(words)) >= 0.2
             AS passes_quality
    FROM w WHERE len(words) > 0
""")
def doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    words = _words(F.col("text"))
    # r10: filtering on size(words) made the optimizer push the
    # predicate below the projection and DUPLICATE the split+filter
    # expression (3 evaluations per row in the executed plan — guide
    # §4.4's pushdown-duplication shape, JVM edition).  size(words)>0
    # ⟺ the text has ≥1 non-space char ⟺ ltrim(text) <> '' (NULL
    # excluded by both), so the cheap predicate replaces it and the
    # expensive split runs exactly once.  sf1: 0.55 → 0.28 s;
    # result-set equality asserted against the old form.
    w = d.filter(F.ltrim(F.col("text")) != "").select(
        "doc_id", words.alias("words"), F.length("text").alias("chars")
    )
    tokens = F.size("words")
    distinct = F.size(F.array_distinct("words"))
    uniq = distinct.cast("double") / tokens
    # single-space-joined text: total word chars = chars - (tokens-1)
    awl = (F.col("chars") - tokens + 1).cast("double") / tokens
    return w.select(
        "doc_id",
        tokens.alias("tokens"),
        distinct.alias("distinct_tokens"),
        uniq.alias("uniq_ratio"),
        awl.alias("avg_word_len"),
        ((tokens >= 20) & (uniq >= 0.2)).alias("passes_quality"),
    )


# --- language-ID scoring (stopword-panel hits + argmax) ----------------------
def _panel_sql(panel) -> str:
    inlist = ", ".join(f"'{w}'" for w in panel)
    return f"len(list_filter(words, x -> x IN ({inlist})))"


@register("langid_scores", f"""
    WITH w AS (
      SELECT doc_id, lang,
             list_filter(string_split(text, ' '), x -> x <> '') AS words
      FROM documents
    )
    SELECT doc_id, lang,
           {_panel_sql(_STOP_A)} AS hits_a,
           {_panel_sql(_STOP_B)} AS hits_b,
           {_panel_sql(_STOP_C)} AS hits_c,
           CASE
             WHEN {_panel_sql(_STOP_A)} >= {_panel_sql(_STOP_B)}
              AND {_panel_sql(_STOP_A)} >= {_panel_sql(_STOP_C)} THEN 'a'
             WHEN {_panel_sql(_STOP_B)} >= {_panel_sql(_STOP_C)} THEN 'b'
             ELSE 'c'
           END AS predicted_panel
    FROM w
""")
def langid_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    w = d.select("doc_id", "lang", _words(F.col("text")).alias("words"))

    def hits(panel):
        return F.size(F.filter(
            F.col("words"),
            lambda x: x.isin(*panel),
        ))

    a, b, c = hits(_STOP_A), hits(_STOP_B), hits(_STOP_C)
    pred = (
        F.when((a >= b) & (a >= c), F.lit("a"))
        .when(b >= c, F.lit("b"))
        .otherwise(F.lit("c"))
    )
    return w.select(
        "doc_id", "lang",
        a.alias("hits_a"), b.alias("hits_b"), c.alias("hits_c"),
        pred.alias("predicted_panel"),
    )


# --- document fingerprinting (md5 whole + prefix shingle) --------------------
@register("doc_fingerprints", """
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS words,
             text
      FROM documents
    )
    SELECT doc_id,
           md5(text) AS full_md5,
           md5(array_to_string(words[1:8], ' ')) AS prefix8_md5
    FROM w
""")
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    words = _words(F.col("text"))
    return d.select(
        "doc_id",
        F.md5("text").alias("full_md5"),
        F.md5(F.concat_ws(" ", F.slice(words, 1, 8))).alias("prefix8_md5"),
    )


# --- CUBE rollup (SURVEY §2.4: grouping sets available for free in
# Spark; per-lang × per-source metric rollups) --------------------------------
@register("lang_source_cube", """
    SELECT lang, source, count(*) AS docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY CUBE (lang, source)
""")
def lang_source_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.cube("lang", "source").agg(
        F.count("*").alias("docs"),
        F.sum("n_chars").alias("total_chars"),
    )


# --- repetition quality signals (Gopher-style training-data filters) --------
@register("doc_repetition_stats", """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS words
      FROM documents
    ),
    grams AS (
      SELECT doc_id,
             array_to_string(words[pos:pos+2], ' ') AS g3
      FROM (SELECT doc_id, words,
                   unnest(generate_series(1, len(words) - 2)) AS pos
            FROM toks WHERE len(words) > 2)
    ),
    per_doc AS (
      SELECT doc_id, count(*) AS n_g3, count(DISTINCT g3) AS d_g3
      FROM grams GROUP BY doc_id
    ),
    top_gram AS (
      SELECT doc_id, max(c) AS top_c FROM (
        SELECT doc_id, g3, count(*) AS c FROM grams GROUP BY doc_id, g3
      ) GROUP BY doc_id
    )
    SELECT p.doc_id, p.n_g3, p.d_g3,
           1.0 - CAST(p.d_g3 AS DOUBLE) / p.n_g3 AS dup_3gram_ratio,
           CAST(t.top_c AS DOUBLE) / p.n_g3 AS top_3gram_share,
           (1.0 - CAST(p.d_g3 AS DOUBLE) / p.n_g3) <= 0.6
             AND CAST(t.top_c AS DOUBLE) / p.n_g3 <= 0.18
             AS passes_repetition
    FROM per_doc p JOIN top_gram t ON p.doc_id = t.doc_id
""")
def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition filters (duplicate-3-gram ratio and
    top-3-gram share) — the Gopher-rule family every pretraining
    pipeline applies before tokenization."""
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", _words(F.col("text")).alias("words"))
    n_g = F.size("words") - 2
    grams = toks.filter(n_g > 0).select(
        "doc_id",
        F.explode(F.transform(
            F.sequence(F.lit(1), n_g),
            lambda i: F.concat_ws(" ", F.slice("words", i, 3)),
        )).alias("g3"),
    )
    counts = grams.groupBy("doc_id", "g3").agg(F.count("*").alias("c"))
    per_doc = counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_g3"),
        F.count("*").alias("d_g3"),
        F.max("c").alias("top_c"),
    )
    dup = 1.0 - F.col("d_g3").cast("double") / F.col("n_g3")
    top = F.col("top_c").cast("double") / F.col("n_g3")
    return per_doc.select(
        "doc_id", "n_g3", "d_g3",
        dup.alias("dup_3gram_ratio"),
        top.alias("top_3gram_share"),
        ((dup <= 0.6) & (top <= 0.18)).alias("passes_repetition"),
    )


# --- winnowing fingerprints (rolling-window k-gram minima, MOSS-style) -------
# Shingle size 5, window 4: every 4-consecutive-shingle window
# contributes its minimum hash — the standard partial-overlap
# fingerprint (robust to insertions, unlike whole-doc md5).
_WINNOW_K = 5
_WINNOW_W = 4


def _winnow_cte(scope: int | None = 100) -> str:
    """The winnowing pipeline as a shared CTE body — single source for
    BOTH the winnowing_fingerprints and partial_overlap_pairs oracles
    (they must never desynchronize).  ``scope`` bounds the doc_id range
    (None = whole corpus: partial_overlap_pairs uses the full table so
    its oracle row exercises NONZERO output — the round-4 verdict's
    vacuous-hash ask)."""
    where = f"WHERE doc_id < {scope}" if scope is not None else ""
    return f"""
    toks AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS words
      FROM documents {where}
    ),
    positions AS (
      SELECT doc_id, words,
             unnest(generate_series(1, len(words) - {_WINNOW_K - 1})) AS pos
      FROM toks WHERE len(words) > {_WINNOW_K - 1}
    ),
    shingles AS (
      SELECT doc_id, pos,
             md5(array_to_string(words[pos:pos+{_WINNOW_K - 1}], ' ')) AS h
      FROM positions
    ),
    winmin AS (
      SELECT doc_id,
             min(h) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW
                          AND {_WINNOW_W - 1} FOLLOWING) AS fp,
             pos, count(*) OVER (PARTITION BY doc_id) AS n
      FROM shingles
    ),
    fps AS (
      SELECT DISTINCT doc_id, fp
      FROM winmin WHERE pos <= n - {_WINNOW_W - 1}
    )"""


def _winnow_fps_df(spark: SparkSession, sf_dir: str,
                   scope: int | None) -> DataFrame:
    """Spark twin of :func:`_winnow_cte` — same scope semantics."""
    d = load(spark, sf_dir, "documents")
    if scope is not None:
        d = d.filter(F.col("doc_id") < scope)
    toks = d.select("doc_id", _words(F.col("text")).alias("words"))
    n_sh = F.size("words") - (_WINNOW_K - 1)
    shingles = toks.filter(n_sh > 0).select(
        "doc_id",
        F.explode(F.transform(
            F.sequence(F.lit(1), n_sh),
            lambda i: F.struct(
                i.alias("pos"),
                F.md5(F.concat_ws(
                    " ", F.slice("words", i, _WINNOW_K))).alias("h")),
        )).alias("s"),
    ).select("doc_id", "s.pos", "s.h")
    w = (
        Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(0, _WINNOW_W - 1)
    )
    wn = Window.partitionBy("doc_id")
    return (
        shingles
        .withColumn("fp", F.min("h").over(w))
        .withColumn("n", F.count("*").over(wn))
        .filter(F.col("pos") <= F.col("n") - (_WINNOW_W - 1))
        .select("doc_id", F.col("fp").alias("fingerprint"))
        .distinct()
    )


@register("winnowing_fingerprints", f"""
    WITH {_winnow_cte()}
    SELECT doc_id, fp AS fingerprint FROM fps
""")
def winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _winnow_fps_df(spark, sf_dir, 100)


# --- partial-overlap candidates via shared winnowing fingerprints -----------
_OVERLAP_MIN = 5


@register("partial_overlap_pairs", f"""
    WITH {_winnow_cte(scope=None)}
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           count(*) AS shared_fps
    FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING count(*) >= {_OVERLAP_MIN}
""")
def partial_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring-overlap candidates (Lee et al.-style dedup):
    documents sharing ≥{_OVERLAP_MIN} winnowing fingerprints contain
    near-verbatim passages even when whole-doc similarity is low.
    Scoped to the WHOLE corpus (not the fingerprint demo's doc_id
    slice) so the oracle hash covers nonzero output at gate scale —
    24 pairs at sf0.01, a few hundred at sf0.1."""
    fps = _winnow_fps_df(spark, sf_dir, None)
    a = fps.select(F.col("doc_id").alias("doc_a"),
                   F.col("fingerprint").alias("fp"))
    b = fps.select(F.col("doc_id").alias("doc_b"),
                   F.col("fingerprint").alias("fp"))
    return (
        a.join(b, ["fp"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("shared_fps"))
        .filter(F.col("shared_fps") >= _OVERLAP_MIN)
    )


# --- frequent-token top-k (explode + count + deterministic rank) -------------
@register("top_tokens_per_lang", """
    WITH tok AS (
      SELECT lang, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
      FROM documents
    ),
    cnt AS (SELECT lang, token, count(*) AS n FROM tok GROUP BY lang, token)
    SELECT lang, token, n, rk
    FROM (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY n DESC, token) AS rk
          FROM cnt)
    WHERE rk <= 10
""")
def top_tokens_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    cnt = (
        d.select("lang", F.explode(_words(F.col("text"))).alias("token"))
        .groupBy("lang", "token")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("token"))
    return (
        cnt.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
    )
