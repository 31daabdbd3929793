"""Training-data preparation operators beyond dedup/similarity: the
curation steps an LLM pretraining pipeline runs between "raw corpus" and
"tokenized training examples".

The reference engine (cern1710/Parallel-MapReduce) has no analogue — its
only application is word count (src/main.c) — so this module is pure
extension surface, mandated alongside SURVEY.md §2's dedup/similarity/
multimodal/text families. Everything here is built-ins-only (JVM-side,
whole-stage codegen); every query has a full DuckDB value oracle.

Scale notes per operator are inline; the common theme: per-document maps
are shuffle-free, and the operators that do shuffle (contamination join,
vocab build, domain-mix rates) shuffle bucket keys / vocab-sized /
per-source-count data, never the corpus text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from parallel_mapreduce_spark.functions.dedup import shingles3
from parallel_mapreduce_spark.functions.portable import phash60, phash60_sql
from parallel_mapreduce_spark.functions.text import _SQL_TOKS, bigrams, tokens
from parallel_mapreduce_spark.registry import query
from parallel_mapreduce_spark.sources import load_table, register_views

# DuckDB twin of text.bigrams(): 1-indexed range(1, len) -> len-1 bigrams.
_SQL_BIGRAMS = (
    "list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1])"
)

REPETITION_FLAG_THRESHOLD = 0.2  # Gopher-style: flag docs > 20% repeated bigrams


# --------------------------------------------------------------------------
# Intra-document repetition (Gopher quality rule): the fraction of bigram
# occurrences that are repeats of an earlier bigram in the same document.
# High values mark boilerplate/spam/looped generations. No UDF; the bigram
# arrays never leave the projection. Collapse-first like the dedup family:
# identical texts have identical metrics, so the (interpreted higher-order)
# bigram expressions run once per DISTINCT text and the results expand back
# to members over a digest-keyed join — on the 10x replicated probe corpus
# (10 exact copies per text) that is 10x less expression work.
# --------------------------------------------------------------------------
@query(
    "repetition_bigram_ratio",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
    b AS (SELECT doc_id, {_SQL_BIGRAMS} AS bgs FROM t WHERE len(toks) >= 2)
    SELECT doc_id,
           CAST(len(bgs) AS BIGINT) AS n_bigrams,
           CAST(len(list_distinct(bgs)) AS BIGINT) AS n_distinct,
           ROUND(1.0 - len(list_distinct(bgs)) * 1.0 / len(bgs), 4) AS dup_ratio,
           (1.0 - len(list_distinct(bgs)) * 1.0 / len(bgs))
               > {REPETITION_FLAG_THRESHOLD} AS flagged
    FROM b
    """,
)
def repetition_bigram_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    from parallel_mapreduce_spark.functions.dedup import (
        _rep_texts,
        exact_dup_members,
    )

    register_views(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    n_parts = max(spark.sparkContext.defaultParallelism, 8)
    bgs = bigrams(tokens("text"))
    # _rep_texts repartitions representatives across n_parts, so the heavy
    # expression also escapes the one-row-group single-task scan.
    rep_counts = (
        _rep_texts(docs, n_parts)
        .select("doc_id", bgs.alias("bgs"))
        .filter(F.size("bgs") >= 1)
        # Two scalars in ONE projection so array_distinct evaluates once per
        # row; ratio/flag derive from the scalars afterwards.
        .select(
            F.col("doc_id").alias("rep"),
            F.size("bgs").cast("long").alias("n_bigrams"),
            F.size(F.array_distinct("bgs")).cast("long").alias("n_distinct"),
        )
    )
    members = exact_dup_members(docs)
    counts = members.join(rep_counts, "rep").select(
        "doc_id", "n_bigrams", "n_distinct"
    )
    dup_ratio = F.lit(1.0) - F.col("n_distinct") / F.col("n_bigrams")
    return counts.select(
        "doc_id",
        "n_bigrams",
        "n_distinct",
        F.round(dup_ratio, 4).alias("dup_ratio"),
        (dup_ratio > REPETITION_FLAG_THRESHOLD).alias("flagged"),
    )


PACK_CAPACITY_TOKENS = 512


# --------------------------------------------------------------------------
# Sequence packing: assign documents to fixed-token-budget training examples
# ("packs") by contiguous fill in deterministic (source, doc_id) order —
# pack_id = tokens-before-this-doc div capacity. A doc may straddle a pack
# boundary; the tokenizer downstream splits it (standard contiguous packing,
# the shuffle-free alternative to bin-packing).
#
# Scale: the running sum is windowed PER SOURCE, not globally — a global
# ORDER BY window would serialize the corpus through one task; per-source
# windows parallelize across sources and each source's partition sorts
# locally. At 100 TB, source is the natural sharding unit (crawl snapshot,
# dump file), so thousands of independent windows.
# --------------------------------------------------------------------------
@query(
    "seq_pack_contiguous",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, CAST(len({_SQL_TOKS}) AS BIGINT) AS n_tokens
      FROM documents
    )
    SELECT doc_id, source, n_tokens,
           COALESCE(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             // {PACK_CAPACITY_TOKENS} AS pack_id,
           COALESCE(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             % {PACK_CAPACITY_TOKENS} AS tok_offset
    FROM t
    """,
)
def seq_pack_contiguous(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", "source", F.size(tokens("text")).cast("long").alias("n_tokens")
    )
    w = (
        W.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))
    return t.select(
        "doc_id",
        "source",
        "n_tokens",
        (before / F.lit(PACK_CAPACITY_TOKENS)).cast("long").alias("pack_id"),
        (before % PACK_CAPACITY_TOKENS).alias("tok_offset"),
    )


EVAL_SET_MOD = 97  # doc_id % 97 == 0 -> held-out "benchmark" docs


# --------------------------------------------------------------------------
# Benchmark decontamination: find training docs sharing 3-token shingles
# with a held-out eval set (here: doc_id % 97 == 0 stands in for the
# benchmark corpus). The standard n-gram contamination check (GPT-3 appendix
# C / PaLM style), as an inverted-index equi-join on the shingle — identical
# shape to the near-dup index, so the same scale argument: candidate pairs
# come from bucket joins, never an all-pairs product, and the eval side of
# the join is tiny (the benchmark), so AQE broadcasts it.
# --------------------------------------------------------------------------
@query(
    "contamination_shingle_overlap",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
    sh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(range(1, len(toks) - 1),
                    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS s
      FROM t WHERE len(toks) >= 3
    ),
    ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % {EVAL_SET_MOD} = 0)
    SELECT sh.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_contaminated_shingles
    FROM sh JOIN ev USING (s)
    WHERE sh.doc_id % {EVAL_SET_MOD} <> 0
    GROUP BY sh.doc_id
    """,
)
def contamination_shingle_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    n_parts = max(spark.sparkContext.defaultParallelism, 8)
    # Repartition ahead of the interpreted shingle expression + explode
    # (single-row-group scan would serialize it on one core).
    sh = (
        docs.select("doc_id", "text")
        .repartition(n_parts, "doc_id")
        .select("doc_id", F.explode(shingles3(tokens("text"))).alias("s"))
    )
    ev = sh.filter(F.col("doc_id") % EVAL_SET_MOD == 0).select("s").distinct()
    return (
        sh.filter(F.col("doc_id") % EVAL_SET_MOD != 0)
        .join(ev, "s")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_contaminated_shingles"))
    )


# Redaction patterns: identical semantics under Java regex (Spark) and RE2
# (DuckDB) — character classes, bounded repetition, and \\b only.
PII_EMAIL = "[a-zA-Z0-9._]+@[a-zA-Z0-9.]+"
PII_NUMBER = "[0-9]{4,}"
PII_TERMS = ["customer", "supplier"]  # denylist stand-in for name lists


# --------------------------------------------------------------------------
# PII redaction: replace emails / long digit runs / denylisted terms with
# typed placeholder tokens, reporting per-doc hit counts. The synthetic
# corpus has no emails or digit runs (the regex plumbing still runs; the
# denylist terms do fire), so hit counts prove which patterns matched.
# Per-doc map — shuffle-free, all JVM regex, no UDF.
# --------------------------------------------------------------------------
_TERM_PAT = "\\b(" + "|".join(PII_TERMS) + ")\\b"


@query(
    "pii_redact",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{PII_EMAIL}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(text, '{PII_NUMBER}')) AS BIGINT) AS n_number,
           CAST(len(regexp_extract_all(text, '{_TERM_PAT}')) AS BIGINT) AS n_term,
           md5(regexp_replace(regexp_replace(regexp_replace(text,
               '{PII_EMAIL}', '<EMAIL>', 'g'),
               '{PII_NUMBER}', '<NUM>', 'g'),
               '{_TERM_PAT}', '<TERM>', 'g')) AS redacted_hash
    FROM documents
    """,
)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    n_parts = max(spark.sparkContext.defaultParallelism, 8)
    # Spread the regex-heavy projection across cores (single-row-group scan
    # would otherwise run it on one task; 10x probe: 3.1s -> ~0.5s).
    docs = docs.select("doc_id", "text").repartition(n_parts, "doc_id")
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("text", PII_EMAIL, "<EMAIL>"),
            PII_NUMBER,
            "<NUM>",
        ),
        _TERM_PAT,
        "<TERM>",
    )
    return docs.select(
        "doc_id",
        F.regexp_count("text", F.lit(PII_EMAIL)).cast("long").alias("n_email"),
        F.regexp_count("text", F.lit(PII_NUMBER)).cast("long").alias("n_number"),
        F.regexp_count("text", F.lit(_TERM_PAT)).cast("long").alias("n_term"),
        F.md5(redacted).alias("redacted_hash"),
    )


VOCAB_MIN_COUNT = 3


# --------------------------------------------------------------------------
# Vocabulary construction: tokens above a frequency floor, with stable
# contiguous ids assigned by (count desc, token asc). The id assignment is
# a single-partition window — correct here because it runs on the VOCAB
# (distinct tokens after a map-side-combined count), which is orders of
# magnitude smaller than the corpus; the corpus-sized work (tokenize +
# count) is fully parallel. This is the standard tokenizer-training shape.
# --------------------------------------------------------------------------
@query(
    "vocab_min_count",
    oracle=f"""
    WITH c AS (
      SELECT unnest({_SQL_TOKS}) AS token FROM documents
    ), v AS (
      SELECT token, COUNT(*) AS cnt FROM c GROUP BY token
      HAVING COUNT(*) >= {VOCAB_MIN_COUNT}
    )
    SELECT token, CAST(cnt AS BIGINT) AS cnt,
           CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, token) - 1 AS BIGINT)
             AS token_id
    FROM v
    """,
)
def vocab_min_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= VOCAB_MIN_COUNT)
    )
    w = W.orderBy(F.desc("cnt"), F.asc("token"))
    return counts.select(
        "token",
        "cnt",
        (F.row_number().over(w) - 1).cast("long").alias("token_id"),
    )


# --------------------------------------------------------------------------
# Embedding scalar quantization (int8): per-vector max-abs scaling, the
# storage/bandwidth step ahead of ANN serving. round-half-up via
# floor(x + 0.5) on BOTH engines (Spark round() and DuckDB round() disagree
# on ties for some types; floor is floor everywhere). Per-row map over the
# embedding array — shuffle-free, JVM higher-order functions only.
# --------------------------------------------------------------------------
@query(
    "embedding_quantize",
    oracle="""
    WITH t AS (
      SELECT vec_id,
             list_max(list_transform(embedding, x -> abs(x))) AS scale
      FROM embeddings
    )
    SELECT t.vec_id,
           ROUND(CAST(scale AS DOUBLE), 6) AS scale_r,
           list_aggregate(
             list_transform(e.embedding,
               x -> CAST(CAST(floor(x * 127.0 / scale + 0.5) AS BIGINT)
                         AS VARCHAR)),
             'string_agg', ',') AS q_csv
    FROM t JOIN embeddings e USING (vec_id)
    """,
)
def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    scale = F.array_max(F.transform("embedding", lambda x: F.abs(x)))
    with_scale = emb.select("vec_id", "embedding", scale.alias("scale"))
    q = F.transform(
        "embedding",
        lambda x: F.floor(x * 127.0 / F.col("scale") + 0.5).cast("long").cast("string"),
    )
    return with_scale.select(
        "vec_id",
        F.round(F.col("scale").cast("double"), 6).alias("scale_r"),
        F.array_join(q, ",").alias("q_csv"),
    )


MIX_DENOM = 1_000_000


# --------------------------------------------------------------------------
# Domain-mixture rebalancing: downsample over-represented languages to a
# UNIFORM target mix, with rates computed FROM the data (unlike
# stratified_sample_docs' fixed fractions). Per-language acceptance
# threshold = min(1, fair_share / actual_share), applied as the same
# deterministic content-hash Bernoulli — reproducible across engines,
# partitionings, and task retries. Thresholds use pure integer arithmetic
# ((total * DENOM) div (n_langs * cnt)) so Spark and DuckDB agree bit-for-
# bit. Plan shape: the rate table is one row per language (tiny — broadcast
# back to the corpus); the corpus itself is never shuffled, only scanned,
# counted (map-side combined), and filtered.
# --------------------------------------------------------------------------
@query(
    "domain_rebalance",
    oracle=f"""
    WITH c AS (SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang),
    t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total,
                 CAST(COUNT(*) AS BIGINT) AS n_src
          FROM c),
    r AS (SELECT lang,
                 LEAST({MIX_DENOM},
                       (total * {MIX_DENOM}) // (n_src * cnt)) AS thr
          FROM c, t)
    SELECT d.doc_id, d.lang
    FROM documents d JOIN r USING (lang)
    WHERE {phash60_sql("'mix:' || doc_id::VARCHAR")} % {MIX_DENOM} < thr
    """,
)
def domain_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("lang").agg(F.count("*").alias("cnt"))
    t = c.agg(
        F.sum("cnt").cast("long").alias("total"),
        F.count("*").cast("long").alias("n_src"),
    )
    r = c.crossJoin(F.broadcast(t)).select(
        "lang",
        F.least(
            F.lit(MIX_DENOM).cast("long"),
            F.expr(f"(total * {MIX_DENOM}) div (n_src * cnt)"),
        ).alias("thr"),
    )
    bucket = phash60(
        F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))
    ) % MIX_DENOM
    return (
        docs.join(F.broadcast(r), "lang")
        .filter(bucket < F.col("thr"))
        .select("doc_id", "lang")
    )


# --------------------------------------------------------------------------
# Unigram log-probability quality score (perplexity proxy, CCNet-style):
# score(doc) = mean ln p(token) under the corpus's own unigram model.
# Low (very negative) scores mark documents of rare/garbage tokens; high
# scores mark stereotyped text. The language-model table is built FROM the
# corpus in the same plan (self-referential statistic — the corpus is
# necessarily scanned twice: once to count, once to score).
#
# Scale: the frequency table is vocab-sized (orders below the corpus) and
# joins the exploded token stream on the token key — AQE broadcasts it
# while it fits, shuffles otherwise; the global total is a broadcast 1-row
# aggregate of the vocab frame, never a driver collect.
# --------------------------------------------------------------------------
@query(
    "unigram_logprob_score",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_SQL_TOKS}) AS token FROM documents
    ),
    freq AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM freq)
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           ROUND(AVG(ln(f.cnt * 1.0 / tot.n)), 4) AS mean_logprob
    FROM tok t JOIN freq f USING (token), tot
    GROUP BY t.doc_id
    """,
)
def unigram_logprob_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    n_parts = max(spark.sparkContext.defaultParallelism, 8)
    # Repartition ahead of the tokenize+explode (single-row-group scans would
    # run the whole token stream's partial aggregation on one task).
    tok = (
        docs.select("doc_id", "text")
        .repartition(n_parts, "doc_id")
        .select("doc_id", F.explode(tokens("text")).alias("token"))
    )
    freq = tok.groupBy("token").agg(F.count("*").alias("cnt"))
    tot = freq.agg(F.sum("cnt").cast("long").alias("n"))
    return (
        tok.join(freq, "token")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(
                F.avg(F.log(F.col("cnt") * 1.0 / F.col("n"))), 4
            ).alias("mean_logprob"),
        )
    )
