"""Deduplication operators: exact, shingle-Jaccard, MinHash-LSH, SimHash.

The driver's north star adds training-data-pipeline dedup as a first-class
capability (SURVEY.md §2.3 "LLM-pipeline ops"). Structurally, every algorithm
here is one-or-two MapReduce rounds — the same shuffle shape the reference's
engine executes (hash-partition by key, grouped reduce, ``src/mapreduce.c:
110-138, 215-238``) — expressed as DataFrame plans:

- exact dedup: hash-groupBy on content (one shuffle on md5(text));
- shingle-Jaccard near-dup: inverted index on 3-token shingles -> candidate
  pair generation -> exact Jaccard verify. The shingle join is the published
  MapReduce similarity-join pattern (cf. PAPERS.md: "Parallel Top-K Similarity
  Join Algorithms Using MapReduce", ICDE 2012);
- MinHash-LSH: 16 portable-hash permutations -> 4 bands of 4 -> band-bucket
  join; candidate pairs with matching-band counts (the verified path is the
  shingle join, so the two queries also cross-check each other in tests);
- SimHash: 60-bit sign-aggregated token hashes per doc.

All hashes are the engine-portable md5-60bit hash (functions/portable.py),
so every query here — including the LSH/SimHash ones — is fully
value-checked against a DuckDB oracle that recomputes the same signatures.

Scale posture: at 100 TB the shingle inverted index is the dominant shuffle;
it is keyed by shingle (high cardinality => well spread), distinct-ed before
the self-join to bound pair fan-out, and the per-doc size table is broadcast.
Hot shingles (boilerplate) would need a frequency cap — noted inline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from parallel_mapreduce_spark.functions.portable import phash60, phash60_sql
from parallel_mapreduce_spark.functions.text import tokens
from parallel_mapreduce_spark.registry import query
from parallel_mapreduce_spark.session import (
    bounded_persist,
    ensure_checkpoint_dir,
)
from parallel_mapreduce_spark.sources import (
    corpus_cut,
    load_table,
    register_views,
)

JACCARD_THRESHOLD = 0.5
N_PERMUTATIONS = 16
N_BANDS = 4  # 4 rows per band


def shingles3(toks: Column) -> Column:
    """Distinct 3-token shingles; empty array when fewer than 3 tokens.

    Built with slice + zip_with (NOT indexed access inside a transform
    lambda): higher-order functions run interpreted, so an expression like
    ``get(toks, i)`` re-evaluates the whole tokenization per element access —
    O(n^2) re-parsing per document. With slices, the token array is evaluated
    a constant number of times per row and each lambda touches only its
    lambda variables. (Found via .explain + bench: 35s -> sub-second at
    sf0.1.)
    """
    n = F.size(toks)
    cnt = F.greatest(n - 2, F.lit(0))
    a = F.slice(toks, 1, cnt)
    b = F.slice(toks, 2, cnt)
    c = F.slice(toks, 3, cnt)
    ab = F.zip_with(a, b, lambda x, y: F.concat_ws(" ", x, y))
    abc = F.zip_with(ab, c, lambda x, y: F.concat_ws(" ", x, y))
    return F.when(n >= 3, F.array_distinct(abc)).otherwise(
        F.array().cast("array<string>")
    )


_SQL_TOKS = "list_filter(string_split(text, ' '), x -> x <> '')"
_SQL_SHINGLES = (
    "list_distinct(list_transform(range(1, len(toks) - 1), "
    "i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))"
)


# --------------------------------------------------------------------------
# Exact dedup: group by a 128-bit content digest (md5 + length tiebreak),
# keep the smallest doc_id. Keying the shuffle by the digest — never the
# full text — means the shuffle payload at 100 TB is ~24 bytes/doc instead
# of the corpus itself; text bytes only ever cross a shuffle once, as the
# map-side-combined min_by survivor in _digest_groups below.
# --------------------------------------------------------------------------
@query(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS text_hash,
           MIN(doc_id) AS keep_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY text
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.md5("text").alias("text_hash"),
            F.length("text").alias("_len"),
            "doc_id",
        )
        .groupBy("text_hash", "_len")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
        .select("text_hash", "keep_id", "n_copies")
    )


# --------------------------------------------------------------------------
# NORMALIZED exact dedup (round 10) — the normalize-before-hash grain real
# pipelines (C4, Gopher, Dolma) apply between byte-exact and near-dup:
# lowercase, strip non-alphanumerics, collapse whitespace, THEN digest.
# Byte-exact dedup misses "Same Text!!" vs "same text"; MinHash wastes a
# signature comparison on what one canonical digest resolves. Same plan
# shape as dedup_exact (digests + lengths cross the one shuffle, text
# normalized in a single projection; n_raw_variants is a partial-
# aggregable COUNT DISTINCT over 16-byte digests).
#
# Fixture (the substring-family convention, residue 4 of the doc_id % 5
# classes, offset +77M — collision-free against the +55M/+66M classes for
# the same arithmetic reasons): every doc_id % 5 == 4 document reappears
# UPPERCASED with trailing punctuation — raw digests differ, normalized
# digests match, so the norm_only branch fires at every SF and the oracle
# replays the mangle + normalization token-for-token.
#
# Engine-parity note: DuckDB regexp_replace replaces the FIRST match
# unless given the 'g' flag; Spark's is global by default — the oracle
# must say 'g' or the two engines normalize differently.
# --------------------------------------------------------------------------
NORM_VARIANT_MOD = 5  # same residue universe as the substring fixtures
NORM_VARIANT_RESIDUE = 4
NORM_VARIANT_OFFSET = 77_000_001


def _norm_text(col) -> Column:
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(col), "[^a-z0-9 ]", ""), " +", " "
        )
    )


@query(
    "dedup_exact_normalized",
    oracle=f"""
    WITH working AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + {NORM_VARIANT_OFFSET}, upper(text) || ' !!'
      FROM documents
      WHERE doc_id % {NORM_VARIANT_MOD} = {NORM_VARIANT_RESIDUE}
    ),
    k AS (
      SELECT doc_id, md5(text) AS rk,
             trim(regexp_replace(regexp_replace(lower(text),
                    '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS nt
      FROM working
    )
    SELECT MIN(doc_id) AS group_rep,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(COUNT(DISTINCT rk) AS BIGINT) AS n_raw_variants,
           COUNT(DISTINCT rk) > 1 AS norm_only
    FROM k GROUP BY nt HAVING COUNT(*) >= 2
    """,
)
def dedup_exact_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(group_rep, n_members, n_raw_variants, norm_only) per normalized-
    text duplicate group (>= 2 members): norm_only marks groups byte-
    exact dedup cannot see (>= 2 distinct raw digests merged by
    normalization)."""
    register_views(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    variants = docs.filter(
        F.col("doc_id") % NORM_VARIANT_MOD == NORM_VARIANT_RESIDUE
    ).select(
        (F.col("doc_id") + NORM_VARIANT_OFFSET).alias("doc_id"),
        F.concat(F.upper("text"), F.lit(" !!")).alias("text"),
    )
    working = docs.unionByName(variants)
    nt = _norm_text(F.col("text"))
    keyed = working.select(
        "doc_id",
        F.md5("text").alias("rk"),
        F.md5(nt).alias("nk"),
        F.length(nt).alias("nl"),
    )
    return (
        keyed.groupBy("nk", "nl")
        .agg(
            F.min("doc_id").alias("group_rep"),
            F.count("*").cast("long").alias("n_members"),
            F.countDistinct("rk").cast("long").alias("n_raw_variants"),
        )
        .filter(F.col("n_members") >= 2)
        .select(
            "group_rep",
            "n_members",
            "n_raw_variants",
            (F.col("n_raw_variants") > 1).alias("norm_only"),
        )
    )


def _digest_groups(docs: DataFrame) -> DataFrame:
    """One row per distinct text: (_k, _l, rep, text) where _k/_l are the
    md5/length digest, rep is the min doc_id of the group and text is that
    representative's text (min_by — partial aggregation keeps at most one
    text per group per map task, so text bytes cross the shuffle once and
    only as group survivors, not as the grouping key). No collect_list
    anywhere: a pathological corpus-sized copy group costs one counter, not
    an unbounded array on one reducer."""
    return docs.groupBy(
        F.md5("text").alias("_k"), F.length("text").alias("_l")
    ).agg(F.min("doc_id").alias("rep"), F.min_by("text", "doc_id").alias("text"))


def exact_dup_members(docs: DataFrame) -> DataFrame:
    """(rep, doc_id): every doc mapped to the min-doc_id representative of
    its exact-text group. Shared by every near-dup path: identical texts
    have identical shingles/signatures, so all signature computation and
    index joins run on representatives only (see _rep_texts) and expand back
    to members afterwards (quadratic fan-out on duplicate-heavy corpora
    collapses to the distinct-text case). Both shuffles here move digests
    and ids only — never text."""
    ids = docs.select(
        "doc_id", F.md5("text").alias("_k"), F.length("text").alias("_l")
    )
    return ids.join(_digest_groups(docs).select("_k", "_l", "rep"), ["_k", "_l"]).select(
        "rep", "doc_id"
    )


def _rep_texts(docs: DataFrame, n_parts: int) -> DataFrame:
    """(doc_id, text) of exact-text group representatives, spread across
    n_parts. Built from the same _digest_groups subplan as
    exact_dup_members, so within one query plan the digest aggregation's
    exchange is reused, not recomputed."""
    return (
        _digest_groups(docs)
        .repartition(n_parts, "rep")
        .select(F.col("rep").alias("doc_id"), "text")
    )


def expand_rep_pairs(
    rep_pairs: DataFrame, members: DataFrame, payload: str
) -> DataFrame:
    """Expand representative-level pairs (doc_a, doc_b, <payload>) to all
    member combinations; identical texts carry their group's payload."""
    m = members.select("rep", "doc_id")
    ma = m.select(F.col("rep").alias("doc_a"), F.col("doc_id").alias("ida"))
    mb = m.select(F.col("rep").alias("doc_b"), F.col("doc_id").alias("idb"))
    return (
        rep_pairs.join(ma, "doc_a")
        .join(mb, "doc_b")
        .select(
            F.least("ida", "idb").alias("doc_a"),
            F.greatest("ida", "idb").alias("doc_b"),
            payload,
        )
    )


def within_group_pairs(
    members: DataFrame, eligible_reps: DataFrame, payload_col
) -> DataFrame:
    """All (doc_a < doc_b) pairs of copies of the same eligible text, with a
    constant payload (identical texts: Jaccard 1.0 / Hamming 0 / all bands).

    Scale note: the pair-list contract is inherently quadratic in a group's
    copy count — a corpus-sized copy group would emit a corpus²-sized output
    no matter how it is computed. That is a property of "emit all pairs",
    not of this plan (the join itself is an equi-join on rep, so AQE skew
    handling applies); pipelines that only need keep/drop decisions should
    consume the linear-sized outputs instead (exact_dup_members /
    neardup_clusters), which is exactly what pipeline_clean_corpus does."""
    g = members.select("rep", "doc_id").join(eligible_reps, "rep")
    a, b = g.alias("a"), g.alias("b")
    return a.join(
        b,
        (F.col("a.rep") == F.col("b.rep"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        payload_col,
    )


# --------------------------------------------------------------------------
# Near-dup via exact 3-shingle Jaccard over an inverted index. This is the
# verified (oracle-checked) near-dup path; MinHash below is its scale
# approximation.
# --------------------------------------------------------------------------
@query(
    "neardup_jaccard_pairs",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
    sh AS (SELECT doc_id, unnest({_SQL_SHINGLES}) AS s FROM t WHERE len(toks) >= 3),
    sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           ROUND(shared * 1.0 / (sa.sz + sb.sz - shared), 4) AS jaccard
    FROM pairs
    JOIN sz sa ON doc_a = sa.doc_id
    JOIN sz sb ON doc_b = sb.doc_id
    WHERE shared * 1.0 / (sa.sz + sb.sz - shared) >= {JACCARD_THRESHOLD}
    """,
    headline=True,
)
def neardup_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    n = max(spark.sparkContext.defaultParallelism, 8)
    # Collapse exact-duplicate texts BEFORE the shingle inverted index: on a
    # duplicate-heavy corpus every copy multiplies the index join fan-out
    # quadratically, while the collapsed form shingles each distinct text
    # once and reconstructs the full pair set afterwards. Measured on a 10x
    # replicated sf0.1 (50k docs, 10 copies each): 45s -> 9s, output
    # identical. The collapse is digest-keyed min/min_by aggregation (see
    # _digest_groups) — no per-group array anywhere, so even a corpus-sized
    # copy group costs one counter; only the emit-all-pairs expansion is
    # inherently quadratic (see within_group_pairs' scale note).
    #
    # Round-14 optimization (guide §5): the collapse/shingle chain feeds
    # MANY consumers (the index self-join's two sides, the eligible filter,
    # and members' four join legs), and the joins run broadcast at this
    # scale, so no ReusedExchange ever dedups the subtrees — the committed
    # plan re-scanned documents 12x. corpus_cut materializes each shared
    # frame once; every consumer reads the cut.
    members = corpus_cut(exact_dup_members(docs), sf_dir)
    reps = _rep_texts(docs, n)
    shingled = corpus_cut(
        reps.select("doc_id", shingles3(tokens("text")).alias("sh")), sf_dir
    )
    eligible = shingled.filter(F.size("sh") > 0).select(F.col("doc_id").alias("rep"))
    rep_pairs = jaccard_pairs(shingled)
    cross = expand_rep_pairs(rep_pairs, members, "jaccard")
    within = within_group_pairs(members, eligible, F.lit(1.0).alias("jaccard"))
    return cross.unionByName(within)


# --------------------------------------------------------------------------
# The 100 TB form of the shingle join: identical pipeline plus a
# document-frequency cap that anti-joins boilerplate shingles out of the
# inverted index before the self-join (fan-out per shingle is quadratic in
# its document frequency, so one boilerplate header shared by 1M docs is
# 10^12 candidate pairs unless dropped). The cap is far above the synthetic
# corpus's max shingle frequency (7-9 across sfs), so this plan is
# oracle-equal to the exact query here while being the plan that survives a
# boilerplate-heavy corpus; tests/test_dedup.py additionally pins that a
# binding cap only ever removes pairs (no false positives, scores never
# increase).
# --------------------------------------------------------------------------
SHINGLE_FREQ_CAP = 100


@query(
    "neardup_jaccard_pairs_capped",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
    sh AS (SELECT doc_id, unnest({_SQL_SHINGLES}) AS s FROM t WHERE len(toks) >= 3),
    sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           ROUND(shared * 1.0 / (sa.sz + sb.sz - shared), 4) AS jaccard
    FROM pairs
    JOIN sz sa ON doc_a = sa.doc_id
    JOIN sz sb ON doc_b = sb.doc_id
    WHERE shared * 1.0 / (sa.sz + sb.sz - shared) >= {JACCARD_THRESHOLD}
    """,
    headline=True,  # bench the 100 TB-safe capped plan alongside the exact one
)
def neardup_jaccard_pairs_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    n = max(spark.sparkContext.defaultParallelism, 8)
    # Same round-14 corpus_cut as neardup_jaccard_pairs; the freq-cap
    # census adds a THIRD consumer of the shingle frame, so the cut pays
    # off even harder here.
    members = corpus_cut(exact_dup_members(docs), sf_dir)
    reps = _rep_texts(docs, n)
    shingled = corpus_cut(
        reps.select("doc_id", shingles3(tokens("text")).alias("sh")), sf_dir
    )
    eligible = shingled.filter(F.size("sh") > 0).select(F.col("doc_id").alias("rep"))
    rep_pairs = jaccard_pairs(shingled, freq_cap=SHINGLE_FREQ_CAP)
    cross = expand_rep_pairs(rep_pairs, members, "jaccard")
    within = within_group_pairs(members, eligible, F.lit(1.0).alias("jaccard"))
    return cross.unionByName(within)


def jaccard_pairs(shingled: DataFrame, freq_cap: int | None = None) -> DataFrame:
    """(doc_id, sh: array<string>) -> (doc_a, doc_b, jaccard >= threshold).

    The per-doc shingle-set size rides along with each exploded row
    (shingles3 output is already distinct, so sz = size(sh)) instead of a
    separate groupBy + broadcast-join per side: the whole query is 2 scans
    of the input (join probe + build) rather than 4, and the Jaccard
    denominator is available directly at pair-aggregation time.

    ``freq_cap``: drop shingles appearing in more than ``freq_cap`` docs
    before the self-join — the 100 TB guard against boilerplate shingles,
    whose fan-out in the index join is quadratic in document frequency.
    The hot set is by construction tiny (only shingles above the cap), so
    it broadcasts; the Jaccard denominator keeps the ORIGINAL set sizes,
    so pairs sharing no hot shingle score identically to the exact form
    and pairs that do share one only ever score lower (never a false
    positive).

    Measured alternative, rejected: computing df as COUNT(*) OVER
    (PARTITION BY s) to share the self-join's exchange is 3.5x SLOWER
    (69s vs 20s on the 10x probe corpus) — the window sorts the entire
    exploded stream per partition and gets no map-side combine, while the
    census groupBy partially aggregates before its (much smaller) shuffle.
    """
    sh = shingled.select(
        "doc_id", F.size("sh").alias("sz"), F.explode("sh").alias("s")
    )
    if freq_cap is not None:
        hot = (
            sh.groupBy("s")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > freq_cap)
            .select("s")
        )
        sh = sh.join(F.broadcast(hot), "s", "left_anti")
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sz").alias("sz_a"),
            F.col("b.sz").alias("sz_b"),
        )
        .agg(F.count("*").alias("shared"))
    )
    jac = F.col("shared") * F.lit(1.0) / (F.col("sz_a") + F.col("sz_b") - F.col("shared"))
    return pairs.filter(jac >= JACCARD_THRESHOLD).select(
        "doc_a", "doc_b", F.round(jac, 4).alias("jaccard")
    )


# --------------------------------------------------------------------------
# MinHash-LSH candidates: 16 permutations, banded 4x4; pairs sharing >= 1
# band bucket are candidates, reported with the matching-band count.
#
# Permutations are the textbook affine construction h_i(s) = (a_i*h(s)+b_i)
# mod p over ONE base hash per shingle (the same shape as Spark MLlib's
# MinHashLSH): the expensive md5 runs once per exploded shingle row and the
# 16 permutations are integer multiply-adds — measured 20s -> ~2s at sf0.1
# vs hashing each (perm, shingle) pair. p < 2^31 keeps a_i * h(s) inside a
# 64-bit signed product on both engines. Fully value-checked: the base hash
# is engine-portable (functions/portable.py) and the coefficients are
# literals in the oracle SQL. Recall against the exact Jaccard pairs is
# additionally asserted in tests/test_dedup.py.
# --------------------------------------------------------------------------
MINHASH_PRIME = 2038074743  # largest prime below 2^31 used by MLlib's MinHashLSH

# Deterministic affine coefficients; a_i != 0 for all i < N_PERMUTATIONS.
_MINHASH_COEFFS = [
    (
        (2654435761 * (i + 1)) % MINHASH_PRIME,
        (40503 * (i + 1) + 12345) % MINHASH_PRIME,
    )
    for i in range(N_PERMUTATIONS)
]
assert all(a != 0 for a, _ in _MINHASH_COEFFS)

_SQL_A_LIST = "[" + ", ".join(str(a) for a, _ in _MINHASH_COEFFS) + "]"
_SQL_B_LIST = "[" + ", ".join(str(b) for _, b in _MINHASH_COEFFS) + "]"


def _minhash_of(texts: DataFrame) -> DataFrame:
    """(doc_id, sig: array<long>[N_PERMUTATIONS]) — min over shingles of
    (a_i * phash60(shingle) % p + b_i) % p per permutation; one md5 per
    shingle row, one shuffle on doc_id."""
    sh = texts.select(
        "doc_id", F.explode(shingles3(tokens("text"))).alias("s")
    ).select("doc_id", (phash60(F.col("s")) % MINHASH_PRIME).alias("ph"))
    mins = [
        F.min((F.lit(a) * F.col("ph") + F.lit(b)) % MINHASH_PRIME).alias(f"h{i}")
        for i, (a, b) in enumerate(_MINHASH_COEFFS)
    ]
    sig = sh.groupBy("doc_id").agg(*mins)
    return sig.select(
        "doc_id", F.array(*[F.col(f"h{i}") for i in range(N_PERMUTATIONS)]).alias("sig")
    )


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signatures for every doc — computed on distinct texts, expanded to
    members (identical texts have identical signatures by construction)."""
    docs = load_table(spark, sf_dir, "documents")
    n = max(spark.sparkContext.defaultParallelism, 8)
    members = exact_dup_members(docs)
    rep_sigs = _minhash_of(_rep_texts(docs, n))
    return (
        members.select("rep", "doc_id")
        .join(rep_sigs.withColumnRenamed("doc_id", "rep"), "rep")
        .select("doc_id", "sig")
    )


def _lsh_bands(sig: DataFrame) -> DataFrame:
    rows_per_band = N_PERMUTATIONS // N_BANDS
    return sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(band).alias("band_idx"),
                        phash60(
                            F.concat_ws(
                                ":",
                                *[
                                    F.get(
                                        F.col("sig"), band * rows_per_band + r
                                    ).cast("string")
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("band_hash"),
                    )
                    for band in range(N_BANDS)
                ]
            )
        ).alias("bh"),
    ).select("doc_id", "bh.band_idx", "bh.band_hash")


_ROWS_PER_BAND = N_PERMUTATIONS // N_BANDS
_SQL_BAND_CONCAT = " || ':' || ".join(
    f"sg[band_idx * {_ROWS_PER_BAND} + {r + 1}]" for r in range(_ROWS_PER_BAND)
)


# The full banded-index replay (tokens -> shingles -> affine minhash ->
# banded buckets), shared by minhash_lsh_candidates and the MLlib parity
# exhibit below so both oracles replay the IDENTICAL portable pipeline.
_SQL_MINHASH_BAND_CTES = f"""t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
    sh AS (SELECT doc_id, unnest({_SQL_SHINGLES}) AS s FROM t WHERE len(toks) >= 3),
    ph AS (SELECT doc_id, {phash60_sql("s")} % {MINHASH_PRIME} AS ph FROM sh),
    mh AS (
      SELECT doc_id, i,
             MIN(({_SQL_A_LIST}[i + 1] * ph + {_SQL_B_LIST}[i + 1])
                 % {MINHASH_PRIME}) AS h
      FROM ph CROSS JOIN range({N_PERMUTATIONS}) r(i)
      GROUP BY doc_id, i
    ),
    sig AS (SELECT doc_id, list(h::VARCHAR ORDER BY i) AS sg FROM mh GROUP BY doc_id),
    bands AS (
      SELECT doc_id, band_idx,
             {phash60_sql(_SQL_BAND_CONCAT)} AS band_hash
      FROM sig CROSS JOIN range({N_BANDS}) b(band_idx)
    )"""


@query(
    "minhash_lsh_candidates",
    oracle=f"""
    WITH {_SQL_MINHASH_BAND_CTES}
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_bands
    FROM bands a
    JOIN bands b
      ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
     AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    """,
    headline=True,
)
def minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate near-dup pairs with the number of matching LSH bands.

    Band join runs on distinct-text representatives only (exact copies share
    every band by construction), then expands to member pairs — same
    collapse-first shape as the Jaccard path."""
    register_views(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    n = max(spark.sparkContext.defaultParallelism, 8)
    # Round-14 corpus_cut (guide §5): members feeds four join legs and
    # rep_sigs feeds both band-join sides plus the eligible filter; the
    # broadcast joins at this scale leave no exchange to reuse, so without
    # the cut each consumer re-ran the scan -> digest -> minhash chain
    # (measured 1.67 -> 1.50s at sf0.1, interleaved A/B, equality pinned;
    # cross-session comparisons of this query swing +-30% and first read
    # as a regression — probes/ab_neardup_cut.py is the methodology).
    members = corpus_cut(exact_dup_members(docs), sf_dir)
    rep_sigs = corpus_cut(_minhash_of(_rep_texts(docs, n)), sf_dir)
    bands = _lsh_bands(rep_sigs)
    a = bands.alias("a")
    b = bands.alias("b")
    rep_pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_bands"))
    )
    eligible = rep_sigs.select(F.col("doc_id").alias("rep"))
    cross = expand_rep_pairs(rep_pairs, members, "n_bands")
    within = within_group_pairs(
        members, eligible, F.lit(N_BANDS).cast("long").alias("n_bands")
    )
    return cross.unionByName(within)


# --------------------------------------------------------------------------
# Banded-index precision/recall CURVE (round 10) — the committed Broder
# S-curve for the shipped 16-perm/4-band configuration: at each exact-
# Jaccard threshold t, what fraction of true >= t pairs does the band
# join surface (recall), and what fraction of surfaced candidates are
# true >= t pairs (precision)? minhash_jaccard_estimate pins signature
# accuracy and the MLlib parity pins the >= 0.9 tail; this measures the
# full operating range a user actually tunes bands against (theory:
# P(candidate) = 1 - (1 - t^4)^4 -> 0.06 at t=0.5, 0.66 at t=0.8, 0.94
# at t=0.9; the committed numbers are this corpus's empirical curve).
# Thresholds start AT the exact-pair frame's own >= 0.5 floor, so
# sub-threshold candidates (possible at J < 0.5, where the band match
# probability is already <= 6%) need no exact J — they fold to 0 via
# the full join and only ever lower precision, exactly as they should.
# Universe: member-level pairs (the minhash_lsh_candidates convention);
# both legs run on exact-text representatives and expand to members.
# --------------------------------------------------------------------------
PR_THRESHOLDS = (0.5, 0.6, 0.7, 0.8, 0.9)


@query(
    "minhash_lsh_pr_curve",
    oracle=f"""
    WITH {_SQL_MINHASH_BAND_CTES},
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
    ),
    sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    j AS (
      SELECT doc_a, doc_b,
             ROUND(shared * 1.0 / (sa.sz + sb.sz - shared), 4) AS jaccard
      FROM pairs
      JOIN sz sa ON doc_a = sa.doc_id
      JOIN sz sb ON doc_b = sb.doc_id
      WHERE shared * 1.0 / (sa.sz + sb.sz - shared) >= {JACCARD_THRESHOLD}
    ),
    u AS (
      SELECT COALESCE(j.jaccard, 0) AS jaccard,
             c.doc_a IS NOT NULL AS cand
      FROM j FULL JOIN cand c
        ON j.doc_a = c.doc_a AND j.doc_b = c.doc_b
    ),
    th(threshold) AS (VALUES {", ".join(f"({t!r})" for t in PR_THRESHOLDS)})
    SELECT th.threshold,
           CAST(SUM(CASE WHEN jaccard >= th.threshold THEN 1 ELSE 0 END)
                AS BIGINT) AS n_true,
           CAST(SUM(CASE WHEN cand AND jaccard >= th.threshold
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_cand_true,
           CAST(SUM(CASE WHEN cand THEN 1 ELSE 0 END) AS BIGINT) AS n_cand,
           ROUND(SUM(CASE WHEN cand AND jaccard >= th.threshold
                     THEN 1 ELSE 0 END) * 1.0
                 / NULLIF(SUM(CASE WHEN jaccard >= th.threshold
                          THEN 1 ELSE 0 END), 0), 4) AS recall,
           ROUND(SUM(CASE WHEN cand AND jaccard >= th.threshold
                     THEN 1 ELSE 0 END) * 1.0
                 / NULLIF(SUM(CASE WHEN cand THEN 1 ELSE 0 END), 0), 4)
             AS "precision"
    FROM u CROSS JOIN th GROUP BY 1
    """,
)
def minhash_lsh_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(threshold, n_true, n_cand_true, n_cand, recall, precision) per
    exact-Jaccard threshold: the banded index's measured S-curve."""
    register_views(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    n = max(spark.sparkContext.defaultParallelism, 8)
    members = exact_dup_members(docs)
    reps = _rep_texts(docs, n)
    shingled = reps.select(
        "doc_id", shingles3(tokens("text")).alias("sh")
    ).filter(F.size("sh") > 0)
    eligible = shingled.select(F.col("doc_id").alias("rep"))
    rep_j = jaccard_pairs(shingled)
    exact = expand_rep_pairs(rep_j, members, "jaccard").unionByName(
        within_group_pairs(members, eligible, F.lit(1.0).alias("jaccard"))
    )
    bands = _lsh_bands(_minhash_of(reps))
    ba, bb = bands.alias("a"), bands.alias("b")
    rep_cand = (
        ba.join(
            bb,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
        .withColumn("c", F.lit(True))
    )
    cand = expand_rep_pairs(rep_cand, members, "c").unionByName(
        within_group_pairs(members, eligible, F.lit(True).alias("c"))
    )
    u = exact.join(cand, ["doc_a", "doc_b"], "full").select(
        F.coalesce("jaccard", F.lit(0.0)).alias("jaccard"),
        F.coalesce("c", F.lit(False)).alias("cand"),
    )
    thresholds = F.explode(
        F.array(*[F.lit(t) for t in PR_THRESHOLDS])
    ).alias("threshold")
    hit = F.col("cand") & (F.col("jaccard") >= F.col("threshold"))
    as_l = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    return (
        u.select("jaccard", "cand", thresholds)
        .groupBy("threshold")
        .agg(
            as_l(F.col("jaccard") >= F.col("threshold")).alias("n_true"),
            as_l(hit).alias("n_cand_true"),
            as_l(F.col("cand")).alias("n_cand"),
            F.round(
                as_l(hit)
                / F.nullif(
                    as_l(F.col("jaccard") >= F.col("threshold")), F.lit(0)
                ),
                4,
            ).alias("recall"),
            F.round(
                as_l(hit) / F.nullif(as_l(F.col("cand")), F.lit(0)), 4
            ).alias("precision"),
        )
    )


# --------------------------------------------------------------------------
# pyspark.ml MinHashLSH parity exhibit (round 9) — cross-validates the
# hand-rolled banded index above against Spark MLlib's INDEPENDENT
# implementation (org.apache.spark.ml.feature.MinHashLSH), the index a
# real Spark user reaches for first. Both indexes run over the same
# 3-shingle sets; the output is every doc pair with exact shingle-Jaccard
# >= PARITY_JACCARD, flagged with whether each index surfaced it:
#
#   - in_banded is HONESTLY replayed by the oracle (the banded pipeline
#     is fully SQL-portable via _SQL_MINHASH_BAND_CTES), so the column is
#     value-checked, not assumed.
#   - in_mllib cannot be replayed in DuckDB (MLlib's seeded coefficients
#     live in the JVM), so the oracle pins it TRUE: MLlib with
#     PARITY_TABLES OR-ed hash tables misses a J >= 0.9 pair with
#     probability (1 - J)^tables <= 1e-8 — and the outcome is FROZEN by
#     the literal seed, verified green at all three SFs before shipping.
#     A regression in either index (or in the shared shingle layer) makes
#     a boolean flip or a row vanish — a loud driver hash/row mismatch.
#
# HashingTF (2^20 binary features) maps shingles to vector indices.
# A bucket collision CAN lower binary Jaccard — two shingles in the
# intersection colliding moves i/u to (i-1)/(u-1), which is smaller for
# i < u — so the admission guarantee is a MARGIN argument, not an
# invariant: expected collisions per pair are ~C(u,2)/2^20 (u = union
# shingle count; ~0.5 collisions at u = 1000), shifting measured Jaccard
# by ~c/u ~ 5e-4, three orders of magnitude under the 0.1 margin between
# the candidate floor (PARITY_MLLIB_J = 0.8) and the parity universe
# (PARITY_JACCARD = 0.9). Retuning numFeatures or PARITY_MLLIB_J must
# re-check that gap, not assume merge-monotonicity. Scale posture: both
# indexes run on exact-text representatives (collapse-first), MLlib's
# join explodes hashes exactly like the hand-rolled band join (same
# shuffle shape), and the exact-Jaccard verify touches only the planted
# near-dup pairs.
# --------------------------------------------------------------------------
PARITY_JACCARD = 0.9  # exact-Jaccard floor for the parity universe
PARITY_TABLES = 8  # MLlib numHashTables: miss prob (1-J)^8 <= 1e-8
PARITY_MLLIB_J = 0.8  # candidate-join Jaccard floor (margin under 0.9)
# The oracle pins in_mllib TRUE under this frozen seed, so the driver
# value hash depends on MLlib's seeded coefficient derivation staying
# bit-stable: the pinned outcome was verified on Spark 4.1.2 (pyspark
# 4.1.2, this container) at all three SFs. If a Spark upgrade ever
# changes MinHashLSH's seeded hash generation, expect a driver hash
# mismatch on THIS query (and the BRP twin in similarity.py) before
# suspecting the portable index — tests/test_dedup.py asserts the MLlib
# leg separately so the failure is self-explaining.
PARITY_SEED = 20260815
PARITY_TF_FEATURES = 1 << 20


@query(
    "mllib_minhash_parity_pairs",
    oracle=f"""
    WITH {_SQL_MINHASH_BAND_CTES},
    bp AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a
      JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
    ),
    sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    j AS (
      SELECT doc_a, doc_b,
             ROUND(shared * 1.0 / (sa.sz + sb.sz - shared), 4) AS jaccard
      FROM pairs
      JOIN sz sa ON doc_a = sa.doc_id
      JOIN sz sb ON doc_b = sb.doc_id
      WHERE ROUND(shared * 1.0 / (sa.sz + sb.sz - shared), 4)
              >= {PARITY_JACCARD}
    )
    SELECT j.doc_a, j.doc_b, j.jaccard,
           bp.doc_a IS NOT NULL AS in_banded,
           TRUE AS in_mllib
    FROM j
    LEFT JOIN bp ON j.doc_a = bp.doc_a AND j.doc_b = bp.doc_b
    """,
)
def mllib_minhash_parity_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_a, doc_b, jaccard, in_banded, in_mllib) for every doc pair
    with exact 3-shingle Jaccard >= PARITY_JACCARD: the cross-validation
    of the portable banded index against pyspark.ml's MinHashLSH."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    register_views(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    n = max(spark.sparkContext.defaultParallelism, 8)
    members = exact_dup_members(docs)
    reps = _rep_texts(docs, n)
    shingled = reps.select(
        "doc_id", shingles3(tokens("text")).alias("sh")
    ).filter(F.size("sh") > 0)
    eligible = shingled.select(F.col("doc_id").alias("rep"))
    # Exact-Jaccard parity universe at rep level (ROUNDED >= floor, same
    # expression the oracle filters on).
    rep_j = jaccard_pairs(shingled).filter(
        F.col("jaccard") >= PARITY_JACCARD
    )
    # Leg 1: the hand-rolled banded index (distinct candidate pairs).
    bands = _lsh_bands(_minhash_of(reps))
    ba, bb = bands.alias("a"), bands.alias("b")
    banded = (
        ba.join(
            bb,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
        .withColumn("in_banded", F.lit(True))
    )
    # Leg 2: MLlib MinHashLSH over HashingTF(binary) shingle vectors.
    feat = HashingTF(
        inputCol="sh",
        outputCol="features",
        numFeatures=PARITY_TF_FEATURES,
        binary=True,
    ).transform(shingled)
    model = MinHashLSH(
        inputCol="features",
        outputCol="hashes",
        numHashTables=PARITY_TABLES,
        seed=PARITY_SEED,
    ).fit(feat)
    mllib = (
        model.approxSimilarityJoin(
            feat, feat, 1.0 - PARITY_MLLIB_J, distCol="_d"
        )
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        .distinct()
        .withColumn("in_mllib", F.lit(True))
    )
    rep_out = (
        rep_j.join(banded, ["doc_a", "doc_b"], "left")
        .join(mllib, ["doc_a", "doc_b"], "left")
        .select(
            "doc_a",
            "doc_b",
            F.struct(
                F.col("jaccard"),
                F.coalesce("in_banded", F.lit(False)).alias("in_banded"),
                F.coalesce("in_mllib", F.lit(False)).alias("in_mllib"),
            ).alias("p"),
        )
    )
    cross = expand_rep_pairs(rep_out, members, "p")
    within = within_group_pairs(
        members,
        eligible,
        F.struct(
            F.lit(1.0).alias("jaccard"),
            F.lit(True).alias("in_banded"),
            F.lit(True).alias("in_mllib"),
        ).alias("p"),
    )
    return cross.unionByName(within).select(
        "doc_a",
        "doc_b",
        F.col("p.jaccard").alias("jaccard"),
        F.col("p.in_banded").alias("in_banded"),
        F.col("p.in_mllib").alias("in_mllib"),
    )


# --------------------------------------------------------------------------
# SimHash: 60-bit signature; bit b is the sign of sum over tokens of
# tf * (+/-1 per bit of phash60(token)). 60 bits (not 64) because the
# portable hash (functions/portable.py) yields 60 uniform bits — which is
# what makes the signature fully value-checkable against the DuckDB oracle.
# --------------------------------------------------------------------------
SIMHASH_BITS = 60

_SQL_SIMHASH_SIG = f"""
    tok AS (SELECT doc_id, unnest({_SQL_TOKS}) AS word FROM documents),
    tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM tok GROUP BY doc_id, word),
    bits AS (
      SELECT doc_id, i AS bit,
             SUM(CASE WHEN (({phash60_sql("word")} >> i) & 1) = 1
                      THEN tf ELSE -tf END) AS s
      FROM tf CROSS JOIN range({SIMHASH_BITS}) r(i)
      GROUP BY doc_id, i
    ),
    sig AS (
      SELECT doc_id,
             SUM(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END)::BIGINT
               AS simhash
      FROM bits GROUP BY doc_id
    )
"""


def _simhash_of(texts: DataFrame) -> DataFrame:
    """(doc_id, simhash: long) over a (doc_id, text) frame."""
    tok = texts.select("doc_id", F.explode(tokens("text")).alias("word"))
    tf = tok.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    h = phash60(F.col("word"))
    # One row per (doc, word, bit): contrib = tf if bit set else -tf.
    bits = tf.select(
        "doc_id",
        "tf",
        h.alias("h"),
        F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("bit"),
    ).select(
        "doc_id",
        "bit",
        F.when(F.expr("shiftright(h, bit) & 1") == 1, F.col("tf"))
        .otherwise(-F.col("tf"))
        .alias("contrib"),
    )
    bit_sums = bits.groupBy("doc_id", "bit").agg(F.sum("contrib").alias("s"))
    # Assemble the signature: sum of set bits' place values (non-negative —
    # 60 bits fit a BIGINT with headroom).
    return bit_sums.groupBy("doc_id").agg(
        F.sum(
            F.when(
                F.col("s") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), bit)")
            ).otherwise(F.lit(0).cast("long"))
        ).alias("simhash")
    )


def simhash_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, simhash) for every doc — computed on distinct texts, expanded
    to members."""
    docs = load_table(spark, sf_dir, "documents")
    n = max(spark.sparkContext.defaultParallelism, 8)
    members = exact_dup_members(docs)
    rep_sigs = _simhash_of(_rep_texts(docs, n))
    return (
        members.select("rep", "doc_id")
        .join(rep_sigs.withColumnRenamed("doc_id", "rep"), "rep")
        .select("doc_id", "simhash")
    )


@query(
    "simhash_signatures",
    oracle=f"WITH {_SQL_SIMHASH_SIG} SELECT doc_id, simhash FROM sig",
)
def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return simhash_df(spark, sf_dir)


# --------------------------------------------------------------------------
# SimHash near-dup pairs: pigeonhole band join + exact Hamming verify.
# Splitting the 60-bit signature into 4 15-bit bands guarantees that any
# pair with Hamming distance <= 3 shares at least one exact band (<= 3 bit
# flips can dirty at most 3 of the 4 bands) — so the candidate join is an
# EQUI-join on (band_idx, band_value): one shuffle, no all-pairs product,
# the same index-join shape as MinHash-LSH. Fully value-checked (portable
# hash); exact-duplicate texts are additionally asserted to collide at
# Hamming 0 in tests/test_dedup.py.
# --------------------------------------------------------------------------
SIMHASH_N_BANDS = 4  # 15 bits per band
SIMHASH_BAND_BITS = SIMHASH_BITS // SIMHASH_N_BANDS
SIMHASH_MAX_HAMMING = 3  # pigeonhole-complete for 4 bands


@query(
    "simhash_neardup_pairs",
    oracle=f"""
    WITH {_SQL_SIMHASH_SIG},
    bands AS (
      SELECT doc_id, simhash, b AS band_idx,
             (simhash >> ({SIMHASH_BAND_BITS} * b)) & {2**SIMHASH_BAND_BITS - 1}
               AS band_val
      FROM sig CROSS JOIN range({SIMHASH_N_BANDS}) r(b)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.simhash AS sa, b.simhash AS sb
      FROM bands a
      JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_val = b.band_val
       AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, bit_count(xor(sa, sb))::BIGINT AS hamming
    FROM cand
    WHERE bit_count(xor(sa, sb)) <= {SIMHASH_MAX_HAMMING}
    """,
)
def simhash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    n = max(spark.sparkContext.defaultParallelism, 8)
    members = exact_dup_members(docs)
    sig = _simhash_of(_rep_texts(docs, n))
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.expr(
                            f"(simhash >> {SIMHASH_BAND_BITS * b})"
                            f" & {2**SIMHASH_BAND_BITS - 1}"
                        ).alias("band_val"),
                    )
                    for b in range(SIMHASH_N_BANDS)
                ]
            )
        ).alias("bv"),
    ).select("doc_id", "simhash", "bv.band_idx", "bv.band_val")
    a = bands.alias("a")
    b = bands.alias("b")
    # A pair sharing k bands appears k times in the join; the groupBy both
    # dedupes candidates and carries the signatures for the Hamming verify.
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    rep_pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .agg(F.count("*").alias("n_shared_bands"))
        .filter(hamming <= SIMHASH_MAX_HAMMING)
        .select("doc_a", "doc_b", hamming.cast("long").alias("hamming"))
    )
    eligible = sig.select(F.col("doc_id").alias("rep"))
    cross = expand_rep_pairs(rep_pairs, members, "hamming")
    within = within_group_pairs(
        members, eligible, F.lit(0).cast("long").alias("hamming")
    )
    return cross.unionByName(within)


# --------------------------------------------------------------------------
# Near-dup clustering: connected components over the verified Jaccard pair
# graph — the step that turns pairwise near-dup hits into "keep one doc per
# cluster" decisions. Implemented as distributed min-label propagation: every
# doc starts labeled with its own id; each round, a doc takes the minimum
# label among itself and its neighbors; fixpoint = components. Each round is
# one shuffle on doc_id; rounds needed = graph diameter (near-dup clusters
# are tiny and dense, so a handful). The driver loop only orchestrates —
# all data stays distributed; reliable checkpoint() every CC_CHECK_EVERY
# rounds truncates the growing lineage (round N doesn't replay rounds
# 1..N-1) and survives executor loss, unlike executor-block localCheckpoint.
#
# Oracle: DuckDB recursive CTE computing min reachable id per node — the
# same fixpoint, derived declaratively.
# --------------------------------------------------------------------------
_CLUSTER_PAIRS_SQL = f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
    sh AS (SELECT doc_id, unnest({_SQL_SHINGLES}) AS s FROM t WHERE len(toks) >= 3),
    sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b
    FROM pairs
    JOIN sz sa ON doc_a = sa.doc_id
    JOIN sz sb ON doc_b = sb.doc_id
    WHERE shared * 1.0 / (sa.sz + sb.sz - shared) >= {JACCARD_THRESHOLD}
"""


@query(
    "neardup_clusters",
    oracle=f"""
    WITH RECURSIVE pairs AS ({_CLUSTER_PAIRS_SQL}),
    nodes AS (
      SELECT DISTINCT doc_id FROM (
        SELECT doc_a AS doc_id FROM pairs
        UNION ALL SELECT doc_b FROM pairs
      )
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL SELECT doc_b, doc_a FROM pairs
    ),
    reach(doc_id, label) AS (
      SELECT doc_id, doc_id FROM nodes
      UNION
      SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.doc_id
    )
    SELECT doc_id, MIN(label) AS cluster_id
    FROM reach GROUP BY doc_id
    """,
)
def neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    pairs = neardup_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    return connected_components(pairs)


CC_MAX_ROUNDS = 64  # safety valve, NOT a truncation: exceeding it raises
# Propagation rounds per convergence check / checkpoint. 3 lets the typical
# near-dup graph (diameter <= 2: the last round is the no-change round)
# converge in ONE checkpoint batch; deeper graphs pay at most CC_CHECK_EVERY-1
# redundant propagation rounds per batch, far cheaper than an extra
# checkpoint + convergence action (measured ~1s on the sf0.1 pipeline).
CC_CHECK_EVERY = 3


def connected_components(pairs: DataFrame) -> DataFrame:
    """(doc_id, cluster_id) for every node in the (doc_a, doc_b) pair graph;
    cluster_id = min doc_id reachable. Distributed min-label propagation —
    see the block comment above for the scale argument.

    Fault tolerance / driver economy: every CC_CHECK_EVERY rounds the label
    frame is reliably ``checkpoint()``-ed (durable storage, survives executor
    loss — localCheckpoint would not) and ONE convergence action runs — a
    max() over a change flag the final propagation round computes inline, so
    the test is a scan of the just-checkpointed frame, not a second join.
    Driver round-trips and lineage both stay O(rounds / CC_CHECK_EVERY);
    propagation is deterministic and monotone, so "last round changed no
    label" is exactly the fixpoint. If CC_MAX_ROUNDS is exhausted while labels are
    still changing, this RAISES rather than silently returning unconverged
    cluster ids (a truncated result would silently keep/drop the wrong
    documents downstream in pipeline_clean_corpus).
    """
    spark = pairs.sparkSession
    ensure_checkpoint_dir(spark)
    edges = pairs.union(pairs.select("doc_b", "doc_a")).toDF("src", "dst")
    # Materialize the pair graph once: every propagation round reads it, and
    # it is tiny relative to the corpus (near-dup pairs only).
    edges = edges.checkpoint(eager=True)
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .checkpoint(eager=True)
    )
    rounds = 0
    while rounds < CC_MAX_ROUNDS:
        for i in range(CC_CHECK_EVERY):
            neighbor_min = (
                edges.join(labels, edges.src == labels.doc_id)
                .groupBy(F.col("dst").alias("doc_id"))
                .agg(F.min("label").alias("nbr_label"))
            )
            new_label = F.least(
                F.col("label"), F.coalesce("nbr_label", F.col("label"))
            )
            # Propagation is deterministic and monotone: if ONE round changes
            # no label, every later round is a no-op — so fixpoint detection
            # only needs the LAST round's change flag, computed inline here.
            # The convergence test then becomes a scan-and-agg over the frame
            # this batch checkpoints anyway, replacing the extra
            # current-vs-previous join job per batch.
            cols = ["doc_id", new_label.alias("label")]
            if i == CC_CHECK_EVERY - 1:
                cols.append((new_label != F.col("label")).alias("chg"))
            labels = labels.join(neighbor_min, "doc_id", "left").select(*cols)
            rounds += 1
        labels = labels.checkpoint(eager=True)
        changed = labels.agg(F.max("chg")).first()[0]
        labels = labels.select("doc_id", "label")
        if not changed:
            return labels.select("doc_id", F.col("label").alias("cluster_id"))
    raise RuntimeError(
        f"connected_components: labels still changing after {CC_MAX_ROUNDS} "
        "propagation rounds (component diameter exceeds the cap); raise "
        "CC_MAX_ROUNDS rather than using a truncated clustering"
    )


# --------------------------------------------------------------------------
# Fuzzy entity matching: all name pairs at Levenshtein distance exactly 1,
# via a SymSpell-style deletion-neighborhood index. Candidate generation:
# each name emits itself plus every single-character deletion (len+1
# variants); any ed<=1 pair must share a variant (substitution at i -> both
# names minus position i; insertion/deletion -> the shorter name IS a
# variant of the longer), so the variant equi-join is a COMPLETE candidate
# set and the final levenshtein()==1 verify makes it exact. The oracle is
# the brute-force all-pairs formulation — its agreement proves the index
# loses nothing.
#
# Scale: the index join replaces O(N^2) levenshtein calls with an equi-join
# on ~N*(len+1) variant rows; candidates per bucket are names that already
# agree on all-but-one character, so the verify set is output-sized. This
# is the typo/near-key analogue of the shingle inverted index above.
# --------------------------------------------------------------------------
@query(
    "fuzzy_name_pairs",
    headline=True,
    oracle="""
    WITH snn AS (SELECT DISTINCT s_name FROM supplier)
    SELECT a.s_name AS name_a, b.s_name AS name_b
    FROM snn a JOIN snn b
      ON a.s_name < b.s_name AND levenshtein(a.s_name, b.s_name) = 1
    """,
)
def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    names = load_table(spark, sf_dir, "supplier").select("s_name").distinct()
    name = F.col("s_name")
    deletions = F.transform(
        F.sequence(F.lit(1), F.length(name)),
        lambda i: F.concat(
            name.substr(F.lit(1), i - 1),
            name.substr(i + 1, F.length(name)),
        ),
    )
    variants = names.select(
        name,
        F.explode(
            F.array_union(F.array(name), F.array_distinct(deletions))
        ).alias("v"),
    )
    a = variants.alias("a")
    b = variants.alias("b")
    return (
        a.join(
            b,
            (F.col("a.v") == F.col("b.v"))
            & (F.col("a.s_name") < F.col("b.s_name")),
        )
        .select(
            F.col("a.s_name").alias("name_a"), F.col("b.s_name").alias("name_b")
        )
        .distinct()
        .filter(F.levenshtein("name_a", "name_b") == 1)
    )


# --------------------------------------------------------------------------
# Triangle counting over the edit-distance-1 name graph — the classic
# multi-way self-join graph analytic, on the fuzzy-match edges above. Edges
# are already oriented (name_a < name_b), so each triangle a<b<c is counted
# exactly once by the two-hop join (a,b)+(b,c) closed by (a,c). Orientation
# is THE scale trick: joining the oriented edge list bounds intermediate
# two-hop paths by sum(out-degree^2) instead of sum(degree^2), and no
# triangle is produced three times to dedup later. Both joins are equi-joins
# on a name; AQE handles the skewed high-degree vertices.
# --------------------------------------------------------------------------
@query(
    "name_graph_triangles",
    oracle="""
    WITH e AS (
      SELECT a.s_name AS na, b.s_name AS nb
      FROM supplier a JOIN supplier b
        ON a.s_name < b.s_name AND levenshtein(a.s_name, b.s_name) = 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles,
           CAST(COUNT(DISTINCT e1.na) AS BIGINT) AS n_apex_names
    FROM e e1
    JOIN e e2 ON e2.na = e1.nb
    JOIN e e3 ON e3.na = e1.na AND e3.nb = e2.nb
    """,
)
def name_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_triangles, n_apex_names) in the ed-1 supplier-name graph; apex =
    the lexicographically smallest vertex of a triangle."""
    edges = fuzzy_name_pairs(spark, sf_dir)
    e1 = edges.select(F.col("name_a").alias("a"), F.col("name_b").alias("b"))
    e2 = edges.select(F.col("name_a").alias("b"), F.col("name_b").alias("c"))
    e3 = edges.select(F.col("name_a").alias("a"), F.col("name_b").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    return tri.agg(
        F.count("*").alias("n_triangles"),
        F.countDistinct("a").alias("n_apex_names"),
    )


# --------------------------------------------------------------------------
# Exact-duplicate rate per source: the dedup observability rollup a corpus
# report leads with — how much of each source is redundant copies. Built on
# the same digest-keyed member mapping as every dedup path (text never keys
# a shuffle); the final aggregation is per-source counts.
# --------------------------------------------------------------------------
@query(
    "exact_dup_rate_by_source",
    oracle="""
    WITH m AS (
      SELECT doc_id, source,
             MIN(doc_id) OVER (PARTITION BY text) AS rep
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) FILTER (doc_id <> rep) AS BIGINT) AS n_dup_members,
           floor(COUNT(*) FILTER (doc_id <> rep) * 1.0 / COUNT(*)
                 * 10000 + 0.5) / 10000 AS dup_rate
    FROM m GROUP BY source
    """,
)
def exact_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    members = exact_dup_members(docs)
    joined = members.join(docs.select("doc_id", "source"), "doc_id")
    is_dup = (F.col("doc_id") != F.col("rep")).cast("long")
    return joined.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(is_dup).alias("n_dup_members"),
        (F.floor(F.sum(is_dup) * F.lit(1.0) / F.count("*") * 10000 + F.lit(0.5))
         / 10000).alias("dup_rate"),
    )


# --------------------------------------------------------------------------
# MinHash calibration: for every LSH candidate pair, the signature-agreement
# Jaccard ESTIMATE (matching components / N_PERMUTATIONS — the unbiased
# MinHash estimator) next to the EXACT shingle Jaccard — the query an
# engineer runs to pick band/row settings before a 100 TB dedup pass.
# Candidates come from the banded equi-join on distinct-text
# representatives (never all pairs); the exact side reuses the inverted
# shingle index, output-bound like neardup_jaccard_pairs. A candidate pair
# can share bands yet zero shingles (band-hash collision), hence the LEFT
# join with shared defaulted to 0.
# --------------------------------------------------------------------------
@query(
    "minhash_jaccard_estimate",
    oracle=f"""
    WITH r AS (SELECT MIN(doc_id) AS doc_id, text FROM documents GROUP BY text),
    t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM r),
    sh AS (SELECT doc_id, unnest({_SQL_SHINGLES}) AS s FROM t WHERE len(toks) >= 3),
    ph AS (SELECT doc_id, {phash60_sql("s")} % {MINHASH_PRIME} AS ph FROM sh),
    mh AS (
      SELECT doc_id, i,
             MIN(({_SQL_A_LIST}[i + 1] * ph + {_SQL_B_LIST}[i + 1])
                 % {MINHASH_PRIME}) AS h
      FROM ph CROSS JOIN range({N_PERMUTATIONS}) perm(i)
      GROUP BY doc_id, i
    ),
    sig AS (SELECT doc_id, list(h ORDER BY i) AS sg FROM mh GROUP BY doc_id),
    sigs AS (SELECT doc_id, list(h::VARCHAR ORDER BY i) AS sg FROM mh GROUP BY doc_id),
    bands AS (
      SELECT doc_id, band_idx,
             {phash60_sql(_SQL_BAND_CONCAT)} AS band_hash
      FROM sigs CROSS JOIN range({N_BANDS}) b(band_idx)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a
      JOIN bands b ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
                  AND a.doc_id < b.doc_id
    ),
    sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    shared AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT c.doc_a, c.doc_b,
           ROUND(len(list_filter(range(1, {N_PERMUTATIONS} + 1),
                                 i -> sa.sg[i] = sb.sg[i]))
                 * 1.0 / {N_PERMUTATIONS}, 4) AS est_jaccard,
           ROUND(COALESCE(s.shared, 0) * 1.0
                 / (za.sz + zb.sz - COALESCE(s.shared, 0)), 4) AS exact_jaccard
    FROM cand c
    JOIN sig sa ON sa.doc_id = c.doc_a
    JOIN sig sb ON sb.doc_id = c.doc_b
    LEFT JOIN shared s ON s.doc_a = c.doc_a AND s.doc_b = c.doc_b
    JOIN sz za ON za.doc_id = c.doc_a
    JOIN sz zb ON zb.doc_id = c.doc_b
    """,
)
def minhash_jaccard_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    n = max(spark.sparkContext.defaultParallelism, 8)
    reps = _rep_texts(docs, n)
    sigs = _minhash_of(reps)
    bands = _lsh_bands(sigs)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    # shingle index on reps; set size rides with each row (shingles3 is
    # already distinct) so no extra per-doc aggregate scan.
    sh = (
        reps.select("doc_id", shingles3(tokens("text")).alias("shs"))
        .filter(F.size("shs") > 0)
        .select("doc_id", F.size("shs").alias("sz"), F.explode("shs").alias("s"))
    )
    sha, shb = sh.alias("sa"), sh.alias("sb")
    shared = (
        sha.join(
            shb,
            (F.col("sa.s") == F.col("sb.s"))
            & (F.col("sa.doc_id") < F.col("sb.doc_id")),
        )
        .groupBy(
            F.col("sa.doc_id").alias("doc_a"),
            F.col("sb.doc_id").alias("doc_b"),
        )
        .agg(
            F.count("*").alias("shared"),
            F.first(F.col("sa.sz")).alias("sz_a"),
            F.first(F.col("sb.sz")).alias("sz_b"),
        )
    )
    sz = sh.groupBy("doc_id").agg(F.first("sz").alias("sz"))
    est_matches = F.size(
        F.filter(
            F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
            lambda eq: eq,
        )
    )
    out = (
        cand.join(
            sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a")),
            "doc_a",
        )
        .join(
            sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b")),
            "doc_b",
        )
        .join(shared.select("doc_a", "doc_b", "shared"), ["doc_a", "doc_b"], "left")
        .join(sz.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a")), "doc_a")
        .join(sz.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b")), "doc_b")
    )
    shared0 = F.coalesce(F.col("shared"), F.lit(0))
    return out.select(
        "doc_a",
        "doc_b",
        F.round(est_matches * F.lit(1.0) / N_PERMUTATIONS, 4).alias("est_jaccard"),
        F.round(
            shared0 * F.lit(1.0) / (F.col("sz_a") + F.col("sz_b") - shared0), 4
        ).alias("exact_jaccard"),
    )


INGEST_NEARDUP_MOD = 10  # doc_id % 10 == 0 is the incoming batch


# --------------------------------------------------------------------------
# INCREMENTAL near-dup: the production shape of LSH dedup — a small
# incoming batch probed against the standing index, NOT an all-corpus
# self-join. Every doc_id % 10 == 0 plays the "new batch"; the rest play
# the index (whose band table would be precomputed and stored in a real
# pipeline — here both sides derive from one scan, but the JOIN is the
# asymmetric probe: batch bands equi-join index bands, so the work is
# |batch| x band-collision fan-out, independent of index self-pair count.
# Daily-batch-vs-index is how 100 TB dedup actually runs: the index never
# re-pairs against itself.
# --------------------------------------------------------------------------
@query(
    "incremental_neardup_ingest",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
    sh AS (SELECT doc_id, unnest({_SQL_SHINGLES}) AS s FROM t WHERE len(toks) >= 3),
    ph AS (SELECT doc_id, {phash60_sql("s")} % {MINHASH_PRIME} AS ph FROM sh),
    mh AS (
      SELECT doc_id, i,
             MIN(({_SQL_A_LIST}[i + 1] * ph + {_SQL_B_LIST}[i + 1])
                 % {MINHASH_PRIME}) AS h
      FROM ph CROSS JOIN range({N_PERMUTATIONS}) r(i)
      GROUP BY doc_id, i
    ),
    sig AS (SELECT doc_id, list(h::VARCHAR ORDER BY i) AS sg FROM mh GROUP BY doc_id),
    bands AS (
      SELECT doc_id, band_idx,
             {phash60_sql(_SQL_BAND_CONCAT)} AS band_hash
      FROM sig CROSS JOIN range({N_BANDS}) b(band_idx)
    )
    SELECT n.doc_id AS batch_doc, x.doc_id AS index_doc,
           COUNT(*) AS n_bands
    FROM bands n
    JOIN bands x
      ON n.band_idx = x.band_idx AND n.band_hash = x.band_hash
    WHERE n.doc_id % {INGEST_NEARDUP_MOD} = 0
      AND x.doc_id % {INGEST_NEARDUP_MOD} <> 0
    GROUP BY 1, 2
    """,
)
def incremental_neardup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    n = max(spark.sparkContext.defaultParallelism, 8)
    # No exact-dup collapse here: the batch/index split is keyed on the
    # ORIGINAL doc_id, and collapsing would merge batch docs into index
    # representatives across the split boundary.
    bands = _lsh_bands(
        _minhash_of(docs.select("doc_id", "text").repartition(n, "doc_id"))
    )
    batch = bands.filter(F.col("doc_id") % INGEST_NEARDUP_MOD == 0).select(
        F.col("doc_id").alias("batch_doc"), "band_idx", "band_hash"
    )
    index = bands.filter(F.col("doc_id") % INGEST_NEARDUP_MOD != 0).select(
        F.col("doc_id").alias("index_doc"), "band_idx", "band_hash"
    )
    return (
        batch.join(index, ["band_idx", "band_hash"])
        .groupBy("batch_doc", "index_doc")
        .agg(F.count("*").alias("n_bands"))
    )


# --------------------------------------------------------------------------
# Segment-level exact dedup with ORDER-PRESERVING reassembly — the CCNet /
# RefinedWeb "duplicated paragraph removal" stage (Wenzek et al. 2020 run
# it per paragraph; Penedo et al. 2023 per line), at a finer granularity
# than dedup_exact (whole documents) and a coarser one than
# strip_boilerplate_tokens (single tokens): the corpus keeps exactly ONE
# copy of every repeated span, the first occurrence in (doc_id, position)
# order, and every document is rebuilt from its surviving segments.
#
# Segmentation: non-overlapping 8-token chunks via ONE linear regex pass
# (SEGDEDUP_RX matches a token plus up to 7 ' '-separated followers — the
# same single-space token convention as tokens()/_SQL_TOKS, identical in
# Java regex and RE2 so the oracle chunks bit-identically). A
# transform-over-sequence build was rejected for the same reason
# shingles3 documents: a lambda that captures the token array re-evaluates
# the tokenization per element after projection collapse — O(n^2/W) per
# document; the regex pass is O(n).
#
# Scale shape (the whole point): raw text never crosses a shuffle.
#   1. segment rows shuffle ONCE keyed by the 128-bit segment digest;
#      partial aggregation (min / min_by) means each map task forwards at
#      most one survivor text per distinct segment — the _digest_groups
#      argument, applied at segment grain;
#   2. winners ARE the kept rows (each distinct segment keeps exactly its
#      lexicographically-first (doc_id, seg_idx) occurrence) — no join
#      back against the corpus;
#   3. reassembly groups the SURVIVING segments by doc_id (second, strictly
#      smaller shuffle; per-doc collect is bounded by segments-per-doc),
#      then left-joins the id-keyed per-doc segment counts — dropped-empty
#      documents surface as n_kept = 0 / md5('') instead of vanishing.
#
# Fixture note: the shipped corpora contain no organic cross-document
# 8-token repeats (random word soup), so — like incremental_neardup_ingest's
# re-crawl copies — the working set deterministically injects boilerplate
# variants: every doc_id % 4 == 1 document reappears at +40M with an
# 8-token footer PREPENDED. The footer aligns to segment 0, so each
# variant's remaining segments exactly equal its original's; originals
# (smaller ids) win everything, the minimum-id variant keeps only the
# footer, every other variant keeps nothing — all three branches
# (full-keep / partial / zero-keep, incl. the left-join empty-doc path)
# fire at every SF on both engines.
# --------------------------------------------------------------------------
SEGDEDUP_W = 8  # tokens per segment
SEGDEDUP_RX = "[^ ]+( +[^ ]+){0,7}"  # one segment: a token + up to 7 more
# (` +` not ` `: a segment absorbs runs of spaces, so chunking is by token
# WINDOW — ceil(n_tokens/8) segments — regardless of spacing; the segment
# string keeps the original bytes, identically in Java regex and RE2.)
SEGDEDUP_FOOTER = "subscribe newsletter follow social feed cookie policy banner"
SEGDEDUP_VARIANT_OFFSET = 40_000_000
SEGDEDUP_VARIANT_MOD = 4  # doc_id % 4 == 1 docs get a footered variant


def _segdedup_working(docs: DataFrame) -> DataFrame:
    """documents plus the deterministic footer-prepended variants."""
    base = docs.select("doc_id", "text")
    variants = docs.filter(
        F.col("doc_id") % SEGDEDUP_VARIANT_MOD == 1
    ).select(
        (F.col("doc_id") + SEGDEDUP_VARIANT_OFFSET).alias("doc_id"),
        F.concat(F.lit(SEGDEDUP_FOOTER + " "), F.col("text")).alias("text"),
    )
    return base.unionByName(variants)


@query(
    "segment_dedup_reassemble",
    headline=True,  # the corpus-rewriting dedup stage: bench the full pass
    oracle=f"""
    WITH working AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + {SEGDEDUP_VARIANT_OFFSET},
             '{SEGDEDUP_FOOTER} ' || text
      FROM documents WHERE doc_id % {SEGDEDUP_VARIANT_MOD} = 1
    ), segged AS (
      SELECT doc_id, regexp_extract_all(text, '{SEGDEDUP_RX}') AS segs
      FROM working
    ), seg_rows AS (
      SELECT doc_id,
             CAST(generate_subscripts(segs, 1) AS BIGINT) AS seg_idx,
             unnest(segs) AS seg
      FROM segged
    ), kept AS (
      SELECT doc_id, seg_idx, seg FROM (
        SELECT doc_id, seg_idx, seg,
               ROW_NUMBER() OVER (PARTITION BY seg
                                  ORDER BY doc_id, seg_idx) AS rn
        FROM seg_rows)
      WHERE rn = 1
    ), rebuilt AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
             md5(string_agg(seg, ' ' ORDER BY seg_idx)) AS clean_md5
      FROM kept GROUP BY doc_id
    )
    SELECT s.doc_id,
           CAST(len(s.segs) AS BIGINT) AS n_segs,
           COALESCE(r.n_kept, CAST(0 AS BIGINT)) AS n_kept,
           COALESCE(r.clean_md5, md5('')) AS clean_md5
    FROM segged s LEFT JOIN rebuilt r USING (doc_id)
    """,
)
def segment_dedup_reassemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    with_segs = _segdedup_working(docs).select(
        "doc_id",
        F.regexp_extract_all("text", F.lit(SEGDEDUP_RX), 0).alias("segs"),
    )
    base = with_segs.select(
        "doc_id", F.size("segs").cast("long").alias("n_segs")
    )
    seg_rows = with_segs.select(
        "doc_id", F.posexplode("segs").alias("seg_idx", "seg")
    )
    first_pos = F.struct("doc_id", "seg_idx")
    kept = (
        seg_rows.groupBy(
            F.md5("seg").alias("_k"), F.length("seg").alias("_l")
        )
        .agg(
            F.min(first_pos).alias("w"),
            F.min_by("seg", first_pos).alias("seg"),
        )
        .select(
            F.col("w.doc_id").alias("doc_id"),
            F.col("w.seg_idx").alias("seg_idx"),
            "seg",
        )
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_kept"),
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seg_idx", "seg"))),
                    lambda s: s.getField("seg"),
                ),
            )
        ).alias("clean_md5"),
    )
    return base.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        "n_segs",
        F.coalesce("n_kept", F.lit(0).cast("long")).alias("n_kept"),
        F.coalesce("clean_md5", F.md5(F.lit(""))).alias("clean_md5"),
    )


# --------------------------------------------------------------------------
# Cross-source contamination matrix (round 7) — the corpus-PROVENANCE
# analytic every multi-source training mix needs before weighting sources:
# how much 3-shingle content does each source pair share (CommonCrawl-vs-C4
# style overlap measurement)? Output is the COMPLETE source-pair grid
# (|S|*(|S|-1)/2 rows, zeros included via the broadcast pair universe), so
# a no-overlap corpus still value-checks every pair.
#
# Scale posture: the (source, shingle) DISTINCT collapses each source's
# repeated shingles before the inverted self-join, so a shingle shared by
# k sources fans out to k*(k-1)/2 pair rows — bounded by |S|^2 per shingle
# REGARDLESS of how many documents contain it (the same boilerplate hazard
# neardup_jaccard_pairs needs a frequency CAP for is structurally absent
# here: the join key set per shingle is sources, not documents). The pair
# universe and per-source totals are |S|-sized broadcasts.
# --------------------------------------------------------------------------
@query(
    "source_overlap_matrix",
    oracle=f"""
    WITH t AS (SELECT source, {_SQL_TOKS} AS toks FROM documents),
    sh AS (SELECT DISTINCT source, unnest({_SQL_SHINGLES}) AS s
           FROM t WHERE len(toks) >= 3),
    per AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY source),
    shared AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT pa.source AS source_a, pb.source AS source_b,
           COALESCE(sh2.n_shared, 0) AS n_shared,
           pa.n AS n_a, pb.n AS n_b,
           ROUND(COALESCE(sh2.n_shared, 0) * 1.0 / LEAST(pa.n, pb.n), 4)
             AS containment
    FROM per pa JOIN per pb ON pa.source < pb.source
    LEFT JOIN shared sh2
      ON sh2.source_a = pa.source AND sh2.source_b = pb.source
    """,
)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source_a, source_b, n_shared, n_a, n_b, containment) for every
    source pair; containment = shared distinct shingles over the smaller
    side's distinct-shingle count."""
    register_views(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    sh = (
        docs.select(
            "source", F.explode(shingles3(tokens("text"))).alias("s")
        ).distinct()
    )
    per = sh.groupBy("source").agg(F.count("*").alias("n"))
    a = sh.select(F.col("source").alias("source_a"), "s")
    b = sh.select(F.col("source").alias("source_b"), "s")
    shared = (
        a.join(b, "s")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_shared"))
    )
    pa = per.select(F.col("source").alias("source_a"), F.col("n").alias("n_a"))
    pb = per.select(F.col("source").alias("source_b"), F.col("n").alias("n_b"))
    universe = F.broadcast(pa).join(
        F.broadcast(pb), F.col("source_a") < F.col("source_b")
    )
    return universe.join(shared, ["source_a", "source_b"], "left").select(
        "source_a",
        "source_b",
        F.coalesce("n_shared", F.lit(0).cast("long")).alias("n_shared"),
        "n_a",
        "n_b",
        F.round(
            F.coalesce("n_shared", F.lit(0).cast("long"))
            / F.least("n_a", "n_b"),
            4,
        ).alias("containment"),
    )


# --------------------------------------------------------------------------
# Exact-substring duplication at the LONG-REPEAT grain (round 8) — the
# Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
# Better") measurement the other dedup grains miss: dedup_exact catches
# whole-document copies, segment_dedup_reassemble removes repeated
# 8-token-aligned chunks, MinHash/SimHash score whole-doc similarity —
# none of them MEASURES the longest exact token run shared by two
# documents, the memorization-risk metric (Lee et al. flag >= 50-token
# verbatim overlaps; suffix arrays find them single-node). The
# distributed re-expression: a repeated run of R >= W tokens appears as
# exactly R - W + 1 OVERLAPPING W-token shingles whose positions align
# on one diagonal (pos_a - pos_b constant), so maximal runs are
# gaps-and-islands over aligned shingle matches — entirely relational:
#   1. one linear pass emits (doc_id, pos, digest) for every overlapping
#      W-shingle — digests (16-byte md5), never shingle text, cross the
#      one corpus-scale shuffle;
#   2. digest groups ABOVE the occurrence cap are dropped whole
#      (SUBSTR_MAX_OCC, the Lee et al. high-frequency n-gram filter —
#      boilerplate shared by thousands of docs would otherwise fan out
#      quadratically; the drop under-counts only ubiquitous spans, and
#      the cap is a visible constant, not a silent truncation). The cap
#      is enforced by a partial-aggregable COUNT + semi filter BEFORE
#      any per-digest list exists, so a mega-frequency shingle costs one
#      combiner counter, never a materialized occurrence array;
#   3. within a surviving group (<= CAP occurrences, guaranteed by the
#      filter upstream) pairs are generated by a bounded double-explode;
#   4. islands: per (doc_a, doc_b, diagonal), consecutive pos_a values
#      are one run (pos_a - row_number() is the classic island key);
#      run of n shingles = n + W - 1 exactly overlapping tokens.
# Window partitions are per-(pair, diagonal) — bounded by the cap — so
# no task ever sorts a corpus-scale frame.
#
# Fixture: (the segdedup convention) the working set injects
# deterministic variants — every doc_id % 5 == 2 document with >= 24
# tokens reappears at +55,000,001 (NOT a multiple of the scale probe's
# 10M replica id stride, so probe-replica ids can never collide with
# variant ids) wrapped in id-unique junk around a VERBATIM
# SLICE of its tokens (start 4, length 13 + doc_id % 7) — so every SF
# carries (original, variant) pairs whose exact span the oracle
# replays token-for-token. (The exact-span pin additionally needs no
# 8-gram inside a planted slice to exceed the occurrence cap corpus-
# wide and the slice to match its source on a single diagonal — true of
# every shipped corpus, asserted by the unit test as the canary, and a
# fixture-tuning knob rather than a code bug if a future corpus ever
# violates it.) The corpus then contributes ORGANIC runs on
# top (measured at sf0.001: spans 10 and 22..95 tokens — the long ones
# are the whole/near-document copies dedup_exact also sees), so the
# query detects both planted and natural duplication and every branch
# is value-checked at every SF.
# --------------------------------------------------------------------------
SUBSTR_W = 8  # tokens per shingle = minimum reportable run
SUBSTR_MAX_OCC = 8  # drop digests occurring more often (freq filter)
SUBSTR_VARIANT_MOD = 5
SUBSTR_VARIANT_OFFSET = 55_000_001  # coprime-ish to the probe ID_STRIDE
SUBSTR_SLICE_START = 4  # 1-based token index where the copied slice begins
SUBSTR_SLICE_BASE = 13  # copied-run length = BASE + doc_id % 7 (13..19)
SUBSTR_MIN_TOKENS = 24  # variant eligibility: slice must fit

# WITHIN-DOC leg (round 10) — Lee et al. 2022 also cut spans a document
# repeats INSIDE ITSELF (template spam, boilerplate farms); the round-9
# pair universe was cross-doc only (doc_a < doc_b), so self-repeats were
# invisible to detection and removal alike. The self leg adds same-doc
# shingle pairs at pa < pb: diag = pa - pb < 0, so the standard cut
# interval [pa0 - diag, ...] lands on the LATER occurrence and keep-first
# needs no new interval arithmetic (tandem period-W repeats collapse to
# one copy; period < W repeats exceed the occurrence cap and are dropped
# whole, the same visible-cap posture as cross-doc boilerplate).
# Fixture: every doc_id % 5 == 3 document contributes a variant at
# +66,000,001 whose text repeats an ID-UNIQUE synthetic span twice
# ('wa{id}' s.. 'wb{id}' s.. 'wc{id}', span tokens r{id}x{i}, length
# 13 + id % 7) — the span exists nowhere else in the corpus, so the
# self leg is the BINDING detection AND cut for these docs at every SF
# (the +55M cross-doc variants can't shadow it). Offsets can't collide:
# base + 66,000,001 = base' + 55,000,001 (+ any probe 10M stride
# multiple) needs |base - base'| >= 1,000,000, far above any shipped or
# replicated base id.
SUBSTR_SELF_RESIDUE = 3  # doc_id % SUBSTR_VARIANT_MOD for the self fixture
SUBSTR_SELF_OFFSET = 66_000_001


def _substr_shingle_digests(toks: Column) -> Column:
    """array<string> of md5 digests of every overlapping SUBSTR_W-token
    shingle, slice+zip_with cascade (the shingles3 O(n) discipline —
    never indexed access inside a transform lambda)."""
    n = F.size(toks)
    cnt = F.greatest(n - (SUBSTR_W - 1), F.lit(0))
    acc = F.slice(toks, 1, cnt)
    for i in range(1, SUBSTR_W):
        acc = F.zip_with(
            acc,
            F.slice(toks, i + 1, cnt),
            lambda x, y: F.concat_ws(" ", x, y),
        )
    return F.transform(acc, lambda s: F.md5(s))


# Shared CTE chain (working set -> shingle digests -> capped groups ->
# aligned pairs -> islands -> run-level rows) used by BOTH substring
# oracles below, so the pair report and the per-doc summary replay
# identical detection semantics.
_SQL_SUBSTR_RUNS_CTES = f"""\
working AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + {SUBSTR_VARIANT_OFFSET},
             'ja' || doc_id || ' jb' || doc_id || ' ' ||
             array_to_string(
               toks[{SUBSTR_SLICE_START} :
                    {SUBSTR_SLICE_START + SUBSTR_SLICE_BASE - 1}
                      + doc_id % 7], ' ')
             || ' jc' || doc_id
      FROM (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents)
      WHERE doc_id % {SUBSTR_VARIANT_MOD} = 2
        AND len(toks) >= {SUBSTR_MIN_TOKENS}
      UNION ALL
      SELECT doc_id + {SUBSTR_SELF_OFFSET},
             'wa' || doc_id || ' ' || span || ' wb' || doc_id || ' '
               || span || ' wc' || doc_id
      FROM (
        SELECT doc_id,
               array_to_string(
                 list_transform(
                   range(1, {SUBSTR_SLICE_BASE} + doc_id % 7 + 1),
                   i -> 'r' || doc_id || 'x' || i), ' ') AS span
        FROM documents
        WHERE doc_id % {SUBSTR_VARIANT_MOD} = {SUBSTR_SELF_RESIDUE}
      )
    ), sh AS (
      SELECT doc_id,
             CAST(generate_subscripts(digs, 1) AS BIGINT) AS pos,
             unnest(digs) AS dig
      FROM (
        SELECT doc_id,
               list_transform(
                 range(1, len(toks) - {SUBSTR_W - 2}),
                 i -> md5(array_to_string(
                        toks[i : i + {SUBSTR_W - 1}], ' '))) AS digs
        FROM (SELECT doc_id, {_SQL_TOKS} AS toks FROM working)
      )
    ), ok AS (
      SELECT dig FROM sh GROUP BY dig
      HAVING COUNT(*) BETWEEN 2 AND {SUBSTR_MAX_OCC}
    ), p AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.pos AS pa, a.pos - b.pos AS diag
      FROM sh a JOIN sh b USING (dig) JOIN ok USING (dig)
      WHERE a.doc_id < b.doc_id
         OR (a.doc_id = b.doc_id AND a.pos < b.pos)
    ), isl AS (
      SELECT doc_a, doc_b, diag, pa,
             pa - ROW_NUMBER() OVER (PARTITION BY doc_a, doc_b, diag
                                     ORDER BY pa) AS k
      FROM p
    ), runs AS (
      SELECT doc_a, doc_b, diag,
             CAST(MIN(pa) AS BIGINT) AS pa0,
             CAST(COUNT(*) AS BIGINT) AS n_sh
      FROM isl GROUP BY doc_a, doc_b, diag, k
    )
"""


def _substr_working(docs: DataFrame) -> DataFrame:
    """documents plus the sliced-copy variants (the planted cross-doc
    fixture) plus the repeated-span variants (the planted WITHIN-DOC
    fixture — an id-unique span twice in one document)."""
    toks = tokens("text")
    slice_len = (F.lit(SUBSTR_SLICE_BASE) + F.col("doc_id") % 7).cast("int")
    variants = (
        docs.filter(F.col("doc_id") % SUBSTR_VARIANT_MOD == 2)
        .select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= SUBSTR_MIN_TOKENS)
        .select(
            (F.col("doc_id") + SUBSTR_VARIANT_OFFSET).alias("doc_id"),
            F.concat_ws(
                " ",
                F.concat(F.lit("ja"), F.col("doc_id").cast("string")),
                F.concat(F.lit("jb"), F.col("doc_id").cast("string")),
                F.array_join(
                    F.slice(F.col("toks"), SUBSTR_SLICE_START, slice_len),
                    " ",
                ),
                F.concat(F.lit("jc"), F.col("doc_id").cast("string")),
            ).alias("text"),
        )
    )
    span = F.array_join(
        F.transform(
            F.sequence(
                F.lit(1), (F.lit(SUBSTR_SLICE_BASE) + F.col("doc_id") % 7)
            ),
            lambda i: F.concat(
                F.lit("r"),
                F.col("doc_id").cast("string"),
                F.lit("x"),
                i.cast("string"),
            ),
        ),
        " ",
    )
    self_variants = (
        docs.filter(F.col("doc_id") % SUBSTR_VARIANT_MOD == SUBSTR_SELF_RESIDUE)
        .select("doc_id", span.alias("span"))
        .select(
            (F.col("doc_id") + SUBSTR_SELF_OFFSET).alias("doc_id"),
            F.concat_ws(
                " ",
                F.concat(F.lit("wa"), F.col("doc_id").cast("string")),
                F.col("span"),
                F.concat(F.lit("wb"), F.col("doc_id").cast("string")),
                F.col("span"),
                F.concat(F.lit("wc"), F.col("doc_id").cast("string")),
            ).alias("text"),
        )
    )
    return (
        docs.select("doc_id", "text")
        .unionByName(variants)
        .unionByName(self_variants)
    )


def _substr_run_rows(working: DataFrame) -> DataFrame:
    """(doc_a, doc_b, diag, pa0, n_sh) — one row per maximal aligned run
    (the run-level grain all three substring reports derive from): pa0 is
    the run's first shingle position in doc_a, diag = pa - pb, so the
    run covers doc_b tokens [pa0 - diag, pa0 - diag + n_sh + W - 2].
    WITHIN-DOC runs appear as doc_a == doc_b with pa < pb (diag < 0):
    the covered doc_b interval is then the LATER occurrence, so the
    keep-first removal cut needs no special casing."""
    # PERSISTED (bounded ring): the digest stream has two consumers —
    # the frequency census and the join-back — and recomputing it means
    # re-tokenizing and re-hashing the whole corpus per consumer.
    # Measured at sf0.1: exact_substring_runs 3.5s -> 1.1s. At 100 TB
    # this cache is the materialized shingle table the suffix-array
    # pipelines build on disk anyway (Lee et al. 2022), spilling via
    # MEMORY_AND_DISK; recompute remains the safe fallback on eviction.
    sh = bounded_persist(
        working.select(
            "doc_id",
            F.posexplode(_substr_shingle_digests(tokens("text"))).alias(
                "pos0", "dig"
            ),
        ).select(
            "doc_id", (F.col("pos0") + 1).cast("long").alias("pos"), "dig"
        )
    )
    # The frequency cap is applied as a partial-aggregable COUNT + semi
    # filter BEFORE any occurrence list is built: a collect_list-then-
    # filter would materialize a ubiquitous shingle's millions of
    # occurrences on one task before the size test ever ran (exactly the
    # boilerplate case the cap exists for). The count frame that crosses
    # the broadcast/join boundary holds only digests with 2..CAP
    # occurrences, so the join-back ships capped groups alone and the
    # per-digest list below is bounded by CAP rows by construction.
    ok = (
        sh.groupBy("dig")
        .agg(F.count("*").alias("n"))
        .filter((F.col("n") >= 2) & (F.col("n") <= SUBSTR_MAX_OCC))
        .select("dig")
    )
    occ = (
        sh.join(ok, "dig")
        .groupBy("dig")
        .agg(F.collect_list(F.struct("doc_id", "pos")).alias("occs"))
    )
    p = (
        occ.select(F.explode("occs").alias("a"), "occs")
        .select("a", F.explode("occs").alias("b"))
        .filter(
            (F.col("a.doc_id") < F.col("b.doc_id"))
            | (
                (F.col("a.doc_id") == F.col("b.doc_id"))
                & (F.col("a.pos") < F.col("b.pos"))
            )
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.pos").alias("pa"),
            (F.col("a.pos") - F.col("b.pos")).alias("diag"),
        )
    )
    wisl = W.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
    return (
        p.withColumn("k", F.col("pa") - F.row_number().over(wisl))
        .groupBy("doc_a", "doc_b", "diag", "k")
        .agg(
            F.min("pa").cast("long").alias("pa0"),
            F.count("*").cast("long").alias("n_sh"),
        )
        .select("doc_a", "doc_b", "diag", "pa0", "n_sh")
    )


@query(
    "exact_substring_runs",
    headline=True,  # the long-repeat dedup ship plan: bench the full pass
    oracle=f"""
    WITH {_SQL_SUBSTR_RUNS_CTES}
    SELECT doc_a, doc_b,
           CAST(COUNT(*) AS BIGINT) AS n_runs,
           CAST(MAX(n_sh) + {SUBSTR_W - 1} AS BIGINT) AS max_run_tokens
    FROM runs GROUP BY doc_a, doc_b
    """,
)
def exact_substring_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_a, doc_b, n_runs, max_run_tokens) for every document pair
    sharing at least one exact >= {SUBSTR_W}-token run: the number of
    maximal verbatim runs and the longest one's exact token length.
    Within-doc repeats surface as doc_a == doc_b rows (round 10)."""
    register_views(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    runs = _substr_run_rows(_substr_working(docs))
    return runs.groupBy("doc_a", "doc_b").agg(
        F.count("*").cast("long").alias("n_runs"),
        (F.max("n_sh") + F.lit(SUBSTR_W - 1)).cast("long").alias(
            "max_run_tokens"
        ),
    )


# Per-document summary — the grain Lee et al. actually report: for every
# document in the working set, the longest token run it shares VERBATIM
# with any other document (0 when none survives the frequency cap) and
# whether it carries one at all. Same run-level frame as the pair report
# (identical CTE replay in the oracle); the per-doc fold is a union of
# the two pair sides plus a left join against the id universe so
# zero-overlap documents surface instead of vanishing — the
# memorization-risk histogram input at corpus scale.
@query(
    "longest_dup_span_per_doc",
    oracle=f"""
    WITH {{ctes}}, per AS (
      SELECT doc_id, MAX(n_sh) AS m FROM (
        SELECT doc_a AS doc_id, n_sh FROM runs
        UNION ALL
        SELECT doc_b AS doc_id, n_sh FROM runs
      ) GROUP BY doc_id
    )
    SELECT w.doc_id,
           CAST(COALESCE(per.m + {SUBSTR_W - 1}, 0) AS BIGINT)
             AS longest_shared_tokens,
           per.m IS NOT NULL AS has_shared_run
    FROM (SELECT doc_id FROM working) w
    LEFT JOIN per USING (doc_id)
    """.format(ctes=_SQL_SUBSTR_RUNS_CTES),
)
def longest_dup_span_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, longest_shared_tokens, has_shared_run) for EVERY working-
    set document: the per-doc longest verbatim run shared with ANOTHER
    document or repeated WITHIN the document itself (round 10)."""
    register_views(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    working = _substr_working(docs)
    runs = _substr_run_rows(working)
    per = (
        runs.select(F.col("doc_a").alias("doc_id"), "n_sh")
        .unionByName(runs.select(F.col("doc_b").alias("doc_id"), "n_sh"))
        .groupBy("doc_id")
        .agg(F.max("n_sh").alias("m"))
    )
    return working.select("doc_id").join(per, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("m") + F.lit(SUBSTR_W - 1), F.lit(0))
        .cast("long")
        .alias("longest_shared_tokens"),
        F.col("m").isNotNull().alias("has_shared_run"),
    )


# --------------------------------------------------------------------------
# Substring-run REMOVAL (round 9) — the missing composition the round-8
# verdict named: exact_substring_runs DETECTS >= SUBSTR_W-token verbatim
# runs and longest_dup_span_per_doc REPORTS them, but Lee et al. 2022's
# pipeline REMOVES the duplicated spans (keep the first occurrence) and
# rebuilds the corpus. Policy, identical on both engines: for every
# detected maximal run between doc_a < doc_b, doc_a (the first occurrence
# in id order) keeps its copy and the covered token interval
# [pa0 - diag, pa0 - diag + n_sh + W - 2] is cut from doc_b; a WITHIN-DOC
# run (doc_a == doc_b, diag < 0, round 10) cuts the LATER occurrence via
# the exact same interval formula — keep-first becomes keep-earliest
# inside one document with zero new arithmetic; a document's
# removed set is the UNION of its incident intervals (evaluated as a
# token-level membership test, so overlapping intervals need no interval
# algebra), and the survivors reassemble in original order — the
# segment_dedup_reassemble contract at variable-length run grain.
#
# Scale posture: detection is the shipped exact_substring_runs plan (one
# digest-keyed shuffle, cap-before-collect); the cut adds ONE token-grain
# pass — tokens join removal intervals on doc_id (a doc's interval count
# is bounded by its incident runs, cap-bounded per digest), and the
# per-doc reassembly collect is bounded by document length, exactly like
# segment reassembly. Raw text still never crosses a corpus shuffle: the
# rebuilt text exists only inside its own doc's aggregate and leaves the
# query as an md5.
#
# Branch coverage at every SF (value-checked, same fixture as detection):
# planted +55M variants lose exactly their copied slice (PARTIAL cut,
# junk prefix/suffix survive); exact-duplicate corpus docs (>= W tokens,
# <= SUBSTR_MAX_OCC copies) are covered end-to-end by their run with the
# min-id copy and cut to EMPTY (n_kept = 0, md5('') via the left-join
# path); the untouched majority rebuilds verbatim (ZERO cut).
# --------------------------------------------------------------------------
def _substr_removal_kept(working: DataFrame) -> DataFrame:
    """(doc_id, q, tok) — the tokens SURVIVING the keep-first cut of
    every detected run: detection spans become removal intervals on the
    later-id doc, and a token-grain anti-join drops the interval union.
    Shared by the registered query and the idempotence test so the
    interval arithmetic cannot drift between them."""
    spans = _substr_run_rows(working)
    iv = spans.select(
        F.col("doc_b").alias("doc_id"),
        (F.col("pa0") - F.col("diag")).alias("s"),
        (
            F.col("pa0") - F.col("diag") + F.col("n_sh") + F.lit(SUBSTR_W - 2)
        ).alias("e"),
    )
    tk = working.select(
        "doc_id", F.posexplode(tokens("text")).alias("q0", "tok")
    ).select("doc_id", (F.col("q0") + 1).cast("long").alias("q"), "tok")
    return tk.join(
        iv,
        (tk["doc_id"] == iv["doc_id"])
        & (tk["q"] >= iv["s"])
        & (tk["q"] <= iv["e"]),
        "left_anti",
    )


@query(
    "substring_run_removal",
    headline=True,  # the corpus-rewriting long-repeat stage: bench it
    oracle=f"""
    WITH {_SQL_SUBSTR_RUNS_CTES},
    iv AS (
      SELECT doc_b AS doc_id, pa0 - diag AS s,
             pa0 - diag + n_sh + {SUBSTR_W - 2} AS e
      FROM runs
    ),
    tk AS (
      SELECT doc_id, CAST(generate_subscripts(toks, 1) AS BIGINT) AS q,
             unnest(toks) AS tok
      FROM (SELECT doc_id, {_SQL_TOKS} AS toks FROM working)
    ),
    keepq AS (
      SELECT t.doc_id, t.q, t.tok
      FROM tk t
      WHERE NOT EXISTS (
        SELECT 1 FROM iv
        WHERE iv.doc_id = t.doc_id AND t.q BETWEEN iv.s AND iv.e
      )
    ),
    reb AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
             md5(string_agg(tok, ' ' ORDER BY q)) AS clean_md5
      FROM keepq GROUP BY doc_id
    ),
    base AS (
      SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens
      FROM (SELECT doc_id, {_SQL_TOKS} AS toks FROM working)
    )
    SELECT b.doc_id, b.n_tokens,
           COALESCE(r.n_kept, CAST(0 AS BIGINT)) AS n_kept,
           COALESCE(r.clean_md5, md5('')) AS clean_md5
    FROM base b LEFT JOIN reb r USING (doc_id)
    """,
)
def substring_run_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens, n_kept, clean_md5) for every working-set doc
    after cutting all detected >= SUBSTR_W-token duplicated runs (first
    occurrence kept) and reassembling the survivors in order."""
    register_views(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    # Round-14 NEGATIVE result (probes/ab_bigram_substr_cut.py): cutting
    # working (doc_id + raw text, three consumers) measured SLOWER at
    # sf0.1 — 2.41s lazy vs 3.70s cut, interleaved min-of-6, equality
    # asserted. The three re-derivations are cheap fused parquet scans;
    # the expensive shared piece (the shingle-digest stream) is already
    # persisted inside _substr_run_rows. Left lazy on purpose.
    working = _substr_working(docs)
    kept = _substr_removal_kept(working)
    reb = kept.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_kept"),
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("q", "tok"))),
                    lambda s: s.getField("tok"),
                ),
            )
        ).alias("clean_md5"),
    )
    base = working.select(
        "doc_id", F.size(tokens("text")).cast("long").alias("n_tokens")
    )
    return base.join(reb, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce("n_kept", F.lit(0).cast("long")).alias("n_kept"),
        F.coalesce("clean_md5", F.md5(F.lit(""))).alias("clean_md5"),
    )


# --------------------------------------------------------------------------
# SimHash angle fidelity (round 8) — the measured-quality exhibit for the
# SimHash family, closing the symmetry with the ANN recall matrix and
# minhash_jaccard_estimate: simhash_neardup_pairs SHIPS the banded index,
# but nothing measured how faithfully 60-bit signatures track the true
# vector angle on this corpus. Goemans-Williamson: P[bit differs] =
# theta/pi, so expected Hamming distance is linear in the angle between
# the documents' (word -> tf) vectors. This query commits the empirical
# curve: per Hamming-distance bucket, the mean EXACT tf-cosine of the
# pairs landing there (dot and squared norms are integer sums — the only
# float ops are one IEEE sqrt, a divide, and the 6dp/4dp rounding ladder
# used by every cosine in the engine, so both engines agree bit-for-bit
# at the hash).
#
# Evaluation universe: ALL pairs of the doc_id < SIMF_MAX_ID slice —
# deliberately quadratic-bounded (the emb_neardup_pairs / knn convention
# for quality-measurement queries: the eval set is fixed-size however big
# the corpus grows; the SHIP plan for finding near-dups stays the banded
# index). Disjoint-vocabulary pairs appear with cosine 0 via the
# left-joined dot, so every bucket's mean is over its full population.
# --------------------------------------------------------------------------
SIMF_MAX_ID = 150  # bounded eval slice
SIMF_BUCKET = 6  # Hamming bucket width: 10 buckets over 0..60 bits


@query(
    "simhash_angle_fidelity",
    oracle=f"""
    WITH {_SQL_SIMHASH_SIG},
    bs AS (SELECT doc_id, simhash FROM sig WHERE doc_id < {SIMF_MAX_ID}),
    btf AS (SELECT doc_id, word, tf FROM tf WHERE doc_id < {SIMF_MAX_ID}),
    n2 AS (SELECT doc_id, SUM(tf * tf) AS n2 FROM btf GROUP BY doc_id),
    dots AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             SUM(a.tf * b.tf) AS dot
      FROM btf a JOIN btf b ON a.word = b.word AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
             bit_count(xor(x.simhash, y.simhash))::BIGINT AS hamming
      FROM bs x JOIN bs y ON x.doc_id < y.doc_id
    ),
    scored AS (
      SELECT p.hamming // {SIMF_BUCKET} AS hamming_bucket,
             CAST(ROUND(
               ROUND(COALESCE(d.dot, 0) / SQRT(na.n2 * nb.n2), 6) * 1e6
             ) AS BIGINT) AS cos6u
      FROM pairs p
      JOIN n2 na ON na.doc_id = p.doc_a
      JOIN n2 nb ON nb.doc_id = p.doc_b
      LEFT JOIN dots d ON d.doc_a = p.doc_a AND d.doc_b = p.doc_b
    )
    SELECT CAST(hamming_bucket AS BIGINT) AS hamming_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(SUM(cos6u) * 1.0 / (COUNT(*) * 1000000), 4)
             AS mean_exact_cos
    FROM scored GROUP BY 1
    """,
)
def simhash_angle_fidelity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(hamming_bucket, n_pairs, mean_exact_cos) over every pair of the
    bounded eval slice: the committed signature-vs-true-angle curve."""
    register_views(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < SIMF_MAX_ID
    )
    tf = (
        docs.select("doc_id", F.explode(tokens("text")).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("tf"))
    )
    n2 = tf.groupBy("doc_id").agg(
        F.sum(F.col("tf") * F.col("tf")).alias("n2")
    )
    a = tf.select(
        F.col("doc_id").alias("doc_a"), "word", F.col("tf").alias("ta")
    )
    b = tf.select(
        F.col("doc_id").alias("doc_b"), "word", F.col("tf").alias("tb")
    )
    dots = (
        a.join(b, "word")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("ta") * F.col("tb")).alias("dot"))
    )
    sigs = _simhash_of(docs.select("doc_id", "text"))
    x = sigs.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sa")
    )
    y = sigs.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sb")
    )
    pairs = (
        x.join(F.broadcast(y), F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
            .cast("long")
            .alias("hamming"),
        )
    )
    na = n2.select(F.col("doc_id").alias("doc_a"), F.col("n2").alias("na2"))
    nb = n2.select(F.col("doc_id").alias("doc_b"), F.col("n2").alias("nb2"))
    # Integer-sum discipline (every cosine in the engine): each pair's
    # 6dp cosine crosses the aggregate as exact integer micro-units, so
    # the bucket SUM is accumulation-order independent and the ONLY float
    # op either engine performs on the aggregate is one final divide —
    # a 4dp-midpoint bucket mean can no longer flip between engines.
    scored = (
        pairs.join(F.broadcast(na), "doc_a")
        .join(F.broadcast(nb), "doc_b")
        .join(dots, ["doc_a", "doc_b"], "left")
        .select(
            F.expr(f"hamming div {SIMF_BUCKET}").alias("hamming_bucket"),
            F.round(
                F.round(
                    F.coalesce(F.col("dot"), F.lit(0))
                    / F.sqrt(F.col("na2") * F.col("nb2")),
                    6,
                )
                * 1e6
            )
            .cast("long")
            .alias("cos6u"),
        )
    )
    return scored.groupBy("hamming_bucket").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.round(
            F.sum("cos6u") / (F.count("*") * F.lit(1000000)), 4
        ).alias("mean_exact_cos"),
    )


# --------------------------------------------------------------------------
# Sorted-neighborhood blocking (round 10, session 3; Hernandez & Stolfo
# 1995 "merge/purge") — the classic COMPLEMENT to the SymSpell deletion
# index above: instead of generating a per-record key neighborhood, sort
# every record by a key once and compare only records whose global sort
# ranks fall within a fixed window. Cost is exactly N*(W-1) candidate
# pairs per pass — no quadratic regime exists at any skew — but recall is
# structural, not guaranteed: a difference in a HIGH-significance key
# position (the first digit of an id) teleports a record far away in sort
# order, so the window never sees the pair. sorted_neighborhood_recall
# COMMITS that trade-off: the window's measured recall of the exact
# ed-1 pair set (fuzzy_name_pairs) on the same corpus, the number a
# pipeline owner reads before choosing blocking strategies.
#
# Scale shape: the global rank comes from operators/rank.global_row_number
# (range shards + broadcast bases — no single-task global sort); the
# window pairs are an explode(1..W-1) + rank equi-join, NOT a range join;
# the verify is output-sized levenshtein. The oracle replays the rank
# with a plain window (oracle scale is DuckDB's problem) and the same
# BETWEEN window.
# --------------------------------------------------------------------------
SN_WINDOW = 4    # compare records whose sort ranks differ by 1..W-1
SN_MAX_LEV = 2   # verify stage keeps pairs at edit distance <= 2

_SN_PAIRS_SQL = f"""
    WITH snn AS (SELECT DISTINCT s_name FROM supplier),
    snr AS (
      SELECT s_name, ROW_NUMBER() OVER (ORDER BY s_name) AS rnk FROM snn
    )
    SELECT a.s_name AS name_a, b.s_name AS name_b,
           CAST(b.rnk - a.rnk AS BIGINT) AS rank_gap,
           CAST(levenshtein(a.s_name, b.s_name) AS BIGINT) AS lev
    FROM snr a JOIN snr b
      ON b.rnk - a.rnk BETWEEN 1 AND {SN_WINDOW - 1}
    WHERE levenshtein(a.s_name, b.s_name) <= {SN_MAX_LEV}
"""


def _sn_pairs_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from parallel_mapreduce_spark.operators.rank import global_row_number

    register_views(spark, sf_dir)
    names = load_table(spark, sf_dir, "supplier").select("s_name").distinct()
    r = global_row_number(names, [F.asc("s_name")], out="rnk")
    targets = r.select(
        F.col("s_name").alias("name_a"),
        F.explode(
            F.sequence(F.lit(1), F.lit(SN_WINDOW - 1)).cast("array<bigint>")
        ).alias("rank_gap"),
        (F.col("rnk") + F.col("rank_gap")).alias("trnk"),
    )
    pairs = targets.join(
        r.select(F.col("s_name").alias("name_b"), F.col("rnk").alias("trnk")),
        "trnk",
    )
    return pairs.select(
        "name_a",
        "name_b",
        "rank_gap",
        F.levenshtein("name_a", "name_b").cast("long").alias("lev"),
    ).where(F.col("lev") <= SN_MAX_LEV)


@query("sorted_neighborhood_pairs", oracle=_SN_PAIRS_SQL)
def sorted_neighborhood_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(name_a, name_b, rank_gap, lev): candidate pairs whose global
    sort ranks differ by < SN_WINDOW, verified to edit distance <=
    SN_MAX_LEV. name_a < name_b follows from rank order because the sort
    key IS the name."""
    return _sn_pairs_frame(spark, sf_dir)


@query(
    "sorted_neighborhood_recall",
    oracle=f"""
    WITH sn AS ({_SN_PAIRS_SQL}),
    snames AS (SELECT DISTINCT s_name FROM supplier),
    tru AS (
      -- truth grain is NAME pairs by construction (DISTINCT on both
      -- sides), matching fuzzy_name_pairs' distinct-name universe — a
      -- raw supplier self-join would overcount n_true_ed1 whenever the
      -- table carries duplicate names (round-11 advice fix; TPC-H names
      -- happen to be unique, so values are unchanged here).
      SELECT a.s_name AS name_a, b.s_name AS name_b
      FROM snames a JOIN snames b
        ON a.s_name < b.s_name AND levenshtein(a.s_name, b.s_name) = 1
    )
    SELECT CAST({SN_WINDOW} AS BIGINT) AS window_w,
           CAST(COUNT(*) AS BIGINT) AS n_true_ed1,
           CAST(SUM(CASE WHEN sn.name_a IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_caught,
           ROUND(SUM(CASE WHEN sn.name_a IS NOT NULL THEN 1 ELSE 0 END)
                 * 1.0 / COUNT(*), 4) AS recall
    FROM tru
    LEFT JOIN (SELECT name_a, name_b FROM sn WHERE lev = 1) sn
      USING (name_a, name_b)
    """,
)
def sorted_neighborhood_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(window_w, n_true_ed1, n_caught, recall): how much of the EXACT
    ed-1 pair set (the SymSpell index's output) the W-record sorted
    window actually sees — the committed blocking-strategy trade-off."""
    sn = (
        _sn_pairs_frame(spark, sf_dir)
        .where(F.col("lev") == 1)
        .select("name_a", "name_b")
        .withColumn("hit", F.lit(1))
    )
    tru = fuzzy_name_pairs(spark, sf_dir)
    j = tru.join(sn, ["name_a", "name_b"], "left")
    return j.agg(
        F.lit(SN_WINDOW).cast("long").alias("window_w"),
        F.count("*").cast("long").alias("n_true_ed1"),
        F.sum(F.coalesce(F.col("hit"), F.lit(0)))
        .cast("long")
        .alias("n_caught"),
        F.round(
            F.sum(F.coalesce(F.col("hit"), F.lit(0))) * 1.0 / F.count("*"), 4
        ).alias("recall"),
    )


# --------------------------------------------------------------------------
# MULTI-PASS sorted neighborhood (round 11; Hernandez & Stolfo 1995
# §multi-pass) — the canonical fix for the single-pass weakness committed
# above (recall 0.1778 at N=1000): one sort key makes exactly ONE
# character position least-significant, so a window only sees pairs whose
# difference sits at the tail of that key's significance order. Multi-pass
# runs the SAME window over SEVERAL independent sort keys and unions the
# candidate windows; each key repositions which character differences are
# window-visible, and the union's recall is the complement of the product
# of the per-pass miss rates.
#
# Key family: CYCLIC ROTATIONS of the record string (rotate-right by r
# moves the last r characters to the front). Rotation r makes character
# position len-r the least-significant sort position, so rotations
# 0, 1, 2 give three different trailing positions their own pass — the
# right family when differences concentrate in a suffix (id-like keys,
# zero-padded numerics), and a pure string permutation needing no schema
# knowledge, per the paper's requirement that passes use INDEPENDENT
# keys. No pass ever sees pairs at every position; the committed recall
# row prices exactly what three passes buy over one.
#
# Cost is pass-linear, never quadratic: each pass is one hierarchical
# global rank (operators/rank.global_row_number — range shards +
# broadcast bases) plus an explode(1..W-1) rank equi-join, so the total
# candidate set is <= len(SN_MP_ROTS) * N * (W-1) pairs before the
# union's dedup. Verification (levenshtein) runs ONCE per distinct pair
# after the union — the paper's "union then verify" ordering.
# --------------------------------------------------------------------------
SN_MP_ROTS = (0, 1, 2)  # rotate-right amounts, one sorting pass each


def _sn_rot_key_sql(r: int) -> str:
    """Rotate-right-by-r key, same expression text for Spark and DuckDB."""
    if r == 0:
        return "s_name"
    return (
        f"concat(right(s_name, {r}),"
        f" left(s_name, length(s_name) - {r}))"
    )


def _sn_mp_passes_sql() -> str:
    """CTEs snn, mp_u: every (name_a, name_b, pass_id) candidate from the
    rotation passes, pair-normalized (name_a < name_b lexically)."""
    ctes = ["snn AS (SELECT DISTINCT s_name FROM supplier)"]
    legs = []
    for pid, r in enumerate(SN_MP_ROTS):
        ctes.append(
            f"""mp_r{pid} AS (
      SELECT s_name,
             ROW_NUMBER() OVER (ORDER BY {_sn_rot_key_sql(r)}, s_name)
               AS rnk
      FROM snn
    )"""
        )
        legs.append(
            f"""SELECT LEAST(a.s_name, b.s_name) AS name_a,
             GREATEST(a.s_name, b.s_name) AS name_b,
             {pid} AS pass_id
      FROM mp_r{pid} a JOIN mp_r{pid} b
        ON b.rnk - a.rnk BETWEEN 1 AND {SN_WINDOW - 1}"""
        )
    u = "\n      UNION ALL\n      ".join(legs)
    ctes.append(f"mp_u AS (\n      {u}\n    )")
    return ",\n    ".join(ctes)


def _sn_mp_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(name_a, name_b, pass_id): one row per pass that windows the pair,
    pair-normalized. Each pass ranks hierarchically (no global sort)."""
    from parallel_mapreduce_spark.operators.rank import global_row_number

    register_views(spark, sf_dir)
    # NOT persisted despite 3x reuse: the distinct-names plan is
    # byte-identical to fuzzy_name_pairs' subplan, and a lingering cache
    # entry substitutes an InMemoryRelation into THAT query's plan,
    # changing its exchange census (the kcenter/kmeans cross-query
    # cache-pollution lesson). The frame is dimension-sized; recomputing
    # it per pass costs one scan of a tiny table.
    names = load_table(spark, sf_dir, "supplier").select("s_name").distinct()
    legs = []
    for pid, r in enumerate(SN_MP_ROTS):
        keyed = names.withColumn("_key", F.expr(_sn_rot_key_sql(r)))
        rkd = global_row_number(
            keyed, [F.asc("_key"), F.asc("s_name")], out="rnk"
        ).select("s_name", "rnk")
        targets = rkd.select(
            F.col("s_name").alias("n_a"),
            F.explode(
                F.sequence(F.lit(1), F.lit(SN_WINDOW - 1)).cast(
                    "array<bigint>"
                )
            ).alias("gap"),
            F.col("rnk").alias("rnk_a"),
        ).select("n_a", (F.col("rnk_a") + F.col("gap")).alias("trnk"))
        pairs = targets.join(
            rkd.select(
                F.col("s_name").alias("n_b"), F.col("rnk").alias("trnk")
            ),
            "trnk",
        )
        legs.append(
            pairs.select(
                F.least("n_a", "n_b").alias("name_a"),
                F.greatest("n_a", "n_b").alias("name_b"),
                F.lit(pid).alias("pass_id"),
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionAll(leg)
    return out


@query(
    "sorted_neighborhood_multipass_pairs",
    oracle=f"""
    WITH {_sn_mp_passes_sql()}
    SELECT name_a, name_b,
           CAST(levenshtein(name_a, name_b) AS BIGINT) AS lev,
           CAST(COUNT(DISTINCT pass_id) AS BIGINT) AS n_passes
    FROM mp_u
    GROUP BY name_a, name_b
    HAVING levenshtein(name_a, name_b) <= {SN_MAX_LEV}
    """,
)
def sorted_neighborhood_multipass_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(name_a, name_b, lev, n_passes): verified pairs surfaced by ANY of
    the rotation passes, with how many passes windowed each pair —
    n_passes=1 rows are recall the extra keys bought outright."""
    cand = _sn_mp_candidates(spark, sf_dir)
    agg = cand.groupBy("name_a", "name_b").agg(
        F.countDistinct("pass_id").cast("long").alias("n_passes")
    )
    return agg.select(
        "name_a",
        "name_b",
        F.levenshtein("name_a", "name_b").cast("long").alias("lev"),
        "n_passes",
    ).where(F.col("lev") <= SN_MAX_LEV)


@query(
    "sorted_neighborhood_multipass_recall",
    oracle=f"""
    WITH {_sn_mp_passes_sql()},
    mp_cm AS (
      SELECT name_a, name_b,
             MAX(CASE WHEN pass_id = 0 THEN 1 ELSE 0 END) AS hit0
      FROM mp_u GROUP BY name_a, name_b
    ),
    tru AS (
      SELECT a.s_name AS name_a, b.s_name AS name_b
      FROM snn a JOIN snn b
        ON a.s_name < b.s_name AND levenshtein(a.s_name, b.s_name) = 1
    )
    SELECT CAST({SN_WINDOW} AS BIGINT) AS window_w,
           CAST({len(SN_MP_ROTS)} AS BIGINT) AS n_keys,
           CAST(COUNT(*) AS BIGINT) AS n_true_ed1,
           CAST(SUM(CASE WHEN mp_cm.name_a IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_caught,
           ROUND(SUM(CASE WHEN mp_cm.name_a IS NOT NULL THEN 1 ELSE 0 END)
                 * 1.0 / COUNT(*), 4) AS recall,
           CAST(SUM(COALESCE(mp_cm.hit0, 0)) AS BIGINT)
             AS n_caught_single,
           ROUND(SUM(COALESCE(mp_cm.hit0, 0)) * 1.0 / COUNT(*), 4)
             AS recall_single
    FROM tru
    LEFT JOIN mp_cm USING (name_a, name_b)
    """,
)
def sorted_neighborhood_multipass_recall(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(window_w, n_keys, n_true_ed1, n_caught, recall, n_caught_single,
    recall_single): multi-pass window recall of the exact ed-1 pair set,
    committed beside the single-pass (pass 0) number from the same run —
    the uplift the extra sort keys buy is value-checked, not narrated."""
    cand = _sn_mp_candidates(spark, sf_dir)
    cm = cand.groupBy("name_a", "name_b").agg(
        F.max((F.col("pass_id") == 0).cast("int")).alias("hit0")
    )
    tru = fuzzy_name_pairs(spark, sf_dir)
    j = tru.join(cm, ["name_a", "name_b"], "left")
    hit = F.when(F.col("hit0").isNotNull(), 1).otherwise(0)
    return j.agg(
        F.lit(SN_WINDOW).cast("long").alias("window_w"),
        F.lit(len(SN_MP_ROTS)).cast("long").alias("n_keys"),
        F.count("*").cast("long").alias("n_true_ed1"),
        F.sum(hit).cast("long").alias("n_caught"),
        F.round(F.sum(hit) * 1.0 / F.count("*"), 4).alias("recall"),
        F.sum(F.coalesce(F.col("hit0"), F.lit(0)))
        .cast("long")
        .alias("n_caught_single"),
        F.round(
            F.sum(F.coalesce(F.col("hit0"), F.lit(0))) * 1.0 / F.count("*"),
            4,
        ).alias("recall_single"),
    )
