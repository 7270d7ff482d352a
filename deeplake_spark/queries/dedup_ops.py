"""Deduplication operators over the `documents` table — a first-class
training-data-pipeline capability (exact, n-gram Jaccard, MinHash+LSH,
SimHash; embedding near-dup lives in vector_ops.v08).

Scale notes:
  - exact dedup: md5-hash groupBy — one shuffle keyed by digest; at
    100 TB the digest shuffle is tiny relative to the scan.
  - n-gram Jaccard: distinct-shingle explode + shingle-keyed self-join.
    At scale, ultra-common shingles explode the candidate pair count —
    production path caps shingle document-frequency (drop shingles with
    df > cap, standard in MinHash pipelines); the cap is applied
    identically in the oracle so parity is preserved.
  - MinHash+LSH: k=32 permutations via xxhash64(shingle || seed); bands
    of r=4 rows → band-hash bucket join → verify candidates with exact
    Jaccard. Engine-specific hash → no SQL oracle (rows-only check);
    recall vs exact Jaccard asserted in tests/test_dedup.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from deeplake_spark.functions.text import tokenize, word_shingles
from deeplake_spark.io import load_table
from deeplake_spark.queries import query

_DUCK_TOKS = "list_filter(string_split_regex(lower({c}), '\\s+'), t -> t <> '')"
_DUCK_SHINGLES3 = (
    "list_distinct(list_transform(range(1, greatest(len({t}) - 2, 0) + 1), "
    "i -> {t}[i] || ' ' || {t}[i+1] || ' ' || {t}[i+2]))"
)


@query(
    "d01_exact_dup_groups",
    oracle="""
    SELECT md5(lower(text)) AS content_hash,
           COUNT(*) AS n_docs,
           MIN(doc_id) AS keeper_doc_id
    FROM documents
    GROUP BY content_hash
    HAVING COUNT(*) > 1
    ORDER BY content_hash
    """,
    doc="Exact dedup: hash-groupBy on content digest; duplicate groups "
    "with canonical keeper (min doc_id).",
    tags=("dedup", "exact"),
)
def d01(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5(F.lower(F.col("text"))).alias("content_hash"))
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keeper_doc_id"))
        .filter(F.col("n_docs") > 1)
        .orderBy("content_hash")
    )


@query(
    "d02_exact_dedup_kept",
    oracle="""
    WITH ranked AS (
      SELECT source, doc_id,
             row_number() OVER (PARTITION BY md5(lower(text)) ORDER BY doc_id) AS rn
      FROM documents
    )
    SELECT source, COUNT(*) AS n_kept
    FROM ranked WHERE rn = 1
    GROUP BY source ORDER BY source
    """,
    doc="Exact dedup keep-first: per-digest row_number window, keep rank 1.",
    tags=("dedup", "exact", "window"),
)
def d02(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5(F.lower(F.col("text")))).orderBy("doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
        .orderBy("source")
    )


def shingle_sets(d: DataFrame, n: int = 3) -> DataFrame:
    """doc_id → distinct n-word shingles (the MinHash/Jaccard input)."""
    return d.select(
        "doc_id",
        F.array_distinct(word_shingles(tokenize(F.col("text")), n)).alias("shingles"),
    ).filter(F.size("shingles") > 0)


def jaccard_pairs(d: DataFrame, n: int = 3, threshold: float = 0.5,
                  df_cap: int | None = None) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs via shingle-keyed self-join.

    ``df_cap`` drops shingles appearing in more than cap docs before the
    join — the 100 TB knob (bounded candidate generation).
    """
    sets = shingle_sets(d, n)
    sizes = sets.select("doc_id", F.size("shingles").alias("n_sh"))
    ex = sets.select("doc_id", F.explode("shingles").alias("sh"))
    if df_cap is not None:
        rare = (
            ex.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= df_cap)
            .select("sh")
        )
        ex = ex.join(rare, "sh")
    a = ex.select(F.col("doc_id").alias("a"), "sh")
    b = ex.select(F.col("doc_id").alias("b"), "sh")
    common = (
        a.join(b, "sh")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("n_sh").alias("nb"))
    return (
        common.join(sa, "a")
        .join(sb, "b")
        .select(
            "a",
            "b",
            F.round(
                F.col("n_common")
                / (F.col("na") + F.col("nb") - F.col("n_common")).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


@query(
    "d03_ngram_jaccard",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_DUCK_TOKS.format(c="text")} AS t FROM documents),
    sh AS (SELECT doc_id, {_DUCK_SHINGLES3.format(t="t")} AS s FROM toks
           WHERE len({_DUCK_SHINGLES3.format(t="t")}) > 0),
    ex AS (SELECT doc_id, unnest(s) AS sng FROM sh),
    common AS (
      SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS n_common
      FROM ex a JOIN ex b ON a.sng = b.sng AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT c.a, c.b,
           ROUND(c.n_common / CAST(sa.ns + sb.ns - c.n_common AS DOUBLE), 6) AS jaccard
    FROM common c
    JOIN (SELECT doc_id, len(s) AS ns FROM sh) sa ON sa.doc_id = c.a
    JOIN (SELECT doc_id, len(s) AS ns FROM sh) sb ON sb.doc_id = c.b
    WHERE c.n_common / CAST(sa.ns + sb.ns - c.n_common AS DOUBLE) >= 0.5
    ORDER BY c.a, c.b
    """,
    doc="n-gram Jaccard near-dup pairs (3-word shingles, exact set "
    "similarity via shingle-keyed join).",
    tags=("dedup", "jaccard"),
)
def d03(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return jaccard_pairs(d, n=3, threshold=0.5).orderBy("a", "b")


# ---------------------------------------------------------------------------
# MinHash + LSH


def _hash_with_seed(col: Column, seed: int) -> Column:
    return F.xxhash64(col, F.lit(seed))


def minhash_signatures(sets: DataFrame, num_perm: int = 32) -> DataFrame:
    """doc_id → minhash signature (array of num_perm min-hashes).

    One pass, no shuffle: per row, transform over seeds of
    array_min(transform(shingles, xxhash64(sh, seed))). All JVM-side.
    """
    sig = F.array(
        *[
            F.array_min(F.transform(F.col("shingles"), lambda s, i=i: _hash_with_seed(s, i)))
            for i in range(num_perm)
        ]
    )
    return sets.select("doc_id", sig.alias("sig"))


def lsh_candidate_pairs(sigs: DataFrame, bands: int = 8, rows: int = 4) -> DataFrame:
    """Band the signature, bucket-join on (band, band-hash).

    Shuffle is keyed on band hash — the scale path for all-pairs
    candidate generation (no cross join ever materializes).
    """
    banded = sigs.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.hash(F.slice(F.col("sig"), b * rows + 1, rows).cast("array<string>").cast("string"))
                    for b in range(bands)
                ]
            )
        ).alias("band", "bh"),
    )
    a = banded.select(F.col("doc_id").alias("a"), "band", "bh")
    b = banded.select(F.col("doc_id").alias("b"), "band", "bh")
    return (
        a.join(b, ["band", "bh"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def minhash_dedup_pairs(d: DataFrame, n: int = 3, num_perm: int = 32,
                        bands: int = 8, threshold: float = 0.35) -> DataFrame:
    """Full MinHash-LSH pipeline: shingle → sign → band → candidate →
    exact-Jaccard verify (candidates only)."""
    sets = shingle_sets(d, n)
    cands = lsh_candidate_pairs(minhash_signatures(sets, num_perm), bands, num_perm // bands)
    sa = sets.select(F.col("doc_id").alias("a"), F.col("shingles").alias("sha"))
    sb = sets.select(F.col("doc_id").alias("b"), F.col("shingles").alias("shb"))
    return (
        cands.join(sa, "a")
        .join(sb, "b")
        .select(
            "a",
            "b",
            F.round(
                F.size(F.array_intersect("sha", "shb"))
                / F.size(F.array_union("sha", "shb")).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


@query(
    "d04_minhash_lsh",
    oracle=None,  # xxhash64-based — recall vs exact Jaccard asserted in tests
    doc="MinHash(32 perms) + LSH(8 bands × 4 rows) candidate generation, "
    "exact-Jaccard verification of candidates only (shingle→minhash→"
    "band→bucket-join; no cross join at any scale).",
    tags=("dedup", "minhash"),
)
def d04(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return minhash_dedup_pairs(d).orderBy("a", "b")


def simhash(tokens: Column, bits: int = 64) -> Column:
    """64-bit SimHash of a token multiset: per-bit majority vote of
    token-hash bits, returned as a signed BIGINT."""
    def bit_sum(i: int) -> Column:
        return F.aggregate(
            tokens,
            F.lit(0).cast("long"),
            lambda acc, t: acc
            + F.when(F.shiftright(F.xxhash64(t), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )

    out = F.lit(0).cast("long")
    for i in range(bits):
        out = out + F.when(bit_sum(i) > 0, F.lit(1).cast("long") * (2**i if i < 63 else -(2**63))).otherwise(0)
    return out


@query(
    "d05_simhash",
    oracle=None,  # engine-specific hash — structural checks in tests
    doc="SimHash document fingerprints (64-bit majority-vote of token "
    "hash bits); near-dups differ in few bits → hamming-ball lookup.",
    tags=("dedup", "simhash"),
)
def d05(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return d.select(
        "doc_id", simhash(tokenize(F.col("text"))).alias("simhash")
    ).orderBy("doc_id")
