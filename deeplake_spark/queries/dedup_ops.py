"""Deduplication queries — thin wrappers over
`deeplake_spark.operators.dedup` (the reusable operator library).
See operators/dedup.py for scale design notes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deeplake_spark.functions.text import tokenize
from deeplake_spark.io import load_table
from deeplake_spark.operators.dedup import (
    dedup_exact,
    exact_duplicate_groups,
    jaccard_pairs,
    minhash_dedup_pairs,
    simhash_64,
)
from deeplake_spark.queries import query

_DUCK_TOKS = "list_filter(string_split_regex(lower({c}), '\\s+'), t -> t <> '')"
_DUCK_SHINGLES3 = (
    "list_distinct(list_transform(range(1, greatest(len({t}) - 2, 0) + 1), "
    "i -> {t}[i] || ' ' || {t}[i+1] || ' ' || {t}[i+2]))"
)

_DUCK_MD5INT60 = "CAST(('0x' || substr(md5({x} || '#{s}'), 1, 15)) AS UBIGINT)"


@query(
    "d01_exact_dup_groups",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 15
    )
    SELECT md5(lower(text)) AS content_hash,
           COUNT(*) AS n_docs,
           MIN(doc_id) AS keeper_doc_id
    FROM corpus
    GROUP BY content_hash
    HAVING COUNT(*) > 1
    ORDER BY content_hash
    """,
    doc="Exact dedup: hash-groupBy on content digest; duplicate groups "
    "with canonical keeper (min doc_id). Duplicates are planted "
    "in-query (15 re-idded copies — the t11 self-contained-signal "
    "pattern) because the current testdata carries no natural exact "
    "dups, which would make this a degenerate 0-row check.",
    tags=("dedup", "exact"),
)
def d01(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = d.filter(F.col("doc_id") < 15).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    return exact_duplicate_groups(d.unionByName(planted)).orderBy("content_hash")


@query(
    "d02_exact_dedup_kept",
    oracle="""
    WITH corpus AS (
      SELECT source, doc_id, text FROM documents
      UNION ALL
      SELECT 'replay' AS source, doc_id + 1000000, text
      FROM documents WHERE doc_id < 40
    ),
    ranked AS (
      SELECT source, doc_id,
             row_number() OVER (PARTITION BY md5(lower(text)) ORDER BY doc_id) AS rn
      FROM corpus
    )
    SELECT source, COUNT(*) AS n_kept
    FROM ranked WHERE rn = 1
    GROUP BY source ORDER BY source
    """,
    doc="Exact dedup keep-first: per-digest row_number window "
    "(digest-PARTITIONED — bounded groups, never a global sort), keep "
    "rank 1. A planted 'replay' source of 40 copies must be fully "
    "deduplicated away (keepers are the lower-id originals), so the "
    "per-source kept counts prove keep-FIRST, not keep-any.",
    tags=("dedup", "exact", "window"),
)
def d02(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("source", "doc_id", "text")
    planted = d.filter(F.col("doc_id") < 40).select(
        F.lit("replay").alias("source"),
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    return (
        dedup_exact(d.unionByName(planted))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
        .orderBy("source")
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


@query(
    "d04_minhash_lsh",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 25
    ),
    toks AS (SELECT doc_id, {_DUCK_TOKS.format(c="text")} AS t FROM corpus),
    sh AS (SELECT doc_id, {_DUCK_SHINGLES3.format(t="t")} AS s FROM toks
           WHERE len({_DUCK_SHINGLES3.format(t="t")}) > 0),
    ex AS (SELECT doc_id, unnest(s) AS sng FROM sh),
    common AS (
      SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS n_common
      FROM ex a JOIN ex b ON a.sng = b.sng AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT c.a, c.b,
           ROUND(c.n_common / CAST(sa.ns + sb.ns - c.n_common AS DOUBLE), 6)
             AS jaccard
    FROM common c
    JOIN (SELECT doc_id, len(s) AS ns FROM sh) sa ON sa.doc_id = c.a
    JOIN (SELECT doc_id, len(s) AS ns FROM sh) sb ON sb.doc_id = c.b
    WHERE c.n_common = sa.ns + sb.ns - c.n_common
    ORDER BY c.a, c.b
    """,
    doc="MinHash(32 perms) + LSH(8 bands × 4 rows) candidate generation, "
    "exact-Jaccard verification of candidates only (shingle→minhash→"
    "band→bucket-join; no cross join at any scale). Oracle-checkable "
    "configuration: 25 exact copies are planted in-query and the verify "
    "threshold is 1.0 — a pair with Jaccard exactly 1 has IDENTICAL "
    "shingle sets, hence identical minhash signatures, hence collides "
    "in EVERY band, so LSH recall on the admitted pair set is provably "
    "1 and the output equals the exact-Jaccard J=1 pair set DuckDB "
    "computes (robust to testdata regeneration: any natural J=1 pair "
    "is found by both sides for the same reason). Production "
    "thresholds (<1) are recall-gated in tests/test_operators.py.",
    tags=("dedup", "minhash"),
)
def d04(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = d.filter(F.col("doc_id") < 25).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    return minhash_dedup_pairs(d.unionByName(planted), threshold=1.0).orderBy("a", "b")


@query(
    "d05_simhash",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 150
      UNION ALL
      SELECT doc_id + 1000000, text || ' qqzzxy'
      FROM documents WHERE doc_id < 150
    ),
    toks AS (
      SELECT doc_id, unnest({_DUCK_TOKS.format(c="text")}) AS tok FROM corpus
    ),
    h AS (
      SELECT doc_id, {{md5h}} AS hv FROM toks
    ),
    bitsum AS (
      SELECT doc_id, i.i AS bit,
             SUM(CASE WHEN ((hv >> i.i) & 1) = 1 THEN 1 ELSE -1 END) AS s
      FROM h, LATERAL (SELECT unnest(range(0, 60)) AS i) i
      GROUP BY doc_id, i.i
    ),
    fp AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << bit)
                           ELSE 0 END) AS BIGINT) AS simhash
      FROM bitsum GROUP BY doc_id
    )
    SELECT o.doc_id, o.simhash, c.simhash AS copy_simhash,
           CAST(bit_count(xor(o.simhash, c.simhash)) AS INT) AS hamming
    FROM fp o JOIN fp c ON c.doc_id = o.doc_id + 1000000
    ORDER BY o.doc_id
    """.format(md5h=_DUCK_MD5INT60.format(x="tok", s="0")),
    doc="SimHash document fingerprints (majority-vote of token hash "
    "bits, explode + per-bit partial-agg sums) PLUS the near-dup "
    "property itself: each doc is paired with a planted one-token-"
    "appended copy and the fingerprint hamming distance is emitted — "
    "near-identical docs must land a few bits apart (the hamming-ball "
    "lookup premise). Runs the engine-portable md5-int60 hash so every "
    "bit is reproduced by the DuckDB oracle; the xxhash64 fast path "
    "(simhash_64) stays the unregistered production default, property-"
    "gated in tests/test_operators.py.",
    tags=("dedup", "simhash"),
)
def d05(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deeplake_spark.io import ensure_parallelism
    from deeplake_spark.operators.dedup import (
        _fold_bits,
        _md5_int60,
        bit_vote_array,
    )

    bits = 60
    d = (load_table(spark, sf_dir, "documents")
         .filter(F.col("doc_id") < 150).select("doc_id", "text"))
    planted = d.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" qqzzxy")).alias("text"))
    # ONE-PASS pair fingerprinting: token stream tagged original/copy,
    # 2x60 conditional bit-sums keyed by the base doc in a single
    # map-side-partial aggregate — no self-join, and the 60-sum subtree
    # is planned/compiled once instead of once per join branch (the
    # previous fp-then-self-join shape cost 3x the wall time here).
    toks = (
        ensure_parallelism(d.unionByName(planted))
        .select("doc_id", tokenize("text").alias("__toks"))
        .select("doc_id", F.explode_outer("__toks").alias("__tok"))
        .filter(F.col("__tok").isNotNull())
        .select(
            (F.col("doc_id") % 1_000_000).alias("base"),
            (F.col("doc_id") >= 1_000_000).alias("is_copy"),
            _md5_int60(F.col("__tok"), 0).alias("__h"),
        )
    )
    # 2x60 sums as TWO array-of-aggregates exprs (r16; see
    # operators/dedup.bit_vote_array): the per-sum F.expr build still
    # cost ~1,050 py4j round trips per construction here — one array
    # expr per side is 2 round trips, identical aggregate semantics
    agg = toks.groupBy("base").agg(
        bit_vote_array(bits, cond="NOT is_copy", alias="__bo"),
        bit_vote_array(bits, cond="is_copy", alias="__bc"),
    )
    return (
        agg.select(
            F.col("base").alias("doc_id"),
            _fold_bits("__bo", bits).alias("simhash"),
            _fold_bits("__bc", bits).alias("copy_simhash"),
        )
        .select(
            "doc_id", "simhash", "copy_simhash",
            F.bit_count(F.col("simhash").bitwiseXOR(F.col("copy_simhash")))
            .cast("int").alias("hamming"))
        .orderBy("doc_id")
    )


@query(
    "d06_dup_ngram_windows",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS.format(c="text")} AS t FROM documents
    ),
    wins AS (
      SELECT doc_id, array_to_string(t[i.i : i.i + 7], ' ') AS w
      FROM toks,
           LATERAL (SELECT unnest(range(1, greatest(len(t) - 7, 0) + 1)) AS i) i
    ),
    dupw AS (
      SELECT w FROM wins GROUP BY w HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    perwin AS (
      SELECT doc_id, (w IN (SELECT w FROM dupw)) AS isdup FROM wins
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(COUNT(*) FILTER (WHERE isdup) AS BIGINT) AS n_dup,
           ROUND(COUNT(*) FILTER (WHERE isdup) / COUNT(*), 6) AS dup_ratio
    FROM perwin
    GROUP BY doc_id
    ORDER BY dup_ratio DESC, doc_id
    LIMIT 25
    """,
    doc="Duplicated 8-token-window detection (distributed exact-"
    "substring-dedup stand-in, Lee et al. 2021): windows shared by >=2 "
    "distinct docs mark duplicated spans; per-doc coverage ratio is the "
    "drop/trim signal. One explode + one window-key groupBy + semijoin.",
    tags=("dedup", "substring", "windows"),
)
def d06(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deeplake_spark.operators.dedup import dup_window_stats

    d = load_table(spark, sf_dir, "documents")
    return (
        dup_window_stats(d, w=8, min_docs=2)
        .orderBy(F.desc("dup_ratio"), "doc_id")
        .limit(25)
    )


@query(
    "d07_dedup_clusters",
    oracle=f"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, {_DUCK_TOKS.format(c="text")} AS t FROM documents
    ),
    sh AS (SELECT doc_id, {_DUCK_SHINGLES3.format(t="t")} AS s FROM toks
           WHERE len({_DUCK_SHINGLES3.format(t="t")}) > 0),
    ex AS (SELECT doc_id, unnest(s) AS sng FROM sh),
    common AS (
      SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS n_common
      FROM ex a JOIN ex b ON a.sng = b.sng AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    pairs AS (
      SELECT c.a, c.b
      FROM common c
      JOIN (SELECT doc_id, len(s) AS ns FROM sh) sa ON sa.doc_id = c.a
      JOIN (SELECT doc_id, len(s) AS ns FROM sh) sb ON sb.doc_id = c.b
      WHERE c.n_common / CAST(sa.ns + sb.ns - c.n_common AS DOUBLE) >= 0.5
    ),
    edges AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
    reach(id, r) AS (
      SELECT a, a FROM edges
      UNION
      SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.id
    ),
    comp AS (SELECT id, MIN(r) AS cluster FROM reach GROUP BY id)
    SELECT cluster AS cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           array_to_string(
             list_transform(list_sort(list(id)), x -> CAST(x AS VARCHAR)),
             ',') AS members
    FROM comp
    GROUP BY cluster
    ORDER BY cluster_id
    """,
    doc="Near-dup cluster formation: exact Jaccard pairs -> connected "
    "components (min-label propagation, per-round localCheckpoint) -> "
    "canonical keeper + member list per cluster. The post-pair step of "
    "a real dedup pipeline; oracle is a recursive-CTE transitive "
    "closure.",
    tags=("dedup", "clusters", "iterative"),
)
def d07(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deeplake_spark.operators.dedup import dedup_clusters

    d = load_table(spark, sf_dir, "documents")
    return dedup_clusters(d, n=3, threshold=0.5).orderBy("cluster_id")


@query(
    "d08_decontamination",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS.format(c="text")} AS t FROM documents
    ),
    wins AS (
      SELECT doc_id, array_to_string(t[i.i : i.i + 3], ' ') AS w
      FROM toks,
           LATERAL (SELECT unnest(range(1, greatest(len(t) - 3, 0) + 1)) AS i) i
    ),
    eval_wins AS (
      SELECT DISTINCT w FROM wins WHERE doc_id % 50 = 0
    ),
    corpus_wins AS (
      SELECT DISTINCT doc_id, w FROM wins WHERE doc_id % 50 <> 0
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_hit_windows
    FROM corpus_wins
    WHERE w IN (SELECT w FROM eval_wins)
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    doc="Benchmark decontamination: corpus docs sharing any 4-token "
    "window with the eval set (doc_id %% 50 == 0 stands in for a "
    "benchmark). Eval windows broadcast -> one map-side corpus pass, "
    "no corpus shuffle at any scale.",
    tags=("dedup", "decontamination", "windows"),
)
def d08(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deeplake_spark.operators.dedup import contamination_hits

    d = load_table(spark, sf_dir, "documents")
    eval_df = d.filter(F.col("doc_id") % 50 == 0)
    corpus = d.filter(F.col("doc_id") % 50 != 0)
    return contamination_hits(corpus, eval_df, w=4).orderBy("doc_id")


@query(
    "d09_simhash_md5",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_DUCK_TOKS.format(c="text")}) AS tok
      FROM documents WHERE doc_id < 200
    ),
    h AS (
      SELECT doc_id, {_DUCK_MD5INT60.format(x="tok", s="0")} AS hv FROM toks
    ),
    bitsum AS (
      SELECT doc_id, i.i AS bit,
             SUM(CASE WHEN ((hv >> i.i) & 1) = 1 THEN 1 ELSE -1 END) AS s
      FROM h, LATERAL (SELECT unnest(range(0, 60)) AS i) i
      GROUP BY doc_id, i.i
    )
    SELECT doc_id,
           CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << bit)
                         ELSE 0 END) AS BIGINT) AS simhash
    FROM bitsum GROUP BY doc_id ORDER BY doc_id
    """,
    doc="SimHash over the engine-portable md5-int60 hash — the exact "
    "same plan shape as d05 (one explode, per-bit conditional sums in a "
    "single map-side-partial aggregate), but every fingerprint bit is "
    "reproduced independently by the DuckDB oracle. d05's xxhash64 "
    "stays the production fast path; this query hash-checks the "
    "majority-vote fingerprint MATH end to end.",
    tags=("dedup", "simhash", "portable"),
)
def d09(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deeplake_spark.operators.dedup import simhash_portable

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return simhash_portable(d, tokenize("text")).orderBy("doc_id")


@query(
    "d10_minhash_md5",
    oracle=f"""
    WITH sets AS (
      SELECT doc_id, {_DUCK_SHINGLES3.format(t=_DUCK_TOKS.format(c="text"))} AS sh
      FROM documents WHERE doc_id < 200
    ),
    ex AS (SELECT doc_id, unnest(sh) AS s FROM sets WHERE len(sh) > 0)
    SELECT doc_id,
           {" || ',' || ".join(
               "CAST(MIN(" + _DUCK_MD5INT60.format(x="s", s=i) + ") AS VARCHAR)"
               for i in range(8))} AS sig
    FROM ex GROUP BY doc_id ORDER BY doc_id
    """,
    doc="MinHash signatures over the engine-portable md5-int60 hash "
    "(8 permutations, min over distinct 3-shingles; pure JVM "
    "expressions, no shuffle — d04's xxhash64 path is the production "
    "default). Every signature component is reproduced by the DuckDB "
    "oracle, hash-checking the signature MATH that d04's LSH banding "
    "builds on.",
    tags=("dedup", "minhash", "portable"),
)
def d10(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deeplake_spark.operators.dedup import (
        minhash_signatures_portable,
        shingle_sets,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    sets = shingle_sets(d, "text", "doc_id", 3)
    # drop shingle-less docs via the generator OUTPUT, not a
    # size(shingles) filter — that predicate would be pushed + inlined
    # into the scan, re-evaluating the shingle expression there
    # (CLAUDE.md trap 3)
    have = (
        sets.select("doc_id", F.explode_outer("shingles").alias("__s"))
        .filter(F.col("__s").isNotNull())
        .select("doc_id")
        .distinct()
    )
    sig = minhash_signatures_portable(sets, num_perm=8).join(
        F.broadcast(have), "doc_id", "left_semi")
    return sig.select(
        "doc_id",
        F.array_join(F.transform(F.col("sig"), lambda x: x.cast("string")), ",")
        .alias("sig"),
    ).orderBy("doc_id")

