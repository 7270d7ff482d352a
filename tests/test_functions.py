"""SQL-fragment twin pins (r15 optimization, CLAUDE.md trap 12).

Many expression builders in deeplake_spark.functions accept
``Column | str``: a str argument is a SQL fragment and the whole
expression builds as ONE ``F.expr`` (~1 py4j round trip) instead of a
chained-Column build (~10-40 round trips — construction is a DRIVER
cost paid per bench-timed query construction). These tests pin the
load-bearing claim: the parsed tree is IDENTICAL to the Column build
(canonical optimized plan equality), so plan shape, codegen and
results cannot drift between the two paths. Value equality is checked
too so a canonicalization quirk can never mask a semantic change.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deeplake_spark.functions import arrays as A
from deeplake_spark.functions import text as T
from deeplake_spark.functions import vector as V
from deeplake_spark.operators import sketches as SK


@pytest.fixture(scope="module")
def twin_df(spark, tmp_path_factory):
    # parquet-backed (not a LocalRelation: canon hides LocalRelation
    # data, trap 19 — a file scan keeps the comparison honest)
    p = str(tmp_path_factory.mktemp("twins") / "t")
    spark.createDataFrame(
        [
            (1, "Hello World  spark gpu", [1.0, -2.0, 3.0, 0.5],
             [0.5, 2.0, -1.0, 4.0], [1, 0, 1, 1], [1, 1, 0, 1]),
            (2, "the quick brown fox, the lazy dog! le chat",
             [0.0, 0.0, 0.0, 0.0], [1.0, 1.0, 1.0, 1.0],
             [0, 0, 0, 0], [1, 0, 1, 0]),
            (3, "", [2.5, -0.5, 1.5, -3.0], [-1.0, 0.25, 0.75, 2.0],
             [1, 1, 1, 1], [1, 1, 1, 1]),
            (4, "der und die das el la y es fast spark spark",
             [4.0, 3.0, 2.0, 1.0], [1.0, 2.0, 3.0, 4.0],
             [0, 1, 0, 1], [0, 1, 1, 0]),
        ],
        "id int, text string, va array<double>, vb array<double>, "
        "ba array<int>, bb array<int>",
    ).write.mode("overwrite").parquet(p)
    return spark.read.parquet(p)


def _canon(df):
    return df._jdf.queryExecution().optimizedPlan().canonicalized().toString()


def _assert_twin(base_df, name, col_expr, str_expr):
    d1 = base_df.select(col_expr.alias("out"))
    d2 = base_df.select(str_expr.alias("out"))
    assert _canon(d1) == _canon(d2), f"{name}: canonical plan drifted"
    assert [r.out for r in d1.collect()] == [r.out for r in d2.collect()], (
        f"{name}: values drifted")


def test_vector_sql_twins_match(twin_df):
    vec = [0.25, -1.5, 3.0, 0.0]
    lit_col = F.array(*[F.lit(float(v)) for v in vec])
    cases = [
        ("dot", V.dot(F.col("va"), F.col("vb")), V.dot("va", "vb")),
        ("l1_norm", V.l1_norm(F.col("va")), V.l1_norm("va")),
        ("l2_norm_sq", V.l2_norm_sq(F.col("va")), V.l2_norm_sq("va")),
        ("l2_norm", V.l2_norm(F.col("va")), V.l2_norm("va")),
        ("linf_norm", V.linf_norm(F.col("va")), V.linf_norm("va")),
        ("cosine", V.cosine_similarity(F.col("va"), F.col("vb")),
         V.cosine_similarity("va", "vb")),
        ("hamming", V.hamming_distance(F.col("ba"), F.col("bb")),
         V.hamming_distance("ba", "bb")),
        ("sign_bits", V.sign_bits(F.col("va")), V.sign_bits("va")),
        ("literal_vec", lit_col, F.expr(V.literal_vec_sql(vec))),
        ("cosine_litvec", V.cosine_similarity(F.col("va"), lit_col),
         V.cosine_similarity("va", V.literal_vec_sql(vec))),
    ]
    for name, c, s in cases:
        _assert_twin(twin_df, name, c, s)


def test_literal_vec_sql_rejects_non_finite():
    with pytest.raises(ValueError):
        V.literal_vec_sql([1.0, float("nan")])
    with pytest.raises(ValueError):
        V.literal_vec_sql([float("inf")])


def test_text_sql_twins_match(twin_df):
    toks_c = T.tokenize(F.col("text"))
    toks_s = T.tokenize_sql("text")
    cases = [
        ("tokenize", toks_c, T.tokenize("text")),
        ("word_shingles", T.word_shingles(toks_c, 3),
         F.expr(T.word_shingles_sql(toks_s, 3))),
        ("char_ngrams", T.char_ngrams(F.col("text"), 3),
         T.char_ngrams("text", 3)),
        ("stopword_hits", T.stopword_hits(toks_c, ["the", "spark"]),
         T.stopword_hits(toks_s, ["the", "spark"])),
        ("predict_lang", T.predict_lang(toks_c), T.predict_lang(toks_s)),
        ("quality_score", T.quality_score(F.col("text")),
         T.quality_score("text")),
        ("kgram_hashes", T.kgram_hashes(toks_c, 3),
         T.kgram_hashes(toks_s, 3)),
    ]
    fc = T.quality_features(F.col("text"))
    fs = T.quality_features("text")
    assert set(fc) == set(fs)
    cases += [(f"quality_features.{k}", fc[k], fs[k]) for k in fc]
    for name, c, s in cases:
        _assert_twin(twin_df, name, c, s)


def test_winnow_sql_twin_matches(twin_df):
    # winnow is documented to take a PROJECTED hash column (trap 3)
    hashed = twin_df.select(
        T.kgram_hashes(T.tokenize_sql("text"), 3).alias("__h"))
    _assert_twin(hashed, "winnow", T.winnow(F.col("__h"), 2),
                 T.winnow("__h", 2))


def test_array_sql_twins_match(twin_df):
    _assert_twin(twin_df, "asum", A.asum(F.col("va")), A.asum("va"))
    # every slice regime: fwd, open, negative, stride, reversed
    for st, sp, stp in [(0, 8, 1), (None, None, 1), (-3, None, 1),
                        (1, -1, 2), (None, None, -1), (-1, 0, -1),
                        (2, None, -2), (0, 0, 1), (-1, -4, -1)]:
        _assert_twin(
            twin_df, f"array_slice[{st}:{sp}:{stp}]",
            A.array_slice(F.col("va"), st, sp, stp),
            F.expr(A._array_slice_sql("va", st, sp, stp)))


def test_mapdepth_sql_twins_match(twin_df):
    """r16 twins behind the TQL multi-dim subscript lowering: nested
    transform + element/slice as ONE parsed expr must be canon-
    identical (and value-identical) to the Column build."""
    nested_c = F.array(F.col("va"), F.col("vb"))
    nested_s = "array(va, vb)"
    for i in (0, 1, -1):
        _assert_twin(
            twin_df, f"map_at_depth[elem {i}]",
            A.map_at_depth(nested_c, 1, lambda a: A.element(a, i)),
            F.expr(A.map_at_depth_sql(
                nested_s, 1, lambda a: A.element_sql(a, i))))
    for st, sp, stp in [(0, 2, 1), (None, None, -1), (1, None, 2)]:
        _assert_twin(
            twin_df, f"map_at_depth[slice {st}:{sp}:{stp}]",
            A.map_at_depth(
                nested_c, 1, lambda a: A.array_slice(a, st, sp, stp)),
            F.expr(A.map_at_depth_sql(
                nested_s, 1,
                lambda a: A._array_slice_sql(a, st, sp, stp))))


def test_sketch_sql_twins_match(spark, twin_df):
    _assert_twin(twin_df, "kmv_estimate",
                 SK.kmv_estimate(F.col("va"), 3), SK.kmv_estimate("va", 3))
    _assert_twin(twin_df, "kmv_jaccard",
                 SK.kmv_jaccard(F.col("va"), F.col("vb"), 3),
                 SK.kmv_jaccard("va", "vb", 3))
    probe = twin_df.select(
        F.expr("transform(sequence(1, 16), i -> cast(i * 7 as bigint))")
        .alias("cm"),
        F.expr("transform(sequence(1, 4), "
               "i -> cast(i * 1152921504606846975 as bigint))")
        .alias("bloom"),
        F.col("text").alias("v"))
    _assert_twin(probe, "cm_estimate",
                 SK.cm_estimate(F.col("cm"), F.col("v"), 2, 8, 5),
                 SK.cm_estimate("cm", "v", 2, 8, 5))
    _assert_twin(probe, "bloom_contains",
                 SK.bloom_contains(F.col("bloom"), F.col("v"), 4, 3, 1),
                 SK.bloom_contains("bloom", "v", 4, 3, 1))
