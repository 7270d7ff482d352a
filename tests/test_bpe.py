"""Exact BPE tokenizer (operators/bpe.py): deterministic training,
Spark-lane == pure-Python-reference equivalence, lossless round trip,
and the exact-count lanes of pack_token_budget / chunk_fixed_tokens.
The merge loop has no DuckDB spelling (per-word iteration), so the
oracle here is the reference implementation `bpe.encode_word` — the
registered t34 query (outside the driver's 50-query d/q/r window) is
oracle-less by design and gets the rows-only lane in the independent
sweep (tests/test_oracle_parity.py ROWS_ONLY), plus the invariant
test below."""

from __future__ import annotations

from pyspark.sql import functions as F

from deeplake_spark.io import load_table
from deeplake_spark.operators.bpe import (
    bpe_detokenize,
    bpe_token_count,
    bpe_tokenize,
    encode_word,
    load_bpe,
    save_bpe,
    train_bpe,
    train_bpe_from_counts,
)


def test_train_matches_hand_computed_merges():
    """The Sennrich worked example: corpus {low:5, lower:2, newest:6,
    widest:3}. Highest-count pair is (e,s) [newest+widest = 9], then
    (es,t) [9], then (est,</w>) [9], then (l,o) [low+lower = 7] — the
    paper's own merge sequence. Ties break (count DESC, pair ASC),
    so the run is reproducible bit for bit."""
    counts = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = train_bpe_from_counts(counts, num_merges=4)
    assert merges == [("e", "s"), ("es", "t"), ("est", "</w>"),
                      ("l", "o")]
    # encoding with those merges segments as the paper shows
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_word("newest", ranks) == ["n", "e", "w", "est</w>"]
    assert encode_word("lowest", ranks) == ["lo", "w", "est</w>"]


def test_train_is_deterministic(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(200)
    m1 = train_bpe(d, num_merges=60, max_word_types=2000)
    m2 = train_bpe(d, num_merges=60, max_word_types=2000)
    assert m1 == m2 and len(m1) == 60


def test_spark_lane_matches_reference_encoder(spark, sf_dir):
    """Every document at sf0.001: the Arrow-batched UDF lane produces
    exactly the tokens the pure-Python reference encoder produces —
    the oracle for an operator DuckDB cannot spell."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    merges = train_bpe(docs, num_merges=200, max_word_types=5000)
    ranks = {p: i for i, p in enumerate(merges)}
    got = {r.doc_id: list(r.bpe_tokens)
           for r in bpe_tokenize(docs, merges).collect()}
    for r in docs.collect():
        want = []
        for w in (r.text or "").lower().split():
            want.extend(encode_word(w, ranks))
        assert got[r.doc_id] == want, r.doc_id
    # counts lane agrees
    counts = {r.doc_id: r.n_bpe_tokens
              for r in bpe_token_count(docs, merges).collect()}
    assert counts == {k: len(v) for k, v in got.items()}


def test_round_trip_lossless(spark, sf_dir):
    """concat(tokens) with </w> -> space reproduces the whitespace-
    normalized lowercased text, for every document."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    merges = train_bpe(docs, num_merges=120, max_word_types=3000)
    out = bpe_tokenize(docs, merges).select(
        "doc_id", "text", bpe_detokenize(F.col("bpe_tokens")).alias("rt"))
    for r in out.collect():
        assert r.rt == " ".join((r.text or "").lower().split()), r.doc_id


def test_exact_budget_lanes(spark, sf_dir):
    """pack_token_budget(merges=...) budgets on EXACT subword counts;
    chunk_fixed_tokens(merges=...) chunks in subword space and its
    chunk_text concatenation detokenizes back to each document."""
    from deeplake_spark.operators.restructure import (
        chunk_fixed_tokens,
        pack_token_budget,
    )

    docs = (load_table(spark, sf_dir, "documents")
            .select("doc_id", "text").filter(F.col("doc_id") < 40))
    merges = train_bpe(docs, num_merges=80, max_word_types=2000)
    exact = {r.doc_id: r.n_bpe_tokens
             for r in bpe_token_count(docs, merges).collect()}

    packed = pack_token_budget(docs, budget=64, merges=merges).collect()
    assert sum(r.total_tokens for r in packed) == sum(exact.values())
    # docs are packed contiguously in id order
    for r in packed:
        assert r.first_doc <= r.last_doc

    chunks = chunk_fixed_tokens(docs, chunk=16, merges=merges).collect()
    per_doc: dict = {}
    for r in chunks:
        per_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rows in per_doc.items():
        rows.sort(key=lambda r: r.chunk_idx)
        assert sum(r.n_tokens for r in rows) == exact[doc_id]
        assert all(r.n_tokens == 16 for r in rows[:-1])
    # chunk_text joins back to the normalized document text
    text_of = {r.doc_id: " ".join((r.text or "").lower().split())
               for r in docs.collect()}
    for doc_id, rows in per_doc.items():
        glued = "".join(
            (r.chunk_text + " " if i < len(rows) - 1 and r.chunk_text
             and not r.chunk_text.endswith(" ") else r.chunk_text)
            for i, r in enumerate(rows))
        # chunk boundaries can split a word mid-subword: strip the
        # synthetic joins by comparing the space-free character stream
        assert glued.replace(" ", "") == text_of[doc_id].replace(" ", "")


def test_save_load_round_trip(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").limit(100)
    merges = train_bpe(docs, num_merges=50, max_word_types=1000)
    p = str(tmp_path / "bpe.json")
    save_bpe(merges, p)
    assert load_bpe(p) == merges


def test_t34_registered_query_invariants(spark, sf_dir):
    """The registered t34 query (rows-only lane — the encode loop has
    no DuckDB spelling): registered WITHOUT an oracle, one row per
    document, and every row satisfies the subword-count bounds
    n_words <= n_bpe_tokens <= n_chars + n_words (each word emits
    between 1 merged token and len(word)+1 unmerged symbols)."""
    from deeplake_spark.queries import load_all

    q = load_all()["t34_bpe_token_counts"]
    assert q.oracle is None
    out = q.fn(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(out) == n_docs
    for r in out:
        assert r.n_words <= r.n_bpe_tokens <= r.n_chars + r.n_words, r
    # memoized merges: a second build reuses the trained list (no
    # second corpus pass) and returns identical counts
    again = q.fn(spark, sf_dir).collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in out]


def test_bpe_detokenize_survives_literal_marker_text(spark):
    """r15 review: input text containing the literal end-of-word
    marker '</w>' re-concatenates its CHARACTERS inside tokens; the
    old global substring replace converted them to spaces (word lost).
    The per-token terminal-suffix strip keeps them."""
    from deeplake_spark.operators.bpe import (
        bpe_detokenize, bpe_tokenize, train_bpe)

    df = spark.createDataFrame(
        [(0, "foo </w> bar baz"), (1, "plain words only here")],
        "doc_id long, text string")
    merges = train_bpe(df, "text", num_merges=10)
    toks = bpe_tokenize(df, merges, text_col="text")
    rt = toks.select(
        "doc_id",
        bpe_detokenize(F.col("bpe_tokens")).alias("rt")).collect()
    got = {r.doc_id: r.rt for r in rt}
    assert got[0] == "foo </w> bar baz"
    assert got[1] == "plain words only here"
