"""Deduplication operator library (exact, n-gram Jaccard, MinHash+LSH,
SimHash, embedding near-dup). DataFrame-in → DataFrame-out; no
driver-side collection anywhere.

Scale design:
  - one tokenize/shingle pass feeds everything downstream (the exploded
    posting relation is reused; at 100 TB you'd persist it as a side
    table exactly like the reference's inverted index — SURVEY §4.3).
  - candidate generation is always key-partitioned (digest, shingle, or
    LSH band hash) — no cross join at any point.
  - `df_cap` bounds the per-shingle fanout (drop shingles occurring in
    > cap docs): the standard guard against quadratic pair blowup on
    boilerplate shingles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from deeplake_spark.functions.text import tokenize, word_shingles
from deeplake_spark.io import ensure_parallelism

# ------------------------------------------------------- cache release
# Several operators below persist intermediate relations (posting
# tables, shingle sets) that the RETURNED plan still references, so an
# in-operator unpersist is impossible — a long interactive session
# accumulates exactly the JVM cache residue of perf trap 15 unless
# something drives cleanup (bench.py's gc-scrub). The registry makes
# release EXPLICIT: every such persist is tracked, and
# ``release_cached()`` / ``with cached_scope():`` drop the blocks once
# the caller has materialized its results (the returned plans
# recompute — never fail — if re-executed afterwards). A FIFO cap
# auto-releases the oldest entries so sessions that ignore the API
# bound their residue instead of growing it without limit.

_TRACKED: list[DataFrame] = []
# Cap note (r13 VERDICT watch#3): eviction is oldest-first with no
# liveness check — correctness holds (an evicted plan recomputes), but
# a warm loop that re-forces a query whose persists are >CAP
# constructions old silently pays the rebuild. Keep the cap >= the
# warmest re-execution window (bench.py scrubs every 10 queries, well
# inside 32); raise it here if a longer warm lane appears.
_TRACKED_CAP = 32


def _track(df: DataFrame) -> DataFrame:
    df = df.persist()
    _TRACKED.append(df)
    while len(_TRACKED) > _TRACKED_CAP:
        try:
            _TRACKED.pop(0).unpersist()
        except Exception:
            pass
    return df


def release_cached() -> int:
    """Unpersist every intermediate relation a dedup operator persisted
    in this session (round-12 VERDICT wrong#1). Call after
    materializing operator results; returns the number released."""
    n = 0
    while _TRACKED:
        try:
            _TRACKED.pop().unpersist()
            n += 1
        except Exception:
            pass
    return n


class cached_scope:
    """``with cached_scope(): ...`` — releases the dedup operators'
    persisted intermediates created inside the scope on exit
    (materialize results inside the scope)."""

    def __enter__(self) -> "cached_scope":
        # Membership by identity, not list index: a FIFO-cap eviction
        # inside the scope pops from the front and shifts indices, so
        # an index mark would let early in-scope persists slide below
        # it and leak (ADVICE r13). Holding strong refs to the
        # pre-scope entries also pins their id()s against reuse.
        self._before = list(_TRACKED)
        return self

    def __exit__(self, *exc) -> None:
        pre = {id(df) for df in self._before}
        for df in list(_TRACKED):
            if id(df) in pre:
                continue
            try:
                df.unpersist()
            except Exception:
                pass
        _TRACKED[:] = [df for df in _TRACKED if id(df) in pre]
        self._before = []


def exact_duplicate_groups(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """Duplicate groups by content digest: (content_hash, n_docs,
    keeper_doc_id). One digest-keyed shuffle."""
    return (
        df.groupBy(F.md5(F.lower(F.col(text_col))).alias("content_hash"))
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("keeper_doc_id"))
        .filter(F.col("n_docs") > 1)
    )


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the first row (min id) of every content-digest group."""
    w = Window.partitionBy(F.md5(F.lower(F.col(text_col)))).orderBy(id_col)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def shingle_sets(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                 n: int = 3) -> DataFrame:
    """id → distinct n-word shingles; rows with < n tokens drop out.

    Tokens are projected to a column BEFORE shingling: an inlined
    tokenize() expression gets re-evaluated per shingle element inside
    the higher-order transform (no common-subexpression elimination in
    interpreted HOF eval — ~50x slower at sf0.1).
    """
    df = ensure_parallelism(df)
    toks = tokenize(f"`{text_col}`")
    # NOTE deliberately no size(...) emptiness filter: short docs yield
    # an empty shingle array, which explodes to zero posting rows and
    # never pairs — same semantics, and a filter here would be pushed to
    # the (possibly single-partition) scan and re-evaluate tokenize there
    return (
        df.select(F.col(id_col).alias("doc_id"), toks.alias("__toks"))
        .select("doc_id", F.array_distinct(word_shingles("__toks", n)).alias("shingles"))
    )


def _posting(sets: DataFrame, df_cap: int | None) -> DataFrame:
    """Exploded (doc_id, shingle) posting relation, optionally df-capped.

    explode_outer + post-filter instead of explode: a plain explode
    makes Catalyst infer `size(child)>0 AND isnotnull(child)` on the
    generator input (InferFiltersFromGenerate) and push it below the
    repartition to the scan — re-evaluating the entire shingle
    expression on the scan's (possibly single) partition. The
    null-filter on the generator OUTPUT is equivalent and cheap.
    """
    ex = (
        sets.select("doc_id", F.explode_outer("shingles").alias("sh"))
        .filter(F.col("sh").isNotNull())
    )
    if df_cap is not None:
        rare = (
            ex.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= df_cap)
            .select("sh")
        )
        ex = ex.join(rare, "sh")
    return ex


def jaccard_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  n: int = 3, threshold: float = 0.5,
                  df_cap: int | None = None) -> DataFrame:
    """Exact n-gram Jaccard pairs (a < b, jaccard >= threshold).

    Single shingle pass: sizes are derived from the posting relation
    (groupBy count) instead of re-parsing text, and the self-join reuses
    the same exchange.
    """
    sets = shingle_sets(df, text_col, id_col, n)
    # persist the posting relation once: it feeds the self-join's two
    # sides AND the size aggregate — without this, text is re-tokenized
    # and re-shingled three times. The first ACTION fills the cache
    # (block-level locking dedups concurrent fills); no driver-side job
    # runs at construction time. At 100 TB this is a persisted side
    # table (the inverted index of SURVEY §4.3), not a cache.
    ex = _track(_posting(sets, df_cap))
    sizes = ex.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
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
    # threshold on the UNROUNDED similarity; round only the projected
    # output (the near_dup_pairs_lsh/cross_near_dup_lsh convention — a
    # rounded filter admits pairs in [t-5e-7, t) an exact oracle excludes)
    jac = (F.col("n_common")
           / (F.col("na") + F.col("nb") - F.col("n_common")).cast("double"))
    return (
        common.join(sa, "a")
        .join(sb, "b")
        .filter(jac >= threshold)
        .select("a", "b", F.round(jac, 6).alias("jaccard"))
    )


def containment_pairs(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", n: int = 3,
                      threshold: float = 0.8,
                      df_cap: int | None = None) -> DataFrame:
    """Exact n-gram CONTAINMENT pairs — the asymmetric near-dup
    Jaccard misses: containment(a→b) = |Sa ∩ Sb| / |Sa| finds
    documents that are EXCERPTS of others (a quote, a syndicated
    fragment, a page embedded in a larger crawl) where Jaccard stays
    low because the container is much bigger (Broder 1997's
    resemblance-vs-containment split; the Lee et al. 2022 dedup
    setting). Returns (a, b, containment) for a != b with
    containment >= threshold — a is the (near-)contained document;
    both directions of an identical pair appear, each with its own
    ratio.

    Same engine shape as `jaccard_pairs` (one shingle pass persisted,
    posting self-join with optional df cap, sizes from the posting
    relation); the threshold compares the UNROUNDED ratio, the
    projection rounds (the near_dup_pairs_lsh convention). At 100 TB
    the df cap bounds the join fan-out exactly as in d03."""
    sets = shingle_sets(df, text_col, id_col, n)
    ex = _track(_posting(sets, df_cap))
    sizes = ex.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = ex.select(F.col("doc_id").alias("a"), "sh")
    b = ex.select(F.col("doc_id").alias("b"), "sh")
    common = (
        a.join(b, "sh")
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("n_sh").alias("na"))
    cont = F.col("n_common") / F.col("na").cast("double")
    return (
        common.join(sa, "a")
        .filter(cont >= threshold)
        .select("a", "b", F.round(cont, 6).alias("containment"))
    )


def minhash_signatures(sets: DataFrame, num_perm: int = 32) -> DataFrame:
    """doc_id → minhash signature: sig[i] = min over shingles of
    xxhash64(shingle, seed=i). Pure JVM expression, no shuffle."""
    # one parsed expression for the whole signature: num_perm chained
    # transform/array_min Columns cost ~5 py4j round trips each,
    # driver-side (see bit_vote_sums); the SQL lambda also sidesteps
    # the arity-2 `lambda s, i=i:` index-as-second-arg trap outright
    sig = F.expr("array(" + ",".join(
        f"array_min(transform(shingles, s -> xxhash64(s, {i})))"
        for i in range(num_perm)) + ")")
    return sets.select("doc_id", sig.alias("sig"))


def lsh_candidate_pairs(sigs: DataFrame, bands: int = 8, rows: int = 4) -> DataFrame:
    """Band the signature and bucket-join on (band, band_hash) — the
    shuffle key is the band hash, so work stays proportional to true
    collisions (the 100 TB-safe candidate generator)."""
    band_sql = ",".join(
        f"hash(cast(cast(slice(sig, {b * rows + 1}, {rows}) "
        "as array<string>) as string))"
        for b in range(bands))
    banded = sigs.select(
        "doc_id",
        F.posexplode(F.expr(f"array({band_sql})")).alias("band", "bh"),
    )
    a = banded.select(F.col("doc_id").alias("a"), "band", "bh")
    b = banded.select(F.col("doc_id").alias("b"), "band", "bh")
    return a.join(b, ["band", "bh"]).filter(F.col("a") < F.col("b")).select("a", "b").distinct()


def minhash_dedup_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                        n: int = 3, num_perm: int = 32, bands: int = 8,
                        threshold: float = 0.35) -> DataFrame:
    """MinHash-LSH pipeline: shingle → sign → band → bucket-join →
    exact-Jaccard verification of the candidates only."""
    # one shingle pass feeds signing AND candidate verification
    sets = _track(shingle_sets(df, text_col, id_col, n))
    cands = lsh_candidate_pairs(minhash_signatures(sets, num_perm), bands, num_perm // bands)
    sa = sets.select(F.col("doc_id").alias("a"), F.col("shingles").alias("sha"))
    sb = sets.select(F.col("doc_id").alias("b"), F.col("shingles").alias("shb"))
    # threshold on the UNROUNDED similarity; round only in the output
    # projection (a rounded filter admits pairs in [t-5e-7, t) that an
    # exact oracle excludes)
    jacc = (
        F.size(F.array_intersect("sha", "shb"))
        / F.size(F.array_union("sha", "shb")).cast("double")
    )
    return (
        cands.join(sa, "a")
        .join(sb, "b")
        .filter(jacc >= threshold)
        .select("a", "b", F.round(jacc, 6).alias("jaccard"))
    )


def _fold_bits(arr_col: str, bits: int) -> Column:
    """Majority-vote fingerprint reassembly: bit i set iff bit-sum[i] > 0.

    A runtime fold over the projected bit-sum array instead of a
    ``bits``-deep chained-Add expression — the chain compiles ~5x slower
    (one When+Add pair per bit inlined into a single expression tree)
    for identical per-row work. shiftleft(1L, 63) wraps to Long.MIN_VALUE,
    which is exactly the sign-bit contribution, so the fold is uniform
    across all 64 bits."""
    return F.expr(
        f"aggregate(sequence(0, {bits - 1}), cast(0 as bigint), "
        f"(acc, i) -> acc + if(element_at({arr_col}, i+1) > 0, "
        f"shiftleft(cast(1 as bigint), i), cast(0 as bigint)))"
    )


def bit_vote_sums(bits: int, prefix: str = "b",
                  cond: str | None = None) -> list[Column]:
    """The `bits` conditional ±1 sums of a SimHash aggregate, each built
    as ONE ``F.expr`` string. The chained-Column construction
    (F.sum(F.when(F.shiftright(...)...))) costs ~9 py4j round trips per
    sum — ~2.4 s of pure DRIVER-side plan construction for d05's 120
    sums (measured; the JVM plan and the generated code are identical
    either way). `cond` (SQL boolean over the input columns) gates the
    vote to a row subset (the d05 one-pass original/copy pairing)."""
    out = []
    for i in range(bits):
        vote = f"IF((shiftright(__h, {i}) & 1) = 1, 1, -1)"
        body = f"CASE WHEN {cond} THEN {vote} ELSE 0 END" if cond else vote
        out.append(F.expr(f"sum({body}) AS {prefix}{i}"))
    return out


def bit_array(bits: int, prefix: str = "b", alias: str = "__bits") -> Column:
    """array(b0..b{bits-1}) as one parsed expression (one py4j call)."""
    cols = ",".join(f"{prefix}{i}" for i in range(bits))
    return F.expr(f"array({cols}) AS {alias}")


def bit_vote_array(bits: int, cond: str | None = None,
                   alias: str = "__bits") -> Column:
    """All `bits` conditional ±1 sums as ONE array-of-aggregates
    expression — r16 tightening of `bit_vote_sums` (trap 12): even
    with each sum a single F.expr, `bits` separate agg Columns still
    cost ~2 py4j round trips apiece plus the agg seq conversion
    (d05's 120 sums profiled ~1,050 py4j calls per construction).
    `array(sum(...), ...)` at the agg position is one parsed
    expression and one round trip; the aggregate semantics and the
    generated code are unchanged, and the downstream `_fold_bits`
    consumes the array directly (no bit_array reassembly projection)."""
    sums = []
    for i in range(bits):
        vote = f"IF((shiftright(__h, {i}) & 1) = 1, 1, -1)"
        body = f"CASE WHEN {cond} THEN {vote} ELSE 0 END" if cond else vote
        sums.append(f"sum({body})")
    return F.expr(f"array({','.join(sums)}) AS {alias}")


def simhash_64(df: DataFrame, tokens: Column, id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per document, explode-based.

    Plan: explode tokens → xxhash64 once per token → 64 conditional-sum
    aggregates (one per bit) in a single hash aggregate → reassemble the
    fingerprint. This keeps codegen flat (64 sums over one pass) instead
    of 64 nested folds, and map-side partial aggregation makes the
    shuffle one row per doc.
    """
    # hash PROJECTED to a column before the 64 sums reference it — an
    # inlined hash expression is copied into every conditional sum in
    # the generated code (perf trap 3 applied to aggregates): 64 copies
    # blow up codegen compile ~8x and defeat subexpression reuse
    agg = (
        ensure_parallelism(df)
        .select(F.col(id_col).alias("doc_id"), tokens.alias("__toks"))
        .select("doc_id", F.explode_outer("__toks").alias("__tok"))
        .filter(F.col("__tok").isNotNull())
        .select("doc_id", F.xxhash64(F.col("__tok")).alias("__h"))
        .groupBy("doc_id")
        .agg(bit_vote_array(64))
    )
    return agg.select("doc_id", _fold_bits("__bits", 64).alias("simhash"))


def dup_window_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                     w: int = 8, min_docs: int = 2) -> DataFrame:
    """Duplicated token-window detection — the distributed stand-in for
    exact-substring dedup (the suffix-array pass of "Deduplicating
    Training Data Makes Language Models Better", Lee et al. 2021;
    reference ships only document-level dedup, so this extends it the
    way a training pipeline needs): every contiguous ``w``-token window
    is a join key; a window appearing in >= ``min_docs`` DISTINCT
    documents marks a duplicated span. Output per document: total
    windows, duplicated-window occurrences, and the coverage ratio a
    pipeline would threshold on to drop or trim documents.

    Scale shape: one explode (ntokens rows/doc), one hash-groupBy on the
    window key with map-side partials (distinct (doc, window) first, so
    the distinct-doc count is a plain count), one occurrences⋈dup-keys
    join on the window key, and ONE per-doc aggregation computing both
    the total and duplicated counts (map-side partials make its shuffle
    per-doc-sized). No driver-side state, no cross join; the window
    string bounds the shuffle key at ~w tokens. At petabyte scale the
    key would be xxhash64(window) (collision odds ~n^2/2^64); the
    string key here keeps the operator exactly oracle-checkable. The
    totals come from the same flagged relation — a separate
    arithmetic-on-token-count branch would need a `n_windows >= 1`
    filter on the projected tokenize column, which Catalyst
    pushes+inlines into the scan (CLAUDE.md trap 3: the tokenize then
    runs inside the scan's own partitioning).
    """
    from deeplake_spark.functions.text import tokenize

    d = ensure_parallelism(df).select(
        F.col(id_col).alias("doc_id"), tokenize(f"`{text_col}`").alias("__t"))
    # index sequence guarded: sequence(1, n) with n < 1 would generate a
    # DESCENDING sequence — emit NULL instead, explode_outer keeps the
    # row, the null-filter on the OUTPUT drops it (never a filter on the
    # generator input — it would inline+push the tokenize twice)
    nw = f"size(__t) - {w - 1}"
    wins = (
        d.selectExpr("doc_id", "__t",
                     f"explode_outer(CASE WHEN {nw} >= 1 "
                     f"THEN sequence(1, {nw}) END) AS __i")
        .filter("__i IS NOT NULL")
    )
    # one parsed expression (see bit_vote_sums on chained-Column cost);
    # element_at args compile ~6x cheaper than slice+array_join (trap 6)
    win = F.expr("concat_ws(' ', " + ",".join(
        f"element_at(__t, __i + {j})" for j in range(w)) + ")")
    occurrences = wins.select("doc_id", win.alias("__w"))
    if min_docs == 2:
        # r16 restructure (guide §2.4; interleaved A/B: 1.18 → 0.69 s
        # min, wins every pair): ">= 2 distinct docs" is exactly
        # "min(doc_id) != max(doc_id)", so the dup flag is a pair of
        # window aggregates PARTITIONED BY the window key — the former
        # persist + distinct exchange + window-key aggregate + flag
        # join collapse into ONE __w-keyed exchange, and the posting
        # has a single consumer (the persist and its memory go away).
        # Bounded-group discipline (trap 7): the window is keyed, never
        # global; a hot window key buffers its frame in WindowExec
        # (spillable) — the same hot-key hazard class as the join
        # fan-out it replaces, and the w-token key bounds row width.
        ww = Window.partitionBy("__w")
        flagged = occurrences.withColumn(
            "__dup",
            (F.min("doc_id").over(ww) != F.max("doc_id").over(ww))
            .cast("long"))
    else:
        # general min_docs: the distinct-doc count per window needs a
        # real distinct — persisted posting + dup-key join (pre-r16
        # shape; no registered lane uses this path's threshold today)
        occurrences = _track(occurrences)
        dup_keys = (
            occurrences.distinct()
            .groupBy("__w").agg(F.count(F.lit(1)).alias("__nd"))
            .filter(F.col("__nd") >= min_docs)
            .select("__w")
        )
        flagged = occurrences.join(
            dup_keys.withColumn("__d", F.lit(1)), "__w", "left"
        ).withColumn("__dup", F.col("__d").isNotNull().cast("long"))
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum("__dup").alias("n_dup"),
        )
        .withColumn(
            "dup_ratio",
            F.round(F.col("n_dup").cast("double") / F.col("n_windows"), 6),
        )
    )


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star round (Kiveris et al., 'Connected Components in
    MapReduce and Beyond'): every node connects its strictly-larger
    neighbors to the minimum of its closed neighborhood."""
    sym = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = (sym.groupBy("u").agg(F.min("v").alias("__mn"))
         .select("u", F.least("__mn", F.col("u")).alias("__m")))
    return (
        sym.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("__m").alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star round: orient edges (max → min); every node connects
    its smaller-or-equal neighborhood (itself included) to that
    neighborhood's minimum."""
    o = e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
    m = o.groupBy("u").agg(F.min("v").alias("__m"))
    withself = o.unionByName(m.select("u", F.col("u").alias("v")))
    return (
        withself.join(m, "u")
        .filter(F.col("v") != F.col("__m"))
        .select(F.col("v").alias("u"), F.col("__m").alias("v"))
        .distinct()
    )


def connected_components_star(edges: DataFrame, src: str = "a", dst: str = "b",
                              max_iter: int = 50) -> DataFrame:
    """Star-contraction connected components (alternating large-star /
    small-star, Kiveris et al. 2014): converges in O(log n) rounds on
    ANY graph — the upgrade over min-label propagation (whose round
    count is the component diameter) when components are deep chains
    rather than the shallow hub-and-spoke shape near-dup clusters
    usually take. Each round is two key-partitioned groupBy+join
    passes; lineage is cut per round with an eager localCheckpoint;
    convergence is an exact edge-set comparison via two LIMIT-1
    anti-join probes (no data collection, no hash-sum heuristics).

    Returns (id, label) with label = the component's min id — the same
    contract as `connected_components`.
    """
    # one evaluation of the (possibly expensive) edge-generation
    # subtree; nodes/e union branches below read the checkpoint, not
    # the raw plan (see connected_components for the race rationale)
    e0 = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .localCheckpoint(eager=True)
    )
    nodes = (
        e0.select(F.col("u").alias("id"))
        .unionByName(e0.select(F.col("v").alias("id")))
        .distinct()
        .persist()
    )
    e = (
        e0.filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    try:
        for _ in range(max_iter):
            new = _small_star(_large_star(e)).localCheckpoint(eager=True)
            grew = new.join(e, ["u", "v"], "left_anti").limit(1).count()
            shrank = e.join(new, ["u", "v"], "left_anti").limit(1).count()
            e = new
            if grew == 0 and shrank == 0:
                break
        star = e.select(F.col("u").alias("id"), F.col("v").alias("label"))
        return (
            nodes.join(star, "id", "left")
            .select("id", F.coalesce("label", F.col("id")).alias("label"))
        )
    finally:
        nodes.unpersist()


def connected_components(edges: DataFrame, src: str = "a", dst: str = "b",
                         max_iter: int = 25,
                         algorithm: str = "label_prop") -> DataFrame:
    """Min-label propagation connected components (Pregel-style): every
    node starts labeled with its own id; each round a node takes the min
    of its own and its neighbors' labels; at fixpoint the label is the
    component's min id. Rounds are bounded by the component diameter —
    near-dup clusters are shallow in practice (hub-and-spoke around
    popular templates), so this converges in a handful of rounds;
    star-contraction (large-star/small-star) would bound it at O(log n)
    if ever needed. Each round is one join + partial-agg groupBy;
    lineage is cut per round with an eager localCheckpoint so the plan
    doesn't grow with iterations. Iterative by nature — the driver loop
    only runs a convergence probe (a 1-row aggregate), never collects
    data.

    Driver-job economics (r16, guide §1.2/§5 — the bench pays this loop
    on EVERY construction, and at 100 TB every probe is a full stage
    barrier): round 1 is FUSED into the label init (label₀ =
    min(id, min neighbor id) is exactly what one propagation round
    over self-labels computes, and it costs the same single groupBy the
    old `distinct()` init cost), and convergence is read from the SAME
    1-row probe that materializes each round's checkpoint — each row
    carries its previous label, so `max(label != __old)` detects the
    fixpoint without the former sum-vs-previous-round bookkeeping (and
    works for ANY id type, retiring the non-numeric fallback's extra
    join job). Net: one fewer round-job per call, one probe per round,
    exact convergence.

    `algorithm="star"` dispatches to `connected_components_star`
    (large-star/small-star contraction, O(log n) rounds on any graph) —
    prefer it when components may be deep chains.

    Returns (id, cluster) where cluster = min id of the component.
    """
    if algorithm == "star":
        return connected_components_star(edges, src, dst, max_iter=max(max_iter, 50))
    if algorithm != "label_prop":
        raise ValueError(f"unknown CC algorithm {algorithm!r}")
    # Materialize the (small) edge list ONCE before symmetrizing: sym's
    # two union branches would otherwise each recompute the full edge-
    # generation subtree (e.g. the LSH/Jaccard pair join) inside round
    # 1's job — persist() alone doesn't help because the cache sits at
    # the sym level and both branches race below it. The checkpoint is
    # one evaluation of the upstream; every later round touches only
    # the checkpointed rows. (Iterative operators run driver jobs by
    # nature — the no-job-at-construction rule applies to translate/
    # non-iterative constructors.)
    e0 = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .localCheckpoint(eager=True)
    )
    sym = (
        e0.select(F.col("s").alias("id"), F.col("d").alias("nb"))
        .unionByName(e0.select(F.col("d").alias("id"), F.col("s").alias("nb")))
        .persist()
    )
    # fused init ≡ init-with-own-id + round 1 (see docstring); LAZY
    # checkpoint — round 2's probe is its first action and materializes
    # it (single consumer, no union-branch race)
    labels = (
        sym.groupBy("id")
        .agg(F.least(F.min("nb"), F.col("id")).alias("label"))
        .localCheckpoint(eager=False)
    )
    try:
        for _ in range(max_iter - 1):
            neigh = (
                sym.join(
                    labels.select(F.col("id").alias("nb"),
                                  F.col("label").alias("nb_label")),
                    "nb",
                )
                .groupBy("id")
                .agg(F.min("nb_label").alias("nmin"))
            )
            new = (
                labels.join(neigh, "id", "left")
                .select(
                    "id",
                    F.least("label", F.coalesce("nmin", "label")).alias("label"),
                    F.col("label").alias("__old"),
                )
                .localCheckpoint(eager=False)
            )
            # ONE probe materializes the round AND answers convergence:
            # any row whose label changed? (min-propagation labels only
            # ever decrease, so != is a decrease). NULL = empty relation.
            chg = new.agg(
                F.max((F.col("label") != F.col("__old")).cast("int"))
                .alias("c")
            ).head()["c"]
            labels = new.select("id", "label")
            if not chg:
                break
    finally:
        sym.unpersist()
    return labels.select("id", "label")


def dedup_clusters(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                   n: int = 3, threshold: float = 0.5) -> DataFrame:
    """Near-dup cluster formation — the step after pair generation in a
    real dedup pipeline (LSH/Jaccard pairs → connected components →
    keep one doc per cluster). Output per cluster: canonical keeper
    (min doc id = cluster id), member count, and the sorted member
    list as a string."""
    pairs = jaccard_pairs(df, text_col=text_col, id_col=id_col,
                          n=n, threshold=threshold)
    cc = connected_components(pairs, "a", "b")
    return (
        cc.groupBy(F.col("label").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.array_join(
                F.transform(F.array_sort(F.collect_list("id")),
                            lambda x: x.cast("string")),
                ",",
            ).alias("members"),
        )
    )


def contamination_hits(corpus: DataFrame, eval_df: DataFrame,
                       text_col: str = "text", id_col: str = "doc_id",
                       w: int = 8) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any
    contiguous ``w``-token window with an evaluation set (the n-gram
    overlap check training pipelines run against eval benchmarks before
    training). Returns (doc_id, n_hit_windows) for contaminated corpus
    docs — n_hit_windows counts this doc's distinct windows that appear
    anywhere in the eval set.

    Scale shape: eval sets are tiny next to the corpus, so the eval
    windows are broadcast and the corpus makes ONE map-side pass — no
    corpus shuffle at any corpus size. The corpus window build reuses
    the guarded explode of dup_window_stats.
    """
    from deeplake_spark.functions.text import tokenize

    def windows(df: DataFrame) -> DataFrame:
        d = ensure_parallelism(df).select(
            F.col(id_col).alias("doc_id"), tokenize(f"`{text_col}`").alias("__t"))
        n = F.size("__t") - F.lit(w - 1)
        rows = (
            d.select("doc_id", "__t",
                     F.explode_outer(F.when(n >= 1, F.sequence(F.lit(1), n))).alias("__i"))
            .filter(F.col("__i").isNotNull())
        )
        win = F.expr("concat_ws(' ', " + ",".join(
            f"element_at(__t, __i + {j})" for j in range(w)) + ")")
        return rows.select("doc_id", win.alias("__w"))

    eval_wins = windows(eval_df).select("__w").distinct()
    # broadcast-semijoin BEFORE distinct: only contaminated windows (a
    # sliver of the corpus) ever reach a shuffle
    return (
        windows(corpus)
        .join(F.broadcast(eval_wins), "__w", "left_semi")
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit_windows"))
    )


def _md5_int60(col: Column, seed: int) -> Column:
    """Engine-portable 60-bit hash: first 15 hex chars of
    md5(value#seed) parsed as an integer. Identical in DuckDB
    (`CAST(('0x'||substr(md5(x||'#s'),1,15)) AS UBIGINT)`), so
    operators built on it are exactly oracle-checkable — unlike
    xxhash64, whose implementation is engine-private. 15 hex digits
    keep the value inside a signed 64-bit long."""
    return F.conv(
        F.substring(F.md5(F.concat(col, F.lit(f"#{seed}"))), 1, 15), 16, 10
    ).cast("long")


def _md5_int60_sql(expr: str, seed: int) -> str:
    """SQL-fragment twin of `_md5_int60` for construction-hot paths:
    one F.expr over a composed string parses to the IDENTICAL Catalyst
    tree but costs ~1 py4j round trip instead of ~8 per hash term
    (trap 12 — chained-Column construction is a DRIVER cost; sketch
    builders loop this k/d/num_perm times per row expression).
    ``expr`` is a SQL fragment (column name or sub-expression).
    Tree equality with the Column builder is pinned in
    tests/test_operators.py::test_md5_int60_sql_twin_matches_column."""
    return ("cast(conv(substring(md5(concat(" + expr +
            f", '#{seed}')), 1, 15), 16, 10) as bigint)")


def minhash_signatures_portable(sets: DataFrame, num_perm: int = 16) -> DataFrame:
    """MinHash signatures over the portable hash: sig[i] = min over
    shingles of md5_int60(shingle, i). Same plan shape as the xxhash64
    fast path (pure JVM expressions, no shuffle) — the fast path stays
    the production default; this variant exists so the signature math
    itself is hash-checked against an independent engine."""
    # one expr string for the num_perm-term signature array (trap 12:
    # the transform-lambda chain costs ~20 py4j round trips per perm)
    sig = F.expr("array(" + ", ".join(
        f"array_min(transform(shingles, s -> {_md5_int60_sql('s', i)}))"
        for i in range(num_perm)) + ")")
    return sets.select("doc_id", sig.alias("sig"))


def simhash_portable(df: DataFrame, tokens: Column, id_col: str = "doc_id",
                     bits: int = 60) -> DataFrame:
    """SimHash over the portable hash (see simhash_64 for the plan
    shape: one explode, `bits` conditional sums in a single map-side-
    partial aggregate, fingerprint reassembly). Exactly reproducible in
    the DuckDB oracle, which the xxhash64 fast path cannot be."""
    # hash projected to a column first — see simhash_64 (60 inlined md5
    # copies in codegen cost ~8x compile and re-evaluate per bit)
    agg = (
        ensure_parallelism(df)
        .select(F.col(id_col).alias("doc_id"), tokens.alias("__toks"))
        .select("doc_id", F.explode_outer("__toks").alias("__tok"))
        .filter(F.col("__tok").isNotNull())
        .select("doc_id", _md5_int60(F.col("__tok"), 0).alias("__h"))
        .groupBy("doc_id")
        .agg(bit_vote_array(bits))
    )
    return agg.select("doc_id", _fold_bits("__bits", bits).alias("simhash"))


def cdc_chunks(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
               w: int = 4, mask: int = 15) -> DataFrame:
    """Content-defined chunking: split every document into variable
    token spans whose boundaries are set by CONTENT — a chunk ends
    after token i when md5(last ``w`` tokens) % (mask+1) == 0, so the
    expected chunk length is mask+1 tokens. Insertions and deletions
    only move the boundaries NEAR the edit (the rsync/LBFS property);
    a shared passage elsewhere re-chunks identically, which
    fixed-stride windows (dup_window_stats) cannot promise under
    shift. Returns (doc_id, seg, chunk) — one row per chunk, ``chunk``
    the space-joined token span.

    Scale shape: one tokenize pass, a guarded explode (one row per
    token), the boundary flag as a pure hash expression, segment ids
    via a PER-DOC running sum (partitioned window — never global),
    and one (doc, seg) aggregation whose collect_list is bounded by
    the chunk length. Everything is md5-portable — exactly
    oracle-checkable.
    """
    from deeplake_spark.functions.text import tokenize

    d = ensure_parallelism(df).select(
        F.col(id_col).alias("doc_id"), tokenize(f"`{text_col}`").alias("__t"))
    n = F.size("__t")
    rows = (
        d.select("doc_id", "__t",
                 F.explode_outer(F.when(n >= 1, F.sequence(F.lit(1), n)))
                 .alias("__i"))
        .filter(F.col("__i").isNotNull())
    )
    ctx = ("concat_ws(' ', slice(__t, greatest(1, __i - %d + 1), "
           "least(__i, %d)))" % (w, w))
    flagged = rows.select(
        "doc_id", "__i",
        F.element_at("__t", F.col("__i")).alias("__tok"),
        F.expr(f"cast(({_md5_int60_sql(ctx, 0)} % {mask + 1}) = 0 as int)")
        .alias("__b"),
    )
    win = Window.partitionBy("doc_id").orderBy("__i")
    seg = (F.sum("__b").over(win) - F.col("__b")).alias("seg")
    return (
        flagged.select("doc_id", "__i", "__tok", seg)
        .groupBy("doc_id", "seg")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct(F.col("__i"), F.col("__tok")))),
                    lambda s: s["__tok"]),
                " ",
            ).alias("chunk")
        )
    )


def cdc_shared_passages(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", w: int = 4,
                        mask: int = 15, min_docs: int = 2,
                        max_docs: int | None = 100) -> DataFrame:
    """Shared-passage detection on content-defined chunks: a chunk
    string appearing in >= ``min_docs`` distinct documents marks a
    copied passage; per document-pair, count the shared distinct
    chunks. Because boundaries are content-defined, a passage pasted
    at a DIFFERENT offset in another document still yields identical
    interior chunks — the shift robustness fixed windows lack.
    Returns (a, b, n_shared_chunks), a < b.

    Scale shape: chunk strings are the join key exactly as in
    dup_window_stats (hash-groupBy with map-side partials); the pair
    fan-out lists only chunks that actually repeat, so work tracks
    true sharing — EXCEPT boilerplate: a short chunk shared by d
    documents yields d^2/2 pairs, so ``max_docs`` drops chunks more
    common than that (boilerplate headers/footers, not copied
    passages — the bucket_cap convention from the LSH operators; set
    None to disable). At 100 TB the key becomes a chunk hash; the
    string key keeps sf-scale runs oracle-checkable."""
    # NO persist on chunks (r15 A/B): a tracked persist measured
    # 1.84-2.98 s vs 1.71-2.44 s recomputed (interleaved min-of-3) —
    # AQE stage reuse already shares the chunk subtree's shuffles and
    # the deserialized cache fill costs more than it saves here. At
    # 100 TB the chunk relation is a persisted parquet side table (the
    # inverted-index protocol), not an in-plan memory cache.
    #
    # r15 opt (guide §2.4 remove shuffles): chunks come from the
    # row-local `cdc_chunk_array` fold (the streaming twin's spelling,
    # per-doc equality with `cdc_chunks` pinned in tests) instead of
    # the explode + per-doc running-sum window + (doc,chunk) distinct —
    # that dropped the window exchange+sort AND the distinct shuffle
    # (array_distinct is row-local): interleaved x6 A/B at sf0.1
    # measured old 2.28-2.94 s vs new 1.79-2.20 s, values identical.
    from deeplake_spark.functions.text import tokenize
    from deeplake_spark.io import ensure_parallelism

    d = ensure_parallelism(df).select(
        F.col(id_col).alias("doc_id"), tokenize(f"`{text_col}`").alias("__t"))
    chunks = (
        d.select("doc_id",
                 F.explode_outer(F.array_distinct(
                     cdc_chunk_array("__t", w, mask))).alias("chunk"))
        .filter(F.col("chunk").isNotNull())
    )
    counted = chunks.groupBy("chunk").agg(F.count(F.lit(1)).alias("__n"))
    dup = counted.filter(F.col("__n") >= min_docs)
    if max_docs is not None:
        dup = dup.filter(F.col("__n") <= max_docs)
    dup = dup.select("chunk")
    hits = chunks.join(dup, "chunk", "left_semi")
    if max_docs is not None:
        # r16 restructure (guide §2.4): with the boilerplate cap in
        # force, every surviving chunk has <= max_docs occurrences, so
        # the pair self-join (which re-evaluated the chunk fold for
        # BOTH aliased sides — the a/b branches feed broadcast joins at
        # sf scale, so there is no exchange for AQE to reuse; the
        # committed executed plan t33_..._before_final.txt shows the
        # fold running 3x) collapses into one BOUNDED collect_list per
        # chunk + a row-local a<b pair expansion. Interleaved x6 A/B:
        # old 1.82/2.28 s (min/med) vs new 1.50/1.85, values identical.
        # At 100 TB the dup side outgrows broadcast, the semi join goes
        # sort-merge, and its chunk exchange is the SAME exchange the
        # count aggregate shuffles — one fold pass total.
        grouped = hits.groupBy("chunk").agg(
            F.array_sort(F.collect_list("doc_id")).alias("__docs"))
        pairs_expr = (
            "flatten(transform(__docs, (x, i) -> "
            "transform(slice(__docs, i + 2, size(__docs) - i - 1), "
            "y -> named_struct('a', x, 'b', y))))")
        return (
            grouped.select(F.explode_outer(F.expr(pairs_expr)).alias("__p"))
            .filter(F.col("__p").isNotNull())
            .groupBy(F.col("__p.a").alias("a"), F.col("__p.b").alias("b"))
            .agg(F.count(F.lit(1)).alias("n_shared_chunks"))
        )
    # max_docs=None: nothing bounds a hot chunk's doc list, so the
    # collect_list spelling would buffer unboundedly — keep the
    # join-based fan-out, whose work is at least spillable/splittable
    a = hits.select(F.col("doc_id").alias("a"), "chunk")
    b = hits.select(F.col("doc_id").alias("b"), "chunk")
    return (
        a.join(b, "chunk")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_shared_chunks"))
    )


def cdc_chunk_array(toks_col: str, w: int = 4, mask: int = 15) -> Column:
    """Row-local content-defined chunking: `cdc_chunks`' segmentation
    computed INSIDE one row with a higher-order fold (no explode, no
    per-doc window) — the spelling Structured Streaming needs, since
    partitioned windows are unsupported on streams. ``toks_col`` must
    be an already-PROJECTED token-array column (trap 3: an inlined
    tokenize would re-evaluate per element inside the lambda). Returns
    array<string>, per document exactly equal to `cdc_chunks`' chunk
    column (equality pinned in tests).

    One expression string, not a chained-Column build (trap 12): the
    fold appends each token to the accumulator's open chunk and closes
    the chunk when md5(last ``w`` tokens) % (mask+1) == 0 — the same
    boundary hash `_md5_int60(ctx, 0)` the batch operator flags, so the
    DuckDB oracle spelling carries over unchanged."""
    m = mask + 1
    ctx = (f"concat_ws(' ', slice({toks_col}, greatest(1, i - {w - 1}), "
           f"least(i, {w})))")
    bnd = (f"cast(conv(substring(md5(concat({ctx}, '#0')), 1, 15), 16, 10) "
           f"as bigint) % {m} = 0")
    zero = ("named_struct('chunks', cast(array() as array<string>), "
            "'cur', cast(array() as array<string>))")
    step = (
        f"(acc, i) -> IF({bnd}, "
        "named_struct('chunks', array_append(acc.chunks, concat_ws(' ', "
        f"array_append(acc.cur, element_at({toks_col}, i)))), "
        "'cur', cast(array() as array<string>)), "
        "named_struct('chunks', acc.chunks, "
        f"'cur', array_append(acc.cur, element_at({toks_col}, i))))"
    )
    fin = ("acc -> IF(size(acc.cur) > 0, "
           "array_append(acc.chunks, concat_ws(' ', acc.cur)), acc.chunks)")
    # sequence(1, 0) counts DOWN (the restructure.py guard): empty or
    # null token arrays short-circuit to an empty chunk list
    return F.expr(
        f"CASE WHEN {toks_col} IS NULL OR size({toks_col}) < 1 "
        "THEN cast(array() as array<string>) "
        f"ELSE aggregate(sequence(1, size({toks_col})), {zero}, {step}, "
        f"{fin}) END")


def excise_dup_windows(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", w: int = 8,
                       min_count: int = 2) -> DataFrame:
    """Substring-dedup CLEAN step — the rewrite half of Lee et al. 2021
    ("Deduplicating Training Data Makes Language Models Better", §4.1
    ExactSubstr): `dup_window_stats` DETECTS duplicated ``w``-token
    spans; this operator removes all but ONE occurrence from the corpus
    and returns the cleaned text. An occurrence of a window repeated
    >= ``min_count`` times (across documents OR within one) is
    KEEP-FIRST canonical iff it holds the group's minimum global order
    key (doc_id, position); every token covered by a NON-canonical
    duplicate occurrence is excised. A canonical occurrence's tokens
    can still fall to a different window's excision (the paper's
    overlapping-span artifact — deterministic, documented). Returns
    (doc_id, clean_text, n_tokens, n_removed); an exact-duplicate
    document cleans to ''.

    Scale shape: one explode (ntokens rows/doc), ONE window-key
    hash-groupBy carrying (count, min ord) with map-side partials, one
    occurrences⋈dup-keys join, a bounded per-occurrence position
    explode (w rows each, true duplicates only), one anti-join on
    (doc, position), and a per-doc ordered reassembly via
    array_sort(collect_list) — partitioned by doc, never a global
    sort. The global order key is doc_id*1_000_000+i, identical in
    the DuckDB oracle (exactly hash-checkable; at petabyte scale the
    window string key becomes xxhash64 as in dup_window_stats)."""
    from deeplake_spark.functions.text import tokenize

    d = ensure_parallelism(df).select(
        F.col(id_col).alias("doc_id"), tokenize(f"`{text_col}`").alias("__t"))
    # guarded index explode (trap 2; sequence counts DOWN past the end).
    # NO null-filter on __i here (r15 opt): explode_outer emits exactly
    # ONE __i=NULL row for a zero-token or NULL-text doc, and keeping it
    # in the persisted relation lets the FINAL aggregate serve as the
    # totals lane too — the former `totals = d.select(size(__t))` branch
    # re-ran the corpus tokenize for nothing but per-doc token counts
    # (guide §2.4 remove passes; plan before/after: Union of 3 tokenize
    # scans + a second doc-keyed join → gone).
    toks = d.selectExpr(
        "doc_id", "__t",
        "explode_outer(CASE WHEN size(__t) >= 1 "
        "THEN sequence(1, size(__t)) END) AS __i")
    win = "concat_ws(' ', " + ",".join(
        f"element_at(__t, __i + {j})" for j in range(w)) + ")"
    rows = _track(toks.selectExpr(
        "doc_id", "__i",
        "element_at(__t, __i) AS __tok",
        f"CASE WHEN __i <= size(__t) - {w - 1} THEN {win} END AS __w",
        "doc_id * 1000000 + __i AS __ord",
        "(__t IS NULL) AS __tn",
    ))  # tracked persist: feeds the dup aggregate, join, and flag side
    occ = rows.filter(F.col("__w").isNotNull())
    dup = (occ.groupBy("__w")
           .agg(F.count(F.lit(1)).alias("__cnt"),
                F.min("__ord").alias("__keep"))
           .filter(F.col("__cnt") >= min_count)
           .select("__w", "__keep"))
    dup_occ = (occ.join(dup, "__w")
               .filter(F.col("__ord") != F.col("__keep"))
               .select("doc_id", "__i"))
    # exc derives from rows — DISTINCT aliases per side before the
    # expression self-join, or the equi-key silently vanishes (trap 20)
    exc = (dup_occ.selectExpr(
        "doc_id AS __xd",
        f"explode_outer(sequence(__i, __i + {w - 1})) AS __xj")
        .filter("__xj IS NOT NULL")
        .distinct())
    # left join + conditional aggregate instead of the former anti-join
    # + separate clean/totals joins: ONE doc-keyed aggregate emits the
    # cleaned text, the kept count AND the token total (the __i=NULL
    # marker row never matches exc — NULL equi-key — and count(__i)
    # skips it, so empty docs report 0 and NULL-text docs NULL exactly
    # as size(__t) did). Values pinned identical by the t35 oracle.
    flagged = rows.select("doc_id", "__i", "__tok", "__tn").join(
        exc, (F.col("doc_id") == F.col("__xd"))
        & (F.col("__i") == F.col("__xj")),
        "left")
    return (flagged.groupBy("doc_id")
            .agg(F.expr("concat_ws(' ', transform(array_sort("
                        "collect_list(CASE WHEN __xj IS NULL "
                        "AND __i IS NOT NULL THEN struct(__i, __tok) "
                        "END)), s -> s.__tok))").alias("clean_text"),
                 F.expr("count(CASE WHEN __xj IS NULL THEN __i END)")
                 .alias("__nk"),
                 F.expr("count(__i)").alias("__ntok"),
                 F.expr("bool_or(__tn)").alias("__tnull"))
            .select("doc_id", "clean_text",
                    F.when(F.col("__tnull"), F.lit(None))
                    .otherwise(F.col("__ntok")).cast("int")
                    .alias("n_tokens"),
                    F.when(F.col("__tnull"), F.lit(None))
                    .otherwise(F.col("__ntok") - F.col("__nk"))
                    .cast("int").alias("n_removed")))


def winnow_fingerprint_pairs(df: DataFrame, text_col: str = "text",
                             id_col: str = "doc_id", k: int = 4,
                             w: int = 4, min_shared: int = 3,
                             max_docs: int | None = 100) -> DataFrame:
    """Winnowing copy detection over a corpus (Schleimer, Wilkerson &
    Aiken 2003 — MOSS; the operator form of the t42 query): per-doc
    distinct window-min fingerprints of k-gram hashes, then doc pairs
    sharing >= ``min_shared`` fingerprints. GUARANTEE: any shared
    token run of length >= w + k - 1 shares at least one fingerprint
    while only ~1/w of positions are stored.

    ``max_docs`` caps the per-fingerprint posting (the t33 boilerplate
    cap): a fingerprint appearing in more than ``max_docs`` documents
    is dropped before the self-join — a header/footer n-gram shared by
    millions of docs would otherwise contribute a quadratic pair
    blow-up while carrying no copy signal. Returns
    (a, b, n_shared_fps) with a < b."""
    from deeplake_spark.functions.text import kgram_hashes, tokenize, winnow

    d = ensure_parallelism(df).select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("__txt"))
    toks = d.select("doc_id", tokenize("__txt").alias("__t"))
    hashed = toks.select("doc_id", kgram_hashes("__t", k)
                         .alias("__h"))
    fps = (hashed
           .select("doc_id",
                   F.explode_outer(winnow("__h", w)).alias("fp"))
           .filter(F.col("fp").isNotNull()))
    if max_docs is None:
        # tracked persist (the jaccard_pairs posting convention): the
        # uncapped fingerprint relation feeds BOTH self-join sides on
        # different keys, so nothing reuses across them (trap 27: the
        # executed t42 plan ran 2 tokenize+kgram+winnow passes). One
        # fill — interleaved x6 A/B: med 0.99 -> 0.85 s, wins every
        # quantile. The CAPPED path measured the OPPOSITE (r16
        # four-variant A/B: none 1.18 med vs fps-persist 1.59 /
        # kept-persist 1.58 / both 1.29): its three passes overlap
        # inside one job while a persist serializes a fill barrier —
        # same economics as the rejected t28/t33 persists — so the
        # cap branch below stays recompute-shaped.
        fps = _track(fps)
    if max_docs is None:
        kept = fps  # uncapped (the exactly-oracled t42 lane)
    else:
        bounded = (fps.groupBy("fp")
                   .agg(F.count(F.lit(1)).alias("__df"))
                   .filter(F.col("__df") <= int(max_docs))
                   .select("fp"))
        kept = fps.join(bounded, "fp")
    left = kept.select(F.col("doc_id").alias("a"),
                       F.col("fp").alias("__f1"))
    right = kept.select(F.col("doc_id").alias("b"),
                        F.col("fp").alias("__f2"))
    return (left.join(right, (F.col("__f1") == F.col("__f2"))
                      & (F.col("a") < F.col("b")))
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("n_shared_fps"))
            .filter(F.col("n_shared_fps") >= int(min_shared)))


def minhash_cross_pairs(left: DataFrame, right: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        n: int = 3, num_perm: int = 32, bands: int = 8,
                        threshold: float = 0.35) -> DataFrame:
    """FUZZY cross-corpus decontamination — the near-duplicate
    complement of `contamination_hits`' exact n-gram check (the
    Llama-style fuzzy train/eval overlap sweep): MinHash-LSH candidate
    pairs BETWEEN two corpora. Both sides shingle → sign → band; the
    bucket join is LEFT x RIGHT on (band, band-hash) — never a
    self-join, never a cross join — and candidates get exact-Jaccard
    verification (threshold on the UNROUNDED value, repo convention).
    Returns (a = left id, b = right id, jaccard).

    Scale shape: the eval/right side is typically tiny next to the
    training corpus, so its banded relation and shingle sets are
    broadcast — the corpus makes one signing pass and shuffles only
    colliding candidates. At threshold=1.0 recall is provably 1 for
    ANY signature hash (identical shingle sets → identical signatures
    → collide in every band), which is what makes the registered t36
    query exactly oracle-checkable; production thresholds (<1) are
    recall-gated in tests."""
    rows = num_perm // bands
    lsets = _track(shingle_sets(left, text_col, id_col, n))
    rsets = _track(shingle_sets(right, text_col, id_col, n))
    band_sql = ",".join(
        f"hash(cast(cast(slice(sig, {b * rows + 1}, {rows}) "
        "as array<string>) as string))"
        for b in range(bands))

    def banded(sets: DataFrame, out: str) -> DataFrame:
        return minhash_signatures(sets, num_perm).select(
            F.col("doc_id").alias(out),
            F.posexplode(F.expr(f"array({band_sql})")).alias("band", "bh"))

    cands = (banded(lsets, "a")
             .join(F.broadcast(banded(rsets, "b")), ["band", "bh"])
             .select("a", "b").distinct())
    sa = lsets.select(F.col("doc_id").alias("a"),
                      F.col("shingles").alias("sha"))
    sb = rsets.select(F.col("doc_id").alias("b"),
                      F.col("shingles").alias("shb"))
    jacc = (F.size(F.array_intersect("sha", "shb"))
            / F.size(F.array_union("sha", "shb")).cast("double"))
    return (cands.join(sa, "a").join(F.broadcast(sb), "b")
            .filter(jacc >= threshold)
            .select("a", "b", F.round(jacc, 6).alias("jaccard")))


def dedup_corpus_lines(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       sep: str = "\n") -> DataFrame:
    """Corpus-global line deduplication — the C4 cleanup step (Raffel
    et al. 2020 §2.2: "we removed all but one of any three-sentence
    span occurring more than once", here at line granularity): every
    non-blank line keeps only its FIRST occurrence corpus-wide
    (ordered by (doc id, position)); later copies are dropped and each
    document is reassembled in original line order. Blank (space-only)
    lines pass through — they carry layout, not content. Returns
    (id, n_lines, n_dropped, text).

    100 TB shape: keep-first is a line-keyed AGGREGATE of
    min(struct(id, pos)) — partial-aggregated, so a boilerplate line
    repeated in millions of documents combines map-side instead of
    funneling through one window partition (no window over data at
    all) — then one line-keyed join back (AQE skew-join splits the hot
    line's join partition; real inputs have many mappers, trap 17) and
    one doc-keyed ordered fold (the render_chat convention)."""
    df = ensure_parallelism(df)
    # NULL text coalesces to "" so the document still yields one blank
    # line and SURVIVES in the output (r14 review: the null-filter
    # below would otherwise erase the whole document); the exploded
    # relation feeds both the keepers aggregate and the join left
    # side, so it is persisted once via the module's tracked-cache
    # convention instead of re-splitting the corpus twice.
    lines = _track(df.select(
        F.col(id_col),
        F.posexplode_outer(
            F.split(F.coalesce(F.col(text_col), F.lit("")),
                    "\\Q" + sep + "\\E"))
        .alias("__pos", "__line"))
        .filter(F.col("__line").isNotNull()))
    cand = lines.filter(F.trim(F.col("__line")) != "")
    keepers = cand.groupBy("__line").agg(
        F.min(F.struct(F.col(id_col).alias("d"),
                       F.col("__pos").alias("p"))).alias("__k"))
    marked = (lines.join(keepers, "__line", "left")
              .withColumn(
                  "__keep",
                  F.col("__k").isNull()  # blank: not a dedup candidate
                  | ((F.col("__k.d") == F.col(id_col))
                     & (F.col("__k.p") == F.col("__pos")))))
    kept_struct = F.when(F.col("__keep"), F.struct(
        F.col("__pos").alias("i"), F.col("__line").alias("s")))
    return (marked.groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("int").alias("n_lines"),
                 F.sum((~F.col("__keep")).cast("int")).cast("int")
                 .alias("n_dropped"),
                 F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(kept_struct)),
                         lambda t: t["s"]),
                     sep).alias(text_col)))
