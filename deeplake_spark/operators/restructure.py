"""GROUP BY (sequence packing), UNGROUP BY (explode), EXPAND BY
(tiling) — TQL's restructuring operators (SURVEY §2.6).

Semantic note (the trap called out in SURVEY's hard-parts list): TQL
`GROUP BY` packs rows into *sequence rows* — reference
`cpp/query_core/group_statement.hpp:15-112`, views
`heimdall_common/group_dataset.hpp`, `sequence_dataset.hpp`,
tql.md:389-397 — it is NOT scalar aggregation. `UNGROUP BY split`
explodes sequences back (`ungroup_statement.hpp:15-116`); `EXPAND BY
h w [OVERLAP]` tiles image cells into patch rows
(`spatial_dataset.hpp:18`, tql.md:368-386).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def group_runs(df: DataFrame, keys: list[str], order_cols: list[str],
               payload_cols: list[str]) -> DataFrame:
    """GROUP BY k ACROSS TIME: pack *consecutive runs* of equal keys
    into sequence rows (video-from-frames), not all equal-key rows —
    the across_type_t distinction in group_statement.hpp:15-19.

    Two-pass boundary-stitch (no unpartitioned window — a global lag
    window funnels every row through one task at 100 TB):

    1. Range-partition by the order columns (parallel sort); detect
       runs with lag/cumsum windows PARTITIONED by the physical
       partition id — each task only sees its own range.
    2. Stitch boundaries on a one-row-per-partition summary relation
       (first/last key tuple + local run count): a partition whose
       first key equals its predecessor's last key merges its run 0
       into the predecessor's last run. Global run id = local id +
       cumsum(prev run counts) - cumsum(boundary merges). The summary
       windows are unpartitioned but run over at most #partitions rows
       (cluster-bounded, like IVF centroid metadata) — never data.
    """
    from pyspark.sql.window import Window

    sorted_df = df.orderBy(*order_cols).withColumn("__gpid", F.spark_partition_id())
    wp = Window.partitionBy("__gpid").orderBy(*order_cols)
    changed = F.lit(False)
    for k in keys:
        # Wrap in a struct so "no previous row" (struct NULL) is
        # distinguishable from "previous key is NULL" (field NULL);
        # eqNullSafe makes NULL a key value like any other, so NULL→X
        # and X→NULL both start a new run (symmetric semantics).
        prev = F.lag(F.struct(F.col(k).alias("v"))).over(wp)
        changed = changed | prev.isNull() | ~prev["v"].eqNullSafe(F.col(k))
    local_run = F.sum(changed.cast("long")).over(
        wp.rowsBetween(Window.unboundedPreceding, 0)
    ) - 1
    tagged = sorted_df.withColumn("__lrun", local_run)

    key_struct = F.struct(*[F.col(c) for c in order_cols],
                          *[F.col(k) for k in keys if k not in order_cols])

    def _keys_of(s: Column) -> Column:
        return F.struct(*[s[k] for k in keys])

    summary = tagged.groupBy("__gpid").agg(
        (F.max("__lrun") + 1).alias("__nruns"),
        _keys_of(F.min(key_struct)).alias("__firstk"),
        _keys_of(F.max(key_struct)).alias("__lastk"),
    )
    ws = Window.orderBy("__gpid")
    offsets = (
        summary.withColumn(
            "__merge",
            F.col("__firstk").eqNullSafe(F.lag("__lastk").over(ws)).cast("long"),
        )
        .withColumn(
            "__off",
            F.coalesce(
                F.sum("__nruns").over(ws.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            )
            - F.sum("__merge").over(ws.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .select("__gpid", "__off")
    )
    stitched = (
        tagged.join(F.broadcast(offsets), "__gpid")
        .withColumn("__run", F.col("__lrun") + F.col("__off"))
        .drop("__gpid", "__lrun", "__off")
    )
    out = group_sequences(stitched, keys + ["__run"], order_cols, payload_cols)
    return out.withColumnRenamed("__run", "run_id")


def group_sequences(df: DataFrame, keys: list[str], order_cols: list[str],
                    payload_cols: list[str]) -> DataFrame:
    """Pack rows into sequence rows: one output row per key combo, each
    payload column becomes an ordered array.

    collect_list has no intra-group order guarantee, so elements are
    collected as (order…, payload…) structs and sorted in the array —
    deterministic at any parallelism (no global sort needed).
    """
    # order cols lead the struct (array_sort compares field-by-field);
    # a payload col that IS an order col is not duplicated — extraction
    # below is by field name either way
    struct_names = list(order_cols) + [c for c in payload_cols if c not in order_cols]
    packed = F.array_sort(F.collect_list(F.struct(*[F.col(c) for c in struct_names])))
    aggs = [F.count(F.lit(1)).alias("seq_len"), packed.alias("__packed")]
    out = df.groupBy(*keys).agg(*aggs)
    def _field(name):
        # NB: a `lambda s, name=name:` default-arg closure would have
        # arity 2, which F.transform interprets as (element, index)
        return lambda s: s[name]

    for c in payload_cols:
        out = out.withColumn(f"{c}_seq", F.transform(F.col("__packed"), _field(c)))
    return out.drop("__packed")


def ungroup(df: DataFrame, seq_cols: list[str], keep_cols: list[str],
            pos_col: str = "pos") -> DataFrame:
    """Explode sequence rows back to element rows with a position column
    (UNGROUP BY split). Multiple parallel sequence columns are zipped
    positionally (arrays_zip) — matching the reference's element-wise
    ungroup of a sequence row."""
    zipped = F.arrays_zip(*[F.col(c) for c in seq_cols])
    out = df.select(*keep_cols, F.posexplode(zipped).alias(pos_col, "__elem"))
    for c in seq_cols:
        out = out.withColumn(c.removesuffix("_seq"), F.col("__elem")[c])
    return out.drop("__elem")


def expand_tiles(df: DataFrame, image_col: str, tile_h: int, tile_w: int,
                 overlap: bool = False, keep_cols: list[str] | None = None) -> DataFrame:
    """EXPAND BY h w [OVERLAP]: tile 2-D cells (array<array<numeric>>)
    into patch rows. Stride = tile size, or half-tile when OVERLAP
    (sliding window), mirroring tql.md:368-386.

    Pure generator expression: nested transform builds the patch list
    per row, explode emits one row per patch — a UDTF with zero Python.
    """
    keep_cols = keep_cols or [c for c in df.columns if c != image_col]
    img = F.col(image_col)
    n_rows = F.size(img)
    n_cols = F.size(F.element_at(img, 1))
    stride_h = max(1, tile_h // 2) if overlap else tile_h
    stride_w = max(1, tile_w // 2) if overlap else tile_w

    def patch(r0: Column, c0: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(0), F.lit(tile_h - 1)),
            lambda dr: F.transform(
                F.sequence(F.lit(0), F.lit(tile_w - 1)),
                lambda dc: F.element_at(
                    F.element_at(img, (r0 + dr + 1).cast("int")), (c0 + dc + 1).cast("int")
                ),
            ),
        )

    tiles = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.floor((n_rows - tile_h) / stride_h).cast("int")),
            lambda ri: F.transform(
                F.sequence(F.lit(0), F.floor((n_cols - tile_w) / stride_w).cast("int")),
                lambda ci: F.struct(
                    (ri * stride_h).cast("int").alias("tile_row"),
                    (ci * stride_w).cast("int").alias("tile_col"),
                    patch(ri * stride_h, ci * stride_w).alias("tile"),
                ),
            ),
        )
    )
    # explode_outer + OUTPUT null-filter: a plain explode would let
    # Catalyst infer `size(tiles) > 0` on the generator input and push
    # the whole tile-construction expression (inlined, re-evaluated)
    # into the scan (CLAUDE.md trap 2)
    return (
        df.select(*keep_cols, F.explode_outer(tiles).alias("__t"))
        .filter(F.col("__t").isNotNull())
        .select(
            *keep_cols,
            F.col("__t.tile_row").alias("tile_row"),
            F.col("__t.tile_col").alias("tile_col"),
            F.col("__t.tile").alias("tile"),
        )
    )


def split_sequences(df: DataFrame, seq_col: str, chunk_len: int | None = None,
                    n_chunks: int | None = None, keep_cols: list[str] | None = None) -> DataFrame:
    """UNGROUP BY split-variants: split each sequence cell into chunk
    rows — by fixed chunk length or into n equal chunks (reference
    `ungroup_statement.hpp:15-116` split by axis/number/lengths).

    Pure generator: sequence of chunk starts → slice per chunk →
    posexplode; one row per chunk, no Python."""
    if (chunk_len is None) == (n_chunks is None):
        raise ValueError("exactly one of chunk_len / n_chunks required")
    keep_cols = keep_cols or [c for c in df.columns if c != seq_col]
    arr = F.col(seq_col)
    n = F.size(arr)
    size = F.lit(chunk_len) if chunk_len else F.ceil(n / n_chunks).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), F.ceil(n / size).cast("int") - 1),
        lambda i: F.slice(arr, (i * size + 1).cast("int"), size.cast("int")),
    )
    return (
        df.withColumn("__chunks", F.when(n > 0, chunks).otherwise(F.array()))
        .select(*keep_cols, F.posexplode_outer("__chunks").alias("chunk_index", "chunk"))
        .filter(F.col("chunk").isNotNull())
    )


def pack_token_budget(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", budget: int = 512,
                      merges: list | None = None) -> DataFrame:
    """Token-budget sequence packing for LM training: concatenate
    documents in id order and chunk the stream into fixed-budget
    training sequences (each doc lands in the sequence where its first
    token falls). Beyond-reference pipeline operator — the batch
    analogue of r01's GROUP BY sequence packing.

    Scale shape: the global running token count is computed WITHOUT an
    unpartitioned window (a ``sum().over(orderBy)`` would funnel the
    whole table through one task): range-partition by id, a
    per-partition running sum (partitioned window), then shift each
    partition by the cumulative totals of the partitions before it —
    a one-row-per-partition relation, broadcast back.

    Returns one row per packed sequence: (seq_id, n_docs, total_tokens,
    first_doc, last_doc). With ``merges`` (a trained BPE merge table,
    operators.bpe.train_bpe) the budget counts EXACT subword tokens —
    what the training run will actually see — instead of whitespace
    words.
    """
    from pyspark.sql.window import Window

    from deeplake_spark.functions.text import token_count

    if merges is not None:
        from deeplake_spark.operators.bpe import bpe_token_count

        d = bpe_token_count(df, merges, text_col, "n_tok").select(
            F.col(id_col).alias("doc_id"), "n_tok")
    else:
        d = df.select(F.col(id_col).alias("doc_id"),
                      token_count(F.col(text_col)).alias("n_tok"))
    tagged = d.repartitionByRange(F.col("doc_id")).withColumn(
        "__pid", F.spark_partition_id())
    offsets = (
        tagged.groupBy("__pid").agg(F.sum("n_tok").alias("__ptok"))
        .withColumn(
            "__off",
            F.coalesce(
                F.sum("__ptok").over(
                    Window.orderBy("__pid")
                    .rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0)),
        )
        .select("__pid", "__off")
    )
    wp = (Window.partitionBy("__pid").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1))
    cum = (
        tagged.join(F.broadcast(offsets), "__pid")
        .withColumn("__cum_before",
                    F.coalesce(F.sum("n_tok").over(wp), F.lit(0)) + F.col("__off"))
    )
    return (
        cum.withColumn("seq_id", F.floor(F.col("__cum_before") / budget))
        .groupBy("seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("total_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


def chunk_fixed_tokens(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", chunk: int = 32,
                       merges: list | None = None) -> DataFrame:
    """Fixed-length context chunking for LM training: split each
    document's token stream into consecutive ``chunk``-token training
    examples (the per-document analogue of pack_token_budget's
    cross-document packing, and the text analogue of EXPAND BY's image
    tiling). Returns one row per chunk: (doc_id, chunk_idx, n_tokens,
    chunk_text) — the tail chunk keeps its partial length.

    Scale shape: pure per-row generation — tokenize is PROJECTED to a
    column before use (perf trap #3: an inlined tokenize re-evaluates
    per generated element), the chunk-index generator is explode_outer
    + an output null-filter (trap #2: F.explode lets Catalyst push a
    size>0 predicate, tokenize inlined, below the repartition to the
    scan), and the chunk text is assembled with try_element_at +
    concat_ws (trap #6: compiles ~6x cheaper than slice+array_join;
    try_ because ANSI element_at throws past the end — concat_ws
    skips the tail's nulls). No shuffle, no window, no driver action.
    """
    from deeplake_spark.functions.text import tokenize
    from deeplake_spark.io import ensure_parallelism

    if merges is not None:
        # exact-BPE chunking: boundaries fall in SUBWORD-token space
        # (what the model consumes); chunk_text reassembles losslessly
        # by symbol concat, `</w>` -> space (bpe.bpe_detokenize)
        from deeplake_spark.operators.bpe import bpe_tokenize

        d = bpe_tokenize(df, merges, text_col, "__toks").select(
            F.col(id_col), "__toks")
        joiner = "''"
    else:
        d = ensure_parallelism(df).select(
            F.col(id_col), tokenize(f"`{text_col}`").alias("__toks"))
        joiner = "' '"
    n = F.size(F.col("__toks"))
    nchunks = F.ceil(n / F.lit(float(chunk))).cast("int")
    # guard: sequence(0, -1) counts DOWN in Spark — only generate for
    # non-empty token streams, explode_outer + output filter otherwise
    idxs = F.when(n > 0, F.sequence(F.lit(0), nchunks - 1))
    with_idx = (
        d.select(F.col(id_col), "__toks", n.alias("__n"),
                 F.explode_outer(idxs).alias("chunk_idx"))
        .filter(F.col("chunk_idx").isNotNull())
    )
    base = F.col("chunk_idx") * chunk
    # one parsed expression — see operators/dedup.bit_vote_sums on the
    # driver-side cost of chained-Column construction
    text_expr = F.expr(f"concat_ws({joiner}, " + ",".join(
        f"try_element_at(__toks, chunk_idx * {chunk} + {j})"
        for j in range(1, chunk + 1)) + ")")
    if merges is not None:
        from deeplake_spark.operators.bpe import END

        text_expr = F.trim(F.regexp_replace(text_expr, END, " "))
    return with_idx.select(
        F.col(id_col),
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.least(F.lit(chunk), F.col("__n") - base).cast("int").alias("n_tokens"),
        text_expr.alias("chunk_text"),
    )


#: Chat-template presets (r14 verdict #7): real SFT corpora ship
#: templates where the ROLE is part of the marker syntax, not a
#: "Role:" prefix. "colon" is the literal-marker default; "llama"
#: maps the [INST]/[/INST]/<<SYS>>/<</SYS>> markers to fixed roles
#: (the Llama-2 chat format -- blank segments between adjacent markers
#: are template plumbing and drop); "chatml" is handled structurally
#: (<|im_start|>role\n...<|im_end|> -- the role is a capture, not an
#: enumerable marker).
_CHAT_TEMPLATES: dict = {
    "colon": {"markers": ("User:", "Assistant:", "System:")},
    "llama": {"markers": ("[INST]", "[/INST]", "<<SYS>>", "<</SYS>>"),
              "marker_roles": {"[INST]": "user", "[/INST]": "assistant",
                               "<<SYS>>": "system", "<</SYS>>": "user"},
              "strip_tokens": ("<s>", "</s>"), "drop_blank": True},
    "chatml": {"structural": "chatml"},
}
_WS_TRIM = "^[ \t\n\f\r]+|[ \t\n\f\r]+\\z"


def split_chat_turns(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     markers: tuple[str, ...] | None = None,
                     template: str | None = None,
                     marker_roles: dict | None = None) -> DataFrame:
    """Chat-transcript segmentation - the SFT-data prep step: a flat
    dialogue string splits into one row per turn with
    (id, turn_idx, role, content). A turn starts at any marker in
    ``markers`` (default ``("User:", "Assistant:")``); the role comes
    from ``marker_roles`` when given (markers it doesn't cover fall
    back to the default), else the marker lowercased without the
    colon; text before the first marker is dropped (transcript
    headers). Explicit ``markers``/``marker_roles`` OVERRIDE a
    ``template`` preset's values (the preset fills what the caller
    leaves unset); "chatml" derives roles structurally, so passing
    either alongside it raises.

    ``template`` presets the real-world formats where the role is part
    of the marker SYNTAX: "colon" (the default markers), "llama"
    ([INST]/[/INST]/<<SYS>>/<</SYS>> -> user/assistant/system; <s>/</s>
    BOS/EOS tokens stripped from content; blank between-marker
    segments -- template plumbing like a <</SYS>> separator whose text
    already belongs to another marker -- drop), and "chatml"
    (<|im_start|>ROLE\\n...<|im_end|>, the role CAPTURED from the turn
    header rather than enumerated). render_chat(template=) is the
    inverse; round-trip tests pin each preset.

    Engine-exact: marker insertion is a regexp_replace to a \\x01
    separator, split + posexplode_outer (+ null filter - trap 2), and
    a per-document PARTITIONED window renumbers surviving turns. At
    100 TB this is a scan-side per-row expression plus one
    document-keyed window - no corpus shuffle beyond the id key."""
    from pyspark.sql.window import Window

    drop_blank = False
    strip_tokens: tuple = ()
    if template is not None:
        if template not in _CHAT_TEMPLATES:
            raise ValueError(f"unknown chat template {template!r}; "
                             f"one of {sorted(_CHAT_TEMPLATES)}")
        preset = _CHAT_TEMPLATES[template]
        if preset.get("structural") == "chatml":
            if markers is not None or marker_roles is not None:
                raise ValueError(
                    "template='chatml' derives roles structurally; "
                    "markers/marker_roles do not apply")
            return _split_chatml(df, text_col, id_col)
        # explicit args win; the preset fills what the caller left
        # unset (r15 review: the preset used to silently DISCARD an
        # explicit markers/marker_roles argument)
        if markers is None:
            markers = preset["markers"]
        if marker_roles is None:
            marker_roles = preset.get("marker_roles")
        strip_tokens = preset.get("strip_tokens", ())
        drop_blank = preset.get("drop_blank", False)
    if markers is None:
        markers = ("User:", "Assistant:")

    sep = "\u0001"
    # Markers are literal text: \Q...\E-quote each one so regex
    # metacharacters ("[INST]", "Q.") match literally in every stage
    # (regexp_replace, rlike, and the strip below) -- ADVICE r13.
    pattern = "(" + "|".join("\\Q" + m + "\\E" for m in markers) + ")"
    marked = F.regexp_replace(F.col(text_col), pattern, sep + "$1")
    parts = df.select(
        F.col(id_col),
        F.posexplode_outer(F.split(marked, sep)).alias("__pos", "__part"))
    turns = parts.filter(
        F.col("__part").isNotNull()
        & F.col("__part").rlike("^" + pattern))
    role = None
    for m in markers:
        cond = F.col("__part").startswith(m)
        # a partial marker_roles falls back per-marker (was a bare
        # KeyError at plan-build time, r15 review)
        lab = F.lit(marker_roles.get(m, m.rstrip(":").lower())
                    if marker_roles else m.rstrip(":").lower())
        role = F.when(cond, lab) if role is None else role.when(cond, lab)
    content = F.regexp_replace(F.col("__part"), "^" + pattern, "")
    if strip_tokens:
        content = F.regexp_replace(
            content,
            "|".join("\\Q" + t + "\\E" for t in strip_tokens), "")
    # whitespace-trim, not just space-trim: turns in real transcripts
    # are newline-separated (render_chat's round-trip pins this).
    # Explicit char class, not \s (Java \s includes \x0B, RE2's does
    # not), and \z, not $ (Java $ also matches before a FINAL line
    # terminator like U+2028; RE2's does not) -- this exact spelling
    # is what the DuckDB oracles replay.
    content = F.regexp_replace(content, _WS_TRIM, "")
    turns = turns.withColumn("__role", role).withColumn("__c", content)
    if drop_blank:
        turns = turns.filter(F.col("__c") != "")
    w = Window.partitionBy(id_col).orderBy("__pos")
    return (turns
            .withColumn("__t", F.row_number().over(w))
            .select(
                F.col(id_col),
                (F.col("__t") - 1).cast("int").alias("turn_idx"),
                F.col("__role").alias("role"),
                F.col("__c").alias("content")))


def _split_chatml(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """ChatML segmentation (<|im_start|>role\\n ... <|im_end|>): the
    role is CAPTURED from the turn header (first line after
    <|im_start|>), content runs to the turn's <|im_end|> -- text after
    it (separators before the next <|im_start|>) is template plumbing
    and drops. Same engine shape as the literal-marker path."""
    from pyspark.sql.window import Window

    sep = "\u0001"
    start = "\\Q<|im_start|>\\E"
    marked = F.regexp_replace(F.col(text_col), "(" + start + ")",
                              sep + "$1")
    parts = df.select(
        F.col(id_col),
        F.posexplode_outer(F.split(marked, sep)).alias("__pos", "__part"))
    turns = parts.filter(
        F.col("__part").isNotNull() & F.col("__part").rlike("^" + start))
    body = F.regexp_replace(F.col("__part"), "^" + start, "")
    # Cut the turn at <|im_end|> FIRST ((?s) so embedded newlines stay
    # inside), THEN split role (header line) from content: a loosely
    # formatted turn with no newline after the role
    # ("<|im_start|>user hi<|im_end|>") must not leak the end marker
    # into the role column (r15 review). The t53 oracle replays this
    # exact order.
    zone = F.regexp_replace(body, "(?s)\\Q<|im_end|>\\E.*", "")
    role = F.regexp_extract(zone, "^([^\n]*)", 1)
    content = F.regexp_replace(zone, "^[^\n]*\n?", "")
    w = Window.partitionBy(id_col).orderBy("__pos")
    return (turns
            .withColumn("__t", F.row_number().over(w))
            .select(
                F.col(id_col),
                (F.col("__t") - 1).cast("int").alias("turn_idx"),
                F.regexp_replace(role, _WS_TRIM, "").alias("role"),
                F.regexp_replace(content, _WS_TRIM, "").alias("content")))


def render_chat(turns: DataFrame, id_col: str = "doc_id",
                role_col: str = "role", content_col: str = "content",
                order_col: str = "turn_idx",
                role_sep: str = ": ", turn_sep: str = "\n",
                template: str | None = None) -> DataFrame:
    """Inverse of :func:`split_chat_turns` — the SFT template-rendering
    step: turn rows (id, turn_idx, role, content) fold back into ONE
    canonical training string per conversation,
    ``role + role_sep + content`` joined by ``turn_sep`` in turn
    order. Returns (id, n_turns, rendered).

    ``template`` renders the preset formats instead of the raw
    ``role + role_sep`` lines: "colon" emits ``initcap(role):`` line
    prefixes (``User: hi``) so ``split_chat_turns(template='colon')``
    re-derives the exact turn rows — the template=None default keeps
    the role verbatim and is NOT the colon preset's inverse (its
    lowercase prefixes don't match the preset's markers); "chatml"
    emits ``<|im_start|>role\\ncontent<|im_end|>`` per turn and
    round-trips for any role; "llama" emits ``[INST] c [/INST]`` for
    user turns, ``<<SYS>>\\nc\\n<</SYS>>`` for system, the bare
    content for assistant, and RAISES on any other role (the marker
    syntax cannot represent it — silently rendering it markerless
    would merge it into a neighbor on re-split). Llama round-trips
    only for conversations alternating user/assistant (optional
    leading system): an assistant-FIRST turn renders before any
    marker and is dropped on re-split, and consecutive assistant
    turns merge — inherent to the format, not repairable here.
    NULL content renders as '' (counted in n_turns; a NULL line would
    otherwise be silently dropped by array_join and desync the two).

    Engine-exact without an ordered string aggregate (Spark has no
    string_agg ... ORDER BY): collect_list of (turn_idx, line) structs,
    array_sort (struct ordering = field order, turn_idx first — a
    total order since turn_idx is unique per doc), transform to the
    line, array_join. All JVM built-ins; at 100 TB this is one
    doc-keyed aggregate — the same single shuffle a GROUP BY costs,
    with per-doc state bounded by conversation length."""
    content = F.coalesce(F.col(content_col), F.lit(""))
    if template is None:
        line = F.concat(F.col(role_col), F.lit(role_sep), content)
    elif template == "colon":
        # initcap'd role prefix ("User: hi") so the colon SPLIT
        # preset's markers re-match on re-split — the round-trip the
        # docstrings promise (r15 review: the stored lowercase role
        # rendered prefixes no colon marker matched)
        line = F.concat(F.initcap(F.col(role_col)), F.lit(role_sep),
                        content)
    elif template == "chatml":
        line = F.concat(F.lit("<|im_start|>"), F.col(role_col),
                        F.lit("\n"), content, F.lit("<|im_end|>"))
    elif template == "llama":
        # an unrepresentable role raises instead of rendering bare
        # content that merges into a neighbor on re-split (r15 review)
        line = (F.when(F.col(role_col) == "user",
                       F.concat(F.lit("[INST] "), content,
                                F.lit(" [/INST]")))
                .when(F.col(role_col) == "system",
                      F.concat(F.lit("<<SYS>>\n"), content,
                               F.lit("\n<</SYS>>")))
                .when(F.col(role_col) == "assistant", content)
                .otherwise(F.raise_error(F.concat(
                    F.lit("render_chat(template='llama'): role "),
                    F.coalesce(F.col(role_col), F.lit("NULL")),
                    F.lit(" has no marker in the llama format")))))
    else:
        raise ValueError(f"unknown chat template {template!r}; "
                         f"one of ['chatml', 'colon', 'llama']")
    packed = turns.select(
        F.col(id_col),
        F.struct(F.col(order_col).alias("i"), line.alias("s")).alias("__t"))
    return (packed.groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("int").alias("n_turns"),
                 F.array_join(
                     F.transform(F.array_sort(F.collect_list("__t")),
                                 lambda t: t["s"]),
                     turn_sep).alias("rendered")))
