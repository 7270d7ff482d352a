"""Property-based tests (hypothesis): TQL dialect primitives checked
against independent reference implementations — glob translation vs
fnmatch, python-slice semantics vs Python, lexer/parser robustness
(random input either parses or raises TQLSyntaxError, never crashes)."""

from __future__ import annotations

import fnmatch
import re

import pytest

from hypothesis import given, settings
from hypothesis import strategies as st

from deeplake_spark.functions.text import glob_to_rlike
from deeplake_spark.tql.lexer import TQLSyntaxError
from deeplake_spark.tql.parser import parse_query

_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=20
)


@given(pattern=_text, value=_text)
@settings(max_examples=300, deadline=None)
def test_glob_matches_fnmatch(pattern, value):
    """Our glob→regex translation must agree with fnmatch for patterns
    without character classes (TQL glob has only * and ?)."""
    if "[" in pattern or "]" in pattern:
        return  # TQL glob has no [] classes; fnmatch treats them specially
    rx = glob_to_rlike(pattern)
    ours = re.fullmatch(rx[1:-1], value) is not None  # strip our ^$ anchors
    theirs = fnmatch.fnmatchcase(value, pattern)
    assert ours == theirs, (pattern, value, rx)


@given(
    arr=st.lists(st.integers(-100, 100), max_size=12),
    start=st.integers(-15, 15),
    stop=st.integers(-15, 15),
)
@settings(max_examples=60, deadline=None)
def test_array_slice_matches_python(spark_global, arr, start, stop):
    """col[a:b] must equal Python list slicing (step=1)."""
    from pyspark.sql import functions as F

    from deeplake_spark.functions.arrays import array_slice

    spark = spark_global
    df = spark.createDataFrame([(arr,)], "a: array<int>")
    got = df.select(array_slice(F.col("a"), start, stop).alias("s")).head().s
    assert list(got) == arr[start:stop], (arr, start, stop)


@given(q=st.text(max_size=60))
@settings(max_examples=300, deadline=None)
def test_parser_never_crashes(q):
    """Arbitrary input: parse_query either succeeds or raises
    TQLSyntaxError/ValueError — never an unhandled exception."""
    try:
        parse_query(q)
    except (TQLSyntaxError, ValueError):
        pass


@given(
    toks=st.lists(st.sampled_from(["a", "bb", "ccc", "dd"]), min_size=0, max_size=10),
    n=st.integers(1, 4),
)
@settings(max_examples=40, deadline=None)
def test_shingles_match_python(spark_global, toks, n):
    from pyspark.sql import functions as F

    from deeplake_spark.functions.text import word_shingles

    spark = spark_global
    df = spark.createDataFrame([(toks,)], "t: array<string>")
    got = list(df.select(word_shingles(F.col("t"), n).alias("s")).head().s)
    expected = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    assert got == expected, (toks, n)


@given(
    data=st.data(),
    n_base=st.integers(2, 5),
)
@settings(max_examples=8, deadline=None)
def test_merge_matches_model(spark_global, tmp_path_factory, data, n_base):
    """Three-way merge vs an independent Python model of the documented
    semantics: random divergent edits on two branches, merged with
    resolve='theirs'. Checks surviving row ids, values, and the
    renumbering of the other branch's appends."""
    import deeplake_spark.dataset as dl
    from deeplake_spark import types as dt

    ops_strategy = st.lists(
        st.tuples(st.sampled_from(["append", "update", "delete"]),
                  st.integers(0, 10_000)),
        max_size=4,
    )

    path = str(tmp_path_factory.mktemp("mergeprop")) + "/ds"
    spark = spark_global
    ds = dl.create(path, spark, schema={"x": dt.Generic("int64")})
    ds.append([{"x": i} for i in range(n_base)])
    ds.commit("base")
    base_max = n_base - 1

    def apply_ops(handle, ops, next_id, tag):
        """Apply ops; return (model_edits, appends, deletes) keyed by row id."""
        edits, appends, deletes = {}, {}, set()
        live_shared = list(range(n_base))
        own = []
        for kind, arg in ops:
            if kind == "append":
                val = 1000 + arg
                handle.append([{"x": val}])
                appends[next_id] = val
                own.append(next_id)
                next_id += 1
            elif kind == "update":
                targets = live_shared + own
                if not targets:
                    continue
                rid = targets[arg % len(targets)]
                val = 2000 + arg
                handle.update(rid, {"x": val})
                if rid in appends:
                    appends[rid] = val
                else:
                    edits[rid] = val
            elif kind == "delete" and live_shared:
                rid = live_shared.pop(arg % len(live_shared))
                handle.delete(rid)
                deletes.add(rid)
        handle.commit(tag)
        return edits, appends, deletes

    dev = ds.branch("dev")
    their_ops = data.draw(ops_strategy, label="their_ops")
    t_edits, t_appends, t_deletes = apply_ops(dev, their_ops, n_base, "dev")

    main = dl.open(path, spark, branch="main")
    our_ops = data.draw(ops_strategy, label="our_ops")
    o_edits, o_appends, o_deletes = apply_ops(main, our_ops, n_base, "main")

    main.merge("dev", resolve="theirs")
    got = {r._row_id: r.x for r in main.to_df().collect()}

    # --- independent model -------------------------------------------
    expected = {}
    their_touch = set(t_edits) | t_deletes
    for i in range(n_base):
        if i in their_touch:  # theirs wins on conflict; applies otherwise too
            if i in t_deletes:
                continue
            expected[i] = t_edits[i]
        elif i in o_deletes:
            continue
        elif i in o_edits:
            expected[i] = o_edits[i]
        else:
            expected[i] = i
    expected.update(o_appends)  # our appends keep their ids
    shift = max([base_max] + list(o_appends)) - base_max
    for rid, val in t_appends.items():
        expected[rid + shift] = val  # their appends renumber past our max
    assert got == expected, (their_ops, our_ops, got, expected)


@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdefg"), min_size=0, max_size=12),
        min_size=1, max_size=8,
    ),
    w=st.integers(min_value=2, max_value=4),
)
@settings(max_examples=15, deadline=None)
def test_dup_window_stats_matches_python_model(spark_global, docs, w):
    from deeplake_spark.operators.dedup import dup_window_stats

    texts = [" ".join(d) for d in docs]
    df = spark_global.createDataFrame(
        list(enumerate(texts)), ["doc_id", "text"])
    got = {r.doc_id: (r.n_windows, r.n_dup)
           for r in dup_window_stats(df, w=w, min_docs=2).collect()}

    wins = {i: [tuple(d[j:j + w]) for j in range(len(d) - w + 1)]
            for i, d in enumerate(docs)}
    owners = {}
    for i, ws in wins.items():
        for win in set(ws):
            owners.setdefault(win, set()).add(i)
    expect = {}
    for i, ws in wins.items():
        if ws:
            expect[i] = (len(ws), sum(1 for win in ws if len(owners[win]) >= 2))
    assert got == expect


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)).filter(lambda e: e[0] != e[1]),
        min_size=1, max_size=15,
    ),
)
@settings(max_examples=10, deadline=None)
def test_connected_components_matches_union_find(spark_global, edges):
    from deeplake_spark.operators.dedup import connected_components

    df = spark_global.createDataFrame(edges, ["a", "b"])
    got = {r.id: r.label for r in connected_components(df).collect()}

    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {x: find(x) for x in parent}
    assert got == expect


def test_tql_arithmetic_fuzz_matches_duckdb(spark_global, sf_dir):
    """Translator fuzz: 200 random integer arithmetic/comparison/logic
    expressions over documents columns, evaluated in ONE Spark query
    through the TQL front-end and in DuckDB, must agree value-for-value.
    Operands are kept small (mod-reduced columns, literals < 100,
    depth <= 3) so ANSI overflow can't fire; division is excluded
    (int/int DOUBLE divergence is a documented oracle rule, not a
    translator property)."""
    import random

    import duckdb

    from deeplake_spark import tql
    from deeplake_spark.io import load_table

    rng = random.Random(20260813)
    atoms = ["(doc_id % 97)", "(n_chars % 53)", "7", "13", "42"]

    def gen(depth: int) -> str:
        if depth == 0 or rng.random() < 0.3:
            return rng.choice(atoms)
        op = rng.choice(["+", "-", "*", "%"])
        a, b = gen(depth - 1), gen(depth - 1)
        if op == "%":
            b = rng.choice(["97", "53", "11"])  # nonzero literal divisor
        return f"({a} {op} {b})"

    def gen_bool(depth: int) -> str:
        cmp = rng.choice(["==", "!=", "<", "<=", ">", ">="])
        e = f"({gen(depth)} {cmp} {gen(depth)})"
        if rng.random() < 0.4:
            e = f"({e} {rng.choice(['AND', 'OR'])} {gen_bool(depth - 1) if depth else e})"
        return e

    exprs = [gen(3) for _ in range(140)] + [gen_bool(2) for _ in range(60)]
    select = ", ".join(f"{e} AS c{i}" for i, e in enumerate(exprs))

    d = load_table(spark_global, sf_dir, "documents")
    got = (
        tql.query(f"SELECT doc_id, {select} ORDER BY doc_id LIMIT 100",
                  spark=spark_global, default=d)
        .collect()
    )

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    sql = f"SELECT doc_id, {select} FROM documents ORDER BY doc_id LIMIT 100"
    sql = sql.replace("==", "=").replace("!=", "<>")
    want = con.execute(sql).fetchall()

    assert len(got) == len(want) == 100
    for grow, wrow in zip(got, want):
        for i, (g, w) in enumerate(zip(grow, wrow)):
            assert (g == w) or (bool(g) == bool(w) and isinstance(w, bool)), (
                f"col {i}: spark={g!r} duckdb={w!r} "
                f"expr={'doc_id' if i == 0 else exprs[i - 1]}")


def test_tql_slice_index_fuzz_matches_duckdb(spark_global, sf_dir):
    """Translator fuzz #2: random element access / [a:b] / [a:b:step]
    slices with SUM/AMIN/AMAX reductions over the embeddings column,
    one Spark query through the TQL front-end vs hand-built DuckDB SQL
    (1-based inclusive slices, range() for steps). Negative indices
    included. 60 expressions, 50 rows, value-for-value."""
    import random

    import duckdb

    from deeplake_spark import tql
    from deeplake_spark.io import load_table

    rng = random.Random(20260814)
    dim = 64
    cases = []  # (tql_expr, duck_expr)
    for _ in range(60):
        kind = rng.choice(["elem", "elem_neg", "slice", "step"])
        if kind == "elem":
            i = rng.randrange(0, dim)
            cases.append((f"ROUND(embedding[{i}], 6)",
                          f"ROUND(embedding[{i + 1}], 6)"))
        elif kind == "elem_neg":
            i = rng.randrange(1, dim + 1)
            cases.append((f"ROUND(embedding[-{i}], 6)",
                          f"ROUND(embedding[{dim - i + 1}], 6)"))
        elif kind == "slice":
            a = rng.randrange(0, dim - 1)
            b = rng.randrange(a + 1, dim + 1)
            red = rng.choice(["SUM", "AMIN", "AMAX"])
            duck = {"SUM": "list_sum", "AMIN": "list_min", "AMAX": "list_max"}[red]
            cases.append((
                f"ROUND({red}(embedding[{a}:{b}]), 6)",
                f"ROUND({duck}(list_transform(embedding[{a + 1}:{b}], "
                "x -> CAST(x AS DOUBLE))), 6)"))
        else:
            a = rng.randrange(0, dim // 2)
            b = rng.randrange(a + 1, dim + 1)
            s = rng.randrange(2, 6)
            cases.append((
                f"ROUND(SUM(embedding[{a}:{b}:{s}]), 6)",
                f"ROUND(list_sum(list_transform(range({a}, {b}, {s}), "
                "i -> CAST(embedding[CAST(i + 1 AS INT)] AS DOUBLE))), 6)"))

    tsel = ", ".join(f"{t} AS c{i}" for i, (t, _) in enumerate(cases))
    dsel = ", ".join(f"{d} AS c{i}" for i, (_, d) in enumerate(cases))

    e = load_table(spark_global, sf_dir, "embeddings")
    got = tql.query(f"SELECT vec_id, {tsel} ORDER BY vec_id LIMIT 50",
                    spark=spark_global, default=e).collect()

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'")
    want = con.execute(
        f"SELECT vec_id, {dsel} FROM embeddings ORDER BY vec_id LIMIT 50"
    ).fetchall()

    assert len(got) == len(want) == 50
    for grow, wrow in zip(got, want):
        for i, (g, w) in enumerate(zip(grow, wrow)):
            # AMIN/AMAX keep float32 (round-to-6 then float32 storage
            # wobbles the last digit); SUM folds in double — tolerance
            # covers both at the 6-decimal precision both sides round to
            ok = (g == w) or (g is not None and w is not None
                              and abs(float(g) - float(w)) <= 1e-6)
            assert ok, (f"col {i}: spark={g!r} duckdb={w!r} "
                        f"expr={'vec_id' if i == 0 else cases[i - 1]}")


# --------------------------------------------------------------------------
# codec properties: random images must survive the stdlib codecs exactly
# (PNG lossless round trip; progressive JPEG == baseline JPEG pixels;
# restart markers never change pixels; MJPEG-AVI == per-frame JPEG)


@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    ch=st.sampled_from([1, 3, 4]),
    depth16=st.booleans(),
    interlace=st.booleans(),
    fseed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=30, deadline=None)
def test_png_roundtrip_random(h, w, ch, depth16, interlace, fseed):
    import numpy as np

    from deeplake_spark.operators.multimodal import _decode_png
    from tests.test_multimodal import _encode_png

    rng = np.random.default_rng(fseed)
    hi = 65536 if depth16 else 256
    dt = np.uint16 if depth16 else np.uint8
    shape = (h, w) if ch == 1 else (h, w, ch)
    img = rng.integers(0, hi, size=shape, dtype=dt)
    filters = list(rng.integers(0, 5, size=rng.integers(1, 5)))
    out = _decode_png(_encode_png(img, filters=[int(f) for f in filters],
                                  interlace=interlace))
    assert out.dtype == img.dtype and np.array_equal(out, img)


@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    ncolors=st.integers(1, 32),
    nframes=st.integers(1, 3),
    interlace=st.booleans(),
    alpha=st.booleans(),
    fseed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=30, deadline=None)
def test_gif_roundtrip_random(h, w, ncolors, nframes, interlace, alpha,
                              fseed):
    """Random exact-palette GIFs (any size/palette/frame count,
    interlaced or not, with or without a transparent index) decode back
    pixel-exactly; opaque pixels survive the RGBA lane."""
    import numpy as np

    from deeplake_spark.operators._gif import decode_gif, encode_gif

    rng = np.random.default_rng(fseed)
    pal = rng.integers(0, 256, (ncolors, 3), dtype=np.uint8)
    frames = []
    for _ in range(nframes):
        idx = rng.integers(0, ncolors, (h, w))
        f = pal[idx]
        if alpha:
            f = np.dstack([f, np.where(idx == 0, 0, 255).astype(np.uint8)])
        frames.append(f)
    dec = decode_gif(encode_gif(frames, interlace=interlace))
    assert len(dec) == nframes
    # independent compositor model: GIF transparency means "show the
    # previous frame through" (draw-over disposal), and a clip with no
    # transparent pixel anywhere encodes as plain RGB
    any_trans = alpha and any((f[..., 3] == 0).any() for f in frames)
    channels = 4 if any_trans else 3
    canvas = np.zeros((h, w, channels), np.uint8)
    for got, f in zip((g for g, _ in dec), frames):
        opaque = (f[..., 3] == 255) if alpha else np.ones((h, w), bool)
        if channels == 4:
            canvas[opaque] = np.concatenate(
                [f[..., :3][opaque],
                 np.full((int(opaque.sum()), 1), 255, np.uint8)], axis=1)
        else:
            canvas[...] = f[..., :3]
        assert np.array_equal(got, canvas)


@given(
    h=st.integers(8, 40),
    w=st.integers(8, 40),
    sub=st.sampled_from(["444", "422", "420"]),
    ri=st.integers(0, 5),
    fseed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=20, deadline=None)
def test_jpeg_progressive_and_restarts_random(h, w, sub, ri, fseed):
    """For ANY image: progressive decode == baseline decode (same
    quantization), and restart markers never change a pixel."""
    import numpy as np

    from deeplake_spark.operators._jpeg import (
        decode_baseline,
        encode_baseline,
        encode_progressive,
    )

    rng = np.random.default_rng(fseed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    base = decode_baseline(encode_baseline(img, subsampling=sub))
    prog = decode_baseline(encode_progressive(img, subsampling=sub))
    assert np.array_equal(base, prog)
    if ri:
        rst = decode_baseline(
            encode_baseline(img, subsampling=sub, restart_interval=ri))
        assert np.array_equal(base, rst)


@given(st.lists(st.integers(0, 1), min_size=0, max_size=64))
@settings(max_examples=200, deadline=None)
def test_pack_bits_signed_roundtrip(bits):
    """_pack_bits_signed is a bijection over its bit length: two's
    complement decode recovers the exact bit list, and the value always
    fits a signed 64-bit long."""
    from deeplake_spark.operators.multimodal import _pack_bits_signed

    v = _pack_bits_signed(bits)
    assert -(1 << 63) <= v < (1 << 63)
    n = len(bits)
    u = v + (1 << n) if n and v < 0 else v
    decoded = [(u >> (n - 1 - i)) & 1 for i in range(n)]
    assert decoded == bits


def test_gumbel_key_matches_oracle_spelling(spark_global):
    """gumbel_key's md5_uniform + 2^-33 reuse must be bit-identical to
    the (bits + 0.5)/2^32 form the DuckDB oracles spell — the IEEE
    exactness claim, checked across many ids. Cross-engine, the UNIFORM
    is bit-identical but ln() differs by ulps (Java Math.log vs libm),
    which is why t30 orders by the ROUNDED key — pinned here at the
    oracle's 6-decimal contract."""
    import duckdb
    from pyspark.sql import functions as F

    from deeplake_spark.operators.sampling import gumbel_key

    ids = spark_global.range(0, 5000).withColumnRenamed("id", "doc_id")
    inline_bits = F.conv(
        F.substring(F.md5(F.concat(F.col("doc_id").cast("string"),
                                   F.lit("#dsir"))), 1, 8), 16, 10,
    ).cast("long")
    inline = -F.log(-F.log((inline_bits + F.lit(0.5))
                           / F.lit(float(1 << 32))))
    mismatch = ids.select(
        gumbel_key("doc_id", "dsir").alias("g"), inline.alias("i")
    ).filter(F.col("g") != F.col("i")).count()
    assert mismatch == 0
    # the UNIFORM itself is bit-identical across engines...
    spark_u = [r.u for r in ids.select(
        "doc_id",
        ((inline_bits + F.lit(0.5)) / F.lit(float(1 << 32))).alias("u")
    ).orderBy("doc_id").collect()]
    duck_u = [d[0] for d in duckdb.sql("""
        SELECT (CAST(('0x' || substr(md5(r || '#dsir'), 1, 8))
                AS UBIGINT) + 0.5) / 4294967296.0 AS u
        FROM range(5000) t(r) ORDER BY r
    """).fetchall()]
    assert spark_u == duck_u
    # ...and the Gumbel agrees at the oracle's ROUND(6) contract
    spark_g = [r.g for r in ids.select(
        F.round(gumbel_key("doc_id", "dsir"), 6).alias("g")
    ).orderBy("doc_id").collect()]
    duck_g = [d[0] for d in duckdb.sql("""
        SELECT ROUND(-ln(-ln((CAST(('0x' || substr(md5(r || '#dsir'), 1, 8))
                     AS UBIGINT) + 0.5) / 4294967296.0)), 6) AS g
        FROM range(5000) t(r) ORDER BY r
    """).fetchall()]
    assert spark_g == duck_g


@given(data=st.data())
@settings(max_examples=5, deadline=None)
def test_random_dml_sequences_match_model(spark_global, tmp_path_factory,
                                          data):
    """Reference §5.4 parity (py_tests/test_random_operations.py):
    random append/update/delete/commit/compact/reopen sequences vs an
    independent Python model of the documented semantics — dense
    row-id assignment on append, tombstone delete, latest-patch-wins
    update, compact folding staged state into one committed snapshot.
    `reopen` doubles as the crash-consistency check: staged files are
    on disk but NOT in the commit log, so a reopen (= process death
    before commit) must show exactly the last committed state, and
    row ids of the discarded staged appends are reused."""
    import deeplake_spark.dataset as dl
    from deeplake_spark import types as dt

    ops = data.draw(st.lists(
        st.tuples(st.sampled_from(
            ["append", "update", "delete", "commit", "compact", "reopen",
             "vacuum"]),
            st.integers(0, 10_000)),
        min_size=4, max_size=12))

    path = str(tmp_path_factory.mktemp("dmlprop")) + "/ds"
    spark = spark_global
    ds = dl.create(path, spark, schema={"x": dt.Generic("int64")})
    ds.append([{"x": i} for i in range(3)])
    ds.commit("base")

    committed = {0: 0, 1: 1, 2: 2}   # rid -> x, the durable state
    committed_max = 2                 # highest id ever COMMITTED: ids of
    # tombstoned rows are NEVER reused (merge-on-read delete keeps the
    # id occupied; compact carries the max forward), so a reopen resumes
    # numbering from here — only ids of DISCARDED staged appends (crash
    # before commit) are reused
    pending: list[tuple] = []         # staged ops in order
    snapshots: list[tuple] = []       # (version, model state) per commit
    vacuumed: set[int] = set()        # versions reclaimed by vacuum ops
    next_id = 3

    def fold(state, staged):
        out = dict(state)
        for kind, rid, val in staged:
            if kind == "append":
                out[rid] = val
            elif kind == "update":
                out[rid] = val
            elif kind == "delete":
                out.pop(rid, None)
        return out

    for kind, arg in ops:
        if kind == "append":
            val = 1000 + arg
            ds.append([{"x": val}])
            pending.append(("append", next_id, val))
            next_id += 1
        elif kind in ("update", "delete"):
            # only COMMITTED live rows: staged rows aren't readable yet
            live = sorted(set(committed) - {
                r for k, r, _ in pending if k == "delete"})
            if not live:
                continue
            rid = live[arg % len(live)]
            if kind == "update":
                val = 2000 + arg
                ds.update(rid, {"x": val})
                pending.append(("update", rid, val))
            else:
                ds.delete(rid)
                pending.append(("delete", rid, 0))
        elif kind == "commit":
            ds.commit("step")
            committed = fold(committed, pending)
            committed_max = max([committed_max]
                                + [r for k, r, _ in pending if k == "append"])
            pending = []
            snapshots.append((ds.version, dict(committed)))
        elif kind == "compact":
            ds.compact()
            committed = fold(committed, pending)
            committed_max = max([committed_max]
                                + [r for k, r, _ in pending if k == "append"])
            pending = []
        elif kind == "vacuum":
            # retention: current state must be untouched; versions the
            # report marks vacuumed must REFUSE checkout afterwards,
            # everything else must keep replaying exactly
            rep = ds.vacuum(keep_versions=2)
            vacuumed |= set(rep["vacuumed_versions"])
        elif kind == "reopen":
            # crash before commit: staged files exist on disk but the
            # commit log never heard of them; numbering resumes after
            # the highest COMMITTED id (tombstoned ids stay occupied)
            ds = dl.open(path, spark)
            pending = []
            next_id = committed_max + 1

    ds.commit("final")
    committed = fold(committed, pending)
    del committed_max  # final compare needs values only
    got = {r._row_id: r.x for r in ds.to_df().collect()}
    assert got == committed
    # durable after a final reopen too
    got2 = {r._row_id: r.x
            for r in dl.open(path, spark).to_df().collect()}
    assert got2 == committed
    # time travel: a commit's snapshot is reproducible from its version
    # number (first, middle, last — bounded checkout cost per example)
    for i in sorted({0, len(snapshots) // 2, len(snapshots) - 1}):
        if not snapshots:
            break
        v, snap = snapshots[i]
        if v in vacuumed:
            with pytest.raises(dl.VersionNotFoundError, match="vacuumed"):
                ds.checkout(v)
            continue
        back = {r._row_id: r.x
                for r in dl.open(path, spark, version=v).to_df().collect()}
        assert back == snap, f"checkout({v}) diverged"
