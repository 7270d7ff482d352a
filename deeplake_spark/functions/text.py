"""Text analysis functions: tokenization, shingling, language ID,
quality scoring, fingerprinting (SURVEY training-data-pipeline ops +
TQL CONTAINS/EQUALS — reference cpp/nd/functions.hpp:71,
query_core/text_search_info.hpp:33-37).

Everything here is a Column expression (JVM-side) — except
`normalize_unicode`, a stdlib-backed Arrow UDF (Spark has no
unicode-normalization builtin; DuckDB's nfc_normalize/strip_accents
are the oracle twins). The deterministic formulas are deliberately
reproducible in ANSI SQL so the DuckDB oracle can verify them
value-for-value.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas-UDF type hints are
# stringified by `annotations` and resolve against module globals
# (the functions/vector.py convention; operators/bpe.py documents the
# UNSUPPORTED_SIGNATURE failure an in-function import causes)
from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny per-language stopword sets for the n-gram/stopword heuristic
#: language identifier. Deliberately minimal + deterministic.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "es": ["el", "la", "de", "y", "que", "en", "un"],
    "de": ["der", "die", "das", "und", "ist", "von", "ein"],
    "fr": ["le", "la", "de", "et", "est", "un", "une"],
}

QUALITY_STOPWORDS = STOPWORDS["en"]


def tokenize_sql(text: str) -> str:
    """SQL-fragment twin of `tokenize` (trap 12: one F.expr costs ~1
    py4j round trip vs ~10 for the filter/split/lambda chain; ~50
    bench lanes construct this per q.fn call). Parses to the identical
    Catalyst tree — pinned in tests/test_functions.py."""
    return f"filter(split(lower({text}), '\\\\s+'), t -> t != '')"


def tokenize(text: Column | str) -> Column:
    """Lowercased whitespace tokens, empties removed. A str argument
    is a SQL fragment (column name or sub-expression) and builds as
    one parsed expression."""
    if isinstance(text, str):
        return F.expr(tokenize_sql(text))
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokenize(text))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish token counting: split on word boundaries/punct/digit runs
    (a regex approximation of byte-pair segmentation used for budget
    accounting in training pipelines)."""
    return F.size(
        F.filter(
            F.split(F.lower(text), r"[^a-z0-9]+|(?<=[a-z]{4})(?=[a-z])"),
            lambda t: t != "",
        )
    )


def word_shingles_sql(tokens: str, n: int) -> str:
    """SQL-fragment twin of `word_shingles` (trap 12; identical tree,
    pinned in tests/test_functions.py)."""
    parts = ", ".join(
        f"element_at({tokens}, cast((i + {j}) as int))" for j in range(n))
    return (f"CASE WHEN size({tokens}) >= {n} THEN "
            f"transform(sequence(1, size({tokens}) - {n - 1}), "
            f"i -> concat_ws(' ', {parts})) "
            "ELSE cast(array() as array<string>) END")


def word_shingles(tokens: Column | str, n: int) -> Column:
    """n-word shingles (space-joined); empty array when len(tokens) < n.

    Built from element_at + concat_ws rather than slice + array_join:
    identical strings, but the generated code is ~6x cheaper to compile
    and run (slice allocates a sub-array per shingle). A str argument
    is a SQL fragment and builds as one parsed expression (trap 12).
    """
    if isinstance(tokens, str):
        return F.expr(word_shingles_sql(tokens, n))
    make = F.transform(
        F.sequence(F.lit(1), F.size(tokens) - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(tokens, (i + j).cast("int")) for j in range(n)]
        ),
    )
    return F.when(F.size(tokens) >= n, make).otherwise(F.array().cast("array<string>"))


def char_ngrams(text: Column | str, n: int) -> Column:
    """Character n-grams of the lowercased text. A str argument is a
    SQL fragment and builds as one parsed expression (trap 12)."""
    if isinstance(text, str):
        return F.expr(
            f"CASE WHEN length(lower({text})) >= {n} THEN "
            f"transform(sequence(1, length(lower({text})) - {n - 1}), "
            f"i -> substring(lower({text}), i, {n})) "
            "ELSE cast(array() as array<string>) END")
    s = F.lower(text)
    make = F.transform(
        F.sequence(F.lit(1), F.length(s) - (n - 1)),
        lambda i: F.substring(s, i, n),
    )
    return F.when(F.length(s) >= n, make).otherwise(F.array().cast("array<string>"))


def _stopword_hits_sql(tokens: str, words: list[str]) -> str:
    arr = "array(" + ", ".join("'" + w + "'" for w in words) + ")"
    return f"size(filter({tokens}, t -> array_contains({arr}, t)))"


def stopword_hits(tokens: Column | str, words: list[str]) -> Column:
    """Occurrence count (not distinct) of tokens in a stopword list.
    A str argument is a SQL fragment (one parsed expr, trap 12)."""
    if isinstance(tokens, str):
        return F.expr(_stopword_hits_sql(tokens, words))
    lit_set = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens, lambda t: F.array_contains(lit_set, t)))


def langid_scores(tokens: Column) -> dict[str, Column]:
    """Per-language stopword-hit ratio (hits / tokens)."""
    n = F.greatest(F.size(tokens), F.lit(1))
    return {
        lang: (stopword_hits(tokens, words).cast("double") / n)
        for lang, words in STOPWORDS.items()
    }


def predict_lang(tokens: Column | str) -> Column:
    """argmax of langid_scores with deterministic lexicographic tiebreak;
    'und' (undetermined) when every score is 0. A str argument is a
    SQL fragment; the whole argmax builds as one parsed expr (trap 12)."""
    if isinstance(tokens, str):
        n = f"greatest(size({tokens}), 1)"
        pairs = "array(" + ", ".join(
            f"struct(cast({_stopword_hits_sql(tokens, words)} as double) "
            f"/ {n} AS score, '{lang}' AS lang)"
            for lang, words in sorted(STOPWORDS.items())) + ")"
        best = f"array_max({pairs})"
        return F.expr(f"CASE WHEN ({best}).score > 0 THEN ({best}).lang "
                      "ELSE 'und' END")
    scores = langid_scores(tokens)
    # build struct array (score, negname) and pick max — deterministic
    pairs = F.array(
        *[F.struct(s.alias("score"), F.lit(lang).alias("lang")) for lang, s in sorted(scores.items())]
    )
    best = F.array_max(pairs)  # struct compare: score first, then lang
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def quality_features(text: Column | str) -> dict[str, Column]:
    """Deterministic doc-quality features (length / punct / stopword
    ratios) in the style of C4/Gopher quality filters. A str argument
    is a SQL fragment; each feature builds as one parsed expr
    (trap 12)."""
    if isinstance(text, str):
        toks = tokenize_sql(text)
        n_tok = f"size({toks})"
        sw = ", ".join("'" + w + "'" for w in QUALITY_STOPWORDS)
        return {
            "n_tokens": F.expr(n_tok),
            "mean_token_len": F.expr(
                f"CASE WHEN {n_tok} > 0 THEN "
                f"aggregate({toks}, cast(0.0 as double), "
                "(acc, t) -> acc + length(t)) "
                f"/ {n_tok} ELSE cast(0.0 as double) END"),
            "stopword_ratio": F.expr(
                f"CASE WHEN {n_tok} > 0 THEN "
                f"cast(size(filter({toks}, t -> array_contains("
                f"array({sw}), t))) as double) / {n_tok} "
                "ELSE cast(0.0 as double) END"),
            "punct_ratio": F.expr(
                f"CASE WHEN length({text}) > 0 THEN "
                f"cast(length({text}) - length(regexp_replace({text}, "
                f"'[.,;:!?]', '')) as double) / length({text}) "
                "ELSE cast(0.0 as double) END"),
            "unique_token_ratio": F.expr(
                f"CASE WHEN {n_tok} > 0 THEN "
                f"cast(size(array_distinct({toks})) as double) / {n_tok} "
                "ELSE cast(0.0 as double) END"),
        }
    toks = tokenize(text)
    n_tok = F.size(toks)
    n_chars = F.length(text)
    mean_tok_len = F.when(
        n_tok > 0,
        F.aggregate(toks, F.lit(0.0), lambda acc, t: acc + F.length(t)) / n_tok,
    ).otherwise(F.lit(0.0))
    stop_ratio = F.when(
        n_tok > 0, stopword_hits(toks, QUALITY_STOPWORDS).cast("double") / n_tok
    ).otherwise(F.lit(0.0))
    punct_ratio = F.when(
        n_chars > 0,
        (n_chars - F.length(F.regexp_replace(text, r"[.,;:!?]", ""))).cast("double") / n_chars,
    ).otherwise(F.lit(0.0))
    uniq_ratio = F.when(
        n_tok > 0, F.size(F.array_distinct(toks)).cast("double") / n_tok
    ).otherwise(F.lit(0.0))
    return {
        "n_tokens": n_tok,
        "mean_token_len": mean_tok_len,
        "stopword_ratio": stop_ratio,
        "punct_ratio": punct_ratio,
        "unique_token_ratio": uniq_ratio,
    }


def quality_score(text: Column | str) -> Column:
    """Composite quality score in [0,1]: rewards mid-length docs with
    diverse vocabulary; deterministic, oracle-reproducible."""
    f = quality_features(text)
    len_score = F.least(f["n_tokens"].cast("double") / F.lit(50.0), F.lit(1.0))
    return F.round(
        0.4 * len_score + 0.4 * f["unique_token_ratio"] + 0.2 * (1.0 - f["punct_ratio"]),
        6,
    )


#: rolling-hash parameters (polynomial fingerprint, overflow-free in i64:
#: max intermediate = MOD*BASE + 255 ≈ 3.1e10 << 2^63)
FP_MOD = 1_000_000_007
FP_BASE = 31


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: polynomial rolling hash of the
    lowercased character stream, mod 1e9+7 (document-identity hashing for
    dedup bookkeeping). Reproducible in any SQL engine."""
    chars = F.split(F.lower(text), "")
    return F.aggregate(
        F.filter(chars, lambda c: c != ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * FP_BASE + F.ascii(c)) % FP_MOD,
    )


def normalize_unicode(text: Column, form: str = "NFC",
                      strip_accents: bool = False,
                      casefold: bool = False) -> Column:
    """Unicode text normalization — the cleaning step every multilingual
    corpus needs before dedup/tokenization (composed vs decomposed
    sequences are byte-different but canonically equal, so raw digests
    split what NFC unifies): ``form`` normalization (NFC/NFKC/NFD/NFKD),
    optional accent stripping (NFD → drop combining marks → re-``form``;
    the DuckDB strip_accents twin), optional casefold (full Unicode
    case folding — ss for ß — which plain lower() is not).

    Arrow-batched pandas UDF over stdlib unicodedata; the closure is
    SELF-CONTAINED (captures only str/bool locals, imports only stdlib
    inside — trap 23) so it survives the grading driver's fresh-process
    workers."""
    f, sa, cf = str(form), bool(strip_accents), bool(casefold)

    @F.pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        import unicodedata

        def one(x):
            if x is None:
                return None
            y = unicodedata.normalize(f, x)
            if sa:
                y = "".join(c for c in unicodedata.normalize("NFD", y)
                            if not unicodedata.combining(c))
                y = unicodedata.normalize(f, y)
            if cf:
                y = y.casefold()
            return y

        return s.map(one)

    return _norm(text)


def kgram_hashes(tokens: Column | str, k: int) -> Column:
    """md5-portable hash per token k-gram (array<bigint>, length
    n-k+1; empty below k tokens) — the winnowing input. PROJECT the
    token array to a column before calling (CLAUDE.md trap 3: an
    inlined tokenize would re-evaluate per element). A str argument is
    a SQL fragment; the whole map builds as one parsed expr (trap 12,
    tree-identical — canon-pinned)."""
    from deeplake_spark.operators.dedup import _md5_int60, _md5_int60_sql

    if isinstance(tokens, str):
        gram = "concat_ws(' ', " + ", ".join(
            f"element_at({tokens}, i + {j})" for j in range(int(k))) + ")"
        return F.expr(
            f"CASE WHEN size({tokens}) >= {int(k)} THEN "
            f"transform(sequence(1, size({tokens}) - {int(k) - 1}), "
            f"i -> {_md5_int60_sql(gram, 0)}) "
            "ELSE cast(array() as array<bigint>) END")
    n = F.size(tokens)

    def h(i: Column) -> Column:
        gram = F.concat_ws(
            " ", *[F.element_at(tokens, i + j) for j in range(int(k))])
        return _md5_int60(gram, 0)

    return F.when(n >= k, F.transform(
        F.sequence(F.lit(1), n - F.lit(int(k) - 1)), h)
    ).otherwise(F.array().cast("array<bigint>"))


def winnow_sql(hashes: str, w: int) -> str:
    """SQL-fragment twin of `winnow` (trap 12; tree-identical)."""
    return (f"CASE WHEN size({hashes}) >= {int(w)} THEN array_distinct("
            f"transform(sequence(1, size({hashes}) - {int(w) - 1}), "
            f"j -> array_min(slice({hashes}, j, {int(w)})))) "
            f"WHEN size({hashes}) >= 1 THEN array(array_min({hashes})) "
            "ELSE cast(array() as array<bigint>) END")


def winnow(hashes: Column | str, w: int) -> Column:
    """Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken
    2003 — the MOSS algorithm): the distinct set of per-window minima
    over every window of ``w`` consecutive k-gram hashes. GUARANTEE:
    two documents sharing a token run of length >= w + k - 1 share at
    least one fingerprint (every such run contains a full hash window,
    and a window's minimum is selected wherever the window appears) —
    the detection floor t07's every-position rolling hash samples
    cannot promise. Selection is by VALUE only (set semantics), so the
    tie rule is engine-free and the oracle replicates it verbatim.
    Documents shorter than one window fingerprint to their global
    minimum. PROJECT the hash array to a column before calling
    (trap 3 — an inlined kgram_hashes would re-evaluate per window).
    A str argument is a SQL fragment (one parsed expr, trap 12)."""
    if isinstance(hashes, str):
        return F.expr(winnow_sql(hashes, w))
    m = F.size(hashes)
    mins = F.transform(
        F.sequence(F.lit(1), m - F.lit(int(w) - 1)),
        lambda j: F.array_min(F.slice(hashes, j, int(w))))
    return (F.when(m >= w, F.array_distinct(mins))
            .when(m >= 1, F.array(F.array_min(hashes)))
            .otherwise(F.array().cast("array<bigint>")))


def contains_keyword(text: Column, keyword: str) -> Column:
    """TQL CONTAINS(col, 'kw') for text columns — case-insensitive token
    membership (reference text_search_info::search_type::contains)."""
    return F.array_contains(tokenize(text), keyword.lower())


def glob_to_rlike(pattern: str) -> str:
    """TQL LIKE uses glob syntax: `*` = any run, `?` = one char
    (reference docs/docs/advanced/tql.md:207-228 — NOT SQL %/_).
    Translate to an anchored Java regex, escaping regex metachars."""
    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        elif ch in r"\.[]{}()<>^$|+-=!":
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "^" + "".join(out) + "$"


def glob_like(col: Column, pattern: str, case_insensitive: bool = False) -> Column:
    """TQL LIKE/ILIKE with glob patterns."""
    rx = glob_to_rlike(pattern.lower() if case_insensitive else pattern)
    target = F.lower(col) if case_insensitive else col
    return target.rlike(rx)


# --- PII scrubbing (training-data pipeline op; regexes are RE2-safe —
# no lookbehind — so the same pattern runs in Spark, DuckDB, and the
# reference's regex probes) -------------------------------------------

#: (name, pattern, replacement) applied IN ORDER — email before phone so
#: digits inside addresses are not half-matched by the phone pattern
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "[IP]"),
    ("phone", r"\+\d[\d ()-]{6,14}\d", "[PHONE]"),
]


def pii_count(text: Column, kind: str) -> Column:
    """Occurrences of one PII kind (email/ipv4/phone)."""
    pat = next(p for n, p, _ in PII_PATTERNS if n == kind)
    return F.regexp_count(text, F.lit(pat))


def scrub_pii(text: Column) -> Column:
    """Redact all PII kinds, applied in PII_PATTERNS order — pure JVM
    regexp_replace chain, no Python in the hot path."""
    out = text
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


# --- Gopher-style repetition metrics (Rae et al. 2021 §A1.1: heavily
# repetitious documents are low quality) ------------------------------


def duplicate_word_fraction(tokens: Column) -> Column:
    """1 - distinct/total words; 0 for empty docs (ANSI-safe nullif)."""
    n = F.size(tokens)
    return F.coalesce(
        (F.lit(1.0) - F.size(F.array_distinct(tokens)).cast("double")
         / F.nullif(n.cast("double"), F.lit(0.0))),
        F.lit(0.0),
    )


def word_bigrams(tokens: Column) -> Column:
    """Adjacent word pairs, space-joined; n-1 bigrams for n tokens.
    zip_with pads the shorter side with null, so the trailing partial
    pair is sliced off."""
    n = F.size(tokens)
    paired = F.zip_with(
        tokens,
        F.slice(tokens, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return F.when(n >= 2, F.slice(paired, 1, n - 1)).otherwise(
        F.array().cast("array<string>"))


def top_bigram_fraction(bigrams: Column) -> Column:
    """Fraction of bigrams taken by the most frequent one — the Gopher
    top-n-gram repetition signal. Per-row O(distinct * n) HOF fold: no
    shuffle at any corpus size (CPU-parallel per row), unlike an
    explode + groupBy top-1 which shuffles the whole corpus. Pass a
    PROJECTED bigram column, not an inline expression (perf trap 3);
    over a single-file scan call io.ensure_parallelism first so the
    per-row CPU spreads across cores (perf trap 1)."""
    top = F.aggregate(
        F.array_distinct(bigrams),
        F.lit(0),
        lambda acc, b: F.greatest(acc, F.size(F.filter(bigrams, lambda x: x == b))),
    )
    return F.coalesce(
        top.cast("double") / F.nullif(F.size(bigrams).cast("double"), F.lit(0.0)),
        F.lit(0.0),
    )


def canonical_url(url: Column) -> Column:
    """URL canonicalization for crawl dedup (the before-fetch/after-fetch
    URL-level dedup every web pipeline runs ahead of content dedup):

    - drop the fragment,
    - unify away the http/https scheme (case-insensitive),
    - lowercase the authority (host[:port]) but NOT the path (paths are
      case-sensitive per RFC 3986),
    - strip tracking query params (utm_*, fbclid, gclid) and tidy the
      separators they leave behind,
    - strip trailing slashes.

    Pure JVM expressions (no UDF) and deliberately limited to regex
    features DuckDB's RE2 also supports, so oracles can mirror it
    exactly (t25_url_dedup)."""
    c = F.regexp_replace(url, "#.*", "")
    c = F.regexp_replace(c, "^[hH][tT][tT][pP][sS]?://", "")
    host = F.lower(F.regexp_extract(c, "^[^/?]*", 0))
    c = F.concat(host, c.substr(F.length(host) + F.lit(1), F.length(c)))
    c = F.regexp_replace(c, "(utm_[a-zA-Z]+|fbclid|gclid)=[^&#]*", "")
    c = F.regexp_replace(c, r"\?&+", "?")
    c = F.regexp_replace(c, "&&+", "&")
    c = F.regexp_replace(c, "[?&]+$", "")
    return F.regexp_replace(c, "/+$", "")


def compression_ratio():
    """Arrow-batched gzip-compressibility scorer: compressed_bytes /
    raw_bytes of the UTF-8 text (zlib level 6, headerless deflate).
    The entropy-style quality proxy the Gopher/RefinedWeb stacks use
    alongside the rule-based scores: highly repetitive or templated
    text compresses far below natural prose (~0.3-0.4), random noise
    sits near 1.0 — cheap, language-agnostic, and orthogonal to
    stopword/punctuation heuristics. Empty/NULL text scores NULL.

    Self-contained closure (stdlib zlib only — CLAUDE.md trap 23);
    deterministic for a fixed zlib, so results are stable within a
    container but NOT engine-portable — this lane is rows-only by
    design (DuckDB ships no compressor), like the trained-index
    lanes."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def ratio(text: pd.Series) -> pd.Series:
        import zlib

        out = []
        for t in text:
            if t is None or len(t) == 0:
                out.append(None)
                continue
            raw = t.encode("utf-8", "surrogatepass")
            comp = zlib.compress(raw, 6)
            out.append(len(comp) / len(raw))
        return pd.Series(out, dtype="float64")

    return ratio
