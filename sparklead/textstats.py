"""Text analysis for training-data pipelines: language ID, quality scoring,
token counting, document fingerprinting. All built-in expressions — the hot
path stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword heuristic
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "por", "en", "que"],
}

# BPE-ish pre-tokenizer: word pieces, numbers, or single non-space symbols
BPE_ISH_PATTERN = r"[A-Za-z]+|\d+|[^\sA-Za-z\d]"


def whitespace_tokens(text: Column) -> Column:
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


def _lowered_words(df: DataFrame, text_col: str) -> tuple[DataFrame, bool]:
    """Materialize the lowered whitespace-token array ONCE as `_ws_lower`
    (Catalyst never CSEs repeated split/lower expressions — every stopword
    filter would otherwise re-split and re-lower the text; the 4-language
    lang_id alone was 5 splits, measured ~2x slower). Returns (df, added)."""
    if "_ws_lower" in df.columns:
        return df, False
    return df.withColumn("_ws_lower", whitespace_tokens(F.lower(F.col(text_col)))), True


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n_ws_tokens (whitespace) + n_bpe_tokens (BPE-ish regex pieces)."""
    t = F.col(text_col)
    df, added = _lowered_words(df, text_col)
    # regexp_count == size(regexp_extract_all(.., 0)) — both count
    # non-overlapping leftmost matches — without materializing the match
    # strings (round-9)
    out = df.withColumn("n_ws_tokens", F.size("_ws_lower")).withColumn(
        "n_bpe_tokens", F.regexp_count(t, F.lit(BPE_ISH_PATTERN))
    )
    return out.drop("_ws_lower") if added else out


def _stopword_ratio_of(words_lower: Column, lang: str) -> Column:
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(words_lower, lambda w: F.array_contains(sw, w)))
    return hits / F.greatest(F.size(words_lower), F.lit(1)).cast("double")


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    return _stopword_ratio_of(whitespace_tokens(F.lower(text)), lang)


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Pick the language whose stopword ratio is highest (n-gram heuristic).

    Deterministic tie-break by language code order; 'unknown' when no
    stopword hits at all.

    Round-9 shape: ONE fold over the words computes every language's hit
    count simultaneously — each stopword maps (literal map) to a bitmask
    with a 16-bit lane per language, the fold sums the masks, the per-lang
    counts shift out of the packed long (the simhash lane-packing trick).
    One lambda eval per word replaces four filter lambdas per word
    (measured 0.73 -> 0.50 s warm at sf1.0; hit counts are integers, so
    every downstream double is bit-identical — verified 0 mismatches).
    Docs with 65536+ words could overflow a 16-bit lane, so they take the
    exact per-language filter path instead (the ``otherwise`` branch —
    value-identical by construction, just slower for monster docs)."""
    df, added = _lowered_words(df, text_col)
    wl = F.col("_ws_lower")
    langs = sorted(STOPWORDS)
    mask: dict[str, int] = {}
    for k, lg in enumerate(langs):
        for w in STOPWORDS[lg]:
            mask[w] = mask.get(w, 0) | (1 << (16 * k))
    entries: list[Column] = []
    for w, m in sorted(mask.items()):
        entries += [F.lit(w), F.lit(m).cast("long")]
    mp = F.create_map(*entries)
    packed = F.aggregate(
        wl,
        F.lit(0).cast("long"),
        lambda acc, x: acc + F.coalesce(F.try_element_at(mp, x), F.lit(0).cast("long")),
    )
    df = df.withColumn("_swp", F.when(F.size(wl) < F.lit(1 << 16), packed))
    denom = F.greatest(F.size(wl), F.lit(1)).cast("double")
    swp = F.col("_swp")

    def _ratio(k: int, lg: str) -> Column:
        lane = F.shiftrightunsigned(swp, 16 * k).bitwiseAND(F.lit(0xFFFF))
        return F.when(swp.isNotNull(), lane / denom).otherwise(
            _stopword_ratio_of(wl, lg)
        )

    scores = F.array(
        *[
            F.struct((-_ratio(k, lg)).alias("neg"), F.lit(lg).alias("lg"))
            for k, lg in enumerate(langs)
        ]
    )
    best = F.array_min(scores)
    out = (
        df.withColumn(
            "lang_pred", F.when(-best["neg"] > 0, best["lg"]).otherwise(F.lit("unknown"))
        )
        .withColumn("lang_score", -best["neg"])
        .drop("_swp")
    )
    return out.drop("_ws_lower") if added else out


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document quality in [0,1]: length, punctuation density,
    stopword ratio, mean word length (the usual pretraining-filter signals).

    Word counts use the lowered-token array (identical sizes to the raw
    split, so values are unchanged by the sharing)."""
    t = F.col(text_col)
    df, added = _lowered_words(df, text_col)
    n_chars = F.length(t)
    n_words = F.greatest(F.size("_ws_lower"), F.lit(1))
    # regexp_count: same match count, no match-array materialization (round-9)
    punct_ratio = F.regexp_count(t, F.lit(r"[^\w\s]")) / F.greatest(n_chars, F.lit(1)).cast("double")
    mean_wlen = n_chars.cast("double") / n_words.cast("double")
    sw = _stopword_ratio_of(F.col("_ws_lower"), "en")
    len_ok = F.when((n_chars >= 50) & (n_chars <= 20000), 1.0).otherwise(0.25)
    punct_ok = F.when(punct_ratio <= 0.2, 1.0).otherwise(0.5)
    wlen_ok = F.when((mean_wlen >= 3) & (mean_wlen <= 12), 1.0).otherwise(0.5)
    sw_ok = F.when(sw >= 0.05, 1.0).otherwise(0.5)
    out = (
        df.withColumn("punct_ratio", punct_ratio)
        .withColumn("stopword_ratio", sw)
        .withColumn("mean_word_len", mean_wlen)
        .withColumn("quality", (len_ok + punct_ok + wlen_ok + sw_ok) / 4.0)
    )
    return out.drop("_ws_lower") if added else out


def text_features(df: DataFrame, text_col: str = "text", fast_fingerprint: bool = False) -> DataFrame:
    """token_counts + lang_id + quality_score + fingerprint over ONE shared
    lowered-token column (materialized once, dropped at the end).
    ``fast_fingerprint`` switches to the xxhash64 winnowing lane
    (production default at scale; md5 stays the oracle-checked lane)."""
    shared, added = _lowered_words(df, text_col)
    fp = fingerprint_fast if fast_fingerprint else fingerprint
    out = fp(
        quality_score(lang_id(token_counts(shared, text_col), text_col), text_col), text_col
    )
    # honor the added-flag contract like every other fn here: only drop the
    # shared column if THIS call materialized it — a caller-provided
    # _ws_lower survives for the caller's own downstream use (round-4
    # review fix)
    return out.drop("_ws_lower") if added else out


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    top_ns: tuple[int, ...] = (2, 3, 4),
    line_sep: str = "\n",
    para_sep: str = "\n\n",
) -> DataFrame:
    """Gopher/C4-style repetition & boilerplate filters per document
    (Rae et al. 2021 §A1.1 repetition signals; reference scope: the
    LogLead reference has no corpus-hygiene operators — this extends the
    repo's LLM-pipeline surface next to decontam.py). Returns a frame
    joinable on ``key_col``:

    * ``n_lines`` / ``n_dup_lines`` / ``dup_line_frac`` — line occurrences
      that repeat an earlier identical line (count-based: (n − distinct)/n)
    * ``n_paras`` / ``n_dup_paras`` / ``dup_para_frac`` — same over
      ``para_sep`` blocks
    * per n in ``top_ns``: ``top{n}_gram`` (the most frequent word n-gram,
      ties broken by the lexicographically LARGEST gram so the pick is
      deterministic), ``top{n}_count`` (its occurrence count, 0 when the
      doc has fewer than n words), ``top{n}_mass`` (the Gopher signal:
      occurrences × gram character length / doc character length)

    Design for 100 TB: line/paragraph stats are pure in-row list ops
    (whole-stage codegen, zero shuffle). Top-gram stats explode ONE tagged
    (n, gram) stream and aggregate twice on doc-rooted keys —
    (key, n, gram) counts with map-side partials, then a per-(key, n)
    max(struct(count, gram)) — both linear, both partial-aggregated; no
    per-doc quadratic HOF scans (a filter-count-per-distinct-gram form is
    O(len²) per doc and Gopher docs run to 20k words). NULL text is
    treated as empty (kept, all-zero stats — the decontam convention).
    The word split is ``\\s+`` with empties filtered (whitespace_tokens),
    so the gram stream is consistent with the rest of this module."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.split(t, line_sep)
    paras = F.split(t, para_sep)
    base = df.select(
        F.col(key_col),
        F.length(t).alias("_tc"),
        F.size(lines).alias("n_lines"),
        (F.size(lines) - F.size(F.array_distinct(lines))).alias("n_dup_lines"),
        F.size(paras).alias("n_paras"),
        (F.size(paras) - F.size(F.array_distinct(paras))).alias("n_dup_paras"),
        whitespace_tokens(t).alias("_rw"),
    )
    w = F.col("_rw")
    # one tagged gram stream for every n: (n, gram) structs; docs shorter
    # than n contribute NO n-gram (count 0 downstream — the Gopher
    # semantics; the word_shingles whole-doc clamp would make a short doc
    # its own "top gram" with count 1, a meaningless repetition signal).
    # INCREMENTAL gram build (round-9): the n-gram array extends the
    # (n-1)-gram array by one word — ``zip_with(g[n-1] shifted, w shifted,
    # concat_ws)`` — instead of re-joining an n-element slice per position
    # (the old ``array_join(slice(w, i, n))`` allocated a fresh slice array
    # AND re-copied all n words for every position; for (2,3,4) that is 9
    # word-copies per position vs 3 concats sharing prefixes). Same gram
    # STRINGS by construction (non-empty words joined by single spaces).
    # Measured 3.4 -> 2.3 s on the Generate-dominated subplan at sf1.0.
    _max_n = max(top_ns)
    _g: dict[int, Column] = {1: w}
    for _n in range(2, _max_n + 1):
        _shift = F.size(w) - (_n - 1)
        _g[_n] = F.zip_with(
            F.slice(_g[_n - 1], 1, _shift),
            F.slice(w, _n, _shift),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    _empty_tagged = F.expr("cast(array() as array<struct<n:int,g:string>>)")

    def _tagged(n: int) -> Column:
        # the slice length (size - (n-1)) goes negative for docs shorter
        # than n — the guard returns the empty tagged array before the
        # slice would evaluate (same short-doc semantics as before)
        return F.when(
            F.size(w) >= n,
            F.transform(
                _g[n], lambda x: F.struct(F.lit(n).alias("n"), x.alias("g"))
            ),
        ).otherwise(_empty_tagged)

    per_n = [_tagged(n) for n in top_ns]
    # ONE exchange for the whole top-gram subplan (round-9): hash-partition
    # the DOC rows by key BEFORE the gram explode — Generate/Project preserve
    # the child's partitioning, and HashPartitioning(key) satisfies the
    # clustered distribution of ALL THREE downstream aggregations (their
    # grouping keys each contain ``key_col``), so the (key,n,gram) counts,
    # the per-(key,n) max and the per-key pivot all run shuffle-free where
    # the old shape paid one gram-stream-sized exchange per level (plan:
    # 3 ENSURE_REQUIREMENTS exchanges -> 0; the one repartition moves
    # doc-sized rows, not the exploded stream — measured 4.3 -> ~2.4 s on
    # repetition_filters at sf1.0). Values unchanged: aggregation results
    # are partitioning-independent.
    ex = (
        base.select(key_col, "_rw")
        .repartition(F.col(key_col))
        .select(key_col, F.explode(F.flatten(F.array(*per_n))).alias("ng"))
    )
    counts = ex.groupBy(key_col, F.col("ng.n").alias("_n"), F.col("ng.g").alias("_g")).agg(
        F.count(F.lit(1)).alias("_c")
    )
    tops = counts.groupBy(key_col, "_n").agg(
        F.max(F.struct(F.col("_c").alias("c"), F.col("_g").alias("g"))).alias("_top")
    )
    wide = tops.groupBy(key_col).agg(
        *[
            F.max(F.when(F.col("_n") == n, F.col("_top"))).alias(f"_t{n}")
            for n in top_ns
        ]
    )
    out = base.drop("_rw").join(wide, key_col, "left")
    denom = F.greatest(F.col("_tc"), F.lit(1)).cast("double")
    for n in top_ns:
        tn = F.col(f"_t{n}")
        out = (
            out.withColumn(f"top{n}_gram", tn["g"])
            .withColumn(f"top{n}_count", F.coalesce(tn["c"], F.lit(0)))
            .withColumn(
                f"top{n}_mass",
                F.coalesce(tn["c"] * F.length(tn["g"]) / denom, F.lit(0.0)),
            )
            .drop(f"_t{n}")
        )
    return (
        out.withColumn(
            "dup_line_frac",
            F.col("n_dup_lines") / F.greatest("n_lines", F.lit(1)).cast("double"),
        )
        .withColumn(
            "dup_para_frac",
            F.col("n_dup_paras") / F.greatest("n_paras", F.lit(1)).cast("double"),
        )
        .drop("_tc")
    )


def fingerprint(df: DataFrame, text_col: str = "text", shingle_k: int = 8, keep: int = 4) -> DataFrame:
    """Winnowing-style document fingerprint: the ``keep`` smallest md5 hashes
    over char k-gram shingles, concatenated. Near-identical docs share it.

    md5 is kept in THIS lane for engine portability (the DuckDB oracle
    replays it verbatim); production pipelines should use
    ``fingerprint_fast`` — same winnowing shape over xxhash64 shingles,
    measured ~4x cheaper (one md5 per character position dominates the
    text-analysis suite's CPU at corpus scale)."""
    t = F.col(text_col)
    shingles = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(t) - (shingle_k - 1), F.lit(1))),
        lambda i: F.md5(t.substr(i, F.lit(shingle_k))),
    )
    smallest = F.slice(F.array_sort(shingles), 1, keep)
    return df.withColumn("fingerprint", F.md5(F.array_join(smallest, "")))


def fingerprint_fast(df: DataFrame, text_col: str = "text", shingle_k: int = 8, keep: int = 4) -> DataFrame:
    """Production fingerprint lane: winnowing over xxhash64 char-shingles.

    Identical selection semantics to ``fingerprint`` (keep the ``keep``
    smallest hashes of the k-gram shingle stream, hash the concatenation)
    but every per-position hash is a JVM xxhash64 long — no hex-string
    allocation, no md5 rounds. The output is a BIGINT fingerprint. Groups
    near-identical docs the same way (equal-grouping pinned in pytest);
    values are NOT comparable across the two lanes."""
    t = F.col(text_col)
    shingles = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(t) - (shingle_k - 1), F.lit(1))),
        lambda i: F.xxhash64(t.substr(i, F.lit(shingle_k))),
    )
    # reference `smallest` exactly ONCE (array_join over a transform) rather
    # than keep× getItem: projection-level subexpression elimination would
    # usually rescue the repeated form (measured: no runtime difference),
    # but the single-reference plan is smaller and doesn't depend on it
    smallest = F.slice(F.array_sort(shingles), 1, keep)
    return df.withColumn(
        "fingerprint",
        F.xxhash64(F.array_join(F.transform(smallest, lambda x: x.cast("string")), ",")),
    )
