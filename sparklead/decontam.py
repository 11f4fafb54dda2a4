"""Eval-set decontamination: fuzzy n-gram containment of a corpus against
a (small) evaluation set — the standard training-data hygiene step next to
dedup (GPT-3 appendix C / The Pile style 13-gram overlap; reference scope:
the LogLead reference has no decontamination operator — this is part of the
repo's first-class LLM-pipeline surface alongside sparklead/dedup.py).

Semantics: a corpus document's CONTAINMENT is the fraction of its DISTINCT
word n-grams that appear anywhere in the eval set's n-gram union. A doc is
contaminated when containment >= threshold (verbatim leakage -> 1.0,
partial quote -> the quoted fraction). Documents shorter than ``ngram_n``
tokens contribute their full token sequence as one gram (the
``word_shingles`` clamp), so short docs are matched whole, never silently
skipped; NULL-text docs stay in the output with (n_ngrams=0, n_hit=0,
containment=0.0) — clean by definition, and ``decontaminate`` keeps them.

Design for 100 TB:
* the corpus side is ONE scan: distinct-gram arrays per doc (narrow),
  explode, one equi-join on the gram, one per-doc count-aggregate with
  map-side partials. No self-joins, nothing quadratic.
* the eval side is small by nature (benchmarks are MBs, corpora are TBs):
  its distinct gram set sits directly behind its own ``distinct``
  exchange, so AQE sees the TRUE runtime size and broadcasts the join
  when it fits — HINT-FREE on purpose (the jaccard_verify round-6
  lesson: a forced broadcast turns 'eval set bigger than expected' into
  a driver OOM instead of a graceful partitioned join).
* the production lane (``fast=True``) never materializes gram STRINGS:
  ``shingle_hashes`` folds xxhash64 over the n-word array slice, so the
  join carries 8-byte keys; collisions at 64-bit rates only perturb the
  containment denominator/numerator by ~2^-64 per gram pair — harmless
  for a thresholded filter. The md5/string lane (default) is
  engine-portable and is what the DuckDB oracle replays value-for-value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparklead.dedup import shingle_hashes, word_shingles


def ngram_containment(
    corpus: DataFrame,
    eval_set: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    eval_text_col: str | None = None,
    ngram_n: int = 13,
    fast: bool = False,
) -> DataFrame:
    """Per-corpus-doc eval-set containment: (key_col, n_ngrams, n_hit,
    containment). ``n_ngrams`` counts the doc's distinct n-grams,
    ``n_hit`` how many of them occur in the eval set's gram union,
    ``containment`` = n_hit / n_ngrams (denominator >= 1 always — see
    module docstring on short docs)."""
    ev_col = eval_text_col or text_col
    grams = shingle_hashes if fast else word_shingles
    ev_grams = (
        eval_set.select(F.explode(grams(ev_col, ngram_n)).alias("g"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    # ONE corpus scan: carry the per-doc gram total through the explode, mark
    # hits with a left join (hint-free — see module docstring), count both in
    # the same per-doc aggregate. Map-side partials collapse the explode back
    # to one row per doc before the shuffle.
    # NULL-text normalization + explode_OUTER (round-7 review fix): a NULL
    # text flows through the shingle HOFs as a single-NULL-gram array
    # ([NULL], size 1), which would count one phantom gram in the
    # denominator — while the DuckDB gate oracle counts 0 for such rows.
    # Normalize to an EMPTY gram array (n_ngrams=0), and explode_outer so
    # the doc stays in the output; the outer row's NULL gram matches
    # nothing in the left join, so n_hit=0 and containment 0.0.
    elem_t = "bigint" if fast else "string"
    gs = F.when(
        F.col(text_col).isNull(), F.expr(f"cast(array() as array<{elem_t}>)")
    ).otherwise(grams(text_col, ngram_n))
    doc_grams = corpus.select(F.col(key_col), gs.alias("_gs")).select(
        key_col,
        F.size("_gs").alias("_n"),
        F.explode_outer("_gs").alias("g"),
    )
    return (
        doc_grams.join(ev_grams, "g", "left")
        .groupBy(key_col)
        .agg(
            F.min("_n").alias("n_ngrams"),
            F.sum(F.coalesce("_hit", F.lit(0))).alias("n_hit"),
        )
        .withColumn(
            "containment", F.col("n_hit") / F.greatest("n_ngrams", F.lit(1)).cast("double")
        )
    )


def contaminated_docs(
    corpus: DataFrame,
    eval_set: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    eval_text_col: str | None = None,
    ngram_n: int = 13,
    threshold: float = 0.8,
    fast: bool = True,
) -> DataFrame:
    """Corpus rows whose eval-set containment >= threshold, with the
    (n_ngrams, n_hit, containment) evidence columns appended.

    ``fast`` defaults True to MATCH ``decontaminate`` (round-7 advisor):
    with differing defaults the audit set and the dropped set were
    computed by different gram-hash lanes and were exact complements only
    up to ~2^-64 collision odds; now, with defaults, ``contaminated_docs``
    ∪ ``decontaminate`` is the corpus EXACTLY (pinned in
    tests/test_round8.py). ``ngram_containment``'s own default stays
    fast=False on purpose — it is the engine-portable evidence lane the
    DuckDB gate oracle replays value-for-value."""
    stats = ngram_containment(
        corpus, eval_set, text_col, key_col, eval_text_col, ngram_n, fast
    ).filter(F.col("containment") >= threshold)
    return corpus.join(stats, key_col)


def decontaminate(
    corpus: DataFrame,
    eval_set: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    eval_text_col: str | None = None,
    ngram_n: int = 13,
    threshold: float = 0.8,
    fast: bool = True,
) -> DataFrame:
    """The pipeline verb: corpus minus contaminated docs (anti-join on the
    thresholded stats — one edge: the stats frame is doc-id sized)."""
    drops = ngram_containment(
        corpus, eval_set, text_col, key_col, eval_text_col, ngram_n, fast
    ).filter(F.col("containment") >= threshold).select(key_col)
    return corpus.join(drops, key_col, "left_anti")
