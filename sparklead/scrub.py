"""PII redaction and C4-style boilerplate line filtering — the remaining
standard corpus-hygiene family next to dedup (sparklead/dedup.py,
sparklead/substrings.py), decontamination (sparklead/decontam.py) and the
Gopher repetition filters (sparklead/textstats.py).

Reference scope: the LogLead reference has no scrubbing operators — this
module is part of the repo's first-class LLM-pipeline surface. The C4
rules follow Raffel et al. 2020 (§2.2): keep lines that end in terminal
punctuation and have at least ``min_words`` words, drop lines mentioning
javascript, and drop whole pages containing "lorem ipsum", a curly brace,
or fewer than ``min_lines`` surviving lines.

Engine-portability (the DuckDB gate oracle replays these value-for-value):
every pattern sticks to the regex subset where Java's backtracking engine
(Spark) and RE2 (DuckDB) provably agree — character classes, bounded
quantifiers, non-capturing groups, word boundaries; no backreferences, no
lookaround, no alternations whose branch ORDER changes the match (Java is
leftmost-first, RE2 leftmost-longest — the IPv4 octet alternation below
is safe because its branches can never both match at one position with
different lengths followed by a viable continuation: each octet is
bounded left and right by non-digits).

Design for 100 TB: everything here is a per-row projection — regexes,
higher-order filters and string rebuilds all run inside the scan stage
with zero shuffles and zero UDFs; column pruning reaches the parquet
footer (plan-pinned in tests). Redaction ORDER is fixed (email -> ipv4 ->
phone) so sentinels never partially overlap a later pattern's match.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = (
    r"\b(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}"
    r"(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\b"
)
PHONE_RE = r"\+[0-9][0-9 ()\-]{6,14}[0-9]"

_TERMINAL_RE = r'[.!?"]$'


def _count(col: Column, pattern: str) -> Column:
    """Match count; NULL text counts 0. Round-9: ``regexp_count`` — the
    same non-overlapping leftmost-match count ``size(regexp_extract_all
    (…, 0))`` produced (and what the DuckDB oracle replays), without
    materializing the match strings."""
    return F.coalesce(F.regexp_count(col, F.lit(pattern)), F.lit(0))


def pii_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append per-doc PII match counts: n_emails, n_ipv4, n_phones."""
    t = F.col(text_col)
    return (
        df.withColumn("n_emails", _count(t, EMAIL_RE))
        .withColumn("n_ipv4", _count(t, IPV4_RE))
        .withColumn("n_phones", _count(t, PHONE_RE))
    )


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Counts + ``redacted`` text with <EMAIL>/<IP>/<PHONE> sentinels.
    Fixed application order (see module docstring); NULL text stays NULL."""
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col(text_col), EMAIL_RE, "<EMAIL>"),
            IPV4_RE,
            "<IP>",
        ),
        PHONE_RE,
        "<PHONE>",
    )
    return pii_stats(df, text_col).withColumn("redacted", red)


def _line_keep(ln: Column, min_words: int) -> Column:
    """C4 line rule: terminal punctuation, >= min_words non-empty words,
    no 'javascript' mention (case-insensitive)."""
    words = F.filter(F.split(ln, r"\s+"), lambda w: w != "")
    return (
        ln.rlike(_TERMINAL_RE)
        & (F.size(words) >= min_words)
        & ~F.contains(F.lower(ln), F.lit("javascript"))
    )


def c4_filter(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 3,
    min_lines: int = 3,
) -> DataFrame:
    """Append the C4 boilerplate columns: per-doc line counts before/after
    the line rule, the cleaned text (surviving lines rejoined), and the
    page-level keep flag (no lorem ipsum, no curly brace, >= min_lines
    surviving lines). NULL text normalizes to EMPTY text (one empty line
    that fails the keep rule -> c4_kept_lines 0, c4_keep false) rather
    than poisoning the HOFs."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.split(t, "\n")
    kept = F.filter(lines, lambda ln: _line_keep(ln, min_words))
    return (
        df.withColumn("c4_n_lines", F.size(lines))
        .withColumn("c4_kept_lines", F.size(kept))
        .withColumn("c4_text", F.array_join(kept, "\n"))
        .withColumn(
            "c4_keep",
            ~F.contains(F.lower(t), F.lit("lorem ipsum"))
            & ~F.contains(t, F.lit("{"))
            & (F.size(kept) >= min_lines),
        )
    )


def scrub_corpus(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 3,
    min_lines: int = 3,
) -> DataFrame:
    """The pipeline verb: C4 page filter + PII redaction of the surviving
    text. Returns kept pages only, with ``clean_text`` = the redacted,
    line-filtered text and the evidence counts. The ORIGINAL text column
    is DROPPED: the returned frame is the clean corpus, and a frame that
    claims to be redacted must not carry the raw PII payload alongside
    the sentinels (round-8 review finding — writing this frame to a
    clean sink used to persist every raw email/IP next to `<EMAIL>`)."""
    c4 = c4_filter(df, text_col, min_words, min_lines).filter(F.col("c4_keep"))
    red = redact_pii(c4.withColumnRenamed("c4_text", "_c4t"), "_c4t")
    return (
        red.withColumnRenamed("redacted", "clean_text")
        .drop("_c4t", "c4_keep", text_col)
    )
