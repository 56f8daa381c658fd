"""Text analysis operators: token counting, quality scoring, language-ID
heuristic, document fingerprinting.  Built-in Catalyst expressions only —
every column here compiles into whole-stage codegen; integer/boolean
outputs keep external-SQL oracles exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def n_tokens(text_col: str = "text") -> Column:
    """Whitespace token count (0 for empty/blank)."""
    t = F.trim(F.col(text_col))
    return F.when(t == "", F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    ).cast("long")


def n_chars(text_col: str = "text") -> Column:
    return F.length(F.col(text_col)).cast("long")


def n_digit_chars(text_col: str = "text") -> Column:
    return F.length(
        F.regexp_replace(F.col(text_col), "[^0-9]", "")
    ).cast("long")


def n_punct_chars(text_col: str = "text") -> Column:
    return F.length(
        F.regexp_replace(F.col(text_col), "[^.,;:!?]", "")
    ).cast("long")


def doc_fingerprint(text_col: str = "text", prefix_tokens: int = 8) -> Column:
    """Prefix fingerprint: md5 of the first N whitespace tokens — a cheap
    near-dup blocking key (rolling-hash stand-in, engine-portable)."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    return F.md5(F.array_join(F.slice(toks, 1, prefix_tokens), " "))


def quality_flags(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document quality stats + low-quality verdict, integers and
    booleans only.  Thresholds follow common corpus-filtering heuristics
    (too short, digit-heavy, long-token garbage)."""
    nt = n_tokens(text_col)
    nc = n_chars(text_col)
    nd = n_digit_chars(text_col)
    # mean token length x100 as integer: (chars - (tokens-1)) / tokens
    # assumes single-space joins are close enough for a heuristic
    mean_tok_x100 = F.when(
        nt > 0, F.floor((100 * (nc - (nt - 1))) / nt)
    ).otherwise(F.lit(0)).cast("long")
    low = (
        (nt < F.lit(5))
        | (10 * nd > 3 * nc)  # >30% digits
        | (mean_tok_x100 > 1500)  # mean token length > 15 chars
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        nt.alias("n_tokens"),
        nc.alias("n_chars"),
        nd.alias("n_digit_chars"),
        mean_tok_x100.alias("mean_token_len_x100"),
        low.alias("is_low_quality"),
    )


# Tiny stopword inventories for a deterministic n-gram/stopword language
# guess — a heuristic stand-in for fasttext-style LID, engine-portable.
LID_MARKERS = {
    "en": ["the", "and", "of", "is"],
    "de": ["der", "und", "die", "ist"],
    "fr": ["le", "et", "la", "est"],
    "es": ["el", "y", "la", "es"],
}


def lang_guess(text_col: str = "text") -> Column:
    """Pick the language whose marker words hit most often; ties and
    zero hits -> 'und' (undetermined).  Pure built-ins: the padded
    ' text ' LIKE ' marker ' trick counts word occurrences."""
    padded = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))

    def score(lang: str) -> Column:
        s = F.lit(0)
        for m in LID_MARKERS[lang]:
            # split-count word occurrences: size(split(padded, ' m ')) - 1
            s = s + F.size(F.split(padded, f" {m} ")) - 1
        return s

    scores = [(lang, score(lang)) for lang in LID_MARKERS]
    best = F.greatest(*[s for _, s in scores])
    guess = F.lit("und")
    for lang, s in reversed(scores):
        guess = F.when((best > 0) & (s == best), F.lit(lang)).otherwise(guess)
    return guess


# GPT-2-style pre-tokenizer pattern restricted to ASCII classes so Java
# regex (Spark) and RE2 (DuckDB) agree byte-for-byte: a token is an
# optionally space-prefixed letter run, digit run, or punctuation run,
# or a whitespace run.  Counting these approximates BPE token counts
# (the pre-tokenization step is where the count structure comes from)
# without shipping a vocab.
BPE_ISH_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def n_bpe_ish_tokens(text_col: str = "text") -> Column:
    """BPE-ish token count: matches of the GPT-2-style pre-tokenizer
    pattern (ASCII classes only, engine-portable)."""
    return F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), 0)
    ).cast("long")


# Compact English stopword inventory for the ratio heuristic (corpus
# quality filters typically threshold on stopword density; a fuller list
# is a one-line swap).
STOPWORDS_EN = (
    "the", "and", "of", "is", "a", "to", "in", "it", "that", "for",
)


def stopword_hits(text_col: str = "text", stopwords=STOPWORDS_EN) -> Column:
    """Total stopword occurrences (repeats counted) via the padded
    split-count trick — pure built-ins, engine-portable."""
    padded = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))
    s = F.lit(0)
    for m in stopwords:
        s = s + F.size(F.split(padded, f" {m} ")) - 1
    return s.cast("long")


def stopword_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document stopword density, integer-exact:
    (doc_id, n_tokens, sw_hits, sw_ratio_x100 = floor(100*hits/tokens)).
    Low stopword density on natural-language text is a standard
    machine-generated/garbage signal."""
    nt = n_tokens(text_col)
    hits = stopword_hits(text_col)
    return df.select(
        F.col(id_col).alias("doc_id"),
        nt.alias("n_tokens"),
        hits.alias("sw_hits"),
        F.when(nt > 0, F.floor((100 * hits) / nt))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("sw_ratio_x100"),
    )


def corpus_stats_by_lang(
    df: DataFrame, lang_col: str = "lang", text_col: str = "text"
) -> DataFrame:
    """Per-language corpus aggregates (all integer-exact)."""
    return (
        df.select(
            F.col(lang_col).alias("lang"),
            n_tokens(text_col).alias("nt"),
            n_chars(text_col).alias("nc"),
            n_digit_chars(text_col).alias("nd"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").alias("sum_tokens"),
            F.sum("nc").alias("sum_chars"),
            F.sum("nd").alias("sum_digit_chars"),
        )
    )


# --- PII scrubbing ---------------------------------------------------------

# Engine-portable patterns (same semantics under Java regex and RE2):
# no backreferences, no lookaround, explicit character classes.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9()\-\s]{6,}[0-9]"


def redact_pii(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Scrub emails/phone numbers from a document column — the standard
    pretraining-pipeline PII pass, pure Catalyst (regexp_replace is
    codegen'd; no Python).  Returns (id, redacted, n_emails, n_phones);
    the match counts feed the pipeline's audit metrics."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
        ).alias("redacted"),
        F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), 0)).alias(
            "n_emails"
        ),
        F.size(F.regexp_extract_all(t, F.lit(PHONE_RE), 0)).alias(
            "n_phones"
        ),
    )
