"""Text analysis operators — language ID, quality scoring, token counting,
document fingerprinting. Pure ``pyspark.sql.functions`` column expressions:
whole-stage codegen end to end, no Python in the data path, and each has an
ANSI-SQL twin for the DuckDB oracle (same arithmetic, same results).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

TOKEN_SPLIT = r"\s+"
# BPE-ish word/number/punct segmentation (public GPT-2-style pattern family,
# simplified to RE2-safe form: word runs, digit runs, single punct marks)
BPE_ISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "una", "por", "con"],
    "de": ["der", "die", "das", "und", "ist", "von", "ein", "mit", "zu", "den"],
    "fr": ["le", "la", "de", "et", "un", "une", "est", "que", "pour", "dans"],
}

FP_MOD = 1_000_000_007
FP_MUL = 31


def tokens_col(text: Column, pattern: str = TOKEN_SPLIT) -> Column:
    """Whitespace tokens; empty string → empty array (split('') yields [''])."""
    return F.filter(F.split(F.trim(text), pattern), lambda t: t != "")


def token_count_col(text: Column, mode: str = "whitespace") -> Column:
    """Token count: 'whitespace' split or 'bpe' (BPE-ish regex segmentation
    via regexp_count — still one JVM expression)."""
    if mode == "whitespace":
        return F.size(tokens_col(text))
    if mode == "bpe":
        return F.regexp_count(text, F.lit(BPE_ISH))
    raise ValueError(f"unknown token mode {mode}")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document quality scoring: length, token stats, punctuation/uppercase
    ratios, English stopword ratio, and a composite [0,1] quality score —
    the standard pretraining-corpus heuristics, all as column arithmetic."""
    t = F.col(text_col)
    # materialize the token array ONCE: its three consumers (count, stopword
    # filter, mean length) sit inside/beside higher-order lambdas, which run
    # interpreted without subexpression elimination — referencing the
    # expression thrice re-tokenizes thrice (same class of waste as the
    # minhash 64x shingle recompute; CollapseProject keeps the projection
    # split because the expression is not cheap to duplicate)
    out0 = df.withColumn("__toks", tokens_col(t))
    toks = F.col("__toks")
    n_chars = F.length(F.coalesce(t, F.lit("")))
    n_tokens = F.size(toks)
    n_punct = F.regexp_count(t, F.lit(r"[^\w\s]"))
    n_upper = F.regexp_count(t, F.lit(r"[A-Z]"))
    sw = STOPWORDS["en"]
    n_stop = F.size(F.filter(toks, lambda x: F.lower(x).isin(sw)))
    safe_tokens = F.greatest(n_tokens, F.lit(1))
    safe_chars = F.greatest(n_chars, F.lit(1))
    out = (
        out0.withColumn("n_chars_q", n_chars)
        .withColumn("n_tokens", n_tokens)
        .withColumn("mean_token_len", F.round(n_chars / safe_tokens, 4))
        .withColumn("punct_ratio", F.round(n_punct / safe_chars, 4))
        .withColumn("upper_ratio", F.round(n_upper / safe_chars, 4))
        .withColumn("stopword_ratio", F.round(n_stop / safe_tokens, 4))
        .drop("__toks")
    )
    score = (
        F.least(F.col("n_tokens") / F.lit(64.0), F.lit(1.0)) * 0.4
        + F.least(F.col("stopword_ratio") * F.lit(4.0), F.lit(1.0)) * 0.4
        + (F.lit(1.0) - F.least(F.col("punct_ratio") * F.lit(4.0), F.lit(1.0))) * 0.2
    )
    return out.withColumn("quality_score", F.round(score, 4))


def lang_id(text: Column) -> Column:
    """Heuristic language ID: per-language stopword hit-rate argmax over
    {en, es, de, fr}, with 'unk' when nothing matches (ties: lexicographically
    greatest language, via struct max). A real system plugs a model in via
    mapInPandas; this is the cheap JVM-side first pass used for corpus
    partitioning.

    One ``aggregate`` pass over the tokens, counting all four languages per
    token, with the argmax inside the ``finish`` lambda — the earlier
    one-filter-per-language form referenced the token array four times, and
    higher-order lambdas run interpreted with no subexpression elimination,
    so the text was re-tokenized per language."""
    toks = tokens_col(text)
    zero = F.struct(*[F.lit(0).alias(lang) for lang in STOPWORDS])

    def step(acc, x):
        lx = F.lower(x)
        return F.struct(
            *[
                (acc[lang] + F.when(lx.isin(words), 1).otherwise(0)).alias(lang)
                for lang, words in STOPWORDS.items()
            ]
        )

    def finish(acc):
        best = F.array_max(
            F.array(
                *[
                    F.struct(acc[lang].alias("hits"), F.lit(lang).alias("lang"))
                    for lang in STOPWORDS
                ]
            )
        )
        return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("unk"))

    # NULL text → NULL token array → NULL aggregate; the contract is 'unk'
    # for anything without a stopword hit, NULLs included
    return F.coalesce(F.aggregate(toks, zero, step, finish), F.lit("unk"))


def fingerprint_col(text: Column) -> Column:
    """Deterministic document fingerprint: polynomial rolling hash over
    whitespace tokens, mixing each token's length and first/last char codes.
    Engine-portable arithmetic (same result in DuckDB via list_reduce), all
    mod 1e9+7 so it never overflows BIGINT."""
    toks = tokens_col(text)
    tok_val = lambda x: (  # noqa: E731
        F.length(x) * F.lit(131)
        + F.ascii(x)
        + F.ascii(F.substring(x, -1, 1)) * F.lit(7)
    ).cast("long")
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * FP_MUL + tok_val(x)) % FP_MOD,
    )


def fingerprint_sql(text_expr: str) -> str:
    """The DuckDB twin of :func:`fingerprint_col` (same arithmetic)."""
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(list_filter(string_split_regex(trim({text_expr}), '\\s+'), "
        f"t -> t != ''), "
        f"t -> CAST(length(t) * 131 + ascii(t) + ascii(t[-1]) * 7 AS BIGINT))), "
        f"(acc, x) -> (acc * {FP_MUL} + x) % {FP_MOD})"
    )


# PII/URL scrubbing — a standard pre-training text-cleaning stage. Pure
# column expressions (JVM regexp, no Python); patterns are deliberately
# conservative (high precision) because over-scrubbing destroys training
# signal. Each class is replaced by a stable placeholder token so document
# structure (and token counts) stay comparable before/after.
_SCRUB_RULES: tuple[tuple[str, str, str], ...] = (
    ("url", r"https?://[^\s]+", "<|url|>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<|email|>"),
    # international-ish phone numbers: +CC then 8+ digits with separators
    ("phone", r"\+\d[\d\-\s()]{7,}\d", "<|phone|>"),
    # 13-16 digit card-like runs (with optional space/dash groups)
    ("card", r"\b\d{4}[ -]?\d{4}[ -]?\d{4}[ -]?\d{1,4}\b", "<|card|>"),
)


def scrub_text(text: Column) -> Column:
    """Replace URLs, emails, phone numbers and card-like digit runs with
    placeholder tokens. Deterministic, order-sensitive (URLs first so an
    email inside a URL is not double-matched)."""
    out = text
    for _, pattern, token in _SCRUB_RULES:
        out = F.regexp_replace(out, pattern, token)
    return out


def scrub_sql(text_expr: str) -> str:
    """DuckDB twin of :func:`scrub_text` (same rules, same order) for the
    driver oracle."""
    out = text_expr
    for _, pattern, token in _SCRUB_RULES:
        out = f"regexp_replace({out}, '{pattern}', '{token}', 'g')"
    return out
