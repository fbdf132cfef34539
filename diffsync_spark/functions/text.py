"""Text analysis operators — language ID, quality scoring, token counting,
document fingerprinting. Pure ``pyspark.sql.functions`` column expressions:
whole-stage codegen end to end, no Python in the data path, and each has an
ANSI-SQL twin for the DuckDB oracle (same arithmetic, same results).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

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


def remove_boilerplate_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_docs: int | None = None,
    max_doc_frac: float = 0.05,
    min_line_chars: int = 6,
) -> DataFrame:
    """Corpus-wide line-level dedup (the RefinedWeb/CCNet boilerplate
    pass): a line whose normalized form appears in more than ``max_docs``
    distinct documents (default: ``max_doc_frac`` of the corpus) is
    navigation/footer/cookie-wall boilerplate and is dropped from EVERY
    document; remaining lines are reassembled in original order. Lines
    shorter than ``min_line_chars`` after trimming are always kept (short
    common lines — list bullets, closings — are content, and counting
    them would make the frequency table needlessly hot).

    Output: ``(id_col, clean_text, n_lines, n_dropped)`` — one row per
    input document, ALWAYS: a document whose every line is boilerplate
    comes back with ``clean_text=''`` and ``n_lines=0`` (realistic for
    pure cookie-wall pages), never silently dropped.

    Scale shape: lines shuffle as 8-byte xxhash64 keys (never the line
    text) for the distinct-doc count; the resulting boilerplate key set is
    tiny by construction (only keys above the frequency threshold) and
    broadcast back — the corpus itself is scanned twice but never
    shuffled by line, and the reassembly groups by ``id_col`` only.
    """
    lines = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
        ).alias("pos", "line"),
    )
    norm = F.lower(F.trim(F.col("line")))
    countable = F.length(norm) >= min_line_chars
    lk = F.xxhash64(norm)
    if max_docs is None:
        n_total = df.count()  # one tiny agg job, a driver scalar like the
        # dim probes — the threshold must be a literal for the broadcast
        max_docs = max(1, int(max_doc_frac * n_total))
    boiler = (
        lines.filter(countable)
        .select(lk.alias("lk"), id_col)
        .distinct()
        .groupBy("lk")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") > max_docs)
        .select("lk")
    )
    tagged = lines.withColumn(
        "__lk", F.when(countable, lk)  # NULL for always-kept short lines
    )
    # LEFT join (not anti) + conditional aggregation: every document keeps
    # its output row even when all its lines are boilerplate, and one
    # groupBy produces clean_text/n_lines/n_dropped together (collect_list
    # skips the NULLs the when() leaves for dropped lines)
    dropped = F.col("lk").isNotNull()
    flagged = tagged.join(
        F.broadcast(boiler), tagged["__lk"] == boiler["lk"], "left"
    )
    return flagged.groupBy(id_col).agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(~dropped, F.struct("pos", "line"))
                    )
                ),
                lambda s: s["line"],
            ),
        ).alias("clean_text"),
        F.count_if(~dropped).alias("n_lines"),
        F.count_if(dropped).alias("n_dropped"),
    )


def boilerplate_sql(
    table_expr: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_docs: int = 10,
    min_line_chars: int = 6,
) -> str:
    """DuckDB twin of :func:`remove_boilerplate_lines` (explicit
    ``max_docs`` — the caller pins the threshold so both engines share a
    literal)."""
    return f"""
WITH lines AS (
  SELECT {id_col}, u.line, u.pos
  FROM ({table_expr}) t,
       LATERAL (SELECT unnest(string_split(coalesce({text_col}, ''),
                                           chr(10))) AS line,
                       generate_subscripts(string_split(
                         coalesce({text_col}, ''), chr(10)), 1) AS pos) u),
boiler AS (
  SELECT lower(trim(line)) AS nl
  FROM (SELECT DISTINCT lower(trim(line)) AS line, {id_col}
        FROM lines WHERE length(trim(line)) >= {min_line_chars})
  GROUP BY 1 HAVING count(*) > {max_docs}),
flagged AS (
  SELECT l.*,
         (length(trim(l.line)) >= {min_line_chars}
          AND lower(trim(l.line)) IN (SELECT nl FROM boiler)) AS dropped
  FROM lines l)
SELECT {id_col},
       coalesce(string_agg(CASE WHEN NOT dropped THEN line END, chr(10)
                           ORDER BY pos), '') AS clean_text,
       CAST(coalesce(sum(CASE WHEN NOT dropped THEN 1 END), 0) AS BIGINT)
         AS n_lines,
       CAST(coalesce(sum(CASE WHEN dropped THEN 1 END), 0) AS BIGINT)
         AS n_dropped
FROM flagged GROUP BY {id_col}"""


# ----------------------------------------------------------------- real BPE
# Byte-pair-encoding token counting against a REAL merges table (the public
# GPT-2 ``merges.txt`` format: one "left right" pair per line, rank = line
# order), so pack_sequences/assemble budgets match an actual tokenizer
# instead of the whitespace proxy. No tokenizer libraries exist in this
# environment, so the merges table is caller-supplied data (load any public
# merges.txt, or train a small one with train_bpe_merges).
#
# Split of responsibilities:
# - bpe_encode_py: the straightforward SCALAR reference (pretokenize ->
#   greedy lowest-rank merge loop per word) — the differential-test oracle.
# - bpe_token_count: the DataFrame operator — ONE Arrow-batched pandas UDF
#   whose implementation is deliberately different from the oracle: it
#   encodes each UNIQUE pretoken once per batch (factorize + cache) and
#   distributes counts back, so caching/vectorization bugs can't hide.
#   The merges dict rides a SparkContext broadcast (one copy per executor,
#   not per task — a 50k-merge GPT-2 table is ~1 MB).

# Simplified ASCII pretokenizer in the GPT-2 pattern family, RE2-SAFE (no
# lookahead: python re, Java regex, and DuckDB/RE2 all parse it the same —
# the DuckDB oracle twin depends on that). Divergence from byte-level
# GPT-2: \p classes -> ASCII runs, and a whitespace run stays one piece
# instead of donating its last space to the next word. The merge algebra
# itself is exact.
BPE_PRETOKEN = (
    r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"
)


def parse_merges(lines) -> dict:
    """``merges.txt`` lines -> {(left, right): rank}. Skips the optional
    ``#version`` header and blank lines."""
    ranks: dict = {}
    for ln in lines:
        ln = ln.rstrip("\n")
        if not ln or ln.startswith("#"):
            continue
        a, _, b = ln.partition(" ")
        if b:
            ranks[(a, b)] = len(ranks)
    return ranks


def bpe_encode_py(word: str, ranks: dict) -> list:
    """Reference scalar BPE: split to characters, repeatedly merge the
    adjacent pair with the lowest rank until none is mergeable."""
    parts = list(word)
    while len(parts) > 1:
        best, best_i = None, -1
        for i in range(len(parts) - 1):
            r = ranks.get((parts[i], parts[i + 1]))
            if r is not None and (best is None or r < best):
                best, best_i = r, i
        if best is None:
            break
        parts[best_i:best_i + 2] = [parts[best_i] + parts[best_i + 1]]
    return parts


def bpe_count_py(text: str, ranks: dict, pattern: str = BPE_PRETOKEN) -> int:
    """Reference scalar token count: pretokenize, BPE-encode each piece."""
    import re as _re

    if not text:
        return 0
    return sum(len(bpe_encode_py(w, ranks))
               for w in _re.findall(pattern, text))


def train_bpe_merges(corpus, n_merges: int = 200,
                     pattern: str = BPE_PRETOKEN) -> list:
    """Tiny deterministic BPE trainer (the public Sennrich et al. 2016
    procedure) over an iterable of strings — enough to produce a REAL,
    self-consistent merges table for tests and demos. Returns merges.txt
    lines. Ties break lexicographically so training is reproducible."""
    import re as _re
    from collections import Counter

    words = Counter()
    for text in corpus:
        for w in _re.findall(pattern, text or ""):
            words[tuple(w)] += 1
    merges: list = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for parts, n in words.items():
            for i in range(len(parts) - 1):
                pairs[(parts[i], parts[i + 1])] += n
        if not pairs:
            break
        (a, b), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < 2:
            break
        merges.append(f"{a} {b}")
        merged = {}
        for parts, cnt in words.items():
            out, i = [], 0
            while i < len(parts):
                if i + 1 < len(parts) and parts[i] == a and parts[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(parts[i])
                    i += 1
            key = tuple(out)
            merged[key] = merged.get(key, 0) + cnt
        words = Counter(merged)
    return merges


def bpe_token_count(
    df: DataFrame,
    merges,
    text_col: str = "text",
    out_col: str = "n_bpe_tokens",
    pattern: str = BPE_PRETOKEN,
) -> DataFrame:
    """Add ``out_col`` = real-BPE token count of ``text_col``. ``merges``
    is merges.txt lines or a pre-parsed {(a, b): rank} dict. One
    Arrow-batched pandas UDF; each batch encodes every UNIQUE pretoken
    once (corpus text repeats heavily — the cache is the fast path) and
    the merges table is a broadcast, not a per-task pickle."""
    import re as _re

    ranks = merges if isinstance(merges, dict) else parse_merges(merges)
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(ranks)
    rx = _re.compile(pattern)

    @pandas_udf("long")
    def _count(texts: pd.Series) -> pd.Series:
        rk = bc.value
        cache: dict = {}

        def piece_len(w: str) -> int:
            n = cache.get(w)
            if n is None:
                # encode by merge-rank order over this word only
                parts = list(w)
                while len(parts) > 1:
                    best, best_i = None, -1
                    for i in range(len(parts) - 1):
                        r = rk.get((parts[i], parts[i + 1]))
                        if r is not None and (best is None or r < best):
                            best, best_i = r, i
                    if best is None:
                        break
                    parts[best_i:best_i + 2] = [
                        parts[best_i] + parts[best_i + 1]]
                n = len(parts)
                cache[w] = n
            return n

        return texts.map(
            lambda t: 0 if not t else sum(piece_len(w)
                                          for w in rx.findall(t)),
            na_action=None,
        ).fillna(0).astype("int64")

    return df.withColumn(out_col, _count(F.col(text_col)))


def bpe_count_sql(
    table_expr: str,
    merges,
    text_col: str = "text",
    id_col: str = "doc_id",
    pattern: str = BPE_PRETOKEN,
) -> str:
    """DuckDB twin of :func:`bpe_token_count`: the merge fixpoint as a
    recursive CTE over UNIQUE pretokens (same dedup the UDF's cache does),
    ranks embedded as a MAP literal keyed ``left || chr(31) || right``.
    Requires the RE2-safe ``BPE_PRETOKEN`` (no lookahead)."""
    ranks = merges if isinstance(merges, dict) else parse_merges(merges)

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    map_lit = (
        "MAP([" + ",".join(q(a) + " || chr(31) || " + q(b) for a, b in ranks)
        + "], [" + ",".join(str(v) for v in ranks.values()) + "])"
    )
    pat = pattern.replace("'", "''")
    return f"""
WITH RECURSIVE
pre AS (
  SELECT {id_col},
         unnest(regexp_extract_all(coalesce({text_col}, ''), '{pat}')) AS w
  FROM ({table_expr})),
enc AS (
  SELECT w, regexp_extract_all(w, '.') AS parts, {map_lit} AS m
  FROM (SELECT DISTINCT w FROM pre)
  UNION ALL
  SELECT w,
         parts[1:bi-1] || [parts[bi] || parts[bi+1]] || parts[bi+2:] AS parts,
         m
  FROM (
    SELECT w, parts, m,
           list_position(rl, list_aggregate(
             list_filter(rl, x -> x IS NOT NULL), 'min')) AS bi
    FROM (
      SELECT w, parts, m,
             list_transform(range(1, len(parts)),
               i -> element_at(m, parts[i] || chr(31) || parts[i+1])[1]) AS rl
      FROM enc)
    WHERE len(list_filter(rl, x -> x IS NOT NULL)) > 0)),
final AS (SELECT w, min(len(parts)) AS n FROM enc GROUP BY w)
SELECT d.{id_col}, CAST(coalesce(sum(f.n), 0) AS BIGINT) AS n_bpe_tokens
FROM (SELECT DISTINCT {id_col} FROM ({table_expr})) d
LEFT JOIN pre p ON d.{id_col} = p.{id_col}
LEFT JOIN final f USING (w)
GROUP BY d.{id_col}"""
