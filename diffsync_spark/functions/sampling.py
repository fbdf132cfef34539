"""Deterministic sampling operators for training-data pipelines.

A 100 TB corpus is never trained on whole: pipelines downsample by source /
language / quality stratum, carve held-out splits, and need all of it to be
REPRODUCIBLE — rerunning the job (or re-reading a partition after a task
retry) must select the same rows. Spark's ``df.sample`` is seeded per
partition-split and changes membership when the partitioning changes, so
every operator here derives membership from a content hash of the row's key
instead: pure column expressions, no state, no RNG, stable under
repartitioning, task retries, and cluster-size changes.

Engine-portable by construction: membership is decided by comparing a
lowercase-hex ``md5`` prefix (identical bytes → identical hex in every
engine), so the DuckDB oracle can reproduce bit-exact membership —
unlike ``xxhash64``/``F.hash``, which are Spark-private.

Scale notes:
- ``hash_sample`` is a pure filter — pushes past shuffles, costs one md5
  per row, no exchange at all.
- ``stratified_sample`` is one shuffle on the strata columns + a window
  rank; the order key is the key hash, so quota selection is unbiased and
  deterministic. Hot strata are bounded by the quota itself (the window
  emits at most n rows per stratum after rank pruning — Spark's
  WindowExec still sorts the stratum, so a pathological mega-stratum is
  sort-bound; cap it upstream with ``hash_sample`` first).
- ``split_column`` adds a label, no shuffle; splits are disjoint and
  exhaustive by interval partition of the hash space.

Reference analog: none (the reference has no sampling surface); this is the
training-data-pipeline family mandated by the build brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# 16^8 — the md5-prefix space: 8 hex chars = 32 bits, plenty of resolution
# for sampling fractions down to ~2e-10.
_SPACE = 16 ** 8


def _key_hash(key_cols: list[str], salt: str) -> Column:
    """Lowercase md5 hex of the salted, ``|``-joined key columns."""
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in key_cols]
    return F.md5(F.concat_ws("|", F.lit(salt), *parts))


def _hex_threshold(fraction: float) -> str:
    """8-hex-char cutoff such that P(md5_prefix < cutoff) == fraction
    (to within 1/2^32). Hex-string comparison of equal-length lowercase
    hex is monotone in the underlying integer, so the filter is a plain
    string ``<`` — no hex→int conversion needed on either engine."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    if fraction >= 1.0:
        return "g" * 8  # sorts above every hex char → keep-all sentinel
    return format(int(fraction * _SPACE), "08x")


def hash_sample(
    df: DataFrame,
    fraction: float,
    key_cols: list[str],
    salt: str = "",
) -> DataFrame:
    """Deterministic Bernoulli sample: keep a row iff
    ``md5(salt|key) prefix < fraction`` of the hash space.

    Membership depends only on (key, salt) — stable across reruns,
    repartitioning, and engines. Different salts give independent samples
    over the same keys (e.g. one per ablation).
    """
    cutoff = _hex_threshold(fraction)
    return df.filter(F.substring(_key_hash(key_cols, salt), 1, 8) < cutoff)


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    n_per_stratum: int,
    key_cols: list[str],
    salt: str = "",
) -> DataFrame:
    """Exact per-stratum quota: the ``n_per_stratum`` rows of each stratum
    with the smallest key hashes (a deterministic uniform draw without
    replacement). Ties are impossible at md5 width for distinct keys.

    One shuffle (strata columns) + window rank; prune with ``hash_sample``
    first if a stratum can exceed executor sort budgets.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*strata_cols).orderBy(_key_hash(key_cols, salt))
    return (
        df.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= n_per_stratum)
        .drop("__r")
    )


def split_column(
    key_cols: list[str],
    weights: dict[str, float],
    salt: str = "",
) -> Column:
    """Label column assigning each row to a named split (train/valid/test…)
    by interval partition of the hash space: disjoint, exhaustive,
    deterministic. ``weights`` must sum to 1 (±1e-9); iteration order of
    the dict defines the intervals."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    h = F.substring(_key_hash(key_cols, salt), 1, 8)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cutoff = format(min(int(acc * _SPACE), _SPACE - 1), "08x")
        expr = (F.when(h < cutoff, name) if expr is None
                else expr.when(h < cutoff, name))
    return (F.lit(names[0]) if expr is None else expr.otherwise(names[-1])).alias(
        "split"
    )


def _key_hash_sql(key_cols: list[str], salt: str) -> str:
    """DuckDB twin of ``_key_hash`` — the FULL 32-hex md5 (order twin)."""
    parts = " , ".join(
        f"coalesce(CAST({c} AS VARCHAR), chr(0))" for c in key_cols
    )
    return f"md5(concat_ws('|', '{salt}', {parts}))"


def repeat_dataset(
    df: DataFrame,
    factor: float,
    key_cols: list[str],
    salt: str = "",
) -> DataFrame:
    """Fractional repetition ("2.3 epochs of source A") for training
    mixes: every row appears ``floor(factor)`` times, and the
    deterministic ``fraction``-slice of rows (same md5 membership rule as
    :func:`hash_sample`) appears once more, so the dataset's expected
    multiplicity is exactly ``factor`` and membership of the extra copy is
    stable across reruns. Adds ``copy_idx`` (0-based).

    Pure Generate (explode of a per-row ``sequence``) — no shuffle, no
    driver loop; downstream shuffles see the copies as ordinary rows.
    Combine with a per-source factor to build weighted corpus mixes.
    """
    if factor < 0:
        raise ValueError(f"factor must be >= 0, got {factor}")
    base = int(factor)
    frac = factor - base
    cutoff = _hex_threshold(frac)
    extra = (
        F.substring(_key_hash(key_cols, salt), 1, 8) < cutoff
    ).cast("int")
    n_copies = (F.lit(base) + extra).cast("int")
    idx = F.when(
        n_copies > 0, F.sequence(F.lit(0), n_copies - 1)
    ).otherwise(F.expr("array()").cast("array<int>"))
    return df.withColumn("copy_idx", F.explode(idx))


def repeat_sql(
    table_expr: str, factor: float, key_cols: list[str], salt: str = ""
) -> str:
    """DuckDB twin of :func:`repeat_dataset` (bit-exact copies)."""
    base = int(factor)
    cutoff = _hex_threshold(factor - base)
    h = f"substr({_key_hash_sql(key_cols, salt)}, 1, 8)"
    return f"""
SELECT t.*, CAST(unnest(range(0,
         {base} + CASE WHEN {h} < '{cutoff}' THEN 1 ELSE 0 END)) AS INT)
       AS copy_idx
FROM ({table_expr}) t"""


def filter_top_fraction(
    df: DataFrame,
    score_col: str,
    fraction: float,
    strata_cols: list[str] | None = None,
    exact: bool = True,
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Quality filtering: keep the top ``fraction`` of rows by ``score_col``
    within each stratum (whole frame if ``strata_cols`` is None).

    ``exact=True`` uses ``percent_rank`` over a per-stratum sort — integer
    rank arithmetic, so membership is engine-portable and deterministic
    (ties share a rank and survive or fall together; add ``tiebreak_cols``
    to break them). Costs one sort per stratum — fine up to stratum sizes
    that fit an executor's sort budget.

    ``exact=False`` is the 100 TB path: ``approx_percentile`` computes one
    threshold per stratum (tiny frame), broadcast-joined back as a filter —
    no per-stratum sort, two scans, error bounded by the sketch accuracy.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    # endpoints are degenerate in BOTH paths (percent_rank of the last row
    # is exactly 1.0; a 0-quantile threshold keeps the max) — handle them
    # explicitly so exact and approx agree everywhere
    if fraction == 0.0:
        return df.filter(F.lit(False))
    if fraction == 1.0:
        return df
    strata = strata_cols or []
    if exact:
        from pyspark.sql import Window

        order = [F.col(score_col).desc()] + [F.col(c) for c in tiebreak_cols]
        w = (Window.partitionBy(*strata) if strata else Window.partitionBy()
             ).orderBy(*order)
        return (
            df.withColumn("__pr", F.percent_rank().over(w))
            .filter(F.col("__pr") < fraction)
            .drop("__pr")
        )
    agg = [
        F.approx_percentile(score_col, 1.0 - fraction, 10_000).alias("__thr")
    ]
    if strata:
        thr = df.groupBy(*strata).agg(*agg)
        # null-safe key equality: a NULL stratum is a stratum, not a
        # dropped row (plain `on=strata` would silently lose it)
        renamed = thr.select(
            *[F.col(c).alias(f"__s_{c}") for c in strata], "__thr"
        )
        cond = None
        for c in strata:
            clause = F.col(c).eqNullSafe(F.col(f"__s_{c}"))
            cond = clause if cond is None else cond & clause
        joined = df.join(F.broadcast(renamed), cond, "inner").drop(
            *[f"__s_{c}" for c in strata]
        )
    else:
        joined = df.crossJoin(F.broadcast(df.agg(*agg)))
    return joined.filter(F.col(score_col) >= F.col("__thr")).drop("__thr")


def sample_sql(
    fraction: float, key_cols: list[str], salt: str = ""
) -> str:
    """DuckDB predicate twin of ``hash_sample`` (bit-exact membership)."""
    return (
        f"substr({_key_hash_sql(key_cols, salt)}, 1, 8)"
        f" < '{_hex_threshold(fraction)}'"
    )


def split_sql(
    key_cols: list[str], weights: dict[str, float], salt: str = ""
) -> str:
    """DuckDB expression twin of ``split_column`` (bit-exact labels)."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    h = f"substr({_key_hash_sql(key_cols, salt)}, 1, 8)"
    names = list(weights)
    if len(names) == 1:
        return f"'{names[0]}'"
    clauses, acc = [], 0.0
    for name in names[:-1]:
        acc += weights[name]
        cutoff = format(min(int(acc * _SPACE), _SPACE - 1), "08x")
        clauses.append(f"WHEN {h} < '{cutoff}' THEN '{name}'")
    return f"CASE {' '.join(clauses)} ELSE '{names[-1]}' END"

def mix_weighted(
    df: DataFrame,
    source_col: str,
    weights: dict[str, float],
    key_cols: list[str],
    salt: str = "mix",
    default_weight: float = 0.0,
) -> DataFrame:
    """Weighted multi-corpus training mix in ONE Generate pass: each row's
    expected multiplicity is its source's weight ("2.3 epochs of src A,
    0.5 of src B, drop the rest"). Per row: ``floor(w)`` guaranteed copies
    plus one more for the deterministic md5-slice of size ``frac(w)`` —
    the same engine-portable membership rule as :func:`hash_sample` /
    :func:`repeat_dataset`, so membership is stable across reruns and
    engines. Adds ``copy_idx`` (0-based); weight-0 sources drop out.

    Scale shape: a literal ``create_map`` lookup + Generate — no shuffle,
    no per-source scans, no union of N filtered branches; one pass over
    the corpus regardless of source count. Sources absent from
    ``weights`` get ``default_weight``.
    """
    if not weights:
        raise ValueError(
            "weights must name at least one source (use repeat_dataset for "
            "a uniform factor)"
        )
    for s, w in weights.items():
        if w < 0:
            raise ValueError(f"weight for {s!r} must be >= 0, got {w}")
    if default_weight < 0:
        raise ValueError(f"default_weight must be >= 0, got {default_weight}")
    base_map = F.create_map(
        *[F.lit(x) for s, w in weights.items() for x in (s, int(w))]
    )
    cut_map = F.create_map(
        *[F.lit(x) for s, w in weights.items()
          for x in (s, _hex_threshold(w - int(w)))]
    )
    src = F.col(source_col).cast("string")
    base = F.coalesce(base_map[src], F.lit(int(default_weight)))
    cutoff = F.coalesce(
        cut_map[src],
        F.lit(_hex_threshold(default_weight - int(default_weight))),
    )
    extra = (F.substring(_key_hash(key_cols, salt), 1, 8) < cutoff).cast("int")
    n_copies = (base + extra).cast("int")
    idx = F.when(
        n_copies > 0, F.sequence(F.lit(0), n_copies - 1)
    ).otherwise(F.expr("array()").cast("array<int>"))
    return df.withColumn("copy_idx", F.explode(idx))


def mix_sql(
    table_expr: str,
    source_col: str,
    weights: dict[str, float],
    key_cols: list[str],
    salt: str = "mix",
    default_weight: float = 0.0,
) -> str:
    """DuckDB twin of :func:`mix_weighted` (bit-exact copies)."""
    if not weights:
        raise ValueError("weights must name at least one source")
    h = f"substr({_key_hash_sql(key_cols, salt)}, 1, 8)"
    base_case = (
        f"CASE CAST({source_col} AS VARCHAR) "
        + " ".join(f"WHEN '{s}' THEN {int(w)}" for s, w in weights.items())
        + f" ELSE {int(default_weight)} END"
    )
    cut_case = (
        f"CASE CAST({source_col} AS VARCHAR) "
        + " ".join(
            f"WHEN '{s}' THEN '{_hex_threshold(w - int(w))}'"
            for s, w in weights.items()
        )
        + f" ELSE '{_hex_threshold(default_weight - int(default_weight))}' END"
    )
    return f"""
SELECT t.*, CAST(unnest(range(0,
         {base_case} + CASE WHEN {h} < {cut_case} THEN 1 ELSE 0 END)) AS INT)
       AS copy_idx
FROM ({table_expr}) t"""
