"""Scalar/aggregate expression helpers (SURVEY.md §2.8).

The key design constraint: query results must hash-match an independent
engine (DuckDB) value-for-value.  Floating-point SUM/AVG are
order-dependent, and Spark's shuffle order differs run to run — so all
money/measure aggregation goes through exact decimal accumulation and is
only cast back to double at the end.  The same expression shape is used
in the SQL oracles, giving bit-identical doubles on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dsum(col: Column | str, precision: int = 25, scale: int = 10) -> Column:
    """Order-independent SUM of a double column, exact.

    Casts each value to DECIMAL(precision, scale) (exact for inputs with
    <= `scale` fractional digits), sums exactly, casts the total back to
    double.  Oracle-side equivalent:
    ``CAST(SUM(CAST(x AS DECIMAL(25,10))) AS DOUBLE)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")


def dsum_sql(expr: str, precision: int = 25, scale: int = 10) -> str:
    """The DuckDB-side twin of :func:`dsum` for oracle SQL strings.

    The decimal->double cast goes through VARCHAR: DuckDB's direct
    DECIMAL(38,s)->DOUBLE cast divides the raw int128 by 10^s in float
    and is NOT correctly rounded once the scaled integer exceeds 2^53,
    while VARCHAR->DOUBLE (strtod) and Spark's BigDecimal->double both
    round correctly — so this form is bit-identical to Spark's.
    """
    return (
        f"CAST(CAST(SUM(CAST({expr} AS DECIMAL({precision},{scale}))) AS VARCHAR) AS DOUBLE)"
    )


def davg(col: Column | str) -> Column:
    """Order-independent AVG: exact decimal sum -> double, divided by
    COUNT(col) in double arithmetic (deterministic on both engines).
    (No denominator override — a dead ``count_col`` parameter used to
    advertise one without implementing it.)

    Oracle twin: ``CAST(SUM(CAST(x AS DECIMAL(25,10))) AS DOUBLE) / COUNT(x)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c) / F.count(c)


def davg_sql(expr: str) -> str:
    return f"{dsum_sql(expr)} / COUNT({expr})"


def money(col: Column | str) -> Column:
    """Normalize a double money value to DECIMAL(15,2) (the reference's
    Numeric(15,2), schemas.py:37,53)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(15,2)")


def weighted_choice(rand_col: Column, choices: list[tuple[str, float]]) -> Column:
    """Weighted categorical pick from a uniform [0,1) column (F10 —
    the reference's ``random.choices(..., weights=...)``,
    oltp_seeder.py:382-388), as a chained CASE over cumulative weights.
    """
    total = sum(w for _, w in choices)
    expr = None
    acc = 0.0
    for value, weight in choices[:-1]:
        acc += weight / total
        cond = rand_col < acc
        expr = F.when(cond, value) if expr is None else expr.when(cond, value)
    last_value = choices[-1][0]
    return expr.otherwise(last_value) if expr is not None else F.lit(last_value)


def md5_bucket(col: Column | str, n_hex: int = 4) -> Column:
    """First ``n_hex`` hex chars of ``md5(string(col))`` — a
    deterministic, engine-portable sample key (F13 family): Spark and
    DuckDB produce identical lowercase-hex md5 for identical strings,
    so a threshold over this key selects the SAME rows in both engines
    (unlike ``rand()`` or engine-specific hashes like xxhash64).
    ``16**n_hex`` buckets; map-side only, no shuffle, reproducible
    across runs and cluster sizes — the property a training-data
    sampling step needs for auditability."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(F.md5(c.cast("string")), 1, n_hex)


def split_thresholds(fractions: dict[str, float], n_hex: int = 4) -> list[tuple[str, str]]:
    """(label, upper-hex-threshold) pairs for `hash_split`, cumulative
    over ``fractions`` in insertion order; the last label absorbs any
    rounding remainder.  Shared with oracle-SQL generation so both
    engines carve identical boundaries."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    if any(f < 0 for f in fractions.values()):
        raise ValueError("split fractions must be non-negative")
    space = 16**n_hex
    out, cum = [], 0.0
    for label, frac in fractions.items():
        cum += frac
        # clamp to space-1: a threshold of exactly `space` would render
        # as n_hex+1 hex chars ('10000') and break the FIXED-WIDTH
        # lexicographic compare in hash_split (4-char buckets compare
        # '10000' char-by-char, so only '0…' buckets would pass —
        # silently misrouting ~94% of rows).  The cost is granularity:
        # fractions are resolved to 1/16^n_hex, and a non-final label
        # whose cumulative share rounds past (space-1)/space loses the
        # difference to the final label.
        out.append(
            (label, format(min(space - 1, int(round(cum * space))), f"0{n_hex}x"))
        )
    return out


def hash_split(
    col: Column | str, fractions: dict[str, float], n_hex: int = 4
) -> Column:
    """Deterministic, GROUP-COHESIVE dataset split (train/val/test):
    every row whose ``col`` hashes under a label's cumulative md5
    threshold gets that label.  Rows sharing a key always land in the
    SAME split — pass the entity key (user_id, document cluster,
    domain) and cross-split leakage is structurally impossible, which a
    row-wise ``randomSplit`` cannot guarantee.  Map-side expression
    only: no shuffle, no state, reproducible across runs, engines, and
    cluster sizes.

    A NULL key yields a NULL label — md5(NULL) is NULL, every
    ``bucket < hi`` comparison is NULL, and the bare when-chain would
    fall through to the FINAL label, silently inflating the last split
    with exactly the rows that have no entity key (r8).  NULL-keyed
    rows are a data-quality decision the caller must make explicitly;
    they never belong to a split by accident."""
    bucket = md5_bucket(col, n_hex)
    pairs = split_thresholds(fractions, n_hex)
    expr = F.lit(pairs[-1][0])
    for label, hi in reversed(pairs[:-1]):
        expr = F.when(bucket < F.lit(hi), F.lit(label)).otherwise(expr)
    return F.when(bucket.isNotNull(), expr)
