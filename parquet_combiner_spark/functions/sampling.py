"""Deterministic, engine-portable sampling and dataset splitting.

A training pipeline needs REPRODUCIBLE sampling: the same document
must land in the same train/val/test split on every run, on every
engine, regardless of partitioning — which rules out ``df.sample``
(seeded per-partition: any repartition reshuffles the sample) and
``rand()`` (nondeterministic across retries). The standard fix is
content-addressed bucketing: hash a stable key, compare a fixed-width
prefix against split thresholds.

md5 is used (not xxhash64) deliberately: it is bit-identical across
Spark, DuckDB, Python, and everything else — so splits survive an
engine migration and the driver's oracle can hash-check them. The
comparison is done on the lowercase-hex PREFIX as a string:
fixed-width hex compares lexicographically exactly like its numeric
value, with no integer-parsing portability trap. Cost: one md5 per
row, narrow map, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PREFIX_CHARS = 8  # 32 bits of bucket resolution (~2e-10 granularity)


def hash_bucket(key: Column, seed: str = "") -> Column:
    """Deterministic 8-hex-char bucket of ``key`` (uniform over its
    2^32 values for any reasonable key distribution). ``seed`` is
    appended to the key so independent samples decorrelate."""
    return F.substring(
        F.md5(F.concat(key.cast("string"), F.lit(seed))), 1, _PREFIX_CHARS
    )


def _threshold_hex(cum: float) -> str:
    """Hex string such that bucket < threshold ⇔ bucket-value/2^32 <
    cum (exact for the granularity; cum >= 1 caps to an all-covering
    sentinel, since 'ffffffff' < 'g')."""
    n = int(cum * (16**_PREFIX_CHARS))
    if n >= 16**_PREFIX_CHARS:
        return "g"  # lexicographically above every hex string
    return format(n, f"0{_PREFIX_CHARS}x")


def hash_sample(
    df: DataFrame, key_col: str, rate: float, seed: str = ""
) -> DataFrame:
    """Keep a deterministic ~``rate`` fraction of rows by key hash.
    Same key ⇒ same decision on every run/engine/partitioning."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return df.where(
        hash_bucket(F.col(key_col), seed) < F.lit(_threshold_hex(rate))
    )


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    seed: str = "",
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a ~``rates[s]``
    fraction of each stratum ``s`` (e.g. downsample a dominant
    language while keeping 100% of a rare one — the standard corpus
    re-balancing move). Strata absent from ``rates`` sample at
    ``default_rate``.

    Same content-addressed mechanics as ``hash_sample`` — the rate
    just varies by stratum via a CASE over per-stratum thresholds —
    so the whole operator stays a narrow map: no shuffle, no
    per-stratum pass, no count of strata sizes. At 100 TB this is
    one projection + filter fused into the scan."""
    for s, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for stratum {s!r} must be in [0, 1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    thr: Column = F.lit(_threshold_hex(default_rate))
    for s, r in rates.items():
        thr = F.when(F.col(strata_col) == s, F.lit(_threshold_hex(r))).otherwise(thr)
    return df.where(hash_bucket(F.col(key_col), seed) < thr)


def stratified_sample_oracle_where_sql(
    key_sql: str,
    strata_sql: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    seed: str = "",
) -> str:
    """The DuckDB WHERE predicate computing the identical keep
    decision — generated from the same thresholds as
    ``stratified_sample`` so Spark and oracle can never drift."""
    bucket = f"substr(md5(CAST({key_sql} AS VARCHAR) || '{seed}'), 1, {_PREFIX_CHARS})"
    whens = " ".join(
        f"WHEN {strata_sql} = '{s}' THEN '{_threshold_hex(r)}'"
        for s, r in rates.items()
    )
    return f"{bucket} < (CASE {whens} ELSE '{_threshold_hex(default_rate)}' END)"


def hash_split(
    df: DataFrame,
    key_col: str,
    splits: dict[str, float],
    seed: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to exactly one named split by key hash:
    ``splits`` maps name → weight (must sum to ~1; the LAST split
    absorbs rounding slack so coverage is total by construction).
    Declaration order defines the threshold ranges, so reordering the
    dict REASSIGNS documents — treat the (splits, seed) pair as an
    immutable dataset version."""
    if not splits:
        raise ValueError("splits must be non-empty")
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-6:
        raise ValueError(f"split weights must sum to 1, got {total}")
    names = list(splits)
    bucket = hash_bucket(F.col(key_col), seed)
    expr: Column | None = None
    cum = 0.0
    cases = []
    for name in names[:-1]:
        cum += splits[name]
        cases.append((name, _threshold_hex(cum)))
    for name, thr in reversed(cases):
        inner = expr if expr is not None else F.lit(names[-1])
        expr = F.when(bucket < F.lit(thr), F.lit(name)).otherwise(inner)
    # single-split edge: everything lands in the one name
    if expr is None:
        expr = F.lit(names[-1])
    return df.withColumn(split_col, expr)


def split_oracle_case_sql(
    key_sql: str, splits: dict[str, float], seed: str = ""
) -> str:
    """The DuckDB CASE expression computing the identical split
    assignment — generated from the same thresholds so the Spark
    query and the SQL oracle can never drift."""
    bucket = f"substr(md5(CAST({key_sql} AS VARCHAR) || '{seed}'), 1, {_PREFIX_CHARS})"
    names = list(splits)
    lines = []
    cum = 0.0
    for name in names[:-1]:
        cum += splits[name]
        lines.append(f"WHEN {bucket} < '{_threshold_hex(cum)}' THEN '{name}'")
    whens = " ".join(lines)
    return f"CASE {whens} ELSE '{names[-1]}' END"
