"""100 TB-posture helpers (SURVEY §4): partitioning, skew salting,
broadcast guidance. These are the knobs a 1000-executor deployment
turns; they are no-ops to correctness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def repartition_for_join(df: DataFrame, *keys: str, partitions: int | None = None) -> DataFrame:
    """Pre-shuffle on the join keys. When both join sides share this
    partitioning (or are bucketed on disk), Catalyst elides the
    exchange — the co-located join pattern for repeated big-big joins."""
    return df.repartition(partitions, *keys) if partitions else df.repartition(*keys)


def salt_skewed(
    df: DataFrame, key: str, n_salts: int = 16, salt_col: str = "_salt"
) -> DataFrame:
    """Add a salt column for skewed keys: join the salted fact against
    the dimension exploded ×n_salts (explode_salts below), turning one
    hot partition into n. AQE's skew-join handles moderate skew
    automatically; salting is for pathological keys (null-heavy,
    power-law user_ids)."""
    return df.withColumn(salt_col, (F.rand(seed=42) * n_salts).cast("int"))


def explode_salts(dim: DataFrame, n_salts: int = 16, salt_col: str = "_salt") -> DataFrame:
    """Dimension-side twin of salt_skewed: replicate each dim row once
    per salt value so the salted equi-join still matches."""
    salts = F.array([F.lit(i) for i in range(n_salts)])
    return dim.withColumn(salt_col, F.explode(salts))


def write_bucketed(
    df: DataFrame,
    name: str,
    keys: list[str],
    n_buckets: int = 64,
    path: str | None = None,
) -> None:
    """Persist bucketed+sorted on the join keys. Two tables bucketed
    the same way join with NO shuffle exchange on either side — the
    single biggest repeated-join win at 100 TB, paid once at write
    time. Bucket count is a layout contract: both sides must match
    (test_plans.py asserts the exchange-free plan)."""
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *keys)
        .sortBy(*keys)
    )
    if path:
        w = w.option("path", path)
    w.saveAsTable(name)
