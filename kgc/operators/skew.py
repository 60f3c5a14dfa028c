"""op-21/26: explicit skew handling — hot-key detection + salted join.

AQE's skew-join split covers sort-merge joins whose *input partitions* are
oversized; it cannot help when a logically-hot key must fan out (e.g. a
dimension row matched by 10% of a 10^12-row fact table). The deterministic
salted join spreads one hot key over `n_salt` reducers: the big side gets a
per-ROW salt (pure function of the row — reruns are stable, §2.4-E), the
small side is replicated ×n_salt, and the join key becomes (key, salt).
Result is exactly equal to the unsalted join (asserted in tests/test_skew).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hot_keys(df: DataFrame, key: str, threshold: int) -> DataFrame:
    """op-26: keys whose row count exceeds `threshold`. Exact at test scale;
    the 10^12-row variant samples (`df.sample(0.001)`) — the stop-list/salt
    decision needs only approximate membership."""
    return df.groupBy(key).count().filter(F.col("count") > threshold).select(key)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """op-21: equi-join `big ⋈ small` on `key`, skew-safe.

    big side:   salt = pmod(xxhash64(all columns), n_salt)  (deterministic)
    small side: exploded ×n_salt (one replica per salt value)
    join on (key, salt) → hot key's rows land on n_salt reducers.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salt)).cast("int")
    big_s = big.withColumn("_salt", salt)
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<int>"))
    )
    return big_s.join(small_s, [key, "_salt"], how).drop("_salt")
