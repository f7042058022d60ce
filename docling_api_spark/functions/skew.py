"""Skew mitigation: salted two-phase aggregation.

A group-by on a hot key (a handful of event types over billions of rows)
funnels each key through one reducer. Salting splits every key into
`n_salt` sub-keys for a first partial aggregation, then combines the
partials in a second (tiny) aggregation — the hot key's work spreads over
`n_salt` reducers and the second shuffle carries |keys| × n_salt rows.

Spark's own map-side partial aggregation already does most of this when the
upstream data is distributed across partitions; explicit salting is the
tool for when rows arrive pre-partitioned BY the hot key (e.g. after an
upstream join on it) — then map-side combine can't help and the salt
breaks the key→reducer pinning. AQE's skew-join splitting covers joins;
salting covers aggregations.

Sums ride DECIMAL so the two-phase result is bit-identical to the direct
aggregation (order-independence matters double here: salting reorders the
accumulation by construction).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from docling_api_spark.functions.numeric import DEC


def salted_groupby_sum(
    df: DataFrame,
    keys: list[str],
    sum_cols: dict[str, Column | str],
    n_salt: int = 16,
    salt_on: str | None = None,
) -> DataFrame:
    """GROUP BY `keys` computing exact decimal sums + counts, two-phase.

    sum_cols: output name → input column; each yields `<name>` (double sum)
    in the result, plus an `n_rows` count. `salt_on` (default: a uniform
    random-ish hash of all non-key columns is overkill — use a unique-ish
    column) picks what the salt is derived from; it must distribute evenly.
    """
    salt = (
        F.pmod(F.xxhash64(*([salt_on] if salt_on else keys)), F.lit(n_salt))
        if salt_on
        else F.pmod(F.monotonically_increasing_id(), F.lit(n_salt))
    )
    phase1 = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            F.sum((F.col(c) if isinstance(c, str) else c).cast(DEC)).alias(f"_s_{name}")
            for name, c in sum_cols.items()
        ],
    )
    return phase1.groupBy(*keys).agg(
        F.sum("_n").alias("n_rows"),
        *[
            F.sum(f"_s_{name}").cast("double").alias(name)
            for name in sum_cols
        ],
    )
