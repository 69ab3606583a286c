"""Skew-handling join/aggregation strategies.

At 100 TB a handful of hot keys (a viral document id, a null-ish default
key) can put one shuffle partition hours behind the rest. Defenses, in
preference order:

1. broadcast the small side (no shuffle of the big side at all) —
   ``EzTable.join(broadcast_other=True)``;
2. AQE skew-join splitting (on by default in ``session.py``) — handles
   sort-merge skew at runtime;
3. explicit salting (this module) — for shuffled hash joins /
   aggregations where AQE can't help (e.g. a skewed groupBy with an
   algebraic agg, or a join both of whose sides are large but one is
   replicable per-salt).

Salting trades a ``salt_n``-fold replication of the *small* side for an
even spread of the hot key's rows across ``salt_n`` partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_n: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's hot keys spread over ``salt_n``
    sub-keys.

    big rows get ``salt = pmod(xxhash64(random-ish row fingerprint),
    salt_n)`` — deterministic (hash of all columns), no rand() so plans
    stay reproducible; small rows are replicated once per salt value
    (explode of a literal sequence). The join key becomes (on, salt), so
    one hot key occupies ``salt_n`` shuffle partitions instead of one.

    Only joins that never emit unmatched SMALL-side rows are valid:
    a right/full outer would surface each unmatched small row once per
    salt replica (salt_n duplicates), so those types are rejected.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)}; {how!r} would duplicate "
            f"unmatched small-side rows {salt_n}x (use AQE skew join or "
            "broadcast for outer-right semantics)"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_n)).cast("int")
    big_s = big.withColumn("__salt", salt)
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_n - 1)))
    )
    out = big_s.join(small_s, on=[on, "__salt"], how=how).drop("__salt")
    return out


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_n: int = 16,
) -> DataFrame:
    """Two-stage aggregation for skewed group keys.

    ``aggs``: {out_name: (partial_sql_agg, final_sql_agg)} — the agg must
    be algebraic (sum/count/min/max: final == sum or min/max of
    partials). Stage 1 groups on (keys, salt) — the hot key's rows are
    spread; stage 2 merges the ``salt_n`` partials per key.

    NB Spark's hash aggregate already does map-side partial combine, so
    this is only needed when partial combine is defeated (e.g. high-
    cardinality distinct-ish payloads per key or applyInPandas UDAFs).
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_n)).cast("int")
    stage1 = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*[F.expr(p).alias(f"__p_{name}") for name, (p, _) in aggs.items()])
    )
    stage2 = stage1.groupBy(*keys).agg(
        *[
            F.expr(fin.format(p=f"__p_{name}")).alias(name)
            for name, (_, fin) in aggs.items()
        ]
    )
    return stage2
