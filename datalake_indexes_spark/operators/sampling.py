"""Referential-integrity-preserving sampling (extension surface).

A uniform row sample of a fact table breaks every foreign key: at 1%,
each order keeps ~1% of its lineitems and almost no order survives
intact, so join-dependent pipelines (MATE verification, enrichment,
funnel analysis) can't be rehearsed on the sample.  The right unit is
the PARENT key: sample parents deterministically, then semi-join every
child table — each sampled parent keeps ALL its children, so joins,
cardinality ratios per parent, and aggregation semantics survive.

The parent sample is the same pure md5-bucket rule the corpus split
uses (content-addressed: stable across engines, runs, partitionings —
and consistent ACROSS child tables, which positional sampling is not).
The child filter is a broadcast-or-shuffle semi-join that AQE sizes;
nothing else moves.  At 100 TB: one scan per child table, no shuffle of
the parents beyond the semi-join build side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datalake_indexes_spark.functions.hashes import md5_bucket


def key_sample_filter(key_col: str, fraction: float) -> F.Column:
    """Deterministic membership predicate: md5 bucket of the key value
    lands under ``fraction`` of the 10000-bucket grid."""
    bucket = md5_bucket(key_col, 10000)
    return bucket < int(round(fraction * 10000))


def fk_consistent_sample(
    parent: DataFrame,
    children: dict[str, tuple[DataFrame, str]],
    parent_key: str,
    fraction: float,
) -> dict[str, DataFrame]:
    """Sample ``fraction`` of parent keys and restrict every child table
    to the surviving keys.  ``children`` maps name -> (df, fk_col).
    Returns {"parent": sampled_parent, name: sampled_child, ...} — all
    lazy frames sharing one sampled-key definition."""
    sampled = parent.filter(key_sample_filter(parent_key, fraction))
    keys = sampled.select(F.col(parent_key).alias("__k")).distinct()
    out: dict[str, DataFrame] = {"parent": sampled}
    for name, (child, fk) in children.items():
        out[name] = child.join(
            keys.withColumnRenamed("__k", fk), fk, "left_semi"
        )
    return out
