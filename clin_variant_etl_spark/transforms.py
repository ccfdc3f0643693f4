"""Ordered, named, reusable transformation pipelines — the reference's
logical IR for dataset mappings.

Reference: an ETL job's transform step is an ordered list of named
``Transformation`` objects folded over the DataFrame
(etl/utils/transformation/DatasetTransformationMapping.scala:5-17,
etl/script/schema/UpdateSchemaETL.scala:21-31,
etl/fhir/FhirRawToNormalizedMappings.scala:14-22 — InputFileName,
KeepFirstWithinPartition, Drop, Rename, ToDate, Cast, Lit, UpperCase,
Custom).  Each transformation is a pure DataFrame→DataFrame function, so the
whole pipeline stays one Catalyst plan — composition adds zero jobs, zero
materialization, and the optimizer sees through the entire list.

The keep-first-within-partition transformation is implemented as the
DETERMINISTIC max_by pattern (SURVEY §7.4 rules out the order-unstable
orderBy+dropDuplicates the reference's library uses).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F


@dataclass(frozen=True)
class Transformation:
    """One named rewrite step; ``name`` makes pipelines loggable/diffable."""

    name: str
    fn: Callable[[DataFrame], DataFrame]

    def __call__(self, df: DataFrame) -> DataFrame:
        return self.fn(df)


def apply_transformations(df: DataFrame, steps: list[Transformation]) -> DataFrame:
    """Fold the ordered list over df (reference: Transformation.transform
    fold, DatasetTransformationMapping.scala:15-17)."""
    for s in steps:
        df = s(df)
    return df


# ---------------------------------------------------------------- builders
def rename(old: str, new: str) -> Transformation:
    return Transformation(f"rename:{old}->{new}", lambda df: df.withColumnRenamed(old, new))


def drop(*cols: str) -> Transformation:
    return Transformation(f"drop:{','.join(cols)}", lambda df: df.drop(*cols))


def cast(col: str, dtype: str) -> Transformation:
    return Transformation(
        f"cast:{col}:{dtype}", lambda df: df.withColumn(col, F.col(col).cast(dtype))
    )


def lit(col: str, value) -> Transformation:
    return Transformation(f"lit:{col}", lambda df: df.withColumn(col, F.lit(value)))


def to_date(col: str, fmt: str) -> Transformation:
    return Transformation(
        f"to_date:{col}", lambda df: df.withColumn(col, F.to_date(F.col(col), fmt))
    )


def upper_case(col: str) -> Transformation:
    return Transformation(f"upper:{col}", lambda df: df.withColumn(col, F.upper(F.col(col))))


def input_file_name(col: str = "input_file_name") -> Transformation:
    """Source-file lineage column (reference: InputFileName,
    FhirRawToNormalizedMappings.scala:10-17; SURVEY §2 H-Misc)."""
    return Transformation(
        f"input_file_name:{col}", lambda df: df.withColumn(col, F.input_file_name())
    )


def keep_first_within_partition(keys: list[str], order_col: str) -> Transformation:
    """Keep the row with MAX ``order_col`` per key group — deterministic
    (max_by over the packed row struct, never orderBy+dropDuplicates).
    Reference semantics: KeepFirstWithinPartition(keys, desc(order)),
    FhirRawToNormalizedMappings.scala:14-17."""

    def fn(df: DataFrame) -> DataFrame:
        payload = [c for c in df.columns if c not in keys]
        won = (
            df.groupBy(*keys)
            .agg(F.max_by(F.struct(*payload), F.col(order_col)).alias("_w"))
        )
        return won.select(*keys, *[F.col(f"_w.{c}").alias(c) for c in payload])

    return Transformation(f"keep_first:{','.join(keys)}:by:{order_col}", fn)


def custom(name: str, fn: Callable[[DataFrame], DataFrame]) -> Transformation:
    return Transformation(f"custom:{name}", fn)


class TransformationMapping:
    """Named pipelines per dataset id (reference:
    DatasetTransformationMapping.mapping, FhirRawToNormalizedMappings.scala:276-293)."""

    def __init__(self, mapping: dict[str, list[Transformation]]):
        self.mapping = mapping

    def transform(self, dataset_id: str, df: DataFrame) -> DataFrame:
        return apply_transformations(df, self.mapping[dataset_id])

    def step_names(self, dataset_id: str) -> list[str]:
        return [s.name for s in self.mapping[dataset_id]]
