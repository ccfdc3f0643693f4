"""Sketch-aggregation error bound: the HLL++ approximate distinct count must
land within 5% of the exact count on every group (rsd=0.01 configured, so
5% is a generous envelope over both testdata scales)."""

from pyspark.sql import functions as F

from clin_variant_etl_spark.queries import all_queries
from clin_variant_etl_spark.queries.registry import load


def test_hll_error_bound(spark):
    for sf in ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]:
        approx = {
            r["event_type"]: r["approx_users"]
            for r in all_queries(include_suite_only=True)["approx_distinct_users_by_type"]
            .fn(spark, sf)
            .collect()
        }
        exact = {
            r["event_type"]: r["exact"]
            for r in load(spark, sf, "events")
            .groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("exact"))
            .collect()
        }
        assert set(approx) == set(exact)
        for t, ex in exact.items():
            assert abs(approx[t] - ex) <= max(1, 0.05 * ex), (
                f"{sf} {t}: approx {approx[t]} vs exact {ex}"
            )
