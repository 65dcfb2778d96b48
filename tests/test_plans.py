"""Physical-plan quality gates — the properties that matter at 100 TB,
pinned so a refactor can't silently regress them:

* filters reach the parquet scan (PushedFilters) and scans are
  column-pruned (ReadSchema);
* small dims join via BroadcastHashJoin (never shuffle both sides);
* aggregations are partial (map-side combine) before the exchange;
* the extraction pipeline has exactly ONE exchange (the deliberate salted
  repartition) between scan and MapInPandas.
"""

from __future__ import annotations

import re

import pytest

from pii_spark.queries import QUERIES


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def sfd() -> str:
    return "/root/testdata/sf0.001"


def test_pricing_summary_pushdown_and_partial_agg(spark, sfd):
    plan = _plan(QUERIES["pricing_summary"](spark, sfd))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    assert "partial_sum" in plan  # map-side combine before the shuffle
    # column pruning: the scan must not read unused columns
    scan = re.search(r"ReadSchema: struct<([^>]*)", plan).group(1)
    assert "l_orderkey" not in scan and "l_partkey" not in scan


def test_dim_joins_broadcast(spark, sfd):
    plan = _plan(QUERIES["top_customers_by_nation"](spark, sfd))
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan


def test_review_semi_join_broadcast(spark, sfd):
    plan = _plan(QUERIES["review_semi_join"](spark, sfd))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_extraction_single_shuffle(spark, sfd):
    from pii_spark.extract import extract_pages
    from pii_spark.synth import pages_df

    pages = pages_df(spark, 50, seed=2)
    plan = _plan(extract_pages(pages))
    # exactly one Exchange: the deliberate salted repartition
    assert plan.count("Exchange") == 1
    assert "REPARTITION_BY_NUM" in plan
    assert "xxhash64(url" in plan
    assert "MapInPandas" in plan


def test_extraction_scan_column_pruned(spark, sfd, tmp_path):
    """Reading from parquet, the scan must not fetch warc_ts/lang."""
    from pii_spark.extract import extract_pages
    from pii_spark.synth import pages_df

    p = str(tmp_path / "pages")
    pages_df(spark, 30, seed=2).write.parquet(p)
    plan = _plan(extract_pages(spark.read.parquet(p)))
    scan = re.search(r"ReadSchema: struct<([^>]*)", plan).group(1)
    assert "warc_ts" not in scan and "lang" not in scan
    assert "html" in scan and "url" in scan
