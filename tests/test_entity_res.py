"""Behavior pins for x_entity_resolution (record linkage).

The oracle grades end-to-end equality; these tests pin the pieces
whose failure modes an end-to-end hash can obscure: the
distributed sorted-neighborhood spelling must equal the
global-order pair set, the cluster labeling must partition the
registry, and the funnel metrics must be internally consistent.
"""

from __future__ import annotations

import pytest

from ziggurat_spark.plans import has_cartesian_product
from ziggurat_spark.queries.entity_res import (
    SNM_WINDOW,
    _featurized,
    _registry,
    _snm_pairs,
    x_entity_resolution,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def result(spark):
    return x_entity_resolution(spark, SF).toPandas()


def test_partitioned_snm_equals_global_order(spark):
    """The range-partition + boundary-replication spelling must
    produce EXACTLY the global-sort-order neighbor pairs (n_parts=1
    is the global spelling by construction)."""
    feat = _featurized(spark, SF).localCheckpoint(eager=True)
    for keys in (["dig", "norm", "rec_id"], ["seg", "bal", "dig", "rec_id"]):
        dist = {
            (r.a, r.b)
            for r in _snm_pairs(feat, keys, 4).distinct().collect()
        }
        glob = {
            (r.a, r.b)
            for r in _snm_pairs(feat, keys, 1).distinct().collect()
        }
        assert dist == glob, f"pair drift for sort {keys}"
        # sanity: every record pairs with its next w neighbors
        n = feat.count()
        assert len(glob) == sum(
            min(SNM_WINDOW, n - 1 - i) for i in range(n)
        )


def test_clusters_partition_registry(spark, result):
    reg_rows = _registry(spark, SF).count()
    assert int(result["n_members"].sum()) == reg_rows
    # cluster_id is the min member rec_id: unique per row
    assert result["cluster_id"].is_unique


def test_funnel_metrics_consistent(result):
    row = result.iloc[0]
    assert row["cand_pairs"] > row["ver_pairs"] > 0
    assert 0 < row["tp_pairs"] <= row["truth_pairs"]
    assert row["precision_pct"] == 100 * row["tp_pairs"] // row["ver_pairs"]
    assert row["recall_pct"] == 100 * row["tp_pairs"] // row["truth_pairs"]
    # the deterministic variants are built to be found: the funnel
    # must actually recover (nearly) all true pairs at this SF
    assert row["recall_pct"] >= 90
    # and the verify stage must reject most false candidates
    assert row["precision_pct"] >= 60


def test_variant_cluster_resolved(result):
    """Some cluster must resolve >= 3 records of one entity (a
    customer with both variants), proving normalize+typo matching
    works through to the clustering stage."""
    solo = result[result["n_entities"] == 1]
    assert int(solo["n_members"].max()) >= 3


def test_no_cartesian_anywhere(spark):
    assert not has_cartesian_product(x_entity_resolution(spark, SF))
