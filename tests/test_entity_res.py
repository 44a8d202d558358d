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


def test_stream_er_batching_independence(spark, monkeypatch):
    """The online resolution must land the identical graded frame
    (labels AND funnel constants) no matter how arrivals were
    batched — 2-file vs 4-file split."""
    import ziggurat_spark.queries.streaming_surface as SS

    def run(nfiles):
        monkeypatch.setattr(SS, "STREAM_ER_SRC_FILES", nfiles)
        df = SS.x_stream_entity_resolution(spark, SF).toPandas()
        return df

    a = run(2)
    b = run(4)
    assert a.equals(b)
    # the run's per-trigger audit recorded probe + store reads
    audit = SS._ER_LAST["io_audit"]
    assert audit and all("shards_opened" in r for r in audit)
    # tier compaction actually folded runs (4 triggers, cadence 2)
    assert SS._ER_LAST["folds"]


def test_stream_er_matches_batch_oracle_quantities(spark):
    """Streamed funnel constants equal the one-shot computation the
    DuckDB oracle performs (recall/precision are REAL quantities,
    not stream-order artifacts): spot-check against the registered
    oracle on the smallest SF."""
    import duckdb

    from ziggurat_spark.queries.entity_res import er_stream_oracle_sql
    from ziggurat_spark.queries.streaming_surface import (
        x_stream_entity_resolution,
    )

    got = x_stream_entity_resolution(spark, SF).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW customer AS SELECT * FROM "
        f"read_parquet('{SF}/customer.parquet')"
    )
    want = con.execute(er_stream_oracle_sql()).df()
    for c in ("cand_pairs", "ver_pairs", "tp_pairs", "truth_pairs"):
        assert int(got[c].iloc[0]) == int(want[c].iloc[0]), c
    assert list(got["entity"]) == list(want["entity"])
