"""Routed ZORDER's hash-representative contract (VERDICT r10 #8).

The sample-routed ZORDER path precomputes, per output partition p, a
BIGINT whose hash-partitioning target is exactly p, and routes rows by
substituting that representative — assuming `repartition(n, col)` is
pmod(murmur3, n) == F.hash. These tests pin that the assumption is now
ASSERTED (an end-to-end spark_partition_id probe per n) rather than
assumed, and that a broken contract degrades to repartitionByRange
instead of silently mis-clustering.
"""

import pytest

from delta_spark.commands import optimize as opt


@pytest.mark.parametrize("n", [2, 5, 17, 64])
def test_partition_reps_validate_against_real_repartition(spark, n):
    opt._PARTITION_REPS.clear()
    reps = opt._partition_reps(spark, n)
    assert reps is not None and len(reps) == n
    # the probe-validated contract, re-checked here independently
    assert opt._reps_route_correctly(spark, reps, n)


def test_reps_validation_rejects_wrong_mapping(spark):
    opt._PARTITION_REPS.clear()
    reps = opt._partition_reps(spark, 8)
    assert reps is not None
    rotated = reps[1:] + reps[:1]  # every rep now claims the wrong p
    assert not opt._reps_route_correctly(spark, rotated, 8)


def test_zorder_falls_back_when_contract_fails(spark, tmp_table, sf_dir,
                                               monkeypatch):
    """With _partition_reps forced to None (contract-violated Spark),
    OPTIMIZE ZORDER BY must still produce a complete, correct table via
    repartitionByRange."""
    from delta_spark.io import write_delta
    from delta_spark.table import DeltaTable

    df = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
          .select("l_orderkey", "l_partkey", "l_quantity"))
    write_delta(df, tmp_table)
    monkeypatch.setattr(opt, "_partition_reps", lambda *_a, **_k: None)
    dt = DeltaTable.forPath(spark, tmp_table)
    dt.optimize().executeZOrderBy("l_orderkey", "l_partkey")
    got = dt.toDF()
    assert got.count() == df.count()
    # same multiset of keys after the rewrite
    assert (got.groupBy("l_orderkey").count().subtract(
        df.groupBy("l_orderkey").count()).count() == 0)
