"""Unit tests for bench.py's deterministic storage reclamation
(hygiene_state / hygiene_sweep) — the r8 fix for suite-long heap
accumulation. Pins the two facts the bench relies on:

* localCheckpoint blocks survive Python+JVM GC (the reason explicit
  unpersist exists at all), and
* hygiene_sweep reclaims exactly the entry-local leftovers — planted
  checkpoints unpersisted, planted temp views dropped, while anything
  present at baseline is left alone.
"""

from __future__ import annotations

import bench


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def test_hygiene_sweep_reclaims_planted_leftovers(spark):
    # pre-existing state must be treated as baseline and preserved
    keeper = spark.range(100).localCheckpoint(eager=True)
    keeper.count()
    spark.range(3).createOrReplaceTempView("hygiene_keeper_view")
    base = bench.hygiene_state(spark)
    assert any(r for r in base["rdd_ids"]), "keeper checkpoint missing"
    assert "hygiene_keeper_view" in base["views"]

    # plant entry-local debris: two checkpoints + one temp view
    a = spark.range(50_000).localCheckpoint(eager=True)
    b = spark.range(60_000).localCheckpoint(eager=True)
    a.count(), b.count()
    spark.range(5).createOrReplaceTempView("hygiene_stray_view")
    assert _n_persistent(spark) == len(base["rdd_ids"]) + 2

    # GC alone does NOT reclaim them — the measured fact that makes
    # explicit unpersist necessary (see bench.py hygiene comment)
    import gc
    del a, b
    gc.collect()
    spark.sparkContext._jvm.System.gc()
    assert _n_persistent(spark) == len(base["rdd_ids"]) + 2

    rep = bench.hygiene_sweep(spark, base)
    assert rep["reclaimed_rdds"] == 2
    assert rep["dropped_views"] == ["hygiene_stray_view"]
    assert rep["rdds_left"] == 0
    assert _n_persistent(spark) == len(base["rdd_ids"])
    # baseline survivors untouched
    names = {t.name for t in spark.catalog.listTables() if t.isTemporary}
    assert "hygiene_keeper_view" in names
    assert keeper.count() == 100

    # cleanup so later tests see a clean session
    keeper.rdd.unpersist(False)
    spark.catalog.dropTempView("hygiene_keeper_view")


def test_hygiene_sweep_noop_on_clean_session(spark):
    base = bench.hygiene_state(spark)
    rep = bench.hygiene_sweep(spark, base)
    assert rep["reclaimed_rdds"] == 0
    assert rep["dropped_views"] == []
    assert rep["rdds_left"] == 0
