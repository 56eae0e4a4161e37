"""Scoped-persist registry semantics (r5 ADVICE leak fix): operators
register shared-subtree persists in runtime._SCOPED; building the NEXT
catalog entry drains the registry, so gate/pipeline sessions no longer
accumulate one cache entry per LSH/jaccard call for their lifetime."""

from geneticalgorithmsusingmapreduce_spark import runtime


def test_scoped_persist_registers_and_releases(spark):
    df = spark.range(10)
    out = runtime.scoped_persist(df)
    assert out is df
    assert df.storageLevel.useMemory  # actually persisted
    assert runtime._SCOPED, "handle must be registered"
    n = runtime.release_persists()
    assert n >= 1
    assert not runtime._SCOPED
    assert not df.storageLevel.useMemory  # actually unpersisted


def test_catalog_entry_build_drains_registry(spark, tmp_path):
    # building any registered entry must release previously scoped
    # persists (early release is safe: unpersist recomputes, never
    # corrupts) — use a cheap entry over the sf0.001 fixture
    from geneticalgorithmsusingmapreduce_spark import catalog

    leaked = runtime.scoped_persist(spark.range(5))
    assert leaked.storageLevel.useMemory
    catalog.QUERIES["population_generate"](spark, "/root/testdata/sf0.001")
    assert not runtime._SCOPED
    assert not leaked.storageLevel.useMemory


def test_release_survives_stopped_handles(spark):
    # a handle whose backing session is gone must not break the drain
    runtime._SCOPED.append(object())  # not even a DataFrame
    assert runtime.release_persists() == 0
    assert not runtime._SCOPED
