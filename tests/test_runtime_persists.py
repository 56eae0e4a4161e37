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


def test_pipeline_path_drains_scoped_persists(spark):
    # r6 VERDICT #7 (contract updated r14): the curation ladder's shared
    # subtrees must be lifecycle-managed end-to-end. Since r14 the
    # ladders run under runtime.truncated_persists(), so each rung is a
    # checkpoint-truncated leaf registered as a free_checkpoint CLEANUP
    # (not a cache handle) — after a full materialization the cleanup
    # registry must hold every rung, and draining it must run them all.
    from geneticalgorithmsusingmapreduce_spark.operators import pipeline

    runtime.release_persists()  # clean slate from other tests
    runtime.release_cleanups()
    docs = spark.createDataFrame(
        [(i, f"the a and of to is u{i}a u{i}b u{i}c u{i}d u{i}e u{i}f "
             f"u{i}g u{i}h")
         for i in range(1, 7)],
        "doc_id long, text string",
    )
    pipeline.curate_corpus_neardup(docs).collect()
    assert not runtime._SCOPED  # ladder rungs no longer cache-persist
    n_cleanups = len(runtime._CLEANUPS)
    assert n_cleanups >= 2  # survivors + shingles at minimum
    assert runtime.release_cleanups() == n_cleanups
    assert not runtime._CLEANUPS


def test_release_runs_at_interpreter_exit():
    # r6 ADVICE: the LAST entry's persists drain at interpreter exit.
    # Behavior test in a subprocess: a handle left in the registry at
    # exit must have unpersist() called by the atexit hook.
    import subprocess
    import sys

    code = (
        "import sys; sys.path.insert(0, '/root/repo')\n"
        "from geneticalgorithmsusingmapreduce_spark import runtime\n"
        "class H:\n"
        "    def unpersist(self):\n"
        "        print('DRAINED-AT-EXIT', flush=True)\n"
        "runtime._SCOPED.append(H())\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=60,
    )
    assert out.returncode == 0
    assert "DRAINED-AT-EXIT" in out.stdout


def test_free_checkpoint_releases_rdd_blocks(spark):
    # r8 ADVICE: unpersist() does NOT free localCheckpoint RDD blocks —
    # rotating loop state must release the checkpointed RDD explicitly
    from geneticalgorithmsusingmapreduce_spark import runtime

    sc = spark.sparkContext

    def stored():
        return {int(i.id()) for i in sc._jsc.sc().getRDDStorageInfo()}

    pre = stored()  # other tests' leftovers are not ours to assert on
    df = runtime.local_checkpoint_truncated(
        spark.range(1000).selectExpr("id", "id * 2 AS v")
    )
    assert df.count() == 1000
    ours = stored() - pre
    assert ours, "checkpoint materialized no blocks?"
    runtime.free_checkpoint(df)
    assert not (ours & stored()), "checkpointed RDD blocks survived release"
    # fallback path: an ordinary persisted frame still unpersists
    p = spark.range(10).persist()
    p.count()
    runtime.free_checkpoint(p)
    assert not p.storageLevel.useMemory


def test_scoped_cleanup_drains_in_lifo_order():
    from geneticalgorithmsusingmapreduce_spark import runtime

    runtime.release_cleanups()  # clean slate from other tests' ladders
    order = []
    runtime.scoped_cleanup(lambda: order.append("a"))
    runtime.scoped_cleanup(lambda: order.append("b"))
    assert runtime.release_cleanups() == 2
    assert order == ["b", "a"]
    assert runtime.release_cleanups() == 0
