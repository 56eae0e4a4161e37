"""Golden-seed regression (SURVEY.md §5.2-4): one full SGA generation at
seed 42 over the sf0.001 fixture must hash to a pinned value — catches
any accidental semantic drift in the shuffle/tournament/pairing/crossover
chain that the per-operator oracles might individually tolerate."""

from __future__ import annotations

import hashlib

from geneticalgorithmsusingmapreduce_spark import catalog

# re-pinned after the gate-fixture cut (population now derives from
# lineitem WHERE l_linenumber <= 2 — catalog.LI_POP_WHERE; smaller
# fixture, identical operator chain. Previous re-pin: tournament
# tie-break fix, fitness·2^31 + rn)
GOLDEN_SHA256 = "23eb06cad942bedf042505e53fd52f4eb5a1181473a9de87c7f0c33b7732e8ae"
GOLDEN_ROWS = 1694


def test_sga_generation_golden(spark):
    # queries() emits the genome as a comma-joined string (driver-
    # canonicalizer contract); parse back to ints so the pinned pre-change
    # hash still proves the underlying semantics are untouched
    rows = sorted(
        (r.id, tuple(int(x) for x in r.genome.split(",")), r.fitness)
        for r in catalog.QUERIES["sga_generation"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    )
    assert len(rows) == GOLDEN_ROWS
    got = hashlib.sha256(repr(rows).encode()).hexdigest()
    assert got == GOLDEN_SHA256, (
        "SGA generation output drifted from the seed-42 golden hash — "
        "an operator's semantics changed; re-pin only if intentional"
    )
