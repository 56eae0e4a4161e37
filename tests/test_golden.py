"""Golden-seed regression (SURVEY.md §5.2-4): one full SGA generation at
seed 42 over the sf0.001 fixture must hash to a pinned value — catches
any accidental semantic drift in the shuffle/tournament/pairing/crossover
chain that the per-operator oracles might individually tolerate."""

from __future__ import annotations

import hashlib

from geneticalgorithmsusingmapreduce_spark import catalog

# re-pinned after the tournament tie-break fix (fitness·2^31 + rn — the
# id-composed key lost selection pressure for generation ≥ 1 child ids)
GOLDEN_SHA256 = "f79bf8cc14b8c5aeeaeb871246f0961df67543a3bc6e3d006cf51dc3807382c1"
GOLDEN_ROWS = 5986


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
