"""Sliding-window tournament selection W1 + pairing W2 (SURVEY.md §2.6).

Reference semantics (``reference src/edu/illinois/ga/MapReduce.java:151-273``):
each reducer streams its randomly-ordered partition through a circular
buffer of the last ``tournamentSize = 5`` rows; every step past warm-up
emits the window's best individual as a parent (``:203-214,224-232``), and
at end-of-partition the buffer "wraps around" emitting T-1 more windows
over the partition's head (``:252-272``) — so a partition of n rows yields
exactly n parents. Every 2nd parent pairs with the previous one for
crossover (``:235-243``).

Spark mapping: one SKINNY shuffle on the seeded bucket, then
ranking/analytic window functions over it —

    rn    = row_number() over (partition by part order by skey, id)
    ext   = rows ∪ head-rows re-positioned at rn+n   (the wrap-around)
    pid   = max_by(id, fitness·2^31 + rn) over rows between 4 preceding
    pos   = rn - 4  for rn ≥ 5    (n parents per bucket when n ≥ 4)
    pair  = (pos+1) div 2; partner id via lag(pid) over pos
    ...then parent GENOMES join back by id (hash join, no wide sort)

All windows share the same partitioning, so Catalyst reuses a single
exchange; lag() replaces a self-join for pairing (no second shuffle).
The argmax is tie-broken on (fitness, rn) so the DuckDB oracle matches
exactly. Buckets with n < T-1 yield fewer than n parents (degenerate case
the reference never hits — buckets are sized ≫ T).

**The skinny-shuffle property (r8).** Selection only needs
(id, fitness, skey) — never the genome — yet through r7 the window
pipeline shuffled and SORTED full-width rows twice (the rn exchange and
the post-union window exchange): pop × genome bytes per generation,
~1.7 GB at the README's 10× scale with 10k-bit genomes, the engine's
dominant sf100 cost (251.9-316.2 s rows). The reference inherited the
same design — it shuffles whole individuals
(``reference src/edu/illinois/ga/MapReduce.java:284-291``). Now every
window exchange/sort carries ~28-byte skinny rows (50-100× fewer bytes
for 10k-bit genomes) and winner ids join their genomes back via a hash
join on id: the population crosses ONE un-sorted hash exchange (reused
across the pa/pb lookups in pairing), and none at all when the
generation is bucket-stored by id. Plan property pinned in
tests/test_plans.py::test_tournament_shuffle_is_skinny.

Duplicate-id contract: ``id`` is row identity — callers whose source
can repeat ids (the lineitem fixture's duplicate (orderkey,linenumber)
keys, which by construction carry EQUAL genomes) must pass
``unique_ids=False`` so the genome lookup collapses duplicates before
the join; otherwise each repeated winner id would fan out k output rows.

At 100 TB: n_buckets should be O(cores·4); windows sort within buckets
only (no global sort), and the wrap-around union re-reads the bucket
head — the generation loop persists its input so this costs a cache read,
not a recompute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

TOURNAMENT_SIZE = 5  # reference src/edu/illinois/ga/MapReduce.java:154

# Tournament ordering: fitness first, tie-broken by the dense per-bucket
# row number rn (< bucket size, unique within every window). The first
# version composed fitness·2^32 + id — which silently LOSES selection
# pressure once ids outgrow 2^32: generation ≥ 1 child ids carry the
# pair key in their high bits, the id term swamped the fitness term, and
# the GA degraded to genetic drift (caught by the 10k-bit convergence
# run: best crept 5218 → 5500 over 112 generations). rn is magnitude-
# proof: any fitness advantage contributes ≥ 2^31 > max rn. (A struct
# ordering would be cleaner still, but DuckDB 1.0's arg_max only takes
# scalar ordering keys.)
_ORD = "(fitness * 2147483648 + rn)"


def tournament_parent_ids(
    df: DataFrame, t_size: int = TOURNAMENT_SIZE
) -> DataFrame:
    """W1 skinny core: the windowed tournament over (id, fitness, skey,
    part) ONLY — genomes never enter the exchange or the sorts. Output:
    one row per input row: [part, pos, parent_id, parent_fitness]."""
    w = Window.partitionBy("part").orderBy("skey", "id")
    d = (
        df.select("id", "fitness", "skey", "part")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("part")))
    )
    head = d.filter(F.col("rn") <= t_size - 1).withColumn(
        "rn", F.col("rn") + F.col("n")
    )
    ext = d.unionByName(head)
    wf = (
        Window.partitionBy("part")
        .orderBy("rn")
        .rowsBetween(-(t_size - 1), 0)
    )
    sel = ext.select(
        "part",
        "rn",
        F.expr(f"max_by(id, {_ORD})").over(wf).alias("parent_id"),
        F.max("fitness").over(wf).alias("parent_fitness"),
    )
    return sel.filter(F.col("rn") >= t_size).select(
        "part",
        (F.col("rn") - t_size + 1).alias("pos"),
        "parent_id",
        "parent_fitness",
    )


def genome_lookup(pop: DataFrame, unique_ids: bool = True) -> DataFrame:
    """[id, genome] lookup side for the join-back. With
    ``unique_ids=False`` duplicate ids collapse first (partial agg
    shrinks them map-side; duplicate ids must carry equal genomes —
    module-doc contract), so a repeated winner id cannot fan out.

    NOTE: the ``unique_ids=False`` collapse is an agg over WIDE rows
    (array buffers force a sort aggregate) — callers whose genomes are
    a pure function of the id should dedupe the IDS first and derive
    genomes after (pass the result as ``genome_df``), which keeps the
    dedup skinny and halves derivation; the lineitem entries do."""
    g = pop.select("id", "genome")
    if not unique_ids:
        g = g.groupBy("id").agg(F.max("genome").alias("genome"))
    return g


def tournament_parents(
    df: DataFrame,
    t_size: int = TOURNAMENT_SIZE,
    unique_ids: bool = True,
    genome_df: DataFrame | None = None,
) -> DataFrame:
    """W1. Input: [id, genome, fitness, skey, part]; output: one parent per
    input row: [part, pos, parent(genome array), parent_fitness].

    Skinny-shuffle composition: ``tournament_parent_ids`` runs the
    windows genome-free, then winners join their genomes back via a
    SHUFFLED HASH join on id — hinted with the skinny winner rows as
    the build side (a sort-merge join would re-sort the wide genome
    side; a wide-side hash build OOM'd a 48 GB heap at the sf100
    probe). ``genome_df`` overrides the lookup side with an id-unique
    [id, genome] frame — when genomes derive from ids, dedup-ids-then-
    derive keeps even the lookup exchange skinny."""
    sel = tournament_parent_ids(df, t_size)
    g = (
        genome_df if genome_df is not None
        else genome_lookup(df, unique_ids)
    ).withColumnsRenamed({"id": "parent_id", "genome": "parent"})
    return (
        sel.hint("shuffle_hash")
        .join(g, "parent_id")
        .select("part", "pos", "parent", "parent_fitness")
    )


def paired_parent_ids(parent_ids: DataFrame) -> DataFrame:
    """W2 skinny core: pairs consecutive parent IDS — rows at even pos
    carry (pa_id, pb_id) = (previous, current); the odd tail parent
    drops (reference pairs every 2nd selection,
    ``reference src/edu/illinois/ga/MapReduce.java:235-243``). Same
    window partitioning as W1 → no additional exchange."""
    wp = Window.partitionBy("part").orderBy("pos")
    d = parent_ids.withColumn("pa_id", F.lag("parent_id", 1).over(wp))
    return (
        d.filter(F.col("pos") % 2 == 0)
        .select(
            "part",
            ((F.col("pos") + 1) / 2).cast("bigint").alias("pair"),
            "pa_id",
            F.col("parent_id").alias("pb_id"),
        )
    )


def pair_genomes(
    pair_ids: DataFrame,
    pop: DataFrame,
    unique_ids: bool = True,
    genome_df: DataFrame | None = None,
) -> DataFrame:
    """Join both parents' genomes onto the skinny pair rows:
    [part, pair, pa_id, pb_id] → [part, pair, pa, pb].

    Shape: explode each pair into two SKINNY role rows
    (part, pair, role, pid), hash-join genomes on pid with the role
    rows as the build side, then pivot the two genome rows per pair
    back to columns via map_from_entries(collect_list(...)) — an
    OBJECT HASH aggregate (hash-based, sort-fallback spill; an array
    `max` buffer would force a full sort aggregate).

    Why this over two sequential id-joins (the first r8 attempt,
    measured at the sf100 probe): join #2's smaller side already
    carries the pa genomes, so EITHER it hash-builds wide rows — which
    OOM'd the 48 GB heap (per-partition UnsafeHashedRelation
    allocations → GCLocker storms → heap death) — or it sort-merges,
    re-sorting 1.5× pop of wide rows (measured 471 s / 15.3× at
    sf100, worse than the pre-skinny 316 s). The explode/pivot form
    moves the genomes through exactly ONE wide exchange
    (hashpartitioning(part, pair), n rows) with no wide sort anywhere;
    every other exchange and sort in the generation is skinny.

    ``genome_df``: id-unique [id, genome] lookup override — derive
    genomes AFTER a skinny id-dedup when they're a function of the id
    (see genome_lookup note)."""
    g = genome_df if genome_df is not None else genome_lookup(
        pop, unique_ids
    )
    roles = pair_ids.select(
        "part",
        "pair",
        F.explode(
            F.expr(
                "array(struct('a' as role, pa_id as pid), "
                "struct('b' as role, pb_id as pid))"
            )
        ).alias("rp"),
    ).select("part", "pair", "rp.role", "rp.pid")
    j = roles.hint("shuffle_hash").join(
        g.withColumnRenamed("id", "pid"), "pid"
    )
    return (
        j.groupBy("part", "pair")
        .agg(
            F.expr(
                "map_from_entries(collect_list(struct(role, genome)))"
            ).alias("m")
        )
        .select(
            "part", "pair",
            F.expr("m['a']").alias("pa"),
            F.expr("m['b']").alias("pb"),
        )
    )


def paired_parents_onepass(
    df: DataFrame, t_size: int = TOURNAMENT_SIZE
) -> DataFrame:
    """W1+W2 in ONE pass over WIDE rows — the small-population fast
    path: windows carry the genome (max_by(genome, ord) directly), so
    there is no join-back and no role pivot, at the price of wide
    window sorts. Correct whenever the per-bucket wide sort fits
    memory; the r9 min-of-3 same-phase A/B measured the skinny
    composition's fixed pivot overhead at 1.7× on the two small-pop
    bench settings (pop 132,878 / 6,000 — `.localdata/ab_pivot_r9.json`)
    while the r8 event-log A/B had it a wash at 1.33M and the decades
    show skinny winning at 27.9M+. plans/sga.next_generation routes on
    a byte threshold. Same ordering keys as the skinny form ⇒
    bit-identical children (pinned in tests/test_sga.py).
    Input: [id, genome, fitness, skey, part] → [part, pair, pa, pb]."""
    w = Window.partitionBy("part").orderBy("skey", "id")
    d = (
        df.select("id", "genome", "fitness", "skey", "part")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("part")))
    )
    head = d.filter(F.col("rn") <= t_size - 1).withColumn(
        "rn", F.col("rn") + F.col("n")
    )
    ext = d.unionByName(head)
    wf = (
        Window.partitionBy("part")
        .orderBy("rn")
        .rowsBetween(-(t_size - 1), 0)
    )
    sel = (
        ext.select(
            "part", "rn",
            F.expr(f"max_by(genome, {_ORD})").over(wf).alias("parent"),
        )
        .filter(F.col("rn") >= t_size)
        .select(
            "part", (F.col("rn") - t_size + 1).alias("pos"), "parent"
        )
    )
    wp = Window.partitionBy("part").orderBy("pos")
    return (
        sel.withColumn("pa", F.lag("parent", 1).over(wp))
        .filter(F.col("pos") % 2 == 0)
        .select(
            "part",
            ((F.col("pos") + 1) / 2).cast("bigint").alias("pair"),
            "pa",
            F.col("parent").alias("pb"),
        )
    )


def paired_parents(parents: DataFrame) -> DataFrame:
    """W2 over WIDE parent rows [part, pos, parent, parent_fitness] —
    kept for callers that already materialized genomes; the generation
    plan composes ``paired_parent_ids`` + ``pair_genomes`` instead so
    the lag window never carries genome bytes."""
    wp = Window.partitionBy("part").orderBy("pos")
    d = parents.withColumn("pa", F.lag("parent", 1).over(wp))
    return (
        d.filter(F.col("pos") % 2 == 0)
        .select(
            "part",
            ((F.col("pos") + 1) / 2).cast("bigint").alias("pair"),
            "pa",
            F.col("parent").alias("pb"),
        )
    )


def tournament_parents_pandas(
    df: DataFrame, t_size: int = TOURNAMENT_SIZE
) -> DataFrame:
    """W3: the same tournament as ``tournament_parents`` but via the
    ``applyInPandas`` escape hatch — the idiomatic successor of writing a
    reducer class (SURVEY.md §2.12). The reference's GAReducer is exactly
    this shape: per-partition stateful streaming with a circular buffer
    (``reference src/edu/illinois/ga/MapReduce.java:151-273``). Produces
    bit-identical output to the window-expression form (same oracle), so
    users can choose either; the expression form stays on the JVM and is
    preferred (SURVEY.md §2.12 "column expression (preferred)")."""
    import pandas as pd

    def one_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["skey", "id"]).reset_index(drop=True)
        n = len(pdf)
        genomes = list(pdf["genome"])
        fits = list(pdf["fitness"])
        ids = list(pdf["id"])
        part = pdf["part"].iloc[0]
        out = []
        # circular stream of n + (t_size-1) window ends, as the reference's
        # wrap-around flush does
        for end in range(t_size - 1, n + t_size - 1):
            lo = end - (t_size - 1)
            # tie-break on the stream position (≡ rn in the window form:
            # wrapped head rows sit at rn = n + original_rn = i + 1)
            best = max(
                range(lo, end + 1),
                key=lambda i: (fits[i % n], i),
            )
            out.append(
                (part, end - t_size + 2, genomes[best % n], fits[best % n])
            )
        return pd.DataFrame(
            out, columns=["part", "pos", "parent", "parent_fitness"]
        )

    return df.groupBy("part").applyInPandas(
        one_bucket,
        schema="part bigint, pos bigint, parent array<bigint>, parent_fitness bigint",
    )


def duck_tournament_sql(
    shuffled_sql: str, t_size: int = TOURNAMENT_SIZE
) -> str:
    """Oracle twin of tournament_parents over a relation exposing
    (id, genome, fitness, skey, part)."""
    ord_ = _ORD
    return f"""(
      WITH _d AS (
        SELECT *, row_number() OVER (PARTITION BY part ORDER BY skey, id) AS rn,
               count(*) OVER (PARTITION BY part) AS n
        FROM {shuffled_sql} _s
      ), _ext AS (
        SELECT id, genome, fitness, skey, part, rn FROM _d
        UNION ALL
        SELECT id, genome, fitness, skey, part, rn + n AS rn
        FROM _d WHERE rn <= {t_size - 1}
      ), _sel AS (
        SELECT part, rn,
               arg_max(genome, {ord_}) OVER
                 (PARTITION BY part ORDER BY rn
                  ROWS BETWEEN {t_size - 1} PRECEDING AND CURRENT ROW) AS parent,
               max(fitness) OVER
                 (PARTITION BY part ORDER BY rn
                  ROWS BETWEEN {t_size - 1} PRECEDING AND CURRENT ROW) AS parent_fitness
        FROM _ext
      )
      SELECT part, rn - {t_size - 1} AS pos, parent, parent_fitness
      FROM _sel WHERE rn >= {t_size}
    )"""


def duck_paired_sql(parents_sql: str) -> str:
    return f"""(
      WITH _p AS (
        SELECT part, pos, parent,
               lag(parent) OVER (PARTITION BY part ORDER BY pos) AS pa
        FROM {parents_sql} _t
      )
      SELECT part, (pos + 1) // 2 AS pair, pa, parent AS pb
      FROM _p WHERE pos % 2 = 0
    )"""
