"""Benchmark decontamination + PII redaction (operators/textops.py):
planted known answers, broadcast-shape assertions, and regex parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from geneticalgorithmsusingmapreduce_spark.operators import textops


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontaminate_flags_planted_overlap(spark):
    bench = _docs(spark, [(100, "alpha beta gamma delta epsilon zeta")])
    corpus = _docs(spark, [
        # contains the benchmark 5-gram "alpha beta gamma delta epsilon"
        (1, "xx alpha beta gamma delta epsilon yy"),
        # shares only a 4-gram — clean at n=5
        (2, "alpha beta gamma delta something else entirely"),
        (3, "totally unrelated words here now please"),
    ])
    got = {
        r.doc_id: r.n_overlap
        for r in textops.decontaminate_report(corpus, bench, n=5).collect()
    }
    assert got == {1: 1}


def test_decontaminate_counts_distinct_shared_grams(spark):
    bench = _docs(spark, [(100, "a b c d e f")])  # 5-grams: abcde, bcdef
    corpus = _docs(spark, [(1, "a b c d e f"), (2, "z a b c d e")])
    got = {
        r.doc_id: r.n_overlap
        for r in textops.decontaminate_report(corpus, bench, n=5).collect()
    }
    assert got == {1: 2, 2: 1}


def test_decontaminate_broadcasts_benchmark(spark):
    bench = _docs(spark, [(100, "a b c d e f")])
    corpus = _docs(spark, [(1, "a b c d e f")])
    df = textops.decontaminate_report(corpus, bench)
    df.collect()  # finalize AQE plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_redact_pii_planted(spark):
    docs = _docs(spark, [
        (1, "reach me at user1@mail.example.org or 555-867-5309 now"),
        (2, "no pii in this one"),
    ])
    rows = {r.doc_id: r for r in textops.redact_pii(docs).collect()}
    assert rows[1].text_redacted == "reach me at <EMAIL> or <PHONE> now"
    assert rows[1].n_emails == 1 and rows[1].n_phones == 1
    assert rows[2].text_redacted == "no pii in this one"
    assert rows[2].n_emails == 0 and rows[2].n_phones == 0


def test_redact_pii_multiple_matches(spark):
    docs = _docs(spark, [(1, "a@b.co c@d.org 111-222-3333 444-555-6666")])
    r = textops.redact_pii(docs).collect()[0]
    assert r.n_emails == 2 and r.n_phones == 2
    assert r.text_redacted == "<EMAIL> <EMAIL> <PHONE> <PHONE>"


def test_pii_augmented_corpus_plants_every_20th(spark):
    aug = textops.pii_augmented_corpus(spark, "/root/testdata/sf0.001")
    out = textops.redact_pii(aug)
    hit = out.filter("n_emails > 0 OR n_phones > 0")
    ids = [r.doc_id for r in hit.select("doc_id").collect()]
    assert ids and all(i % 20 == 0 for i in ids)
    n_docs = aug.count()
    assert len(ids) == (n_docs + 19) // 20


def test_redact_phone_inside_email_not_double_counted(spark):
    # the email regex swallows the phone-shaped digits; counts must
    # mirror the sequential redaction, not the raw text
    docs = _docs(spark, [(1, "call 555-867-5309@mail.example.org now")])
    r = textops.redact_pii(docs).collect()[0]
    assert r.text_redacted == "call <EMAIL> now"
    assert r.n_emails == 1 and r.n_phones == 0


def test_jaccard_pairs_hand_computed(spark):
    # pin the verify arithmetic independent of the corpus fixtures:
    # 3-token shingles, |∩|/|∪| in exact integer milli, threshold 500
    from geneticalgorithmsusingmapreduce_spark.operators import textops

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),      # shingles {abc, bcd}
            (2, "a b c e"),      # {abc, bce}: vs 1 -> 1/3 = 333, dropped
            (3, "a b c d"),      # duplicate of 1 -> 1000
            (4, "a b c d e"),    # {abc, bcd, cde}: vs 1 -> 2/3 = 666
        ],
        "doc_id long, text string",
    )
    cand = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "doc_a long, doc_b long"
    )
    got = {
        (r.doc_a, r.doc_b): r.jaccard_milli
        for r in textops.jaccard_pairs(docs, cand).collect()
    }
    assert got == {(1, 3): 1000, (1, 4): 666}
