"""Text-analysis function tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from stockify_spark.functions.text import (
    fingerprint,
    lang_id,
    quality_score,
    token_count,
)


def _one(spark, text):
    return spark.createDataFrame([(text,)], "text string")


def test_token_count(spark):
    df = _one(spark, "  Hello   world  foo ")
    assert df.select(token_count("text").alias("n")).collect()[0]["n"] == 3


def test_fingerprint_normalization_invariants(spark):
    a = _one(spark, "Hello   World").select(fingerprint("text").alias("f")).collect()[0]["f"]
    b = _one(spark, "  hello world ").select(fingerprint("text").alias("f")).collect()[0]["f"]
    c = _one(spark, "hello worlds").select(fingerprint("text").alias("f")).collect()[0]["f"]
    assert a == b
    assert a != c
    assert len(a) == 32  # md5 hex


def test_lang_id_on_function_words(spark):
    cases = {
        "the cat sat on the mat and it is warm in the sun": "en",
        "el perro corre en la calle y es un dia bueno": "es",
        "le chien est dans la maison et il est un ami": "fr",
        "der hund ist in der stadt und das ist ein haus": "de",
        "xyzzy qwerty plugh": "unknown",
    }
    for text, expected in cases.items():
        got = _one(spark, text).select(lang_id("text").alias("l")).collect()[0]["l"]
        assert got == expected, text


def test_quality_score_bounds_and_ordering(spark):
    short = _one(spark, "hi").select(quality_score("text").alias("q")).collect()[0]["q"]
    decent = _one(spark, " ".join(["word"] * 100)).select(
        quality_score("text").alias("q")
    ).collect()[0]["q"]
    assert 0.0 <= short <= 1.0 and 0.0 <= decent <= 1.0
    assert decent > short


def test_winnow_fingerprints_containment_properties(spark):
    """Winnowing guarantees: identical docs -> identical sets; docs
    sharing a long substring share >= 1 fingerprint; unrelated docs
    share ~none."""
    from stockify_spark.functions.text import winnow_fingerprints

    common = "shared infrastructure for distributed query processing at scale"
    docs = spark.createDataFrame(
        [
            (0, f"alpha text prefix {common} and some suffix"),
            (1, f"totally other beginning {common} different ending here"),
            (2, "no overlap whatsoever in this completely unrelated sentence"),
            (3, f"alpha text prefix {common} and some suffix"),  # dup of 0
        ],
        "doc_id long, text string",
    )
    rows = winnow_fingerprints(docs, "text", "doc_id").collect()
    sets = {}
    for r in rows:
        sets.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    assert sets[0] == sets[3]
    assert sets[0] & sets[1]          # shared substring -> shared fingerprint
    assert not (sets[0] & sets[2])    # unrelated -> disjoint (k=5 grams)


def test_winnow_md5_family_matches_brute_force(spark):
    """The cross-engine md5-prefix winnow must select exactly the
    fingerprints a straight-line Python reference picks (same
    normalization, k-grams, 60-bit hash, window minima)."""
    import hashlib
    import re

    from stockify_spark.functions.text import winnow_fingerprints

    texts = [
        (0, "The  Quick brown\tfox jumps over the lazy dog"),
        (1, "tiny"),
        (2, ""),
        (3, "exactly9!"),
    ]
    k, window = 5, 4

    def brute(t):
        norm = re.sub(r"\s+", " ", t.strip().lower())
        n_grams = max(len(norm) - k, 0) + 1
        grams = [norm[i : i + k] for i in range(n_grams)]
        hs = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams]
        return {min(hs[i : i + window]) for i in range(len(hs))}

    docs = spark.createDataFrame(texts, "doc_id long, text string")
    rows = winnow_fingerprints(docs, "text", "doc_id", hash_family="md5").collect()
    got = {}
    for r in rows:
        got.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    for doc_id, t in texts:
        assert got[doc_id] == brute(t), doc_id
