"""Round-7 additions: batched BPE is property-tested in
test_properties.py; here the knn classifier, per-group weighted
sampling, and perplexity scoring get behavioral sanity checks beyond
the differential oracle gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from stockify_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_knn_classify_predicts_only_existing_labels(spark):
    preds = QUERIES["ml_knn_classify"](spark, SF).collect()
    assert len(preds) == 20
    from stockify_spark.sources.io import load_table

    labels = {
        r.label
        for r in load_table(spark, SF, "embeddings")
        .filter(F.col("vec_id") >= 20)
        .select("label")
        .distinct()
        .collect()
    }
    for r in preds:
        assert r.pred_label in labels
        assert 1 <= r.votes <= 5


def test_group_weighted_sample_respects_group_size_and_weights(spark):
    out = QUERIES["sample_weighted_group"](spark, SF)
    per_group = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per_group and all(n <= 8 for n in per_group.values())
    # weighted draw must over-represent long documents: the sampled
    # mean n_chars exceeds the corpus mean per source (A-Res with
    # weight = n_chars; same invariant as the global sample test)
    from stockify_spark.sources.io import load_table

    docs = load_table(spark, SF, "documents")
    corpus_mean = {
        r["source"]: r["m"]
        for r in docs.groupBy("source").agg(F.avg("n_chars").alias("m")).collect()
    }
    sample_mean = {
        r["source"]: r["m"]
        for r in out.groupBy("source").agg(F.avg("n_chars").alias("m")).collect()
    }
    better = sum(1 for s in sample_mean if sample_mean[s] > corpus_mean[s])
    assert better >= len(sample_mean) * 0.7  # a minority may tie/flip by chance


def test_perplexity_scores_are_positive_and_cover_corpus(spark):
    from stockify_spark.sources.io import load_table

    out = QUERIES["text_perplexity"](spark, SF)
    rows = out.collect()
    n_docs = (
        load_table(spark, SF, "documents")
        .filter(F.size(F.split(F.trim(F.lower("text")), r"\s+")) >= 3)
        .count()
    )
    assert len(rows) == n_docs
    for r in rows:
        assert r.ppl > 0 and r.n_trigrams >= 1
