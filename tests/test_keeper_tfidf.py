"""Unit tests for keeper-by-quality selection and TF-IDF top terms."""

from __future__ import annotations

from pyspark.sql import functions as F

from apachebeamkmeans_spark.operators import dedup as DD
from apachebeamkmeans_spark.operators import textstats as TX


def test_keeper_max_quality_min_id_tiebreak(spark):
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (9, 7)],
        "doc_id long, cluster_id long",
    )
    quality = spark.createDataFrame(
        # cluster 1: doc 2 wins on quality; cluster 7: tie → min doc_id 7
        [(1, 10.0), (2, 30.0), (3, 20.0), (7, 5.0), (9, 5.0)],
        "doc_id long, quality double",
    )
    out = {
        r["cluster_id"]: (r["keeper_id"], r["n_docs"], r["keeper_quality"])
        for r in DD.keeper_by_quality(clusters, quality).collect()
    }
    assert out == {1: (2, 3, 30.0), 7: (7, 2, 5.0)}


def test_tfidf_rare_term_outranks_common(spark):
    docs = spark.createDataFrame(
        [
            (0, "alpha alpha alpha shared"),
            (1, "beta shared shared"),
            (2, "gamma shared"),
        ],
        "doc_id long, text string",
    )
    top = TX.tfidf_top_terms(docs, top_n=1).collect()
    best = {r["doc_id"]: r["term"] for r in top}
    # each doc's unique term has df=1 → N/df=3, beating 'shared' (df=3 → 1)
    assert best == {0: "alpha", 1: "beta", 2: "gamma"}
    r0 = next(r for r in top if r["doc_id"] == 0)
    assert r0["tf"] == 3 and abs(r0["tfidf"] - 9.0) < 1e-9 and r0["rank"] == 1


def test_corpus_health_counts_null_text_docs(spark, monkeypatch):
    """NULL-text documents must appear in every corpus-health counter
    (r7 advice: md5(NULL) is NULL, and a NULL join key silently dropped
    exactly the malformed rows a health dashboard exists to surface)."""
    import apachebeamkmeans_spark.queries_text as QT

    df = spark.createDataFrame(
        [
            (1, "a b c", "s1", "en"),
            (2, None, "s1", "en"),
            (3, None, "s1", "de"),
        ],
        "doc_id long, text string, source string, lang string",
    )
    monkeypatch.setattr(QT, "_docs", lambda _s, _d: df)
    out = {r["source"]: r for r in QT.q_corpus_health(spark, "ignored").collect()}
    row = out["s1"]
    assert row["n_docs"] == 3
    # the two NULL-text docs normalize to '' and are exact dups of each
    # other — the dashboard counts them, it does not hide them
    assert row["n_exact_dups"] == 2
    assert row["n_langs"] == 2
