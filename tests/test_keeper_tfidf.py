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


def test_bm25_matches_python_reference(spark, sf_dir):
    """bm25_topk equals a driver-side BM25 with the same log-free IDF
    (the cross-engine determinism convention) computed from raw
    tokens, and the plan stays JVM-only."""
    from apachebeamkmeans_spark.operators import textstats as TX
    from apachebeamkmeans_spark.plans import explain as X
    from apachebeamkmeans_spark.sources import io

    queries = [["join", "hash"], ["slow"]]
    k1, b = 1.2, 0.75
    docs = io.read_table(spark, sf_dir, "documents")
    res = TX.bm25_topk(docs, queries, k=8, k1=k1, b=b)
    plan = X.formatted_plan(res)
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
    got = {
        (r["qid"], r["doc_id"]): (r["bm25"], r["rank"])
        for r in res.collect()
    }

    rows = docs.select("doc_id", "text").collect()
    toks = {
        r["doc_id"]: [t for t in r["text"].lower().split() if t]
        for r in rows
    }
    n = float(len(toks))
    avgdl = sum(len(v) for v in toks.values()) / n
    for qid, q in enumerate(queries):
        df = {
            t: float(sum(1 for v in toks.values() if t in v)) for t in q
        }
        scores = {}
        for d, v in toks.items():
            s = 0.0
            for t in q:
                tf = float(v.count(t))
                idf = (n - df[t] + 0.5) / (df[t] + 0.5)
                norm = k1 * (1.0 - b + b * (len(v) / avgdl))
                s += idf * (tf * (k1 + 1.0) / (tf + norm))
            if s > 0:
                scores[d] = s
        top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:8]
        for rank, (d, s) in enumerate(top, start=1):
            assert (qid, d) in got
            gs, gr = got[(qid, d)]
            assert gr == rank and abs(gs - s) < 2e-6


def test_passage_topk_picks_best_window_per_doc(spark):
    """passage_topk: the best-scoring window per (query, doc) wins (a
    long doc's overlapping windows never crowd the list), zero-score
    docs absent, global rank deterministic."""
    from apachebeamkmeans_spark.operators import textstats as TX

    pad = "x " * 60  # > one 128-char window of filler
    rows = [
        # doc 0: term-dense region AFTER a window of filler
        (0, pad + "join join join hash"),
        (1, "join hash here " + pad),          # dense at the start
        (2, pad + pad),                         # no terms at all
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = TX.passage_topk(docs, [["join", "hash"]], k=10,
                          width=128, stride=96).collect()
    by_doc = {}
    for r in out:
        assert r["qid"] == 0 and r["score"] > 0
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 2 not in by_doc                 # zero-score doc absent
    assert all(len(v) == 1 for v in by_doc.values())  # one window per doc
    # doc 1's best window starts at the text head
    assert by_doc[1][0]["start_pos"] == 1
    # doc 0's winning window covers the dense tail region, not offset 1
    assert by_doc[0][0]["start_pos"] > 1
    assert by_doc[0][0]["score"] == 4


def test_retrieval_mrr_planted_relevance(spark):
    """retrieval_mrr: on a corpus where exactly one doc contains all
    query terms and ranks first, rr = 1.0; a query whose conjunctive
    match exists but misses the top-k reports first_rank 0."""
    from apachebeamkmeans_spark.operators import textstats as TX

    rows = [(0, "alpha beta alpha beta alpha")]  # the only alpha∧beta doc
    rows += [(i, "alpha filler words here") for i in range(1, 30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["qid"]: r for r in TX.retrieval_mrr(
        docs, [["alpha", "beta"], ["alpha"]], k=3).collect()}
    assert out[0]["n_relevant"] == 1
    assert out[0]["first_rank"] == 1 and out[0]["rr"] == 1.0
    # query 1: 30 relevant docs, first of them inside the top-3
    assert out[1]["n_relevant"] == 30 and out[1]["first_rank"] >= 1
    assert abs(out[1]["rr"] - 1.0 / out[1]["first_rank"]) < 1e-9
