"""Dedup + text-analysis operators on constructed documents with known
duplicates/near-duplicates."""

from __future__ import annotations

import pytest

from apachebeamkmeans_spark.fixtures import lsh_hyperplanes
from apachebeamkmeans_spark.operators import dedup as DD
from apachebeamkmeans_spark.operators import textstats as TX

DOC = "the quick brown fox jumps over the lazy dog again and again today"
NEAR = "the quick brown fox jumps over the lazy dog again and again tonight"
OTHER = "completely different words describing an unrelated subject entirely here now"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(0, DOC), (1, DOC), (2, NEAR), (3, OTHER)]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_exact_dedup(docs):
    out = {r["doc_id"]: r for r in DD.exact_dedup(docs).collect()}
    assert out[1]["is_dup"] and out[1]["keeper_id"] == 0
    assert not out[0]["is_dup"] and not out[2]["is_dup"] and not out[3]["is_dup"]


def test_minhash_identical_docs_always_candidates(docs):
    pairs = {(r["doc_a"], r["doc_b"]) for r in DD.lsh_candidate_pairs(docs).collect()}
    assert (0, 1) in pairs           # identical → every band agrees
    assert (0, 3) not in pairs and (1, 3) not in pairs  # unrelated docs


def test_jaccard_values(docs):
    pairs = DD.lsh_candidate_pairs(docs)
    j = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in DD.jaccard_verify(docs, pairs).collect()}
    assert j[(0, 1)] == 1.0
    if (0, 2) in j:
        assert 0 < j[(0, 2)] < 1.0


def test_simhash_identical_equal_near_close(docs):
    s = {r["doc_id"]: r["simhash"] for r in DD.simhash(docs).collect()}
    assert s[0] == s[1]
    ham_near = bin(s[0] ^ s[2]).count("1")
    ham_far = bin(s[0] ^ s[3]).count("1")
    assert ham_near <= ham_far


def test_embedding_near_pairs_finds_duplicate_vector(spark):
    v = [0.1 * ((j % 7) - 3) for j in range(64)]
    w = [-x for x in v]
    rows = [(0, v), (1, list(v)), (2, w)]
    vecs = spark.createDataFrame(rows, "id long, features array<double>")
    out = DD.embedding_near_pairs(vecs, lsh_hyperplanes(), min_cosine=0.9)
    pairs = {(r["vec_a"], r["vec_b"]): r["cosine"] for r in out.collect()}
    assert pairs == {(0, 1): 1.0}  # opposite vector lands in another bucket


def test_duplicate_clusters_components(spark):
    # graph: {1-2, 2-3} one component, {7-9} another, 5 isolated (absent)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9)], "doc_a long, doc_b long"
    )
    out = {r["doc_id"]: r["cluster_id"] for r in DD.duplicate_clusters(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7}


def test_duplicate_clusters_chain_converges(spark):
    # a long path 0-1-2-...-9 needs multiple propagation rounds
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "doc_a long, doc_b long"
    )
    out = {r["doc_id"]: r["cluster_id"] for r in DD.duplicate_clusters(pairs).collect()}
    assert out == {i: 0 for i in range(10)}


def test_doc_stats_and_quality(docs):
    stats = {r["doc_id"]: r for r in TX.doc_stats(docs).collect()}
    assert stats[0]["n_tokens"] == len(DOC.split())
    assert stats[0]["n_chars"] == len(DOC)
    q = {r["doc_id"]: r for r in TX.quality_score(docs).collect()}
    assert 0.0 <= q[0]["quality"] <= 1.0


def test_lang_id_stopword_density(docs):
    out = {r["doc_id"]: r["lang_pred"] for r in TX.lang_id(docs).collect()}
    assert out[0] == "en"    # contains 'the' twice + 'and'
    assert out[3] == "und"   # no stopwords from the fixed list


def test_fingerprint_identity(docs):
    fp = {r["doc_id"]: r["fingerprint"] for r in TX.fingerprint(docs).collect()}
    assert fp[0] == fp[1]
    assert fp[0] != fp[3]
    grouped = {r["doc_id"] for r in TX.near_dup_by_fingerprint(docs).collect()}
    # identical docs always collide; the near-dup may share the min
    # shingle too (that's the sketch working) — but unrelated text never
    assert {0, 1} <= grouped and 3 not in grouped


def test_token_frequencies(docs):
    top = TX.token_frequencies(docs, top_n=3).collect()
    # 'again' and 'the' both occur 6× (2× in DOC × 3 docs); ties break
    # token-ascending
    assert (top[0]["token"], top[0]["n"]) == ("again", 6)
    assert (top[1]["token"], top[1]["n"]) == ("the", 6)


def test_bpe_token_counts(spark):
    from apachebeamkmeans_spark.operators import textstats as TX

    docs = spark.createDataFrame(
        [(1, "I'll say it's 42 tokens, right?"), (2, "hello world"), (3, "a1b2")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in TX.token_counts(docs).collect()}
    # "I" "'ll" " say" " it" "'s" " 42" " tokens" "," " right" "?" = 10
    assert rows[1]["n_bpe_tokens"] == 10
    assert rows[1]["n_ws_tokens"] == 6
    assert rows[2]["n_bpe_tokens"] == 2
    # letter/digit alternation splits: "a" "1" "b" "2"
    assert rows[3]["n_bpe_tokens"] == 4


def test_pii_scrub_redacts_and_counts(spark):
    from apachebeamkmeans_spark.operators import textstats as TX

    docs = spark.createDataFrame(
        [
            (1, "mail a.b+x@sub.example.io or call 555-1234 from 192.168.0.1 now"),
            (2, "two mails: p@q.org r@s.net; no phone; 10.0.0.7 and 8.8.8.8"),
            (3, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in TX.pii_scrub(docs).collect()}
    assert (rows[1]["n_emails"], rows[1]["n_phones"], rows[1]["n_ips"]) == (1, 1, 1)
    assert rows[1]["text"] == "mail <EMAIL> or call <PHONE> from <IP> now"
    assert (rows[2]["n_emails"], rows[2]["n_ips"]) == (2, 2)
    assert rows[2]["text"] == "two mails: <EMAIL> <EMAIL>; no phone; <IP> and <IP>"
    assert (rows[3]["n_emails"], rows[3]["n_phones"], rows[3]["n_ips"]) == (0, 0, 0)
    assert rows[3]["text"] == "nothing sensitive here"


def test_repetition_stats_flags_boilerplate(spark):
    from apachebeamkmeans_spark.operators import textstats as TX

    docs = spark.createDataFrame(
        [
            (1, "buy now buy now buy now buy now"),   # dup 2-grams, top 'buy'=0.5
            (2, "the quick brown fox jumps over dogs"),  # all distinct
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in TX.repetition_stats(docs).collect()}
    assert rows[1]["keep"] is False and rows[1]["top_token_frac"] == 0.5
    # 7 2-grams, 2 distinct ("buy now", "now buy") -> dup frac 5/7
    assert rows[1]["dup_2gram_frac"] == round(1 - 2 / 7, 6)
    assert rows[2]["keep"] is True and rows[2]["distinct_token_ratio"] == 1.0


def test_repetition_exploded_equals_narrow_on_long_docs(spark):
    """The explode+groupBy repetition form must agree row-for-row with
    the narrow map, including a >10k-token book-length doc (the case
    the exploded form exists for), a zero-token doc, and ordinary
    docs; the auto dispatcher must equal both on the mixed frame."""
    import random

    from apachebeamkmeans_spark.operators import textstats as TX

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(300)]
    long_text = " ".join(rng.choice(vocab) for _ in range(12_000))
    docs = spark.createDataFrame(
        [
            (1, long_text),                                   # > 10k tokens
            (2, "buy now buy now buy now buy now"),
            (3, "the quick brown fox jumps over dogs"),
            (4, ""),                                          # zero tokens
            (5, "solo"),                                      # no 2-grams
        ],
        "doc_id long, text string",
    )

    def snap(df):
        return sorted(tuple(r) for r in df.collect())

    narrow = snap(TX.repetition_stats(docs))
    exploded = snap(TX.repetition_stats_exploded(docs))
    auto = snap(TX.repetition_stats_auto(docs))
    assert exploded == narrow
    assert auto == narrow
    assert any(r[1] > 10_000 for r in narrow)  # the long doc is real


def test_incremental_lsh_equals_full_join_cross_pairs(spark):
    """lsh_pairs_against(corpus, new) must equal the (new, corpus)
    cross-pairs of the full self-join — no pair lost or invented by
    the broadcast formulation."""
    from pyspark.sql import functions as F

    from apachebeamkmeans_spark.operators import dedup as DD
    from apachebeamkmeans_spark.sources import io

    docs = io.read_table(spark, "/root/testdata/sf0.001", "documents")
    new = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    inc = {
        (r["new_id"], r["corpus_id"])
        for r in DD.lsh_pairs_against(corpus, new).collect()
    }
    full = DD.lsh_candidate_pairs(docs).collect()
    cross = set()
    for r in full:
        a, b = r["doc_a"], r["doc_b"]
        if (a % 10 == 0) != (b % 10 == 0):
            n, c = (a, b) if a % 10 == 0 else (b, a)
            cross.add((n, c))
    assert inc == cross


def test_pack_with_split_splits_long_docs(spark):
    """A 600-token doc must yield pieces (256, 256, 88); no piece ever
    exceeds the budget; a doc's pieces are ordered and their bins are
    non-decreasing; totals conserve the token count."""
    from apachebeamkmeans_spark.operators.textstats import pack_with_split

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(600))),
            (2, "short doc here"),
            (3, ""),  # zero tokens -> dropped
            (4, " ".join(f"x{i}" for i in range(256))),  # exactly one ctx
        ],
        "doc_id long, text string",
    )
    rows = pack_with_split(docs, ctx_len=256, n_shards=4).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 3 not in by_doc
    assert sorted(r["piece_tokens"] for r in by_doc[1]) == [88, 256, 256]
    assert [r["piece_tokens"] for r in by_doc[4]] == [256]
    assert [r["piece_tokens"] for r in by_doc[2]] == [3]
    for doc, pieces in by_doc.items():
        pieces.sort(key=lambda r: r["piece_id"])
        assert [r["piece_id"] for r in pieces] == list(range(len(pieces)))
        assert all(r["piece_tokens"] <= 256 for r in pieces)
        bins = [r["bin_id"] for r in pieces]
        assert bins == sorted(bins)


def test_exact_substring_runs_cover_stride_window_hits(spark):
    """The exact pass must CONTAIN the windowed approximation (r7
    verdict item 7): every stride-32 repeated 64-char window is a
    verbatim cross-doc run ≥ 64 ≥ L, so each of its per-doc positions
    must lie inside some exact maximal run. sf0.01 — the smallest sf
    with planted cross-doc repeats."""
    from pyspark.sql import functions as F

    from apachebeamkmeans_spark.queries_dedup import (
        SUBSTR_STRIDE,
        SUBSTR_W,
        q_cross_doc_substrings,
        q_exact_substring_runs,
    )
    from apachebeamkmeans_spark.sources import io

    sf = "/root/testdata/sf0.01"
    runs: dict[int, list[tuple[int, int]]] = {}
    for r in q_exact_substring_runs(spark, sf).collect():
        runs.setdefault(r["doc_id"], []).append(
            (r["run_start"], r["run_start"] + r["run_len"] - 1)
        )
    docs = io.read_table(spark, sf, "documents").select("doc_id", "text").filter(
        F.length("text") >= SUBSTR_W
    )
    starts = F.sequence(
        F.lit(1), F.length("text") - F.lit(SUBSTR_W - 1), F.lit(SUBSTR_STRIDE)
    )
    wins = docs.select("doc_id", F.explode(starts).alias("s"), "text").select(
        "doc_id", "s",
        F.md5(F.substring(F.col("text"), F.col("s"), SUBSTR_W)).alias("h"),
    )
    hits = wins.join(
        q_cross_doc_substrings(spark, sf).select("h"), "h"
    ).collect()
    assert hits, "no planted cross-doc repeats at sf0.01 — fixture regression"
    for r in hits:
        lo, hi = r["s"], r["s"] + SUBSTR_W - 1
        assert any(a <= lo and hi <= b for a, b in runs.get(r["doc_id"], [])), (
            r["doc_id"], lo, hi,
        )


def _uniq(tag: str, n: int) -> str:
    """Deterministic filler text: md5-chained hex keyed by tag, so two
    different tags can never share a 50-char substring (the planted
    fixture's 'unique padding' guarantee)."""
    import hashlib

    out: list[str] = []
    h = tag
    while sum(len(x) for x in out) < n:
        h = hashlib.md5((tag + h).encode()).hexdigest()
        out.append(h)
    return "".join(out)[:n]


def test_exact_substring_planted_ground_truth(spark, tmp_path):
    """Planted-duplicate fixture with EXACTLY known cut spans (r8
    verdict item 7): the generator writes the ground truth, the
    queries must reproduce it byte-for-byte — including the r9
    overlap-merge case (two flagged islands with position gap 8 < L
    whose spans must come back as ONE disjoint run, not two
    double-counting ones).

    Construction (L=50): shared block M of 60 chars; doc X carries
    M[:52], doc W carries M[8:], doc Z carries all of M, doc V is
    fully unique. In Z the X-matching windows flag positions
    {51,52,53} and the W-matching windows {59,60,61} — two islands,
    overlapping spans [51,103) and [59,111) — so the only correct
    answer is the single merged run (51, 60)."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from apachebeamkmeans_spark.queries_dedup import (
        SUBSTR_EXACT_L,
        q_exact_substring_runs,
        q_substring_contamination,
        q_substring_purged_docs,
    )

    assert SUBSTR_EXACT_L == 50, "fixture spans are hand-derived for L=50"
    M = _uniq("shared-block", 60)
    x_head, x_tail = _uniq("x-head", 60), _uniq("x-tail", 60)
    w_head, w_tail = _uniq("w-head", 55), _uniq("w-tail", 55)
    z_head, z_tail = _uniq("z-head", 50), _uniq("z-tail", 40)
    docs = {
        1: x_head + M[:52] + x_tail,
        2: w_head + M[8:] + w_tail,
        3: _uniq("v-solo", 200),
        10: z_head + M + z_tail,
    }
    ids = sorted(docs)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array([docs[i] for i in ids], pa.string()),
                "lang": pa.array(["en"] * len(ids), pa.string()),
                "source": pa.array(["planted"] * len(ids), pa.string()),
                "n_chars": pa.array([len(docs[i]) for i in ids], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    sf = str(tmp_path)

    runs: dict[int, list[tuple[int, int]]] = {}
    for r in q_exact_substring_runs(spark, sf).collect():
        runs.setdefault(r["doc_id"], []).append((r["run_start"], r["run_len"]))
    for v in runs.values():
        v.sort()
    assert runs == {
        1: [(61, 52)],   # X's copy of M[:52] after its 60-char head
        2: [(56, 52)],   # W's copy of M[8:] after its 55-char head
        10: [(51, 60)],  # Z: the two overlapping islands, merged
    }

    purged_want = {
        1: (1, 52, x_head + x_tail),
        2: (1, 52, w_head + w_tail),
        3: (0, 0, docs[3]),
        10: (1, 60, z_head + z_tail),
    }
    got = {
        r["doc_id"]: r for r in q_substring_purged_docs(spark, sf).collect()
    }
    assert set(got) == set(purged_want)
    for doc_id, (n_runs, cut, text) in purged_want.items():
        r = got[doc_id]
        assert r["n_runs_cut"] == n_runs, doc_id
        assert r["chars_cut"] == cut, doc_id
        assert r["retained_chars"] == len(text), doc_id
        assert r["purged_md5"] == hashlib.md5(text.encode()).hexdigest(), doc_id
        # the span-disjointness accounting identity the r8 advice
        # showed pre-merge code could violate:
        assert r["chars_cut"] + r["retained_chars"] == len(docs[doc_id])

    # contamination gate: Z (doc_id % 10 == 0) is the arriving batch,
    # X/W/V the corpus; Z's copied region is the merged 60-char span
    contam = {
        r["doc_id"]: r for r in q_substring_contamination(spark, sf).collect()
    }
    assert set(contam) == {10}
    z = contam[10]
    assert z["n_copied_runs"] == 1
    assert z["copied_chars"] == 60
    assert z["longest_run"] == 60
    assert z["copied_share"] == round(60 / 150, 6)
    assert z["accept"] is False  # 0.4 > SUBSTR_CONTAM_MAX_SHARE


def test_fuzzy_name_pairs_blocking_and_bound(spark):
    """fuzzy_name_pairs: same-block pairs within the edit bound are
    emitted once with support counts; beyond-bound and cross-block
    near pairs are excluded (the documented recall trade of blocking)."""
    from pyspark.sql import functions as F

    rows = [
        (1, "red bolt"), (2, "red bolt"), (3, "bed bolt"),
        (4, "green bolt"),              # lev 4 from "red bolt" — beyond bound
        (5, "red bolts"),               # different block (noun "bolts")
        (6, "red gear"), (7, "ted gear"),
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    out = DD.fuzzy_name_pairs(
        df, "name", F.element_at(F.split(F.col("name"), " "), -1), 2
    ).collect()
    pairs = {(r["name_a"], r["name_b"]): (r["lev"], r["cnt_a"], r["cnt_b"])
             for r in out}
    assert pairs[("bed bolt", "red bolt")] == (1, 1, 2)
    assert pairs[("red gear", "ted gear")] == (1, 1, 1)
    # beyond-bound same-block pair and cross-block near pair excluded
    assert ("green bolt", "red bolt") not in pairs
    assert all("red bolts" not in p for p in pairs)
    assert len(pairs) == 2


def test_leakproof_split_no_source_straddles(spark):
    """The structural guarantee: a source's docs all share one split,
    and every doc gets a label from the three-way domain."""
    from pyspark.sql import functions as F

    from apachebeamkmeans_spark.sources import io

    docs = io.read_table(spark, "/root/testdata/sf0.001", "documents")
    out = TX.leakproof_split(docs, "source", (0.8, 0.1), seed="holdout")
    straddlers = (
        out.groupBy("source")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert straddlers == 0
    labels = {r["split"] for r in out.select("split").distinct().collect()}
    assert labels <= {"train", "val", "test"}
    assert out.count() == docs.count()


def test_negative_samples_contract(spark):
    """Bucketed negative sampling: replayable (two runs identical),
    never same-source or self pairs, ≤ k per anchor, and candidates
    only from the anchor's probe bucket."""
    from pyspark.sql import functions as F

    from apachebeamkmeans_spark.functions import hashing as H
    from apachebeamkmeans_spark.sources import io

    docs = io.read_table(spark, "/root/testdata/sf0.001", "documents")
    a = TX.negative_samples(docs, k=4, n_buckets=8, anchor_mod=10).collect()
    b = TX.negative_samples(docs, k=4, n_buckets=8, anchor_mod=10).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    src = {r["doc_id"]: r["source"] for r in docs.collect()}
    bkt_c = {
        r["doc_id"]: r["b"]
        for r in docs.select(
            "doc_id", H.bucket(F.col("doc_id"), 8, "negb").alias("b")
        ).collect()
    }
    bkt_p = {
        r["doc_id"]: r["b"]
        for r in docs.select(
            "doc_id", H.bucket(F.col("doc_id"), 8, "negp").alias("b")
        ).collect()
    }
    per_anchor = {}
    for r in a:
        assert r["anchor_id"] % 10 == 0
        assert r["neg_id"] != r["anchor_id"]
        assert src[r["neg_id"]] != src[r["anchor_id"]]
        assert bkt_c[r["neg_id"]] == bkt_p[r["anchor_id"]]
        per_anchor.setdefault(r["anchor_id"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) and len(v) <= 4
               for v in per_anchor.values())
