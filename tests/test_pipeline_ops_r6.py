"""Property tests for the round-6 training-pipeline additions:
BPE pair statistics, linear time-series interpolation, unigram LM
scoring, and SemDeDup semantic pruning — each on hand-built frames
where the right answer is computable by eye."""

from __future__ import annotations

from datetime import datetime

from apachebeamkmeans_spark.operators import textstats as TX


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


# ------------------------------------------------------- bpe_pair_stats


def test_bpe_pair_counts_adjacent_only(spark):
    out = TX.bpe_pair_stats(
        _docs(spark, ["a b a b c", "b c"]), top_n=10
    ).collect()
    got = {r["pair"]: r["n"] for r in out}
    # doc0 pairs: (a b) (b a) (a b) (b c); doc1: (b c)
    assert got == {"a b": 2, "b c": 2, "b a": 1}


def test_bpe_pair_short_docs_yield_nothing(spark):
    # 0- and 1-token docs must not error (slice length would go
    # negative without the shifted-zip construction) and contribute no
    # pairs
    out = TX.bpe_pair_stats(_docs(spark, ["", "  ", "solo"]), top_n=5).collect()
    assert out == []


def test_bpe_pair_tie_break_and_limit(spark):
    out = TX.bpe_pair_stats(_docs(spark, ["z y x w"]), top_n=2).collect()
    # all pairs count 1 → lexicographic ties: 'x w' < 'y x' < 'z y'
    assert [r["pair"] for r in out] == ["x w", "y x"]


# ------------------------------------------------------ bpe_train_merges


def test_bpe_train_merges_known_corpus(spark):
    # char-level BPE on the word-frequency table: vocab {the:3, cat:3,
    # sat:2, ran:1}; r1's best pair is (a,t) — 'cat'×3 + 'sat'×2 = 5;
    # r2 ties at 3 between (c,'a t'), (t,h), (h,e) → pair-text
    # tie-break (\tc… < \th… < \tt…) picks (c,'a t')
    out = TX.bpe_train_merges(
        _docs(spark, ["the cat sat", "the cat ran", "the cat sat"]), n_merges=2
    ).collect()
    assert [(r["round"], r["merged"], r["freq"]) for r in out] == [
        (1, "a t", 5),
        (2, "c a t", 3),
    ]


def test_bpe_train_merge_is_greedy_left_to_right(spark):
    # counting sees both (1,2) and (2,3) in 'aaa' (2 positions × cnt 2
    # = 4), but the REWRITE is greedy left-to-right: chars 1-2 merge
    # and the result never re-merges with char 3
    out = TX.bpe_train_merges(_docs(spark, ["aaa", "aaa"]), n_merges=2).collect()
    assert (out[0]["round"], out[0]["merged"], out[0]["freq"]) == (1, "a a", 4)
    # after the greedy rewrite the word is ['a a', 'a'] → pair
    # ('a a', 'a') once per vocab entry, weighted by cnt 2
    assert (out[1]["round"], out[1]["merged"], out[1]["freq"]) == (2, "a a a", 2)


def test_bpe_train_stops_when_pairs_exhausted(spark):
    # 'ab' fuses to one symbol in round 1; round 2 finds no pairs and
    # the loop breaks — n_merges is a cap, not a promise
    out = TX.bpe_train_merges(_docs(spark, ["ab ab", "ab"]), n_merges=5).collect()
    assert [(r["round"], r["merged"], r["freq"]) for r in out] == [(1, "a b", 3)]


def test_bpe_train_empty_docs(spark):
    assert TX.bpe_train_merges(_docs(spark, ["", "  "]), n_merges=3).collect() == []


def test_bpe_apply_merges_matches_fit(spark):
    # the encoder path (apply an already-learned merge list, no pair
    # counting) must reproduce the trainer's final vocab segmentation
    docs = _docs(spark, ["the cat sat", "the cat ran", "the cat sat"])
    vocab = TX.bpe_word_vocab(docs)
    merges, final = TX._bpe_fit_vocab(vocab, 4)
    applied = TX.bpe_apply_merges(vocab, [p for _r, _m, _f, p in merges])
    lhs = sorted((r["word"], r["seq"]) for r in final.collect())
    rhs = sorted((r["word"], r["seq"]) for r in applied.collect())
    assert lhs == rhs


# -------------------------------------------------- events_interpolate


def _interp(spark, rows):
    from apachebeamkmeans_spark.queries_events import q_events_interpolate

    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    import apachebeamkmeans_spark.queries_events as QE

    orig = QE._events
    QE._events = lambda _s, _d: df
    try:
        return {
            (r["event_type"], r["bucket_us"]): r
            for r in q_events_interpolate(spark, "unused").collect()
        }
    finally:
        QE._events = orig


def test_interpolate_lerps_interior_gap(spark):
    rows = [
        (1, datetime(2024, 1, 1, 0, 30), 1, "a", 10.0, None),
        (2, datetime(2024, 1, 1, 3, 15), 1, "a", 40.0, None),
    ]
    out = _interp(spark, rows)
    us = lambda h: int(datetime(2024, 1, 1, h).timestamp() * 1_000_000)  # noqa: E731
    assert len(out) == 4  # hours 0..3
    # known endpoints pass through
    assert out[("a", us(0))]["interp_avg"] == 10.0
    assert out[("a", us(3))]["interp_avg"] == 40.0
    # interior gaps lerp on the hour grid: 10 + (40-10) * (h/3)
    assert out[("a", us(1))]["is_gap"] is True
    assert out[("a", us(1))]["interp_avg"] == 20.0
    assert out[("a", us(2))]["interp_avg"] == 30.0


def test_interpolate_edge_gaps_clamp_to_nearest(spark):
    # gaps BEFORE the first / AFTER the last known hour can't exist
    # (the spine spans known bounds), so clamping shows up only via a
    # single-known-hour series: every spine row is that value
    rows = [
        (1, datetime(2024, 1, 1, 5, 0), 1, "b", 7.0, None),
        (2, datetime(2024, 1, 1, 5, 40), 1, "b", 9.0, None),
    ]
    out = _interp(spark, rows)
    assert len(out) == 1
    (_, r), = out.items()
    assert r["interp_avg"] == 8.0 and r["is_gap"] is False


# ----------------------------------------------------- unigram_logprob


def test_unigram_logprob_uniform_corpus(spark):
    import math

    # 4 tokens total, each unique → every doc's avg logprob = ln(1/4)
    out = TX.unigram_logprob(_docs(spark, ["a b", "c d"])).collect()
    want = round(math.log(0.25), 6)
    assert [r["avg_logprob"] for r in out] == [want, want]
    assert all(r["n_tokens"] == 2 for r in out)


def test_unigram_logprob_rare_tokens_score_lower(spark):
    out = {
        r["doc_id"]: r
        for r in TX.unigram_logprob(
            _docs(spark, ["the the the the", "zebra quux"])
        ).collect()
    }
    # doc0 is all high-probability tokens, doc1 all hapaxes
    assert out[0]["avg_logprob"] > out[1]["avg_logprob"]


# ------------------------------------------------------ semantic_dedup


def test_semantic_dedup_verdicts(spark, sf_dir):
    from apachebeamkmeans_spark.queries_similarity import (
        SEMDEDUP_TAU,
        q_semantic_dedup,
    )

    rows = q_semantic_dedup(spark, sf_dir).collect()
    n = len(rows)
    assert n > 0
    pruned = [r for r in rows if r["pruned"]]
    # the verdict is exactly the threshold rule
    for r in rows:
        if r["max_cos_lower"] is None:
            assert not r["pruned"]
        else:
            assert r["pruned"] == (r["max_cos_lower"] >= SEMDEDUP_TAU)
    # per cluster, the lowest-id vector can never be pruned (it has no
    # lower-id shadow)
    by_cell: dict[int, list] = {}
    for r in rows:
        by_cell.setdefault(r["cell"], []).append(r)
    for members in by_cell.values():
        survivor = min(members, key=lambda r: r["vec_id"])
        assert not survivor["pruned"]
    # the measured distribution prunes a meaningful, minority fraction
    assert 0 < len(pruned) < n / 2


# -------------------------------------------------- sim_coverage_sample


def test_coverage_sample_keeps_farthest_per_cell(spark, sf_dir):
    from apachebeamkmeans_spark.queries_similarity import (
        COVERAGE_PER_CELL,
        q_sim_coverage_sample,
        q_semantic_dedup,
    )

    rows = q_sim_coverage_sample(spark, sf_dir).collect()
    assert rows
    by_cell: dict[int, list] = {}
    for r in rows:
        by_cell.setdefault(r["cell"], []).append(r)
    for members in by_cell.values():
        # at most the budget per cell, ranks contiguous from 1,
        # distances non-increasing with rank
        assert len(members) <= COVERAGE_PER_CELL
        members.sort(key=lambda r: r["rank"])
        assert [m["rank"] for m in members] == list(range(1, len(members) + 1))
        ds = [m["dist_sq"] for m in members]
        assert ds == sorted(ds, reverse=True)
    # the sample covers every non-empty cell of the same clustering
    cells = {r["cell"] for r in q_semantic_dedup(spark, sf_dir).collect()}
    assert {r["cell"] for r in rows} == cells


def test_coverage_sample_window_is_group_limited(spark, sf_dir):
    """Per-cell selection must bound state map-side (WindowGroupLimit),
    never buffer a cell's full membership through the shuffle."""
    from apachebeamkmeans_spark.plans import explain as X
    from apachebeamkmeans_spark.queries_similarity import q_sim_coverage_sample

    plan = X.formatted_plan(q_sim_coverage_sample(spark, sf_dir))
    assert "WindowGroupLimit" in plan


# -------------------------------------------- lang_temperature_sample


def test_temperature_sample_flattens_skew(spark):
    # 80/16/4 split: α=0.5 must give the dominant group the LOWEST
    # rate and the rare group the highest (capped at 1.0)
    rows = [(i, "x", "big" if i < 80 else ("mid" if i < 96 else "rare"))
            for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["lang"]: r for r in TX.temperature_sample(df, budget=0.5).collect()}
    assert set(out) == {"big", "mid", "rare"}
    assert out["big"]["rate"] < out["mid"]["rate"] <= out["rare"]["rate"] <= 1.0
    for r in out.values():
        assert 0 <= r["n_kept"] <= r["n_docs"]
    # the derived rates target the budget: expected kept ≈ 50 (the
    # hash coin adds binomial noise; bound loosely)
    exp = sum(out[g]["rate"] * out[g]["n_docs"] for g in out)
    assert abs(exp - 50) < 1.0 or out["rare"]["rate"] == 1.0


def test_temperature_sample_uniform_groups_equal_rates(spark):
    rows = [(i, "x", f"g{i % 4}") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = TX.temperature_sample(df, budget=0.4).collect()
    rates = {r["rate"] for r in out}
    assert rates == {0.4}


# ------------------------------------------------ sim_curation_pipeline


def test_curation_pipeline_composes_stages(spark, sf_dir):
    """The one-plan capstone must agree with its stage queries: every
    selected vector is an unpruned survivor of semantic_dedup, and
    per-cell selection obeys the coverage budget with the same
    farthest-first order among survivors."""
    from apachebeamkmeans_spark.queries_similarity import (
        COVERAGE_PER_CELL,
        q_semantic_dedup,
        q_sim_curation_pipeline,
    )

    sel = q_sim_curation_pipeline(spark, sf_dir).collect()
    assert sel
    verdicts = {r["vec_id"]: r for r in q_semantic_dedup(spark, sf_dir).collect()}
    by_cell: dict[int, list] = {}
    for r in sel:
        v = verdicts[r["vec_id"]]
        assert not v["pruned"]
        assert v["cell"] == r["cell"]
        by_cell.setdefault(r["cell"], []).append(r)
    for members in by_cell.values():
        assert len(members) <= COVERAGE_PER_CELL
        members.sort(key=lambda r: r["rank"])
        ds = [m["dist_sq"] for m in members]
        assert ds == sorted(ds, reverse=True)


# ---------------------------------------------------- events_retention


def test_retention_cohorts_hand_built(spark):
    from datetime import datetime

    import apachebeamkmeans_spark.queries_events as QE

    # user 1: weeks 0,1,2 of cohort A; user 2: weeks 0,2; user 3 joins
    # a week later (cohort B), active that week only
    mk = lambda d, u: (u * 100 + d.day, d, u, "click", 1.0, None)  # noqa: E731
    rows = [
        mk(datetime(2024, 1, 1), 1), mk(datetime(2024, 1, 8), 1),
        mk(datetime(2024, 1, 15), 1),
        mk(datetime(2024, 1, 2), 2), mk(datetime(2024, 1, 16), 2),
        mk(datetime(2024, 1, 10), 3),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    orig = QE._events
    QE._events = lambda _s, _d: df
    try:
        out = {
            (r["cohort_us"], r["week_n"]): r
            for r in QE.q_events_retention(spark, "x").collect()
        }
    finally:
        QE._events = orig
    us = lambda d: int(datetime(2024, 1, d).timestamp() * 1_000_000)  # noqa: E731
    a, b = us(1), us(8)  # Mondays: cohort A = Jan 1, cohort B = Jan 8
    assert out[(a, 0)]["n_users"] == 2 and out[(a, 0)]["retention"] == 1.0
    assert out[(a, 1)]["n_users"] == 1 and out[(a, 1)]["retention"] == 0.5
    assert out[(a, 2)]["n_users"] == 2 and out[(a, 2)]["retention"] == 1.0
    assert out[(b, 0)]["n_users"] == 1 and out[(b, 0)]["retention"] == 1.0
    assert set(out) == {(a, 0), (a, 1), (a, 2), (b, 0)}


def test_bpe_batched_merges_equal_serial(spark, sf_dir):
    """The r18 speculative multi-merge batch (top-J candidates +
    trigram-bound conflict check) must produce EXACTLY the serial
    trainer's merge list — on the real corpus vocab AND on an
    adversarial vocab built to trigger each rejection rule (shared
    symbols; a merge whose new pair would win the next round; greedy
    overlap chains)."""
    from apachebeamkmeans_spark.operators import textstats as TX
    from apachebeamkmeans_spark.sources import io

    vocab = TX.bpe_word_vocab(
        io.read_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    batched, _ = TX._bpe_fit_vocab(vocab, 20, batch_candidates=8)
    serial, _ = TX._bpe_fit_vocab(vocab, 20, batch_candidates=1)
    assert batched == serial and len(serial) > 0

    # adversarial: 'xab' * many -> merging (a,b) creates (x, ab) with a
    # count that must block speculation of the next candidate; 'abab'
    # exercises greedy chains ((ab,ab) from 4-grams); 'cd'/'ce' share
    # symbol c across candidates.
    rows = (
        [(i, "xab xab abab") for i in range(50)]
        + [(1000 + i, "cd ce dc abab") for i in range(49)]
        + [(2000 + i, "aaa qq") for i in range(30)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    vocab2 = TX.bpe_word_vocab(docs)
    batched2, f2 = TX._bpe_fit_vocab(vocab2, 12, batch_candidates=8)
    serial2, f1 = TX._bpe_fit_vocab(vocab2, 12, batch_candidates=1)
    assert batched2 == serial2 and len(serial2) > 0
    # final vocab frames identical too (the encoder consumes them)
    a = sorted(tuple(r) for r in f2.collect())
    b = sorted(tuple(r) for r in f1.collect())
    assert a == b
