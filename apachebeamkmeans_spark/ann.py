"""User-facing ANN index facade: train → build → save/load → append →
search, over the operators the engine already certifies individually
(`ann_train.ivf_train`, `similarity.build_ivf_index` /
`append_to_ivf_index` / `ivf_topk_indexed`). The library analog of
`CurationPipeline` for the similarity stack:

    from apachebeamkmeans_spark.ann import AnnIndex

    idx = AnnIndex.train(spark, embeddings, "/data/ann_idx")   # once
    hits = idx.topk([q1, q2], k=5, nprobe=2)                   # search
    idx.append(new_embeddings)                                 # ingest
    idx2 = AnnIndex.load(spark, "/data/ann_idx")               # later session

The on-disk layout is the certified hive-partitioned IVF table (one
`coarse_id=` directory per cell — a probe is a partition-pruned scan,
plan-locked in tests/test_plans.py) plus a `_ann_params` sidecar (one-row Spark text table)
holding the trained centers and config, so a later session searches
without retraining. Vectors are L2-normalized at train/append time;
raw query vectors are L2-normalized by `topk` / `topk_table`
themselves (the facade contract — callers pass raw vectors; an
all-zero query has no direction and is rejected/dropped).

Scale posture: training is the k-row-collect Lloyd the engine uses
everywhere; the search reads nprobe/k of the partitions; appends touch
only the directories their batch lands in. Past ~10⁷ vectors per cell
budget, the escalation is the trained IVF-PQ stack
(`queries_similarity.q_sim_ivfpq_trained`, `similarity.knn_graph_pq`)
— same coarse layout, PQ codes instead of raw vectors on the scan.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from apachebeamkmeans_spark.operators import ann_train as ANN
from apachebeamkmeans_spark.operators import similarity as SIM


def _norm_vec(q: list[float]) -> list[float]:
    """Driver-side L2 normalization of one literal query — the exact
    left-to-right formula `queries_similarity._norm_q` uses, so a
    facade-normalized raw query embeds the same doubles an oracle
    built from pre-normalized literals expects. A zero-norm query has
    no direction: raise the same descriptive error class the batch
    paths express as their `__nsq > 0` drop-filter (ADVICE r11 — the
    facade's two entry points must agree on invalid input)."""
    n = sum(float(v) * float(v) for v in q) ** 0.5
    if n == 0.0:
        raise ValueError(
            "AnnIndex query vector has zero L2 norm (no direction to "
            "search in); topk_table drops such rows, literal topk "
            "rejects them"
        )
    return [float(v) / n for v in q]


def _normalize(embeddings: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    # the layout's read schema is fixed at `vec_id bigint`
    # (similarity.INDEX_SCHEMA): a non-integral id would WRITE fine and
    # then fail confusingly at the first topk read — reject it here
    dt = embeddings.schema[id_col].dataType
    if not isinstance(dt, (ByteType, ShortType, IntegerType, LongType)):
        raise ValueError(
            f"AnnIndex id column {id_col!r} must be an integral type "
            f"(the index layout stores vec_id as bigint), got {dt.simpleString()}"
        )
    return ANN.l2_normalize(
        embeddings.select(
            F.col(id_col).cast("long").alias("id"),
            F.col(vec_col).cast("array<double>").alias("features"),
        )
    )


class AnnIndex:
    """Handle to a materialized IVF index (layout + trained centers).
    Construct via `train` or `load`, never directly."""

    # underscore prefix: parquet directory readers skip it, like
    # _SUCCESS. Written/read THROUGH Spark (one-row text frame), not
    # driver-local open(), so the sidecar lands on the same filesystem
    # as the layout — hdfs://, s3a://, or local alike.
    _PARAMS = "_ann_params"

    def __init__(self, spark: SparkSession, path: str,
                 centers: list[list[float]],
                 codebooks: list[list[list[float]]] | None = None):
        self._spark = spark
        self.path = path
        self.centers = centers
        self.codebooks = codebooks  # None = flat IVF (v1 layout)

    @property
    def n_cells(self) -> int:
        return len(self.centers)

    @staticmethod
    def train(spark: SparkSession, embeddings: DataFrame, path: str,
              k: int | None = None, n_iters: int = 5,
              id_col: str = "vec_id", vec_col: str = "embedding",
              pq_m: int | None = None, pq_ksub: int = 16,
              ) -> "AnnIndex":
        """Train a √n-cell coarse quantizer (FAISS cell rule unless `k`
        is given) over the L2-normalized embeddings, materialize the
        partitioned layout at `path`, and persist the trained
        parameters as the sidecar. One training, any number of later
        sessions.

        `pq_m` switches the index to the IVF-PQ tier (the documented
        escalation past ~10⁷ vectors per cell budget): additionally
        train `pq_m`×`pq_ksub` product-quantization codebooks, store m
        codes per row alongside the raw vector in the layout, and
        serve ADC-shortlist + exact-refine searches — per candidate,
        the scan reads m ints and the exact distance runs on refine
        rows only."""
        vecs = _normalize(embeddings, id_col, vec_col).localCheckpoint(
            eager=False
        )
        if k is None:
            from apachebeamkmeans_spark.operators.ann_train import knn_cells

            k = knn_cells(vecs.count())
        centers = [
            [ANN.round_param(v) for v in c]
            for c in ANN.ivf_train(vecs, k, n_iters)
        ]
        if pq_m is None:
            SIM.build_ivf_index(vecs, centers, path)
            books = None
        else:
            books = [
                [[ANN.round_param(v) for v in cent] for cent in book]
                for book in ANN.pq_train(vecs, pq_m, pq_ksub, n_iters)
            ]
            SIM.build_ivfpq_index(vecs, centers, books, path)
        # the sidecar write is `adopt`'s job — train IS an adopt of the
        # layout it just built, under the parameters it just trained
        return AnnIndex.adopt(spark, path, centers, books)

    @staticmethod
    def adopt(spark: SparkSession, path: str,
              centers: list[list[float]],
              codebooks: list[list[list[float]]] | None = None,
              ) -> "AnnIndex":
        """Attach a `_ann_params` sidecar to an EXISTING layout built
        by the operator layer (`similarity.build_ivf_index` /
        `build_ivfpq_index` with externally trained parameters),
        making it loadable/searchable through the facade — the bridge
        for layouts a separate training job materialized. The caller
        asserts `centers` (and `codebooks`, for a PQ layout) are the
        parameters the layout was ASSIGNED under; adopting a layout
        with foreign centers would probe the wrong directories.
        Idempotent (overwrite)."""
        from pyspark.sql import functions as F

        if codebooks is None:
            payload = json.dumps({"centers": centers, "version": 1})
            idx = AnnIndex(spark, path, centers)
        else:
            payload = json.dumps(
                {"centers": centers, "codebooks": codebooks, "version": 2}
            )
            idx = AnnIndex(spark, path, centers, codebooks)
        # one-row frame built AS one partition (spark.range(...,
        # numPartitions=1) + lit), not createDataFrame().coalesce(1):
        # the coalesced local relation costs ~5-7 s per write on this
        # stack (32 Arrow partitions funneled through one task);
        # the single-partition range write is ~0.15 s (measured r12)
        spark.range(0, 1, 1, 1).select(
            F.lit(payload).alias("value")
        ).write.mode("overwrite").text(os.path.join(path, AnnIndex._PARAMS))
        return idx

    # formats this code knows how to read; bump alongside _PARAMS
    # layout changes so an old library fails loudly on a newer index.
    # v1 = flat IVF layout; v2 = IVF-PQ layout (codes column +
    # codebooks in the sidecar).
    _KNOWN_VERSIONS = (1, 2)

    @staticmethod
    def load(spark: SparkSession, path: str) -> "AnnIndex":
        from pyspark.errors import AnalysisException

        sidecar = os.path.join(path, AnnIndex._PARAMS)
        try:
            rows = spark.read.text(sidecar).collect()
        except AnalysisException as e:
            # scoped to the missing-path analysis error: a transient
            # IO/executor failure must propagate as itself so the
            # caller retries instead of concluding the index is gone
            # (r11 review)
            raise ValueError(
                f"AnnIndex.load: no {AnnIndex._PARAMS} sidecar at "
                f"{sidecar!r} — not an AnnIndex directory, or the index was "
                f"never finished by train()"
            ) from e
        if not rows:
            raise ValueError(
                f"AnnIndex.load: empty {AnnIndex._PARAMS} sidecar at "
                f"{sidecar!r} (partially-written index?)"
            )
        try:
            params = json.loads(rows[0]["value"])
        except (ValueError, TypeError) as e:
            raise ValueError(
                f"AnnIndex.load: corrupt {AnnIndex._PARAMS} sidecar at "
                f"{sidecar!r} (partially-written index?)"
            ) from e
        version = params.get("version")
        if version not in AnnIndex._KNOWN_VERSIONS:
            raise ValueError(
                f"AnnIndex.load: sidecar version {version!r} at {sidecar!r} "
                f"is not one this library reads ({AnnIndex._KNOWN_VERSIONS}) "
                f"— index written by an incompatible AnnIndex build"
            )
        return AnnIndex(
            spark, path, params["centers"], params.get("codebooks")
        )

    def append(self, embeddings: DataFrame,
               id_col: str = "vec_id", vec_col: str = "embedding") -> None:
        """Coarse-assign (and on the PQ tier, encode) a new batch and
        append it to the layout — dynamic-partition append, existing
        directories untouched. Post-append searches equal a
        from-scratch rebuild over the union (the operator-level
        guarantee, asserted in tests/test_similarity_mm.py and
        tests/test_ann_index.py)."""
        vecs = _normalize(embeddings, id_col, vec_col)
        if self.codebooks is None:
            SIM.append_to_ivf_index(vecs, self.centers, self.path)
        else:
            SIM.append_to_ivfpq_index(
                vecs, self.centers, self.codebooks, self.path
            )

    def cell_stats(self) -> DataFrame:
        """Per-cell occupancy of the layout: (coarse_id, n_rows) — the
        index-health view an operator watches. Balanced cells mean
        balanced probe costs; a stream of appends drifts occupancy
        away from the trained distribution, and a max/median ratio
        creeping up is the retrain signal (the coarse quantizer no
        longer fits the data). The scan reads ONLY the partition
        column — column pruning means counting a 100 TB index touches
        file metadata, not vector bytes. Certified by
        `ann_index_cell_stats` (oracle = the coarse-assign replay
        grouped by cell)."""
        from pyspark.sql import functions as F

        schema = (
            SIM.PQ_INDEX_SCHEMA if self.codebooks is not None
            else SIM.INDEX_SCHEMA
        )
        return (
            self._spark.read.schema(schema).parquet(self.path)
            .groupBy("coarse_id")
            .agg(F.count("*").alias("n_rows"))
        )

    def compact(self) -> None:
        """Rewrite the layout to ~one file per coarse cell — the
        maintenance job an append-heavy index needs: every `append`
        adds at least one file per touched cell directory, and at
        ingest-pipeline rates the layout degrades into a small-file
        scan (each probe pays per-file open/footer costs instead of
        one sequential read). One shuffle keyed by `coarse_id`
        (`repartition(n_cells, col)` → each cell's rows land in one
        task → one file per cell directory), staged into a sibling
        dir with the sidecar re-attached, then swapped in with two
        renames. Search results are IDENTICAL before and after
        (certified by `ann_index_compact_search` against the same
        oracle as the uncompacted lifecycle, and by the PQ-tier test
        in tests/test_ann_index.py).

        The generation swap is two directory renames, which is a
        DRIVER-LOCAL posix operation — a remote (hdfs://, s3a://)
        index is rejected up front rather than failing after the full
        rewrite (r12 review); a cluster deployment stages generations
        behind a catalog pointer instead (the same generational
        pattern the engine's scratch artifacts use). If the second
        rename fails, the original layout is restored before the
        error propagates; only a process death INSIDE the two-rename
        window can leave the path absent, in which case the
        `.pre-compact.<pid>` sibling holds the intact original."""
        import shutil

        if "://" in self.path and not self.path.startswith("file://"):
            raise ValueError(
                f"AnnIndex.compact: index path {self.path!r} is on a "
                f"remote filesystem, but the compaction generation swap "
                f"is a driver-local rename — compact a local index, or "
                f"stage generations behind a catalog pointer instead"
            )
        schema = (
            SIM.PQ_INDEX_SCHEMA if self.codebooks is not None
            else SIM.INDEX_SCHEMA
        )
        tmp = f"{self.path}.compact.{os.getpid()}"
        (
            self._spark.read.schema(schema).parquet(self.path)
            .repartition(self.n_cells, "coarse_id")
            .write.partitionBy("coarse_id")
            .mode("overwrite")
            .parquet(tmp)
        )
        AnnIndex.adopt(self._spark, tmp, self.centers, self.codebooks)
        old = f"{self.path}.pre-compact.{os.getpid()}"
        os.rename(self.path, old)
        try:
            os.rename(tmp, self.path)
        except OSError:
            # restore the original generation before propagating — the
            # index path must never be left empty by a failed swap
            os.rename(old, self.path)
            raise
        shutil.rmtree(old, ignore_errors=True)

    def topk(self, queries: list[list[float]], k: int = 5,
             nprobe: int = 1, refine: int = 50) -> DataFrame:
        """Top-k cosine per literal query vector, all queries in one
        partition-pruned scan: (qid, probe_cell, vec_id, cosine,
        rank). Queries are L2-normalized HERE (the facade contract —
        callers pass raw vectors), which keeps the PQ tier's LUTs,
        probe choice, and dot-as-cosine consistent regardless of the
        input's scale. On the PQ tier the scan ranks by ADC over the
        stored codes and re-ranks the top-`refine` shortlist exactly
        (`refine` is ignored on the flat tier)."""
        qn = [_norm_vec(q) for q in queries]
        if self.codebooks is None:
            return SIM.ivf_topk_indexed(
                self._spark, self.path, qn, self.centers, k, nprobe
            )
        return SIM.ivfpq_topk_indexed(
            self._spark, self.path, qn, self.centers, self.codebooks,
            k, nprobe, refine,
        )

    def topk_table(self, queries: DataFrame, k: int = 5, nprobe: int = 1,
                   qid_col: str = "qid", qvec_col: str = "qvec",
                   refine: int = 50) -> DataFrame:
        """Top-k cosine per QUERY-TABLE row — the batch serving shape:
        probe cells picked in-plan from the trained centers,
        candidates joined from the layout, one per-qid window. On the
        PQ tier each query row computes its own ADC LUT in-plan and
        only the refine shortlist is re-ranked exactly. Use this when
        the queries are data (an embedding batch, a probe set), `topk`
        when they are a handful of literals; certified by
        `sim_ivf_batch_topk` / `sim_ivfpq_batch_topk`."""
        from pyspark.sql import functions as F

        qtab = queries.select(
            F.col(qid_col).alias("qid"), F.col(qvec_col).alias("qvec")
        )
        if self.codebooks is None:
            index = self._spark.read.schema(SIM.INDEX_SCHEMA).parquet(self.path)
            return SIM.ivf_batch_topk(index, qtab, self.centers, k, nprobe)
        return SIM.ivfpq_batch_topk_indexed(
            self._spark, self.path, qtab, self.centers, self.codebooks,
            k, nprobe, refine,
        )
