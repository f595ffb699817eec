"""PCA basis training + projection (r10): the width reducer in front
of the ANN stack (the rotation half of OPQ, Ge et al. 2013).

The twin contract is different from the Lloyd trainers: both engines
accumulate mean/covariance independently (distributed vs numpy — ulp-
level summation differences), ROUND THE COVARIANCE, then run the SAME
driver-side eigen step — so the trained basis must match bit-for-bit,
not approximately (a). The rest checks the basis is a real PCA:
orthonormal rows (b), eigenvalue-descending projected variance (c),
and the Spark projection operator equals the numpy matrix product (d).
"""

from __future__ import annotations

import numpy as np

from apachebeamkmeans_spark import queries_similarity as QS
from apachebeamkmeans_spark.operators import ann_train as ANN
from apachebeamkmeans_spark.operators import similarity as SIM
from apachebeamkmeans_spark.sources import io

SF = "/root/testdata/sf0.01"


def _np_corpus():
    return ANN.normalized_embeddings_np(SF)


def test_pca_trainer_matches_numpy_twin(spark):
    _ids, mat = _np_corpus()
    np_mean, np_comps = ANN.pca_train_np(mat, QS.PCA_DIM)
    sp_mean, sp_comps = ANN.pca_train(
        ANN.l2_normalize(io.load_points(spark, SF)), QS.PCA_DIM
    )
    assert sp_mean == np_mean
    assert sp_comps == np_comps


def test_components_are_orthonormal():
    w = np.asarray(QS.PCA_TRAINED_COMPONENTS)
    g = w @ w.T
    # rows are unit eigenvectors rounded to 4 decimals: identity up to
    # the rounding-induced wobble (64 dims × 1e-4 per entry)
    assert np.abs(g - np.eye(len(w))).max() < 5e-3


def test_projected_variance_is_eigen_descending():
    _ids, mat = _np_corpus()
    y = (mat - np.asarray(QS.PCA_TRAINED_MEAN)) @ np.asarray(
        QS.PCA_TRAINED_COMPONENTS
    ).T
    var = y.var(axis=0, ddof=1)
    assert all(var[i] >= var[i + 1] - 1e-9 for i in range(len(var) - 1))
    # and the basis actually concentrates variance: the PCA_DIM-slice
    # captures more than a random same-width slice would (PCA_DIM/dim)
    total = ((mat - mat.mean(axis=0)) ** 2).sum(axis=0).sum() / (len(mat) - 1)
    assert var.sum() > (QS.PCA_DIM / mat.shape[1]) * total


def test_spark_projection_matches_numpy(spark):
    ids, mat = _np_corpus()
    got = {
        r["vec_id"]: np.asarray(r["pc"])
        for r in SIM.pca_project(
            ANN.l2_normalize(io.load_points(spark, SF)),
            QS.PCA_TRAINED_MEAN,
            QS.PCA_TRAINED_COMPONENTS,
        ).collect()
    }
    want = (mat - np.asarray(QS.PCA_TRAINED_MEAN)) @ np.asarray(
        QS.PCA_TRAINED_COMPONENTS
    ).T
    for i, vid in enumerate(map(int, ids)):
        assert np.abs(got[vid] - want[i]).max() < 1e-9


def test_arrow_impl_matches_fold(spark):
    """impl='arrow' (per-batch BLAS GEMM) equals the certified fold
    path to 1e-9 — the summation-order gap is ~1e-15, far inside the
    projection's 6-decimal output rounding."""
    base = ANN.l2_normalize(io.load_points(spark, SF)).localCheckpoint()
    fold = {
        r["vec_id"]: np.asarray(r["pc"])
        for r in SIM.pca_project(
            base, QS.PCA_TRAINED_MEAN, QS.PCA_TRAINED_COMPONENTS
        ).collect()
    }
    arrow = {
        r["vec_id"]: np.asarray(r["pc"])
        for r in SIM.pca_project(
            base, QS.PCA_TRAINED_MEAN, QS.PCA_TRAINED_COMPONENTS,
            impl="arrow",
        ).collect()
    }
    assert fold.keys() == arrow.keys()
    assert max(
        np.abs(fold[k] - arrow[k]).max() for k in fold
    ) < 1e-9


def test_arrow_certification_margin(spark):
    """The portability contract behind `sim_pca_project_arrow`'s 4-dp
    rounding (r12 verdict item 2): every projected value at the
    certification sf must sit at least PCA_ARROW_MARGIN from its
    nearest PCA_ARROW_ROUND-dp rounding boundary. The margin (1e-11)
    is ~1000× the worst deviation a differently-ordered 64-term BLAS
    summation can introduce on unit inputs (~dim·eps ≈ 1.4e-14), so
    ANY BLAS build rounds every certified value to the same 4-dp
    number — the driver row can no longer read false on a host whose
    BLAS isn't bit-identical to the fold. If the data ever violates
    this, the fix is bumping PCA_ARROW_ROUND down, not weakening the
    margin."""
    _ids, mat = _np_corpus()
    proj = (mat - np.asarray(QS.PCA_TRAINED_MEAN)) @ np.asarray(
        QS.PCA_TRAINED_COMPONENTS
    ).T
    scaled = np.abs(proj.ravel()) * (10.0 ** QS.PCA_ARROW_ROUND)
    # distance to the nearest half-integer (the round-half-away
    # boundary both engines share), back in value units
    frac = np.abs(scaled - np.floor(scaled) - 0.5)
    margin = frac.min() / (10.0 ** QS.PCA_ARROW_ROUND)
    assert margin >= QS.PCA_ARROW_MARGIN, (
        f"min boundary margin {margin:.3e} < {QS.PCA_ARROW_MARGIN:.0e}: "
        f"a 4-dp value sits too close to a rounding boundary for the "
        f"portability contract"
    )


def test_zero_variance_dimension_keeps_twin_contract(spark):
    """A constant feature dimension makes Pearson corr NaN; the Spark
    trainer must force its covariance to the true 0.0 (what np.cov
    yields) rather than poisoning eigh with NaN — degenerate dims are
    what zero-padded or masked embeddings look like."""
    import pandas as pd

    rng = np.random.default_rng(7)
    mat = rng.normal(size=(50, 6))
    mat[:, 2] = 0.25  # constant dim
    pdf = pd.DataFrame(
        {"id": range(50), "features": [list(map(float, r)) for r in mat]}
    )
    df = spark.createDataFrame(pdf)
    sp_mean, sp_comps = ANN.pca_train(df, 3)
    np_mean, np_comps = ANN.pca_train_np(mat, 3)
    assert sp_mean == np_mean
    assert sp_comps == np_comps
    assert all(np.isfinite(v) for row in sp_comps for v in row)


def test_auto_impl_dispatches_by_width(spark):
    """impl="auto" picks the physical plan by per-row arithmetic:
    below PCA_ARROW_MIN_FMAS the fold (pure JVM, whole-stage codegen);
    at or above it the Arrow GEMM (MapInPandas node). Locked so a
    future refactor can't silently flip the scale path back to the
    interpreted fold at real embedding widths (r10 verdict item 3)."""
    from apachebeamkmeans_spark.plans import explain as X

    dim_small, out_small = 8, 4          # 32 FMAs -> fold
    rows = [(i, [float(i + j) for j in range(dim_small)]) for i in range(4)]
    small = spark.createDataFrame(rows, "id long, features array<double>")
    mean_s = [0.0] * dim_small
    comps_s = [[1.0 if j == c else 0.0 for j in range(dim_small)]
               for c in range(out_small)]
    plan_small = X.formatted_plan(
        SIM.pca_project(small, mean_s, comps_s, impl="auto")
    )
    assert "MapInPandas" not in plan_small and "zip_with" in plan_small

    dim_big, out_big = 128, 64           # 8192 FMAs -> arrow
    rows = [(i, [float(i + j) for j in range(dim_big)]) for i in range(4)]
    big = spark.createDataFrame(rows, "id long, features array<double>")
    mean_b = [0.0] * dim_big
    comps_b = [[1.0 if j == c else 0.0 for j in range(dim_big)]
               for c in range(out_big)]
    plan_big = X.formatted_plan(
        SIM.pca_project(big, mean_b, comps_b, impl="auto")
    )
    assert "MapInPandas" in plan_big
    assert dim_small * out_small < SIM.PCA_ARROW_MIN_FMAS <= dim_big * out_big
