"""End-to-end runs on the reference's OWN datasets — the exact inputs
its empirical workflow clusters (SparKMeansGroupBy.java:56-57 drives
data/UCI/*.csv and data/10000_point_4_center_2_feature.txt through a
10×-experiment loop).

Quality gates use external label agreement (purity / adjusted Rand
index). All runs are seeded and deterministic, so the asserted numbers
are fixed, with thresholds set a margin below the measured values.
"""

from __future__ import annotations

import os

import pytest

from apachebeamkmeans_spark import cli
from apachebeamkmeans_spark.operators.kmeans import KMeans, KMeansParams
from apachebeamkmeans_spark.operators.kmeans.evaluation import quality_metrics
from apachebeamkmeans_spark.operators.preprocess import standardize
from apachebeamkmeans_spark.sources import io

REF_DATA = "/root/reference/data"
STRATEGIES = ["random", "plusplus", "init_max", "init_min",
              "max_farthest", "max_farthest_manhattan"]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference datasets not present"
)


def _quality(model, pts):
    return quality_metrics(model.transform(pts)).collect()[0]


@pytest.fixture(scope="module")
def seeds_pts(spark):
    pts = io.read_points_csv(spark, f"{REF_DATA}/UCI/seeds_dataset.csv", 7).cache()
    yield pts
    pts.unpersist()


@pytest.mark.parametrize("init", STRATEGIES)
def test_seeds_all_init_strategies(spark, seeds_pts, init):
    """UCI seeds (210×7, 3 balanced wheat varieties): every one of the
    six reference seeding strategies recovers the varieties at
    ARI ≥ 0.65 (measured 0.710-0.717)."""
    m = KMeans(KMeansParams(k=3, init=init, seed=42)).fit(seeds_pts)
    r = _quality(m, seeds_pts)
    assert r["n"] == 210
    assert r["ari"] >= 0.65, (init, r)
    assert r["purity"] >= 0.85
    assert len(m.centers) == 3 and m.n_iter >= 1


@pytest.mark.parametrize("init", ["plusplus", "init_max"])
def test_htru2_standardized_quality(spark, init):
    """UCI HTRU_2 (17,898×8, pulsar/noise): raw features are useless
    for K-Means (one dimension's variance dominates → ARI ≈ −0.08);
    after the engine's distributed z-score standardization the split is
    recovered at ARI ≥ 0.55 (measured 0.607/0.745)."""
    pts = standardize(
        io.read_points_csv(spark, f"{REF_DATA}/UCI/HTRU_2.csv", 8)
    ).cache()
    try:
        m = KMeans(KMeansParams(k=2, init=init, seed=42)).fit(pts)
        r = _quality(m, pts)
        assert r["n"] == 17898
        assert r["ari"] >= 0.55, (init, r)
        assert r["purity"] >= 0.9
    finally:
        pts.unpersist()


def test_user_modeling_string_labels(spark):
    """UCI user-modeling (258×5, STRING labels High/Low/Middle/very_low):
    the engine carries and evaluates against a non-numeric label column
    (measured ARI 0.32 with Gonzalez seeding on this hard dataset)."""
    pts = io.read_points_csv(
        spark,
        f"{REF_DATA}/UCI/Data_User_Modeling_Dataset_Hamdi_Tolga_KAHRAMAN.csv",
        5,
    ).cache()
    try:
        assert dict(pts.dtypes)["label"] == "string"
        m = KMeans(KMeansParams(k=4, init="max_farthest", seed=42)).fit(pts)
        r = _quality(m, pts)
        assert r["n"] == 258
        assert r["ari"] >= 0.25
        assert r["purity"] >= 0.6
    finally:
        pts.unpersist()


def test_synthetic_10000_cli_experiment_loop(spark, tmp_path):
    """The reference's flagship input (10,000 points, 4 well-separated
    2-D centers) through the CLI experiment loop (×2, mirroring the
    reference's ×10): per-run result/time/iteration files written, four
    balanced clusters recovered every run."""
    out = tmp_path / "out"
    tf, itf = tmp_path / "time.txt", tmp_path / "iters.txt"
    rc = cli.main(
        [
            f"--input={REF_DATA}/10000_point_4_center_2_feature.txt",
            "--output", str(out),
            "--k", "4", "--init", "max_farthest", "--seed", "42",
            "--experiments", "2",
            "--time_file", str(tf), "--iteration_file", str(itf),
        ],
        spark=spark,
    )
    assert rc == 0
    iters = [int(x) for x in itf.read_text().splitlines()]
    assert len(iters) == 2 and all(1 <= i <= 20 for i in iters)
    assert len(tf.read_text().splitlines()) == 2
    for exp in range(2):
        part = [f for f in os.listdir(f"{out}{exp}") if f.startswith("part-")]
        lines = open(os.path.join(f"{out}{exp}", part[0])).read().splitlines()
        assert len(lines) == 4  # one line per recovered cluster
        sizes = sorted(line.rstrip(";").count(";") + 1 for line in lines)
        assert all(2300 <= s <= 2700 for s in sizes), sizes  # ~2500 each


def test_synthetic_10000_centers_separated(spark):
    """The four fitted centers are mutually distant (the generator's
    blobs are well separated) — a center-recovery check that needs no
    labels."""
    pts = io.read_points_text(
        spark, f"{REF_DATA}/10000_point_4_center_2_feature.txt"
    ).cache()
    try:
        m = KMeans(KMeansParams(k=4, init="max_farthest", seed=42)).fit(pts)
        cs = m.centers
        for i in range(4):
            for j in range(i + 1, 4):
                d = sum((a - b) ** 2 for a, b in zip(cs[i], cs[j])) ** 0.5
                assert d >= 1.5, (i, j, d)
    finally:
        pts.unpersist()
