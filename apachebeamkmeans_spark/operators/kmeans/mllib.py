"""MLlib delegation path — the flagship approach per BASELINE.json
("MLlib KMeans clustering over DataFrame").

The reference's entire repo is hand-rolled K-Means; on Spark the
idiomatic answer is `pyspark.ml.clustering.KMeans` over a Vector
column: distributed k-means|| init, DataFrame-native, seeded. The
custom Lloyd/init implementations in this package exist to (a) cover
the reference's six exact init strategies and Minkowski-p metric
(MLlib only does euclidean/cosine), and (b) stay oracle-checkable.
"""

from __future__ import annotations

from pyspark.ml.clustering import KMeans as MLKMeans
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mllib_kmeans_fit(df: DataFrame, k: int = 4, seed: int = 42, max_iter: int = 20,
                     features_col: str = "features") -> tuple[object, DataFrame]:
    """Fit MLlib KMeans on (id, features ARRAY<DOUBLE>); returns
    (model, assignments DataFrame(id, center_id))."""
    vec = df.withColumn("__vec", array_to_vector(F.col(features_col)))
    if vec.isEmpty():
        raise ValueError("k-means fit requires a non-empty points frame")
    km = MLKMeans(k=k, seed=seed, maxIter=max_iter, featuresCol="__vec", predictionCol="center_id")
    model = km.fit(vec)
    assigned = model.transform(vec).drop("__vec")
    return model, assigned
