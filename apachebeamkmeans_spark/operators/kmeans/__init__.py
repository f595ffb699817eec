from apachebeamkmeans_spark.operators.kmeans.params import KMeansParams  # noqa: F401
from apachebeamkmeans_spark.operators.kmeans.model import KMeans, KMeansModel  # noqa: F401
