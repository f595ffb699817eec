from apachebeamkmeans_spark.sources import io  # noqa: F401
