from apachebeamkmeans_spark.plans import explain  # noqa: F401
