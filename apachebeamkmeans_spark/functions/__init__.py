from apachebeamkmeans_spark.functions import distance, hashing, text  # noqa: F401
