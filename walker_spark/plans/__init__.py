from walker_spark.plans import schemas  # noqa: F401
