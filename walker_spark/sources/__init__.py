from walker_spark.sources.store import FrontierStore  # noqa: F401
