from walker_spark.streaming.loop import CrawlEngine  # noqa: F401
