#!/usr/bin/env python
"""(Re)generate the shared scaling corpus in fixtures/bench-corpus.

Usage: python scripts/gen_bench_corpus.py [pages_per_domain]
Default 800 (the round-3 shape, ~489k pages). Pass 1600 for the 2x
amortization corpus (~978k pages) — the per-superstep constants are
sandbox scheduling/commit latency, identical at any core count, so a
bigger job measures the plan the way a cluster-scale stage would.

Writes pages/, frontier/, pages_bucketed/ (the Iceberg bucket(64, url)
analog the kernel joins against). bench_scaling.py reuses this corpus
when present instead of generating its own.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    pages_per_domain = int(sys.argv[1]) if len(sys.argv) > 1 else 800
    import bench
    from pyspark.sql import functions as F
    from walker_spark.config import WalkerConfig
    from walker_spark.operators import seed as seed_ops
    from walker_spark.sources import synthetic

    base = os.path.join(REPO, "fixtures", "bench-corpus")
    pages_path = os.path.join(base, "pages")
    frontier_path = os.path.join(base, "frontier")
    os.makedirs(base, exist_ok=True)

    spark = bench.build_spark(32)
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    pages = synthetic.generate_pages(
        spark,
        n_domains=600,
        pages_per_domain=pages_per_domain,
        seed=42,
        mega_domain=0,
        mega_factor=4,
        parallelism=64,
        words_per_page=1500,
    )
    pages.write.mode("overwrite").parquet(pages_path)
    urls = (
        spark.read.parquet(pages_path)
        .select("url")
        .filter(~F.col("url").endswith("robots.txt"))
    )
    keys = seed_ops.normalize_to_keys(urls, WalkerConfig())
    keys.select("dom", "subdom", "path", "proto").write.mode("overwrite").parquet(
        frontier_path
    )
    (
        spark.read.parquet(pages_path)
        .repartition(bench.KERNEL_PAGE_BUCKETS, F.col("url"))
        .write.mode("overwrite")
        .bucketBy(bench.KERNEL_PAGE_BUCKETS, "url")
        .sortBy("url")
        .option("path", pages_path + "_bucketed")
        .saveAsTable("walker_pages_gen")
    )
    n = spark.read.parquet(pages_path).count()
    import json

    with open(os.path.join(base, "shape.json"), "w") as f:
        json.dump(
            {"n_domains": 600, "pages_per_domain": pages_per_domain,
             "mega_factor": 4, "words_per_page": 1500},
            f,
        )
    print(f"GEN {n} pages ({pages_per_domain}/domain) in {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
