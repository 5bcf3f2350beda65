#!/usr/bin/env python
"""Sub-profile the superstep's outlinks_unseen stage in isolation.

The scaling suite shows outlinks_unseen at ~2.4x between local[1] and
local[4] while fetch_parse runs ~3.3x — solving the two-point system
puts ~8-12 s of non-scaling work inside the stage. This script names
that term instead of guessing: it snapshots the stage's exact inputs
(the slim parse output `results` via SPARK_GRAFT_DUMP_PARSED, plus a
per-level seeded store with that level's bucket count), then times the
stage's sub-pipelines at each level:

  explode_dedup   explode links + dropDuplicates(url)          (volume)
  normalize       + normalize_to_keys UDF + accept filter      (volume)
  key_dedup       + dropDuplicates(LINK_KEY)                   (exchange)
  probe           + bloom broadcast probe, definitely-new count
  full_cold       the real stage: filter_unseen + localCheckpoint
  full_warm       the same stage again (codegen/broadcast caches warm)

full_cold - full_warm ~ per-job driver constants (plan compile,
codegen, broadcast rebuilds); the warm number splits into the
sub-pipeline deltas. Each level runs in a fresh JVM.

Usage: python scripts/profile_outlinks.py [cpus ...]   (default: 1 4)
Prep artifacts land in fixtures/profile-outlinks/ (gitignored).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PAGES = os.path.join(REPO, "fixtures", "bench-corpus", "pages")
PROF = os.path.join(REPO, "fixtures", "profile-outlinks")
RESULTS = os.path.join(PROF, "parsed")

# capture `results` once: one default-budget superstep at local[8];
# the parse output is level-independent (deterministic claim + parse)
PREP = r"""
import json, sys, tempfile, shutil, time, os
sys.path.insert(0, {repo!r})
os.environ["SPARK_GRAFT_DUMP_PARSED"] = {results!r}
import bench
from pyspark.sql import functions as F
from walker_spark.config import DispatcherConfig, FrontierConfig, WalkerConfig
from walker_spark.streaming.loop import CrawlEngine

spark = bench.build_spark(8)
spark.sparkContext.setLogLevel("ERROR")
workdir = tempfile.mkdtemp(prefix="walker-profprep-")
cfg = WalkerConfig(frontier=FrontierConfig(num_domain_buckets=16,
                                           claim_limit=100000,
                                           iteration_time_budget=500.0),
                   dispatcher=DispatcherConfig(max_links_per_segment=1000))
engine = CrawlEngine(spark, workdir, cfg, use_bloom=True)
engine.store.overwrite("pages", spark.read.parquet({pages!r}))
from walker_spark.operators.fetch import register_bucketed_pages
if os.path.isdir({pages!r} + "_bucketed"):
    register_bucketed_pages(engine.store, {pages!r} + "_bucketed",
                            bench.KERNEL_PAGE_BUCKETS)
seeds = engine.store.read("pages").select("url").filter(
    ~F.col("url").endswith("robots.txt"))
engine.seed(seeds)
engine.run(1, start_now_ms=1_700_000_000_000)
print("RESULT " + json.dumps({{"prep": "ok"}}))
shutil.rmtree(workdir, ignore_errors=True)
"""

STEP = r"""
import json, sys, tempfile, shutil, time, os
sys.path.insert(0, {repo!r})
import bench
from pyspark.sql import functions as F
from walker_spark.config import DispatcherConfig, FrontierConfig, WalkerConfig
from walker_spark.operators import seed as seed_ops, urlseen
from walker_spark.operators.fetch import link_accept_condition
from walker_spark.operators.urlseen import (
    _bloom_broadcast, _probe_broadcast, _with_hashes)
from walker_spark.plans.schemas import LINK_KEY
from walker_spark.sources.store import FrontierStore

cpus = {cpus}
spark = bench.build_spark(cpus)
spark.sparkContext.setLogLevel("ERROR")
workdir = tempfile.mkdtemp(prefix="walker-profout-")
cfg = WalkerConfig(frontier=FrontierConfig(num_domain_buckets=2 * cpus,
                                           claim_limit=100000,
                                           iteration_time_budget=500.0),
                   dispatcher=DispatcherConfig(max_links_per_segment=1000))
store = FrontierStore(spark, workdir, cfg.frontier.num_domain_buckets)
seeds = spark.read.parquet({pages!r}).select("url").filter(
    ~F.col("url").endswith("robots.txt"))
t0 = time.time()
seed_ops.ingest_urls(store, seeds, cfg, use_bloom=True)
urlseen.build_bloom(store, cfg.frontier.bloom_fpp)
seed_s = time.time() - t0

results = spark.read.parquet({results!r}).localCheckpoint()
n_results = results.count()
timings = {{}}

def mark(name, fn):
    t0 = time.time()
    out = fn()
    timings[name] = round(time.time() - t0, 2)
    return out

def outlink_pipe():
    follow = results
    if cfg.fetcher.honor_meta_nofollow:
        follow = follow.filter(~F.col("meta_nofollow"))
    return (follow.select(F.explode_outer("links").alias("url"))
            .filter(F.col("url").isNotNull())
            .dropDuplicates(["url"]))

def keys_pipe():
    keys = seed_ops.normalize_to_keys(outlink_pipe(), cfg)
    return keys.filter(link_accept_condition(cfg))

n_raw = mark("raw_count", lambda: results.agg(
    F.sum(F.coalesce(F.size("links"), F.lit(0))).alias("n")
).collect()[0]["n"])
n_outlinks = mark("explode_dedup", lambda: outlink_pipe().count())
n_keys = mark("normalize", lambda: keys_pipe().count())
n_kd = mark("key_dedup",
            lambda: keys_pipe().dropDuplicates(LINK_KEY).count())
meta = store.get_meta("url_seen_bloom")
def probe_count():
    hashed = _with_hashes(keys_pipe().dropDuplicates(LINK_KEY),
                          store.num_buckets)
    bc = _bloom_broadcast(store, int(meta["links_version"]))
    probed = _probe_broadcast(hashed, bc)
    return probed.filter(~F.col("_maybe")).count()
n_new_bloom = mark("probe", probe_count)

for tag, bounded in (("bounded", True), ("smj", False)):
    for run in ("cold", "warm"):
        def full():
            unseen = urlseen.filter_unseen(
                store, keys_pipe(), use_bloom=True,
                bounded_candidates=bounded)
            return unseen.localCheckpoint()
        unseen = mark(f"full_{{tag}}_{{run}}".format(tag=tag, run=run), full)
n_unseen = unseen.count()

out = {{"cpus": cpus, "seed_sec": round(seed_s, 1),
       "n_results": n_results, "n_raw_links": int(n_raw),
       "n_outlinks": n_outlinks, "n_keys": n_keys, "n_key_dedup": n_kd,
       "n_new_bloom": n_new_bloom, "n_unseen": n_unseen,
       "timings": timings}}
print("RESULT " + json.dumps(out))
shutil.rmtree(workdir, ignore_errors=True)
"""


def run_py(code: str) -> dict:
    proc = subprocess.run([sys.executable, "-c", code], capture_output=True,
                          text=True, timeout=3600, cwd=REPO)
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    print(proc.stdout[-3000:], file=sys.stderr)
    print(proc.stderr[-3000:], file=sys.stderr)
    raise RuntimeError("no RESULT")


def main():
    levels = [int(a) for a in sys.argv[1:]] or [1, 4]
    os.makedirs(PROF, exist_ok=True)
    if not os.path.isdir(RESULTS):
        print("== prep: capturing slim parse output ==", file=sys.stderr)
        run_py(PREP.format(repo=REPO, pages=PAGES, results=RESULTS))
    results = {}
    for cpus in levels:
        print(f"== outlinks local[{cpus}] ==", file=sys.stderr)
        results[cpus] = run_py(
            STEP.format(repo=REPO, cpus=cpus, pages=PAGES, results=RESULTS))
        print(json.dumps(results[cpus], indent=2))
    if len(levels) == 2:
        lo, hi = levels
        a, b = results[lo]["timings"], results[hi]["timings"]
        print(f"\n{'sub-stage':<18}{'L'+str(lo):>9}{'L'+str(hi):>9}{'ratio':>8}")
        for k in a:
            r = a[k] / b[k] if b[k] else float("inf")
            print(f"{k:<18}{a[k]:>9.2f}{b[k]:>9.2f}{r:>8.2f}")


if __name__ == "__main__":
    main()
