#!/usr/bin/env python
"""Diagnose where the fetch kernel loses scaling between local[2] and
local[8]: run instrumented kernel variants at both levels on the shared
corpus and report per-stage walls.

Variants:
  v0  current bench.run_fetch_kernel (one chained action)
  v1  work side localCheckpoint'ed before broadcast (no double window)
  v2  v1 + emit_text=False in the parse stage (skip Arrow text column)

Sub-stage walls (separate actions, measured once per level):
  politeness  window + filter + count on the frontier
  join_parse  fetch join + parse mapInPandas count (no outlink path)
  outlinks    explode + normalize + dedup + anti-join count

Usage: python scripts/diag_kernel.py <pages> <frontier> [levels...]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

INNER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
import bench
from pyspark.sql import Window, functions as F
from walker_spark.config import WalkerConfig
from walker_spark.operators import seed as seed_ops
from walker_spark.operators.fetch import _make_parse_fn, mime_from_path, _PARSE_OUT
from walker_spark.functions.udfs import host_col

cpus = {cpus}
variant = {variant!r}
spark = bench.build_spark(cpus)
spark.sparkContext.setLogLevel("ERROR")
cfg = WalkerConfig()
pages_path = {pages!r}
frontier_path = {frontier!r}
pages = spark.read.parquet(pages_path)
frontier = spark.read.parquet(frontier_path)

out = {{}}
budget_ms = int(cfg.frontier.iteration_time_budget * 1000)
delay_ms = int(cfg.fetcher.default_crawl_delay * 1000)
w = Window.partitionBy("dom").orderBy("subdom", "path", "proto")
work = (
    frontier.withColumn("host", host_col(F.col("subdom"), F.col("dom")))
    .withColumn("_rn", F.row_number().over(w))
    .filter((F.col("_rn") - 1) * delay_ms < budget_ms)
    .withColumn("url", F.concat(F.col("proto"), F.lit("://"), F.col("host"), F.col("path")))
    .withColumn("time", F.timestamp_millis(F.lit(0)))
)
t0 = time.time()
if variant in ("v1", "v2", "p"):
    work = work.localCheckpoint()
    out["work_ckpt_sec"] = round(time.time() - t0, 2)
else:
    out["politeness_rows"] = work.count()
    out["politeness_sec"] = round(time.time() - t0, 2)

page_side = pages.select("url", "warc_ts", "html")
work_b = F.broadcast(work)
found = page_side.join(work_b, "url", "inner").withColumn("found", F.lit(True))
missing = (
    work.join(page_side.select("url"), "url", "left_anti")
    .withColumn("warc_ts", F.lit(None).cast("timestamp"))
    .withColumn("html", F.lit(None).cast("binary"))
    .withColumn("found", F.lit(False))
)
fetched = (
    found.unionByName(missing.select(*found.columns))
    .withColumn("mime", mime_from_path(F.col("path")))
    .withColumn("not_modified", F.lit(False))
)
emit_text = variant != "v2"
acc = spark.sparkContext.accumulator(0)
base_fn = _make_parse_fn(cfg, 1_700_000_000_000, emit_text=emit_text)

def counting_parse(it):
    for pdf in base_fn(it):
        acc.add(len(pdf))
        yield pdf

results = fetched.select(
    "dom", "subdom", "path", "proto", "url", "html", "mime", "found", "not_modified"
).mapInPandas(counting_parse, _PARSE_OUT)

if variant == "p":
    t0 = time.time()
    results.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    n_fetched = int(acc.value)
    out.update({{"kernel_sec": round(dt, 2), "fetched": n_fetched,
                "outlinks_unseen": 0,
                "urls_per_sec": round(n_fetched / dt, 1)}})
    print("RESULT " + json.dumps(out))
    sys.exit(0)

outlinks = (
    results.select(F.explode_outer("links").alias("u"))
    .filter(F.col("u").isNotNull())
    .dropDuplicates(["u"])
)
keys = seed_ops.normalize_to_keys(outlinks, cfg, url_col="u")
unseen = keys.join(
    frontier.select("dom", "subdom", "path", "proto"),
    ["dom", "subdom", "path", "proto"],
    "left_anti",
)
t0 = time.time()
n_unseen = unseen.count()
dt = time.time() - t0
n_fetched = int(acc.value)
out.update({{"kernel_sec": round(dt, 2), "fetched": n_fetched,
            "outlinks_unseen": n_unseen,
            "urls_per_sec": round((n_fetched + n_unseen) / dt, 1)}})
print("RESULT " + json.dumps(out))
"""


def run_py(code):
    proc = subprocess.run([sys.executable, "-c", code], capture_output=True,
                          text=True, timeout=3600, cwd=REPO)
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    print(proc.stdout[-3000:], file=sys.stderr)
    print(proc.stderr[-3000:], file=sys.stderr)
    raise RuntimeError("no RESULT")


def main():
    pages, frontier = sys.argv[1], sys.argv[2]
    levels = [int(x) for x in sys.argv[3:]] or [2, 8]
    variants = os.environ.get("DIAG_VARIANTS", "v0,v1,v2").split(",")
    results = {}
    for v in variants:
        for cpus in levels:
            key = f"{v}@{cpus}"
            print(f"== {key} ==", file=sys.stderr)
            res = run_py(INNER.format(repo=REPO, cpus=cpus, variant=v,
                                      pages=pages, frontier=frontier))
            print(json.dumps(res), file=sys.stderr)
            results[key] = res
    for v in variants:
        lo, hi = levels[0], levels[-1]
        a, b = results[f"{v}@{lo}"], results[f"{v}@{hi}"]
        eff = b["urls_per_sec"] / ((hi / lo) * a["urls_per_sec"])
        print(f"{v}: local[{lo}] {a['kernel_sec']}s local[{hi}] {b['kernel_sec']}s "
              f"eff={eff:.3f}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
