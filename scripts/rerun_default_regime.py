#!/usr/bin/env python
"""Re-measure ONLY the 500s default-budget engine regime (best-of-N,
alternating levels) and fold the result into BENCH/scaling_results.json
+ BENCH/BASELINE.md. For when the main suite's default legs landed in a
throttled host patch: the full-window record stands, this regime gets a
cleaner sample.

Usage: python scripts/rerun_default_regime.py [reps]
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import bench_scaling as BS  # noqa: E402

REPO = BS.REPO


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    pages_path = os.path.join(REPO, "fixtures", "bench-corpus", "pages")
    assert os.path.isdir(pages_path), "shared corpus missing"
    lo, hi = 1, 4
    calib = BS.cpu_calibration(lo, hi)
    print(f"raw-CPU calibration {lo}->{hi}: {calib:.2f}x (ideal 4)", file=sys.stderr)
    engine_default: dict[int, dict] = {}
    for rep in range(reps):
        for cpus in (lo, hi):
            print(f"== engine-default local[{cpus}] rep {rep} ==", file=sys.stderr)
            res = BS.run_py(BS.ENGINE.format(repo=REPO, cpus=cpus,
                                             pages_path=pages_path, budget=500.0))
            print(json.dumps(res), file=sys.stderr)
            if cpus not in engine_default or res["crawl_sec"] < engine_default[cpus]["crawl_sec"]:
                engine_default[cpus] = res
    d_eff = engine_default[hi]["urls_per_sec"] / (4 * engine_default[lo]["urls_per_sec"])

    res_path = os.path.join(REPO, "BENCH", "scaling_results.json")
    with open(res_path) as f:
        data = json.load(f)
    prev = data.get("engine_default_efficiency")
    data["engine_default_budget"] = {str(k): v for k, v in engine_default.items()}
    data["engine_default_efficiency"] = round(d_eff, 3)
    data["engine_default_rerun"] = {
        "cpu_calibration": round(calib, 3), "reps": reps,
        "note": f"default-budget legs re-measured standalone (prior suite value {prev})",
    }
    with open(res_path, "w") as f:
        json.dump(data, f, indent=2)

    # patch the default-regime table + efficiency line in BENCH/BASELINE.md
    md_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(md_path) as f:
        md = f.read()
    tbl = (
        f"| A | local[{lo}] | {engine_default[lo]['crawl_sec']} | "
        f"{engine_default[lo]['urls']} | {engine_default[lo]['urls_per_sec']} |\n"
        f"| B | local[{hi}] | {engine_default[hi]['crawl_sec']} | "
        f"{engine_default[hi]['urls']} | {engine_default[hi]['urls_per_sec']} |"
    )
    md = re.sub(
        r"(CONFIG-DEFAULT window.*?\|---\|---\|---\|---\|---\|\n)\| A \|[^\n]*\n\| B \|[^\n]*",
        lambda m: m.group(1) + tbl,
        md, count=1, flags=re.S,
    )
    md = re.sub(
        r"Default-volume efficiency \d+\.\d+\.",
        f"Default-volume efficiency {d_eff:.2f} (re-measured standalone, "
        f"best-of-{reps}, calibration {calib:.2f}x).",
        md, count=1,
    )
    with open(md_path, "w") as f:
        f.write(md)
    print(json.dumps({"engine_default_eff": round(d_eff, 3),
                      "calibration": round(calib, 3)}))


if __name__ == "__main__":
    main()
