#!/bin/bash
# Launch bench_scaling.py only when the host is in a quiet window
# (raw-CPU 1->4 calibration >= threshold), or unconditionally at the
# hard deadline. Single-machine scaling numbers during a throttled
# period measure the hypervisor, not the engine (observed 4.42x in a
# quiet morning vs 2.80x under afternoon neighbors).
THRESH=${1:-3.8}
DEADLINE=${2:-"15:30"}
LOG=${3:-/tmp/scaling_gated.log}
EXTRA_ARGS=${4:-}   # e.g. "--resume /tmp/prior_suite.log"
cd /root/repo
while true; do
  CAL=$(python - <<'EOF'
import time, hashlib, multiprocessing as mp
def w(n):
    h=b"x"
    for _ in range(n): h=hashlib.md5(h).digest()
    return h[0]
def bench(np_):
    t0=time.time()
    with mp.Pool(np_) as p: p.map(w,[200_000]*64)
    return time.time()-t0
print(round(bench(1)/bench(4),3))
EOF
)
  NOW=$(date +%H:%M)
  echo "$(date +%H:%M:%S) calibration=$CAL (threshold $THRESH, deadline $DEADLINE)" | tee -a "$LOG.gate"
  if [[ -e /tmp/SPARK_BUSY ]]; then
    # another dev Spark job is running -- never start a rep under it
    echo "  /tmp/SPARK_BUSY present, holding" | tee -a "$LOG.gate"
  elif python -c "import sys; sys.exit(0 if float('$CAL') >= float('$THRESH') else 1)"; then
    echo "quiet window detected -> launching suite" | tee -a "$LOG.gate"; break
  elif [[ "$NOW" > "$DEADLINE" ]]; then
    echo "deadline reached -> launching suite regardless" | tee -a "$LOG.gate"; break
  fi
  sleep 240
done
python scripts/bench_scaling.py $EXTRA_ARGS > "$LOG" 2>&1
echo "SCALING_DONE_$?"
