#!/bin/bash
# Probe the tunneled TPU every 10 min; when `jax.devices()` answers, run
# the queued measurements (tpu_pending.sh) once and exit. Safe to leave
# running all day: each probe is bounded, and the pending steps are each
# wrapped in their own `timeout`. PID file: /tmp/tpu_watch.pid.
cd "$(dirname "$0")/.."
echo $$ > /tmp/tpu_watch.pid
for i in $(seq 1 72); do
  if timeout 90 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" 2>/dev/null; then
    echo "TUNNEL UP at $(date) (probe $i) — running tpu_pending.sh"
    bash benchmarks/tpu_pending.sh > /tmp/tpu_pending_run.log 2>&1
    echo "tpu_pending.sh finished at $(date), exit=$?"
    exit 0
  fi
  echo "probe $i failed at $(date)"
  sleep 600
done
echo "GAVE UP at $(date)"
