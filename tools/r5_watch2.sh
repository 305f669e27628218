#!/bin/bash
# Round-5 relay watcher v2: like r5_watch.sh, but a queue is marked done
# ONLY when it exits 0. A nonzero exit (the scripts exit 1 only on their
# health-check abort) counts an attempt and retries after a backoff, up
# to 8 attempts — the relay wedged for ~40 min at 11:00 UTC and the v1
# watcher marked two aborted queues as done.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
mkdir -p /tmp/r5_markers

while true; do
  next=""
  for q in tools/r5_tpu_queue*.sh; do
    [ -e "$q" ] || continue
    m="/tmp/r5_markers/$(basename "$q").done"
    if [ ! -e "$m" ]; then next="$q"; break; fi
  done
  if [ -z "$next" ]; then sleep 120; continue; fi
  if timeout 150 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
print(float((jnp.ones((128,128)) @ jnp.ones((128,128))).mean()))
" >/dev/null 2>&1; then
    echo "$(date) relay healthy -> running $next" >> /root/repo/docs/r5_queue_results.log
    if bash "$next"; then
      touch "/tmp/r5_markers/$(basename "$next").done"
    else
      a="/tmp/r5_markers/$(basename "$next").attempts"
      n=$(($(cat "$a" 2>/dev/null || echo 0) + 1)); echo "$n" > "$a"
      echo "$(date) $next exited nonzero (attempt $n)" >> /tmp/r5_watch.log
      if [ "$n" -ge 8 ]; then
        echo "$(date) $next giving up after $n attempts" >> /tmp/r5_watch.log
        touch "/tmp/r5_markers/$(basename "$next").done"
      fi
      sleep 300
    fi
  else
    echo "$(date) relay still down (next queue: $next)" >> /tmp/r5_watch.log
    sleep 240
  fi
done
