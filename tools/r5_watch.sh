#!/bin/bash
# Round-5 relay watcher: poll TPU health; when the relay answers, fire the
# next unrun queue file (tools/r5_tpu_queue*.sh, in lexical order). Marker
# files in /tmp/r5_markers/ keep each queue to one run. Designed to stay
# alive the whole session so queues added later still fire unattended.
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
    bash "$next"
    touch "/tmp/r5_markers/$(basename "$next").done"
  else
    echo "$(date) relay still down (next queue: $next)" >> /tmp/r5_watch.log
    sleep 240
  fi
done
