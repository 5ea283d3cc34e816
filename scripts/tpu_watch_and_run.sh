#!/bin/bash
# Waits for the axon TPU tunnel to come back, then runs the round-3 session.
cd "$(dirname "$0")/.."
while true; do
  timeout 120 python -c "import jax; d=jax.devices(); assert d; print('TPU-UP', d)" \
    > /tmp/tpu_up.log 2>&1
  if grep -q TPU-UP /tmp/tpu_up.log; then
    echo "$(date) TPU reachable — launching session" >> /tmp/tpu_watch2.log
    bash scripts/tpu_session_r3.sh > /tmp/tpu_session.log 2>&1
    echo "$(date) session finished" >> /tmp/tpu_watch2.log
    break
  fi
  echo "$(date) tpu still down" >> /tmp/tpu_watch2.log
  sleep 120
done
