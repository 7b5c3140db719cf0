#!/bin/bash
# Retry a tiny TPU probe until the tunnel grants a claim again (r4 outage:
# claims stopped granting ~10:36 while the relay stayed up). Each probe
# exits cleanly (prompt lease release). Then run the given command.
set -u
for i in $(seq 1 60); do
  echo "[gate] probe attempt $i at $(date +%H:%M:%S)"
  if timeout 420 python -c "import jax; d=jax.devices(); print('[gate] TPU OK:', d)"; then
    echo "[gate] tunnel healthy — proceeding at $(date +%H:%M:%S)"
    sleep 75
    exec "$@"
  fi
  sleep 180
done
echo "[gate] gave up after 60 probes"
exit 1
