#!/bin/bash
# Block until the axon TPU claim succeeds, then exit 0 (or exit 1 after
# ~MAX_MIN minutes). Used as a queue line ahead of TPU jobs so the queue
# self-resumes when a wedged/unavailable claim comes back, instead of each
# job burning a ~25-minute blocking claim attempt and failing.
# Probe runs in a subprocess because a failed backend init is cached
# process-wide by JAX.
MAX_MIN=${1:-110}
DEADLINE=$(( $(date +%s) + MAX_MIN * 60 ))
ATTEMPT=0
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  ATTEMPT=$((ATTEMPT + 1))
  if timeout 240 python -c "import jax; print(jax.devices())" >/dev/null 2>&1; then
    echo "TPU claim ok (attempt $ATTEMPT)"
    exit 0
  fi
  echo "TPU claim unavailable (attempt $ATTEMPT); sleeping 240s"
  sleep 240
done
echo "TPU claim still unavailable after ${MAX_MIN}min"
exit 1
