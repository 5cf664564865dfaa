#!/bin/bash
# Sequential TPU run queue: reads commands (one per line) from /tmp/tpu_queue.txt
# and executes them one at a time (ONE TPU process at a time — CLAUDE.md).
# Append lines while it runs; it sleeps when the queue is drained.
# Lines starting with '#' are skipped; a line reading STOP exits the runner.
QUEUE=/tmp/tpu_queue.txt
LOG=/tmp/tpu_queue.log
STATUS=/tmp/tpu_queue_status.txt
cd /root/repo || exit 1
touch "$QUEUE"
N=0
while true; do
  TOTAL=$(wc -l < "$QUEUE")
  if [ "$N" -ge "$TOTAL" ]; then sleep 15; continue; fi
  N=$((N+1))
  CMD=$(sed -n "${N}p" "$QUEUE")
  if [ -z "$CMD" ] || [ "${CMD:0:1}" = "#" ]; then continue; fi
  if [ "$CMD" = "STOP" ]; then echo "$N STOP" >> "$STATUS"; break; fi
  echo "=== [$(date +%H:%M:%S)] start $N: $CMD" >> "$LOG"
  timeout 9000 bash -c "$CMD" >> "$LOG" 2>&1
  RC=$?
  echo "=== [$(date +%H:%M:%S)] rc=$RC end $N" >> "$LOG"
  echo "$(date +%H:%M:%S) line=$N rc=$RC $CMD" >> "$STATUS"
done
echo "QUEUE EXITED at line $N" >> "$LOG"
