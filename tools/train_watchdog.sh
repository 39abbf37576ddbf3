#!/usr/bin/env bash
# Babysit a (possibly flaky-tunnel) training run to a target checkpoint.
#
# The axon TPU tunnel in this sandbox sporadically wedges mid-RPC: the
# training process blocks forever at ~0 CPU with no step progress. The
# framework side is already preemption-safe (SIGTERM -> checkpoint at the
# exact step -> clean exit; resume is step-exact), so the recovery story
# is simply: detect "no log progress for STALL_S seconds", SIGTERM (then
# SIGKILL) the run, and relaunch with --resume once the tunnel answers a
# bounded device probe again. This script automates that loop.
#
# Usage:
#   tools/train_watchdog.sh LOGFILE TARGET_STEP CKPT_DIR -- CMD ARGS...
# CMD is launched with nohup, output appended to LOGFILE. Done when a
# checkpoint directory step=N with N >= TARGET_STEP exists and the run
# process has exited.

set -u
LOGFILE=$1; TARGET=$2; CKPTDIR=$3; shift 3
[ "$1" = "--" ] && shift
STALL_S=${STALL_S:-900}
PROBE_TIMEOUT=${PROBE_TIMEOUT:-120}
REPO=$(cd "$(dirname "$0")/.." && pwd)

best_step() {
  ls "$CKPTDIR" 2>/dev/null | sed -n 's/^step=\([0-9]*\)$/\1/p' | sort -n | tail -1
}

probe() {
  # bounded device probe; a wedged tunnel hangs, so timeout = unhealthy
  timeout "$PROBE_TIMEOUT" python -c \
    "import jax; jax.block_until_ready(jax.numpy.zeros(8) + 1); print('ok')" \
    2>/dev/null | grep -q ok
}

while true; do
  s=$(best_step); s=${s:-0}
  if [ "$s" -ge "$TARGET" ]; then
    echo "watchdog: target step $TARGET reached (checkpoint step=$s); done"
    exit 0
  fi
  until probe; do
    echo "watchdog: tunnel unhealthy at $(date +%T); retrying in 60s"
    sleep 60
  done
  echo "watchdog: launching at $(date +%T) from step ${s}: $*"
  nohup "$@" >> "$LOGFILE" 2>&1 &
  PID=$!
  # monitor: kill on log stall, exit loop when process ends
  last_size=$(stat -c %s "$LOGFILE" 2>/dev/null || echo 0)
  last_change=$(date +%s)
  while kill -0 "$PID" 2>/dev/null; do
    sleep 30
    size=$(stat -c %s "$LOGFILE" 2>/dev/null || echo 0)
    now=$(date +%s)
    if [ "$size" != "$last_size" ]; then
      last_size=$size; last_change=$now
    elif [ $((now - last_change)) -ge "$STALL_S" ]; then
      echo "watchdog: no log progress for ${STALL_S}s; recycling run"
      kill -TERM "$PID" 2>/dev/null
      for i in $(seq 1 24); do
        kill -0 "$PID" 2>/dev/null || break
        sleep 5
      done
      kill -9 "$PID" 2>/dev/null
      break
    fi
  done
  wait "$PID" 2>/dev/null
  sleep 10
done
