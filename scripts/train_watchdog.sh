#!/bin/bash
# Watchdog for training runs on the tunneled-TPU rig: the axon tunnel
# occasionally dies mid-RPC and the training process blocks forever inside
# a device call (observed twice on 2026-08-19: 28 min and >80 min stalls).
# This watches the run's metrics.jsonl heartbeat; on a stale heartbeat it
# kills the exact training PID, waits until a probe computation succeeds on
# the chip again, and relaunches the run with --con_train (resume from the
# latest checkpoint). Exits when the final epoch lands in metrics.jsonl.
#
# Usage:
#   scripts/train_watchdog.sh <pid> <exp_dir> <final_epoch> <stale_secs> \
#       -- <resume command...>
# The resume command must include --con_train --log_time_trained <ts> and
# repeat every flag of the original invocation (e.g. --data_augment — see
# ROUND2.md "Provenance note" for what forgetting it does).
set -u
PID="$1"; EXP="$2"; FINAL_EPOCH="$3"; STALE="$4"
shift 4
[ "$1" = "--" ] && shift
RESUME=("$@")
# A resume command that lost its flags (shell quoting, subshell var scope)
# relaunches the DEFAULT config against the wrong data root and the loop
# kills healthy trainers forever. Require BOTH essentials: without
# '--mode train' the post-relaunch pgrep (below) never matches and the loop
# spawns duplicate trainers; without '--con_train' the relaunch starts a
# fresh run from scratch instead of resuming.
case " ${RESUME[*]} " in
  *" --mode train "*) : ;;
  *) echo "watchdog: resume command lacks --mode train: ${RESUME[*]}" >&2
     exit 2 ;;
esac
case " ${RESUME[*]} " in
  *" --con_train "*) : ;;
  *) echo "watchdog: resume command lacks --con_train: ${RESUME[*]}" >&2
     exit 2 ;;
esac
METRICS="$EXP/metrics.jsonl"
cd /root/repo

log() { echo "[watchdog $(date -u +%H:%M:%S)] $*"; }

done_yet() {
  [ -f "$METRICS" ] || return 1
  grep -q "\"kind\": \"epoch_done\", \"step\": $FINAL_EPOCH," "$METRICS"
}

probe_tpu() {
  timeout 90 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
assert jax.devices()[0].platform != "cpu"
assert float(jnp.ones((8, 8)).sum()) == 64.0
EOF
}

while true; do
  if done_yet; then
    log "final epoch $FINAL_EPOCH reached; watchdog exiting"
    exit 0
  fi
  if ! kill -0 "$PID" 2>/dev/null; then
    log "pid $PID exited before epoch $FINAL_EPOCH; relaunching"
  else
    # Heartbeat = newest of metrics.jsonl mtime and the trainer's own start
    # time. On a RESUMED run metrics.jsonl already exists with an old mtime
    # (git checkout resets it), so the file alone reads "stale" the moment a
    # fresh trainer starts — take max() with /proc/$PID so a process younger
    # than STALE is never killed mid-cold-compile (this killed a resumed run
    # once: 2026-08-20, watchdog log "stale 4432s" 20 s after launch).
    hb_m=$(stat -c %Y "$METRICS" 2>/dev/null || echo 0)
    hb_p=$(stat -c %Y "/proc/$PID" 2>/dev/null || echo 0)
    hb=$(( hb_m > hb_p ? hb_m : hb_p ))
    if [ "$hb" -eq 0 ]; then
      # Both heartbeat sources unreadable (metrics file missing AND
      # /proc/$PID gone despite kill -0 — e.g. the PID exited in the race
      # window). Resetting to "now" masks a vanished heartbeat source, so
      # make the fallback visible in the log.
      log "no readable heartbeat source (metrics missing, /proc/$PID unreadable); treating as fresh"
      hb=$(date +%s)
    fi
    age=$(( $(date +%s) - hb ))
    if [ "$age" -lt "$STALE" ]; then
      sleep 60
      continue
    fi
    log "heartbeat stale ${age}s (> $STALE); killing pid $PID"
    # Guard against PID reuse: only kill if it is still our trainer.
    if tr '\0' ' ' < "/proc/$PID/cmdline" 2>/dev/null \
        | grep -q "cli.main.*--mode train"; then
      kill "$PID" 2>/dev/null
      sleep 10
      kill -9 "$PID" 2>/dev/null
    else
      log "pid $PID is no longer the trainer; skipping kill"
    fi
  fi
  log "waiting for the TPU tunnel to answer a probe"
  until probe_tpu; do
    log "tunnel still down; retrying in 120 s"
    sleep 120
  done
  log "tunnel healthy; resuming: ${RESUME[*]}"
  setsid nohup "${RESUME[@]}" >> /tmp/watchdog_train.log 2>&1 &
  LAUNCH=$!
  sleep 5
  # Resolve the trainer pid from the process we just launched, NOT a global
  # pgrep: in round 5 `pgrep -n -f` twice latched onto a transient pid,
  # declared the healthy trainer dead 2 min later and relaunched, producing
  # CONCURRENT trainers writing the same experiment dir. setsid either execs
  # the command in place (pid preserved) or, if it had to fork, the trainer
  # is its direct child — both cases resolve from $LAUNCH.
  if tr '\0' ' ' < "/proc/$LAUNCH/cmdline" 2>/dev/null \
      | grep -q -- "--mode train"; then
    PID=$LAUNCH
  else
    PID=$(pgrep -P "$LAUNCH" | head -1)
    [ -n "$PID" ] || PID=0
  fi
  log "resumed as pid $PID"
  sleep 120
done
