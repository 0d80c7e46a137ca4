#!/bin/bash
# Babysitter for TPU-tunnel jobs that can wedge at startup or stall mid-run.
#
# The axon remote-TPU tunnel has two observed failure modes (round 2):
#  1. Fresh-process launch wedge (~1 in 2 launches that immediately submit a
#     large compile): the client blocks forever on its first RPC (~zero CPU,
#     one thread in ep_poll). Same workload runs fine on relaunch.
#  2. Mid-run stall: a long-running dispatch loop stops making progress
#     after minutes of healthy stepping (log mtime freezes, ~zero CPU).
# Remedy for both: kill the process and relaunch. Commands should be
# idempotent-resumable (e.g. train_netvlad_tool.py --continue-out with its
# periodic --save-every checkpoints).
#
#   tools/run_with_retry.sh LOGFILE PROGRESS_REGEX PROBATION_S STALL_S CMD...
#
# Launch CMD; kill+relaunch if no line matching PROGRESS_REGEX appears in
# LOGFILE within PROBATION_S, or (once running) if LOGFILE stops being
# written for STALL_S. Up to 8 attempts; status appended to LOGFILE.status.
# Keep the host CPUs quiet during probation — heavy concurrent work (e.g. a
# pytest run on this 2-core box) slows startup into a false wedge kill.
LOG=$1; shift
PAT=$1; shift
PROBATION=$1; shift
STALL=$1; shift
CHECKS=$(( (PROBATION + 29) / 30 ))
# the stall watchdog keys on LOG mtime — python block-buffers stdout when
# redirected, which would freeze the mtime on a healthy job
export PYTHONUNBUFFERED=1
FASTFAILS=0
for attempt in $(seq 1 8); do
  # preserve the previous attempt's output (crash diagnostics), numbered so
  # earlier attempts' logs survive later retries
  [ -f "$LOG" ] && mv -f "$LOG" "$LOG.a$((attempt - 1))"
  T_START=$(date +%s)
  "$@" > "$LOG" 2>&1 &
  PID=$!
  ok=0
  for i in $(seq 1 "$CHECKS"); do
    sleep 30
    if grep -Eq "$PAT" "$LOG" 2>/dev/null; then ok=1; break; fi
    if ! kill -0 "$PID" 2>/dev/null; then break; fi   # exited early
  done
  if [ $ok -eq 1 ]; then
    echo "attempt $attempt: running (pid $PID)" >> "$LOG.status"
    # stall watchdog: relaunch if the log freezes for STALL_S
    stalled=0
    while kill -0 "$PID" 2>/dev/null; do
      sleep 30
      now=$(date +%s)
      mtime=$(stat -c %Y "$LOG" 2>/dev/null || echo "$now")
      if [ $(( now - mtime )) -ge "$STALL" ]; then stalled=1; break; fi
    done
    if [ $stalled -eq 0 ]; then
      wait "$PID"
      rc=$?
      echo "attempt $attempt: exited rc=$rc" >> "$LOG.status"
      if [ "$rc" -ne 0 ]; then
        # Deterministic-failure guard: a nonzero exit shortly after passing
        # probation (bad CLI arg discovered late, OOM, assertion) will fail
        # identically every attempt — stop after two consecutive fast
        # failures instead of burning all 8 attempts.
        ELAPSED=$(( $(date +%s) - T_START ))
        if [ "$ELAPSED" -lt $(( PROBATION + 60 )) ]; then
          FASTFAILS=$(( FASTFAILS + 1 ))
          if [ "$FASTFAILS" -ge 2 ]; then
            echo "two consecutive fast nonzero exits; not retrying" \
              >> "$LOG.status"
            exit "$rc"
          fi
        else
          FASTFAILS=0
        fi
        # crash after healthy progress: retry (commands are resumable)
        continue
      fi
      exit 0
    fi
    echo "attempt $attempt: stalled ${STALL}s mid-run, killing $PID" \
      >> "$LOG.status"
    kill "$PID" 2>/dev/null; sleep 3; kill -9 "$PID" 2>/dev/null
    continue
  fi
  if kill -0 "$PID" 2>/dev/null; then
    echo "attempt $attempt: no progress in ${PROBATION}s, killing $PID" \
      >> "$LOG.status"
    kill "$PID" 2>/dev/null; sleep 3; kill -9 "$PID" 2>/dev/null
  else
    echo "attempt $attempt: died before progress" >> "$LOG.status"
  fi
done
echo "all attempts failed" >> "$LOG.status"
exit 1
