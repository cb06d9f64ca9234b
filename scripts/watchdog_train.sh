#!/bin/bash
# Watchdog for a long TPU training run behind the axon tunnel.
#
# The tunnel occasionally wedges a long-running trainer: the conn-read
# thread blocks in tcp_recvmsg forever while the process sits at zero
# CPU (observed twice on >10k-step runs). Checkpoint-resume restores
# loss continuity, so the remedy is kill-by-pidfile + restart.
#
# Usage: watchdog_train.sh <pidfile> <logfile> <stale_seconds> -- <cmd...>
# Exits when the pidfile is removed (intentional stop) or when the log
# shows the trainer completed its step budget (clean exit).
set -u
if [ "$#" -lt 5 ]; then
    echo "usage: $0 <pidfile> <logfile> <stale_seconds> -- <cmd...>" >&2
    exit 2
fi
PIDFILE="$1"; LOGFILE="$2"; STALE="$3"; shift 3
[ "$1" = "--" ] && shift

while true; do
    sleep 60
    [ -f "$PIDFILE" ] || exit 0          # intentional stop
    PID=$(cat "$PIDFILE")
    NOW=$(date +%s)
    MTIME=$(stat -c %Y "$LOGFILE" 2>/dev/null || echo "$NOW")
    AGE=$((NOW - MTIME))
    if tail -n 50 "$LOGFILE" 2>/dev/null | grep -q "training finished"; then
        exit 0                            # clean completion — never restart
    fi
    if ! kill -0 "$PID" 2>/dev/null; then
        echo "[watchdog $(date -u +%H:%M:%S)] pid $PID dead; restarting" >> "$LOGFILE"
    elif [ "$AGE" -lt "$STALE" ]; then
        continue
    else
        # stale log + alive process: confirm zero CPU before declaring a wedge
        U1=$(awk '{print $14+$15}' "/proc/$PID/stat" 2>/dev/null || echo 0)
        sleep 10
        U2=$(awk '{print $14+$15}' "/proc/$PID/stat" 2>/dev/null || echo 0)
        if [ "$U1" != "$U2" ]; then
            continue                      # still burning CPU (e.g. long compile)
        fi
        echo "[watchdog $(date -u +%H:%M:%S)] log stale ${AGE}s, pid $PID idle; restarting" >> "$LOGFILE"
        kill "$PID" 2>/dev/null; sleep 5; kill -9 "$PID" 2>/dev/null; sleep 5
    fi
    [ -f "$PIDFILE" ] || exit 0
    nohup "$@" >> "$LOGFILE" 2>&1 &
    echo $! > "$PIDFILE"
done
