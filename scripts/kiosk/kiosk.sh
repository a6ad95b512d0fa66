#!/bin/sh
# Auto-restarting kiosk runner: scripts/kiosk/kiosk.sh <rnnca|recur> [args]
# (the reference's startup/*-startup.sh loop, minus the X11 mousemove)
PLAYER=$1; shift
ROOT=$(dirname "$0")/../..
cd "$ROOT" || exit 1
mkdir -p nets
renice -n 10 $$ >/dev/null 2>&1
while true; do
    PYTHONPATH="$ROOT:${PYTHONPATH}" \
        python -m "recur_tpu.cli.${PLAYER}_player" "$@"
    echo "kiosk: ${PLAYER} exited ($?); relaunching in 10s" >&2
    sleep 10
done
