#!/bin/bash
# Canary polling loop — samples graft.BoxCanary every INTERVAL seconds and
# appends one JSON line per sample to the log, so a fast window (oneCore
# meaningfully below CANARY.json's 1.055 s reference) can be caught for the
# isolated full-suite bench leg VERDICT r11 item 1 asks for.
#
# Samples taken while our own heavy work (sbt test, graft.Bench) is running
# would read slow from self-contention, not window speed — those are skipped
# with an explicit marker line so the log stays interpretable.
#
# Usage: canary_poll_loop.sh LOGFILE [INTERVAL_SEC]
set -u
LOG="${1:?logfile}"
INTERVAL="${2:-240}"
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
while true; do
  if pgrep -f 'graft\.(Bench|Verify|RecallProbe|SaltProbe|PlanProbe|ScaleGen)|sbt-launch|xsbt' >/dev/null 2>&1; then
    echo "{\"epochMs\":$(date +%s%3N),\"skipped\":\"self-busy\",\"load1\":\"$(cut -d' ' -f1 /proc/loadavg)\"}" >> "$LOG"
  else
    LOAD=$(cut -d' ' -f1 /proc/loadavg)
    # strip any stray whitespace, then splice load1 in ONLY if the line
    # really is a '{...}' object — a CanaryPoll format change or partial
    # write must not append malformed JSON to the log
    LINE=$(java -cp "$CP" graft.CanaryPoll 2>/dev/null | tr -d '[:space:]')
    case "$LINE" in
      {*\}) echo "${LINE%\}},\"load1\":\"$LOAD\"}" >> "$LOG" ;;
      "") : ;;
      *) echo "{\"epochMs\":$(date +%s%3N),\"skipped\":\"malformed-canary-line\"}" >> "$LOG" ;;
    esac
  fi
  sleep "$INTERVAL"
done
