#!/bin/bash
# Wait (up to 120 s) for 1-min loadavg < 2.0 — the bench's ambient
# discipline applied to ad-hoc measurement runs.
for i in $(seq 1 24); do
  L=$(cut -d' ' -f1 /proc/loadavg)
  if python3 -c "exit(0 if float('$L') < 2.0 else 1)"; then exit 0; fi
  sleep 5
done
echo "[quiesce] still loaded: $(cat /proc/loadavg)" >&2
