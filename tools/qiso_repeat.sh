#!/bin/bash
# Repeat tools/qiso.py N times (fresh process each), print every line.
# Usage: tools/qiso_repeat.sh N query [query...]
N="$1"; shift
for i in $(seq 1 "$N"); do
  python "$(dirname "$0")/qiso.py" "$@" 2>/dev/null
done
