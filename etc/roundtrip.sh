#!/bin/bash
# Roundtrip check for one algorithm and file (mirror of etc/roundtrip.sh):
#   ./roundtrip.sh '<algorithm>' <file>
set -e
ALGO="$1"; FILE="$2"
DIR=$(mktemp -d)
trap 'rm -rf "$DIR"' EXIT
PY=${PYTHON:-python}
$PY -m tudocomp_tpu -a "$ALGO" "$FILE" -o "$DIR/c.tdc" -f
$PY -m tudocomp_tpu -d "$DIR/c.tdc" -o "$DIR/d.out" -f
cmp "$FILE" "$DIR/d.out" && echo "roundtrip OK ($(stat -c%s "$DIR/c.tdc") bytes)"
