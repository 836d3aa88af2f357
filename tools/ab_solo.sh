#!/bin/bash
# Solo A/B probe: run a bench subset with an optional conf override.
# Usage: tools/ab_solo.sh <queries-csv> <label> [conf-string] [cpus]
# Writes stderr log to /tmp/ab_<label>.err, prints the JSON line.
set -u
Q="$1"; LABEL="$2"; CONF="${3:-}"; CPUS="${4:-32}"
SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1} \
SPARK_GRAFT_CPUS="$CPUS" \
SPARK_GRAFT_BENCH_ONLY="$Q" \
SPARK_GRAFT_SPARK_CONF="$CONF" \
python bench.py 2>"/tmp/ab_${LABEL}.err"
