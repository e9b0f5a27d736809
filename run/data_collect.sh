#!/bin/bash
# Data-collection restart loop (counterpart of reference run/data_collect.sh):
# data_collect.py handles one test-suite env per invocation and exits 1 while
# suites remain, so keep relaunching until it returns 0.
#
# Usage: run/data_collect.sh <dataset_root> [port]

set -u

if [[ $# -lt 1 ]]; then
  echo 'Usage: run/data_collect.sh <dataset_root> [port]'
  exit 1
fi

DATASET_ROOT=$1
PORT=${2:-2000}

# fresh start: remove checkpoint files for this port
rm -f "port_${PORT}_checkpoint.txt" "port_${PORT}_ep_stat_buffer_"*.json

RED=$'\e[0;31m'
NC=$'\e[0m'
PYTHON_RETURN=1
until [ $PYTHON_RETURN == 0 ]; do
  python -u data_collect.py --dataset-root "$DATASET_ROOT" --port "$PORT"
  PYTHON_RETURN=$?
  echo "${RED} PYTHON_RETURN=${PYTHON_RETURN}!!! Start Over!!!${NC}" >&2
  sleep 2
done

echo "Collection finished."
