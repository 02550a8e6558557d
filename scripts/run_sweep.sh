#!/usr/bin/env bash
# Array-style sweep driver (replaces the reference's SGE qsub scripts,
# reference scripts/bash_scripts/*.sh): runs one (preconditioner, molecule)
# combination per index, or the full cross product without --index.
#
# Usage:
#   ./scripts/run_sweep.sh                 # full sweep
#   INDEX=3 ./scripts/run_sweep.sh        # one combination (array-job style)
set -euo pipefail
cd "$(dirname "$0")/.."
ARGS=(--datasets ethanol uracil toluene aspirin
      --preconditioners lev_random random_scores cholesky
      --n-datapoints-aspirin 40 --n-measurements 6)
if [[ -n "${INDEX:-}" ]]; then
  ARGS+=(--index "$INDEX")
fi
exec python -m mlff_tpu.experiments.sweep "${ARGS[@]}" "$@"
