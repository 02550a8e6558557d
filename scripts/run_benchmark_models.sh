#!/usr/bin/env bash
# Analytic-vs-PCG benchmark driver (replaces reference
# scripts/bash_scripts train_models invocations).
set -euo pipefail
cd "$(dirname "$0")/.."
exec python - "$@" <<'PY'
import sys
from mlff_tpu.experiments.benchmark_models import speedup_table, to_latex
rows = speedup_table(sys.argv[1:] or ["ethanol", "uracil"], n_train=40)
print(to_latex(rows))
PY
