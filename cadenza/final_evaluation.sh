#!/usr/bin/env bash
# Shard the cadenza evaluation across N processes and merge the CSVs
# (replaces the reference's final_evaluation.sh batch pattern).
set -euo pipefail

N=${N:-4}
CONFIG=${CONFIG:-}
EXP=${EXP:-/exp}

for ((i = 0; i < N; i++)); do
  python -m cadenza.evaluate --config "$CONFIG" \
    2>&1 | sed "s/^/[shard $i] /" &
done
wait

python -m cadenza.merge_batches_results --exp-folder "$EXP"
