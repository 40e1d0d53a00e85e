#!/bin/sh
# One-command training launcher — the `run.sh:1-29` equivalent: timestamped
# results dir, canonical flag set, tee'd log. Without DATA_DIR it generates a
# synthetic on-disk cohort (the real ADNI/A4 data cannot ship with the repo).
#
# Usage:
#   scripts/run.sh [DATA_DIR]
# Env overrides: MODEL_TYPE, BATCH_SIZE, EPOCHS, SAVE_ROOT, EXTRA_FLAGS,
# and SYN_SUBJECTS/SYN_SIZE for the synthetic cohort.
set -eu

basedir=$(cd "$(dirname "$0")/.." && pwd)
cd "$basedir"

model_type="${MODEL_TYPE:-ContraAttnUNET}"
batch_size="${BATCH_SIZE:-2}"
epochs="${EPOCHS:-61}"
save_root="${SAVE_ROOT:-$basedir/results}"
timestamp=$(date +"%Y-%m-%d_%H-%M-%S")
save_folder="$save_root/$timestamp"
mkdir -p "$save_folder"

export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$basedir/.jax_cache}"

data_dir="${1:-}"
if [ -z "$data_dir" ]; then
    data_dir="$save_folder/synthetic_cohort"
    echo "no DATA_DIR given - generating a synthetic cohort at $data_dir"
    python3 - "$data_dir" "${SYN_SUBJECTS:-8}" "${SYN_SIZE:-32}" << 'PYEOF'
import os
import sys

import pandas as pd

from coma_unet_tpu.data.synthetic import make_synthetic_cohort

root, n, size = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
cohort = make_synthetic_cohort(root, n_subjects=n, size=size)
splits = os.path.join(root, "splits")
os.makedirs(splits, exist_ok=True)
df = pd.read_csv(cohort["lookup"])
cut = max(len(df) // 2, 1)
for fold in range(1, 6):
    df.iloc[:cut].to_csv(
        os.path.join(splits, f"training_lookup_{fold}.csv"), index=False)
    df.iloc[cut:].to_csv(
        os.path.join(splits, f"test_lookup_{fold}.csv"), index=False)
print("synthetic cohort ready:", root)
PYEOF
fi

# canonical reference invocation (`run.sh:17-25`): covariates + RnC on,
# batch 2, ContraAttnUNET
python3 -m coma_unet_tpu.cli.main train \
    -save_path "$save_folder" \
    -model_type "$model_type" \
    -batch_size "$batch_size" \
    --epochs "$epochs" \
    --splits_dir "$data_dir/splits" \
    --covariate_csv "$data_dir/covars.csv" \
    --quartile_csv "$data_dir/quarts.csv" \
    --predictions_json "$data_dir/preds.json" \
    -description "Attention-augmented UNETR" \
    -covariates \
    -rnc \
    ${EXTRA_FLAGS:-} \
    2>&1 | tee "$save_folder/train_${model_type}.log"
