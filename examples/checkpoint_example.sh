#!/usr/bin/env bash
# Checkpoint/resume example mirroring the reference's
# example/checkpoint_example.sh: load the final checkpoint written by
# run_example.sh and resume optimization from it.
#
# vilma-tpu always saves a checkpoint of the final model when
# optimization is done; --checkpoint-freq N additionally saves
# intermediate checkpoints every N iterations. --load-checkpoint takes
# the checkpoint .npz and the covariance .pkl it was fit with.
#
# Usage: examples/checkpoint_example.sh [DATA_DIR] [OUT_DIR]
#   DATA_DIR: a directory shaped like the reference's example/ folder
#             (default: /root/reference/example)
#   OUT_DIR:  the run_example.sh output dir holding example_vilma_run.*
#             (default: ./example_out)
set -euo pipefail

DATA_DIR=${1:-/root/reference/example}
OUT_DIR=${2:-example_out}

if [[ ! -f "$OUT_DIR/example_vilma_run.npz" ]]; then
    echo "Run examples/run_example.sh first (no $OUT_DIR/example_vilma_run.npz)" >&2
    exit 1
fi

python -m vilma_tpu.frontend fit --precision f64 --logfile - \
    --sumstats "$DATA_DIR/example_data/example_gwas_sumstats.txt" \
    --output "$OUT_DIR/checkpoint_example_vilma_run" \
    --ld-schema "$OUT_DIR/ld_mat/example_schema.schema" \
    --seed 42 -K 81 --init-hg 0.2 --samplesizes 300e3 \
    --names ukbb --learn-scaling \
    --extract "$DATA_DIR/keep_variants.txt" \
    --load-checkpoint "$OUT_DIR/example_vilma_run.npz" \
                      "$OUT_DIR/example_vilma_run.covariance.pkl"

echo "Resumed-fit weights written to $OUT_DIR/checkpoint_example_vilma_run.estimates.tsv"

# Verify against the reference's committed golden output when present
GOLD="$DATA_DIR/checkpoint_example_vilma_run.estimates.tsv"
if [[ -f "$GOLD" ]]; then
    python - "$OUT_DIR/checkpoint_example_vilma_run.estimates.tsv" "$GOLD" <<'EOF'
import sys
import numpy as np
import pandas as pd
mine = pd.read_csv(sys.argv[1], sep='\t')
gold = pd.read_csv(sys.argv[2], sep='\t')
for col in ['posterior_ukbb', 'posterior_variance_ukbb']:
    err = np.max(np.abs(mine[col] - gold[col]) / np.abs(gold[col]))
    print(f'{col}: max relative error vs reference golden = {err:.2e}')
    assert err < 1e-6
print('MATCHES REFERENCE GOLDEN')
EOF
fi
