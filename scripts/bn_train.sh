#!/usr/bin/env bash
# BN (Bayesian networks) VAE training (reference: scripts/bn_train.sh):
# batch 128, 50 epochs, bidirectional. Falls back to a synthetic corpus if
# asia_200k.txt is unavailable (stripped from the reference checkout).
set -e
cd "$(dirname "$0")/.."
MODEL=${1:-DAGNN_BN}
[ $# -gt 0 ] && shift
ARGS=(--data-name asia_200k --data-type BN --model "$MODEL" --nvt 8
      --hs "${HS:-501}" --nz "${NZ:-56}" --batch-size "${BS:-128}"
      --epochs "${EPOCHS:-50}" --lr "${LR:-1e-4}" --bidirectional
      --save-interval "${SAVE_INTERVAL:-10}" --res_dir "${RES:-results/bn}"
      --load-latest-model)
[ -n "$DATA" ] && ARGS+=(--data-path "$DATA")
exec python -m dagnn_tpu.cli.train_vae "${ARGS[@]}" "$@"
