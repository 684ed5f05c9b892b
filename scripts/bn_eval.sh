#!/usr/bin/env bash
# BN latent scoring + BIC-scored BO + summary (reference: scripts/bn_eval.sh,
# which chains bo.py + summarize.py over a trained BN VAE checkpoint; the
# reference's BIC scorer shells out to an R script absent from its repo —
# here vae/bn_score.py scores natively).
# Usage: bn_eval.sh LATENT_MAT [extra args]; set CKPT=/path to enable BO.
set -e
cd "$(dirname "$0")/.."
LATENT=${1:?latent .mat required (e.g. results/bn/asia_200k_latent_epoch50.mat)}
shift
CKPT=${CKPT:-}
ARGS=(--latent "$LATENT" --data-type BN --bidirectional
      --seeds "${SEEDS:-10}" --res_dir "${RES:-results/bo_bn}")
[ -n "$CKPT" ] && ARGS+=(--checkpoint "$CKPT" --bo --BO_rounds "${ROUNDS:-10}")
python -m dagnn_tpu.cli.run_bo "${ARGS[@]}" "$@"
exec python -m dagnn_tpu.cli.summarize --res_dir "${RES:-results/bo_bn}"
