#!/usr/bin/env bash
# NA latent scoring + BO + summary (reference: scripts/na_eval.sh:44-57).
# Usage: na_eval.sh LATENT_MAT [extra args]; set CKPT=/path to enable BO.
set -e
cd "$(dirname "$0")/.."
LATENT=${1:?latent .mat required}
shift
CKPT=${CKPT:-}
ARGS=(--latent "$LATENT" --data-type ENAS --seeds "${SEEDS:-10}"
      --res_dir "${RES:-results/bo}")
[ -n "$CKPT" ] && ARGS+=(--checkpoint "$CKPT" --bo --BO_rounds "${ROUNDS:-10}")
python -m dagnn_tpu.cli.run_bo "${ARGS[@]}" "$@"
exec python -m dagnn_tpu.cli.summarize --res_dir "${RES:-results/bo}"
