#!/bin/bash
# Round-trip sweep driver (tests/test-dctz.sh + test-dctz-f.sh equivalent).
# The reference loops dataset lists x error bounds and tees logs; this
# drives the same sweeps through the eval harness with machine-checkable
# CSV output. Real dataset files are picked up from $DCTZ_DATA_DIR or the
# first positional argument (BASELINE.md "re-anchoring" recipe).
set -e
[ -n "$1" ] && DCTZ_DATA_DIR="$1"
DATA=${DCTZ_DATA_DIR:+--data-dir "$DCTZ_DATA_DIR"}
python -m dctz_tpu.eval.harness --suite msst19  --modes ec qt --engines jax native auto $DATA --out eval/results_msst19.csv
python -m dctz_tpu.eval.harness --suite cesm-atm --modes ec qt --engines jax native auto $DATA --out eval/results_cesm.csv
python -m dctz_tpu.eval.harness --suite randgen --modes ec --engines jax native auto $DATA --out eval/results_randgen.csv
python -m dctz_tpu.eval.harness --suite spectral --modes ec qt --engines jax auto $DATA --out eval/results_spectral.csv
python -m dctz_tpu.eval.harness --suite msst19  --modes ec qt --engines sharded $DATA --out eval/results_msst19_sharded.csv
# matched-PSNR rate-distortion curves (the axis Z-Checker plots)
python -m dctz_tpu.eval.harness --suite spectral --psnr-curve $DATA --out eval/results_spectral_psnr_matched.csv
python -m dctz_tpu.eval.harness --suite msst19 --psnr-curve $DATA --out eval/results_msst19_psnr_matched.csv
echo "all sweeps done"
