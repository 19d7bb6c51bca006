#!/bin/bash
# Round-trip sweep driver (tests/test-dctz.sh + test-dctz-f.sh equivalent).
# The reference loops dataset lists x error bounds and tees logs; this
# drives the same sweeps through the eval harness with machine-checkable
# CSV output. Real dataset files are picked up from $DCTZ_DATA_DIR.
set -e
DATA=${DCTZ_DATA_DIR:+--data-dir "$DCTZ_DATA_DIR"}
python -m dctz_tpu.eval.harness --suite msst19  --modes ec qt --engines jax native $DATA --out eval/results_msst19.csv
python -m dctz_tpu.eval.harness --suite cesm-atm --modes ec qt --engines jax native $DATA --out eval/results_cesm.csv
python -m dctz_tpu.eval.harness --suite randgen --modes ec --engines jax native $DATA --out eval/results_randgen.csv
python -m dctz_tpu.eval.harness --suite spectral --modes ec qt --engines jax $DATA --out eval/results_spectral.csv
python -m dctz_tpu.eval.harness --suite msst19  --modes ec qt --engines sharded $DATA --out eval/results_msst19_sharded.csv
echo "all sweeps done"
