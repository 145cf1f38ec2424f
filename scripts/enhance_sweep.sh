#!/bin/bash
# Enhance-stage overfit sweep (VERDICT r3 next#3): weight decay on the fresh
# predictor head x dropout x head width, selected on the VAL split (driver
# does val-based selection natively now). Goal: TGN enhanced AP >= base AP,
# or a committed grid proving the negative at this dataset scale.
set -u
cd "$(dirname "$0")/.."
DATA=${1:-uslegis_sampled}
BASE=${2:-tgn}
EP=${3:-20}
mkdir -p logs/enhance_sweep results/enhance_sweep
run() {
  wd=$1; dr=$2; hid=$3
  tag="wd${wd}_dr${dr}_h${hid}"
  echo "=== enhance ${BASE} ${tag} ==="
  timeout 2400 python -m tempme_tpu.train.enhance_main \
    --data "$DATA" --base_type "$BASE" --n_epoch "$EP" --bs 100 \
    --weight_decay "$wd" --drop_out "$dr" --hid_dim "$hid" \
    --freeze_base_epochs 5 \
    --results_dir "results/enhance_sweep/${tag}" \
    2>&1 | grep -vE "WARNING" | tail -4 \
    | tee "logs/enhance_sweep/${BASE}_${tag}.log"
}
run 0 0.1 64       # baseline (val-selected)
run 1e-4 0.1 64
run 1e-3 0.1 64
run 1e-3 0.3 64
run 1e-4 0.3 64
run 1e-3 0.3 32
echo "=== sweep grid ==="
for f in results/enhance_sweep/*/enhance_${BASE}_${DATA}.json; do
  echo "$f: $(cat "$f")"
done
