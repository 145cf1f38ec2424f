#!/bin/bash
# Enhance-stage overfit sweep (VERDICT r3 next#3): weight decay on the fresh
# predictor head x dropout x head width, selected on the VAL split (driver
# does val-based selection natively now). Goal: TGN enhanced AP >= base AP,
# or a committed grid proving the negative at this dataset scale.
set -u
cd "$(dirname "$0")/.."
DATA=${1:-uslegis_sampled}
BASE=${2:-tgn}
EP=${3:-30}
mkdir -p logs/enhance_sweep results/enhance_sweep
for wd in 0 1e-4 1e-3; do
  for dr in 0.1 0.3; do
    for hid in 64 32; do
      tag="wd${wd}_dr${dr}_h${hid}"
      echo "=== enhance ${BASE} ${tag} ==="
      timeout 3000 python -m tempme_tpu.train.enhance_main \
        --data "$DATA" --base_type "$BASE" --n_epoch "$EP" --bs 100 \
        --weight_decay "$wd" --drop_out "$dr" --hid_dim "$hid" \
        --freeze_base_epochs 5 \
        --results_dir "results/enhance_sweep/${tag}" \
        2>&1 | grep -vE "WARNING" | tail -4 \
        | tee "logs/enhance_sweep/${BASE}_${tag}.log"
    done
  done
done
echo "=== sweep grid ==="
for f in results/enhance_sweep/*/enhance_${BASE}_${DATA}.json; do
  echo "$f: $(cat "$f")"
done
