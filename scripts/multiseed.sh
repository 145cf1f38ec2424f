#!/bin/bash
# Multi-seed headline quality runs (VERDICT r4 missing#3): base + explainer
# for all three bases at seeds 1 and 2 on the real chip. Seed 0 rows are the
# committed pipeline results (results/*.json) — same protocol, same
# quality-affecting code (r5 changed only parity-tested perf paths).
# Each run writes results/multiseed/s<seed>/ and its own checkpoint tree
# params_ms/s<seed>/ so headline checkpoints in params/ are untouched.
# Resumable: .done markers skip completed steps.
cd /root/repo
mkdir -p results/multiseed logs/multiseed

run() {
  name="$1"; shift
  if [ -f "logs/multiseed/$name.done" ]; then
    echo "=== $name: skipped (done) ==="; return 0
  fi
  echo "=== $name: $* ==="
  start=$(date +%s)
  "$@" > "logs/multiseed/$name.log" 2>&1
  rc=$?
  echo "=== $name done rc=$rc ($(($(date +%s) - start))s) ==="
  if [ $rc -eq 0 ]; then touch "logs/multiseed/$name.done"; fi
}

# Phase 1: the cheap bases for BOTH seeds first, so a partial run still
# yields complete +-std rows for TGN and GraphMixer; the expensive
# watchdog-supervised 3-layer TGAT runs come last.
for seed in 1 2; do
  out="params_ms/s$seed"
  res="results/multiseed/s$seed"
  run "s${seed}_base_tgn" python -m tempme_tpu.train.learn_base \
      --base_type tgn --n_epoch 30 --seed $seed \
      --out_dir $out/tgnn --results_dir $res
  run "s${seed}_exp_tgn" python -m tempme_tpu.train.temp_exp_main \
      --base_type tgn --n_epoch 10 --seed $seed \
      --ckpt_dir $out --results_dir $res
  run "s${seed}_base_graphmixer" python -m tempme_tpu.train.learn_base \
      --base_type graphmixer --n_epoch 30 --seed $seed \
      --out_dir $out/tgnn --results_dir $res
  run "s${seed}_exp_graphmixer" python -m tempme_tpu.train.temp_exp_main \
      --base_type graphmixer --n_epoch 10 --seed $seed \
      --ckpt_dir $out --results_dir $res
done
for seed in 1 2; do
  out="params_ms/s$seed"
  res="results/multiseed/s$seed"
  # 3-layer TGAT under the stall watchdog (XLA runtime hang ~1/300-600
  # steps, PERF.md); step-interval checkpoints make --resume mid-epoch
  run "s${seed}_base_tgat" python -m tempme_tpu.tools.supervise \
      --stall_timeout 600 -- python -m tempme_tpu.train.learn_base \
      --base_type tgat --n_layer 3 --bs 32 --n_epoch 30 --seed $seed \
      --ckpt_every_steps 50 --out_dir $out/tgnn --results_dir $res
  run "s${seed}_exp_tgat" python -m tempme_tpu.tools.supervise \
      --stall_timeout 900 -- python -m tempme_tpu.train.temp_exp_main \
      --base_type tgat --n_epoch 10 --seed $seed --ckpt_every_steps 20 \
      --ckpt_dir $out --results_dir $res
done
echo "=== multiseed complete ==="
