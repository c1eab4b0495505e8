#!/bin/bash
# Criteo-x4-scale production proof (VERDICT round-4 item 3): synthetic raw
# dac (40M rows, 39 fields, >=4M post-10-core vocab) -> chunked two-pass
# preprocessing -> vendored x4 split -> scratch + MFP-pretrain + finetune
# on the real chip. Records wall + peak RSS per stage in stage logs under
# $DATA/logs. Stages are idempotent (skipped when their output exists).
#
# Usage:
#   bash benchmarks/criteo_proof/run_proof.sh data   # CPU stages 1-3
#   bash benchmarks/criteo_proof/run_proof.sh train  # chip stages 4-6
set -e
cd "$(dirname "$0")"
DATA=${DATA:-$(pwd)/data}
ROWS=${ROWS:-40000000}
mkdir -p "$DATA/logs"
export PYTHONPATH=/root/repo:/root/.axon_site
PY=/opt/venv/bin/python
TIME="$PY /root/repo/benchmarks/criteo_proof/rusage.py"

stage() {  # stage <name> <done-file> <cmd...>
  local name=$1 done=$2; shift 2
  if [ -e "$done" ]; then echo "== $name: exists, skip"; return; fi
  echo "== $name: start $(date)"
  $TIME "$@" > "$DATA/logs/$name.log" 2>&1 \
    || { echo "!!! $name FAILED (see logs)"; exit 1; }
  echo "== $name: done $(date)  $(grep -m1 'Maximum resident' \
      "$DATA/logs/$name.log" || true)"
}

if [ "${1:-data}" = "data" ]; then
  stage gen_raw "$DATA/dac.txt" \
    $PY /root/repo/benchmarks/criteo_proof/gen_raw.py \
      --out "$DATA/dac.txt" --rows "$ROWS"
  stage preprocess "$DATA/criteo.h5" \
    $PY -m map_tpu.data.preprocess.criteo \
      --raw "$DATA/dac.txt" --out "$DATA" --chunked
  stage split "$DATA/split.pkl" \
    $PY -m map_tpu.data.preprocess.split_x4 \
      --labels "$DATA/criteo.h5" --out "$DATA"
  echo "data stages complete"
  exit 0
fi

# ---- chip stages: canonical DCNv2 Criteo configs ------------------------
COMMON="--data_dir=$DATA --dataset_name=criteo --model_name=dcnv2 \
  --embed_size=16 --hidden_size=1000 --num_hidden_layers=3 \
  --num_cross_layers=3 --hidden_dropout_rate=0.0 \
  --per_device_train_batch_size=4096 --per_device_eval_batch_size=8192 \
  --learning_rate=1e-3 --adam_epsilon=1e-8 --max_grad_norm=0 --seed=42"

stage scratch "$DATA/runs/scratch/results.log" \
  $PY -m map_tpu.run $COMMON --output_dir="$DATA/runs/scratch" \
    --weight_decay=0.1 --lr_sched=const --num_train_epochs=1 \
    --logging_steps=500

stage mfp "$DATA/runs/mfp/results.log" \
  $PY -m map_tpu.run $COMMON --output_dir="$DATA/runs/mfp" \
    --weight_decay=5e-2 --lr_sched=cosine --num_train_epochs=1 \
    --pretrain --pt_type=MFP --sampling_method=randint --mask_ratio=0.3 \
    --pt_neg_num=25 --proj_size=32 --pt_shared_noise --pt_per_field_noise \
    --logging_steps=500

CKPT=$(ls -1 "$DATA"/runs/mfp/*.model 2>/dev/null | sort -V | tail -1)
stage finetune "$DATA/runs/finetune/results.log" \
  $PY -m map_tpu.run $COMMON --output_dir="$DATA/runs/finetune" \
    --weight_decay=0.1 --lr_sched=const --num_train_epochs=1 \
    --finetune --pretrained_model_path="$CKPT" --logging_steps=500
echo "train stages complete"
