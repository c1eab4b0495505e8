#!/bin/bash
# Run map_tpu on the SAME synthetic dataset as validation/run_reference.sh,
# same canonical DCNv2 configs, on the real TPU chip. Outputs under
# validation/runs/tpu/. Optional env overrides:
#   EXTRA="--compute_dtype=bfloat16"  (A/B flags appended to every stage)
#   TAG=bf16                          (output subdir suffix)
set -e
cd "$(dirname "$0")"
DATA=$(pwd)/data/synthazu
SEED=${SEED:-42}
RUNS=$(pwd)/runs/tpu${TAG:+_$TAG}
if [ "$SEED" != "42" ]; then RUNS=${RUNS}_s$SEED; fi
mkdir -p "$RUNS"
export PYTHONPATH=/root/repo:/root/.axon_site

COMMON="--data_dir=$DATA --dataset_name=synthazu --model_name=dcnv2 \
  --embed_size=16 --hidden_size=1000 --num_hidden_layers=3 \
  --num_cross_layers=3 --hidden_dropout_rate=0.0 \
  --per_device_train_batch_size=4096 --per_device_eval_batch_size=4096 \
  --learning_rate=1e-3 --adam_epsilon=1e-8 --max_grad_norm=0 --seed=$SEED \
  ${EXTRA:-}"

stage=${1:-all}

run_scratch() {
  python -m map_tpu.run $COMMON \
    --output_dir="$RUNS/scratch" --weight_decay=0.1 --lr_sched=const \
    --num_train_epochs=1 --logging_steps=100
}

run_mfp() {
  python -m map_tpu.run $COMMON \
    --output_dir="$RUNS/mfp" --weight_decay=5e-2 --lr_sched=cosine \
    --num_train_epochs=3 --pretrain --pt_type=MFP \
    --sampling_method=randint --mask_ratio=0.3 --pt_neg_num=25 \
    --proj_size=32 --logging_steps=100
}

run_rfd() {
  python -m map_tpu.run $COMMON \
    --output_dir="$RUNS/rfd" --weight_decay=5e-2 --lr_sched=cosine \
    --num_train_epochs=3 --pretrain --pt_type=RFD --RFD_replace=Unigram \
    --sampling_method=randint --mask_ratio=0.3 --logging_steps=100
}

run_finetune() {
  ckpt=$(ls -1 "$RUNS"/mfp/*.model 2>/dev/null | sort -V | tail -1)
  python -m map_tpu.run $COMMON \
    --output_dir="$RUNS/finetune" --weight_decay=0.1 --lr_sched=const \
    --num_train_epochs=1 --finetune --pretrained_model_path="$ckpt" \
    --logging_steps=100
}

run_finetune_rfd() {
  ckpt=$(ls -1 "$RUNS"/rfd/*.model 2>/dev/null | sort -V | tail -1)
  python -m map_tpu.run $COMMON \
    --output_dir="$RUNS/finetune_rfd" --weight_decay=0.1 --lr_sched=const \
    --num_train_epochs=1 --finetune --pretrained_model_path="$ckpt" \
    --logging_steps=100
}

case "$stage" in
  scratch) run_scratch ;;
  mfp) run_mfp ;;
  rfd) run_rfd ;;
  finetune) run_finetune ;;
  finetune_rfd) run_finetune_rfd ;;
  all) run_scratch; run_mfp; run_rfd; run_finetune; run_finetune_rfd ;;
  *) echo "unknown stage $stage"; exit 1 ;;
esac
