#!/bin/bash
# Run the torch reference (/root/reference, READ-ONLY) on the shared synthetic
# dataset, CPU. All outputs land under validation/runs/reference/.
#
# Configs mirror run_script/run_DCNv2_*.sh (canonical DCNv2 settings), with:
#  - logging_steps=1000000000 for the MFP run: the reference crashes with a
#    NameError at its first logging window (`str(log)` at trainer.py:341 —
#    SURVEY.md known defects); disabling windows routes around the bug
#    without modifying the read-only reference.
#  - num_train_epochs=1 scratch/finetune, 3 pretrain (canonical).
set -e
cd "$(dirname "$0")"
DATA=$(pwd)/data/synthazu
SEED=${SEED:-42}
RUNS=$(pwd)/runs/reference
if [ "$SEED" != "42" ]; then RUNS=${RUNS}_s$SEED; fi
mkdir -p "$RUNS"
export OMP_NUM_THREADS=${OMP_NUM_THREADS:-2}
export CUDA_VISIBLE_DEVICES=""

REF=/root/reference/code
# --no_cuda is required: the reference's device setup only handles n_gpu==1
# or the NCCL multi-GPU branch (`arguments.py:58-77`); CPU torch reports 0
# GPUs and falls into the NCCL branch unless no_cuda short-circuits it.
COMMON="--data_dir=$DATA --dataset_name=synthazu --model_name=DCNv2 \
  --embed_size=16 --hidden_size=1000 --num_hidden_layers=3 \
  --num_cross_layers=3 --hidden_dropout_rate=0.0 \
  --per_gpu_train_batch_size=4096 --per_gpu_eval_batch_size=4096 \
  --learning_rate=1e-3 --adam_epsilon=1e-8 --max_grad_norm=0 --no_cuda=True \
  --seed=$SEED"

stage=${1:-all}

run_scratch() {
  python /root/repo/validation/ref_launch.py $COMMON \
    --output_dir="$RUNS/scratch" --weight_decay=0.1 --lr_sched=const \
    --num_train_epochs=1 --logging_steps=100
}

run_mfp() {
  python /root/repo/validation/ref_launch.py $COMMON \
    --output_dir="$RUNS/mfp" --weight_decay=5e-2 --lr_sched=cosine \
    --num_train_epochs=3 --pretrain=True --pt_type=MFP \
    --sampling_method=randint --mask_ratio=0.3 --pt_neg_num=25 \
    --proj_size=32 --logging_steps=1000000000
}

run_rfd() {
  python /root/repo/validation/ref_launch.py $COMMON \
    --output_dir="$RUNS/rfd" --weight_decay=5e-2 --lr_sched=cosine \
    --num_train_epochs=3 --pretrain=True --pt_type=RFD --RFD_replace=Unigram \
    --sampling_method=randint --mask_ratio=0.3 --logging_steps=100
}

run_finetune() {
  # the pretrain loop saves once at the end, named by global_step
  ckpt=$(ls -1 "$RUNS"/mfp/*.model 2>/dev/null | sort -V | tail -1)
  python /root/repo/validation/ref_launch.py $COMMON \
    --output_dir="$RUNS/finetune" --weight_decay=0.1 --lr_sched=const \
    --num_train_epochs=1 --finetune=True --pretrained_model_path="$ckpt" \
    --logging_steps=100
}

run_finetune_rfd() {
  ckpt=$(ls -1 "$RUNS"/rfd/*.model 2>/dev/null | sort -V | tail -1)
  python /root/repo/validation/ref_launch.py $COMMON \
    --output_dir="$RUNS/finetune_rfd" --weight_decay=0.1 --lr_sched=const \
    --num_train_epochs=1 --finetune=True --pretrained_model_path="$ckpt" \
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
