#!/bin/bash
# Parity: reference run_script/run_DCNv2_finetune.sh
# PRETRAINED_MODEL_PATH should point at the {step}.model from a pretrain run.
PRETRAINED_MODEL_PATH=${PRETRAINED_MODEL_PATH:-outputs/avazu/RFD/pretrain/9.model}
python -m map_tpu.run \
  --model_name=dcnv2 \
  --output_dir=outputs/avazu/DCNv2/finetune \
  --dataset_name=avazu --data_dir=data/avazu \
  --finetune --pretrained_model_path="$PRETRAINED_MODEL_PATH" \
  --per_device_train_batch_size=4096 --per_device_eval_batch_size=10000 \
  --learning_rate=1e-3 --lr_sched=const --weight_decay=1e-1 \
  --num_train_epochs=1 \
  --embed_size=16 --hidden_size=1000 --num_hidden_layers=3 --num_cross_layers=3 \
  "$@"
