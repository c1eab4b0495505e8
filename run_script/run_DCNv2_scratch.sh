#!/bin/bash
# Parity: reference run_script/run_DCNv2_scratch.sh (1 epoch, lr 1e-3, const, wd 0.1)
python -m map_tpu.run \
  --model_name=dcnv2 \
  --output_dir=outputs/avazu/DCNv2/scratch \
  --dataset_name=avazu --data_dir=data/avazu \
  --per_device_train_batch_size=4096 --per_device_eval_batch_size=10000 \
  --learning_rate=1e-3 --lr_sched=const --weight_decay=1e-1 \
  --num_train_epochs=1 \
  --embed_size=16 --hidden_size=1000 --num_hidden_layers=3 --num_cross_layers=3 \
  "$@"
