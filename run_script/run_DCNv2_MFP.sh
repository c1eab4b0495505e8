#!/bin/bash
# Parity: reference run_script/run_DCNv2_MFP.sh (3 epochs, cosine, wd 5e-2)
python -m map_tpu.run \
  --model_name=dcnv2 \
  --output_dir=outputs/avazu/MFP/pretrain \
  --dataset_name=avazu --data_dir=data/avazu \
  --pretrain --pt_type=MFP --sampling_method=randint --mask_ratio=0.3 \
  --pt_neg_num=25 --proj_size=32 \
  --per_device_train_batch_size=4096 --per_device_eval_batch_size=10000 \
  --learning_rate=1e-3 --lr_sched=cosine --weight_decay=5e-2 \
  --num_train_epochs=3 \
  --embed_size=16 --hidden_size=1000 --num_hidden_layers=3 --num_cross_layers=3 \
  "$@"
