"""Pretrain -> finetune transfer restores backbone tensors EXACTLY and drops
heads (reference mechanism: models.py:97-112, SURVEY.md §4 tier 2)."""

import glob

import jax
import numpy as np

import map_tpu.models as models
from map_tpu.config import TrainingArguments
from map_tpu.data.dataset import CTRDataset
from map_tpu.train.trainer import Trainer
from tests.conftest import base_model_config


def _args(synth_dir, out, **kw):
    base = dict(output_dir=str(out), dataset_name="synth", data_dir=synth_dir,
                per_device_train_batch_size=256, per_device_eval_batch_size=512,
                learning_rate=1e-3, weight_decay=0.05, lr_sched="const",
                num_train_epochs=1, logging_steps=1000, warmup_ratio=0.0,
                max_grad_norm=0.0, seed=42, save_steps=0)
    base.update(kw)
    return TrainingArguments(**base)


def test_backbone_tensors_transfer_exactly(tmp_path, synth_dir):
    # 1) MFP pretrain briefly and save
    pt_args = _args(synth_dir, tmp_path, pretrain=True, pt_type="MFP",
                    sampling_method="randint", mask_ratio=0.3)
    ds = CTRDataset(pt_args)
    cfg_pt = base_model_config(model_name="dcnv2", input_size=ds.input_size,
                               num_fields=ds.num_fields, pretrain=True,
                               pt_type="MFP", pt_neg_num=5)
    cfg_pt.feat_count = ds.feat_count
    t_pt = Trainer(models.from_config(cfg_pt), cfg_pt, pt_args, ds)
    t_pt.MFP_pretrain()
    ckpt = glob.glob(str(tmp_path / "*.model"))[0]
    pt_params = jax.device_get(t_pt.state.params)

    # 2) finetune trainer partially restores
    ft_args = _args(synth_dir, tmp_path / "ft", finetune=True,
                    pretrained_model_path=ckpt)
    ds2 = CTRDataset(ft_args)
    cfg_ft = base_model_config(model_name="dcnv2", input_size=ds2.input_size,
                               num_fields=ds2.num_fields, pretrain=False)
    t_ft = Trainer(models.from_config(cfg_ft), cfg_ft, ft_args, ds2)
    t_ft._build_steps(10)  # triggers load_for_finetune

    ft_params = jax.device_get(t_ft.state.params)
    # backbone + embedding exactly equal
    for key in ("embed", "cross_net", "parallel_dnn"):
        for a, b in zip(jax.tree.leaves(pt_params[key]),
                        jax.tree.leaves(ft_params[key])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # pretrain heads are NOT in the finetune model; fc_out is fresh
    assert "feat_encoder" in pt_params and "feat_encoder" not in ft_params
    assert "mfp_decoder" in pt_params and "mfp_decoder" not in ft_params
    assert "fc_out" in ft_params
