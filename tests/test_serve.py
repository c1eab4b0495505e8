"""Serving path: train -> save -> Predictor scores match the eval forward."""

import glob

import numpy as np

from map_tpu.run import main as run_main
from map_tpu.serve import Predictor, main as serve_main
from map_tpu.utils.metrics import roc_auc


def test_predictor_roundtrip(tmp_path, synth_dir):
    out = tmp_path / "run"
    rc = run_main([
        "--model_name", "dcnv2", "--output_dir", str(out),
        "--dataset_name", "synth", "--data_dir", synth_dir,
        "--per_device_train_batch_size", "256",
        "--per_device_eval_batch_size", "512",
        "--learning_rate", "1e-2", "--num_train_epochs", "2",
        "--lr_sched", "const", "--weight_decay", "0.1",
        "--embed_size", "8", "--hidden_size", "32", "--num_hidden_layers", "1",
        "--num_cross_layers", "2", "--logging_steps", "100",
        "--hidden_dropout_rate", "0.0"])
    assert rc == 0
    step = max(int(p.split("/")[-1].split(".")[0])
               for p in glob.glob(str(out / "*.model")))

    from map_tpu.data.dataset import CTRDataset

    class A:
        data_dir = synth_dir
        dataset_name = "synth"
        pretrain = False
        pt_type = "MFP"
        RFD_replace = "Unigram"
        pt_per_field_noise = False

    ds = CTRDataset(A())
    pred = Predictor(str(out), step, batch_size=300)  # forces padding path
    probs = pred.predict_proba(ds.X["test"])
    assert probs.shape == (len(ds.Y["test"]),)
    assert (probs > 0).all() and (probs < 1).all()
    # the restored best checkpoint must score as well as training reported
    auc = roc_auc(ds.Y["test"], probs)
    assert auc > 0.55

    # byte-packed transfer (v2) must score identically to raw int32 ids
    assert pred._groups is not None  # synth config carries idx ranges
    pred_raw = Predictor(str(out), step, batch_size=300,
                         compress_transfer=False)
    np.testing.assert_allclose(pred_raw.predict_proba(ds.X["test"]), probs,
                               atol=1e-7)

    # CLI round trip
    out_npy = tmp_path / "scores.npy"
    rc = serve_main(["--model_dir", str(out), "--step", str(step),
                     "--data_dir", synth_dir, "--dataset_name", "synth",
                     "--split", "test", "--out", str(out_npy)])
    assert rc == 0
    np.testing.assert_allclose(np.load(out_npy), probs, atol=1e-6)
