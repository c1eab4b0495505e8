"""--profile_steps captures a jax.profiler trace directory (SURVEY.md §5.1:
the reference has no tracing)."""

import glob
import os

from map_tpu.run import main


def test_profile_trace_written(tmp_path, synth_dir):
    rc = main([
        "--model_name", "dnn", "--output_dir", str(tmp_path),
        "--dataset_name", "synth", "--data_dir", synth_dir,
        "--per_device_train_batch_size", "128",
        "--per_device_eval_batch_size", "512",
        "--embed_size", "8", "--hidden_size", "16", "--num_hidden_layers", "1",
        "--hidden_dropout_rate", "0.0", "--learning_rate", "1e-3",
        "--num_train_epochs", "1", "--lr_sched", "const",
        "--profile_steps", "2", "--steps_per_call", "1",
    ])
    assert rc == 0
    prof = os.path.join(tmp_path, "profile")
    assert os.path.isdir(prof)
    # xplane artifacts written somewhere under the trace dir
    assert glob.glob(os.path.join(prof, "**", "*.xplane.pb"), recursive=True) \
        or glob.glob(os.path.join(prof, "**", "*.trace.json*"), recursive=True) \
        or os.listdir(prof)
