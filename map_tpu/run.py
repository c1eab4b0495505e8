"""CLI entry point.

Lifecycle parity with the reference `code/run.py:13-92`: parse args ->
idempotency check (results.log exists -> exit) -> logging -> seed -> dataset ->
config assembly -> model build (+ finetune partial restore) -> dispatch to
train / MFP_pretrain / RFD_pretrain -> copy train.log to results.log as the
completion marker.
"""

from __future__ import annotations

import logging
import sys

import jax

from map_tpu import models
from map_tpu.config import build_config, parse_args
from map_tpu.data.dataset import CTRDataset
from map_tpu.train.trainer import Trainer
from map_tpu.utils.logging import (
    job_already_finished,
    mark_job_finished,
    setup_logging,
)


def main(argv=None) -> int:
    model_args, training_args = parse_args(argv)

    if training_args.mock_devices > 0:
        import os
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                                   f" --xla_force_host_platform_device_count={training_args.mock_devices}")
        # the axon TPU plugin ignores the JAX_PLATFORMS env var; use config
        jax.config.update("jax_platforms", "cpu")

    if job_already_finished(training_args.output_dir):
        print("job already finished, quit")
        return 0

    from map_tpu.parallel.mesh import maybe_init_distributed
    maybe_init_distributed()

    logger = setup_logging(training_args.output_dir, jax.process_index())
    logger.warning(
        f"process: {jax.process_index()}/{jax.process_count()}, "
        f"devices: {jax.device_count()} ({jax.devices()[0].platform})")
    logger.info(f"training/evaluation parameters {training_args}")

    dataset = CTRDataset(training_args)
    logger.info(f"field_names = {dataset.field_names}")

    config = build_config(model_args, training_args, dataset)
    config.save(training_args.output_dir)  # (Config.save exists but is never
    # called in the reference, arguments.py:169-172 — checkpoints there carry
    # no config; here every run directory is self-describing)
    model = models.from_config(config)

    trainer = Trainer(model, config, training_args, dataset)
    if training_args.pretrain:
        if training_args.pt_type == "MFP":
            trainer.MFP_pretrain()
        elif training_args.pt_type == "RFD":
            trainer.RFD_pretrain()
        else:
            raise NotImplementedError(training_args.pt_type)
    else:
        trainer.train()
        trainer.test()

    if jax.process_index() == 0:  # one completion marker per job
        mark_job_finished(training_args.output_dir)
    return 0


if __name__ == "__main__":
    sys.exit(main())
