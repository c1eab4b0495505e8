from map_tpu.train.trainer import Trainer  # noqa: F401
