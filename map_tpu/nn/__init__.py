from map_tpu.nn.activations import get_act  # noqa: F401
