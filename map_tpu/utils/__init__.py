from map_tpu.utils.metrics import binary_log_loss, roc_auc  # noqa: F401
