from map_tpu.data.dataset import CTRDataset  # noqa: F401
from map_tpu.data.loader import Batcher  # noqa: F401
