"""map_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for self-supervised
pretraining and finetuning of click-through-rate models.

Re-designed from scratch with the capabilities of the MAP reference
implementation (CHIANGEL/MAP-CODE, KDD'23): a model zoo of feature-interaction
CTR architectures (DCNv2, DNN, DeepFM, xDeepFM, AutoInt, Transformer, FiGNN,
FGCNN), two self-supervised objectives (MFP: masked feature prediction with
NCE/sampled-softmax losses; RFD: replaced feature detection with four
replacement generators), and the supervised binary-CTR objective — all running
inside a single jitted train step over a ('data', 'model') device mesh, with
row-sharded embedding tables and Pallas kernels on the hot paths.
"""

__version__ = "0.1.0"

from map_tpu.config import Config, ModelArguments, TrainingArguments  # noqa: F401
