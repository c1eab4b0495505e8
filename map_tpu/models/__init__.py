"""Model registry. Parity: reference `code/models.py:29-51` (keys dnn, autoint,
trans, fignn, fgcnn, deepfm, xdeepfm, dcnv2); `lr` and `fm` — submodule-only in
the reference (models.py:129-161) — are additionally registered here."""

from __future__ import annotations

from typing import Any

from map_tpu.models.base import CTRModel  # noqa: F401
from map_tpu.models.zoo import (  # noqa: F401
    LR, FM, DNN, DeepFM, XDeepFM, DCNV2, FGCNN, FiGNN, AutoInt, Transformer,
)

MODEL_REGISTRY = {
    "lr": LR,
    "fm": FM,
    "dnn": DNN,
    "deepfm": DeepFM,
    "xdeepfm": XDeepFM,
    "dcnv2": DCNV2,
    "fgcnn": FGCNN,
    "fignn": FiGNN,
    "autoint": AutoInt,
    "trans": Transformer,
}


def from_config(config: Any) -> CTRModel:
    name = config.model_name.lower()
    try:
        cls = MODEL_REGISTRY[name]
    except KeyError:
        raise NotImplementedError(config.model_name)
    return cls(config=config)
