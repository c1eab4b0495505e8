"""The field-blocked hybrid lookup must be gated off whenever corrupted ids
can leave their field blocks (RFD whole-vocab replacement generators), and on
for everything else (config.build_config policy)."""

from map_tpu.config import ModelArguments, TrainingArguments, build_config
from map_tpu.data.dataset import CTRDataset
from map_tpu.models.zoo import _field_bounds


def _cfg(synth_dir, **overrides):
    args = TrainingArguments(
        data_dir=synth_dir, dataset_name="synth", output_dir="/tmp/x",
        **overrides)
    ds = CTRDataset(args)
    return build_config(ModelArguments(model_name="dcnv2"), args, ds)


def test_supervised_keeps_hybrid(synth_dir):
    cfg = _cfg(synth_dir)
    assert cfg.field_blocked_lookup
    bounds = _field_bounds(cfg)
    assert bounds is not None and len(bounds) == cfg.num_fields
    # bounds are ascending & disjoint (the assembly contract)
    for (a, b), (c, d) in zip(bounds, bounds[1:]):
        assert a < b <= c < d


def test_mfp_keeps_hybrid(synth_dir):
    # MFP corruption only writes mask_id=3 (reserved) into the encoder input
    cfg = _cfg(synth_dir, pretrain=True, pt_type="MFP")
    assert cfg.field_blocked_lookup


def test_rfd_whole_vocab_disables_hybrid(synth_dir):
    for gen in ("Whole-Uniform", "Whole-Unigram"):
        cfg = _cfg(synth_dir, pretrain=True, pt_type="RFD", RFD_replace=gen)
        assert not cfg.field_blocked_lookup
        assert _field_bounds(cfg) is None


def test_rfd_field_generators_keep_hybrid(synth_dir):
    for gen in ("Uniform", "Unigram"):
        cfg = _cfg(synth_dir, pretrain=True, pt_type="RFD", RFD_replace=gen)
        assert cfg.field_blocked_lookup


def test_explicit_off_wins(synth_dir):
    cfg = _cfg(synth_dir, field_blocked_lookup=False)
    assert not cfg.field_blocked_lookup
    assert _field_bounds(cfg) is None
