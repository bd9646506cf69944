"""All shipped configs instantiate through the registry (reference target
strings), and the YAML loader merges + applies dotlist overrides."""
import glob
import os

import pytest

from dynamicvectorquantization_tpu.config.yaml_config import load_config, apply_dotlist
from dynamicvectorquantization_tpu.utils.instantiate import instantiate_from_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize(
    "path", sorted(glob.glob(os.path.join(REPO, "configs", "*", "*.yml")))
)
def test_config_instantiates(path):
    cfg = load_config([path])
    model = instantiate_from_config(cfg["model"])
    assert model is not None
    # stage detection
    if "stage2" in path or "dqtransformer" in os.path.basename(path):
        assert hasattr(model, "transformer") and hasattr(model, "sample_from_scratch")
        assert model.permuter is not None
    else:
        assert hasattr(model, "net")
        assert model.loss is not None


REF_CONFIGS = sorted(glob.glob("/root/reference/configs/*/*.yml"))


@pytest.mark.slow
@pytest.mark.parametrize("path", REF_CONFIGS)
def test_reference_shipped_configs_load_verbatim(path):
    """The reference's OWN shipped YAMLs (untouched) must instantiate
    through the registry — incl. the class config's
    `class_cond_stage_config` key (`class_imagenet_p6c18.yml:83`)."""
    if not REF_CONFIGS:
        pytest.skip("reference repo not available")
    cfg = load_config([path])
    model = instantiate_from_config(cfg["model"])
    assert model is not None


def test_dotlist_override():
    path = os.path.join(REPO, "configs", "stage1", "dqvae-entropy-dual-r05_imagenet.yml")
    cfg = load_config([path], ["model.params.quant_after_dim=128", "data.params.batch_size=4"])
    assert cfg["model"]["params"]["quant_after_dim"] == 128
    assert cfg["data"]["params"]["batch_size"] == 4


def test_merge_left_to_right():
    a = {"model": {"params": {"x": 1, "y": 2}}}
    b = {"model": {"params": {"y": 3}}}
    from dynamicvectorquantization_tpu.config.yaml_config import merge_configs

    out = merge_configs(a, b)
    assert out["model"]["params"] == {"x": 1, "y": 3}
