"""Config-system tests: the four shipped YAMLs parse, produce the right
stage parameters, and build models; registry lookup; BN momentum
schedule; recursive override."""

import os

import numpy as np
import pytest

from rfdnet_tpu.config.config import Config, update_recursive

CONFIGS = os.path.join(os.path.dirname(__file__), "..", "configs")


@pytest.mark.parametrize("name,phase,lr,freeze,weight", [
    ("iscnet_detection.yaml", "detection", 1e-3, [], 1),
    ("iscnet_completion.yaml", "completion", 1e-4,
     ["backbone", "voting", "detection"], 1),
    ("iscnet.yaml", "completion", 5e-5, [], 0.005),
])
def test_training_stage_configs(name, phase, lr, freeze, weight):
    cfg = Config(os.path.join(CONFIGS, name), mode="train", make_dirs=False)
    assert cfg.config["train"]["phase"] == phase
    assert cfg.config["optimizer"]["lr"] == pytest.approx(lr)
    assert cfg.config["train"]["freeze"] == freeze
    assert cfg.config["model"]["completion"]["weight"] == pytest.approx(weight)
    assert cfg.config["train"]["epochs"] == 240
    assert cfg.config["train"]["batch_size"] == 8
    model = cfg.build_model()
    assert model.phase == phase
    assert model.num_proposal == 256


def test_test_config():
    cfg = Config(os.path.join(CONFIGS, "iscnet_test.yaml"), mode="test",
                 make_dirs=False)
    assert cfg.config["test"]["batch_size"] == 1
    assert cfg.config["test"]["ap_iou_thresholds"] == [0.5]
    assert cfg.eval_config["conf_thresh"] == 0.05
    assert cfg.eval_config["nms_iou"] == 0.25
    assert cfg.eval_config["per_class_proposal"] is True
    assert cfg.config["generation"]["generate_mesh"] is True
    assert cfg.config["generation"]["resolution_0"] == 32
    assert cfg.config["generation"]["upsampling_steps"] == 0


def test_bn_momentum_schedule():
    cfg = Config(make_dirs=False)
    # max(0.5 * 0.5^(epoch//20), 0.001)  (`models/optimizers.py:56-60`)
    assert cfg.bn_momentum(0) == pytest.approx(0.5)
    assert cfg.bn_momentum(20) == pytest.approx(0.25)
    assert cfg.bn_momentum(40) == pytest.approx(0.125)
    assert cfg.bn_momentum(1000) == pytest.approx(0.001)


def test_update_recursive():
    a = {"x": {"y": 1, "z": 2}, "w": 3}
    update_recursive(a, {"x": {"y": 10}, "v": 4})
    assert a == {"x": {"y": 10, "z": 2}, "w": 3, "v": 4}


def test_registry_lookup():
    from rfdnet_tpu.registry import LOSSES, METHODS, MODULES

    assert "ISCNet" in METHODS
    for m in ("Pointnet2Backbone", "VotingModule", "ProposalModule",
              "SkipPropagation", "ONet"):
        assert m in MODULES
    for l in ("DetectionLoss", "ONet_Loss", "ChamferDist",
              "BoxNetDetectionLoss"):
        assert l in LOSSES
    with pytest.raises(KeyError):
        MODULES.get("Nope")


def test_scannet_codec_roundtrip():
    from rfdnet_tpu.config.scannet import ScannetConfig

    dc = ScannetConfig()
    rng = np.random.RandomState(0)
    angles = rng.uniform(-np.pi, np.pi, 64)
    cls, res = dc.angle2class(angles)
    back = dc.class2angle(cls, res)
    # round trip modulo 2pi into [-pi, pi]
    diff = np.mod(back - angles + np.pi, 2 * np.pi) - np.pi
    np.testing.assert_allclose(diff, 0, atol=1e-9)


def test_faster_eval_maps_to_remove_empty_box():
    cfg = Config({"test": {"phase": "completion", "faster_eval": False}},
                 mode="test", make_dirs=False)
    assert cfg.eval_config["remove_empty_box"] is True
    cfg2 = Config({"val": {"phase": "detection", "faster_eval": True}},
                  mode="val", make_dirs=False)
    assert cfg2.eval_config["remove_empty_box"] is False
