"""Config tree: load the reference's actual YAML files (read-only mount)
and check the parameter names/values carry over (L1/F4 parity)."""

import os

import pytest

from lvislam_tpu.core import config

REF = "/root/reference/config_pkg/config"
OWN = os.path.join(os.path.dirname(__file__), "..", "configs")


def test_load_shipped_configs():
    """The repo ships its own default YAMLs (`configs/`) — deployments must
    not depend on the reference checkout being mounted."""
    cfg = config.load_yaml(
        lidar_yaml=os.path.join(OWN, "params_lidar.yaml"),
        camera_yaml=os.path.join(OWN, "params_camera.yaml"),
    )
    assert cfg == config.SystemConfig(), (
        "shipped configs/ must reproduce the dataclass defaults"
    )


@pytest.mark.skipif(not os.path.exists(REF), reason="reference not mounted")
def test_load_reference_yamls():
    cfg = config.load_yaml(
        lidar_yaml=os.path.join(REF, "params_lidar.yaml"),
        camera_yaml=os.path.join(REF, "params_camera.yaml"),
    )
    assert cfg.lidar.N_SCAN == 4
    assert cfg.lidar.Horizon_SCAN == 6000
    assert cfg.lidar.sensor == "livox"
    assert abs(cfg.lidar.imuGravity - 9.80511) < 1e-6
    assert cfg.lidar.surroundingKeyframeSearchRadius == 50.0
    assert cfg.vins.camera.model_type == "MEI"
    assert abs(cfg.vins.camera.xi - 1.40630886) < 1e-6
    assert abs(cfg.vins.camera.gamma1 - 1454.59041) < 1e-4
    assert cfg.vins.max_cnt == 150
    assert cfg.vins.estimate_td
    assert len(cfg.vins.extrinsicRotation) == 9
    assert abs(cfg.vins.extrinsicTranslation[0] - 0.1278) < 1e-6
    assert cfg.vins.max_num_iterations == 10


def test_default_config_hashable():
    c = config.default_config()
    hash(c.lidar)
    hash(c.vins)
    assert config.min_parallax(c.vins) == pytest.approx(10.0 / 460.0)
