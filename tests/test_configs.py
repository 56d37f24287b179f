"""Every shipped config must parse and validate against the registries."""

import glob
import os

import pytest

from rethink_acoustic_image_enhancement_tpu.train.config import parse, validate

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "configs")


@pytest.mark.parametrize("path", sorted(glob.glob(os.path.join(CONFIG_DIR, "*.yml"))))
def test_config_validates(path, tmp_path):
    opt = parse(path, is_train=True, root_path=str(tmp_path))
    validate(opt)
    assert opt["path"]["experiments_root"].startswith(str(tmp_path))
    assert opt["datasets"]["train"]["phase"] == "train"


def test_configs_exist():
    assert len(glob.glob(os.path.join(CONFIG_DIR, "*.yml"))) >= 4
