"""Parity for the training-half architectures against their own torch
classes: the vanilla Restormer baseline and RestormerSuperResolutionParam2
(whose alias-to-KDLAETeacher claim in SURVEY.md §2.1 is verified here with
the actual reference class as oracle), plus converter edge cases
(params_ema key, DDP 'module.' prefix strip)."""

import importlib.util
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rethink_acoustic_image_enhancement_tpu.convert.torch_import import (
    convert_teacher,
    load_pth_state_dict,
)
from rethink_acoustic_image_enhancement_tpu.models import (
    Restormer,
    RestormerSuperResolutionParam2,
)
from tests.conftest import REFERENCE_ROOT, requires_reference

SMALL = dict(dim=8, num_blocks=(1, 1, 1, 1), num_refinement_blocks=1,
             heads=(1, 2, 4, 8), ffn_expansion_factor=2.66)


@pytest.fixture(scope="module")
def ref_archs():
    pytest.importorskip("torch")
    spec = importlib.util.spec_from_file_location(
        "ref_restormer_arch",
        os.path.join(REFERENCE_ROOT, "Train", "basicsr", "models", "archs",
                     "restormer_arch.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@requires_reference
def test_restormer_baseline_parity(ref_archs):
    import torch

    torch.manual_seed(0)
    ref = ref_archs.Restormer(
        dim=SMALL["dim"], num_blocks=list(SMALL["num_blocks"]),
        num_refinement_blocks=SMALL["num_refinement_blocks"],
        heads=list(SMALL["heads"]),
        ffn_expansion_factor=SMALL["ffn_expansion_factor"],
        bias=False, LayerNorm_type="WithBias").eval()

    rng = np.random.default_rng(0)
    x = rng.uniform(size=(2, 3, 16, 24)).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.from_numpy(x)).numpy()

    model = Restormer(layernorm_type="WithBias", **SMALL)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert_teacher(sd))
    got = model.apply({"params": params},
                      jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), expected,
        rtol=2e-4, atol=2e-5)


@requires_reference
def test_sures_param2_alias_parity(ref_archs):
    """The pre-rename class used by configs 02-06 must match our alias."""
    import torch

    torch.manual_seed(1)
    ref = ref_archs.RestormerSuperResolutionParam2(
        dim=SMALL["dim"], num_blocks=list(SMALL["num_blocks"]),
        num_refinement_blocks=SMALL["num_refinement_blocks"],
        heads=list(SMALL["heads"]),
        ffn_expansion_factor=SMALL["ffn_expansion_factor"],
        bias=False, LayerNorm_type="BiasFree", static="train",
        params="cat").eval()

    rng = np.random.default_rng(1)
    img = rng.uniform(size=(1, 3, 16, 16)).astype(np.float32)
    rate = np.full((1, 1, 16, 16), 0.3, np.float32)
    with torch.no_grad():
        out_t = ref({"img": torch.from_numpy(img),
                     "denoise_rate": torch.from_numpy(rate)})

    model = RestormerSuperResolutionParam2(
        layernorm_type="BiasFree", static="train", params="cat", **SMALL)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert_teacher(sd))
    out_j = model.apply(
        {"params": params},
        {"img": jnp.transpose(jnp.asarray(img), (0, 2, 3, 1)),
         "denoise_rate": jnp.transpose(jnp.asarray(rate), (0, 2, 3, 1))})
    np.testing.assert_allclose(
        np.transpose(np.asarray(out_j["hq"]), (0, 3, 1, 2)),
        out_t["hq"].numpy(), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.transpose(np.asarray(out_j["sr"]), (0, 3, 1, 2)),
        out_t["sr"].numpy(), rtol=2e-4, atol=2e-5)


@requires_reference
def test_load_pth_param_key_and_module_prefix(tmp_path, torch_kdlae_module):
    """Reference checkpoint conventions: {'params'/'params_ema': sd} keys
    and DDP 'module.' prefixes (base_model.py:239,281-309)."""
    import torch

    torch.manual_seed(0)
    ref = torch_kdlae_module.KDLAE_student(
        inp_channels=1, out_channels=1, residual=True,
        hidden_channels=[8, 16])
    sd = ref.state_dict()
    prefixed = {f"module.{k}": v for k, v in sd.items()}
    path = str(tmp_path / "ckpt.pth")
    torch.save({"params": prefixed, "params_ema": sd}, path)

    for key in ["params", "params_ema"]:
        loaded = load_pth_state_dict(path, key)
        assert set(loaded) == set(sd.keys())  # prefix stripped
        np.testing.assert_array_equal(
            loaded["out_conv.weight"], sd["out_conv.weight"].numpy())
