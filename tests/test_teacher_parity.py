"""Numerical parity of the flax KDLAE-T against the PyTorch reference.

The reference ships no pretrained weights in-repo, so the oracle is the
reference model instantiated with seeded random weights; our converter maps
its state_dict into the flax pytree and outputs are compared in fp32.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rethink_acoustic_image_enhancement_tpu.convert.torch_import import convert_teacher
from rethink_acoustic_image_enhancement_tpu.models import KDLAETeacher
from tests.conftest import requires_reference

SMALL = dict(
    dim=8,
    num_blocks=(1, 1, 1, 1),
    num_refinement_blocks=1,
    heads=(1, 2, 4, 8),
    ffn_expansion_factor=2.66,
)


def _torch_state_numpy(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


@requires_reference
@pytest.mark.parametrize("ln_type", ["BiasFree", "WithBias"])
@pytest.mark.parametrize("static", ["train", "test"])
@pytest.mark.fast
def test_teacher_forward_parity(torch_kdlae_module, ln_type, static):
    import torch

    torch.manual_seed(0)
    ref = torch_kdlae_module.KDLAE_teacher(
        dim=SMALL["dim"],
        num_blocks=list(SMALL["num_blocks"]),
        num_refinement_blocks=SMALL["num_refinement_blocks"],
        heads=list(SMALL["heads"]),
        ffn_expansion_factor=SMALL["ffn_expansion_factor"],
        bias=False,
        LayerNorm_type=ln_type,
        static=static,
        params="cat",
    ).eval()

    rng = np.random.default_rng(1)
    img = rng.uniform(size=(2, 3, 16, 24)).astype(np.float32)
    rate = np.full((2, 1, 16, 24), 0.6, dtype=np.float32)

    with torch.no_grad():
        out_t = ref({"img": torch.from_numpy(img),
                     "denoise_rate": torch.from_numpy(rate)})

    model = KDLAETeacher(layernorm_type=ln_type, static=static, **SMALL)
    params = jax.tree.map(jnp.asarray, convert_teacher(_torch_state_numpy(ref)))
    out_j = model.apply(
        {"params": params},
        {"img": jnp.transpose(jnp.asarray(img), (0, 2, 3, 1)),
         "denoise_rate": jnp.transpose(jnp.asarray(rate), (0, 2, 3, 1))},
    )

    hq_t = out_t["hq"].numpy()
    hq_j = np.transpose(np.asarray(out_j["hq"]), (0, 3, 1, 2))
    np.testing.assert_allclose(hq_j, hq_t, rtol=2e-4, atol=2e-5)

    if static == "train":
        sr_t = out_t["sr"].numpy()
        sr_j = np.transpose(np.asarray(out_j["sr"]), (0, 3, 1, 2))
        assert sr_j.shape == sr_t.shape  # 2x resolution
        np.testing.assert_allclose(sr_j, sr_t, rtol=2e-4, atol=2e-5)
    else:
        assert out_j["sr"] is None and out_t["sr"] is None


@pytest.mark.fast
def test_teacher_param_count_matches_reference():
    """Full notebook config must have exactly 26,882,940 params
    (BASELINE.md; KDLAE_T.ipynb cell 1 config)."""
    model = KDLAETeacher(
        dim=48, num_blocks=(4, 6, 6, 8), num_refinement_blocks=4,
        heads=(1, 2, 4, 8), ffn_expansion_factor=2.66,
        layernorm_type="BiasFree", static="train", params="cat",
    )
    params = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            {"img": jnp.zeros((1, 16, 16, 3)),
             "denoise_rate": jnp.zeros((1, 16, 16, 1))},
        )
    )["params"]
    n = sum(np.prod(x.shape) for x in jax.tree.leaves(params))
    assert n == 26_882_940
