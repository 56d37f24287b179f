"""Numerical parity of the flax ASDQE scorer vs the PyTorch reference.

BASELINE.md requires ASDQE fp32 reproduction of the reference's scores
(matmul precision pinned to 'highest' in conftest), including the
BatchNorm running-stats inference path and align_corners=True bilinear
upsampling.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rethink_acoustic_image_enhancement_tpu.convert.torch_import import convert_asdqe
from rethink_acoustic_image_enhancement_tpu.models import DenoiseRatePredictor
from tests.conftest import requires_reference


@requires_reference
@pytest.mark.parametrize("hw", [(64, 64), (50, 70)])  # non-multiple-of-16 too
@pytest.mark.fast
def test_asdqe_forward_parity(torch_asdqe_module, hw):
    import torch

    torch.manual_seed(0)
    ref = torch_asdqe_module.DenoiseRatePredictor()
    # randomize BN running stats so the test actually exercises them
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)
    ref.eval()

    rng = np.random.default_rng(3)
    h, w = hw
    lq = rng.uniform(size=(2, 3, h, w)).astype(np.float32)
    gt = rng.uniform(size=(2, 3, h, w)).astype(np.float32)

    with torch.no_grad():
        score_t = ref(torch.from_numpy(lq), torch.from_numpy(gt)).numpy()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, batch_stats = convert_asdqe(sd)
    variables = {
        "params": jax.tree.map(jnp.asarray, params),
        "batch_stats": jax.tree.map(jnp.asarray, batch_stats),
    }
    model = DenoiseRatePredictor()
    score_j = np.asarray(model.apply(
        variables,
        jnp.transpose(jnp.asarray(lq), (0, 2, 3, 1)),
        jnp.transpose(jnp.asarray(gt), (0, 2, 3, 1)),
    ))

    assert score_j.shape == score_t.shape == (2, 1)
    assert np.all(np.abs(score_j) <= 1.0)
    np.testing.assert_allclose(score_j, score_t, rtol=1e-5, atol=1e-6)


@pytest.mark.fast
def test_asdqe_param_count_matches_reference():
    """Default config must have exactly 3,428,705 params (BASELINE.md)."""
    model = DenoiseRatePredictor()
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 3)))
    )
    n = sum(np.prod(x.shape) for x in jax.tree.leaves(variables["params"]))
    assert n == 3_428_705
