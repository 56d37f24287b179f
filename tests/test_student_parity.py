"""Numerical parity of the flax KDLAE-S student vs the PyTorch reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rethink_acoustic_image_enhancement_tpu.convert.torch_import import convert_student
from rethink_acoustic_image_enhancement_tpu.models import KDLAEStudent
from tests.conftest import requires_reference


@requires_reference
@pytest.mark.parametrize("residual", [True, False])
@pytest.mark.parametrize("hidden", [(16, 32, 64), (8, 16, 32, 64)])
@pytest.mark.fast
def test_student_forward_parity(torch_kdlae_module, residual, hidden):
    import torch

    torch.manual_seed(0)
    ref = torch_kdlae_module.KDLAE_student(
        inp_channels=1, out_channels=1, residual=residual,
        hidden_channels=list(hidden),
    ).eval()

    rng = np.random.default_rng(2)
    levels = len(hidden) - 1
    mult = 2 ** levels
    x = rng.uniform(size=(2, 7, 4 * mult, 6 * mult)).astype(np.float32)

    with torch.no_grad():
        out_t = ref(torch.from_numpy(x)).numpy()

    model = KDLAEStudent(residual=residual, hidden_channels=hidden)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert_student(sd))
    out_j = np.asarray(model.apply({"params": params}, jnp.asarray(x)))

    assert out_j.shape == out_t.shape == x.shape
    np.testing.assert_allclose(out_j, out_t, rtol=1e-4, atol=1e-5)


@pytest.mark.fast
def test_student_param_count_matches_reference():
    """Shipped config (hidden [16,32,64]) must have exactly 294,449 params
    (BASELINE.md)."""
    model = KDLAEStudent(residual=True, hidden_channels=(16, 32, 64))
    params = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 7, 32, 32)))
    )["params"]
    n = sum(np.prod(x.shape) for x in jax.tree.leaves(params))
    assert n == 294_449
