"""Pallas kernel tests (interpret mode on CPU; compiled on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rethink_acoustic_image_enhancement_tpu.models import KDLAETeacher
from rethink_acoustic_image_enhancement_tpu.models.blocks import (
    GDFN,
    ChannelLayerNorm,
)
from rethink_acoustic_image_enhancement_tpu.ops.norm import channel_layernorm
from rethink_acoustic_image_enhancement_tpu.ops.pallas.gdfn import (
    fused_ln_gdfn,
    supports_shape,
)
from rethink_acoustic_image_enhancement_tpu.ops.pallas.layernorm import (
    fused_channel_layernorm,
)


@pytest.mark.parametrize("bias_free", [True, False])
@pytest.mark.parametrize("c", [48, 96])
def test_fused_ln_gdfn_matches_xla(bias_free, c):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 16, 24, c)).astype(np.float32))
    ln = ChannelLayerNorm(c, bias_free=bias_free)
    gd = GDFN(c)
    p_ln = ln.init(jax.random.PRNGKey(0), x)["params"]
    p_gd = gd.init(jax.random.PRNGKey(1), x)["params"]
    ref = x + gd.apply({"params": p_gd}, ln.apply({"params": p_ln}, x))
    got = fused_ln_gdfn(
        x, p_ln["weight"], p_ln.get("bias"),
        p_gd["project_in"]["kernel"], p_gd["dwconv"]["kernel"],
        p_gd["project_out"]["kernel"], bias_free=bias_free)
    scale = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(ref - got))) / scale < 5e-3  # bf16 MXU


def test_supports_shape_predicate():
    assert supports_shape(512, 512)
    assert supports_shape(512, 512, 96)
    assert not supports_shape(7, 512)  # H has no mult-of-8 divisor


def test_worthwhile_policy():
    from rethink_acoustic_image_enhancement_tpu.ops.pallas.gdfn import (
        worthwhile,
    )

    assert worthwhile(512, 512, 96)       # the measured 36% win case
    assert worthwhile(256, 256, 96)
    assert not worthwhile(512, 512, 48)   # 2.7x channel padding
    assert not worthwhile(128, 128, 192)  # small spatial extent
    assert not worthwhile(7, 512, 96)     # untileable


def test_fused_layernorm_matches_xla():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 8, 16, 96)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(96,)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(96,)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(fused_channel_layernorm(x, w, None, bias_free=True,
                                           interpret=True)),
        np.asarray(channel_layernorm(x, w, None)), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(fused_channel_layernorm(x, w, b, bias_free=False,
                                           interpret=True)),
        np.asarray(channel_layernorm(x, w, b)), rtol=1e-5, atol=1e-6)


def test_fused_model_flag_same_params_and_close_outputs():
    """fused=True must keep the identical parameter tree and agree with the
    unfused model (at this tiny size the worthwhile-policy falls back to
    XLA, which exercises exactly that production fallback)."""
    kw = dict(dim=8, num_blocks=(1, 1, 1, 1), num_refinement_blocks=1,
              heads=(1, 2, 4, 8), layernorm_type="BiasFree",
              static="test", params="cat")
    plain = KDLAETeacher(**kw)
    fused = KDLAETeacher(fused=True, **kw)
    inp = {"img": jnp.asarray(np.random.default_rng(0).random(
        (1, 16, 16, 3)).astype(np.float32)),
        "denoise_rate": jnp.full((1, 16, 16, 1), 0.7)}
    p1 = plain.init(jax.random.PRNGKey(0), inp)["params"]
    p2 = fused.init(jax.random.PRNGKey(0), inp)["params"]
    assert jax.tree.structure(p1) == jax.tree.structure(p2)

    out_plain = plain.apply({"params": p1}, inp)["hq"]
    out_fused = fused.apply({"params": p1}, inp)["hq"]
    scale = float(jnp.max(jnp.abs(out_plain))) + 1e-6
    assert float(jnp.max(jnp.abs(out_plain - out_fused))) / scale < 2e-2
