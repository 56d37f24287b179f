"""Parity of the folded (fused) resamplers vs conv + pixel-(un)shuffle.

``Downsample(fused=True)`` / ``Upsample(fused=True)`` rewrite the
reference's conv-then-shuffle pairs (KDLAE/KDLAE_model.py:182-200) as a
single strided / input-dilated conv with a phase-embedded kernel. The
parameter tree is unchanged, so the same params must produce identical
outputs in both modes, module-level and through the whole teacher.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rethink_acoustic_image_enhancement_tpu.models.blocks import (
    Downsample,
    Upsample,
)
from rethink_acoustic_image_enhancement_tpu.models.kdlae_teacher import (
    KDLAETeacher,
)


@pytest.mark.parametrize("c,h,w", [(48, 16, 24), (96, 8, 8), (16, 32, 10)])
def test_downsample_fused_parity(c, h, w):
    x = jax.random.normal(jax.random.PRNGKey(0), (2, h, w, c), jnp.float32)
    ref = Downsample(n_feat=c)
    params = ref.init(jax.random.PRNGKey(1), x)
    y_ref = ref.apply(params, x)
    y_fused = Downsample(n_feat=c, fused=True).apply(params, x)
    assert y_fused.shape == y_ref.shape == (2, h // 2, w // 2, 2 * c)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               rtol=0, atol=1e-5)


@pytest.mark.parametrize("c,h,w", [(96, 8, 12), (384, 4, 4), (32, 16, 5)])
def test_upsample_fused_parity(c, h, w):
    x = jax.random.normal(jax.random.PRNGKey(2), (2, h, w, c), jnp.float32)
    ref = Upsample(n_feat=c)
    params = ref.init(jax.random.PRNGKey(3), x)
    y_ref = ref.apply(params, x)
    y_fused = Upsample(n_feat=c, fused=True).apply(params, x)
    assert y_fused.shape == y_ref.shape == (2, 2 * h, 2 * w, c // 2)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               rtol=0, atol=1e-5)


def test_fused_init_param_tree_identical():
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 8, 8, 48), jnp.float32)
    p_plain = Downsample(n_feat=48).init(jax.random.PRNGKey(5), x)
    p_fused = Downsample(n_feat=48, fused=True).init(jax.random.PRNGKey(5), x)
    assert jax.tree_util.tree_structure(p_plain) == \
        jax.tree_util.tree_structure(p_fused)
    for a, b in zip(jax.tree_util.tree_leaves(p_plain),
                    jax.tree_util.tree_leaves(p_fused)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_config_reachable_and_restormer_parity():
    """`network_g: {type: ..., fused_resample: true}` builds the fused
    variant, and Restormer honors the flag with identical numerics."""
    from rethink_acoustic_image_enhancement_tpu.models import build_network

    m = build_network({"type": "KDLAE_teacher", "fused_resample": True})
    assert m.fused_resample is True

    cfg = dict(type="Restormer", dim=16, num_blocks=[1, 1, 1, 1],
               num_refinement_blocks=1, heads=[1, 2, 4, 8])
    plain = build_network(cfg)
    fused = build_network({**cfg, "fused_resample": True})
    x = jax.random.uniform(jax.random.PRNGKey(8), (1, 16, 16, 3))
    params = plain.init(jax.random.PRNGKey(9), x)
    np.testing.assert_allclose(np.asarray(fused.apply(params, x)),
                               np.asarray(plain.apply(params, x)),
                               rtol=0, atol=2e-5)


def test_fused_resample_gradient_parity():
    """Training usability: loss gradients through the folded resamplers
    match the conv+shuffle path (same params, same math, differentiable
    kernel construction)."""
    model = KDLAETeacher(dim=8, num_blocks=(1, 1, 1, 1),
                         num_refinement_blocks=1, heads=(1, 2, 4, 8),
                         layernorm_type="BiasFree", static="test",
                         params="cat")
    fused = model.clone(fused_resample=True)
    inputs = {
        "img": jax.random.uniform(jax.random.PRNGKey(10), (1, 16, 16, 3)),
        "denoise_rate": jnp.full((1, 16, 16, 1), 0.5, jnp.float32),
    }
    target = jax.random.uniform(jax.random.PRNGKey(11), (1, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(12), inputs)["params"]

    def loss(m):
        return lambda p: jnp.mean(jnp.abs(
            m.apply({"params": p}, inputs)["hq"] - target))

    g_ref = jax.grad(loss(model))(params)
    g_fused = jax.grad(loss(fused))(params)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_fused = jax.tree_util.tree_leaves(g_fused)
    for (path, a), b in zip(flat_ref, flat_fused):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=0, atol=2e-6,
            err_msg=jax.tree_util.keystr(path))


def test_fused_resample_spatial_shard_parity():
    """The folded resamplers compose with spatial sharding: a stride-2 /
    input-dilated conv over rows sharded on the 'spatial' axis must get
    the same halo exchanges (and numerics) as the plain path."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rethink_acoustic_image_enhancement_tpu.parallel.mesh import (
        DATA_AXIS,
        SPATIAL_AXIS,
        make_mesh,
        replicated,
    )

    model = KDLAETeacher(dim=8, num_blocks=(1, 1, 1, 1),
                         num_refinement_blocks=1, heads=(1, 2, 4, 8),
                         layernorm_type="BiasFree", static="test",
                         params="cat")
    fused = model.clone(fused_resample=True)
    params = model.init(
        jax.random.PRNGKey(13),
        {"img": jnp.zeros((1, 16, 16, 3)),
         "denoise_rate": jnp.zeros((1, 16, 16, 1))})["params"]
    rng = np.random.default_rng(14)
    img = rng.random((2, 32, 32, 3)).astype(np.float32)
    rate = np.full((2, 32, 32, 1), 0.5, np.float32)

    def fwd(m):
        return jax.jit(lambda p, i, r: m.apply(
            {"params": p}, {"img": i, "denoise_rate": r})["hq"])

    expected = np.asarray(fwd(model)(params, img, rate))

    mesh = make_mesh(n_data=2, n_spatial=4)
    spec = NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS, None, None))
    got = np.asarray(fwd(fused)(
        jax.device_put(params, replicated(mesh)),
        jax.device_put(img, spec), jax.device_put(rate, spec)))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


def test_teacher_fused_resample_parity():
    model = KDLAETeacher(dim=16, num_blocks=(1, 1, 1, 1),
                         num_refinement_blocks=1, heads=(1, 2, 4, 8),
                         static="train", params="cat")
    fused = model.clone(fused_resample=True)
    inputs = {
        "img": jax.random.uniform(jax.random.PRNGKey(6), (1, 16, 16, 3)),
        "denoise_rate": jnp.full((1, 16, 16, 1), 0.6, jnp.float32),
    }
    params = model.init(jax.random.PRNGKey(7), inputs)
    y_ref = model.apply(params, inputs)
    y_fused = fused.apply(params, inputs)
    np.testing.assert_allclose(np.asarray(y_fused["hq"]),
                               np.asarray(y_ref["hq"]), rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(y_fused["sr"]),
                               np.asarray(y_ref["sr"]), rtol=0, atol=2e-5)


def test_fused_resample_model_shard_parity():
    """The folded resamplers compose with tensor-parallel serving: their
    stride-2 / input-dilated conv kernels shard output channels over the
    'model' axis like any other kernel (model_param_specs has no special
    case) and the forward must stay exact."""
    from rethink_acoustic_image_enhancement_tpu.parallel.mesh import (
        make_mesh,
        model_param_specs,
        replicated,
    )

    model = KDLAETeacher(dim=8, num_blocks=(1, 1, 1, 1),
                         num_refinement_blocks=1, heads=(1, 2, 4, 8),
                         layernorm_type="BiasFree", static="test",
                         params="cat")
    fused = model.clone(fused_resample=True)
    params = model.init(
        jax.random.PRNGKey(13),
        {"img": jnp.zeros((1, 16, 16, 3)),
         "denoise_rate": jnp.zeros((1, 16, 16, 1))})["params"]
    rng = np.random.default_rng(15)
    img = rng.random((2, 32, 32, 3)).astype(np.float32)
    rate = np.full((2, 32, 32, 1), 0.5, np.float32)

    def fwd(m):
        return jax.jit(lambda p, i, r: m.apply(
            {"params": p}, {"img": i, "denoise_rate": r})["hq"])

    expected = np.asarray(fwd(model)(params, img, rate))

    mesh = make_mesh(n_data=1, n_spatial=1, n_model=8)
    got = np.asarray(fwd(fused)(
        jax.device_put(params, model_param_specs(mesh, params)),
        jax.device_put(img, replicated(mesh)),
        jax.device_put(rate, replicated(mesh))))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)
