"""Mesh/sharding tests: data-parallel consistency and the spatial (CP
analog) axis — XLA inserts halo exchanges for spatially-sharded convs."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from rethink_acoustic_image_enhancement_tpu.models import KDLAETeacher
from rethink_acoustic_image_enhancement_tpu.parallel.mesh import (
    DATA_AXIS,
    SPATIAL_AXIS,
    batch_sharding,
    make_mesh,
    process_shard,
    replicated,
    shard_batch_pytree,
)


def _tiny_teacher():
    model = KDLAETeacher(dim=8, num_blocks=(1, 1, 1, 1),
                         num_refinement_blocks=1, heads=(1, 2, 4, 8),
                         layernorm_type="BiasFree", static="test",
                         params="cat")
    params = model.init(
        jax.random.PRNGKey(0),
        {"img": jnp.zeros((1, 16, 16, 3)),
         "denoise_rate": jnp.zeros((1, 16, 16, 1))})["params"]
    return model, params


def test_mesh_shapes():
    mesh = make_mesh(n_data=4, n_spatial=2)
    assert mesh.shape[DATA_AXIS] == 4 and mesh.shape[SPATIAL_AXIS] == 2
    mesh2 = make_mesh()
    assert mesh2.shape[DATA_AXIS] == 8


def test_spatial_sharding_matches_unsharded():
    """Shard H over 4 devices; conv halo exchange must preserve numerics."""
    model, params = _tiny_teacher()
    rng = np.random.default_rng(0)
    img = rng.random((2, 32, 32, 3)).astype(np.float32)
    rate = np.full((2, 32, 32, 1), 0.5, np.float32)

    def fwd(p, i, r):
        return model.apply({"params": p}, {"img": i, "denoise_rate": r})["hq"]

    expected = np.asarray(jax.jit(fwd)(params, img, rate))

    mesh = make_mesh(n_data=2, n_spatial=4)
    spec = NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS, None, None))
    img_s = jax.device_put(img, spec)
    rate_s = jax.device_put(rate, spec)
    params_s = jax.device_put(params, replicated(mesh))
    got = np.asarray(jax.jit(fwd)(params_s, img_s, rate_s))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


def test_shard_batch_pytree_places_on_data_axis():
    mesh = make_mesh(n_data=8, n_spatial=1)
    batch = {"lq": {"img": np.zeros((16, 8, 8, 3), np.float32)},
             "scalar": np.float32(1.0)}
    out = shard_batch_pytree(mesh, batch)
    sh = out["lq"]["img"].sharding
    assert sh.spec[0] == DATA_AXIS
    assert all(s is None for s in sh.spec[1:])


def test_batch_sharding_spec():
    mesh = make_mesh(n_data=4, n_spatial=2)
    s = batch_sharding(mesh, spatial_axis=1)
    assert s.spec == P(DATA_AXIS, SPATIAL_AXIS, None, None)


def test_process_shard_strided():
    items = list(range(10))
    assert process_shard(items, 0, 4) == [0, 4, 8]
    assert process_shard(items, 3, 4) == [3, 7]


def test_model_parallel_forward_matches_unsharded():
    """Tensor parallelism: shard conv output channels / per-channel
    vectors over the 'model' axis (model_param_specs) and let XLA SPMD
    insert the channel collectives — numerics must match unsharded."""
    from rethink_acoustic_image_enhancement_tpu.parallel.mesh import (
        MODEL_AXIS,
        model_param_specs,
    )

    model, params = _tiny_teacher()
    rng = np.random.default_rng(5)
    img = rng.random((1, 16, 16, 3)).astype(np.float32)
    rate = np.full((1, 16, 16, 1), 0.5, np.float32)

    def fwd(p, i, r):
        return model.apply({"params": p}, {"img": i, "denoise_rate": r})["hq"]

    expected = np.asarray(jax.jit(fwd)(params, img, rate))

    mesh = make_mesh(n_data=1, n_spatial=1, n_model=8)
    assert mesh.shape[MODEL_AXIS] == 8
    specs = model_param_specs(mesh, params)
    # dim=8 teacher: level-1 conv kernels have 8 output channels — they
    # must actually shard (1 channel/device), not silently replicate
    sharded_leaves = [s for s in jax.tree_util.tree_leaves(
        specs, is_leaf=lambda x: isinstance(x, NamedSharding))
        if s.spec != P()]
    assert len(sharded_leaves) > 50
    params_tp = jax.device_put(params, specs)
    img_r = jax.device_put(img, replicated(mesh))
    rate_r = jax.device_put(rate, replicated(mesh))
    got = np.asarray(jax.jit(fwd)(params_tp, img_r, rate_r))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


def test_model_parallel_predictor_matches_single_device():
    """TeacherPredictor(mesh with a 'model' axis) = tensor-parallel
    serving; uint8 outputs match the single-device predictor to <=1
    quantization level. Combining model+spatial axes must REFUSE: the
    SPMD partitioner mis-partitions feature-sharded conv kernels under
    halo exchange (measured max|diff| 22 on a [0,1] image)."""
    import pytest

    from rethink_acoustic_image_enhancement_tpu.eval.infer import (
        TeacherPredictor,
    )

    model, params = _tiny_teacher()
    rng = np.random.default_rng(6)
    img = rng.random((32, 24, 3)).astype(np.float32)

    single = TeacherPredictor(params=params, model=model)
    out_1 = single(img, denoise_rate=0.7, zero_mask=False)["hq"]

    mesh = make_mesh(n_data=1, n_spatial=1, n_model=8)
    tp = TeacherPredictor(params=params, model=model, mesh=mesh)
    out_n = tp(img, denoise_rate=0.7, zero_mask=False)["hq"]

    assert out_n.shape == out_1.shape == img.shape
    diff = np.abs(out_1.astype(np.int16) - out_n.astype(np.int16))
    assert diff.max() <= 1
    assert (diff == 0).mean() > 0.99

    with pytest.raises(ValueError, match="cannot be combined"):
        TeacherPredictor(params=params, model=model,
                         mesh=make_mesh(n_data=1, n_spatial=2, n_model=4))


def test_spatial_mesh_predictor_matches_single_device():
    """TeacherPredictor(mesh=...) shards image rows across the spatial
    axis (multi-chip serving for huge frames); uint8 outputs must match
    the single-device predictor up to 1 quantization level."""
    from rethink_acoustic_image_enhancement_tpu.eval.infer import (
        TeacherPredictor,
    )

    model, params = _tiny_teacher()
    rng = np.random.default_rng(3)
    # H divisible by 8*n_spatial: both paths pad identically, so global
    # MDTA sees the same pixels (otherwise the extra rows deviate like
    # shape_bucket does — documented on TeacherPredictor.mesh)
    img = rng.random((64, 48, 3)).astype(np.float32)

    single = TeacherPredictor(params=params, model=model)
    out_1 = single(img, denoise_rate=0.7, zero_mask=False)["hq"]

    mesh = make_mesh(n_data=2, n_spatial=4)
    sharded = TeacherPredictor(params=params, model=model, mesh=mesh)
    out_n = sharded(img, denoise_rate=0.7, zero_mask=False)["hq"]

    assert out_n.shape == out_1.shape == img.shape
    diff = np.abs(out_1.astype(np.int16) - out_n.astype(np.int16))
    assert diff.max() <= 1  # fp reduction reordering at the rint boundary
    assert (diff == 0).mean() > 0.99
