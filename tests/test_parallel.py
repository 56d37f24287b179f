"""Mesh/sharding tests: data-parallel consistency and the spatial (CP
analog) axis — XLA inserts halo exchanges for spatially-sharded convs."""

import numpy as np
import pytest

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


@pytest.mark.fast
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


def test_model_parallel_train_step_matches_data_parallel():
    """TP training (train.model_shard): params/opt-state/EMA shard over
    the 'model' axis, batches replicate across it — loss, grad norm and
    the updated params must match the pure-DP step.

    Uses the dwconv_shift=True model (what train.model_shard wires in):
    with plain grouped convs, XLA SPMD (jax 0.9) silently emits 4x-scaled
    kernel grads for a strategy-dependent subset of depthwise convs on any
    mesh with a 'model' axis (measured: the four indivisible-width GDFN
    dwconvs under the default specs; different — including divisible —
    ones under alternates). The shift-add depthwise form is elementwise
    ops whose grads partition exactly; this test is the regression guard."""
    from rethink_acoustic_image_enhancement_tpu.losses import build_loss
    from rethink_acoustic_image_enhancement_tpu.parallel.mesh import (
        MODEL_AXIS,
    )
    from rethink_acoustic_image_enhancement_tpu.train.schedules import (
        build_schedule,
    )
    from rethink_acoustic_image_enhancement_tpu.train.trainer import (
        Trainer,
        build_optimizer,
    )

    model, params = _tiny_teacher()
    model = model.clone(static="train", dwconv_shift=True)
    params = model.init(
        jax.random.PRNGKey(0),
        {"img": jnp.zeros((1, 16, 16, 3)),
         "denoise_rate": jnp.zeros((1, 16, 16, 1))})["params"]
    train_opt = {"optim_g": {"type": "AdamW", "lr": 3e-4,
                             "weight_decay": 1e-4, "betas": [0.9, 0.999]},
                 "use_grad_clip": True,
                 "scheduler": {"type": "CosineAnnealingRestartCyclicLR",
                               "periods": [100], "restart_weights": [1],
                               "eta_mins": [1e-6]}}
    schedule = build_schedule(3e-4, train_opt["scheduler"], warmup_iter=-1)

    def make_trainer(mesh):
        return Trainer(
            apply_fn=lambda p, lq: model.apply({"params": p}, lq),
            loss_fn=build_loss({"type": "L1LossSr", "loss_weight": 1,
                                "reduction": "mean"}),
            optimizer=build_optimizer(train_opt, schedule),
            schedule=schedule, mesh=mesh, ema_decay=0.999)

    rng = np.random.default_rng(7)
    lq = {"img": rng.uniform(size=(4, 16, 16, 3)).astype(np.float32),
          "denoise_rate": np.full((4, 16, 16, 1), 0.6, np.float32)}
    gt = {"hq": rng.uniform(size=(4, 16, 16, 3)).astype(np.float32),
          "sr": rng.uniform(size=(4, 32, 32, 3)).astype(np.float32)}

    results = {}
    for tag, mesh in (("dp", make_mesh(n_data=8)),
                      ("dp_tp", make_mesh(n_data=2, n_model=4))):
        tr = make_trainer(mesh)
        state = tr.init_state(jax.tree.map(np.copy, params))
        if tag == "dp_tp":
            k = state.params["patch_embed"]["proj"]["kernel"]
            assert MODEL_AXIS in tuple(k.sharding.spec), k.sharding
        hist = []
        for i in range(2):
            state, metrics = tr.step(state, lq, gt, jax.random.PRNGKey(i))
            hist.append((float(metrics["l_pix"]),
                         float(metrics["grad_norm"])))
        results[tag] = (hist, jax.device_get(state.params))

    (dp_hist, dp_params) = results["dp"]
    (tp_hist, tp_params) = results["dp_tp"]
    # Step 1 runs on identical params: loss is a pure forward reduction
    # and grad_norm the globally-psummed gradient — tight parity here
    # catches any real TP sharding-math bug (missing collective, wrong
    # channel split). Step 2 follows one AdamW update, whose g/|g|
    # normalization amplifies fp32 reduction-order noise, so it (and the
    # final params) only get sanity tolerances (|Δparam| per flipped-sign
    # noise-level grad is ≤ 2·lr per step).
    assert np.isclose(dp_hist[0][0], tp_hist[0][0], atol=1e-5)
    assert np.isclose(dp_hist[0][1], tp_hist[0][1], rtol=1e-4)
    assert np.isclose(dp_hist[1][0], tp_hist[1][0], atol=5e-4)
    assert np.isclose(dp_hist[1][1], tp_hist[1][1], rtol=5e-2)
    for a, b in zip(jax.tree.leaves(dp_params), jax.tree.leaves(tp_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


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
