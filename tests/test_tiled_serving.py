"""Tiled batched serving (TeacherPredictor.denoise_tiled).

The opt-in fast path for large frames: tile interiors + context halo,
batched across images, reassembled. Not bit-identical to whole-image
inference (per-tile MDTA statistics, truncated receptive fields past the
halo — see the method docstring and docs/perf_plan.md); these tests pin
the structural contract (shapes, determinism, small-image fallback,
batch-padding invariance, zero-mask, SR reassembly). The quality study
vs whole-image inference runs with TRAINED weights on-chip
(docs/perf_plan.md round 4). Serving contract reference:
KDLAE/KDLAE_T.ipynb cell 5.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from rethink_acoustic_image_enhancement_tpu.eval.infer import TeacherPredictor
from rethink_acoustic_image_enhancement_tpu.models import KDLAETeacher


@pytest.fixture(scope="module")
def predictor():
    import jax

    model = KDLAETeacher(dim=8, num_blocks=(1, 1, 1, 1),
                         num_refinement_blocks=1, heads=(1, 2, 4, 8),
                         layernorm_type="BiasFree", static="test",
                         params="cat")
    params = model.init(
        jax.random.PRNGKey(0),
        {"img": jnp.zeros((1, 16, 16, 3)),
         "denoise_rate": jnp.zeros((1, 16, 16, 1))})["params"]
    return TeacherPredictor(params=params, model=model, dtype=jnp.float32)


def test_tiled_shapes_and_dtype(predictor):
    rng = np.random.default_rng(0)
    imgs = [(rng.uniform(0, 1, (70, 90, 3)) * 255).astype(np.uint8),
            (rng.uniform(0, 1, (70, 90, 3)) * 255).astype(np.uint8)]
    outs = predictor.denoise_tiled(imgs, tile=32, halo=4, tile_batch=4,
                                   zero_mask=False)
    assert len(outs) == 2
    for im, out in zip(imgs, outs):
        assert out["hq"].shape == im.shape
        assert out["hq"].dtype == np.uint8


def test_tiled_deterministic(predictor):
    """Same inputs -> bit-identical outputs across calls (no hidden
    state; the jitted batch program is cached)."""
    rng = np.random.default_rng(1)
    im = (rng.uniform(0.2, 0.8, (64, 64, 3)) * 255).astype(np.uint8)
    a = predictor.denoise_tiled([im], tile=32, halo=8, tile_batch=4,
                                zero_mask=False)[0]["hq"]
    b = predictor.denoise_tiled([im], tile=32, halo=8, tile_batch=4,
                                zero_mask=False)[0]["hq"]
    np.testing.assert_array_equal(a, b)


def test_tiled_small_image_falls_back_to_whole(predictor):
    """Images where the grid pad + halo would exceed the image extent
    (reflect ill-defined) use the whole-image path — results must be
    IDENTICAL to __call__."""
    rng = np.random.default_rng(2)
    small = (rng.uniform(0, 1, (10, 70, 3)) * 255).astype(np.uint8)
    big = (rng.uniform(0, 1, (70, 70, 3)) * 255).astype(np.uint8)
    outs = predictor.denoise_tiled([small, big], tile=32, halo=4,
                                   tile_batch=4, zero_mask=False)
    ref = predictor(small, zero_mask=False)
    np.testing.assert_array_equal(outs[0]["hq"], ref["hq"])
    assert outs[1]["hq"].shape == big.shape


def test_tiled_partial_batch_padding_is_discarded(predictor):
    """A tile count that doesn't divide tile_batch pads the last dispatch;
    results must be independent of tile_batch."""
    rng = np.random.default_rng(3)
    im = (rng.uniform(0, 1, (64, 96, 3)) * 255).astype(np.uint8)  # 6 tiles
    a = predictor.denoise_tiled([im], tile=32, halo=4, tile_batch=4,
                                zero_mask=False)[0]["hq"]
    b = predictor.denoise_tiled([im], tile=32, halo=4, tile_batch=6,
                                zero_mask=False)[0]["hq"]
    # different batch shapes compile different XLA programs whose fusion
    # order can flip a borderline rounding — allow 1 uint8 level
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


def test_tiled_zero_mask_applies(predictor):
    im = (np.random.default_rng(4).uniform(0.3, 1, (64, 64, 3))
          * 255).astype(np.uint8)
    im[:8, :8] = 0  # fan-beam style zero border
    out = predictor.denoise_tiled([im], tile=32, halo=0)[0]["hq"]
    assert (out[:8, :8] == 0).all()


def test_tiled_bad_halo_rejected(predictor):
    with pytest.raises(ValueError, match="multiple"):
        predictor.denoise_tiled([np.zeros((64, 64, 3), np.uint8)],
                                tile=32, halo=3)


def test_tiled_sr_branch_reassembles_at_2x():
    import jax

    model = KDLAETeacher(dim=8, num_blocks=(1, 1, 1, 1),
                         num_refinement_blocks=1, heads=(1, 2, 4, 8),
                         layernorm_type="BiasFree", static="train",
                         params="cat")
    params = model.init(
        jax.random.PRNGKey(0),
        {"img": jnp.zeros((1, 16, 16, 3)),
         "denoise_rate": jnp.zeros((1, 16, 16, 1))})["params"]
    pred = TeacherPredictor(params=params, model=model, dtype=jnp.float32)
    im = (np.random.default_rng(5).uniform(0.2, 1, (64, 64, 3))
          * 255).astype(np.uint8)
    out = pred.denoise_tiled([im], tile=32, halo=4, zero_mask=False)[0]
    assert out["hq"].shape == (64, 64, 3)
    assert out["sr"].shape == (128, 128, 3)


def test_tiled_data_mesh_parity(predictor):
    """A 'data'-axis mesh shards the tile batch across devices; tiles are
    independent samples so the DP split reproduces the single-device
    tiled outputs to <=1 uint8 quantization level (the SPMD-partitioned
    program may fuse the output cast differently — same convention as
    the tensor-parallel serving parity in test_parallel.py)."""
    from rethink_acoustic_image_enhancement_tpu.parallel.mesh import (
        make_mesh,
    )

    rng = np.random.default_rng(11)
    imgs = [(rng.uniform(0, 1, (70, 90, 3)) * 255).astype(np.uint8),
            (rng.uniform(0, 1, (40, 40, 3)) * 255).astype(np.uint8),
            (rng.uniform(0, 1, (16, 16, 3)) * 255).astype(np.uint8)]
    # imgs[2] is smaller than a tile -> whole-image fallback under mesh;
    # the tile count (9+4=13) is not divisible by tile_batch=4 ->
    # exercises the padded last chunk under sharding too
    single = predictor.denoise_tiled(imgs, tile=32, halo=0, tile_batch=4)
    meshed = TeacherPredictor(params=predictor.params,
                              model=predictor.model, dtype=jnp.float32,
                              mesh=make_mesh(n_data=4))
    sharded = meshed.denoise_tiled(imgs, tile=32, halo=0, tile_batch=4)
    for a, b in zip(single, sharded):
        diff = np.abs(a["hq"].astype(np.int16) - b["hq"].astype(np.int16))
        assert diff.max() <= 1
        assert (diff > 0).mean() < 1e-3


def test_tiled_mesh_validation(predictor):
    from rethink_acoustic_image_enhancement_tpu.parallel.mesh import (
        make_mesh,
    )

    im = (np.random.default_rng(0).uniform(0, 1, (70, 90, 3))
          * 255).astype(np.uint8)
    spatial = TeacherPredictor(params=predictor.params,
                               model=predictor.model, dtype=jnp.float32,
                               mesh=make_mesh(n_data=2, n_spatial=2))
    with pytest.raises(ValueError, match="data"):
        spatial.denoise_tiled([im], tile=32, halo=0)
    data = TeacherPredictor(params=predictor.params,
                            model=predictor.model, dtype=jnp.float32,
                            mesh=make_mesh(n_data=4))
    with pytest.raises(ValueError, match="divisible"):
        data.denoise_tiled([im], tile=32, halo=0, tile_batch=6)


def test_tiled_strip_mode_rect_tile_and_halo(predictor):
    """Rectangular tiles + per-axis halo (strip serving): a (32, 96)
    full-width strip grid with halo (8, 0) reassembles to the input
    shape, and reassembly geometry is exact — a strip whose interiors
    are stitched back must equal the square-tile stitching of the SAME
    forward outputs wherever the grids coincide (here: identical strip
    rows = one grid row each)."""
    rng = np.random.default_rng(21)
    im = (rng.uniform(0.1, 0.9, (64, 96, 3)) * 255).astype(np.uint8)
    out = predictor.denoise_tiled([im], tile=(32, 96), halo=(8, 0),
                                  tile_batch=2, zero_mask=False)[0]
    assert out["hq"].shape == im.shape
    assert out["sr"].shape == (128, 192, 3) if "sr" in out else True

    # strip grid with halo 0 equals per-strip whole-image forwards
    strips = predictor.denoise_tiled([im], tile=(32, 96), halo=(0, 0),
                                     tile_batch=2, zero_mask=False)[0]["hq"]
    per_strip = [predictor(im[i * 32:(i + 1) * 32], zero_mask=False)["hq"]
                 for i in range(2)]
    whole = np.concatenate(per_strip, axis=0)
    diff = np.abs(strips.astype(np.int16) - whole.astype(np.int16))
    # same math, different batch shapes -> allow 1 uint8 level
    assert diff.max() <= 1


def test_tiled_rect_validation(predictor):
    with pytest.raises(ValueError, match="multiple"):
        predictor.denoise_tiled([np.zeros((64, 96, 3), np.uint8)],
                                tile=(32, 96), halo=(3, 0))
    with pytest.raises(ValueError, match="multiple"):
        predictor.denoise_tiled([np.zeros((64, 96, 3), np.uint8)],
                                tile=(30, 96), halo=0)


def test_tile_spec_cli_parser():
    from rethink_acoustic_image_enhancement_tpu.cli import _tile_spec

    assert _tile_spec("256") == 256
    assert _tile_spec("256x512") == (256, 512)
    assert _tile_spec("8x0") == (8, 0)


def test_tiled_1024_bucket_semantics(predictor):
    """Second static-shape bucket (VERDICT r4 item 10): a 1024-class
    input exercises grid tiling, strip mode, and the fan-beam zero-mask
    end-to-end at a shape well past the 512 bench bucket (scaled to
    256px with the tiny test model = same grid arithmetic: 8x8 grid of
    32px tiles / 8 full-width strips)."""
    rng = np.random.default_rng(30)
    im = (rng.uniform(0.2, 1, (256, 256, 3)) * 255).astype(np.uint8)
    im[:, :16] = 0  # fan-beam style zero border
    sq = predictor.denoise_tiled([im], tile=32, halo=0, tile_batch=8)[0]
    st = predictor.denoise_tiled([im], tile=(32, 256), halo=(0, 0),
                                 tile_batch=8)[0]
    assert sq["hq"].shape == im.shape and st["hq"].shape == im.shape
    assert (sq["hq"][:, :16] == 0).all() and (st["hq"][:, :16] == 0).all()
    # the first strip IS the first grid row's worth of pixels: strip mode
    # and square mode agree exactly on tiles interior to the same strip?
    # no — different attention extents; assert both stay plausible images
    for out in (sq, st):
        assert out["hq"][:, 16:].mean() > 1
