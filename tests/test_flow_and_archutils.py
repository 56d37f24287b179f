"""flow_warp vs torch grid_sample oracle; .flo round trip; arch utils."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rethink_acoustic_image_enhancement_tpu.models.arch_utils import (
    ResidualBlockNoBN,
    make_layer,
)
from rethink_acoustic_image_enhancement_tpu.ops.warp import flow_warp
from rethink_acoustic_image_enhancement_tpu.utils.flow import (
    dequantize_flow,
    flowread,
    flowwrite,
    quantize_flow,
)


def test_flow_warp_matches_torch_grid_sample():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    b, h, w, c = 2, 10, 12, 3
    x = rng.random((b, h, w, c)).astype(np.float32)
    flow = (rng.random((b, h, w, 2)) * 4 - 2).astype(np.float32)

    # torch oracle: grid_sample with align_corners=True, zeros padding
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    gy, gx = torch.meshgrid(torch.arange(h, dtype=torch.float32),
                            torch.arange(w, dtype=torch.float32),
                            indexing="ij")
    fx = gx[None] + torch.from_numpy(flow[..., 0])
    fy = gy[None] + torch.from_numpy(flow[..., 1])
    gxn = 2.0 * fx / max(w - 1, 1) - 1.0
    gyn = 2.0 * fy / max(h - 1, 1) - 1.0
    grid = torch.stack((gxn, gyn), dim=-1)
    expected = torch.nn.functional.grid_sample(
        xt, grid, mode="bilinear", padding_mode="zeros",
        align_corners=True).numpy().transpose(0, 2, 3, 1)

    got = np.asarray(flow_warp(jnp.asarray(x), jnp.asarray(flow)))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


def test_flo_roundtrip(tmp_path):
    flow = np.random.default_rng(1).normal(size=(6, 8, 2)).astype(np.float32)
    path = str(tmp_path / "a.flo")
    flowwrite(flow, path)
    np.testing.assert_array_equal(flowread(path), flow)


def test_flow_quantize_roundtrip():
    flow = np.random.default_rng(2).uniform(-5, 5, (8, 10, 2)).astype(np.float32)
    dx, dy = quantize_flow(flow, max_val=0.02, norm=True)
    assert dx.dtype == np.uint8
    back = dequantize_flow(dx, dy, max_val=0.02, denorm=True)
    # quantization to 255 levels of +-0.02*size: coarse but bounded error
    assert np.abs(back - np.clip(flow, -0.02 * 10, 0.02 * 10)).max() < 0.3


def test_residual_block_and_make_layer():
    x = jnp.asarray(np.random.default_rng(3).random((1, 8, 8, 16)),
                    jnp.float32)
    stack = make_layer(ResidualBlockNoBN, 3, num_feat=16)
    params = stack.init(jax.random.PRNGKey(0), x)["params"]
    assert set(params) == {"0", "1", "2"}
    out = stack.apply({"params": params}, x)
    assert out.shape == x.shape
