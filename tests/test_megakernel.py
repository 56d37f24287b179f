"""Whole-block megakernel parity vs the XLA TransformerBlock (interpret
mode on CPU; the round-2 performance vehicle, docs/perf_plan.md)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rethink_acoustic_image_enhancement_tpu.models.blocks import TransformerBlock
from rethink_acoustic_image_enhancement_tpu.ops.pallas.block import (
    fused_transformer_block,
)


def _block_and_params(c, seed=0, num_heads=1, bias_free=True):
    block = TransformerBlock(dim=c, num_heads=num_heads,
                             bias_free_ln=bias_free)
    x0 = jnp.zeros((1, 16, 16, c))
    params = block.init(jax.random.PRNGKey(seed), x0)["params"]
    return block, params


def _run_fused(params, x, num_heads=1, bias_free=True):
    p = params
    return fused_transformer_block(
        x,
        p["norm1"]["weight"], p["norm1"].get("bias"),
        p["attn"]["qkv"]["kernel"], p["attn"]["qkv_dwconv"]["kernel"],
        p["attn"]["temperature"], p["attn"]["project_out"]["kernel"],
        p["norm2"]["weight"], p["norm2"].get("bias"),
        p["ffn"]["project_in"]["kernel"], p["ffn"]["dwconv"]["kernel"],
        p["ffn"]["project_out"]["kernel"],
        bias_free=bias_free, num_heads=num_heads, interpret=True)


@pytest.mark.parametrize("hw", [(8, 8), (16, 24)])  # single- and multi-tile
def test_megakernel_matches_xla_block(hw):
    c = 48
    block, params = _block_and_params(c)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, *hw, c)).astype(np.float32))

    ref = block.apply({"params": params}, x)
    got = _run_fused(params, x)

    assert got.shape == ref.shape
    scale = float(jnp.max(jnp.abs(ref)))
    err = float(jnp.max(jnp.abs(got - ref))) / scale
    # bf16 MXU internals; interior must agree tightly
    assert err < 2e-2, err
    # tile seams must be exact-at-bf16: compare a seam column when multi-tile
    if hw == (16, 24):
        seam = np.asarray(jnp.abs(got[:, :, 7:9, :] - ref[:, :, 7:9, :]))
        assert seam.max() / scale < 2e-2


def test_megakernel_matches_on_sonar_like_data():
    """[0,1]-ranged data (the serving regime), c=96 like the hot blocks."""
    c = 96
    block, params = _block_and_params(c, seed=1)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(size=(1, 16, 16, c)).astype(np.float32))
    ref = block.apply({"params": params}, x)
    got = _run_fused(params, x)
    scale = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(got - ref))) / scale < 2e-2


@pytest.mark.parametrize("num_heads", [2, 4, 8])
def test_megakernel_multihead_parity(num_heads):
    """heads > 1: block-masked softmax over the full Gram must equal the
    XLA multi-head MDTA block exactly (per-head Grams are the diagonal
    blocks; per-head temperature rides the key lanes)."""
    c = 48
    block, params = _block_and_params(c, seed=2, num_heads=num_heads)
    # distinct per-head temperatures so a head-mixing bug cannot cancel
    t = jnp.arange(1, num_heads + 1, dtype=jnp.float32).reshape(-1, 1, 1)
    params = {**params, "attn": {**params["attn"], "temperature": t}}
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 16, 24, c)).astype(np.float32))
    ref = block.apply({"params": params}, x)
    got = _run_fused(params, x, num_heads=num_heads)
    scale = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(got - ref))) / scale < 2e-2


def test_megakernel_withbias_layernorm_parity():
    """WithBias channel-LN (the Restormer baseline default): mean-centered
    LN with a learned bias inside the kernel must match the XLA block."""
    c = 48
    block, params = _block_and_params(c, seed=4, bias_free=False)
    # non-zero LN biases so the WithBias path is actually exercised
    params = {**params,
              "norm1": {**params["norm1"],
                        "bias": jnp.linspace(-0.2, 0.2, c)},
              "norm2": {**params["norm2"],
                        "bias": jnp.linspace(0.1, -0.1, c)}}
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(1, 16, 24, c)).astype(np.float32))
    ref = block.apply({"params": params}, x)
    got = _run_fused(params, x, bias_free=False)
    scale = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(got - ref))) / scale < 2e-2
