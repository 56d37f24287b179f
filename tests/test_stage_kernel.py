"""Stage megakernel (N blocks, one pallas call) parity vs sequential XLA
TransformerBlocks — interpret mode on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rethink_acoustic_image_enhancement_tpu.models.blocks import TransformerBlock
from rethink_acoustic_image_enhancement_tpu.ops.pallas.stage import (
    fused_transformer_stage,
    stack_block_params,
)


def _blocks_and_params(c, n_blocks, seed=0):
    block = TransformerBlock(dim=c, num_heads=1, bias_free_ln=True)
    x0 = jnp.zeros((1, 16, 16, c))
    params = [block.init(jax.random.PRNGKey(seed + i), x0)["params"]
              for i in range(n_blocks)]
    return block, params


@pytest.mark.parametrize("hw,n_blocks", [((8, 8), 2), ((16, 24), 3)])
def test_stage_matches_sequential_xla_blocks(hw, n_blocks):
    c = 48
    block, params = _blocks_and_params(c, n_blocks)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, *hw, c)).astype(np.float32))

    ref = x
    for p in params:
        ref = block.apply({"params": p}, ref)

    stacked = stack_block_params(params)
    got = fused_transformer_stage(x, **stacked, interpret=True)

    assert got.shape == ref.shape
    scale = float(jnp.max(jnp.abs(ref)))
    err = float(jnp.max(jnp.abs(got - ref))) / scale
    assert err < 3e-2, err  # bf16 MXU noise compounds across blocks


def test_stage_single_block_equals_block_kernel():
    """n_blocks=1 must agree with the per-block megakernel."""
    from rethink_acoustic_image_enhancement_tpu.ops.pallas.block import (
        fused_transformer_block,
    )

    c = 96
    block, params = _blocks_and_params(c, 1, seed=3)
    p = params[0]
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(size=(1, 16, 16, c)).astype(np.float32))

    single = fused_transformer_block(
        x, p["norm1"]["weight"], None,
        p["attn"]["qkv"]["kernel"], p["attn"]["qkv_dwconv"]["kernel"],
        p["attn"]["temperature"], p["attn"]["project_out"]["kernel"],
        p["norm2"]["weight"], None,
        p["ffn"]["project_in"]["kernel"], p["ffn"]["dwconv"]["kernel"],
        p["ffn"]["project_out"]["kernel"], bias_free=True, interpret=True)
    staged = fused_transformer_stage(x, **stack_block_params(params),
                                     interpret=True)
    scale = float(jnp.max(jnp.abs(single))) + 1e-6
    assert float(jnp.max(jnp.abs(staged - single))) / scale < 1e-2


@pytest.mark.parametrize("num_heads", [2, 4])
def test_stage_multihead_parity(num_heads):
    """Multi-head stacks: block-masked softmax with per-block per-head
    temperatures must equal sequential XLA multi-head blocks."""
    c = 48
    n_blocks = 2
    block = TransformerBlock(dim=c, num_heads=num_heads, bias_free_ln=True)
    x0 = jnp.zeros((1, 16, 16, c))
    params = []
    for i in range(n_blocks):
        p = block.init(jax.random.PRNGKey(10 + i), x0)["params"]
        t = jnp.arange(1, num_heads + 1, dtype=jnp.float32
                       ).reshape(-1, 1, 1) * (i + 1)
        params.append({**p, "attn": {**p["attn"], "temperature": t}})

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(1, 16, 24, c)).astype(np.float32))
    ref = x
    for p in params:
        ref = block.apply({"params": p}, ref)
    got = fused_transformer_stage(x, **stack_block_params(params),
                                  interpret=True)
    scale = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(got - ref))) / scale < 3e-2


def test_stage_batched_matches_per_sample():
    """Batched stage (grid block-major, weights VMEM-resident across the
    sample batch — the tile-serving form) must equal running each sample
    through the sequential XLA blocks independently."""
    c = 48
    block, params = _blocks_and_params(c, 2, seed=7)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(3, 16, 24, c)).astype(np.float32))

    ref = x
    for p in params:
        ref = block.apply({"params": p}, ref)

    stacked = stack_block_params(params)
    got = fused_transformer_stage(x, **stacked, interpret=True)
    assert got.shape == ref.shape
    scale = float(jnp.max(jnp.abs(ref)))
    err = float(jnp.max(jnp.abs(got - ref))) / scale
    assert err < 3e-2, err

    # per-sample MDTA statistics: batched == each sample alone
    solo = jnp.concatenate([
        fused_transformer_stage(x[i:i + 1], **stacked, interpret=True)
        for i in range(3)])
    np.testing.assert_allclose(np.asarray(got), np.asarray(solo),
                               rtol=0, atol=1e-5)
