"""Pallas TPU stage megakernel: N consecutive TransformerBlocks, one call.

The round-2 performance vehicle (docs/perf_plan.md): the per-block
megakernel (ops/pallas/block.py) wins standalone but loses in-model to
XLA layout transitions at every kernel boundary. This kernel runs a whole
STACK of blocks (e.g. the teacher's hot tail: 12 consecutive blocks at
512^2 x 96) inside one pallas_call, so the layout transition happens once
on entry and once on exit:

  grid (block, phase, tile), strictly sequential on TPU.
  feature maps ping-pong through two HBM buffers with a zeroed border
  frame (jnp.zeros inputs aliased to outputs via input_output_aliases);
  block b reads  b == 0 -> x buffer, b odd -> buf A, b even>0 -> buf B
          writes b even -> buf A,  b odd -> buf B
  per-block weights carry a leading n_blocks dim and stream through
  BlockSpec index maps; Gram/norm scratch resets at (phase 0, tile 0).

Geometry: all three HBM buffers are (1, H+16, W+16, c_pad) with the image
interior at offset 8 (Mosaic constraint, probed on-chip: DMA offsets AND
sizes on the sublane axis must be 8-aligned). Halo reads fetch an aligned
(th+16, tw+16) window at (i*th, j*tw) and slice [6 : th+10) in VMEM
(unaligned VALUE slices are legal). Tile writes land at 8+i*th (aligned).

Block math is identical to ops/pallas/block.py (exact parity vs the XLA
TransformerBlock, including tile seams and the torch zero-padded GDFN
border). Scope: batch 1, any head count dividing C (multi-head =
block-masked softmax over the full Gram, see block.py), BiasFree LN,
bias-free convs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .block import _layernorm
from .gdfn import _erf_approx, _pick_tiles

_L2_EPS = 1e-12


def _kernel(x_hbm, ln1_w, w_qkv, dw_qkv, temp, w_proj,
            ln2_w, w_in, w_dw, w_out, zeros_a, zeros_b,
            buf_a, buf_b,
            win, tile_out, gram, qn, kn, sem_in, sem_out,
            *, th, tw, c, c_pad, f_pad, ln_eps, n_blocks, n_tiles, n_j,
            n_heads=1):
    del zeros_a, zeros_b  # aliased to buf_a/buf_b (same storage)
    # grid (block, sample, phase, tile): block OUTERMOST keeps each
    # block's weights VMEM-resident across the whole sample batch (the
    # BlockSpec index maps depend only on the block id, so Mosaic skips
    # the weight re-copy for every inner step) — with batch 8 tiles per
    # dispatch that is 8x less weight streaming AND one kernel-boundary
    # layout transition per dispatch instead of per sample.
    blk = pl.program_id(0)
    smp = pl.program_id(1)
    phase = pl.program_id(2)
    tile = pl.program_id(3)
    ti = tile // n_j
    tj = jax.lax.rem(tile, n_j)

    # ---- fetch the aligned (th+16, tw+16) window from this block's source
    def fetch(src):
        return pltpu.make_async_copy(
            src.at[smp, pl.ds(ti * th, th + 16), pl.ds(tj * tw, tw + 16), :],
            win, sem_in)

    @pl.when(blk == 0)
    def _():
        cp = fetch(x_hbm)
        cp.start()
        cp.wait()

    @pl.when((blk > 0) & (jax.lax.rem(blk, 2) == 1))
    def _():
        cp = fetch(buf_a)
        cp.start()
        cp.wait()

    @pl.when((blk > 0) & (jax.lax.rem(blk, 2) == 0))
    def _():
        cp = fetch(buf_b)
        cp.start()
        cp.wait()

    # halo'd working window: rows [6, th+10) of the fetch = unpadded
    # [i*th-2, i*th+th+6), matching block.py's (th+8, tw+8) geometry
    x = win[6:th + 14, 6:tw + 14, :].astype(jnp.float32)

    @pl.when((phase == 0) & (tile == 0))
    def _():
        gram[...] = jnp.zeros_like(gram)
        qn[...] = jnp.zeros_like(qn)
        kn[...] = jnp.zeros_like(kn)

    # ---- LN1 + packed qkv + depthwise (identical math to block.py)
    xn = _layernorm(x, ln1_w[0, 0].astype(jnp.float32), None, c, ln_eps, True)
    t = jax.lax.dot_general(
        xn.reshape((th + 8) * (tw + 8), c_pad).astype(jnp.bfloat16),
        w_qkv[0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16).reshape(th + 8, tw + 8, 3 * c_pad)

    dwq = dw_qkv[0].astype(jnp.float32)
    acc = jnp.zeros((th + 2, tw + 2, 3 * c_pad), jnp.float32)
    for di in range(3):
        for dj in range(3):
            acc = acc + (t[di:di + th + 2, dj:dj + tw + 2, :]
                         * dwq[di, dj, :])
    q = acc[..., :c_pad]
    k = acc[..., c_pad:2 * c_pad]
    v = acc[..., 2 * c_pad:]

    @pl.when(phase == 0)
    def _():
        qf = q[1:th + 1, 1:tw + 1, :].reshape(th * tw, c_pad)
        kf = k[1:th + 1, 1:tw + 1, :].reshape(th * tw, c_pad)
        gram[...] += jax.lax.dot_general(
            qf.astype(jnp.bfloat16), kf.astype(jnp.bfloat16),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        qn[...] += jnp.sum(jnp.square(qf), axis=0, keepdims=True)
        kn[...] += jnp.sum(jnp.square(kf), axis=0, keepdims=True)

    @pl.when(phase == 1)
    def _():
        qnorm = jnp.maximum(jnp.sqrt(qn[...]), _L2_EPS)
        knorm = jnp.maximum(jnp.sqrt(kn[...]), _L2_EPS)
        logits = gram[...] / qnorm.reshape(c_pad, 1) / knorm.reshape(1, c_pad)
        # per-head temperature rides the key lanes (exact within same-head
        # blocks; cross-head entries are masked below — see block.py)
        logits = logits * temp[0]
        row = jax.lax.broadcasted_iota(jnp.int32, (c_pad, c_pad), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (c_pad, c_pad), 1)
        hc = c // n_heads
        same_head = row < 0
        for hh in range(n_heads):
            lo, hi = hh * hc, (hh + 1) * hc
            same_head = same_head | ((row >= lo) & (row < hi)
                                     & (lane >= lo) & (lane < hi))
        logits = jnp.where(same_head & (lane < c), logits, -1e30)
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        attn = e / jnp.sum(e, axis=-1, keepdims=True)

        vf = v.reshape((th + 2) * (tw + 2), c_pad)
        out_attn = jax.lax.dot_general(
            vf.astype(jnp.bfloat16), attn.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        proj = jax.lax.dot_general(
            out_attn.astype(jnp.bfloat16), w_proj[0],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(th + 2, tw + 2, c_pad)

        r = x[1:th + 3, 1:tw + 3, :] + proj

        rn = _layernorm(r, ln2_w[0, 0].astype(jnp.float32), None, c, ln_eps, True)
        # zero the outside-image ring (torch zero-pads the GDFN dwconv
        # input); interior tile seams keep their true halo
        row_ids = (jax.lax.broadcasted_iota(jnp.int32, (th + 2, tw + 2), 0)
                   + ti * th - 1)
        col_ids = (jax.lax.broadcasted_iota(jnp.int32, (th + 2, tw + 2), 1)
                   + tj * tw - 1)
        n_i = n_tiles // n_j
        inside = ((row_ids >= 0) & (row_ids < n_i * th)
                  & (col_ids >= 0) & (col_ids < n_j * tw))
        rn = rn * inside.astype(jnp.float32)[..., None]
        t2 = jax.lax.dot_general(
            rn.reshape((th + 2) * (tw + 2), c_pad).astype(jnp.bfloat16),
            w_in[0],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16).reshape(th + 2, tw + 2, 2 * f_pad)
        acc2 = jnp.zeros((th, tw, 2 * f_pad), jnp.float32)
        dwf = w_dw[0].astype(jnp.float32)
        for di in range(3):
            for dj in range(3):
                acc2 = acc2 + t2[di:di + th, dj:dj + tw, :] * dwf[di, dj, :]
        x1 = acc2[..., :f_pad]
        x2 = acc2[..., f_pad:]
        g = 0.5 * x1 * (1.0 + _erf_approx(x1 * (2.0 ** -0.5))) * x2
        out = jax.lax.dot_general(
            g.reshape(th * tw, f_pad).astype(jnp.bfloat16), w_out[0],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(th, tw, c_pad)
        tile_out[...] = (out + r[1:th + 1, 1:tw + 1, :]).astype(tile_out.dtype)

        # write the tile into this block's destination buffer (interior
        # offset 8: 8 + i*th is sublane-aligned)
        def put(dst):
            return pltpu.make_async_copy(
                tile_out,
                dst.at[smp, pl.ds(8 + ti * th, th),
                       pl.ds(8 + tj * tw, tw), :],
                sem_out)

        @pl.when(jax.lax.rem(blk, 2) == 0)
        def _():
            cp = put(buf_a)
            cp.start()
            cp.wait()

        @pl.when(jax.lax.rem(blk, 2) == 1)
        def _():
            cp = put(buf_b)
            cp.start()
            cp.wait()


def stage_worthwhile(batch: int, h: int, w: int, c: int, num_heads: int,
                     bias_free: bool, use_bias: bool,
                     expansion: float = 2.66) -> bool:
    """Stage-kernel gate: heads dividing C (block-masked softmax, same as
    block.py) but still BiasFree LN only (no LN-bias plumbing here), on
    top of the shared tiling/size policy. Unlike the per-block kernel,
    ANY batch size is in scope (the batched grid keeps per-block weights
    VMEM-resident across samples — the round-5 tile-serving form)."""
    from .block import mega_worthwhile

    if not bias_free:
        return False
    return mega_worthwhile(1, h, w, c, num_heads, bias_free, use_bias,
                           expansion) and batch >= 1


@functools.partial(jax.jit, static_argnames=("ln_eps", "interpret"))
def fused_transformer_stage(
    x,
    ln1_w, w_qkv, dw_qkv, temperature, w_proj, ln2_w, w_in, w_dw, w_out,
    ln_eps: float = 1e-5,
    interpret: bool | None = None,
):
    """Run n_blocks TransformerBlocks (any batch, any head count dividing
    C, BiasFree) in one pallas call; the head count is read off the
    temperature's second dim. Samples are independent (per-sample MDTA
    statistics, exactly like the sequential blocks); the grid iterates
    block-major so each block's weights load into VMEM ONCE per call and
    serve every sample/tile (see _kernel). Every weight arg is STACKED
    with a leading n_blocks dim, in the flax kernel layouts:
      ln1_w/ln2_w (N, C); w_qkv (N, 1, 1, C, 3C); dw_qkv (N, 3, 3, 1, 3C);
      temperature (N, heads, 1, 1) or (N, 1); w_proj (N, 1, 1, C, C);
      w_in (N, 1, 1, C, 2F); w_dw (N, 3, 3, 1, 2F); w_out (N, 1, 1, F, C).
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    bsz, h, w, c = x.shape
    n_blocks = ln1_w.shape[0]
    w_qkv = w_qkv.reshape(n_blocks, c, 3 * c)
    dw_qkv = dw_qkv.reshape(n_blocks, 3, 3, 3 * c)
    w_proj = w_proj.reshape(n_blocks, c, c)
    w_in = w_in.reshape(n_blocks, c, -1)
    two_f = w_in.shape[2]
    f = two_f // 2
    w_dw = w_dw.reshape(n_blocks, 3, 3, two_f)
    w_out = w_out.reshape(n_blocks, f, c)
    tvec = jnp.asarray(temperature, jnp.float32).reshape(n_blocks, -1)
    n_heads = tvec.shape[1]
    assert c % n_heads == 0, (c, n_heads)

    c_pad = -(-c // 128) * 128
    f_pad = -(-f // 128) * 128
    tiles = _pick_tiles(h, w, c_pad, max(f_pad, 2 * c_pad))
    if tiles is None:
        raise ValueError(f"no tiling for {h}x{w}x{c}")
    th, tw = tiles
    n_i, n_j = h // th, w // tw
    n_tiles = n_i * n_j

    # interior at offset 8; borders zero (halo reads outside the image)
    x_padded = jnp.pad(x, ((0, 0), (8, 8), (8, 8), (0, c_pad - c)))
    zeros_a = jnp.zeros((bsz, h + 16, w + 16, c_pad), x.dtype)
    zeros_b = jnp.zeros((bsz, h + 16, w + 16, c_pad), x.dtype)

    def pad_lane2(v, n):
        return jnp.pad(v, ((0, 0), (0, n - v.shape[1])))

    # pack q/k/v halves at c_pad-aligned offsets, per block
    w_qkv_p = jnp.zeros((n_blocks, c_pad, 3 * c_pad), jnp.bfloat16)
    dw_qkv_p = jnp.zeros((n_blocks, 3, 3, 3 * c_pad), jnp.float32)
    for part in range(3):
        w_qkv_p = w_qkv_p.at[:, :c, part * c_pad:part * c_pad + c].set(
            w_qkv[:, :, part * c:(part + 1) * c].astype(jnp.bfloat16))
        dw_qkv_p = dw_qkv_p.at[:, :, :, part * c_pad:part * c_pad + c].set(
            dw_qkv[:, :, :, part * c:(part + 1) * c])
    w_proj_p = jnp.zeros((n_blocks, c_pad, c_pad), jnp.bfloat16)
    w_proj_p = w_proj_p.at[:, :c, :c].set(w_proj.astype(jnp.bfloat16))
    w_in_p = jnp.zeros((n_blocks, c_pad, 2 * f_pad), jnp.bfloat16)
    w_in_p = w_in_p.at[:, :c, :f].set(w_in[:, :, :f].astype(jnp.bfloat16))
    w_in_p = w_in_p.at[:, :c, f_pad:f_pad + f].set(
        w_in[:, :, f:].astype(jnp.bfloat16))
    w_dw_p = jnp.zeros((n_blocks, 3, 3, 2 * f_pad), jnp.float32)
    w_dw_p = w_dw_p.at[:, :, :, :f].set(w_dw[:, :, :, :f])
    w_dw_p = w_dw_p.at[:, :, :, f_pad:f_pad + f].set(w_dw[:, :, :, f:])
    w_out_p = jnp.zeros((n_blocks, f_pad, c_pad), jnp.bfloat16)
    w_out_p = w_out_p.at[:, :f, :c].set(w_out.astype(jnp.bfloat16))
    # 1-D per-block vectors need a unit sublane dim so the (1, 1, c_pad)
    # block shape satisfies Mosaic's last-two-dims rule
    ln1_w_p = pad_lane2(ln1_w, c_pad).reshape(n_blocks, 1, c_pad)
    ln2_w_p = pad_lane2(ln2_w, c_pad).reshape(n_blocks, 1, c_pad)
    # per-block, per-LANE temperature: temp[b, head(lane)] (see kernel)
    lane_heads = jnp.arange(c) // (c // n_heads)
    temp = jnp.zeros((n_blocks, 1, c_pad), jnp.float32).at[:, 0, :c].set(
        tvec[:, lane_heads])

    def wspec(*shape):
        # index depends ONLY on the block id: inner (sample, phase, tile)
        # steps revisit the same weight block -> VMEM-resident
        return pl.BlockSpec((1, *shape),
                            lambda blk, s, p, t: (blk,)
                            + tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    kern = functools.partial(
        _kernel, th=th, tw=tw, c=c, c_pad=c_pad, f_pad=f_pad,
        ln_eps=ln_eps, n_blocks=n_blocks, n_tiles=n_tiles, n_j=n_j,
        n_heads=n_heads)
    buf_a, buf_b = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((bsz, h + 16, w + 16, c_pad),
                                        x.dtype),
                   jax.ShapeDtypeStruct((bsz, h + 16, w + 16, c_pad),
                                        x.dtype)),
        grid=(n_blocks, bsz, 2, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x
            wspec(1, c_pad),                     # ln1_w
            wspec(c_pad, 3 * c_pad),             # w_qkv
            wspec(3, 3, 3 * c_pad),              # dw_qkv
            wspec(1, c_pad),                     # temperature (per lane)
            wspec(c_pad, c_pad),                 # w_proj
            wspec(1, c_pad),                     # ln2_w
            wspec(c_pad, 2 * f_pad),             # w_in
            wspec(3, 3, 2 * f_pad),              # w_dw
            wspec(f_pad, c_pad),                 # w_out
            pl.BlockSpec(memory_space=pl.ANY),   # zeros_a -> buf_a
            pl.BlockSpec(memory_space=pl.ANY),   # zeros_b -> buf_b
        ],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)),
        input_output_aliases={10: 0, 11: 1},
        scratch_shapes=[
            pltpu.VMEM((th + 16, tw + 16, c_pad), x.dtype),  # fetch window
            pltpu.VMEM((th, tw, c_pad), x.dtype),            # tile out
            pltpu.VMEM((c_pad, c_pad), jnp.float32),         # gram
            pltpu.VMEM((1, c_pad), jnp.float32),             # q norms^2
            pltpu.VMEM((1, c_pad), jnp.float32),             # k norms^2
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x_padded, ln1_w_p, w_qkv_p, dw_qkv_p, temp, w_proj_p,
      ln2_w_p, w_in_p, w_dw_p, w_out_p, zeros_a, zeros_b)

    result = buf_a if n_blocks % 2 == 1 else buf_b
    return result[:, 8:8 + h, 8:8 + w, :c]


def stack_block_params(params_list):
    """Stack a list of TransformerBlock param trees (norm1/attn/norm2/ffn)
    into the stage kernel's stacked-weight arguments (traceable: usable
    inside jit/flax apply)."""

    def stk(path):
        vals = []
        for p in params_list:
            node = p
            for key in path:
                node = node[key]
            vals.append(jnp.asarray(node))
        return jnp.stack(vals)

    return dict(
        ln1_w=stk(("norm1", "weight")),
        w_qkv=stk(("attn", "qkv", "kernel")),
        dw_qkv=stk(("attn", "qkv_dwconv", "kernel")),
        temperature=stk(("attn", "temperature")),
        w_proj=stk(("attn", "project_out", "kernel")),
        ln2_w=stk(("norm2", "weight")),
        w_in=stk(("ffn", "project_in", "kernel")),
        w_dw=stk(("ffn", "dwconv", "kernel")),
        w_out=stk(("ffn", "project_out", "kernel")),
    )
