"""Pallas TPU megakernel: one whole TransformerBlock, HBM-minimal, exact.

Computes y = Block(x) = r + GDFN(LN2(r)), r = x + W_p @ MDTA(LN1(x))
entirely in one kernel. MDTA's channel attention needs GLOBAL pixel
reductions (q/k L2 norms + the c x c Gram matrix contracted over every
pixel), so the kernel runs a two-phase sequential grid (TPU grid steps
share scratch):

  phase 0 (per tile): LN1 -> packed qkv 1x1 -> depthwise 3x3, then
           accumulate raw Gram[c,d] += sum_p q_p,c k_p,d and the squared
           norms over the tile's TRUE pixels (each pixel exactly once).
  phase 1 (per tile): recompute the tile's qkv on a 1-pixel-halo'd
           region (recompute is cheaper than an HBM round-trip),
           normalize the Gram by the accumulated norms (identical to
           normalize-then-contract), mask padded lanes, softmax *
           temperature, attn @ v, project_out + residual -> r on the
           halo'd region, then LN2 -> GDFN (depthwise over the REAL halo,
           so tile seams are exact) -> residual, write the tile.

Index map (per tile, rows; columns identical): x is pre-padded by (2, 6)
so window row w = unpadded row i*th + w - 2. The window is (th+8, tw+8):
  - t (LN1+expand) on the full window            -> rows [0, th+8)
  - qkv (dwconv-valid, 1-halo'd region)          -> unpadded [i*th-1, i*th+th+1) = window rows [1, th+3)
  - Gram/norm accumulation (true pixels only)    -> qkv local rows [1, th+1)
  - r (attention residual) on the halo'd region  -> same rows as qkv
  - final GDFN dwconv valid output               -> the (th, tw) tile

x is read twice and y written once: ~150 MB/block at 512^2 x 96ch vs the
XLA path's ~1+ GB. Scope (asserted): batch 1; any head count dividing C
(multi-head MDTA's per-head Grams are the diagonal blocks of the full
C x C Gram, so heads reduce to a block-masked softmax over the same
accumulators — covers the teacher's encoder/decoder levels 2-4 too).
Everything else falls back to the XLA composition.

Status: correctness vehicle for docs/perf_plan.md strategy 1 (round 2
performance work); parity-tested against the XLA TransformerBlock.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gdfn import _erf_approx, _pick_tiles

_L2_EPS = 1e-12  # torch F.normalize eps (KDLAE_model.py:134-135)


def mega_worthwhile(batch: int, h: int, w: int, c: int, num_heads: int,
                    bias_free: bool, use_bias: bool,
                    expansion: float = 2.66) -> bool:
    """Kernel scope + measured-win policy: batch 1, heads dividing C
    (multi-head is exact via block-masked softmax), either LayerNorm
    variant, bias-free convs, large spatial extent, low channel padding.
    Measured on v5e at 512^2 x 96: 5.77 vs 6.97 ms/block inside an
    8-block stack (2.1x standalone)."""
    del bias_free  # both LN variants supported (parity-tested)
    if batch != 1 or c % num_heads != 0 or use_bias:
        return False
    c_pad = -(-c // 128) * 128
    f_pad = -(-int(c * expansion) // 128) * 128
    if _pick_tiles(h, w, c_pad, max(f_pad, 2 * c_pad)) is None:
        return False
    return h * w >= 256 * 256 and (c_pad / c) <= 1.5


def _layernorm(x, w, b, c, eps, bias_free):
    mean = jnp.sum(x, axis=-1, keepdims=True) / c
    var = jnp.sum(jnp.square(x), axis=-1, keepdims=True) / c - jnp.square(mean)
    inv = jax.lax.rsqrt(var + eps)
    if bias_free:
        return x * inv * w
    return (x - mean) * inv * w + b


def _kernel(x_hbm, ln1_w, ln1_b, w_qkv, dw_qkv, temp, w_proj,
            ln2_w, ln2_b, w_in, w_dw, w_out,
            o_ref,
            x_vmem, gram, qn, kn, sem,
            *, th, tw, c, c_pad, f_pad, bias_free, ln_eps, n_tiles, n_j,
            n_heads=1, debug_stage=None):
    phase = pl.program_id(0)
    tile = pl.program_id(1)

    step = phase * n_tiles + tile
    slot = jax.lax.rem(step, 2)
    next_slot = jax.lax.rem(step + 1, 2)

    def dma(tt, s):
        ii = tt // n_j
        jj = jax.lax.rem(tt, n_j)
        return pltpu.make_async_copy(
            x_hbm.at[0, pl.ds(ii * th, th + 8), pl.ds(jj * tw, tw + 8), :],
            x_vmem.at[s], sem.at[s])

    @pl.when(step == 0)
    def _():
        dma(tile, slot).start()
        gram[...] = jnp.zeros_like(gram)
        qn[...] = jnp.zeros_like(qn)
        kn[...] = jnp.zeros_like(kn)

    next_tile = jax.lax.rem(tile + 1, n_tiles)

    @pl.when(step + 1 < 2 * n_tiles)
    def _():
        dma(next_tile, next_slot).start()

    dma(tile, slot).wait()
    x = x_vmem[slot].astype(jnp.float32)  # (th+8, tw+8, c_pad)

    # LN1 + packed qkv expand on the full aligned window
    xn = _layernorm(x, ln1_w[:].astype(jnp.float32),
                    ln1_b[:].astype(jnp.float32), c, ln_eps, bias_free)
    t = jax.lax.dot_general(
        xn.reshape((th + 8) * (tw + 8), c_pad).astype(jnp.bfloat16),
        w_qkv[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16).reshape(th + 8, tw + 8, 3 * c_pad)

    # depthwise 3x3, valid outputs on the halo'd region (window rows
    # [1, th+3)): shift windows t[di : di+th+2]
    dwq = dw_qkv[:].astype(jnp.float32)
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
        # true tile pixels only: local rows/cols [1, th+1) x [1, tw+1)
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
        # normalized attention logits: gram / (||q_c|| * ||k_d||)
        qnorm = jnp.maximum(jnp.sqrt(qn[...]), _L2_EPS)  # (1, c_pad)
        knorm = jnp.maximum(jnp.sqrt(kn[...]), _L2_EPS)
        logits = gram[...] / qnorm.reshape(c_pad, 1) / knorm.reshape(1, c_pad)
        # per-head temperature as a per-LANE vector: within a same-head
        # block temp[head(lane)] == temp[head(row)], and cross-head entries
        # are masked below, so lane-indexed scaling is exact
        logits = logits * temp[...]
        # multi-head MDTA = block-diagonal attention: the per-head Gram is
        # the (head, head) diagonal block of the full c x c Gram, so mask
        # cross-head entries (and padded lanes) out of the softmax. Static
        # unroll over <= 8 heads keeps this pure vector ops (Mosaic-safe).
        row = jax.lax.broadcasted_iota(jnp.int32, (c_pad, c_pad), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (c_pad, c_pad), 1)
        hc = c // n_heads
        same_head = row < 0  # all-False
        for hh in range(n_heads):
            lo, hi = hh * hc, (hh + 1) * hc
            same_head = same_head | ((row >= lo) & (row < hi)
                                     & (lane >= lo) & (lane < hi))
        logits = jnp.where(same_head & (lane < c), logits, -1e30)
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        attn = e / jnp.sum(e, axis=-1, keepdims=True)  # (c_q, c_k)
        # fully-masked padded rows give a uniform finite attn row; those
        # output channels hit zero rows of w_proj and vanish

        # attention applied per pixel of the halo'd region (exact: the
        # attn matrix is global, application is pixelwise linear)
        vf = v.reshape((th + 2) * (tw + 2), c_pad)
        out_attn = jax.lax.dot_general(
            vf.astype(jnp.bfloat16), attn.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())),  # (P, d) x (c, d) -> (P, c)
            preferred_element_type=jnp.float32)
        proj = jax.lax.dot_general(
            out_attn.astype(jnp.bfloat16), w_proj[:],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(th + 2, tw + 2, c_pad)

        # attention residual on the halo'd region: x window rows [1, th+3)
        r = x[1:th + 3, 1:tw + 3, :] + proj
        if debug_stage == "r":
            o_ref[0] = r[1:th + 1, 1:tw + 1, :].astype(o_ref.dtype)
            return
        if debug_stage == "q":
            o_ref[0] = q[1:th + 1, 1:tw + 1, :].astype(o_ref.dtype)
            return
        if debug_stage == "attnout":
            o_ref[0] = proj[1:th + 1, 1:tw + 1, :].astype(o_ref.dtype)
            return

        # LN2 -> GDFN with the real halo -> (th, tw) tile, exact at seams
        rn = _layernorm(r, ln2_w[:].astype(jnp.float32),
                        ln2_b[:].astype(jnp.float32), c, ln_eps, bias_free)
        # torch zero-pads the GDFN dwconv INPUT at the image border
        # (padding=1); halo pixels outside the image carry nonzero r
        # (x=0 + attention of real neighbors), so zero them. Masking rn is
        # equivalent to masking t2 (w_in is linear, no bias). Interior tile
        # seams stay unmasked (their halo r is the true neighbor r). The
        # mask is built in fp32: Mosaic only supports minor-dim insertion
        # on 32-bit types.
        ti = tile // n_j
        tj = jax.lax.rem(tile, n_j)
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
            w_in[:],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16).reshape(th + 2, tw + 2, 2 * f_pad)
        acc2 = jnp.zeros((th, tw, 2 * f_pad), jnp.float32)
        dwf = w_dw[:].astype(jnp.float32)
        for di in range(3):
            for dj in range(3):
                acc2 = acc2 + t2[di:di + th, dj:dj + tw, :] * dwf[di, dj, :]
        x1 = acc2[..., :f_pad]
        x2 = acc2[..., f_pad:]
        g = 0.5 * x1 * (1.0 + _erf_approx(x1 * (2.0 ** -0.5))) * x2
        out = jax.lax.dot_general(
            g.reshape(th * tw, f_pad).astype(jnp.bfloat16), w_out[:],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(th, tw, c_pad)
        o_ref[0] = (out + r[1:th + 1, 1:tw + 1, :]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bias_free", "ln_eps",
                                             "num_heads", "interpret",
                                             "debug_stage"))
def fused_transformer_block(
    x, ln1_w, ln1_b, w_qkv, dw_qkv, temperature, w_proj,
    ln2_w, ln2_b, w_in, w_dw, w_out,
    bias_free: bool = True, ln_eps: float = 1e-5, num_heads: int = 1,
    interpret: bool | None = None, debug_stage=None,
):
    """Whole TransformerBlock (batch 1, any head count dividing C: the
    per-head Gram matrices are the diagonal blocks of the full C x C Gram,
    so multi-head is a block-masked softmax over the same accumulators).
    Weight layouts are the flax module kernels: w_qkv (1,1,C,3C), dw_qkv
    (3,3,1,3C), w_proj (1,1,C,C), w_in (1,1,C,2F), w_dw (3,3,1,2F),
    w_out (1,1,F,C).

    GDFN border semantics: the reference zero-pads the FFN depthwise conv
    at the IMAGE border (torch padding=1); here the image border sees the
    attention-residual of reflect/zero context one pixel outside... no:
    x is zero-padded, so border halo pixels carry r computed from
    zero-padded x — matching torch's zero padding of the conv input only
    approximately at the outermost ring. Interior tile seams are exact.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    bsz, h, w, c = x.shape
    assert bsz == 1, "megakernel scope: batch 1"
    w_qkv = w_qkv.reshape(c, 3 * c)
    dw_qkv = dw_qkv.reshape(3, 3, 3 * c)
    w_proj = w_proj.reshape(c, c)
    w_in = w_in.reshape(c, -1)
    two_f = w_in.shape[1]
    f = two_f // 2
    w_dw = w_dw.reshape(3, 3, two_f)
    w_out = w_out.reshape(f, c)

    c_pad = -(-c // 128) * 128
    f_pad = -(-f // 128) * 128
    tiles = _pick_tiles(h, w, c_pad, max(f_pad, 2 * c_pad))
    if tiles is None:
        raise ValueError(f"no tiling for {h}x{w}x{c}")
    th, tw = tiles
    n_i, n_j = h // th, w // tw
    n_tiles = n_i * n_j

    # window row w = unpadded row i*th + w - 2 (see module docstring)
    x_padded = jnp.pad(x, ((0, 0), (2, 6), (2, 6), (0, c_pad - c)))

    def pad_lane(v, n, axis=-1):
        widths = [(0, 0)] * v.ndim
        widths[axis] = (0, n - v.shape[axis])
        return jnp.pad(v, widths)

    # pack q/k/v at c_pad-aligned offsets
    w_qkv_p = jnp.zeros((c_pad, 3 * c_pad), jnp.bfloat16)
    dw_qkv_p = jnp.zeros((3, 3, 3 * c_pad), jnp.float32)
    for part in range(3):
        w_qkv_p = w_qkv_p.at[:c, part * c_pad:part * c_pad + c].set(
            w_qkv[:, part * c:(part + 1) * c].astype(jnp.bfloat16))
        dw_qkv_p = dw_qkv_p.at[:, :, part * c_pad:part * c_pad + c].set(
            dw_qkv[:, :, part * c:(part + 1) * c])
    w_proj_p = jnp.zeros((c_pad, c_pad), jnp.bfloat16)
    w_proj_p = w_proj_p.at[:c, :c].set(w_proj.astype(jnp.bfloat16))
    w_in_p = jnp.zeros((c_pad, 2 * f_pad), jnp.bfloat16)
    w_in_p = w_in_p.at[:c, :f].set(w_in[:, :f].astype(jnp.bfloat16))
    w_in_p = w_in_p.at[:c, f_pad:f_pad + f].set(w_in[:, f:].astype(jnp.bfloat16))
    w_dw_p = jnp.zeros((3, 3, 2 * f_pad), jnp.float32)
    w_dw_p = w_dw_p.at[:, :, :f].set(w_dw[:, :, :f])
    w_dw_p = w_dw_p.at[:, :, f_pad:f_pad + f].set(w_dw[:, :, f:])
    w_out_p = jnp.zeros((f_pad, c_pad), jnp.bfloat16)
    w_out_p = w_out_p.at[:f, :c].set(w_out.astype(jnp.bfloat16))

    if ln1_b is None:
        ln1_b = jnp.zeros((c,), jnp.float32)
    if ln2_b is None:
        ln2_b = jnp.zeros((c,), jnp.float32)
    ln1_w_p, ln1_b_p = pad_lane(ln1_w, c_pad), pad_lane(ln1_b, c_pad)
    ln2_w_p, ln2_b_p = pad_lane(ln2_w, c_pad), pad_lane(ln2_b, c_pad)
    assert c % num_heads == 0, (c, num_heads)
    tvec = jnp.asarray(temperature, jnp.float32).reshape(-1)
    assert tvec.shape[0] == num_heads, (tvec.shape, num_heads)
    # per-lane temperature: temp[head(lane)] for real lanes, 0 for padding
    lane_heads = jnp.arange(c) // (c // num_heads)
    temp = jnp.zeros((1, c_pad), jnp.float32).at[0, :c].set(tvec[lane_heads])

    def vspec(*shape):
        return pl.BlockSpec(shape, lambda p, t: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    kern = functools.partial(
        _kernel, th=th, tw=tw, c=c, c_pad=c_pad, f_pad=f_pad,
        bias_free=bias_free, ln_eps=ln_eps, n_tiles=n_tiles, n_j=n_j,
        n_heads=num_heads, debug_stage=debug_stage)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, h, w, c_pad), x.dtype),
        grid=(2, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
            vspec(c_pad), vspec(c_pad),
            vspec(c_pad, 3 * c_pad), vspec(3, 3, 3 * c_pad),
            vspec(1, c_pad),
            vspec(c_pad, c_pad),
            vspec(c_pad), vspec(c_pad),
            vspec(c_pad, 2 * f_pad), vspec(3, 3, 2 * f_pad),
            vspec(f_pad, c_pad),
        ],
        out_specs=pl.BlockSpec(
            (1, th, tw, c_pad),
            lambda p, t: (0, t // n_j, jax.lax.rem(t, n_j), 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, th + 8, tw + 8, c_pad), x.dtype),
            pltpu.VMEM((c_pad, c_pad), jnp.float32),   # gram
            pltpu.VMEM((1, c_pad), jnp.float32),       # q norms^2
            pltpu.VMEM((1, c_pad), jnp.float32),       # k norms^2
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x_padded, ln1_w_p, ln1_b_p, w_qkv_p, dw_qkv_p, temp, w_proj_p,
      ln2_w_p, ln2_b_p, w_in_p, w_dw_p, w_out_p)
    return out[..., :c] if c_pad != c else out
