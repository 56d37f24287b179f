"""Self-contained repro: XLA SPMD grouped-conv kernel-gradient bug.

Observed on jax/jaxlib 0.9.0 (CPU SPMD backend, 8 virtual devices;
real multi-chip untestable in this environment). Minimal conditions:

  1. a conv with ``feature_group_count > 1`` (depthwise),
  2. its kernel REPLICATED across a mesh axis (here 'model', size 4),
  3. the input batch sharded over a DIFFERENT axis ('data').

The depthwise kernel's gradient then comes out exactly n_model times
too large: the partitioner emits the cross-replica reduce for the
kernel grad over ALL mesh axes instead of only the axes the batch is
partitioned over. Plain (ungrouped) convs in the same program are
exact — only the grouped-conv grad mis-reduces. The forward pass and
the loss are exact, which is what makes this dangerous: training looks
healthy while a subset of kernels learns at 4x the intended rate.

Not triggered when: the batch is fully replicated, OR the grouped
kernel is itself sharded over the axis (divisible width), OR the mesh
has no extra axis. In larger programs (the full KDLAE teacher) the
affected-leaf set shifts with the global partitioning strategy — e.g.
adding an ``optax.global_norm`` consumer flips which dwconvs break —
so no parameter-spec rule is safe.

Framework consequence: ``train.model_shard`` (tensor parallelism)
swaps every depthwise conv to the shift-add form
(``models/blocks.py::DepthwiseConv3x3``, identical parameter tree,
elementwise ops whose gradients partition exactly). Re-run this script
on any new jax release; if it prints FIXED the swap can be retired.

Usage:  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/repro_xla_spmd_grouped_conv_grad.py
(self-forces the CPU backend + device count when run under this repo's
axon-pinned interpreter).
"""
import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def main() -> int:
    jax.config.update("jax_platforms", "cpu")
    devs = jax.devices()
    if len(devs) < 8:
        print(f"need 8 devices, have {len(devs)} — set XLA_FLAGS")
        return 2
    mesh = Mesh(np.asarray(devs[:8]).reshape(2, 4), ("data", "model"))

    rng = np.random.default_rng(0)
    B, H, W, CIN, CH = 4, 16, 16, 8, 42  # 42 % 4 != 0 -> kernel replicated
    x = rng.uniform(size=(B, H, W, CIN)).astype(np.float32)
    w_in = rng.normal(size=(1, 1, CIN, CH), scale=0.2).astype(np.float32)
    w_dw = rng.normal(size=(3, 3, 1, CH), scale=0.2).astype(np.float32)
    w_out = rng.normal(size=(1, 1, CH, CIN), scale=0.2).astype(np.float32)
    y = rng.uniform(size=(B, H, W, CIN)).astype(np.float32)

    dn = jax.lax.conv_dimension_numbers(x.shape, (1, 1, CIN, CH),
                                        ("NHWC", "HWIO", "NHWC"))

    def loss(params, x, y):
        w1, wd, w2 = params
        h = jax.lax.conv_general_dilated(x, w1, (1, 1), "SAME",
                                         dimension_numbers=dn)
        h = jax.lax.conv_general_dilated(h, wd, (1, 1), "SAME",
                                         feature_group_count=CH,
                                         dimension_numbers=dn)
        h = jax.nn.gelu(h)
        o = jax.lax.conv_general_dilated(h, w2, (1, 1), "SAME",
                                         dimension_numbers=dn)
        return jnp.abs(o - y).mean()

    grad = jax.jit(jax.grad(loss))

    g_ref = jax.device_get(grad((w_in, w_dw, w_out), x, y))

    def put(a, spec):
        return jax.device_put(a, NamedSharding(mesh, spec))

    params_s = (put(w_in, P()), put(w_dw, P()), put(w_out, P()))
    g_s = jax.device_get(grad(params_s, put(x, P("data")), put(y, P("data"))))

    rel = [float(np.abs(np.asarray(a) - np.asarray(b)).max()
                 / (np.abs(np.asarray(a)).max() + 1e-12))
           for a, b in zip(g_ref, g_s)]
    print(f"grad relmax diff vs single-device: "
          f"w_in={rel[0]:.3e} w_dw={rel[1]:.3e} w_out={rel[2]:.3e}")
    ratio = float(np.median(
        np.asarray(g_s[1])[np.abs(g_ref[1]) > 1e-6]
        / np.asarray(g_ref[1])[np.abs(g_ref[1]) > 1e-6]))
    if rel[1] > 0.5:
        print(f"BUG REPRODUCED on jax {jax.__version__}: grouped-conv "
              f"kernel grad scaled ~{ratio:.2f}x (expected 1.0); plain "
              f"convs exact. Keep dwconv_shift for model_shard training.")
        return 0
    print(f"FIXED on jax {jax.__version__}: grouped-conv grad exact "
          f"(relmax {rel[1]:.1e}) — the dwconv_shift swap in "
          f"train/loop.py can be retired after re-running "
          f"tests/test_parallel.py with it disabled.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
