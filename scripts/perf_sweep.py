"""XLA compiler-options sweep for the headline KDLAE-T 512px forward.

Round-1 lesson (docs/perf_plan.md): local Pallas rewrites lose to XLA's
global layout assignment, so round 2 attacks the compiler's own knobs.
Each candidate option set is compiled via
``jax.jit(fn).lower(...).compile(options)`` (the options ride the compile
request through the axon tunnel to the real TPU compiler) and timed with
the bench.py discipline: device-resident args, N async dispatches, one
scalar sync (block_until_ready is a no-op on this platform — CLAUDE.md).

Writes one JSON line per config to PERF_SWEEP.json as it goes, so a
partial run still yields data.
"""

import json
import time
import traceback

import numpy as np

import jax
import jax.numpy as jnp

BATCH = 1
SIZE = 512
DTYPE = jnp.bfloat16
WARMUP = 2
ITERS = 10

CANDIDATES = [
    ("baseline", {}),
    ("vmem32m", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("vmem64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("vmem96m", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
    ("lhs", {"xla_tpu_enable_latency_hiding_scheduler": "true"}),
    ("no_rwb", {"xla_tpu_rwb_fusion": "false"}),
    ("bundle_cost", {"xla_tpu_use_bundle_aware_cost_model_for_fusions": "true"}),
    ("nested_loop_fusion",
     {"xla_tpu_enable_multi_level_nested_loop_fusion": "true"}),
    ("vmem64m_lhs", {"xla_tpu_scoped_vmem_limit_kib": "65536",
                     "xla_tpu_enable_latency_hiding_scheduler": "true"}),
    ("async_all", {"xla_tpu_enable_all_experimental_scheduler_features": "true"}),
]


def main() -> None:
    from rethink_acoustic_image_enhancement_tpu.models import KDLAETeacher

    model = KDLAETeacher(
        dim=48, num_blocks=(4, 6, 6, 8), num_refinement_blocks=4,
        heads=(1, 2, 4, 8), ffn_expansion_factor=2.66,
        layernorm_type="BiasFree", static="test", params="cat",
    )
    params = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0),
        {"img": jnp.zeros((1, 64, 64, 3)),
         "denoise_rate": jnp.zeros((1, 64, 64, 1))})["params"])()
    params = jax.tree.map(lambda x: x.astype(DTYPE), params)

    img = jnp.asarray(np.random.default_rng(0).random((BATCH, SIZE, SIZE, 3)),
                      DTYPE)
    rate = jnp.full((BATCH, SIZE, SIZE, 1), 1.0, DTYPE)

    def denoise(params, img, rate):
        out = model.apply({"params": params},
                          {"img": img, "denoise_rate": rate})
        return jnp.clip(out["hq"], 0.0, 1.0)

    lowered = jax.jit(denoise).lower(params, img, rate)
    ref = None

    with open("PERF_SWEEP.json", "a") as sink:
        for name, opts in CANDIDATES:
            rec = {"name": name, "opts": opts}
            try:
                t0 = time.perf_counter()
                compiled = lowered.compile(compiler_options=opts or None)
                rec["compile_s"] = round(time.perf_counter() - t0, 1)
                for _ in range(WARMUP):
                    float(compiled(params, img, rate).mean())
                t0 = time.perf_counter()
                outs = [compiled(params, img, rate) for _ in range(ITERS)]
                last = outs[-1]
                float(last.mean())
                dt = time.perf_counter() - t0
                rec["ms_per_img"] = round(dt / ITERS / BATCH * 1e3, 2)
                rec["img_per_s"] = round(BATCH * ITERS / dt, 3)
                if name == "baseline":
                    ref = np.asarray(last, np.float32)
                elif ref is not None:
                    diff = float(np.abs(np.asarray(last, np.float32) - ref).max())
                    rec["max_abs_diff_vs_baseline"] = diff
            except Exception as e:  # noqa: BLE001 — record and continue
                rec["error"] = f"{type(e).__name__}: {e}"[:500]
                traceback.print_exc()
            print(json.dumps(rec), flush=True)
            sink.write(json.dumps(rec) + "\n")
            sink.flush()


if __name__ == "__main__":
    main()
