"""On-chip A/B: _stream_groups depth=0 (serialized fetch+write) vs
depth=2 (4-stage pipeline). 32x512px uint8 inputs, groups of 8, bf16
teacher; asserts bit-identical outputs."""
import hashlib, json, os, sys, time

sys.path.insert(0, "/root/repo")
from rethink_acoustic_image_enhancement_tpu.cli import _stream_groups
from rethink_acoustic_image_enhancement_tpu.eval.infer import TeacherPredictor
from rethink_acoustic_image_enhancement_tpu.models import flagship_teacher
from rethink_acoustic_image_enhancement_tpu.train.checkpoints import load_weights
from rethink_acoustic_image_enhancement_tpu.utils.image_io import imwrite, list_images

import jax.numpy as jnp
pred = TeacherPredictor(
    params=load_weights("/root/repo/artifacts/kdlaet_full50k/weights/net_g_50000_bf16"),
    model=flagship_teacher(static="test"), dtype=jnp.bfloat16)
paths = sorted(list_images("/tmp/serve_ab/in"))
assert len(paths) == 32

def run(depth, outdir, repeats=2):
    os.makedirs(outdir, exist_ok=True)
    def write(p, out):
        imwrite(os.path.join(outdir, os.path.basename(p)), out["hq"])
    best = None
    for r in range(repeats):
        t0 = time.perf_counter()
        _stream_groups(pred, paths, 8, None, 1.0, write, depth=depth)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
        print(f"depth={depth} rep {r}: {dt*1000/len(paths):.1f} ms/img", flush=True)
    return best

# warmup/compile
run(0, "/tmp/serve_ab/warm", repeats=1)
t0 = t2 = None
for _ in range(4):  # interleave to control tunnel drift
    a = run(0, "/tmp/serve_ab/out_d0", repeats=1)
    b = run(2, "/tmp/serve_ab/out_d2", repeats=1)
    t0 = a if t0 is None else min(t0, a)
    t2 = b if t2 is None else min(t2, b)

def digest(d):
    h = hashlib.sha256()
    for f in sorted(os.listdir(d)):
        h.update(open(os.path.join(d, f), "rb").read())
    return h.hexdigest()

same = digest("/tmp/serve_ab/out_d0") == digest("/tmp/serve_ab/out_d2")
res = {
    "depth0_ms_per_img": t0 * 1000 / 32,
    "depth2_ms_per_img": t2 * 1000 / 32,
    "speedup": t0 / t2,
    "outputs_bit_identical": same,
}
print(json.dumps(res, indent=1))
json.dump(res, open("/tmp/serve_ab/ab.json", "w"), indent=1)
