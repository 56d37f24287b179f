"""On-chip same-session interleaved A/B (VERDICT r3 #4): deeper in-flight
depth + split fetch workers in _stream_groups, vs the r3-shipped
depth2/1fw, vs the device-side ceiling measured in the SAME session.
32x512px uint8 PNGs, groups of 8, trained bf16 teacher. Writes
/root/repo/artifacts/serve_depth_ab/ab.json."""
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax.numpy as jnp

from rethink_acoustic_image_enhancement_tpu.cli import _stream_groups
from rethink_acoustic_image_enhancement_tpu.eval.infer import TeacherPredictor
from rethink_acoustic_image_enhancement_tpu.models import flagship_teacher
from rethink_acoustic_image_enhancement_tpu.train.checkpoints import (
    load_weights,
)
from rethink_acoustic_image_enhancement_tpu.utils.image_io import (
    imread_rgb_ubyte,
    imwrite,
    list_images,
)

IN = "/tmp/serve_ab_r4/in"
OUT_DIR = "/root/repo/artifacts/serve_depth_ab"

# ---- inputs: 32 512px crops from the MDD sonar frames -----------------
if not os.path.isdir(IN) or len(list_images(IN)) != 32:
    import cv2

    os.makedirs(IN, exist_ok=True)
    src = sorted(list_images("/root/reference/Sample/MDD/origin"))
    k = 0
    rng = np.random.default_rng(0)
    while k < 32:
        im = cv2.imread(src[k % len(src)])
        y = int(rng.integers(0, im.shape[0] - 512))
        im = cv2.resize(im, (512, 658))[y:y + 512, :512]
        cv2.imwrite(os.path.join(IN, f"{k:03d}.png"), im)
        k += 1

pred = TeacherPredictor(
    params=load_weights("/root/repo/artifacts/kdlaet_full50k/weights/"
                        "net_g_50000_bf16"),
    model=flagship_teacher(static="test"), dtype=jnp.bfloat16)
paths = sorted(list_images(IN))
assert len(paths) == 32

# ---- device-side ceiling, SAME session (scan8, device-resident) -------
imgs_dev = [imread_rgb_ubyte(p) for p in paths[:8]]
up = pred._prep_and_upload(imgs_dev, 1.0)


def device_ms_per_img():
    import jax.numpy as _jnp

    t0 = time.perf_counter()
    for _ in range(3):
        h = pred._dispatch_uploaded(up)
    # bench-style sync: reduce ON DEVICE, fetch one scalar (a full uint8
    # output fetch would pollute the denominator with D2H time)
    float(_jnp.mean(h[1].astype(_jnp.float32)))
    return (time.perf_counter() - t0) / 24 * 1e3


device_ms_per_img()  # warm
dev_ms = min(device_ms_per_img() for _ in range(3))
print(f"device-side: {dev_ms:.1f} ms/img", flush=True)

VARIANTS = {
    "r3_depth2_fw1": dict(depth=2, fetch_workers=1, upload_workers=1),
    "depth4_fw1": dict(depth=4, fetch_workers=1, upload_workers=1),
    "depth4_fw2": dict(depth=4, fetch_workers=2, upload_workers=1),
    "depth6_fw2_up2": dict(depth=6, fetch_workers=2, upload_workers=2),
}


def run(name, kw):
    outdir = f"/tmp/serve_ab_r4/out_{name}"
    os.makedirs(outdir, exist_ok=True)

    def write(p, out):
        imwrite(os.path.join(outdir, os.path.basename(p)), out["hq"])

    t0 = time.perf_counter()
    _stream_groups(pred, paths, 8, None, 1.0, write, **kw)
    return time.perf_counter() - t0, outdir


# warm/compile every path once
for name, kw in VARIANTS.items():
    run(name, kw)

best = {n: None for n in VARIANTS}
for rep in range(4):  # interleaved rounds control tunnel drift
    for name, kw in VARIANTS.items():
        dt, _ = run(name, kw)
        best[name] = dt if best[name] is None else min(best[name], dt)
        print(f"rep {rep} {name}: {dt * 1000 / 32:.1f} ms/img", flush=True)


def digest(d):
    h = hashlib.sha256()
    for f in sorted(os.listdir(d)):
        h.update(open(os.path.join(d, f), "rb").read())
    return h.hexdigest()


digs = {n: digest(f"/tmp/serve_ab_r4/out_{n}") for n in VARIANTS}
res = {
    "date": time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime()),
    "device_side_ms_per_img_same_session": round(dev_ms, 2),
    "variants_ms_per_img": {n: round(v * 1000 / 32, 2)
                            for n, v in best.items()},
    "e2e_over_device_ratio": {
        n: round(dev_ms / (v * 1000 / 32), 3) for n, v in best.items()},
    "outputs_bit_identical_across_variants":
        len(set(digs.values())) == 1,
}
print(json.dumps(res, indent=1))
os.makedirs(OUT_DIR, exist_ok=True)
json.dump(res, open(os.path.join(OUT_DIR, "ab.json"), "w"), indent=1)
