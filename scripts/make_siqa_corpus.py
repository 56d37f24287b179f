"""Build a Sample-derived SonarIQA triplet corpus for ASDQE training.

The reference trains ASDQE on (noiseSonar, clearSonar, params/score)
triplets (/root/reference/Train/ASDQE.py:32-44 + Dataset_S_IQA,
paired_image_dataset.py:643-855) — graded denoise candidates with a
scalar quality score. That corpus is not published; this script builds
the same structure from the committed Sample data: for each origin image
and its KDLAE-T golden, emit candidates mixed at denoise rates
lambda in linspace(0, 1, K) (gt = lambda*golden + (1-lambda)*origin,
score = lambda). 31 sources (MDD 10 + CAMUS 21) x K=13 -> 403 triplets.

    python scripts/make_siqa_corpus.py [dest=/tmp/siqa] [K=13]
"""

import json
import os
import sys

import cv2
import numpy as np

SETS = ("MDD", "CAMUS")
ROOT = "/root/reference/Sample"


def main(dest: str = "/tmp/siqa", k: int = 13) -> None:
    k = int(k)
    for sub in ("noise", "clear", "params"):
        os.makedirs(os.path.join(dest, sub), exist_ok=True)
    n = 0
    for dset in SETS:
        origin_dir = os.path.join(ROOT, dset, "origin")
        golden_dir = os.path.join(ROOT, dset, "denoise", "KDLAE-T")
        for name in sorted(os.listdir(origin_dir)):
            base = f"{dset}_{os.path.splitext(name)[0]}"
            lq = cv2.imread(os.path.join(origin_dir, name))
            golden = None
            for cand in (name, os.path.splitext(name)[0] + ".png",
                         os.path.splitext(name)[0] + ".jpg"):
                p = os.path.join(golden_dir, cand)
                if os.path.exists(p):
                    golden = cv2.imread(p)
                    break
            assert lq is not None and golden is not None, name
            if golden.shape != lq.shape:
                golden = cv2.resize(golden, (lq.shape[1], lq.shape[0]),
                                    interpolation=cv2.INTER_CUBIC)
            lqf, gf = lq.astype(np.float32), golden.astype(np.float32)
            for j, lam in enumerate(np.linspace(0.0, 1.0, k)):
                item = f"{base}_r{j:02d}"
                mix = np.clip(lam * gf + (1.0 - lam) * lqf, 0, 255)
                cv2.imwrite(os.path.join(dest, "noise", f"{item}.png"), lq)
                cv2.imwrite(os.path.join(dest, "clear", f"{item}.png"),
                            np.rint(mix).astype(np.uint8))
                with open(os.path.join(dest, "params", f"{item}.json"),
                          "w") as f:
                    json.dump({"score": float(lam)}, f)
                n += 1
    print(f"wrote {n} SIQA triplets to {dest}")


if __name__ == "__main__":
    main(*sys.argv[1:])
