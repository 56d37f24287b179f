"""Build the Sample/MDD-derived 4-modality teacher corpus.

Mirrors the reference's Dataset_SuperRestoration_param layout
(/root/reference/Train/basicsr/data/paired_image_dataset.py:857-982):
lq = sonar originals, gt = the reference's committed KDLAE-T golden
outputs, sr = 2x bicubic upscale of gt (stand-in for the 2x enhanced
targets the paper's corpus carries), params = per-image JSON with
`denoise_rate` (1.0 — the goldens are full-strength denoise).

    python scripts/make_mdd_corpus.py [dest=/tmp/e2e/data]
"""

import json
import os
import sys

import cv2

SRC = "/root/reference/Sample/MDD"


def main(dest: str = "/tmp/e2e/data") -> None:
    for sub in ("noise", "clear", "sr", "params"):
        os.makedirs(os.path.join(dest, sub), exist_ok=True)
    names = sorted(os.listdir(os.path.join(SRC, "origin")))
    for name in names:
        base = os.path.splitext(name)[0]
        lq = cv2.imread(os.path.join(SRC, "origin", name))
        gt = cv2.imread(os.path.join(SRC, "denoise/KDLAE-T", name))
        assert lq is not None and gt is not None, name
        sr = cv2.resize(gt, (2 * gt.shape[1], 2 * gt.shape[0]),
                        interpolation=cv2.INTER_CUBIC)
        cv2.imwrite(os.path.join(dest, "noise", f"{base}.png"), lq)
        cv2.imwrite(os.path.join(dest, "clear", f"{base}.png"), gt)
        cv2.imwrite(os.path.join(dest, "sr", f"{base}.png"), sr)
        with open(os.path.join(dest, "params", f"{base}.json"), "w") as f:
            json.dump({"denoise_rate": 1.0}, f)
    print(f"wrote {len(names)} 4-modality items to {dest}")


if __name__ == "__main__":
    main(*sys.argv[1:])
