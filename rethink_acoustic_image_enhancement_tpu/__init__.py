"""TPU-native framework for acoustic image enhancement (sonar + ultrasound).

A ground-up JAX/XLA/Pallas/pjit re-design with the capabilities of the
PyTorch reference `yangtaihong59/Rethink_Acoustic_Image_Enhancement`:

- ``models``:   KDLAE-T teacher (conv-attention U-Net with denoise-rate
                conditioning + 2x SR head), KDLAE-S student (3D-conv temporal
                U-Net), ASDQE no-reference quality scorer, Restormer baseline.
- ``ops``:      TPU-first NHWC ops (channel LayerNorm, MDTA attention core,
                GDFN gate, pixel shuffle/unshuffle, align-corners resize,
                corruption masks) with Pallas TPU kernels for the hot paths.
- ``parallel``: mesh construction + sharding helpers (data / spatial axes).
- ``convert``:  PyTorch ``.pth`` state-dict -> JAX pytree weight converter.
- ``losses``:   L1-Shadow (L1LossSr), temporal video-frames loss, L2-Dice, ...
- ``data``:     host pipeline (pairing, multi-frame grouping, corruption,
                paired crop/aug) + double-buffered device prefetch.
- ``train``:    pjit data-parallel trainer with progressive schedules, EMA,
                mixup, cosine-restart-cyclic LR, orbax checkpointing.
- ``metrics``:  jitted PSNR / SSIM (2D + 3D Gaussian) / NIQE.
- ``eval``:     inference apps + ASDQE scoring protocol (stats CSV).
"""

__version__ = "0.1.0"
