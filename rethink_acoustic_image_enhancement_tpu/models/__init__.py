"""Model registry (one implementation shared by inference and training —
fixing the reference's byte-for-byte duplication across KDLAE/, ASDQE/ and
Train/, see SURVEY.md §1).

``build_network(cfg)`` mirrors the reference's ``define_network(opt)``
string-typed registry (Train/basicsr/models/archs/__init__.py:43-46) but
fails fast on unknown names / fields.
"""

from __future__ import annotations

from .asdqe import DenoiseRatePredictor
from .kdlae_student import KDLAEStudent
from .kdlae_teacher import KDLAETeacher, Restormer, RestormerSuperResolutionParam2

# torch-reference class name -> (flax class, ctor-kwarg mapping)
_KEYMAP_TEACHER = {
    "inp_channels": "inp_channels",
    "out_channels": "out_channels",
    "dim": "dim",
    "num_blocks": "num_blocks",
    "num_refinement_blocks": "num_refinement_blocks",
    "heads": "heads",
    "ffn_expansion_factor": "ffn_expansion_factor",
    "bias": "use_bias",
    "LayerNorm_type": "layernorm_type",
    "dual_pixel_task": "dual_pixel_task",
    "static": "static",
    "params": "params",
    # TPU-native extension (no reference analog): fold the conv +
    # pixel-(un)shuffle resamplers into single strided/dilated convs
    # (models/blocks.py Downsample/Upsample docstrings). Honored, not
    # cosmetic: it changes the compiled program, never the math.
    "fused_resample": "fused_resample",
}

REGISTRY = {
    "KDLAE_teacher": (KDLAETeacher, _KEYMAP_TEACHER),
    "RestormerSuperResolutionParam2": (RestormerSuperResolutionParam2, _KEYMAP_TEACHER),
    "Restormer": (Restormer, {k: v for k, v in _KEYMAP_TEACHER.items()
                              if k not in ("static", "params")}),
    "KDLAE_student": (KDLAEStudent, {
        "inp_channels": "inp_channels",
        "out_channels": "out_channels",
        "residual": "residual",
        "hidden_channels": "hidden_channels",
        "kernel_size": "kernel_size",
    }),
    "DenoiseRatePredictor": (DenoiseRatePredictor, {
        "in_channels": "in_channels",
        "dim": "dim",
    }),
}


def build_network(cfg: dict):
    """Instantiate a model from a reference-style ``network_g`` config dict
    (keys as in Train/Denoising/Options/paper202508/*.yml)."""
    cfg = dict(cfg)
    type_name = cfg.pop("type")
    if type_name not in REGISTRY:
        raise KeyError(
            f"unknown network type {type_name!r}; known: {sorted(REGISTRY)}")
    cls, keymap = REGISTRY[type_name]
    kwargs = {}
    for k, v in cfg.items():
        if k not in keymap:
            raise KeyError(f"unknown {type_name} option {k!r}")
        if isinstance(v, list):
            v = tuple(v)
        kwargs[keymap[k]] = v
    return cls(**kwargs)


def flagship_teacher(static: str = "test") -> KDLAETeacher:
    """The notebook-config KDLAE-T (KDLAE_T.ipynb cell 1: dim 48, blocks
    [4,6,6,8], heads [1,2,4,8], ffn 2.66, BiasFree, params='cat') — the
    single source of truth for every benchmark and driver entry point.
    ``static='train'`` adds the 2x SR head."""
    return KDLAETeacher(
        dim=48, num_blocks=(4, 6, 6, 8), num_refinement_blocks=4,
        heads=(1, 2, 4, 8), ffn_expansion_factor=2.66,
        layernorm_type="BiasFree", static=static, params="cat")


__all__ = [
    "KDLAETeacher",
    "KDLAEStudent",
    "DenoiseRatePredictor",
    "Restormer",
    "RestormerSuperResolutionParam2",
    "build_network",
    "flagship_teacher",
    "REGISTRY",
]
