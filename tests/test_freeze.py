"""Parameter freezing (the teacher fine-tune stage's mechanism)."""

import numpy as np

import jax
import jax.numpy as jnp

from rethink_acoustic_image_enhancement_tpu.losses import build_loss
from rethink_acoustic_image_enhancement_tpu.models import KDLAETeacher
from rethink_acoustic_image_enhancement_tpu.train.schedules import build_schedule
from rethink_acoustic_image_enhancement_tpu.train.trainer import (
    Trainer,
    build_optimizer,
)


def test_freeze_except_patch_embed_and_enhance():
    model = KDLAETeacher(dim=8, num_blocks=(1, 1, 1, 1),
                         num_refinement_blocks=1, heads=(1, 2, 4, 8),
                         layernorm_type="BiasFree", static="train",
                         params="cat")
    params = model.init(
        jax.random.PRNGKey(0),
        {"img": jnp.zeros((1, 16, 16, 3)),
         "denoise_rate": jnp.zeros((1, 16, 16, 1))})["params"]

    train_opt = {
        "optim_g": {"type": "AdamW", "lr": 1e-3, "weight_decay": 0.0,
                    "betas": [0.9, 0.999]},
        "use_grad_clip": True,
        # the reference's intended fine-tune freeze set (train.py:24-55)
        "freeze_except": ["patch_embed", "cen", "upen", "enhance", "outputen"],
        "scheduler": {"type": "CosineAnnealingRestartCyclicLR",
                      "periods": [10], "restart_weights": [1],
                      "eta_mins": [1e-3]},
    }
    schedule = build_schedule(1e-3, train_opt["scheduler"], -1)
    trainer = Trainer(
        apply_fn=lambda p, lq: model.apply({"params": p}, lq),
        loss_fn=build_loss({"type": "L1LossSr", "loss_weight": 1,
                            "reduction": "mean"}),
        optimizer=build_optimizer(train_opt, schedule, params=params),
        schedule=schedule,
    )
    state = trainer.init_state(params)
    before = jax.device_get(state.params)

    rng = np.random.default_rng(0)
    lq = {"img": rng.uniform(size=(8, 16, 16, 3)).astype(np.float32),
          "denoise_rate": np.full((8, 16, 16, 1), 0.5, np.float32)}
    gt = {"hq": rng.uniform(size=(8, 16, 16, 3)).astype(np.float32),
          "sr": rng.uniform(size=(8, 32, 32, 3)).astype(np.float32)}
    for i in range(2):
        state, _ = trainer.step(state, lq, gt, jax.random.PRNGKey(i))
    after = jax.device_get(state.params)

    def max_delta(tree_a, tree_b):
        return max(jax.tree.leaves(jax.tree.map(
            lambda a, b: float(np.max(np.abs(a - b))), tree_a, tree_b)),
            default=0.0)

    # trainable parts moved
    assert max_delta(before["patch_embed"], after["patch_embed"]) > 0
    assert max_delta(before["enhance"], after["enhance"]) > 0
    # frozen parts identical
    assert max_delta(before["encoder_level1"], after["encoder_level1"]) == 0
    assert max_delta(before["latent"], after["latent"]) == 0
    assert max_delta(before["output2"], after["output2"]) == 0
