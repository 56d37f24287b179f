"""Mixup augmentation (reference Mixing_Augment,
image_restoration_model.py:25-73) as a pure jittable function.

Beta(beta, beta)-weighted convex combination of the batch with a shuffled
copy of itself, identical lam/permutation applied to every tensor in the
lq/gt pytrees (dicts supported). ``use_identity`` adds a 50% no-op branch,
as in the reference (random.randint(0, 1) over [mixup, identity]).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _mix_tree(tree, lam, perm):
    def mix(x):
        return lam * x + (1 - lam) * x[perm]

    return jax.tree.map(mix, tree)


def mixing_augment(rng: jax.Array, gt, lq, mixup_beta: float = 1.2,
                   use_identity: bool = True):
    """Returns (gt', lq'). Argument order (target, input) matches the
    reference __call__."""
    r_choice, r_lam, r_perm = jax.random.split(rng, 3)
    batch = jax.tree.leaves(gt)[0].shape[0]
    lam = jax.random.beta(r_lam, mixup_beta, mixup_beta)
    perm = jax.random.permutation(r_perm, batch)

    mixed_gt = _mix_tree(gt, lam, perm)
    mixed_lq = _mix_tree(lq, lam, perm)

    if use_identity:
        apply_mix = jax.random.randint(r_choice, (), 0, 2) == 0
        pick = lambda m, o: jax.tree.map(
            lambda a, b: jnp.where(apply_mix, a, b), m, o)
        return pick(mixed_gt, gt), pick(mixed_lq, lq)
    return mixed_gt, mixed_lq
