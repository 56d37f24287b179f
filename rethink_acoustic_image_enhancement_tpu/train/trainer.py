"""pjit data-parallel trainer.

Replaces the reference's DDP/NCCL training stack (Train/basicsr/train.py +
models/base_model.py + models/image_restoration_model.py) with a single
compiled train step per progressive bucket:

  * params replicated, batch sharded over the mesh 'data' axis; XLA inserts
    the gradient all-reduce over ICI (no NCCL, no explicit DDP wrapper)
  * optax chain: clip_by_global_norm(0.01, the reference's hardcoded
    load-bearing clip, image_restoration_model.py:218) -> AdamW/Adam with
    the cosine-restart-cyclic schedule traced inside the step
  * mixup, progressive sub-crop and extra masking run on-device
  * EMA params (params/params_ema dual-key concept, base_model.py:54-62)
  * donated state: the optimizer update is in-place in HBM

The step() signature is model-family agnostic: lq/gt may be tensors or the
teacher's dicts; the loss fn handles pairing (losses/__init__.py registry).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from ..parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    SPATIAL_AXIS,
    make_mesh,
    model_param_specs,
)
from .mixup import mixing_augment
from .progressive import stage_crop, stage_extra_mask
from .schedules import Schedule, build_schedule

# The reference hardcodes clip_grad_norm_(0.01) whenever use_grad_clip
# (image_restoration_model.py:217-218) — unusually tight, load-bearing.
REFERENCE_GRAD_CLIP = 0.01


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Any = None  # present iff ema_decay > 0
    extra_variables: Any = struct.field(default_factory=dict)  # e.g. batch_stats


def _freeze_mask(params, freeze_except: list[str] | None,
                 freeze: list[str] | None):
    """Trainable mask over the param tree keyed on top-of-path prefixes.

    The reference's teacher fine-tune intends to freeze all but
    patch_embed + the enhance branch (the live-but-unused
    freeze_except_patch_embed_and_enhance helper, train.py:24-55);
    configure via ``train.freeze_except: [patch_embed, cen, upen, enhance,
    outputen]`` or ``train.freeze: [...]``."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def trainable(path) -> bool:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if freeze_except is not None:
            return any(name.startswith(p) for p in freeze_except)
        return not any(name.startswith(p) for p in (freeze or []))

    paths = {tuple(p): trainable(p) for p, _ in flat}

    def mask_tree(tree):
        flat2 = jax.tree_util.tree_flatten_with_path(tree)[0]
        leaves = [paths[tuple(p)] for p, _ in flat2]
        return jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(tree), leaves)

    return mask_tree


def build_optimizer(train_opt: dict, schedule: Schedule,
                    params=None) -> optax.GradientTransformation:
    """From a reference-style ``train`` config section. Pass ``params``
    when using freeze/freeze_except (the mask is tree-structured)."""
    optim = dict(train_opt["optim_g"])
    kind = optim.pop("type")
    lr = optim.pop("lr")  # folded into `schedule`
    del lr
    betas = optim.pop("betas", (0.9, 0.999))
    wd = optim.pop("weight_decay", 0.0)
    if kind == "AdamW":
        tx = optax.adamw(schedule, b1=betas[0], b2=betas[1], weight_decay=wd)
    elif kind == "Adam":
        tx = optax.adam(schedule, b1=betas[0], b2=betas[1])
    else:
        raise KeyError(f"unsupported optimizer {kind!r} (reference supports "
                       "Adam/AdamW, image_restoration_model.py:139-158)")
    chain = []
    if train_opt.get("use_grad_clip", True):
        chain.append(optax.clip_by_global_norm(
            train_opt.get("grad_clip_norm", REFERENCE_GRAD_CLIP)))
    chain.append(tx)
    opt = optax.chain(*chain)

    freeze_except = train_opt.get("freeze_except")
    freeze = train_opt.get("freeze")
    if freeze_except or freeze:
        if params is None:
            raise ValueError("freeze/freeze_except needs params to build "
                             "the trainable mask")
        mask_fn = _freeze_mask(params, freeze_except, freeze)
        opt = optax.multi_transform(
            {"train": opt, "frozen": optax.set_to_zero()},
            lambda tree: jax.tree.map(
                lambda flag: "train" if flag else "frozen", mask_fn(tree)))
    return opt


@dataclasses.dataclass
class Trainer:
    """Owns the compiled train step(s) and the training state.

    Direct-API warning for meshes with a 'model' axis (tensor-parallel
    training): the model behind ``apply_fn`` must NOT contain plain
    ``feature_group_count`` (grouped/depthwise) convs — XLA SPMD emits
    silently n_model-times-too-large kernel gradients for them
    (scripts/repro_xla_spmd_grouped_conv_grad.py). Use the models'
    ``dwconv_shift=True`` form; ``build_everything`` wires this
    automatically for ``train.model_shard`` configs."""

    apply_fn: Callable  # (params, lq, rngs|None) -> pred
    loss_fn: Callable  # (pred, gt[, rng]) -> scalar
    optimizer: optax.GradientTransformation
    schedule: Schedule
    mesh: Any = None
    ema_decay: float = 0.0
    mixup: bool = False
    mixup_beta: float = 1.2
    mixup_identity: bool = True
    scale: int = 1  # dataset scale (gt vs lq)
    gt_size: int = 0  # dataset-level max patch (0 = no progressive crop)
    loss_takes_rng: bool = False
    compute_dtype: Any = None  # e.g. jnp.bfloat16 for bf16 activations
    # shard image rows over the mesh 'spatial' axis IN TRAINING (the CP
    # analog from SURVEY §5.7 applied to the train step, not just serving).
    # This is what parallelizes the teacher's batch-1 curriculum stages
    # (KDLAET.yml mini_batch_sizes tail [1,1,1]) across a pod — pure data
    # parallelism cannot split batch 1. Axis index of H in the batch
    # leaves: 1 for NHWC teacher tensors, 2 for (B,F,H,W) student stacks.
    spatial_axis: int | None = None

    def __post_init__(self):
        if self.mesh is None:
            self.mesh = make_mesh(n_data=len(jax.devices()), n_spatial=1)
        repl = NamedSharding(self.mesh, P())
        shard = NamedSharding(self.mesh, P(DATA_AXIS))
        self._state_sharding = repl
        self._batch_spec = shard
        self._n_spatial = dict(self.mesh.shape).get(SPATIAL_AXIS, 1)
        self._n_model = dict(self.mesh.shape).get(MODEL_AXIS, 1)
        if self._n_model > 1 and self.spatial_axis is not None \
                and self._n_spatial > 1:
            # same partitioner defect as serving (mesh.model_param_specs
            # docstring): feature-sharded kernels + halo-exchanged rows
            # mis-partition; training additionally runs the transposed
            # convs in the backward pass
            raise ValueError("model_shard and spatial_shard cannot be "
                             "combined: XLA SPMD mis-partitions "
                             "feature-sharded convs under halo exchange")
        if self.spatial_axis is not None and self._n_spatial > 1:
            spec = [None] * (self.spatial_axis + 1)
            spec[0], spec[self.spatial_axis] = DATA_AXIS, SPATIAL_AXIS
            self._spatial_spec = NamedSharding(self.mesh, P(*spec))
        else:
            self._spatial_spec = None
        self._jit_cache: dict[tuple, Callable] = {}

    # ------------------------------------------------------------- state --
    def init_state(self, params, extra_variables: Any = None) -> TrainState:
        # tensor parallelism: params (and therefore the optax state and
        # EMA, whose leaves are created zeros_like/copy and inherit the
        # placement) shard channel-wise over the 'model' axis; batches
        # replicate across it (_shard_like never names MODEL_AXIS) and
        # XLA SPMD inserts the channel collectives in both passes.
        placement = (model_param_specs(self.mesh, params)
                     if self._n_model > 1 else self._state_sharding)
        params = jax.device_put(params, placement)
        opt_state = self.optimizer.init(params)
        # copy, not alias: state is donated, and donating the same buffer
        # through both params and ema_params is invalid
        ema = jax.tree.map(jnp.copy, params) if self.ema_decay > 0 else None
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          opt_state=opt_state, ema_params=ema,
                          extra_variables=extra_variables or {})

    # -------------------------------------------------------------- step --
    def _train_step(self, state: TrainState, lq, gt, rng, extra_prob,
                    mini_gt_size: int):
        r_mix, r_crop, r_mask, r_loss = jax.random.split(rng, 4)

        if self.gt_size and mini_gt_size and mini_gt_size < self.gt_size:
            lq, gt = stage_crop(lq, gt, r_crop, self.gt_size, mini_gt_size,
                                scale=self.scale)
        lq = stage_extra_mask(lq, r_mask, extra_prob)
        if self.mixup:
            gt, lq = mixing_augment(r_mix, gt, lq, self.mixup_beta,
                                    self.mixup_identity)

        cast = lambda t: jax.tree.map(
            lambda x: x.astype(self.compute_dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, t)
        if self.compute_dtype is not None:
            lq = cast(lq)

        def compute_loss(params):
            # mixed precision: fp32 master params, bf16 compute copies.
            # The cast's vjp casts the grads back to fp32, so the optimizer
            # state and update stay full-precision (SURVEY §2.11 plan).
            if self.compute_dtype is not None:
                params = cast(params)
            pred = self.apply_fn(params, lq)
            if self.compute_dtype is not None:
                pred = jax.tree.map(
                    lambda x: x.astype(jnp.float32) if x is not None else None,
                    pred, is_leaf=lambda x: x is None)
            if self.loss_takes_rng:
                return self.loss_fn(pred, gt, rng=r_loss)
            return self.loss_fn(pred, gt)

        loss, grads = jax.value_and_grad(compute_loss)(state.params)
        updates, opt_state = self.optimizer.update(grads, state.opt_state,
                                                   state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state)
        if state.ema_params is not None:
            d = self.ema_decay
            ema = jax.tree.map(lambda e, p: e * d + p * (1 - d),
                               state.ema_params, params)
            new_state = new_state.replace(ema_params=ema)

        metrics = {
            "l_pix": loss,
            "lr": self.schedule(state.step),
            "grad_norm": optax.global_norm(grads),
        }
        return new_state, metrics

    def _get_step(self, batch_size: int, mini_gt_size: int) -> Callable:
        key = (batch_size, mini_gt_size)
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(
                partial(self._train_step, mini_gt_size=mini_gt_size),
                donate_argnums=(0,),
            )
        return self._jit_cache[key]

    def step(self, state: TrainState, lq, gt, rng,
             extra_prob: float = 0.0, mini_gt_size: int = 0):
        """One training iteration. lq/gt: host or device pytrees whose
        leading dim is the (already stage-subsampled) batch. In
        multi-process runs, host leaves are the process-LOCAL batch shard
        and are assembled into global arrays over the mesh."""
        if jax.process_count() > 1:
            from ..data.loader import device_put_batch

            lq = device_put_batch(self.mesh, lq)
            gt = device_put_batch(self.mesh, gt)
        else:
            lq = jax.device_put(lq, self._shard_like(lq))
            gt = jax.device_put(gt, self._shard_like(gt))
        batch = jax.tree.leaves(lq)[0].shape[0]
        fn = self._get_step(batch, mini_gt_size)
        return fn(state, lq, gt, rng, jnp.asarray(extra_prob, jnp.float32))

    def _shard_like(self, tree):
        n = self.mesh.shape[DATA_AXIS]
        ax, ns = self.spatial_axis, self._n_spatial

        def spec(x):
            if x is None:
                return None
            if hasattr(x, "shape") and len(x.shape) >= 1 and x.shape[0] % n == 0:
                if (self._spatial_spec is not None and len(x.shape) > ax
                        and x.shape[ax] % ns == 0):
                    return self._spatial_spec
                return self._batch_spec
            return self._state_sharding

        return jax.tree.map(spec, tree, is_leaf=lambda x: x is None)


def make_teacher_apply(model) -> Callable:
    def apply_fn(params, lq):
        return model.apply({"params": params}, lq)

    return apply_fn


def make_student_apply(model) -> Callable:
    def apply_fn(params, lq):
        return model.apply({"params": params}, lq)

    return apply_fn


def build_trainer_from_config(opt: dict, model, loss_fn,
                              mesh=None, **overrides) -> Trainer:
    """Wire a Trainer from a reference-style full config dict."""
    train_opt = opt["train"]
    ds_opt = opt.get("datasets", {}).get("train", {})
    schedule = build_schedule(
        train_opt["optim_g"]["lr"], train_opt["scheduler"],
        train_opt.get("warmup_iter", -1))
    optimizer = build_optimizer(train_opt, schedule)
    mix = train_opt.get("mixing_augs", {})
    loss_takes_rng = (opt.get("train", {}).get("pixel_opt", {})
                      .get("reduction") == "mix")
    kw = dict(
        apply_fn=make_teacher_apply(model),
        loss_fn=loss_fn,
        optimizer=optimizer,
        schedule=schedule,
        mesh=mesh,
        ema_decay=train_opt.get("ema_decay", 0.0),
        mixup=mix.get("mixup", False),
        mixup_beta=mix.get("mixup_beta", 1.2),
        mixup_identity=mix.get("use_identity", False),
        scale=opt.get("scale", 1),
        gt_size=ds_opt.get("gt_size", 0),
        loss_takes_rng=loss_takes_rng,
    )
    kw.update(overrides)
    return Trainer(**kw)
