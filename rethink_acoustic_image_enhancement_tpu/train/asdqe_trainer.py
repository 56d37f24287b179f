"""ASDQE trainer — the quality-scorer training app.

Port of Train/ASDQE.py (which ships broken: it imports a nonexistent
``S_IQA_model`` module, ASDQE.py:15 — SURVEY.md §2.7). Behavior kept:
Dataset_S_IQA triplets, 80/20 split, Adam lr 1e-3, MSE on the score,
ReduceLROnPlateau, gradient accumulation (32), best/latest checkpointing.
TPU mapping: the AMP GradScaler is unnecessary (bf16 compute has fp32
range), so ``compute_dtype=bfloat16`` plays autocast's role with fp32
params/optimizer; accumulation uses optax.MultiSteps; BatchNorm batch
statistics update inside the train step (mutable collection).
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..data.datasets import SIQADataset
from ..data.loader import BatchLoader, EnlargedShuffleSampler
from ..models import DenoiseRatePredictor
from .checkpoints import save_weights


class ReduceLROnPlateau:
    """Host-side plateau LR controller (torch semantics: factor, patience,
    min_lr). The current scale feeds the jitted step as a traced scalar."""

    def __init__(self, factor: float = 0.5, patience: int = 5,
                 min_scale: float = 1e-3):
        self.factor = factor
        self.patience = patience
        self.min_scale = min_scale
        self.best = float("inf")
        self.bad_epochs = 0
        self.scale = 1.0

    def step(self, metric: float) -> float:
        if metric < self.best - 1e-8:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.scale = max(self.scale * self.factor, self.min_scale)
                self.bad_epochs = 0
        return self.scale


def make_asdqe_train_step(model: DenoiseRatePredictor,
                          optimizer: optax.GradientTransformation,
                          compute_dtype=jnp.bfloat16):
    """One accumulation micro-step: MSE(score, label) with BN stats update
    and dropout active (train=True). params/batch_stats/opt_state are
    DONATED (callers rebind them every call) — in-place aliasing shaves
    the last ~60 MB that keeps the b32@512 step under the 15.75 GB HBM
    line (expect the documented one recompile on the second call)."""

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def step(params, batch_stats, opt_state, lq, gt, score, rng, lr_scale):
        def loss_fn(p):
            def cast(t):
                # uint8 H2D boundary: divide in f32 FIRST, then cast —
                # a direct bf16 divide perturbs inputs by a ulp (see
                # eval/infer.py _forward and CLAUDE.md)
                if t.dtype == jnp.uint8:
                    t = t.astype(jnp.float32) / 255.0
                return t.astype(compute_dtype) if compute_dtype else t
            out, mutated = model.apply(
                {"params": p, "batch_stats": batch_stats},
                cast(lq), cast(gt), train=True,
                mutable=["batch_stats"], rngs={"dropout": rng})
            pred = out.reshape(-1).astype(jnp.float32)
            loss = jnp.mean(jnp.square(pred - score))
            return loss, mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        # plateau LR: scale the post-Adam update (equivalent to scaling lr)
        updates = jax.tree.map(lambda u: u * lr_scale, updates)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, loss

    return step


def train_asdqe(
    dataset_opt: dict,
    lr: float = 1e-3,
    epochs: int = 10,
    batch_size: int = 1,
    accumulation_steps: int = 32,
    gt_size: int | None = 256,
    seed: int = 0,
    out_dir: str | None = None,
    compute_dtype=jnp.bfloat16,
    log: Callable[[str], None] = print,
    max_steps_per_epoch: int | None = None,
    h2d_uint8: bool = True,
    device_resident: bool = False,
    steps_per_epoch: int | None = None,
    tracker=None,
) -> dict[str, Any]:
    """Train the scorer; returns {'params', 'batch_stats', 'history'}.

    ``device_resident=True`` feeds from :class:`SIQADeviceCorpus`
    (graded candidates generated in HBM; per-iter H2D = key + ids) with
    an 80/20 SOURCE-level split — stronger than the reference's
    random_split over triplets, which leaks each source image across
    train and val. ``steps_per_epoch`` (default ``accumulation_steps``,
    i.e. one optimizer update per epoch) sizes the virtual epoch.

    ``tracker`` is an optional :class:`utils.tracking.RemoteTracker`
    receiving per-epoch metrics — the swanlab experiment logging of the
    reference's ASDQE trainer (Train/ASDQE.py:71-84,128-144).
    """
    if device_resident:
        return _train_asdqe_device_resident(
            dataset_opt, lr=lr, epochs=epochs, batch_size=batch_size,
            accumulation_steps=accumulation_steps, gt_size=gt_size,
            seed=seed, out_dir=out_dir, compute_dtype=compute_dtype,
            log=log, steps_per_epoch=steps_per_epoch, tracker=tracker)

    model = DenoiseRatePredictor(remat=True, dtype=compute_dtype)
    # remat + computation dtype: fit the reference's b32@512px train
    # step in 16 GB HBM (f32 no-remat needs a measured 26 GB)
    rng = jax.random.PRNGKey(seed)
    params_rng, dropout_rng = jax.random.split(rng)
    variables = model.init(params_rng, jnp.zeros((1, 32, 32, 3)),
                           jnp.zeros((1, 32, 32, 3)))
    params, batch_stats = variables["params"], variables["batch_stats"]

    ds_opt = dict(dataset_opt, phase="train", gt_size=gt_size, seed=seed)
    dataset = SIQADataset(ds_opt)
    n = len(dataset)
    split_rng = np.random.default_rng(seed)
    perm = split_rng.permutation(n)
    train_idx, val_idx = perm[: int(0.8 * n)], perm[int(0.8 * n):]

    class _Subset:
        def __init__(self, base, idx):
            self.base, self.idx = base, idx

        def __len__(self):
            return len(self.idx)

        def __getitem__(self, i):
            return self.base[int(self.idx[i])]

        def set_epoch(self, e):
            self.base.set_epoch(e)

    base_tx = optax.adam(lr)
    tx = optax.MultiSteps(base_tx, every_k_schedule=accumulation_steps)
    opt_state = tx.init(params)
    step_fn = make_asdqe_train_step(model, tx, compute_dtype)
    plateau = ReduceLROnPlateau()

    # uint8 H2D boundary: the SIQA crops come from uint8 decodes and the
    # augs are flips/rot90, so rint(img*255) round-trips losslessly —
    # 4x less transfer AND 4x less exposure to the tunnel client's
    # per-H2D host leak (CLAUDE.md) on long runs
    def _ship(a: np.ndarray):
        if h2d_uint8:
            a = np.rint(np.asarray(a) * 255.0).astype(np.uint8)
        return jnp.asarray(a)

    def _device_batches(loader):
        """One-slot upload prefetch: batch k+1's host pack + H2D rides
        under batch k's device compute (the serve-pipeline pattern,
        eval/infer.py)."""
        from concurrent.futures import ThreadPoolExecutor

        def up(b):
            return (_ship(b["lq"]["img"]), _ship(b["gt"]["hq"]),
                    jnp.asarray(b["lq"]["score"]))

        with ThreadPoolExecutor(max_workers=1) as ex:
            it = iter(loader)
            try:
                fut = ex.submit(up, next(it))
            except StopIteration:
                return
            while fut is not None:
                cur = fut.result()
                try:
                    fut = ex.submit(up, next(it))
                except StopIteration:
                    fut = None
                yield cur

    def _eval(p, bs, lq, gt):
        if lq.dtype == jnp.uint8:  # same boundary as the train step
            lq = lq.astype(jnp.float32) / 255.0
            gt = gt.astype(jnp.float32) / 255.0
        return model.apply({"params": p, "batch_stats": bs},
                           lq, gt).reshape(-1)

    eval_fn = jax.jit(_eval)

    history = []
    best_val = float("inf")
    for epoch in range(epochs):
        train_loader = BatchLoader(
            _Subset(dataset, train_idx), batch_size,
            EnlargedShuffleSampler(len(train_idx), seed=seed + epoch),
            num_workers=2, drop_last=True)
        train_loader.set_epoch(epoch)
        losses = []
        for k, (lq, gt, score) in enumerate(_device_batches(train_loader)):
            if max_steps_per_epoch and k >= max_steps_per_epoch:
                break
            dropout_rng, sub = jax.random.split(dropout_rng)
            params, batch_stats, opt_state, loss = step_fn(
                params, batch_stats, opt_state, lq, gt, score,
                sub, jnp.asarray(plateau.scale, jnp.float32))
            losses.append(float(loss))

        # validation (eval mode: running stats, no dropout)
        val_losses = []
        val_loader = BatchLoader(
            _Subset(dataset, val_idx), batch_size,
            EnlargedShuffleSampler(len(val_idx), shuffle=False),
            num_workers=2, drop_last=False)
        for k, (lq, gt, score) in enumerate(_device_batches(val_loader)):
            if max_steps_per_epoch and k >= max_steps_per_epoch:
                break
            pred = eval_fn(params, batch_stats, lq, gt)
            val_losses.append(float(jnp.mean(
                jnp.square(pred - score))))
        train_l = float(np.mean(losses)) if losses else float("nan")
        val_l = float(np.mean(val_losses)) if val_losses else float("nan")
        plateau.step(val_l)
        history.append({"epoch": epoch, "train_mse": train_l,
                        "val_mse": val_l, "lr_scale": plateau.scale})
        log(f"[asdqe] epoch {epoch}: train_mse={train_l:.5f} "
            f"val_mse={val_l:.5f} lr_scale={plateau.scale:.3f}")
        if tracker is not None:
            # swanlab-protocol epoch metrics (Train/ASDQE.py:140-144)
            tracker.log({"train_epoch_mse": train_l, "val_epoch_mse": val_l,
                         "lr_scale": plateau.scale, "epoch": epoch},
                        step=epoch)
        if out_dir:
            save_weights(out_dir, epoch, {"params": params,
                                          "batch_stats": batch_stats})
            if val_l < best_val:
                best_val = val_l
                save_weights(out_dir, "best", {"params": params,
                                               "batch_stats": batch_stats})

    if tracker is not None:
        tracker.finish()
    return {"params": params, "batch_stats": batch_stats, "history": history}


def _train_asdqe_device_resident(
    dataset_opt: dict,
    lr: float,
    epochs: int,
    batch_size: int,
    accumulation_steps: int,
    gt_size: int | None,
    seed: int,
    out_dir: str | None,
    compute_dtype,
    log: Callable[[str], None],
    steps_per_epoch: int | None,
    tracker=None,
) -> dict[str, Any]:
    """Device-resident ASDQE training: SIQADeviceCorpus batches, source-
    level 80/20 split, deterministic held-out val set (fixed key), same
    step/optimizer/plateau/checkpoint semantics as the host path."""
    from .device_corpus import SIQADeviceCorpus

    model = DenoiseRatePredictor(remat=True, dtype=compute_dtype)
    # remat + computation dtype: fit the reference's b32@512px train
    # step in 16 GB HBM (f32 no-remat needs a measured 26 GB)
    rng = jax.random.PRNGKey(seed)
    params_rng, dropout_rng, data_rng, val_rng = jax.random.split(rng, 4)
    variables = jax.jit(model.init)(
        params_rng, jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 3)))
    params, batch_stats = variables["params"], variables["batch_stats"]

    corpus = SIQADeviceCorpus(
        dict(dataset_opt, gt_size=gt_size, phase="train"))
    log(f"[asdqe] device-resident corpus: {corpus.describe()}")
    n_src = len(corpus)
    split = np.random.default_rng(seed).permutation(n_src)
    n_train = max(1, int(0.8 * n_src))
    train_src = split[:n_train]
    val_src = split[n_train:] if n_train < n_src else split[-1:]
    if n_train >= n_src:
        # ADVICE r3: with a single source pair the held-out "val" source
        # IS the train source — val_mse then measures training fit and
        # the plateau-LR / best-checkpoint signals are meaningless. Say
        # so loudly instead of silently contradicting the no-leakage
        # claim (real corpora should have n_src >= 2).
        log(f"[asdqe] WARNING: corpus has only {n_src} source pair(s); "
            "the val source OVERLAPS train — val_mse measures training "
            "fit, not generalization")

    spe = int(steps_per_epoch or accumulation_steps)
    n_val_batches = max(1, (len(val_src) * 13) // batch_size)

    base_tx = optax.adam(lr)
    tx = optax.MultiSteps(base_tx, every_k_schedule=accumulation_steps)
    opt_state = tx.init(params)
    step_fn = make_asdqe_train_step(model, tx, compute_dtype)
    plateau = ReduceLROnPlateau()

    def _eval(p, bs, lq, gt):
        if lq.dtype == jnp.uint8:  # the corpus emits uint8 batches
            lq = lq.astype(jnp.float32) / 255.0
            gt = gt.astype(jnp.float32) / 255.0
        return model.apply({"params": p, "batch_stats": bs},
                           lq, gt).reshape(-1)

    eval_fn = jax.jit(_eval)

    # deterministic held-out set: fixed ids + fixed corpus key per batch
    # (same crops/lambdas every epoch -> a clean plateau-LR signal)
    val_ids = [np.random.default_rng(seed + 1 + b).choice(
        val_src, size=batch_size) for b in range(n_val_batches)]
    val_keys = [jax.random.fold_in(val_rng, b) for b in range(n_val_batches)]

    history = []
    best_val = float("inf")
    for epoch in range(epochs):
        host_rng = np.random.default_rng(seed + 7919 * (epoch + 1))
        losses = []
        for k in range(spe):
            data_rng, k_data = jax.random.split(data_rng)
            ids = host_rng.choice(train_src, size=batch_size)
            lq, cand, score = corpus.sample_batch(k_data, ids, gt_size)
            dropout_rng, sub = jax.random.split(dropout_rng)
            params, batch_stats, opt_state, loss = step_fn(
                params, batch_stats, opt_state, lq, cand, score,
                sub, jnp.asarray(plateau.scale, jnp.float32))
            losses.append(float(loss))

        val_losses = []
        for b in range(n_val_batches):
            lq, cand, score = corpus.sample_batch(val_keys[b], val_ids[b],
                                                  gt_size)
            pred = eval_fn(params, batch_stats, lq, cand)
            val_losses.append(float(jnp.mean(jnp.square(pred - score))))

        train_l = float(np.mean(losses)) if losses else float("nan")
        val_l = float(np.mean(val_losses)) if val_losses else float("nan")
        plateau.step(val_l)
        history.append({"epoch": epoch, "train_mse": train_l,
                        "val_mse": val_l, "lr_scale": plateau.scale})
        log(f"[asdqe] epoch {epoch}: train_mse={train_l:.5f} "
            f"val_mse={val_l:.5f} lr_scale={plateau.scale:.3f}")
        if tracker is not None:
            # swanlab-protocol epoch metrics (Train/ASDQE.py:140-144)
            tracker.log({"train_epoch_mse": train_l, "val_epoch_mse": val_l,
                         "lr_scale": plateau.scale, "epoch": epoch},
                        step=epoch)
        if out_dir:
            save_weights(out_dir, epoch, {"params": params,
                                          "batch_stats": batch_stats})
            if val_l < best_val:
                best_val = val_l
                save_weights(out_dir, "best", {"params": params,
                                               "batch_stats": batch_stats})

    if tracker is not None:
        tracker.finish()
    return {"params": params, "batch_stats": batch_stats, "history": history}
