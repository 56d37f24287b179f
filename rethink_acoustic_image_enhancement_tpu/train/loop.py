"""The end-to-end training driver — config in, checkpoints out.

Equivalent of Train/basicsr/train.py main(): dataloaders, progressive
curriculum, logging, periodic checkpoint + validation, auto-resume. Runs
the compiled Trainer step; host work is limited to batch loading (threads)
and the stage lookup.

Validation is dict-aware (uses pred['hq'] for dict-output models) — the
reference's teacher validation crashes on dict outputs and was effectively
disabled via val_freq >> total_iter (SURVEY.md §3.5); fixed here.
"""

from __future__ import annotations

import os
import time
from typing import Any, Callable

import numpy as np

import jax
import jax.numpy as jnp

from ..data.datasets import create_dataset
from ..data.loader import BatchLoader, DevicePrefetcher, EnlargedShuffleSampler
from ..losses import build_loss
from ..metrics import get_metric
from ..models import build_network
from ..ops.layout import crop_to, pad_to_multiple
from ..utils.logging import MessageLogger, get_logger
from .checkpoints import (
    find_latest_checkpoint,
    load_reference_pth,
    load_weights,
    prune_checkpoints,
    restore_checkpoint,
    save_checkpoint,
    save_weights,
)
from .config import make_exp_dirs, validate
from .progressive import ProgressiveSchedule, subsample_batch
from .schedules import build_schedule
from .trainer import Trainer, build_optimizer


def _is_dict_batch(lq) -> bool:
    return isinstance(lq, dict)


def build_everything(opt: dict, mesh=None):
    """(model, params, trainer, schedule) from a parsed config."""
    validate(opt)
    model = build_network(opt["network_g"])
    train_opt = opt["train"]
    ds_opt = opt["datasets"]["train"]

    # init params at a small static shape
    rng = jax.random.PRNGKey(opt.get("manual_seed", 0))
    net_type = opt["network_g"]["type"]
    if net_type in ("KDLAE_teacher", "RestormerSuperResolutionParam2"):
        example = {"img": jnp.zeros((1, 16, 16, opt["network_g"].get(
            "inp_channels", 3))),
            "denoise_rate": jnp.zeros((1, 16, 16, 1))}
    elif net_type == "KDLAE_student":
        example = jnp.zeros((1, ds_opt.get("num_pairs", 7), 16, 16))
    else:
        example = jnp.zeros((1, 16, 16, opt["network_g"].get("inp_channels", 3)))
    # jit the init: one compiled program instead of hundreds of eager op
    # compiles — load-bearing in multi-process runs, where every compile
    # pays a distributed-coordination round trip (~3 s each on the 2-proc
    # CPU integration test; eager init would take tens of minutes)
    params = jax.jit(lambda r: model.init(r, example))(rng)["params"]

    # pretrained load (strict or merge). Accepts either a reference .pth
    # (converted via convert/) or one of our own orbax weight dirs
    # (net_g_* from save_weights) — the latter is how variant fine-tunes
    # (e.g. L2-Dice from the trained L1-Shadow teacher) chain runs, the
    # reference's strict_load_g:false workflow (base_model.py:246-279).
    load_path = opt.get("path", {}).get("pretrain_network_g")
    if load_path:
        param_key = opt["path"].get("param_key", "params")
        strict = opt["path"].get("strict_load_g", True)
        if os.path.isdir(load_path):
            from .checkpoints import merge_params_nonstrict

            source = load_weights(load_path, param_key)
            # load_weights falls back to the whole payload when param_key
            # is absent; a payload that still wraps a single weights key
            # (e.g. a bf16 export saved as {'params': tree}) must be
            # unwrapped or the merge below silently matches NOTHING and
            # the "fine-tune" trains from random init.
            if (isinstance(source, dict) and len(source) == 1
                    and next(iter(source)) in ("params", "params_ema")):
                only = next(iter(source))
                if only != param_key:
                    print(f"[load] pretrain payload has only {only!r} "
                          f"(asked for {param_key!r}) — using it")
                source = source[only]
            if strict:
                params = source
            else:
                # a fine-tune that matches <10% of leaves is a wrong
                # param_key / layout, not a variant init — fail loudly
                n_target = len(jax.tree.leaves(params))
                params = merge_params_nonstrict(
                    jax.device_get(params), jax.device_get(source),
                    min_matched=max(1, n_target // 10))
        else:
            params = load_reference_pth(
                load_path, net_type, target_params=params,
                param_key=param_key, strict=strict)
        params = jax.tree.map(jnp.asarray, params)

    schedule = build_schedule(train_opt["optim_g"]["lr"],
                              train_opt["scheduler"],
                              train_opt.get("warmup_iter", -1))
    loss_fn = build_loss(train_opt["pixel_opt"])
    mix = train_opt.get("mixing_augs", {})
    # mixed-precision training: bf16 activations, fp32 params/optimizer
    # (SURVEY §2.11 AMP row; the reference only autocasts the ASDQE
    # trainer, Train/ASDQE.py:104-121 — here the main loop gets it too)
    dtype_key = str(train_opt.get("compute_dtype", "float32")).lower()
    try:
        compute_dtype = {"float32": None, "fp32": None,
                         "bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16,
                         "float16": jnp.float16, "fp16": jnp.float16,
                         }[dtype_key]
    except KeyError:
        raise KeyError(f"train.compute_dtype {dtype_key!r} not one of "
                       "float32/bfloat16/float16") from None
    # `train.spatial_shard: N` shards image rows over a 'spatial' mesh
    # axis inside the train step (CP analog, SURVEY §5.7) — the only way
    # to parallelize the teacher's batch-1 curriculum stages on a pod.
    n_spatial = int(train_opt.get("spatial_shard", 1) or 1)
    # `train.model_shard: N` = tensor parallelism: conv channels shard
    # over a 'model' mesh axis (parallel.mesh.model_param_specs), batches
    # replicate across it. Mutually exclusive with spatial_shard (known
    # SPMD partitioner defect, see model_param_specs docstring).
    n_model = int(train_opt.get("model_shard", 1) or 1)
    if n_model > 1:
        if n_spatial > 1:
            raise ValueError("train.model_shard and train.spatial_shard "
                             "cannot be combined (XLA SPMD mis-partitions "
                             "feature-sharded convs under halo exchange)")
        if hasattr(model, "dwconv_shift") and not model.dwconv_shift:
            # grouped-conv kernel grads silently come out 4x-scaled under
            # a 'model' mesh axis (XLA SPMD defect, jax 0.9 — see
            # TransformerBlock.dwconv_shift); the shift-add depthwise form
            # has an identical param tree and exactly-partitionable grads
            model = model.clone(dwconv_shift=True)
        if mesh is None:
            from ..parallel.mesh import make_mesh

            mesh = make_mesh(n_model=n_model)
    spatial_axis = None
    if n_spatial > 1:
        # XLA's SPMD conv gradients require >= 1 row per shard at the
        # deepest feature map (measured: over-sharding the latent level
        # silently zeroes dwconv grads). Teacher U-Net downsamples 8x,
        # student 4x; the binding size is the SMALLEST curriculum crop.
        down = 4 if net_type == "KDLAE_student" else 8
        sizes = ds_opt.get("gt_sizes") or [ds_opt.get("gt_size", 0)]
        min_h = min(int(s) for s in sizes if s) // down
        if min_h and min_h < n_spatial:
            raise ValueError(
                f"train.spatial_shard={n_spatial} over-shards the deepest "
                f"feature map ({min_h} rows at the smallest curriculum "
                f"crop): need spatial_shard <= {min_h}")
        if mesh is None:
            from ..parallel.mesh import make_mesh

            mesh = make_mesh(n_spatial=n_spatial)
        spatial_axis = 2 if net_type == "KDLAE_student" else 1
    trainer = Trainer(
        apply_fn=lambda p, lq: model.apply({"params": p}, lq),
        loss_fn=loss_fn,
        optimizer=build_optimizer(train_opt, schedule, params=params),
        schedule=schedule,
        mesh=mesh,
        spatial_axis=spatial_axis,
        ema_decay=train_opt.get("ema_decay", 0.0),
        mixup=mix.get("mixup", False),
        mixup_beta=mix.get("mixup_beta", 1.2),
        mixup_identity=mix.get("use_identity", False),
        scale=opt.get("scale", 1),
        gt_size=ds_opt.get("gt_size", 0),
        loss_takes_rng=train_opt["pixel_opt"].get("reduction") == "mix",
        compute_dtype=compute_dtype,
    )
    return model, params, trainer, schedule


def validate_model(model, params, val_loader, opt,
                   max_items: int | None = None,
                   save_dir: str | None = None) -> dict[str, float]:
    """Dict-aware validation: pad to window_size, forward, crop, metrics.

    Honors the reference val options (image_restoration_model.py:264-348):
    ``use_image`` computes metrics on uint8-quantized images, ``save_img``
    (via ``save_dir``) writes predictions, ``max_minibatch`` caps items.
    """
    val_opt = opt.get("val", {})
    window = val_opt.get("window_size", 8)
    use_image = val_opt.get("use_image", False)
    if max_items is None and val_opt.get("max_minibatch"):
        max_items = int(val_opt["max_minibatch"])
    metric_cfgs = val_opt.get("metrics", {"psnr": {
        "type": "calculate_psnr", "crop_border": 0, "test_y_channel": False}})

    @jax.jit
    def fwd(params, lq):
        out = model.apply({"params": params}, lq)
        return jax.tree.map(lambda x: jnp.clip(x, 0.0, 1.0), out)

    sums = {name: 0.0 for name in metric_cfgs}
    # separate denominator for the *_sr metrics: only items that carry a
    # gt['sr'] contribute, so a mixed val set must not deflate psnr_sr
    sr_count = 0
    count = 0
    for batch in val_loader:
        lq, gt = batch["lq"], batch["gt"]
        pred_sr = target_sr = None
        if _is_dict_batch(lq):
            img = jnp.asarray(lq["img"])
            h, w = img.shape[1:3]
            img, _ = pad_to_multiple(img, window)
            rate, _ = pad_to_multiple(jnp.asarray(lq["denoise_rate"]), window)
            out = fwd(params, {"img": img, "denoise_rate": rate})
            if not isinstance(out, dict):
                out = {"hq": out, "sr": None}
            pred = crop_to(out["hq"], h, w)
            # SR branch (train.py:420-426 scores sr at hardcoded scale 2);
            # present only when static='train' and the val set carries gt sr
            if out.get("sr") is not None and isinstance(gt, dict) \
                    and gt.get("sr") is not None:
                pred_sr = np.asarray(crop_to(out["sr"], 2 * h, 2 * w))
                target_sr = np.asarray(gt["sr"])
            target = np.asarray(gt["hq"] if isinstance(gt, dict) else gt)
        else:
            x = jnp.asarray(lq)
            axes = (2, 3) if x.ndim == 4 and x.shape[-1] not in (1, 3) else (1, 2)
            h, w = x.shape[axes[0]], x.shape[axes[1]]
            x, _ = pad_to_multiple(x, window, axes=axes)
            pred = fwd(params, x)
            pred = crop_to(pred, h, w, axes=axes)
            target = np.asarray(gt)
        pred = np.asarray(pred)
        for b in range(pred.shape[0]):
            p_img, t_img = pred[b], target[b]
            if use_image:
                # metrics on quantized uint8 images, like the reference's
                # tensor2img path (use_image: true)
                from ..utils.image_io import to_ubyte

                p_img = to_ubyte(p_img).astype(np.float32)
                t_img = to_ubyte(t_img).astype(np.float32)
            if save_dir is not None:
                from ..utils.image_io import imwrite

                name0 = os.path.basename(str(batch.get(
                    "lq_path", [f"item{count}"])[b]))
                out_img = p_img if p_img.ndim != 3 or p_img.shape[-1] in (1, 3) \
                    else p_img[p_img.shape[0] // 2][..., None]
                imwrite(os.path.join(save_dir, name0),
                        out_img / 255.0 if use_image else out_img)
            ps_img = ts_img = None
            if pred_sr is not None:
                sr_count += 1
                ps_img, ts_img = pred_sr[b], target_sr[b]
                if use_image:
                    from ..utils.image_io import to_ubyte

                    ps_img = to_ubyte(ps_img).astype(np.float32)
                    ts_img = to_ubyte(ts_img).astype(np.float32)
            for name, cfg in metric_cfgs.items():
                cfg = dict(cfg)
                fn = get_metric(cfg.pop("type"))
                if p_img.ndim == 3 and p_img.shape[-1] not in (1, 3):
                    # frame stack (F, H, W): score frame-wise mean
                    vals = [fn(p_img[f][..., None], t_img[f][..., None], **cfg)
                            for f in range(p_img.shape[0])]
                    sums[name] += float(np.mean(vals))
                else:
                    sums[name] += float(fn(p_img, t_img, **cfg))
                if ps_img is not None:
                    sums[f"{name}_sr"] = sums.get(f"{name}_sr", 0.0) + float(
                        fn(ps_img, ts_img, **cfg))
            count += 1
        if max_items is not None and count >= max_items:
            break
    if count == 0:
        # an empty val loader must not report metric=0.0 as if it were a
        # score (e.g. a temporal val set whose stride_range can't form a
        # single num_pairs group from short sequences)
        import warnings

        warnings.warn("validation loader yielded 0 items — no metrics "
                      "computed (check the val dataset's pairing options)")
        return {}
    return {k: v / max(sr_count if k.endswith("_sr") else count, 1)
            for k, v in sums.items()}


def train_from_config(opt: dict, mesh=None, max_iters: int | None = None,
                      log_fn: Callable[[str], None] | None = None,
                      profile_steps: int = 0) -> Any:
    """Full training run. ``max_iters`` overrides total_iter (smoke runs).

    ``profile_steps > 0`` captures a jax.profiler device trace of that
    many steady-state steps (starting 3 steps in, past compilation) into
    ``<log>/profile`` and logs the per-hlo_category time split — the
    §5.1 observability the reference lacks entirely.
    """
    make_exp_dirs(opt)
    logger = get_logger("raie", opt["path"].get("log"))
    log = log_fn or logger.info

    model, params, trainer, schedule = build_everything(opt, mesh)
    state = trainer.init_state(params)

    # config-driven ONLINE distillation: a frozen teacher generates the
    # student's targets in the loop, so no teacher-output corpus has to be
    # materialized. The reference only distills offline (KDLAES.yml:16
    # points dataroot_gt at the teacher's denoised folder).
    #   train.distill: {online: true, teacher: <network_g dict>,
    #                   teacher_weights: <orbax dir | reference .pth>,
    #                   denoise_rate: 1.0}
    online_target_fn = None
    distill_cfg = opt["train"].get("distill") or {}
    if distill_cfg.get("online"):
        from .distill import make_online_target_fn

        teacher = build_network(distill_cfg["teacher"])
        tw = distill_cfg["teacher_weights"]
        if str(tw).endswith(".pth"):
            tparams = load_reference_pth(
                tw, distill_cfg["teacher"]["type"],
                param_key=distill_cfg.get("param_key", "params"))
        else:
            tparams = load_weights(tw, distill_cfg.get("param_key", "params"))
        online_target_fn = make_online_target_fn(
            teacher, jax.tree.map(jnp.asarray, tparams),
            denoise_rate=distill_cfg.get("denoise_rate", 1.0))
        log("online distillation: frozen teacher targets in the loop")

    ds_opt = opt["datasets"]["train"]
    device_resident = bool(ds_opt.get("device_resident"))
    if device_resident:
        # whole corpus in HBM, batches generated on device — per-iter H2D
        # is a PRNG key + group ids (see train/device_corpus.py)
        if jax.process_count() > 1:
            raise NotImplementedError(
                "device_resident corpora are single-process; multi-host "
                "runs feed from the host pipeline")
        from .device_corpus import StudentDeviceCorpus, TeacherDeviceCorpus

        dstype = ds_opt.get("type")
        # the trainer's mesh makes sampling SPMD on multi-device hosts:
        # the corpus replicates over the mesh and each device generates
        # its own 'data'-shard of the batch (no post-sample reshard)
        if dstype == "Dataset_PairedMutiImage":
            corpus = StudentDeviceCorpus(ds_opt, mesh=trainer.mesh)
            desc = (f"{int(corpus.lq.shape[0])} frames at "
                    f"{corpus.frame_hw}, {len(corpus)} groups in HBM")
        elif dstype in ("Dataset_SuperRestoration_param",
                        "Dataset_SuperRestoration"):
            corpus = TeacherDeviceCorpus(ds_opt, mesh=trainer.mesh)
            desc = corpus.describe()
        else:
            raise NotImplementedError(
                "device_resident supports Dataset_PairedMutiImage and "
                f"Dataset_SuperRestoration[_param]; got {dstype!r}")
        dataset, loader = None, None
        log(f"device-resident corpus: {desc}")
    else:
        dataset = create_dataset(ds_opt)
        sampler = EnlargedShuffleSampler(
            len(dataset), ratio=ds_opt.get("dataset_enlarge_ratio", 1),
            rank=jax.process_index(), world_size=jax.process_count(),
            shuffle=ds_opt.get("use_shuffle", True),
            seed=opt.get("manual_seed", 0))
        loader = BatchLoader(dataset, ds_opt["batch_size_per_gpu"], sampler,
                             num_workers=ds_opt.get("num_worker_per_gpu", 4),
                             drop_last=ds_opt.get("drop_last", True))
    prog = ProgressiveSchedule.from_dataset_opt(ds_opt)

    total_iters = int(max_iters or opt["train"]["total_iter"])
    logger_cfg = opt.get("logger", {})
    print_freq = logger_cfg.get("print_freq", 200)
    ckpt_freq = int(logger_cfg.get("save_checkpoint_freq", 2000))
    val_freq = int(opt.get("val", {}).get("val_freq", 0) or 0)

    # auto-resume
    start_epoch = 0
    states_dir = opt["path"].get("training_states")
    if states_dir and opt["path"].get("resume_state", "auto") is not None:
        latest = find_latest_checkpoint(states_dir)
        if latest is not None:
            state, start_epoch = restore_checkpoint(states_dir, latest, state)
            log(f"auto-resumed from iteration {latest}")

    log_dir = opt["path"].get("log")
    # remote experiment tracker (logger.wandb / logger.swanlab project
    # keys; lib-gated, rank-0 only — the reference's tb->wandb sync,
    # logger.py:87-105). Off when project is null, like the shipped yamls.
    from ..utils.tracking import make_tracker

    remote = make_tracker(logger_cfg, opt.get("name", "raie"), config=opt)
    msg_logger = MessageLogger(
        total_iters, start_iter=int(state.step), log=log,
        tb_log_dir=(os.path.join(log_dir, "tb") if log_dir
                    and logger_cfg.get("use_tb_logger") else None),
        # tracker-agnostic metrics sink (wandb/swanlab analog, logger.py:87-105)
        jsonl_path=(os.path.join(log_dir, "metrics.jsonl")
                    if log_dir and jax.process_index() == 0 else None),
        remote=remote)
    # the step key is an SPMD-replicated input and MUST be identical on
    # every process (per-example randomness diversifies through the
    # position-dependent bits of the sharded ops, not through the key);
    # a per-rank key (the reference's seed+rank, train.py:89) would feed
    # the compiled program inconsistent "replicated" values and silently
    # diverge the replicas
    rng = jax.random.PRNGKey(opt.get("manual_seed", 0))
    current_iter = int(state.step)
    epoch = start_epoch
    host_rng = np.random.default_rng(opt.get("manual_seed", 0))

    val_loader = None
    if val_freq and "val" in opt.get("datasets", {}):
        val_ds = create_dataset(opt["datasets"]["val"])
        if len(val_ds) == 0:
            log("WARNING: validation dataset is EMPTY — every validation "
                "will be skipped (check pairing options, e.g. a "
                "stride_range too wide for the sequence length)")
        val_loader_factory = lambda: BatchLoader(
            val_ds, 1, EnlargedShuffleSampler(len(val_ds), shuffle=False),
            num_workers=1, drop_last=False)
        val_loader = val_loader_factory

    # double-buffered host->device pipeline: the prefetch thread places
    # array leaves on the trainer's mesh while the previous step computes
    # (the CUDAPrefetcher equivalent; critical here — tunnel H2D is slow)
    from ..data.loader import device_put_batch

    # multi-process + progressive curriculum: the stage subsample must run
    # on the host-local shard BEFORE global-array assembly (indexing a
    # global array would gather non-addressable shards), so placement
    # moves after the subsample in that mode (single trade: no prefetch
    # overlap of H2D — multi-host pods feed full batches anyway)
    late_place = jax.process_count() > 1 and prog is not None

    # host-side progressive subsample INSIDE the prefetch thread: ship only
    # the stage's mini-batch rows, not the full loader batch (the reference
    # transfers the full batch then subsamples on-GPU, train.py:393-404 —
    # through this tunnel that means 6x the H2D and 6x the client leak at
    # the b1 stages). The thread counts consumed batches to know which
    # iteration each prefetched batch lands on; the counter resets per
    # epoch, so stage assignment can be off only by the prefetch depth
    # (<=2) at the exact stage-transition iterations.
    _prefetch_iter = [0]
    _prefetch_rng = np.random.default_rng(
        opt.get("manual_seed", 0) + 7919)

    def _put(b):
        if online_target_fn is not None:
            # the teacher generates gt on device — don't pay H2D (~38 MB/s
            # on this tunnel) for a target that's immediately discarded
            b = {k: v for k, v in b.items() if k != "gt"}
        if late_place:
            return b
        if prog is not None:
            _prefetch_iter[0] += 1
            mb, _, _ = prog.at(_prefetch_iter[0])
            bsz = jax.tree.leaves(b["lq"])[0].shape[0]
            if mb < bsz:
                idx = _prefetch_rng.choice(bsz, size=mb, replace=False)
                b = dict(b)
                b["lq"] = subsample_batch(b["lq"], idx)
                if b.get("gt") is not None:
                    b["gt"] = subsample_batch(b["gt"], idx)
        arrays = {k: v for k, v in b.items() if isinstance(v, np.ndarray)
                  or isinstance(v, dict)}
        rest = {k: v for k, v in b.items() if k not in arrays}
        placed = device_put_batch(trainer.mesh, arrays)
        return {**placed, **rest}

    profile_dir = (os.path.join(log_dir, "profile")
                   if profile_steps and log_dir else None)
    profile_start_iter = current_iter + 3  # past compile + donation warmup
    profiling_now = False

    def epoch_batches(ep: int):
        if device_resident:
            corpus.set_epoch(ep)
            perm = host_rng.permutation(len(corpus))
            bspg = int(ds_opt["batch_size_per_gpu"])
            return ({"device_group_ids": perm[s:s + bspg]}
                    for s in range(0, len(perm) - bspg + 1, bspg))
        loader.set_epoch(ep)
        _prefetch_iter[0] = current_iter  # re-sync the stage counter
        return DevicePrefetcher(iter(loader), put=_put)

    # stall watchdog (train.stall_timeout_s): a wedged accelerator client
    # blocks the main thread in C forever (observed: stale tunnel claim);
    # the daemon thread hard-exits so a segment supervisor can relaunch
    # into auto-resume. Size the timeout above the worst first-compile +
    # validation gap (remote compiles are minutes on this platform).
    watchdog = None
    stall_s = opt["train"].get("stall_timeout_s")
    if stall_s:
        from ..utils.watchdog import StallWatchdog

        watchdog = StallWatchdog(float(stall_s)).start()

    t_data = time.time()
    while current_iter < total_iters:
        for batch in epoch_batches(epoch):
            if current_iter >= total_iters:
                break
            current_iter += 1
            data_time = time.time() - t_data

            extra_prob, mini_gt = 0.0, 0
            if device_resident:
                # stage select, then generate the batch ON DEVICE at the
                # stage patch size (crop-of-a-crop == direct crop); the
                # trainer's extra-mask stage still applies mini_prob-base
                gids = batch["device_group_ids"]
                sample_gt = corpus.gt_size
                if prog is not None:
                    mb, sample_gt, mini_prob = prog.at(current_iter)
                    gids = gids[:min(mb, len(gids))]
                    extra_prob = max(mini_prob - prog.base_prob, 0.0)
                rng, sample_rng = jax.random.split(rng)
                lq, gt = corpus.sample_batch(sample_rng, gids,
                                             gt_size=sample_gt)
            else:
                lq, gt = batch["lq"], batch.get("gt")
                if prog is not None:
                    mb, mini_gt, mini_prob = prog.at(current_iter)
                    bsz = (jax.tree.leaves(lq)[0]).shape[0]
                    if mb < bsz:
                        idx = host_rng.choice(bsz, size=mb, replace=False)
                        lq = subsample_batch(lq, idx)
                        if gt is not None:
                            gt = subsample_batch(gt, idx)
                    extra_prob = max(mini_prob - prog.base_prob, 0.0)
            if late_place:
                placed = device_put_batch(
                    trainer.mesh,
                    {"lq": lq, **({"gt": gt} if gt is not None else {})})
                lq, gt = placed["lq"], placed.get("gt", gt)
            if online_target_fn is not None:
                # after subsampling: no teacher forwards on dropped rows
                if isinstance(lq, dict) or jnp.ndim(lq) != 4:
                    raise ValueError(
                        "train.distill.online expects a (B, F, H, W) frame-"
                        "stack dataset (Dataset_PairedMutiImage); got "
                        + ("a dict batch" if isinstance(lq, dict)
                           else f"ndim={jnp.ndim(lq)}"))
                gt = online_target_fn(jnp.asarray(lq))

            if profile_dir and not profiling_now \
                    and current_iter > profile_start_iter:
                jax.profiler.start_trace(profile_dir)
                profiling_now = True

            rng, step_rng = jax.random.split(rng)
            state, metrics = trainer.step(state, lq, gt, step_rng,
                                          extra_prob=extra_prob,
                                          mini_gt_size=mini_gt)

            if profiling_now and \
                    current_iter >= profile_start_iter + profile_steps:
                float(jax.tree.leaves(metrics)[0])  # drain the device queue
                jax.profiler.stop_trace()
                profiling_now = False
                profile_dir = None
                from ..utils.profiling import aggregate_trace

                agg = aggregate_trace(os.path.join(log_dir, "profile"))
                log("profile (ms by hlo_category over "
                    f"{profile_steps} steps): " + ", ".join(
                        f"{k}={v:.1f}" for k, v in list(agg.items())[:8]))
            iter_time = time.time() - t_data
            t_data = time.time()
            if watchdog is not None:
                watchdog.beat()

            if current_iter % print_freq == 0:
                msg_logger(epoch, current_iter,
                           {k: float(v) for k, v in metrics.items()},
                           iter_time, data_time)
            if ckpt_freq and current_iter % ckpt_freq == 0:
                # orbax saves are COLLECTIVE in multi-process runs (all
                # ranks join the finalization barrier; only the primary
                # host writes) — a rank-0-only gate would deadlock
                if states_dir:
                    save_checkpoint(states_dir, current_iter, state, epoch)
                    save_weights(opt["path"]["models"], current_iter,
                                 state.params, state.ema_params)
                    if jax.process_index() == 0:
                        log(f"saved checkpoint @ {current_iter}")
                        keep = int(logger_cfg.get("keep_checkpoints", 0) or 0)
                        gone = keep and prune_checkpoints(
                            states_dir, opt["path"]["models"], keep)
                        if gone:
                            log(f"rotated {len(gone)} old checkpoints")
            if val_freq and val_loader and current_iter % val_freq == 0:
                # the reference validates with the EMA net when present
                # (image_restoration_model.py:242-245)
                val_params = (state.ema_params if state.ema_params is not None
                              else state.params)
                scores = validate_model(model, val_params, val_loader(), opt)
                if not scores:
                    log(f"validation @ {current_iter}: SKIPPED "
                        "(val loader yielded 0 items)")
                else:
                    if msg_logger.jsonl is not None:
                        msg_logger.jsonl.write("val", current_iter, scores)
                    if remote is not None:
                        remote.log({f"metrics/{k}": v
                                    for k, v in scores.items()},
                                   step=current_iter)
                    log(f"validation @ {current_iter}: " + ", ".join(
                        f"{k}={v:.4f}" for k, v in scores.items()))
                if watchdog is not None:  # validation is a legitimate gap
                    watchdog.beat()
        epoch += 1

    if watchdog is not None:
        watchdog.stop()
    if profiling_now:  # run ended inside the profile window
        jax.profiler.stop_trace()

    if states_dir:
        save_checkpoint(states_dir, current_iter, state, epoch)
        save_weights(opt["path"]["models"], current_iter,
                     state.params, state.ema_params)
        if jax.process_index() == 0:
            log(f"training done @ {current_iter}")
    if remote is not None:
        remote.finish()
    return state
