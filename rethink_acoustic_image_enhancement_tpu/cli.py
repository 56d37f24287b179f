"""Command-line entry points.

Replaces the reference's scattered drivers (Train/basicsr/train.py CLI,
Train/basicsr/test.py, ASDQE/ASDQE_test.py __main__, the two inference
notebooks, utils/download_weights.py) with one CLI:

  raie train -opt cfg.yml            config-driven training (auto-resume)
  raie train-asdqe ...               ASDQE quality-scorer training
  raie test  -opt cfg.yml            config-driven offline eval
  raie infer-teacher ...             KDLAE-T whole-image denoise
  raie infer-student ...             KDLAE-S multi-frame denoise
  raie serve ...                     watch-folder serving daemon
  raie score ...                     ASDQE method-vs-origin protocol (CSV)
  raie convert ...                   reference .pth -> orbax checkpoint
  raie doctor                        deployment diagnostics (wedge-proof)
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _cmd_train(args) -> int:
    # multi-HOST init must precede any device use (the reference's
    # --launcher pytorch|slurm -> init_dist handshake, train.py:57-67);
    # flags win, else torchrun/SLURM env autodetection, else TPU-pod
    # metadata, else single-process
    from .parallel import init_distributed

    if args.launcher != "none" or args.coordinator or args.num_processes:
        init_distributed(coordinator_address=args.coordinator,
                         num_processes=args.num_processes,
                         process_id=args.process_id)

    import jax

    from .train.config import make_exp_dirs, parse, validate
    from .train.loop import train_from_config

    opt = parse(args.opt, is_train=True)
    validate(opt)
    if jax.process_index() == 0:
        make_exp_dirs(opt)
    if jax.process_count() > 1:
        print(f"multi-host: process {jax.process_index()}/"
              f"{jax.process_count()}, {jax.local_device_count()} local / "
              f"{jax.device_count()} global devices")
    # multi-chip DP needs no launcher flag (the torchrun-DDP analog):
    # Trainer auto-builds a data-axis mesh over all local devices when
    # none is passed (trainer.py) — surface that so the user sees it
    elif jax.device_count() > 1:
        print(f"data-parallel mesh over {jax.device_count()} devices")
    if args.stall_timeout:
        opt["train"]["stall_timeout_s"] = args.stall_timeout
    train_from_config(opt, max_iters=args.max_iters,
                      profile_steps=args.profile_steps)
    return 0


def _cmd_train_asdqe(args) -> int:
    """ASDQE scorer training entry (the reference ships this as the
    standalone-and-broken Train/ASDQE.py script — SURVEY.md §2.7)."""
    from .train.asdqe_trainer import train_asdqe

    if not args.param and not args.device_resident:
        print("error: --param is required unless --device-resident",
              file=sys.stderr)
        return 2
    tracker = None
    if args.swanlab_project:
        # swanlab experiment logging of the reference ASDQE trainer
        # (Train/ASDQE.py:71-84) — lib-gated: degrades to a warning +
        # no-op when the swanlab package is not installed
        from .utils.tracking import RemoteTracker

        tracker = RemoteTracker(
            "swanlab", args.swanlab_project, run_name="train-asdqe",
            config={"learning_rate": args.lr, "batch_size": args.batch_size,
                    "epochs": args.epochs, "optimizer": "Adam",
                    "loss_function": "MSE",
                    "model_architecture": "DenoiseRatePredictor"})
    result = train_asdqe(
        {"dataroot_lq": args.lq, "dataroot_gt": args.gt,
         "dataroot_param": args.param, "geometric_augs": True,
         "io_backend": {"type": "disk"}},
        lr=args.lr, epochs=args.epochs, batch_size=args.batch_size,
        accumulation_steps=args.accum, gt_size=args.gt_size,
        seed=args.seed, out_dir=args.out,
        max_steps_per_epoch=args.max_steps_per_epoch,
        h2d_uint8=(args.h2d == "uint8"),
        device_resident=args.device_resident,
        steps_per_epoch=args.steps_per_epoch,
        tracker=tracker)
    import math

    finite = [h["val_mse"] for h in result["history"]
              if not math.isnan(h["val_mse"])]
    if finite:  # an epoch with no val batches reports NaN — don't surface it
        print(f"best val MSE: {min(finite):.6f}")
    return 0


def _cmd_test(args) -> int:
    from .data.datasets import create_dataset
    from .data.loader import BatchLoader, EnlargedShuffleSampler
    from .models import build_network
    from .train.checkpoints import load_weights
    from .train.config import make_exp_dirs, parse, validate
    from .train.loop import validate_model

    opt = parse(args.opt, is_train=False)
    validate(opt)
    make_exp_dirs(opt)
    model = build_network(opt["network_g"])
    params = load_weights(args.weights or opt["path"]["pretrain_network_g"],
                          opt.get("path", {}).get("param_key", "params"))
    save_dir = None
    if opt.get("val", {}).get("save_img"):
        save_dir = opt["path"]["visualization"]
        os.makedirs(save_dir, exist_ok=True)
    for phase, ds_opt in opt["datasets"].items():
        ds = create_dataset(ds_opt)
        loader = BatchLoader(ds, 1, EnlargedShuffleSampler(len(ds),
                             shuffle=False), num_workers=1, drop_last=False)
        scores = validate_model(model, params, loader, opt, save_dir=save_dir)
        print(f"[{ds_opt.get('name', phase)}] " + ", ".join(
            f"{k}={v:.4f}" for k, v in scores.items()))
    return 0


def _tile_spec(s: str):
    """--tile / --tile-halo value: '256' (square) or '256x512'
    (rows x cols — strip modes; see denoise_tiled)."""
    if "x" in s:
        r, c = s.split("x", 1)
        return (int(r), int(c))
    return int(s)


def _load_params_any(path: str, arch: str, param_key: str):
    """Accept either a reference .pth or an orbax checkpoint dir."""
    from .train.checkpoints import load_reference_pth, load_weights

    if path.endswith(".pth"):
        return load_reference_pth(path, arch, param_key=param_key)
    return load_weights(path, param_key)


# In-repo model-zoo aliases for --weights (the reference's released-weight
# presets, README.md:103-110 / KDLAE-S.ipynb cell 2 US-vs-FLS split).
# Values: (repo-relative weights dir, default denoise_rate or None).
_ZOO = {
    "teacher": ("artifacts/kdlaet_full50k/weights/net_g_50000_bf16", 1.0),
    # the paper's L2-Dice teacher variant is served at denoise_rate 0.6
    # (KDLAE_T.ipynb cell 5 commentary; reference weight KDLAE_T_L2Dice.pth)
    "teacher-l2dice": ("artifacts/kdlaet_l2dice50k/weights/"
                       "net_g_50000_bf16", 0.6),
    "student-us": ("artifacts/kdlaes_full100k/weights/net_g_100000", None),
    # round-5 serving-aligned prob-0.05 fine-tune: 36.8 dB vs the
    # reference KDLAE-S_prob@0.05 goldens (was 26.2 with the raw 100k
    # high-prob weights — artifacts/kdlaes_flsft5k/posthoc_val.json)
    "student-fls": ("artifacts/kdlaes_flsft5k/weights/net_g_5000", None),
}


def _resolve_weights(spec: str) -> tuple[str, float | None]:
    """Map a zoo alias to its in-repo weights dir (+ serving preset);
    pass real paths through untouched."""
    if spec not in _ZOO:
        return spec, None
    rel, rate = _ZOO[spec]
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), rel)
    if not os.path.isdir(path):
        raise SystemExit(f"zoo alias '{spec}' resolves to {path}, which is "
                         "absent in this checkout — pass an explicit "
                         "--weights path instead")
    return path, rate


def _cmd_infer_teacher(args) -> int:
    from .eval.infer import TeacherPredictor
    from .utils.image_io import imwrite, list_images

    weights, preset_rate = _resolve_weights(args.weights)
    if args.denoise_rate is None:
        args.denoise_rate = preset_rate if preset_rate is not None else 1.0
        if preset_rate is not None and preset_rate != 1.0:
            print(f"[zoo] '{args.weights}' preset denoise_rate "
                  f"{preset_rate} (override with --denoise-rate)")
    params = _load_params_any(weights, "KDLAE_teacher", args.param_key)
    from .models import KDLAETeacher

    model = KDLAETeacher(layernorm_type=args.layernorm_type,
                         static="train" if args.sr else "test", params="cat")
    pred = TeacherPredictor(params=params, model=model,
                            shape_bucket=args.shape_bucket)
    paths = ([args.input] if os.path.isfile(args.input)
             else list_images(args.input))
    os.makedirs(args.output, exist_ok=True)

    def write(p, out):
        base = os.path.basename(p)
        imwrite(os.path.join(args.output, base), out["hq"])
        if args.sr and "sr" in out:
            imwrite(os.path.join(args.output, f"sr_{base}"), out["sr"])
        print(f"{p} -> {os.path.join(args.output, base)}")

    if args.tile:
        # tiled batched fast path (approximate: per-tile MDTA statistics;
        # quality-vs-halo study in docs/perf_plan.md + artifacts/tiled_ab)
        from .utils.image_io import imread_rgb_ubyte

        imgs = [imread_rgb_ubyte(p) for p in paths]
        outs = pred.denoise_tiled(imgs, denoise_rate=args.denoise_rate,
                                  tile=args.tile, halo=args.tile_halo)
        for p, out in zip(paths, outs):
            write(p, out)
        return 0

    if args.group_size > 1 and len(paths) > 1:
        _stream_groups(pred, paths, args.group_size, args.shape_bucket,
                       args.denoise_rate, write)
        return 0

    for p in paths:
        write(p, pred.denoise_file(p, denoise_rate=args.denoise_rate))
    return 0


def _stream_groups(pred, paths, group_size, shape_bucket, denoise_rate,
                   write, read=None, depth: int = 4,
                   fetch_workers: int = 2, upload_workers: int = 1) -> None:
    """Serving-group streaming: images sharing a compiled shape run
    through scan dispatches (bit-identical to per-image; see
    TeacherPredictor.denoise_group). Buffers hold at most group_size
    decoded images per distinct shape (+ ``depth`` groups in flight) —
    constant memory on arbitrarily large folders. ``read(path) ->
    image | None`` is injectable; a None skips the file (the serve
    daemon uses this to survive mid-copy or corrupt inputs).

    Four-stage pipeline over three host threads + the device:

      main: decode group k+2          (file IO + PNG decode)
      up-worker: prep + H2D + dispatch group k+1
      device: compute group k
      fw-worker: D2H fetch + PNG encode/write group k-1

    The D2H fetch must wait for group k-1's compute, so on the main
    thread it serializes with everything else (the measured residual of
    the two-stage pipeline: ~70 ms/img of fetch+encode/write at 512px);
    in its own worker it rides under group k's compute. ``depth`` bounds
    in-flight fetch groups (backpressure + error propagation); depth=0
    reproduces the serialized behavior for A/B. ``fetch_workers`` > 1
    lets group k-1's PNG encode/write proceed while group k's D2H fetch
    blocks on compute (the fetch thread is idle-waiting, not working).
    Round-4 same-session interleaved A/B (32x512px uint8, trained bf16
    teacher, artifacts/serve_depth_ab/ab.json): r3's depth2/fw1 ran at
    0.659x of the same-session device-side throughput; depth4/fw1
    0.727x; depth4/fw2 0.842x (the shipped default); depth6/fw2/up2
    regressed to 0.75x (dispatch contention) — so ``upload_workers``
    stays 1. The residual over device-side is tunnel-link transfer that
    cannot overlap itself (~38 MB/s, absent on a real TPU VM)."""
    from .utils.image_io import imread_rgb_ubyte

    # uint8 decode: the predictor ships 1 byte/px and converts in-jit
    # (same float values as the float reader, 4x less H2D; outputs agree
    # to <=1 quantization level)
    read = read or imread_rgb_ubyte

    def _key(shape):
        if shape_bucket:  # same padded program -> same group
            b = shape_bucket
            return (-(-shape[0] // b) * b, -(-shape[1] // b) * b)
        return shape[:2]

    from concurrent.futures import ThreadPoolExecutor

    up_ex = ThreadPoolExecutor(max_workers=max(1, upload_workers))
    fw_ex = ThreadPoolExecutor(max_workers=max(1, fetch_workers))
    pending: list = []  # fetch+write futures, oldest first

    def _fetch_write(grp_paths, fut):
        for p, out in zip(grp_paths, pred.fetch_group(fut.result())):
            write(p, out)

    def _drain():
        while pending:
            pending.pop(0).result()

    def _flush(items):
        imgs = [im for _, im in items]
        if getattr(pred, "scan_eligible", lambda *_: False)(imgs,
                                                            group_size):
            fut = up_ex.submit(pred.dispatch_group, imgs,
                               denoise_rate=denoise_rate)
            pending.append(fw_ex.submit(_fetch_write,
                                        [p for p, _ in items], fut))
            while len(pending) > max(depth, 0):
                pending.pop(0).result()
            return
        _drain()
        outs = pred.denoise_group(imgs, denoise_rate=denoise_rate,
                                  group_size=group_size)
        for (p, _), out in zip(items, outs):
            write(p, out)

    try:
        buffers: dict[tuple, list] = {}
        for p in paths:
            img = read(p)
            if img is None:
                continue
            buf = buffers.setdefault(_key(img.shape), [])
            buf.append((p, img))
            if len(buf) == group_size:
                _flush(buf)
                buf.clear()
        for buf in buffers.values():
            if buf:
                _flush(buf)
        _drain()
    finally:
        up_ex.shutdown(wait=True)
        fw_ex.shutdown(wait=True)
        # After an earlier exception, futures still in `pending` were only
        # awaited by the shutdowns above, which swallow their results —
        # surface any secondary failures (e.g. a write error) instead of
        # silently dropping groups (ADVICE r3 #3). The first exception
        # (propagating through this finally) stays primary; secondaries
        # are logged.
        for fut in pending:
            try:
                fut.result()
            except Exception as e:  # noqa: BLE001 - report, don't mask
                print(f"serve: pending group also failed: {e!r}",
                      file=sys.stderr)


def _cmd_serve(args) -> int:
    """Watch-folder serving daemon: poll --watch for new images, denoise
    them in scan groups, write results under --output with the same
    basenames. Idempotent and restart-safe — an input whose output file
    already exists is skipped, so a crashed/restarted daemon (or an
    overlapping batch run) never reprocesses work. ``--once`` drains the
    current backlog and exits; ``--max-seconds`` bounds the lifetime.
    (Production analog of the reference's notebook loop.)"""
    import time

    from .eval.infer import TeacherPredictor
    from .models import KDLAETeacher
    from .utils.image_io import imwrite, list_images

    if args.preflight_timeout > 0:
        # bounded backend preflight: the daemon's first jit would block
        # forever on a wedged accelerator claim — refuse to start instead
        # (probe the platform THIS process resolved to, so forced-CPU
        # runs/tests probe cpu, not the ambient tunnel)
        import jax

        from .utils.doctor import EXIT_BACKEND_DOWN, _probe_backend

        probe = _probe_backend(args.preflight_timeout, 1.0,
                               str(jax.config.jax_platforms or ""))
        if probe["status"] != "ok":
            print(f"[serve] backend {probe['status']}: {probe['detail']} "
                  "— refusing to start (see `raie doctor`)", file=sys.stderr)
            return EXIT_BACKEND_DOWN

    weights, preset_rate = _resolve_weights(args.weights)
    if args.denoise_rate is None:
        args.denoise_rate = preset_rate if preset_rate is not None else 1.0
    params = _load_params_any(weights, "KDLAE_teacher", args.param_key)
    model = KDLAETeacher(layernorm_type=args.layernorm_type,
                         static="train" if args.sr else "test", params="cat")
    pred = TeacherPredictor(params=params, model=model,
                            shape_bucket=args.shape_bucket)
    os.makedirs(args.output, exist_ok=True)
    sr_dir = os.path.join(args.output, "sr")
    if args.sr:
        os.makedirs(sr_dir, exist_ok=True)

    def _atomic_imwrite(path, img):
        # temp-file + rename so a killed daemon never leaves a truncated
        # output that the idempotency check would then treat as done
        # (keep the real extension so the encoder is inferred correctly)
        stem, ext = os.path.splitext(path)
        tmp = stem + ".part" + ext
        imwrite(tmp, img)
        os.replace(tmp, path)

    served = [0]

    def write(p, out):
        base = os.path.basename(p)
        # sr outputs live in their own subdir — a basename like
        # 'sr_x.png' in the watch folder can't collide with x.png's 2x
        # output or confuse the done-check
        if args.sr and "sr" in out:
            _atomic_imwrite(os.path.join(sr_dir, base), out["sr"])
        _atomic_imwrite(os.path.join(args.output, base), out["hq"])
        served[0] += 1
        print(f"{p} -> {os.path.join(args.output, base)}")

    def safe_read(p):
        from .utils.image_io import imread_rgb_ubyte

        try:
            return imread_rgb_ubyte(p)
        except Exception as exc:  # mid-copy / corrupt / vanished input
            print(f"[serve] skip {p}: {exc}")
            return None

    def _done(p):
        base = os.path.basename(p)
        if not os.path.exists(os.path.join(args.output, base)):
            return False
        return not args.sr or os.path.exists(os.path.join(sr_dir, base))

    def _stable(p):
        # skip files still being copied in: only pick up inputs untouched
        # for at least one poll interval (a truncated-but-decodable image
        # would otherwise be served once and then never repaired, because
        # the idempotent done-check skips it forever). --once drains a
        # static backlog, so no grace period there.
        if args.once:
            return True
        try:
            return time.time() - os.path.getmtime(p) >= args.poll_interval
        except OSError:  # vanished between listing and stat
            return False

    deadline = (time.time() + args.max_seconds
                if args.max_seconds is not None else None)
    while True:
        backlog = [p for p in list_images(args.watch)
                   if not _done(p) and _stable(p)]
        if backlog:
            try:
                if args.tile:
                    # tiled fast path (device-side 1.36x on real VMs;
                    # approximate — see infer-teacher --tile): bounded
                    # chunks keep memory flat on large backlogs
                    for b in range(0, len(backlog), 4 * args.group_size):
                        chunk = backlog[b:b + 4 * args.group_size]
                        imgs = [safe_read(p) for p in chunk]
                        pairs = [(p, im) for p, im in zip(chunk, imgs)
                                 if im is not None]
                        outs = pred.denoise_tiled(
                            [im for _, im in pairs],
                            denoise_rate=args.denoise_rate,
                            tile=args.tile, halo=args.tile_halo)
                        for (p, _), out in zip(pairs, outs):
                            write(p, out)
                else:
                    _stream_groups(pred, backlog, args.group_size,
                                   args.shape_bucket, args.denoise_rate,
                                   write, read=safe_read)
            except Exception as exc:
                # last-resort guard for unattended operation — a transient
                # XLA/tunnel runtime error must not kill the daemon;
                # completed outputs are durable, the rest retries next poll
                print(f"[serve] batch failed ({exc}); retrying next poll")
        if args.once:
            break
        if deadline is not None and time.time() >= deadline:
            break
        time.sleep(args.poll_interval)
    print(f"served {served[0]} image(s)")
    return 0


def _cmd_infer_student(args) -> int:
    from .eval.infer import StudentPredictor
    from .utils.image_io import imwrite

    weights, _ = _resolve_weights(args.weights)
    params = _load_params_any(weights, "KDLAE_student", args.param_key)
    pred = StudentPredictor(params=params, num_frames=args.frames)
    if args.all:
        out = pred.denoise_all_frames(args.input)
        first = 0
    else:
        out = pred.denoise_folder(args.input, start=args.start)
        first = args.start
    os.makedirs(args.output, exist_ok=True)
    for f in range(out.shape[0]):
        path = os.path.join(args.output, f"frame_{first + f:04d}.png")
        imwrite(path, out[f], rgb=False)
    print(f"{out.shape[0]} frames -> {args.output}")
    return 0


def _cmd_score(args) -> int:
    import jax

    from .eval.asdqe_eval import default_methods, run_asdqe_eval
    from .eval.infer import ASDQEScorer

    if args.weights and args.weights.endswith(".pth"):
        from .train.checkpoints import load_reference_pth

        params, batch_stats = load_reference_pth(
            args.weights, "DenoiseRatePredictor", param_key=None)
        import jax.numpy as jnp

        params = jax.tree.map(jnp.asarray, params)
        batch_stats = jax.tree.map(jnp.asarray, batch_stats)
    else:
        # orbax checkpoint, or (no --weights) the shipped trained scorer;
        # load_asdqe_weights owns the payload-layout unwrap (ADVICE r3 #4)
        from .train.checkpoints import load_asdqe_weights

        loaded = load_asdqe_weights(args.weights or None)
        if loaded is None:
            missing = (args.weights or "no --weights given and the "
                       "in-repo trained scorer is absent")
            print(f"error: checkpoint not found: {missing}",
                  file=sys.stderr)
            return 2
        params, batch_stats = loaded
    scorer = ASDQEScorer(variables={
        "params": params, "batch_stats": batch_stats})

    if args.methods:
        methods = dict(m.split("=", 1) for m in args.methods)
        base = args.lq_dir
    else:
        base, methods = default_methods(args.sample_root, args.dataset)
    run_asdqe_eval(scorer, base, methods, csv_path=args.csv)
    return 0


def _cmd_convert(args) -> int:
    import orbax.checkpoint as ocp

    from .convert.torch_import import CONVERTERS, load_pth_state_dict

    if args.reverse:
        # orbax -> .pth (the exact inverse; reference tooling can consume
        # checkpoints trained here, base_model.py:213-244 layout)
        from .convert.torch_export import save_pth

        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(os.path.abspath(args.out))
        save_pth(args.pth, restored.get("params", restored), args.arch,
                 ema_params=restored.get("params_ema"),
                 batch_stats=restored.get("batch_stats"))
        print(f"exported {args.out} [{args.arch}] -> {args.pth}")
        return 0

    sd = load_pth_state_dict(args.pth, args.param_key)
    converted = CONVERTERS[args.arch](sd)
    ckptr = ocp.StandardCheckpointer()
    if args.arch == "DenoiseRatePredictor":
        params, batch_stats = converted
        payload = {"params": params, "batch_stats": batch_stats}
    else:
        payload = {"params": converted}
    out = os.path.abspath(args.out)
    ckptr.save(out, payload, force=True)
    ckptr.wait_until_finished()
    print(f"converted {args.pth} [{args.arch}] -> {out}")
    return 0


def _cmd_doctor(args) -> int:
    # all device interaction runs in a timeout-bounded child process —
    # a wedged tunnel claim yields a diagnosis, not a hang (utils/doctor)
    import time

    from .utils.doctor import EXIT_BACKEND_DOWN, format_report, run_doctor

    deadline = time.monotonic() + args.wait
    while True:
        report = run_doctor(probe_timeout=args.probe_timeout,
                            bandwidth_mb=args.bandwidth_mb,
                            platform=args.platform)
        healthy = report["backend"]["status"] == "ok"
        remaining = deadline - time.monotonic()
        if healthy or remaining <= 0:
            break
        # --wait: supervisor gate — keep polling until the backend comes
        # back (observed wedges clear server-side after a while) or the
        # budget runs out, then report the last probe
        print(f"[doctor] backend {report['backend']['status']}; "
              f"retrying ({remaining:.0f}s of --wait left)",
              file=sys.stderr)
        time.sleep(min(args.poll_interval, max(1.0, remaining)))
    if args.json:
        print(json.dumps(report))
    else:
        print(format_report(report))
    return 0 if healthy else EXIT_BACKEND_DOWN


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="raie", description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("train", help="config-driven training")
    p.add_argument("-opt", required=True)
    p.add_argument("--max-iters", type=int, default=None)
    p.add_argument("--profile-steps", type=int, default=0,
                   help="capture a device trace of N steady-state steps "
                        "and log the hlo_category time split")
    p.add_argument("--launcher", choices=["none", "env", "tpu", "slurm"],
                   default="none",
                   help="multi-host init: 'env' reads torchrun/SLURM env "
                        "vars, 'tpu' uses pod metadata, 'slurm' is an "
                        "alias of env (reference --launcher, train.py:60)")
    p.add_argument("--coordinator", default=None,
                   help="coordinator host:port (e.g. host0:29500)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--stall-timeout", type=float, default=0,
                   help="hard-exit (code 17) when no training iteration "
                        "completes for N seconds — a wedged accelerator "
                        "client blocks in C and cannot raise; a segment "
                        "supervisor relaunches into auto-resume. Size "
                        "above the worst compile+validation gap.")
    p.set_defaults(fn=_cmd_train)

    p = sub.add_parser("train-asdqe", help="ASDQE quality-scorer training")
    p.add_argument("--lq", required=True, help="noisy-image dir")
    p.add_argument("--gt", required=True, help="result-image dir")
    p.add_argument("--param", default=None,
                   help="per-image JSON score dir (unused with "
                        "--device-resident, where score = mix rate)")
    p.add_argument("--out", required=True, help="checkpoint output dir")
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--accum", type=int, default=32)
    p.add_argument("--gt-size", type=int, default=256)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max-steps-per-epoch", type=int, default=None)
    p.add_argument("--h2d", choices=("uint8", "f32"), default="uint8",
                   help="device input boundary (uint8 = 4x less transfer)")
    p.add_argument("--device-resident", action="store_true",
                   help="generate graded candidates in HBM "
                        "(SIQADeviceCorpus; per-iter H2D = key + ids)")
    p.add_argument("--swanlab-project", default=None,
                   help="log per-epoch metrics to this swanlab project "
                        "(Train/ASDQE.py:71-84 analog; lib-gated)")
    p.add_argument("--steps-per-epoch", type=int, default=None,
                   help="virtual epoch size for --device-resident "
                        "(default: one optimizer update, i.e. --accum)")
    p.set_defaults(fn=_cmd_train_asdqe)

    p = sub.add_parser("test", help="config-driven offline eval")
    p.add_argument("-opt", required=True)
    p.add_argument("--weights", default=None)
    p.set_defaults(fn=_cmd_test)

    p = sub.add_parser("infer-teacher", help="KDLAE-T whole-image denoise")
    p.add_argument("--weights", required=True,
                   help="checkpoint path, or a zoo alias: "
                        + " / ".join(k for k in _ZOO if "teacher" in k))
    p.add_argument("--input", required=True, help="image file or folder")
    p.add_argument("--output", required=True)
    p.add_argument("--denoise-rate", type=float, default=None,
                   help="conditioning strength (default 1.0; the "
                        "teacher-l2dice zoo alias presets 0.6 per the "
                        "reference notebook)")
    p.add_argument("--sr", action="store_true", help="also emit the 2x output")
    p.add_argument("--layernorm-type", default="BiasFree")
    p.add_argument("--param-key", default="params")
    p.add_argument("--group-size", type=int, default=1,
                   help=">1 scans same-shape images through one dispatch "
                        "(throughput mode, numerics unchanged)")
    p.add_argument("--shape-bucket", type=int, default=None,
                   help="round padded sizes up to this grid so mixed-size "
                        "folders share compiled programs (approximate; "
                        "see docs)")
    p.add_argument("--tile", type=_tile_spec, default=None,
                   help="tiled batched serving: split frames into TILE-px "
                        "interiors batched 8/dispatch (measured 1.36x "
                        "device throughput at 512px; approximate — "
                        "per-tile attention stats, see docs/perf_plan.md)")
    p.add_argument("--tile-halo", type=_tile_spec, default=0,
                   help="context ring around each tile interior (px, or "
                        "ROWSxCOLS per-axis, e.g. 8x0 for strip modes); 0 "
                        "(default) = full measured speed, golden-"
                        "equivalent quality; >0 trades throughput for "
                        "whole-image fidelity (+24%% time at 8)")
    p.set_defaults(fn=_cmd_infer_teacher)

    p = sub.add_parser("serve", help="watch-folder serving daemon")
    p.add_argument("--weights", required=True,
                   help="checkpoint path, or a zoo alias: "
                        + " / ".join(k for k in _ZOO if "teacher" in k))
    p.add_argument("--watch", required=True, help="input folder to poll")
    p.add_argument("--output", required=True)
    p.add_argument("--denoise-rate", type=float, default=None)
    p.add_argument("--sr", action="store_true")
    p.add_argument("--layernorm-type", default="BiasFree")
    p.add_argument("--param-key", default="params")
    p.add_argument("--group-size", type=int, default=8)
    p.add_argument("--shape-bucket", type=int, default=None)
    p.add_argument("--poll-interval", type=float, default=2.0)
    p.add_argument("--once", action="store_true",
                   help="drain the current backlog and exit")
    p.add_argument("--max-seconds", type=float, default=None)
    p.add_argument("--preflight-timeout", type=float, default=120.0,
                   help="bounded backend probe before starting (a wedged "
                        "accelerator claim would hang the first jit "
                        "forever); 0 disables")
    p.add_argument("--tile", type=_tile_spec, default=None,
                   help="tiled batched serving (see infer-teacher --tile)")
    p.add_argument("--tile-halo", type=_tile_spec, default=0)
    p.set_defaults(fn=_cmd_serve)

    p = sub.add_parser("infer-student", help="KDLAE-S multi-frame denoise")
    p.add_argument("--weights", required=True,
                   help="checkpoint path, or a zoo alias: "
                        + " / ".join(k for k in _ZOO if "student" in k))
    p.add_argument("--input", required=True, help="frame folder")
    p.add_argument("--output", required=True)
    p.add_argument("--frames", type=int, default=7)
    p.add_argument("--start", type=int, default=0)
    p.add_argument("--all", action="store_true",
                   help="denoise EVERY frame in the folder (consecutive "
                        "stacks, overlapping tail) instead of one stack "
                        "at --start")
    p.add_argument("--param-key", default="params")
    p.set_defaults(fn=_cmd_infer_student)

    p = sub.add_parser("score", help="ASDQE scoring protocol")
    p.add_argument("--weights", default=None,
                   help="scorer checkpoint (orbax dir or .pth); default: "
                        "the in-repo trained scorer "
                        "(artifacts/asdqe_full50ep/weights/net_g_best)")
    p.add_argument("--sample-root", default="Sample")
    p.add_argument("--dataset", default="MDD")
    p.add_argument("--lq-dir", default=None)
    p.add_argument("--methods", nargs="*", default=None,
                   help="name=dir pairs (default: reference protocol)")
    p.add_argument("--csv", default="stats_transposed.csv")
    p.set_defaults(fn=_cmd_score)

    p = sub.add_parser("convert",
                       help="reference .pth <-> orbax checkpoint")
    p.add_argument("--pth", required=True,
                   help="the .pth side (input, or output with --reverse)")
    p.add_argument("--arch", required=True,
                   choices=["KDLAE_teacher", "RestormerSuperResolutionParam2",
                            "Restormer", "KDLAE_student",
                            "DenoiseRatePredictor"])
    p.add_argument("--out", required=True,
                   help="the orbax side (output, or input with --reverse)")
    p.add_argument("--param-key", default="params")
    p.add_argument("--reverse", action="store_true",
                   help="export: orbax checkpoint dir -> reference-layout "
                        ".pth (params + params_ema when present)")
    p.set_defaults(fn=_cmd_convert)

    p = sub.add_parser("doctor", help="deployment diagnostics: backend "
                       "health, dispatch overhead, transfer bandwidth "
                       "(wedge-proof — bounded child-process probe)")
    p.add_argument("--probe-timeout", type=float, default=120.0,
                   help="seconds before declaring the backend wedged")
    p.add_argument("--bandwidth-mb", type=float, default=8.0,
                   help="transfer probe size (one H2D + one D2H)")
    p.add_argument("--platform", default="",
                   help="diagnose a specific jax platform (e.g. 'cpu') "
                        "instead of the ambient backend")
    p.add_argument("--wait", type=float, default=0.0,
                   help="keep re-probing an unhealthy backend for up to "
                        "N seconds (supervisor gate: exit 0 the moment "
                        "it answers)")
    p.add_argument("--poll-interval", type=float, default=300.0,
                   help="seconds between --wait probes")
    p.add_argument("--json", action="store_true")
    p.set_defaults(fn=_cmd_doctor)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
