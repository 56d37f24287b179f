"""Deployment diagnostics (`raie doctor`).

The reference ships no health tooling (SURVEY §5.1/§5.3: its failure
story is auto-resume only); on a tunnel-attached TPU the failure modes
that actually bit during bring-up are invisible until a job hangs:

  * a WEDGED backend claim — every ``jax.devices()`` blocks forever in
    the PJRT client, env overrides included (CLAUDE.md);
  * tunnel transfer throughput collapsing to ~38 MB/s (vs GB/s on a real
    TPU VM), which silently turns data-bound training unrunnable;
  * the per-dispatch tunnel overhead (~1.2 ms) that makes single-op
    micro-benchmarks meaningless.

``run_doctor`` measures all of that WITHOUT risking the calling process:
every device interaction runs in a throwaway child process under a hard
timeout (the same guard as ``__graft_entry__`` and ``bench.py``), so a
wedged tunnel yields a diagnosis instead of a hang.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

#: exit code for `raie doctor` when the backend is wedged/unavailable
EXIT_BACKEND_DOWN = 2

_CHILD_FLAG = "--_doctor-child"


def _child_main(bandwidth_mb: float, platform: str = "") -> None:
    """Runs in the throwaway subprocess: full device diagnostic, one JSON
    line on stdout. Anything here may block on a wedged tunnel — the
    parent enforces the timeout."""
    import time

    import numpy as np

    import jax
    import jax.numpy as jnp

    if platform:
        # env overrides are dead on this image (a sitecustomize bakes the
        # platform at interpreter start) — jax.config before first device
        # use is the only lever (CLAUDE.md)
        jax.config.update("jax_platforms", platform)

    out: dict = {}
    devs = jax.devices()
    out["platform"] = devs[0].platform
    out["n_devices"] = len(devs)
    out["device_kind"] = devs[0].device_kind
    out["process_count"] = jax.process_count()

    # compile + dispatch smoke: tiny matmul, sync via scalar fetch
    # (block_until_ready is a no-op on the axon platform — CLAUDE.md)
    x = jnp.ones((128, 128), jnp.float32)
    f = jax.jit(lambda a: a @ a)
    t0 = time.perf_counter()
    float(f(x).mean())
    out["first_call_s"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    n = 10
    for _ in range(n):
        float(f(x).mean())
    out["dispatch_ms"] = round((time.perf_counter() - t0) / n * 1e3, 3)

    # transfer bandwidth: one H2D + one D2H of `bandwidth_mb` uint8.
    # NB: the axon tunnel client leaks H2D buffers host-side (~1x bytes
    # transferred, CLAUDE.md) — one bounded probe is fine, a loop is not.
    nbytes = int(bandwidth_mb * 1e6)
    host = np.zeros(nbytes, np.uint8)
    t0 = time.perf_counter()
    dev = jax.device_put(host)
    int(dev[-1])  # scalar fetch = transfer actually landed
    h2d_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(dev)
    d2h_s = time.perf_counter() - t0
    out["h2d_mbps"] = round(nbytes / 1e6 / h2d_s, 1)
    out["d2h_mbps"] = round(nbytes / 1e6 / d2h_s, 1)
    print(json.dumps(out))


def _probe_backend(probe_timeout: float, bandwidth_mb: float,
                   platform: str = "") -> dict:
    """Run the device diagnostic in a child process under a timeout."""
    try:
        proc = subprocess.run(
            [sys.executable, "-m",
             "rethink_acoustic_image_enhancement_tpu.utils.doctor",
             _CHILD_FLAG, str(bandwidth_mb), platform],
            capture_output=True, text=True, timeout=probe_timeout)
    except subprocess.TimeoutExpired:
        return {"status": "wedged",
                "detail": f"no answer within {probe_timeout:.0f}s — a "
                          "stale tunnel claim blocks backend init "
                          "indefinitely; wait it out or check the tunnel"}
    if proc.returncode != 0:
        tail = (proc.stderr or proc.stdout or "").strip().splitlines()
        return {"status": "error",
                "detail": tail[-1] if tail else f"rc={proc.returncode}"}
    try:
        info = json.loads(proc.stdout.strip().splitlines()[-1])
    except (ValueError, IndexError):
        return {"status": "error", "detail": "unparseable child output"}
    info["status"] = "ok"
    return info


def run_doctor(probe_timeout: float = 120.0,
               bandwidth_mb: float = 8.0, platform: str = "") -> dict:
    """Collect the full diagnostic report (host facts + bounded backend
    probe). Never blocks past ``probe_timeout``."""
    import jax  # version metadata only — no backend init host-side

    report: dict = {
        "python": sys.version.split()[0],
        "jax": jax.__version__,
        "host_cpus": os.cpu_count(),
        "jax_platforms_env": os.environ.get("JAX_PLATFORMS", ""),
    }
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    report["host_rss_mb"] = int(line.split()[1]) // 1024
    except OSError:
        pass

    from .native import available as native_available

    report["native_lib"] = "ok" if native_available() else \
        "unavailable (numpy fallbacks active)"
    report["reference_mount"] = os.path.isdir("/root/reference")

    report["backend"] = _probe_backend(probe_timeout, bandwidth_mb,
                                       platform)
    return report


def format_report(report: dict) -> str:
    lines = [
        f"python {report['python']}  jax {report['jax']}  "
        f"host cpus {report['host_cpus']}"
        + (f"  rss {report['host_rss_mb']} MB"
           if "host_rss_mb" in report else ""),
        f"native host lib: {report['native_lib']}",
        f"reference mount (/root/reference): "
        f"{'present' if report['reference_mount'] else 'absent '
           '(parity tests will skip)'}",
    ]
    b = report["backend"]
    if b["status"] == "ok":
        lines.append(
            f"backend OK: {b['n_devices']}x {b['device_kind']} "
            f"({b['platform']}, {b['process_count']} process(es))")
        lines.append(
            f"  first jit call {b['first_call_s']} s, steady dispatch "
            f"{b['dispatch_ms']} ms, H2D {b['h2d_mbps']} MB/s, "
            f"D2H {b['d2h_mbps']} MB/s")
        if b["dispatch_ms"] > 0.5:
            lines.append("  note: >0.5 ms/dispatch = tunnel-attached; "
                         "measure whole jits, not single ops")
        if b["h2d_mbps"] < 200:
            lines.append("  note: slow H2D = keep corpora device-resident "
                         "(datasets.train.device_resident: true) and serve "
                         "through the uint8 boundary")
    else:
        lines.append(f"backend {b['status'].upper()}: {b['detail']}")
    return "\n".join(lines)


if __name__ == "__main__":
    if len(sys.argv) >= 2 and sys.argv[1] == _CHILD_FLAG:
        _child_main(float(sys.argv[2]) if len(sys.argv) > 2 else 8.0,
                    sys.argv[3] if len(sys.argv) > 3 else "")
    else:
        rep = run_doctor()
        print(format_report(rep))
        sys.exit(0 if rep["backend"]["status"] == "ok"
                 else EXIT_BACKEND_DOWN)
