"""StallWatchdog: hard-exit on quiet heartbeats (the recovery path for a
wedged accelerator client that blocks the main thread in C forever)."""

import subprocess
import sys
import time


def test_beating_keeps_process_alive():
    from rethink_acoustic_image_enhancement_tpu.utils.watchdog import (
        StallWatchdog,
    )

    fired = []
    wd = StallWatchdog(0.3, on_stall=lambda q: fired.append(q),
                       poll_s=0.05).start()
    for _ in range(10):
        time.sleep(0.05)
        wd.beat()
    wd.stop()
    time.sleep(0.2)
    assert not fired


def test_stall_invokes_handler():
    from rethink_acoustic_image_enhancement_tpu.utils.watchdog import (
        StallWatchdog,
    )

    fired = []
    wd = StallWatchdog(0.2, on_stall=lambda q: fired.append(q),
                       poll_s=0.05).start()
    time.sleep(0.6)
    wd.stop()
    assert fired and fired[0] >= 0.2


def test_stall_hard_exits_blocked_process():
    """Default handler os._exit()s even when the main thread is stuck in
    an uninterruptible call (simulated with a long sleep)."""
    code = (
        "from rethink_acoustic_image_enhancement_tpu.utils.watchdog import "
        "StallWatchdog, STALL_EXIT_CODE\n"
        "import time\n"
        "StallWatchdog(0.3, poll_s=0.05).start()\n"
        "time.sleep(30)\n"
    )
    t0 = time.time()
    proc = subprocess.run([sys.executable, "-c", code],
                          capture_output=True, text=True, timeout=20)
    assert proc.returncode == 17
    assert time.time() - t0 < 10
    assert "stall watchdog" in proc.stderr
