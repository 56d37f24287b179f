"""Remote experiment-tracker sink (wandb/swanlab analog).

The reference syncs tb to wandb (Train/basicsr/utils/logger.py:87-105) and
the ASDQE trainer logs to swanlab (Train/ASDQE.py:71-84,128-144). Neither
library exists in this offline image, so the protocol is verified against
in-process fakes injected through the ``module`` parameter — the same
mock-transport pattern as the gdrive downloader tests.
"""

import json
import os
import warnings

import numpy as np
import pytest

from rethink_acoustic_image_enhancement_tpu.utils.logging import MessageLogger
from rethink_acoustic_image_enhancement_tpu.utils.tracking import (
    RemoteTracker,
    make_tracker,
)


class FakeWandb:
    """Records the wandb call protocol: init kwargs, log(payload, step)."""

    class util:
        @staticmethod
        def generate_id():
            return "genid123"

    def __init__(self):
        self.init_kwargs = None
        self.logged = []
        self.finished = False

    def init(self, **kw):
        self.init_kwargs = kw

    def log(self, payload, step=None):
        self.logged.append((dict(payload), step))

    def finish(self):
        self.finished = True


class FakeSwanlab:
    def __init__(self):
        self.init_kwargs = None
        self.logged = []

    def init(self, **kw):
        self.init_kwargs = kw

    def log(self, payload):
        self.logged.append(dict(payload))


def test_wandb_fresh_run_semantics():
    """logger.py:94-104: fresh run = generated id, resume='never',
    sync_tensorboard=True, name/config/project forwarded."""
    fake = FakeWandb()
    t = RemoteTracker("wandb", "proj", run_name="exp1",
                      config={"total_iter": 5}, module=fake)
    assert t.enabled
    kw = fake.init_kwargs
    assert kw["id"] == "genid123" and t.run_id == "genid123"
    assert kw["resume"] == "never"
    assert kw["project"] == "proj"
    assert kw["name"] == "exp1"
    assert kw["config"] == {"total_iter": 5}
    assert kw["sync_tensorboard"] is True


def test_wandb_resume_semantics():
    """logger.py:95-98: an explicit resume_id resumes with 'allow'."""
    fake = FakeWandb()
    t = RemoteTracker("wandb", "proj", resume_id="oldrun", module=fake)
    assert fake.init_kwargs["id"] == "oldrun"
    assert fake.init_kwargs["resume"] == "allow"
    assert t.run_id == "oldrun"


def test_wandb_log_routes_step():
    fake = FakeWandb()
    t = RemoteTracker("wandb", "p", module=fake)
    t.log({"losses/l_pix": np.float32(0.5)}, step=100)
    payload, step = fake.logged[0]
    assert payload == {"losses/l_pix": 0.5} and step == 100
    assert isinstance(payload["losses/l_pix"], float)  # json-safe
    t.finish()
    assert fake.finished


def test_swanlab_protocol_carries_step_in_payload():
    """Train/ASDQE.py:128-133 puts the step inside the logged dict."""
    fake = FakeSwanlab()
    t = RemoteTracker("swanlab", "DenoiseRatePrediction",
                      config={"optimizer": "Adam"}, module=fake)
    assert fake.init_kwargs["project"] == "DenoiseRatePrediction"
    assert fake.init_kwargs["config"] == {"optimizer": "Adam"}
    t.log({"train_epoch_mse": 0.1}, step=3)
    assert fake.logged[0] == {"train_epoch_mse": 0.1, "step": 3.0}
    t.finish()  # no finish attr on the fake: must be a no-op, not a crash


def test_missing_library_degrades_to_noop():
    """Neither wandb nor swanlab is installed here: requesting one without
    an injected module must warn and become a no-op, never crash."""
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        t = RemoteTracker("wandb", "proj")
    assert not t.enabled
    assert any("wandb" in str(x.message) for x in w)
    t.log({"a": 1.0}, step=0)  # no-op
    t.finish()


def test_unknown_backend_rejected():
    with pytest.raises(ValueError, match="backend"):
        RemoteTracker("mlflow", "p")


def test_make_tracker_gating():
    """train.py:104-108 analog: off when project is null (the shipped
    yamls carry `project: ~`), on when set."""
    assert make_tracker({}, "run") is None
    assert make_tracker({"wandb": {"project": None}}, "run") is None
    fake = FakeWandb()
    t = make_tracker({"wandb": {"project": "p", "resume_id": "r1"}},
                     "run", module=fake)
    assert t is not None and fake.init_kwargs["id"] == "r1"
    fake_sl = FakeSwanlab()
    t2 = make_tracker({"swanlab": {"project": "sp"}}, "run", module=fake_sl)
    assert t2 is not None and fake_sl.init_kwargs["project"] == "sp"


def test_message_logger_feeds_remote_with_tb_tags():
    """The remote sink receives exactly the TensorBoard tag space
    (losses/* and m_*), mirroring wandb's sync_tensorboard behavior."""
    fake = FakeWandb()
    remote = RemoteTracker("wandb", "p", module=fake)
    ml = MessageLogger(total_iters=10, log=lambda m: None, remote=remote)
    ml(epoch=0, current_iter=2,
       metrics={"lr": 1e-4, "l_pix": 0.25, "m_psnr": 30.0})
    payload, step = fake.logged[0]
    assert payload == {"losses/l_pix": 0.25, "m_psnr": 30.0}
    assert step == 2


def test_train_asdqe_logs_epochs_through_swanlab_sink(tmp_path):
    """End-to-end: the ASDQE trainer's per-epoch metrics flow through the
    swanlab-protocol tracker (Train/ASDQE.py:140-144 analog)."""
    from rethink_acoustic_image_enhancement_tpu.train.asdqe_trainer import (
        train_asdqe,
    )
    from rethink_acoustic_image_enhancement_tpu.utils.image_io import imwrite

    root = tmp_path / "data"
    for sub in ["lq", "gt", "params"]:
        os.makedirs(root / sub)
    for i in range(6):
        rng = np.random.default_rng(i)
        img = (rng.uniform(0, 1, (40, 40, 3)) * 255).astype(np.uint8)
        imwrite(str(root / "lq" / f"{i}.png"), img)
        imwrite(str(root / "gt" / f"{i}.png"),
                np.clip(img + 10, 0, 255).astype(np.uint8))
        (root / "params" / f"{i}.json").write_text(
            json.dumps({"score": float(0.2 * i - 0.5)}))

    fake = FakeSwanlab()
    tracker = RemoteTracker("swanlab", "DenoiseRatePrediction", module=fake)
    result = train_asdqe(
        {"dataroot_lq": str(root / "lq"), "dataroot_gt": str(root / "gt"),
         "dataroot_param": str(root / "params")},
        epochs=2, batch_size=2, accumulation_steps=2, gt_size=40,
        compute_dtype=None, log=lambda m: None, max_steps_per_epoch=2,
        tracker=tracker)
    assert len(result["history"]) == 2
    epochs_logged = [p["epoch"] for p in fake.logged]
    assert epochs_logged == [0.0, 1.0]
    for payload, hist in zip(fake.logged, result["history"]):
        assert payload["train_epoch_mse"] == pytest.approx(
            hist["train_mse"], rel=1e-6, nan_ok=True)
        assert payload["val_epoch_mse"] == pytest.approx(
            hist["val_mse"], rel=1e-6, nan_ok=True)
