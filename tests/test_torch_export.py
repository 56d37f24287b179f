"""Reverse checkpoint interop: orbax/pytree -> reference-layout .pth.

Round-trip property: torch state_dict -> convert (import) -> export must
reproduce the original state_dict bit-exactly (keys and values), so
checkpoints trained here load into the reference torch classes
(base_model.py:213-244 / load_network:281-309).
"""

import numpy as np
import pytest

from rethink_acoustic_image_enhancement_tpu.convert.torch_export import (
    export_asdqe,
    export_student,
    export_teacher,
    save_pth,
)
from rethink_acoustic_image_enhancement_tpu.convert.torch_import import (
    convert_asdqe,
    convert_student,
    convert_teacher,
)
from tests.conftest import requires_reference

torch = pytest.importorskip("torch")


def _assert_sd_equal(got: dict, want: dict, ignore=()):
    want_keys = {k for k in want if not k.endswith(ignore)}
    got_keys = {k for k in got if not k.endswith(ignore)}
    assert got_keys == want_keys, (
        f"missing: {sorted(want_keys - got_keys)[:5]}, "
        f"extra: {sorted(got_keys - want_keys)[:5]}")
    for k in want_keys:
        np.testing.assert_array_equal(
            np.asarray(got[k]), want[k].detach().cpu().numpy(), err_msg=k)


@requires_reference
def test_teacher_round_trip(torch_kdlae_module):
    torch.manual_seed(0)
    net = torch_kdlae_module.KDLAE_teacher(dim=48, num_blocks=[1, 1, 1, 1],
                            num_refinement_blocks=1, heads=[1, 2, 4, 8],
                            LayerNorm_type="BiasFree", static="train",
                            params="cat")
    sd = net.state_dict()
    np_sd = {k: v.detach().cpu().numpy() for k, v in sd.items()}
    _assert_sd_equal(export_teacher(convert_teacher(np_sd)), sd)
    # and the exported dict LOADS strictly into the reference class
    net.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                         for k, v in export_teacher(
                             convert_teacher(np_sd)).items()}, strict=True)


@requires_reference
def test_student_round_trip(torch_kdlae_module):
    torch.manual_seed(1)
    net = torch_kdlae_module.KDLAE_student(inp_channels=1, out_channels=1, residual=True,
                            hidden_channels=[16, 32, 64])
    sd = net.state_dict()
    np_sd = {k: v.detach().cpu().numpy() for k, v in sd.items()}
    exported = export_student(convert_student(np_sd))
    _assert_sd_equal(exported, sd)
    net.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                         for k, v in exported.items()}, strict=True)


@requires_reference
def test_asdqe_round_trip(torch_asdqe_module):
    torch.manual_seed(2)
    net = torch_asdqe_module.DenoiseRatePredictor()
    sd = net.state_dict()
    np_sd = {k: v.detach().cpu().numpy() for k, v in sd.items()}
    params, batch_stats = convert_asdqe(np_sd)
    exported = export_asdqe(params, batch_stats)
    # num_batches_tracked is emitted as 0 (the converter drops the count;
    # it does not affect inference or resumed training)
    _assert_sd_equal(exported, sd, ignore=("num_batches_tracked",))
    net.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(
        np.asarray(v))) for k, v in exported.items()}, strict=True)


@requires_reference
def test_save_pth_layout(tmp_path, torch_kdlae_module):
    """save_pth writes the reference two-key layout; load_pth_state_dict
    reads it back (full cycle through the file format)."""
    from rethink_acoustic_image_enhancement_tpu.convert.torch_import import (
        load_pth_state_dict,
    )

    torch.manual_seed(3)
    net = torch_kdlae_module.KDLAE_student(inp_channels=1, out_channels=1, residual=True,
                            hidden_channels=[4, 8])
    np_sd = {k: v.detach().cpu().numpy() for k, v in net.state_dict().items()}
    params = convert_student(np_sd)
    out = str(tmp_path / "net_g_export.pth")
    save_pth(out, params, "KDLAE_student", ema_params=params)
    blob = torch.load(out, map_location="cpu", weights_only=True)
    assert set(blob) == {"params", "params_ema"}
    rt = load_pth_state_dict(out, "params")
    for k, v in np_sd.items():
        np.testing.assert_array_equal(rt[k], v, err_msg=k)
