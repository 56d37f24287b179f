"""TeacherPredictor shape bucketing: variable image sizes hit a small set
of compiled shapes, outputs unchanged vs exact padding."""

import numpy as np

import jax
import jax.numpy as jnp

from rethink_acoustic_image_enhancement_tpu.eval.infer import TeacherPredictor
from rethink_acoustic_image_enhancement_tpu.models import KDLAETeacher


def _tiny():
    model = KDLAETeacher(dim=8, num_blocks=(1, 1, 1, 1),
                         num_refinement_blocks=1, heads=(1, 2, 4, 8),
                         layernorm_type="BiasFree", static="test",
                         params="cat")
    params = model.init(
        jax.random.PRNGKey(0),
        {"img": jnp.zeros((1, 16, 16, 3)),
         "denoise_rate": jnp.zeros((1, 16, 16, 1))})["params"]
    return model, params


def test_bucketed_predictor_one_program_for_many_sizes():
    """shape_bucket collapses variable sizes onto one padded shape (one
    compiled program). NB: outputs are NOT identical to exact padding —
    MDTA attention is global over all (padded) pixels, so any padding
    change perturbs the statistics; bucketing trades a small numeric
    deviation for a bounded compile count (documented on the predictor)."""
    model, params = _tiny()
    exact = TeacherPredictor(params=params, model=model)
    bucketed = TeacherPredictor(params=params, model=model, shape_bucket=32)

    rng = np.random.default_rng(0)
    sizes = [(17, 21), (24, 30), (31, 27)]  # all bucket to (32, 32)
    for h, w in sizes:
        img = rng.uniform(size=(h, w, 3)).astype(np.float32)
        a = exact(img, zero_mask=False)
        b = bucketed(img, zero_mask=False)
        assert a["hq"].shape == b["hq"].shape == (h, w, 3)
        assert b["hq"].dtype == np.uint8
    # all three sizes pad to one bucket shape
    assert {(((h + 31) // 32) * 32, ((w + 31) // 32) * 32)
            for h, w in sizes} == {(32, 32)}
