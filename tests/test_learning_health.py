"""Learning-health guard: train loss falling MUST improve held-out ADD.

Round 2 shipped a regression where the train loss fell (33.8 -> 9.0) while
held-out ADD got WORSE than the noisy init (79.7 mm vs ~67 mm) — root-caused
to a fixture domain gap, but only found by a manual TPU bisect (BENCHLOG
round-2 item 4). This test distills that harness into CI (VERDICT r2 #5):
a short overfit of the full model (descriptors, renderer, flow, LM, all
losses, optimizer) on the rasterized synthetic fixture must end with
held-out ADD well below the initialization error. Any future "loss falls,
eval worsens" regression — model code, fixture, loss wiring, or converter —
turns this red instead of costing a bisect.

The fixture is sized for the 1-core CPU CI box (128 px images, 96 px crop,
2 render x 2 GRU iters, ~13 min): at that scale, held-out VIEWPOINT
generalization needs more steps than CI affords (measured 0.91x init at
150 steps and still converging), so eval is the training frames with FRESH
init-pose noise (`--eval_mode train_newinit`) — new inits mean new crops,
renders and flow targets, so broken training still fails it. Calibration
(this box): healthy code measured 0.58x init (single-device CPU) and
0.81x (the 8-virtual-device pytest env; the 8-frame single-draw eval is
noisy, hence the two init draws per frame here) at 150 steps; the broken
round-2 code sat at >=1.2x init. Threshold 0.85x splits the two.
(The full-scale viewpoint-generalization run stays available as
`python -m rnnpose_tpu.tools.overfit_check` — 0.35x init at 160 steps on
the TPU.)

Reference analog: the reference validates learning end-to-end by training
on LINEMOD and evaluating ADD (`tools/train.py` + `utils/eval_metric.py`);
this is the no-assets equivalent.
"""
import numpy as np
import pytest

from rnnpose_tpu.tools.overfit_check import main as overfit_main

pytestmark = pytest.mark.slow


def test_overfit_improves_newinit_add():
    init_add, ref_add, losses = overfit_main(
        [
            "--steps", "150",
            "--train_frames", "8",
            "--eval_frames", "8",
            "--image_size", "128",
            "--zoom", "96",
            "--render_iters", "2",
            "--gru_iters", "2",
            "--eval_mode", "train_newinit",
        ]
    )
    first = float(np.mean(losses[:30]))
    last = float(np.mean(losses[-30:]))

    # Training signal is live: the loss must actually fall...
    assert last < 0.7 * first, f"train loss did not fall: {first} -> {last}"
    # ...and falling loss must translate into better poses from unseen
    # inits. The round-2 regression class (loss falls, ADD >= init) fails
    # here hard.
    assert ref_add < 0.85 * init_add, (
        f"eval ADD did not improve enough: init {init_add * 1000:.1f} mm "
        f"-> refined {ref_add * 1000:.1f} mm (need < 0.85x init)"
    )
