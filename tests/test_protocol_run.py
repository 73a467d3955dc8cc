"""Schedule-evidence stitching for OOM-resumed stages (VERDICT r4 item 6).

An interrupted stage leaves its pre-resume epochs in an earlier run
dir's scalars.jsonl; `tools/protocol_run._schedule_evidence` must stitch
all segments of a stage into ONE contiguous epoch-indexed series with
the newest segment winning on overlap (resume semantics,
`net_utils/utils.py:119-137`).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from protocol_run import _schedule_evidence  # noqa: E402


def _write_run(stage_dir, name, epochs, lr, log_lines=()):
    run = os.path.join(stage_dir, name)
    os.makedirs(run, exist_ok=True)
    with open(os.path.join(run, "scalars.jsonl"), "w") as f:
        for e in epochs:
            f.write(json.dumps({
                "phase": "schedule", "epoch": e, "lr": lr,
                "bn_momentum": 0.5 * 0.5 ** (e / 20), "val_total": 100.0 - e,
            }) + "\n")
    with open(os.path.join(run, "log.txt"), "w") as f:
        f.write("\n".join(log_lines) + "\n")
    return run


def test_stitches_resume_split_segments(tmp_path):
    stage = str(tmp_path / "stage2_completion")
    # pre-OOM segment: epochs 0..32 at lr 1e-4
    _write_run(stage, "2026-01-01T00:00:00", range(0, 33), 1e-4,
               ["epoch 30: new best val loss 70.0"])
    # resumed segment: epochs 30..59 (overlaps 30-32) at a reduced lr
    _write_run(stage, "2026-01-01T02:00:00", range(30, 60), 1e-5,
               ["epoch 41: plateau patience exceeded, LR 1e-4 -> 1e-5",
                "epoch 55: new best val loss 45.0"])
    # a stray non-run file must be ignored
    with open(os.path.join(stage, "completion_0.0001.yaml"), "w") as f:
        f.write("{}")

    ev = _schedule_evidence(stage)
    epochs = [r["epoch"] for r in ev["schedule"]]
    assert epochs == list(range(60)), "series must be contiguous 0..59"
    # newest-wins on the overlapping epochs
    assert ev["schedule"][31]["lr"] == 1e-5
    assert ev["schedule"][29]["lr"] == 1e-4
    assert ev["lr_reductions"] == [
        {"epoch": 41, "from": 1e-4, "to": 1e-5}
    ]
    assert ev["n_best_epochs"] == 2
    assert ev["last_best"] == {"epoch": 55, "val_total": 45.0}


def test_single_segment_unchanged(tmp_path):
    stage = str(tmp_path / "stage1_detection")
    _write_run(stage, "2026-01-01T00:00:00", range(0, 10), 1e-3)
    ev = _schedule_evidence(stage)
    assert [r["epoch"] for r in ev["schedule"]] == list(range(10))
    assert ev["lr_reductions"] == [] and ev["last_best"] is None
