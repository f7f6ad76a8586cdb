"""Hermetic tests for the long-run driver scripts' reporting layers
(scripts/full_schedule_run.py, scripts/quality_at_capacity.py) — the parsing
that turns a workspace's validation.txt into the summarized protocol results,
and the scene-cache keying. No TPU, no CLI child."""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

import full_schedule_run  # noqa: E402

VALIDATION_TXT = """Step: 2500
image_id: 0 --- psnr=21.5 ssim=0.81 lpips_randfeat=0.002
image_id: 1 --- psnr=22.5 ssim=0.83 lpips_randfeat=0.002
Step: 5000
image_id: 0 --- psnr=24.0 ssim=0.88 lpips_randfeat=0.001
image_id: 1 --- psnr=25.0 ssim=0.90 lpips_randfeat=0.001
"""


def test_summarize_validation_blocks(tmp_path):
    (tmp_path / "validation.txt").write_text(VALIDATION_TXT)
    blocks = full_schedule_run.summarize_validation(tmp_path)
    assert [b["step"] for b in blocks] == [2500, 5000]
    assert blocks[0]["psnr"] == 22.0 and blocks[0]["n_images"] == 2
    assert blocks[1]["psnr"] == 24.5
    assert blocks[1]["ssim"] == round((0.88 + 0.90) / 2, 4)


def test_summarize_validation_missing_file(tmp_path):
    # A deadline-partial run may have produced no validation yet.
    assert full_schedule_run.summarize_validation(tmp_path) == []


def test_quality_sweep_best_block_and_partial(tmp_path, monkeypatch):
    """run_config returns the BEST validation block (reference best-checkpoint
    protocol) and marks budget-expired runs partial without dropping the
    blocks reached so far."""
    import quality_at_capacity as qac

    ws = tmp_path / "runs" / "fused-flagship"
    ws.mkdir(parents=True)
    (ws / "validation.txt").write_text(VALIDATION_TXT)

    def fake_supervise(cmd, log, env, cwd, **kw):
        assert kw.get("deadline") == 123.0  # plumbed through
        return qac.BUDGET_RC, 1

    monkeypatch.setattr(qac, "supervise", fake_supervise)
    r = qac.run_config(
        "fused-flagship", tmp_path / "scene", tmp_path / "runs", steps=5000,
        extra=[], frames=25, chunk=10, deadline=123.0,
    )
    assert r["partial"] is True and r["restarts"] == 1
    assert r["psnr"] == 24.5 and r["at_step"] == 5000  # best block, not first
    assert r["last_val_step"] == 5000


def test_parser_survives_truncated_and_metricless_blocks(tmp_path):
    """A watchdog kill can truncate validation.txt mid-append; the parser must
    skip garbage instead of crashing the partial-report path, and a
    header-only block still reports last_val_step."""
    import validation_report as vr

    (tmp_path / "validation.txt").write_text(VALIDATION_TXT + "Step: ")
    blocks = vr.parse_validation_blocks(tmp_path)
    assert [b["step"] for b in blocks] == [2500, 5000]

    (tmp_path / "validation.txt").write_text("Step: 2500\n")
    best = vr.best_block(vr.parse_validation_blocks(tmp_path))
    assert best["psnr"] == 0.0 and best["last_val_step"] == 2500

    assert vr.best_block([]) == {}


def test_ensure_scene_clears_stale_workspaces(tmp_path):
    """Regenerating a scene (changed size/frames) must also clear run
    workspaces: `--training.checkpoint latest` state from the old scene would
    otherwise be resumed against the new one."""
    from driver_common import ensure_scene

    scene = tmp_path / "scene"
    runs = tmp_path / "runs"
    calls = []

    def gen(root):
        (root / "SynthActor").mkdir(parents=True)
        calls.append(root)

    assert ensure_scene(scene, {"size": 192, "frames": 2}, gen, (runs,))
    (runs / "cfg" / "checkpoints").mkdir(parents=True)
    # Same params → cached, workspace untouched.
    assert not ensure_scene(scene, {"size": 192, "frames": 2}, gen, (runs,))
    assert (runs / "cfg" / "checkpoints").exists()
    # Changed params → regenerate AND clear the stale workspace.
    assert ensure_scene(scene, {"size": 384, "frames": 25}, gen, (runs,))
    assert not runs.exists()
    assert len(calls) == 2


def test_quality_sweep_failure_keeps_log_tail(tmp_path, monkeypatch):
    import quality_at_capacity as qac

    ws = tmp_path / "runs" / "fused-flagship"
    ws.mkdir(parents=True)

    def fake_supervise(cmd, log, env, cwd, **kw):
        Path(log).write_text("boom traceback")
        return 1, 0

    monkeypatch.setattr(qac, "supervise", fake_supervise)
    r = qac.run_config(
        "fused-flagship", tmp_path / "scene", tmp_path / "runs", steps=100, extra=[],
    )
    assert r["rc"] == 1 and "boom" in r["tail"]
    assert "psnr" not in r
