"""Exercises the VMAF plumbing end-to-end with stub `ffmpeg`/`vmaf` CLIs
(reference protocol: /root/reference/actorshq/evaluation/evaluate.py:132-173).

The real binaries are absent in CI images, but the symlink layout, y4m
rendering calls, and the vmaf invocation arguments are all testable by
recording what the stubs were asked to do.
"""
import os
import stat
import sys
from pathlib import Path

from humanrf_tpu.evaluation.evaluate import _maybe_compute_vmaf

_STUB_TEMPLATE = """#!{python}
import json, os, sys
log = os.environ["VMAF_STUB_LOG"]
with open(os.path.join(log, "{name}.log"), "a") as f:
    f.write(json.dumps(sys.argv[1:]) + "\\n")
# Create any declared output file so downstream steps find it.
args = sys.argv[1:]
out = None
if "{name}" == "ffmpeg":
    out = args[-1]
elif "--output" in args:
    out = args[args.index("--output") + 1]
if out:
    open(out, "wb").close()
"""


def _write_stub(stub_dir: Path, name: str) -> None:
    path = stub_dir / name
    path.write_text(_STUB_TEMPLATE.format(python=sys.executable, name=name))
    path.chmod(path.stat().st_mode | stat.S_IEXEC)


def test_vmaf_plumbing_with_stub_clis(tmp_path, monkeypatch):
    import json

    stub_dir = tmp_path / "bin"
    stub_dir.mkdir()
    _write_stub(stub_dir, "ffmpeg")
    _write_stub(stub_dir, "vmaf")
    log_dir = tmp_path / "log"
    log_dir.mkdir()
    monkeypatch.setenv("PATH", f"{stub_dir}{os.pathsep}{os.environ['PATH']}")
    monkeypatch.setenv("VMAF_STUB_LOG", str(log_dir))

    # Hero camera index 1 → Cam002; frames 0..8 → VMAF frames 0, 3, 6.
    hero = 1
    frame_numbers = list(range(9))
    vmaf_frames = frame_numbers[::3]

    results_dir = tmp_path / "results"
    (results_dir / "test_frames").mkdir(parents=True)
    data_dir = tmp_path / "data"
    (data_dir / "rgbs" / "Cam002").mkdir(parents=True)
    for f in vmaf_frames:
        (results_dir / "test_frames" / f"Cam002_rgb{f:06d}.png").write_bytes(b"")
        (data_dir / "rgbs" / "Cam002" / f"Cam002_rgb{f:06d}.jpg").write_bytes(b"")
    out_dir = tmp_path / "out"
    out_dir.mkdir()

    _maybe_compute_vmaf(
        results_dir,
        out_dir,
        frame_numbers,
        data_dir,
        ".png",
        camera_configs_override={"siggraph_vmaf": (hero,)},
    )

    # Two y4m renders: pred (written into results dir) then gt (tmp).
    ffmpeg_calls = [json.loads(l) for l in (log_dir / "ffmpeg.log").read_text().splitlines()]
    assert len(ffmpeg_calls) == 2
    for call in ffmpeg_calls:
        assert "-pix_fmt" in call and call[call.index("-pix_fmt") + 1] == "yuv444p"
        assert call[-1].endswith(".y4m")
    pred_y4m = results_dir / "Cam002.y4m"
    assert ffmpeg_calls[0][-1] == str(pred_y4m)
    assert pred_y4m.exists()
    # The pred render reads the sequentially-symlinked frames.
    pred_pattern = Path(ffmpeg_calls[0][ffmpeg_calls[0].index("-i") + 1])
    gt_pattern = Path(ffmpeg_calls[1][ffmpeg_calls[1].index("-i") + 1])
    assert pred_pattern.name == "%06d.png" and gt_pattern.name == "%06d.jpg"

    # vmaf compares pred vs gt and writes vmaf.xml into the output dir.
    vmaf_calls = [json.loads(l) for l in (log_dir / "vmaf.log").read_text().splitlines()]
    assert len(vmaf_calls) == 1
    call = vmaf_calls[0]
    assert call[call.index("-d") + 1] == str(pred_y4m)
    assert call[call.index("-r") + 1].endswith("Cam002.y4m")
    assert call[call.index("--output") + 1] == str(out_dir / "vmaf.xml")
    assert (out_dir / "vmaf.xml").exists()


def test_vmaf_skips_when_frames_missing(tmp_path, capsys):
    results_dir = tmp_path / "results"
    (results_dir / "test_frames").mkdir(parents=True)
    _maybe_compute_vmaf(
        results_dir, tmp_path / "out", [0, 3], tmp_path / "data", ".png",
        camera_configs_override={"siggraph_vmaf": (0,)},
    )
    assert "skipping VMAF" in capsys.readouterr().out
