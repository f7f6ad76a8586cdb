import numpy as np
import pytest

from humanrf_tpu.configs.args import parse_args
from humanrf_tpu.evaluation.metrics import LpipsModel, compute_psnr, compute_ssim


def test_parse_args_nested_flags():
    args = parse_args(
        [
            "--train", "true",
            "--training.max_steps", "50_001",
            "--training.camera_preset", "siggraph_train",
            "--model.log2_hashmap_size", "18",
            "--dataset.frame_numbers", "1", "2", "3",
            "--workspace", "/tmp/ws",
        ]
    )
    assert args.train is True
    assert args.evaluate is False
    assert args.training.max_steps == 50_001
    assert args.model.log2_hashmap_size == 18
    assert args.dataset.frame_numbers == (1, 2, 3)
    assert str(args.workspace) == "/tmp/ws"
    # Untouched defaults survive.
    assert args.model.n_levels == 16
    assert args.training.lr == 1e-2


def test_parse_args_config_module_injection():
    args = parse_args(["--config", "example_humanrf", "--training.max_steps", "7"])
    # CLI overrides config-module value (run_args.py:135-138 semantics).
    assert args.training.max_steps == 7
    # Config-module values not overridden survive.
    assert args.model.camera_embedding_dim == 2
    assert args.dataset.actor == "Actor01"
    assert len(args.dataset.frame_numbers) == 50


def test_example_humanrf_tpu_config_overrides_flagship_knobs():
    """The TPU fast-path config layers the PERF.md flagship field/sampler on
    top of example_humanrf's data/schedule/eval protocol."""
    from humanrf_tpu.run import build_pipeline_config

    args = parse_args(["--config", "example_humanrf_tpu"])
    # Reference protocol inherited untouched.
    assert args.training.max_steps == 50_001
    assert args.dataset.actor == "Actor01"
    assert args.model.temporal_partitioning == "adaptive"
    # Flagship overrides applied (and still CLI-overridable).
    assert (args.model.log2_hashmap_size, args.model.n_levels, args.model.n_features_per_level) == (12, 8, 4)
    assert args.tpu.field_backend == "fused" and args.tpu.sampling == "proposal"
    pcfg = build_pipeline_config(args)
    assert pcfg.sampling == "proposal"
    assert pcfg.num_rays == 16_384 and pcfg.candidate_rays_factor == 2
    assert (pcfg.proposal_samples_per_ray, pcfg.render_samples_per_ray) == (32, 16)

    args2 = parse_args(["--config", "example_humanrf_tpu", "--tpu.render_samples_per_ray", "32"])
    assert args2.tpu.render_samples_per_ray == 32


def test_psnr_basic():
    gt = np.zeros((4, 4, 3), np.float32)
    pred = np.full((4, 4, 3), 0.1, np.float32)
    got = compute_psnr(pred, gt)
    assert abs(got - 20.0) < 1e-5  # mse = 0.01 → 20 dB

    mask = np.zeros((4, 4, 1), np.uint8)
    mask[0, 0] = 1
    pred2 = gt.copy()
    pred2[0, 0] = 0.1
    got_masked = compute_psnr(pred2, gt, mask=mask)
    assert abs(got_masked - 20.0) < 1e-5  # only the masked pixel counts


def test_ssim_identical_and_scaled(rng):
    img = rng.uniform(0, 1, size=(32, 32, 3)).astype(np.float64)
    assert compute_ssim(img, img) == pytest.approx(1.0)
    noisy = np.clip(img + rng.normal(0, 0.1, img.shape), 0, 1)
    s = compute_ssim(img, noisy)
    assert 0.0 < s < 1.0


def test_ssim_matches_reference_formula():
    """Cross-check against a literal (slow) implementation of the formula."""
    rng = np.random.default_rng(7)
    a = rng.uniform(0, 1, (20, 20, 1))
    b = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1)

    got = compute_ssim(a, b)

    # Naive sliding-window version.
    win = 7
    pad = win // 2
    C1, C2 = 0.01**2, 0.03**2
    vals = []
    x, y = a[..., 0], b[..., 0]
    for i in range(pad, 20 - pad):
        for j in range(pad, 20 - pad):
            wx = x[i - pad : i + pad + 1, j - pad : j + pad + 1].ravel()
            wy = y[i - pad : i + pad + 1, j - pad : j + pad + 1].ravel()
            ux, uy = wx.mean(), wy.mean()
            vx, vy = wx.var(ddof=1), wy.var(ddof=1)
            vxy = np.cov(wx, wy, ddof=1)[0, 1]
            vals.append(((2 * ux * uy + C1) * (2 * vxy + C2)) / ((ux**2 + uy**2 + C1) * (vx + vy + C2)))
    assert got == pytest.approx(np.mean(vals), abs=1e-10)


def test_lpips_fallback_properties(rng):
    model = LpipsModel.load_or_init()
    img = rng.uniform(0, 1, (40, 40, 3)).astype(np.float32)
    assert model(img, img) == pytest.approx(0.0, abs=1e-6)
    other = rng.uniform(0, 1, (40, 40, 3)).astype(np.float32)
    d1 = model(img, other)
    assert d1 > 0
    # Symmetric.
    assert model(other, img) == pytest.approx(d1, rel=1e-4)


def test_ssim_tiny_roi_no_nan(rng):
    """ROIs smaller than the 7x7 window must yield a finite SSIM with a
    warning, not a NaN that poisons validation averages (VERDICT weak #6)."""
    import warnings

    a = rng.uniform(0, 1, (4, 5, 3))
    b = rng.uniform(0, 1, (4, 5, 3))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        val = compute_ssim(a, b)
        assert any("smaller than win_size" in str(x.message) for x in w)
    assert np.isfinite(val)
    # Degenerate 1-pixel-wide ROI still finite.
    assert np.isfinite(compute_ssim(a[:1, :2], b[:1, :2]))
    # Identical images → SSIM 1 regardless of window shrink.
    assert compute_ssim(a, a) == pytest.approx(1.0)


def test_lpips_fallback_is_honestly_named():
    model = LpipsModel.load_or_init()
    if not model.is_pretrained:
        assert model.metric_name == "lpips_randfeat"
    else:
        assert model.metric_name == "lpips"


def test_quality_cliff_warnings_and_help():
    """The measured sampler-knob cliffs (PERF.md probes) are surfaced in
    --help and fire runtime warnings in measured-bad regions (VERDICT #7)."""
    from humanrf_tpu.configs.args import parse_args, warn_pipeline_knobs

    good = parse_args(["--tpu.sampling", "proposal"])
    assert warn_pipeline_knobs(good.tpu) == []

    bad = parse_args([
        "--tpu.sampling", "proposal",
        "--tpu.march_grid_factor", "4",
        "--tpu.proposal_resolution", "192",
        "--tpu.proposal_samples_per_ray", "64",
        "--tpu.proposal_uniform_bonus", "2e-2",
        "--tpu.render_samples_per_ray", "8",
    ])
    warnings = warn_pipeline_knobs(bad.tpu)
    assert len(warnings) == 5
    assert any("march_grid_factor" in w and "-3.2 dB" in w for w in warnings)
    assert any("uniform_bonus" in w for w in warnings)

    # Dense sampling only checks the knobs it actually uses.
    dense = parse_args(["--tpu.march_grid_factor", "4", "--tpu.proposal_uniform_bonus", "0"])
    assert len(warn_pipeline_knobs(dense.tpu)) == 1

    # --help carries the measured numbers where users look.
    import subprocess, sys
    help_text = subprocess.run(
        [sys.executable, "-c",
         "from humanrf_tpu.configs.args import parse_args; parse_args(['--help'])"],
        capture_output=True, text=True,
    ).stdout
    assert "-3.2 dB" in help_text and "-1.9 dB" in help_text


def test_derive_synthetic_presets_holds_out_three_validation_cameras():
    """Big rigs (>= 8 cams) hold out 3 spread validation cameras + 1 test so
    every validation block averages >= 3 viewpoints (the reference validates
    on 10 held-out cameras, actorshq/evaluation/presets.py:8-28); small test
    rigs keep a single validation camera."""
    from humanrf_tpu.run import derive_synthetic_presets

    class _FakeDataset:
        def __init__(self, n):
            self.cameras = [None] * n

    big = derive_synthetic_presets(_FakeDataset(12))
    assert len(big["siggraph_train_validation"]) == 3
    assert big["siggraph_test"] == (11,)
    all_cams = set(big["siggraph_train"]) | set(big["siggraph_train_validation"]) | {11}
    assert all_cams == set(range(12))  # disjoint, complete partition
    assert not set(big["siggraph_train"]) & set(big["siggraph_train_validation"])
    # Spread: no two validation cameras adjacent, endpoints stay in training.
    val = big["siggraph_train_validation"]
    assert 0 in big["siggraph_train"] and 10 in big["siggraph_train"]
    assert min(b - a for a, b in zip(val, val[1:])) >= 2

    small = derive_synthetic_presets(_FakeDataset(6))
    assert small["siggraph_train_validation"] == (4,)  # unchanged small-rig split
    assert small["siggraph_test"] == (5,)
    assert small["siggraph_train"] == (0, 1, 2, 3)


def test_siggraph_test_coverage_with_synthetic_override():
    """`siggraph_test` coverage must not index the hardcoded ActorsHQ landscape
    rotation (cameras 63/97/...) when the camera configs are overridden for a
    small synthetic rig — the evaluate phase runs after hours of training and
    an IndexError there loses the run."""
    from humanrf_tpu.evaluation import presets

    synth = {
        "siggraph_train": (0, 1, 2, 3),
        "siggraph_train_validation": (4,),
        "siggraph_test": (5,),
        "siggraph_vmaf": (5,),
    }
    frames = list(range(50))
    seq = presets.get_render_sequence(
        coverage="siggraph_test", camera_preset="siggraph_test",
        frame_numbers=frames, camera_configs_override=synth,
    )
    assert seq and all(c == 5 for c, _ in seq)  # only the hero exists
    assert {f for _, f in seq} == set(frames[::3])

    # The frozen ActorsHQ rotation must be untouched by the filter.
    ref_seq = presets.get_render_sequence(
        coverage="siggraph_test", camera_preset="siggraph_test", frame_numbers=frames,
    )
    rot_frames = [f for c, f in sorted(ref_seq) if c != 126]
    assert set(rot_frames) <= set(frames[::5])
    cams_used = {c for c, _ in ref_seq}
    assert cams_used <= set(presets.camera_configs["siggraph_test"])
    assert len(cams_used) > 5  # the rotation really rotates


# --------------------------------------------------------------- HBM preflight


def test_preflight_hbm_fence(monkeypatch, capsys):
    """The dense/gather HBM fence (trainer._preflight_hbm_check): an
    over-limit compiled footprint must raise a RuntimeError naming the
    measured GiB and the validated downshifts BEFORE any device dispatch —
    never reach the opaque TPU UNAVAILABLE crash (VERDICT r4 #7)."""
    import types

    import jax
    import pytest as _pytest

    from humanrf_tpu.train.trainer import Trainer

    class FakeMA:
        temp_size_in_bytes = 20 << 30  # 20 GiB of temps
        argument_size_in_bytes = 2 << 30

    class FakeCompiled:
        def memory_analysis(self):
            return FakeMA()

    class FakeLowered:
        def compile(self):
            return FakeCompiled()

    class FakeJit:
        def lower(self, *a):
            return FakeLowered()

    class FakeDev:
        def memory_stats(self):
            return {"bytes_limit": 16 << 30}  # v5e

    class FakeCfg:
        num_rays = 16384
        sampling = "dense"

    class FakeModelCfg:
        field_backend = "gather"

    self = types.SimpleNamespace(
        train_step_fn=FakeJit(),
        pcfg=FakeCfg(),
        model=types.SimpleNamespace(config=FakeModelCfg()),
        _log_info=lambda t: print(f"[INFO] {t}"),
        _log_warning=lambda t: print(f"[WARNING] {t}"),
    )
    monkeypatch.setattr(jax, "devices", lambda *a: [FakeDev()])
    with _pytest.raises(RuntimeError, match=r"22\.00 GiB.*16\.00 GiB.*proposal"):
        Trainer._preflight_hbm_check(self, None)

    # Under-limit but >92%: warns, does not raise.
    FakeMA.temp_size_in_bytes = 13 << 30
    Trainer._preflight_hbm_check(self, None)
    out = capsys.readouterr().out
    assert "[WARNING]" in out and "%" in out

    # Comfortable fit: info only.
    FakeMA.temp_size_in_bytes = 4 << 30
    Trainer._preflight_hbm_check(self, None)
    out = capsys.readouterr().out
    assert "[WARNING]" not in out and "footprint" in out

    # memory_stats unavailable (the axon tunnel): the limit falls back to the
    # device kind's HBM size, so the fence still fires on the real chip.
    class TunnelDev:
        device_kind = "TPU v5 lite"

        def memory_stats(self):
            raise RuntimeError("unsupported through this client")

    monkeypatch.setattr(jax, "devices", lambda *a: [TunnelDev()])
    FakeMA.temp_size_in_bytes = 20 << 30
    self.train_step_fn = FakeJit()
    with _pytest.raises(RuntimeError, match=r"16\.00 GiB"):
        Trainer._preflight_hbm_check(self, None)
    out = capsys.readouterr().out
    assert "inferred from kind" in out

    # Wrapped (non-jit) steps are skipped silently.
    self.train_step_fn = lambda *a: None
    Trainer._preflight_hbm_check(self, None)
