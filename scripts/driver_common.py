"""Shared plumbing for the long-run driver scripts: parameter-keyed scene
caching (with stale-workspace invalidation) and the JAX persistent-compile-
cache environment. One implementation so a cache-key or env fix cannot apply
to one driver and silently miss the other."""
from __future__ import annotations

import json
import os
import shutil
from pathlib import Path


def ensure_scene(scene: Path, meta: dict, generate, stale_dirs: tuple = ()) -> bool:
    """Generate the scene via `generate(scene)` unless an existing one carries
    an exactly-matching scene_meta.json stamp.

    On regeneration, `stale_dirs` (run workspaces with `--training.checkpoint
    latest` state) are removed too — resuming a checkpoint trained on a
    deleted scene would mix scenes in the reported metrics, or crash on a
    segment/table shape mismatch. Returns True if generated.

    The stamp always includes the synthetic renderer's GENERATOR_VERSION, so
    a renderer-behavior change (which alters pixel values without touching
    any caller-supplied parameter) also invalidates pre-change caches."""
    from humanrf_tpu.core.synthetic import GENERATOR_VERSION

    meta = {**meta, "generator_version": GENERATOR_VERSION}
    meta_path = scene / "scene_meta.json"
    cached = (
        (scene / "SynthActor").exists()
        and meta_path.exists()
        and json.loads(meta_path.read_text()) == meta
    )
    if cached:
        return False
    shutil.rmtree(scene, ignore_errors=True)
    for d in stale_dirs:
        shutil.rmtree(d, ignore_errors=True)
    generate(scene)
    meta_path.write_text(json.dumps(meta))
    return True


def compile_cache_env(repo: Path) -> dict:
    """os.environ + the repo-resident persistent XLA compile cache (child
    processes honor these via run.py's jax.config.update shim)."""
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", str(repo / ".jax_cache_tpu"))
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
    return env
