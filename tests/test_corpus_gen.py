"""Tests for the synthetic SCI training-corpus generators.

The generators synthesize DAVIS-style training clips (the reference trains
on gt/measurement .mat pairs, utils/sci_dataloader.py:218-239; DAVIS is not
bundled). These guard the invariants the training pipeline depends on:
shape (H, W, T), value range, and real temporal motion (a static clip
would teach the DEQ nothing about the temporal multiplexing).
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

pytest.importorskip("cv2")

_SPEC = importlib.util.spec_from_file_location(
    "make_sci_train_data",
    os.path.join(os.path.dirname(__file__), "..", "scripts",
                 "make_sci_train_data.py"))
_GEN = importlib.util.module_from_spec(_SPEC)
sys.modules["make_sci_train_data"] = _GEN
_SPEC.loader.exec_module(_GEN)


def _fake_sources(rng, n=2, hw=96, f=20):
    """Tiny stand-ins for the bundled gt videos: smooth moving gradients."""
    vids = []
    for _ in range(n):
        base = rng.random((hw + f, hw + f)).astype(np.float64)
        vid = np.stack([base[i:i + hw, i:i + hw] for i in range(f)], -1)
        vids.append(vid)
    return vids


@pytest.mark.parametrize("fn_name", ["augmented_gt_clip", "hybrid_clip"])
def test_source_backed_generators(fn_name):
    rng = np.random.default_rng(0)
    sources = _fake_sources(rng)
    fn = getattr(_GEN, fn_name)
    clip = fn(rng, sources, t=8, out_hw=128)
    assert clip.shape == (128, 128, 8)
    assert clip.dtype == np.float64
    assert clip.min() >= 0.0 and clip.max() <= 1.0
    # real temporal motion: consecutive frames must differ materially
    fd = np.abs(np.diff(clip, axis=-1)).mean()
    assert fd > 1e-3, f"{fn_name} produced a (near-)static clip (fd={fd})"


def test_synthetic_clip():
    rng = np.random.default_rng(1)
    clip = _GEN.synthetic_clip(rng, h=128, w=128, t=8)
    assert clip.shape == (128, 128, 8)
    assert clip.min() >= 0.0 and clip.max() <= 1.0
    assert np.abs(np.diff(clip, axis=-1)).mean() > 1e-3


def test_hybrid_clip_has_occlusion_motion():
    """The hybrid generator's point: occluders move INDEPENDENTLY of the
    background, so frame differences must be spatially concentrated (an
    occluder sweep), not uniform like pure global motion."""
    rng = np.random.default_rng(2)
    sources = [np.full((96, 96, 20), 0.5, np.float64)]  # static background
    clip = _GEN.hybrid_clip(rng, sources, t=8, out_hw=128)
    fd = np.abs(clip[..., -1] - clip[..., 0])
    assert fd.max() > 0.05, "no occluder appeared over a static background"

def test_photo_clip():
    """Real-photograph camera-pan clips: shape/range/motion invariants,
    using synthetic stand-in photos so the test has no venv-path coupling."""
    rng = np.random.default_rng(3)
    photos = [rng.random((200, 300)).astype(np.float32),
              rng.random((160, 160)).astype(np.float32)]
    sources = _fake_sources(rng)
    clip = _GEN.photo_clip(rng, photos, sources, t=8, out_hw=128)
    assert clip.shape == (128, 128, 8)
    assert clip.dtype == np.float64
    assert clip.min() >= 0.0 and clip.max() <= 1.0
    assert np.abs(np.diff(clip, axis=-1)).mean() > 1e-3


def test_load_photos_bundled():
    """At least the reference's IPOL demo still must resolve; all loaded
    photos are float grayscale in [0,1]."""
    photos = _GEN.load_photos()
    assert len(photos) >= 1
    for p in photos:
        assert p.ndim == 2 and p.dtype == np.float32
        assert p.min() >= 0.0 and p.max() <= 1.0
        assert min(p.shape) >= 200


def test_no_gt_mode_writes_no_benchmark_pixels(tmp_path, monkeypatch):
    """--no_gt (the leakage-free ablation corpus, VERDICT r4 #2) must
    write ONLY photo/synthetic clips: no raw benchmark-gt snapshots (the
    default path always writes them), no gt-derived aug/hybrid clips, and
    the photo occluders must not be textured from gt sources."""
    import subprocess
    import sys as _sys

    script = os.path.join(os.path.dirname(__file__), "..", "scripts",
                          "make_sci_train_data.py")
    out = tmp_path / "corpus"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [_sys.executable, script, "--out", str(out), "--no_gt",
         "--photos", "2", "--synthetic", "1", "--seed", "3"],
        capture_output=True, text=True, timeout=600, env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    names = sorted(os.listdir(out / "gt"))
    assert len(names) == 3
    assert all(n.startswith(("photo_", "synth_")) for n in names), names

    # and the forbidden combinations are rejected outright
    proc = subprocess.run(
        [_sys.executable, script, "--out", str(tmp_path / "x"), "--no_gt",
         "--gt_augment", "1"], capture_output=True, text=True, timeout=120,
        env=env)
    assert proc.returncode != 0
    assert "no_gt" in proc.stderr
