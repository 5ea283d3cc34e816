"""IO: orbax checkpoint round trip; .mat loader semantics on real files."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deqsci_tpu.io.checkpoint import CheckpointManager
from tests.conftest import REFERENCE_ROOT, has_reference


def test_checkpoint_roundtrip(tmp_path, rng):
    mgr = CheckpointManager(str(tmp_path / "ckpts"))
    snap = {"params": {"w": rng.random((4, 4)).astype(np.float32),
                       "b": rng.random((4,)).astype(np.float32)},
            "opt_state": {"count": np.int32(7)},
            "epoch": 3}
    mgr.save("best", snap)
    assert mgr.exists("best")

    out = mgr.restore("best")
    np.testing.assert_array_equal(out["params"]["w"], snap["params"]["w"])
    assert int(out["epoch"]) == 3

    # the reference's resume semantics: weights + epoch, not the optimizer
    out2 = mgr.restore("best", with_optimizer=False)
    assert "opt_state" not in out2


@pytest.mark.skipif(not has_reference(), reason="no reference checkout")
def test_load_test_data_matches_scipy():
    """Loader output must match direct scipy reads with /255 scaling."""
    import scipy.io as sio
    from deqsci_tpu.data.sci_mat import load_test_data

    path = os.path.join(REFERENCE_ROOT, "data/test_gray/drop8_cacti.mat")
    got = load_test_data(path)
    raw = sio.loadmat(path)
    np.testing.assert_allclose(got["gt"], np.float32(raw["orig"]) / 255)
    np.testing.assert_allclose(got["meas"], np.float32(raw["meas"]) / 255)
    np.testing.assert_array_equal(got["mask"], np.float32(raw["mask"]))
    assert got["mask"].shape == (256, 256, 8)


@pytest.mark.skipif(not has_reference(), reason="no reference checkout")
def test_training_dataset_layout(tmp_path):
    """SCITrainingDataset reads the synthesized DAVIS-style layout."""
    import subprocess
    import sys
    out = tmp_path / "train"
    r = subprocess.run(
        [sys.executable, "scripts/make_sci_train_data.py", "--out",
         str(out), "--gt_augment", "2", "--synthetic", "1",
         "--mask", "bench"], capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr

    from deqsci_tpu.data.sci_mat import SCITrainingDataset
    ds = SCITrainingDataset(str(out / "gt"), str(out / "measurement"),
                            str(out / "mask.mat"))
    assert len(ds) == 11  # 8 original snapshots + 2 augmented + 1 synthetic
    for i in range(len(ds)):
        s = ds[i]
        assert s["gt"].shape == (256, 256, 8)
        assert s["meas"].shape == (256, 256)
        assert 0.0 <= s["gt"].min() and s["gt"].max() <= 1.0 + 1e-6
        # measurement consistency: meas == sum(gt * mask)
        np.testing.assert_allclose(
            s["meas"], np.sum(s["gt"] * s["mask"], -1), rtol=1e-4, atol=1e-4)
    # --mask bench: the corpus sensing mask IS the benchmark camera mask
    from deqsci_tpu.data.sci_mat import SCITestDataset
    bench_mask = next(iter(SCITestDataset(
        "/root/reference/data/test_gray")))["mask"]
    np.testing.assert_allclose(ds[0]["mask"], bench_mask, atol=1e-6)


def test_zoo_manifest_models_restore():
    """models/ZOO.json lists every shipped operating point; each entry's
    checkpoint must exist and restore to a finite param pytree (guards
    against a manifest/score drifting from the actual weights on disk)."""
    import json

    import orbax.checkpoint as ocp

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "models", "ZOO.json")) as f:
        zoo = json.load(f)
    entries = {k: v for k, v in zoo.items() if not k.startswith("_")}
    assert len(entries) >= 9
    for name, meta in entries.items():
        path = os.path.join(repo, "models", name)
        assert os.path.isdir(path), f"missing checkpoint dir for {name}"
        snap = ocp.StandardCheckpointer().restore(os.path.abspath(path))
        params = snap["params"] if "params" in snap else snap
        leaves = jax.tree_util.tree_leaves(params)
        assert leaves, name
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves
                   if np.asarray(l).dtype.kind == "f"), name
        if meta.get("psnr_db") is not None:
            assert 20.0 < meta["psnr_db"] < 45.0, name


def test_training_dataset_clip_cache(tmp_path):
    """cache_clips memoizes decoded samples without changing values."""
    import scipy.io as sio
    from deqsci_tpu.data.sci_mat import SCITrainingDataset

    gt_dir, meas_dir = tmp_path / "gt", tmp_path / "measurement"
    gt_dir.mkdir(); meas_dir.mkdir()
    rng = np.random.default_rng(0)
    mask = (rng.random((16, 16, 4)) > 0.5).astype(np.float64)
    sio.savemat(str(tmp_path / "mask.mat"), {"mask": mask})
    for i in range(3):
        gt = rng.random((16, 16, 4))
        sio.savemat(str(gt_dir / f"s{i}.mat"), {"patch_save": gt * 255.0})
        sio.savemat(str(meas_dir / f"s{i}.mat"),
                    {"meas": np.sum(gt * mask, -1) * 255.0})

    plain = SCITrainingDataset(str(gt_dir), str(meas_dir),
                               str(tmp_path / "mask.mat"))
    cached = SCITrainingDataset(str(gt_dir), str(meas_dir),
                                str(tmp_path / "mask.mat"), cache_clips=True)
    cached.preload()
    # observable contract: after preload, access never re-decodes
    import deqsci_tpu.data.sci_mat as sci_mat
    calls = []
    orig_load = sci_mat.load_mat
    expected = [{k: np.array(plain[i][k]) for k in ("gt", "meas", "mask")}
                for i in range(3)]
    try:
        sci_mat.load_mat = lambda *a, **kw: (calls.append(a),
                                             orig_load(*a, **kw))[1]
        for i in range(3):
            for k in ("gt", "meas", "mask"):
                np.testing.assert_array_equal(expected[i][k], cached[i][k])
    finally:
        sci_mat.load_mat = orig_load
    assert not calls, "cached dataset re-decoded a clip"
    # mutation hazard guard: cached arrays are frozen and each access
    # hands out a fresh dict, so in-place edits cannot poison the corpus
    s = cached[0]
    with np.testing.assert_raises(ValueError):
        s["gt"][0, 0, 0] = 1.0
    s["gt"] = None  # replacing a key only affects this access's dict
    assert cached[0]["gt"] is not None
