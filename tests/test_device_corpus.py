"""Device-resident corpus (data/device_corpus.py): HBM-resident split with
on-device batch assembly — the TPU-native replacement for the reference's
DataLoader worker pool (`dataset.py:10-42`).  Assembly must mirror
`ShapesPSRDataset.__getitem__` semantics (subsample w/o replacement, centroid
centering, mirror/noise/translate/scale augmentation, final 2*scale)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from slide_tpu.data import write_synthetic_shapenet_psr
from slide_tpu.data.shapenet_psr import ShapesPSRDataset
from slide_tpu.data.device_corpus import DeviceCorpus, make_assemble_fn


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    r = tmp_path_factory.mktemp("dc_data")
    return write_synthetic_shapenet_psr(str(r), categories=("02691156",
                                                            "03001627"),
                                        models_per_split=6, num_points=500)


def _cfg(root, **kw):
    base = dict(data_dir=root, npoints=64, scale=1,
                categories=["02691156", "03001627"])
    base.update(kw)
    return base


def test_corpus_loads_raw(root):
    ds = ShapesPSRDataset(root, split="train",
                          categories=["02691156", "03001627"])
    c = DeviceCorpus.from_dataset(ds)
    assert c.points.shape == (12, 500, 3)
    assert c.normals.shape == (12, 500, 3)
    # labels follow sorted-synset indices; both categories present
    assert set(np.unique(c.labels)) == {0, 4}  # airplane=0, chair=4 of 13
    assert c.psr is None


def test_corpus_repeat_dataset_loads_unique_models_once(root):
    ds = ShapesPSRDataset(root, split="train", categories=["02691156"],
                          repeat_dataset=3)
    c = DeviceCorpus.from_dataset(ds)
    # index-level repetition: corpus rows match dataset.models (with repeats)
    assert len(c) == len(ds.models) == 18
    np.testing.assert_array_equal(c.points[0], c.points[6])


def test_assemble_membership_and_scale(root):
    """Every assembled point must be an exact row of the source cloud times
    2*scale (no augmentation), labels must gather correctly."""
    ds = ShapesPSRDataset(root, split="train",
                          categories=["02691156", "03001627"])
    c = DeviceCorpus.from_dataset(ds)
    corpus = c.device_put()
    assemble = make_assemble_fn(_cfg(root, scale=0.5))
    idx = jnp.asarray([3, 7, 0])
    batch = assemble(corpus, idx, jax.random.key(0))
    assert batch["points"].shape == (3, 64, 3)
    assert batch["normals"].shape == (3, 64, 3)
    np.testing.assert_array_equal(np.asarray(batch["label"]), c.labels[[3, 7, 0]])
    for b in range(3):
        src = c.points[[3, 7, 0][b]] * (0.5 * 2)
        got = np.asarray(batch["points"][b])
        # each sampled point matches exactly one source row
        d = np.abs(got[:, None, :] - src[None, :, :]).sum(-1)
        assert (d.min(axis=1) < 1e-6).all()
        # subsample is without replacement: all 64 rows distinct
        assert len(np.unique(d.argmin(axis=1))) == 64


def test_assemble_centering(root):
    ds = ShapesPSRDataset(root, split="train", categories=["02691156"])
    c = DeviceCorpus.from_dataset(ds)
    corpus = c.device_put()
    assemble = make_assemble_fn(_cfg(root, centered_to_centroid=True))
    batch = assemble(corpus, jnp.asarray([0, 1]), jax.random.key(1))
    centroids = np.asarray(batch["points"]).mean(axis=1)
    np.testing.assert_allclose(centroids, 0, atol=1e-4)


def test_assemble_mirror_forced(root):
    """mirror_prob=1: z flips about the centroid, normals' z sign flips."""
    ds = ShapesPSRDataset(root, split="train", categories=["02691156"])
    c = DeviceCorpus.from_dataset(ds)
    corpus = c.device_put()
    cfg = _cfg(root)
    plain = make_assemble_fn(cfg)
    mirrored = make_assemble_fn(dict(cfg, augmentation={"mirror_prob": 1.0}))
    key = jax.random.key(2)
    b0 = plain(corpus, jnp.asarray([0]), key)
    b1 = mirrored(corpus, jnp.asarray([0]), key)
    p0, p1 = np.asarray(b0["points"][0]), np.asarray(b1["points"][0])
    center = p0.mean(axis=0)
    np.testing.assert_allclose(p1[:, :2], p0[:, :2], atol=1e-5)
    np.testing.assert_allclose(p1[:, 2], 2 * center[2] - p0[:, 2], atol=1e-5)
    np.testing.assert_allclose(np.asarray(b1["normals"][0])[:, 2],
                               -np.asarray(b0["normals"][0])[:, 2], atol=1e-6)


def test_assemble_noise_translate_scale_stats(root):
    ds = ShapesPSRDataset(root, split="train", categories=["02691156"])
    c = DeviceCorpus.from_dataset(ds)
    corpus = c.device_put()
    cfg = _cfg(root, npoints=256,
               augmentation={"noise_magnitude": 0.05,
                             "translation_magnitude": 0.3, "augm_scale": 1.5})
    plain = make_assemble_fn(_cfg(root, npoints=256))
    aug = make_assemble_fn(cfg)
    key = jax.random.key(3)
    idx = jnp.asarray([0] * 8)
    b0 = plain(corpus, idx, key)
    b1 = aug(corpus, idx, key)
    # same subsample keys -> differences are pure augmentation
    d = np.asarray(b1["points"] - b0["points"])
    # per-item translations must differ across the batch
    trans = d.mean(axis=1)
    assert np.std(trans, axis=0).max() > 0.05
    # noise visible beyond the translation
    assert np.abs(d - trans[:, None, :]).std() > 0.01


def test_psr_gather(root, tmp_path_factory):
    r = tmp_path_factory.mktemp("dc_psr")
    root_psr = write_synthetic_shapenet_psr(
        str(r), categories=("02691156",), models_per_split=3, num_points=200,
        psr_res=16, with_psr=True)
    ds = ShapesPSRDataset(root_psr, split="train", categories=["02691156"],
                          load_psr=True)
    c = DeviceCorpus.from_dataset(ds)
    assert c.psr.shape == (3, 16, 16, 16)
    corpus = c.device_put()
    assemble = make_assemble_fn(_cfg(root_psr, npoints=32))
    batch = assemble(corpus, jnp.asarray([2, 0]), jax.random.key(0))
    np.testing.assert_array_equal(np.asarray(batch["psr"]), c.psr[[2, 0]])


def test_nonuniform_point_count_rejected(tmp_path):
    pts = [np.zeros((100, 3), np.float32), np.zeros((90, 3), np.float32)]

    class FakeDS:
        dataset_folder = str(tmp_path)
        load_psr = False
        models = [{"category": "c", "model": f"m{i}"} for i in range(2)]
        metadata = {"c": {"idx": 0}}

    import os
    for i, p in enumerate(pts):
        d = tmp_path / "c" / f"m{i}"
        os.makedirs(d)
        np.savez(d / "pointcloud.npz", points=p, normals=p)
    with pytest.raises(ValueError, match="uniform point count"):
        DeviceCorpus.from_dataset(FakeDS())


def test_train_device_data_e2e(root, tmp_path):
    """run_training with device_data=True over the 8-device mesh: trains,
    loss finite + decreasing, resume works."""
    from slide_tpu.configs import keypoint_ddpm_config
    from slide_tpu.train import train_position_ddpm, find_max_iter
    import os
    exp_root = str(tmp_path / "exp")
    cfg = keypoint_ddpm_config("airplane", batch_size=8)
    pc = cfg["pointnet_config"]
    pc["architecture"]["feature_dim"] = [16, 32, 32]
    pc["architecture"]["decoder_feature_dim"] = [32, 32, 32]
    pc["t_dim"] = 32
    cfg["shapenet_psr_dataset_config"].update(
        data_dir=root, num_workers=0, repeat_dataset=2, npoints=128,
        categories=["02691156", "03001627"])
    cfg["train_config"].update(root_directory=exp_root, n_epochs=1000,
                               iters_per_logging=1, epochs_per_ckpt=20,
                               device_data=True)
    state, losses = train_position_ddpm(cfg, max_iters=20, seed=0,
                                        verbose=False)
    assert len(losses) == 20
    vals = [l for _, l in losses]
    assert np.isfinite(vals).all()
    assert np.mean(vals[-5:]) < np.mean(vals[:5])
    ckpt_dir = os.path.join(
        exp_root, "T1000_betaT0.02_keypoint_ddpm_airplane", "checkpoint")
    saved = find_max_iter(ckpt_dir)
    assert saved >= 0
    state2, losses2 = train_position_ddpm(cfg, max_iters=saved + 3, seed=0,
                                          verbose=False)
    assert losses2[0][0] == saved + 1
