"""Tests for object-store IO gating, matplotlib renders, config discovery."""

import os

import numpy as np
import pytest

from slide_tpu.config import find_config_file, write_json_file, read_json_file
from slide_tpu.data.object_io import (NpzIO, TextIO, PickleIO,
                                      register_s3_client)
from slide_tpu.vis.plot import plot_pcd, plot_npz


def test_npz_text_pickle_io_local(tmp_path):
    npz = NpzIO()
    p = str(tmp_path / "a.npz")
    npz.write(p, x=np.arange(6).reshape(2, 3))
    out = npz.read(p)
    np.testing.assert_array_equal(out["x"], np.arange(6).reshape(2, 3))

    txt = TextIO()
    yp = str(tmp_path / "m.yaml")
    txt.write(yp, {"a": {"id": "a"}})
    assert txt.read(yp) == {"a": {"id": "a"}}

    pkl = PickleIO()
    pp = str(tmp_path / "c.pkl")
    pkl.write(pp, {"iter": 7})
    assert pkl.read(pp)["iter"] == 7


def test_s3_requires_registered_client(tmp_path):
    npz = NpzIO()
    with pytest.raises(RuntimeError, match="object-store client"):
        npz.read("s3://bucket/a.npz")

    class FakeClient:
        store = {}
        def get(self, path): return self.store[path]
        def put(self, path, data): self.store[path] = data

    register_s3_client(FakeClient())
    try:
        npz.write("s3://bucket/a.npz", x=np.ones(3))
        out = npz.read("s3://bucket/a.npz")
        np.testing.assert_array_equal(out["x"], np.ones(3))
    finally:
        register_s3_client(None)


def test_plot_pcd_and_npz(tmp_path):
    pts = np.random.default_rng(0).standard_normal((100, 3)).astype(np.float32)
    png = plot_pcd(pts, str(tmp_path / "p.png"), title="test")
    assert os.path.getsize(png) > 1000
    npz = str(tmp_path / "g.npz")
    np.savez(npz, points=np.stack([pts, pts]),
             category_name=np.array(["airplane", "chair"]))
    outs = plot_npz(npz, max_shapes=2)
    assert len(outs) == 2
    assert all(os.path.isfile(o) for o in outs)


def test_find_config_file(tmp_path):
    d = str(tmp_path)
    write_json_file(os.path.join(d, "config_10.json"), {"a": 1})
    write_json_file(os.path.join(d, "config_200.json"), {"a": 2})
    picked = find_config_file(d)
    assert picked.endswith("config_200.json")
    assert read_json_file(picked)["a"] == 2
    direct = find_config_file(os.path.join(d, "config_10.json"))
    assert direct.endswith("config_10.json")
    with pytest.raises(FileNotFoundError):
        find_config_file(str(tmp_path / "nope"))
