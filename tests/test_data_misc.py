"""Misc data utilities + packaging inventory rows: get_bounding_box
(`data_utils/data_process.py:8-23`), read-eval CLI
(`data_utils/read_pickle.py`), correct-labels
(`visualization_tools/correct_labels.py`)."""

import os
import pickle

import numpy as np

from slide_tpu.data.tools import get_bounding_box, remap_labels_to_sorted
from slide_tpu.cli.main import main as cli_main, read_eval_result


def test_get_bounding_box_2d_and_3d():
    pts = np.array([[[0., 0., 0.], [2., 4., 6.]],
                    [[-1., 0., 1.], [1., 2., 3.]]])
    bb = get_bounding_box(pts)
    np.testing.assert_allclose(bb["max"], [[2, 4, 6], [1, 2, 3]])
    np.testing.assert_allclose(bb["min"], [[0, 0, 0], [-1, 0, 1]])
    np.testing.assert_allclose(bb["center"], [[1, 2, 3], [0, 1, 2]])
    np.testing.assert_allclose(bb["length"], [[2, 4, 6], [2, 2, 2]])
    np.testing.assert_allclose(bb["centroid"], pts.mean(axis=1))

    bb2 = get_bounding_box(pts[0])
    np.testing.assert_allclose(bb2["max"], [2, 4, 6])
    np.testing.assert_allclose(bb2["centroid"], pts[0].mean(axis=0))

    try:
        get_bounding_box(np.zeros(3))
    except ValueError:
        pass
    else:
        raise AssertionError("1-d input must raise")


def test_read_eval_cli(tmp_path, capsys):
    hist = {"iter": [100, 200, 300],
            "dpsr_grid_L2_loss": [0.5, 0.2, 0.9],
            "cd": [1.0, 2.0, 3.0]}
    pkl = tmp_path / "eval_result.pkl"
    with open(pkl, "wb") as f:
        pickle.dump(hist, f)
    report = read_eval_result(str(pkl))
    assert report["iter"] == 200 and report["cd"] == 2.0
    # CLI path must return None so the console script exits 0
    assert cli_main(["read-eval", "--file", str(pkl)]) is None
    out = capsys.readouterr().out
    assert "lowest dpsr_grid_L2_loss" in out and "index 1" in out


def test_correct_labels_roundtrip(tmp_path):
    # dataset folder with categories whose listdir order != sorted order
    for c in ("zebra", "apple", "mango"):
        os.makedirs(tmp_path / "ds" / c)
    (tmp_path / "ds" / "not_a_dir.txt").write_text("x")
    listdir = [c for c in os.listdir(tmp_path / "ds")
               if os.path.isdir(tmp_path / "ds" / c)]
    npz = tmp_path / "gen.npz"
    pts = np.random.RandomState(0).randn(4, 8, 3).astype(np.float32)
    np.savez(npz, points=pts, label=np.array([0, 1, 2, 1]))
    out = remap_labels_to_sorted(str(npz), str(tmp_path / "ds"),
                                 str(tmp_path / "fixed.npz"))
    with np.load(out) as d:
        sorted_cats = sorted(listdir)
        expected = [sorted_cats.index(listdir[l]) for l in [0, 1, 2, 1]]
        np.testing.assert_array_equal(d["label"], expected)
        np.testing.assert_allclose(d["points"], pts)
