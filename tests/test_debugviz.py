"""Debug-image observability (V16 counterpart): PPM writers + overlay
rasterizers produce valid artifacts, and the pipeline drops them when
`debug_dir` is set."""

import os

import numpy as np

from lvislam_tpu.utils import debugviz as dv


def _read_ppm(path):
    with open(path, "rb") as f:
        magic = f.readline().strip()
        w, h = map(int, f.readline().split())
        maxv = int(f.readline())
        data = np.frombuffer(f.read(), np.uint8)
    ch = 3 if magic == b"P6" else 1
    return data.reshape(h, w, ch) if ch == 3 else data.reshape(h, w)


def test_ppm_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    gray = rng.random((32, 48)).astype(np.float32)
    p = str(tmp_path / "g.pgm")
    dv.save_ppm(p, gray)
    back = _read_ppm(p)
    assert back.shape == (32, 48)
    np.testing.assert_allclose(back / 255.0, gray, atol=1 / 255.0 + 1e-6)

    rgb = rng.random((16, 20, 3)).astype(np.float32)
    p2 = str(tmp_path / "c.ppm")
    dv.save_ppm(p2, rgb)
    back2 = _read_ppm(p2)
    assert back2.shape == (16, 20, 3)


def test_overlays_render(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.random((60, 80)).astype(np.float32)
    uv = rng.uniform(5, 70, (10, 2)).astype(np.float32)
    valid = np.ones(10, bool)

    tr = dv.draw_tracks(img, uv, valid, track_cnt=np.arange(10) * 3,
                        uv_prev=uv - 2.0)
    assert tr.shape == (60, 80, 3)
    # crosses actually drawn: some pixels differ from the gray base
    assert (np.abs(tr[..., 0] - tr[..., 2]) > 0.1).any()

    m = dv.draw_matches(img, img, uv, uv + 1.0, valid)
    assert m.shape == (60, 160, 3)

    d = dv.draw_depth_overlay(img, uv, np.linspace(-1, 15, 10), valid)
    assert d.shape == (60, 80, 3)
    dv.save_ppm(str(tmp_path / "t.ppm"), tr)
    assert os.path.getsize(str(tmp_path / "t.ppm")) > 100


def test_draw_map_topdown(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.uniform(-5, 5, (2000, 3)).astype(np.float32)
    pts[:50] = np.nan  # non-finite points must be dropped
    valid = np.ones(2000, bool)
    traj = np.stack([np.linspace(-4, 4, 30), np.sin(np.linspace(0, 3, 30)),
                     np.zeros(30)], -1)
    img = dv.draw_map_topdown(pts, valid, traj, size=256)
    assert img.shape == (256, 256, 3) and np.isfinite(img).all()
    # cloud pixels land (green-ish channel) and trajectory drew red pixels
    assert (img[..., 2] > 0).sum() > 200
    red = (img[..., 0] > 0.9) & (img[..., 1] < 0.3)
    assert red.sum() >= 30
    dv.save_ppm(str(tmp_path / "map.ppm"), img)
    assert (tmp_path / "map.ppm").stat().st_size > 100

def test_draw_map_topdown_empty():
    img = dv.draw_map_topdown(np.zeros((0, 3)))
    assert img.shape == (800, 800, 3) and float(img.sum()) == 0.0


def test_export_html_viewer(tmp_path):
    """The standalone interactive viewer (live-RViz counterpart): one
    self-contained HTML file embedding the decimated map + trajectories."""
    rng = np.random.default_rng(1)
    traj = np.stack([np.linspace(0, 2, 8), np.zeros(8), np.zeros(8)], -1)
    pts = rng.uniform(-3, 3, (500, 3)).astype(np.float32)
    valid = np.ones(500, bool)
    valid[:100] = False
    p = dv.export_html_viewer(
        str(tmp_path / "v.html"), traj, map_xyz=pts, map_valid=valid,
        gt=traj + 0.01, loop_pairs=np.array([[0, 7]]))
    txt = open(p).read()
    assert txt.startswith("<!DOCTYPE html>") and "</html>" in txt
    for key in ('"traj"', '"map"', '"gt"', '"loops"'):
        assert key in txt, key
    import json
    import re

    data = json.loads(re.search(r"const DATA = (\{.*?\});\n", txt).group(1))
    assert len(data["traj"]) == 8 and len(data["map"]) == 400
    assert data["loops"] == [[0, 7]]

    # decimation cap holds
    p2 = dv.export_html_viewer(str(tmp_path / "v2.html"), traj,
                               map_xyz=pts, max_points=100)
    d2 = json.loads(re.search(r"const DATA = (\{.*?\});\n",
                              open(p2).read()).group(1))
    assert len(d2["map"]) <= 100
