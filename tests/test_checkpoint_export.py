"""Checkpoint/resume + map export tests (SURVEY.md §5 checkpoint/resume)."""

import os

import numpy as np
import jax.numpy as jnp

from lvislam_tpu.models.lio import mapping
from lvislam_tpu.utils import checkpoint as ckpt


def small_state():
    caps = mapping.LioCaps(
        max_keyframes=8, kf_corner=32, kf_surf=64, sel_keyframes=4,
        map_corner=128, map_surf=256, scan_corner=32, scan_surf=64,
        max_loops=2, max_gps=2, loop_submap=128, icp_iters=2,
    )
    st = mapping.lio_init(caps)
    st = st._replace(
        kf_count=jnp.int32(3),
        kf_trans=st.kf_trans.at[:3].set(jnp.array([[0, 0, 0], [1, 0, 0], [2, 0.5, 0.0]])),
        kf_time=st.kf_time.at[:3].set(jnp.array([0.0, 1.0, 2.0])),
        kf_surf=st.kf_surf.at[:3, :10].set(
            jnp.array(np.random.default_rng(0).normal(size=(3, 10, 3)), jnp.float32)
        ),
        kf_surf_valid=st.kf_surf_valid.at[:3, :10].set(True),
    )
    return st, caps


def test_checkpoint_roundtrip(tmp_path):
    st, caps = small_state()
    p = str(tmp_path / "state.npz")
    ckpt.save_state(p, st)
    st2 = ckpt.load_state(p, mapping.lio_init(caps))
    for a, b in zip(
        __import__("jax").tree.leaves(st), __import__("jax").tree.leaves(st2)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_save_map_service(tmp_path):
    st, _ = small_state()
    out = ckpt.save_map_service(st, str(tmp_path / "maps"), resolution=0.0)
    assert out["n_keyframes"] == 3
    assert out["n_surf"] == 30
    files = os.listdir(tmp_path / "maps")
    assert {"trajectory.pcd", "transformations.txt", "SurfMap.pcd",
            "CornerMap.pcd", "GlobalMap.pcd"} <= set(files)
    # PCD parses back
    lines = open(tmp_path / "maps" / "SurfMap.pcd").read().splitlines()
    assert lines[0].startswith("#")
    n = int([l for l in lines if l.startswith("POINTS")][0].split()[1])
    assert n == 30
    # TUM trajectory has 3 rows of 8 columns
    rows = open(tmp_path / "maps" / "transformations.txt").read().splitlines()
    assert len(rows) == 3 and len(rows[0].split()) == 8
