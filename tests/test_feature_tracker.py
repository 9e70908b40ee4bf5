"""Feature tracker subsystem test on rendered synthetic frames (config 2:
KLT tracking only), plus depth association on an exactly-known scene."""

import numpy as np
import jax.numpy as jnp

from lvislam_tpu.core.config import CameraIntrinsics
from lvislam_tpu.models.vio import feature_tracker as ft
from lvislam_tpu.ops import depth_assoc
from lvislam_tpu.utils import synthetic as syn

CAM = CameraIntrinsics(
    model_type="PINHOLE", gamma1=200.0, gamma2=200.0, u0=160.0, v0=120.0,
    k1=0.0, k2=0.0, p1=0.0, p2=0.0, image_width=320, image_height=240,
)
PARAMS = ft.TrackerParams(max_cnt=64, min_dist=16, klt_levels=2, klt_half=7,
                          klt_iters=20, equalize=False)


def test_tracker_sequence():
    world = syn.default_world(seed=3)
    traj = syn.figure8_trajectory(scale=3.0, period=30.0)
    st = ft.tracker_init(240, 320, PARAMS)
    outs = []
    id_history = {}
    for k in range(6):
        t = 1.0 + 0.1 * k
        img = syn.render_camera_image(world, traj, t, width=320, height=240, f=200.0)
        st, out = ft.tracker_step(st, jnp.array(img), jnp.float32(t), PARAMS, CAM)
        outs.append(out)
        for i, fid in enumerate(np.asarray(out.ids)):
            if fid >= 0 and bool(out.valid[i]):
                id_history.setdefault(int(fid), []).append(np.asarray(out.uv)[i])
    # after a few frames there must be persistent multi-frame tracks
    long_tracks = [v for v in id_history.values() if len(v) >= 4]
    assert len(long_tracks) > 10, len(long_tracks)
    # ids are unique per slot snapshot
    ids_last = np.asarray(outs[-1].ids)
    live = ids_last[ids_last >= 0]
    assert len(np.unique(live)) == len(live)
    assert int(outs[-1].n_tracked) > 15


def test_depth_association_exact_plane():
    rng = np.random.default_rng(0)
    # depth cloud: a wall at x = 10 (body frame, x forward)
    yz = rng.uniform(-4, 4, size=(4000, 2))
    cloud = np.concatenate([np.full((4000, 1), 10.0), yz], axis=1).astype(np.float32)
    # features: rays through the wall. normalized cam coords (x right, y down)
    feats = rng.uniform(-0.25, 0.25, size=(32, 2)).astype(np.float32)
    depth = np.asarray(depth_assoc.feature_depths(
        jnp.array(feats), jnp.ones(32, bool),
        jnp.array(cloud), jnp.ones(4000, bool),
    ))
    # expected: ray (1, -xn, -yn)/n hits x=10 at s = 10*n/1 -> cam depth = 10
    assert (depth > 0).sum() > 20
    got = depth[depth > 0]
    np.testing.assert_allclose(got, 10.0, atol=0.1)
