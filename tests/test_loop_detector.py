"""Visual loop detection tests: BRIEF matching invariance, BoW
discrimination, and end-to-end revisit detection on rendered images."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as Rsc

from lvislam_tpu.models.loop import loop_detector as ld
from lvislam_tpu.ops import brief, gftt
from lvislam_tpu.utils import synthetic as syn

CAPS = ld.LoopCaps(max_keyframes=64, window_points=48, extra_points=128,
                   recent_exclude=3, min_loop_matches=15)


def render(world, traj, t):
    return syn.render_camera_image(world, traj, t, width=320, height=240, f=200.0)


def test_brief_match_same_scene():
    world = syn.default_world(seed=3)
    traj = syn.figure8_trajectory(scale=3.0, period=30.0)
    img0 = render(world, traj, 1.0)
    img1 = render(world, traj, 1.02)  # tiny motion
    kp, ok = gftt.detect(jnp.array(img0), jnp.zeros((1, 2)), jnp.zeros(1, bool),
                         max_pts=64, cell=16, border=16)
    d0 = brief.describe(jnp.array(img0), kp, ok)
    d1 = brief.describe(jnp.array(img1), kp, ok)  # same locations, moved img
    ham_same = np.asarray(brief.hamming_matmul(d0, d1))
    diag = np.diag(ham_same)[np.asarray(ok)]
    # descriptors at corresponding locations stay close
    assert np.median(diag) < 60, np.median(diag)
    # but random pairs are far
    assert np.median(ham_same) > 90


def test_loop_detection_on_revisit():
    world = syn.default_world(seed=3)
    traj = syn.figure8_trajectory(scale=3.0, period=8.0)  # fast loop: revisit at t+8
    db = ld.db_init(CAPS)
    Wp = CAPS.window_points
    found_at = []
    times = list(np.arange(0.0, 8.4, 0.4))
    for i, t in enumerate(times):
        img = jnp.array(render(world, traj, t))
        kp, ok = gftt.detect(img, jnp.zeros((1, 2)), jnp.zeros(1, bool),
                             max_pts=Wp, cell=20, border=16)
        # fake 3D points along rays (verification needs consistent geometry;
        # use the true geometry: raycast depths)
        p, R = traj.pose(np.array([t]))
        d_cam = np.concatenate([
            (np.asarray(kp) - [160, 120]) / 200.0, np.ones((Wp, 1))], axis=1)
        d_cam /= np.linalg.norm(d_cam, axis=1, keepdims=True)
        R_cb = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], float).T
        d_world = d_cam @ (R[0] @ R_cb).T
        rng_hit = syn.raycast(world, np.broadcast_to(p[0], d_world.shape), d_world)
        pts_w = p[0] + d_world * np.where(np.isfinite(rng_hit), rng_hit, 10.0)[:, None]
        norm = (np.asarray(kp) - [160, 120]) / 200.0
        db, cand = ld.add_and_detect(
            db, img, kp, jnp.array(norm, jnp.float32),
            jnp.array(pts_w, jnp.float32),
            ok & jnp.array(np.isfinite(rng_hit)), jnp.float32(t), CAPS,
            focal=200.0,
        )
        if bool(cand.found):
            found_at.append((i, int(cand.old_index), float(cand.best_score)))
    # revisiting the start after one period must produce at least one loop
    assert len(found_at) > 0, "no loop detected on revisit"
    # the matched old frame should be temporally distant
    i, old, score = found_at[0]
    assert i - old >= CAPS.recent_exclude
