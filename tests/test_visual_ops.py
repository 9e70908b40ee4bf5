"""Visual front-end op tests: camera model round-trips (SURVEY.md §4
"liftProjective∘spaceToPlane ≈ id"), pyramidal KLT on rendered synthetic
images (BASELINE config 2 core), GFTT, and RANSAC estimators."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as Rsc

from lvislam_tpu.core.config import CameraIntrinsics
from lvislam_tpu.ops import camera, klt, gftt, ransac
from lvislam_tpu.ops import image as imops
from lvislam_tpu.utils import synthetic as syn
from lvislam_tpu.core import lie

MEI_CAM = CameraIntrinsics()  # shipped MEI config values
PINHOLE_CAM = dataclasses.replace(
    CameraIntrinsics, model_type="PINHOLE", gamma1=460.0, gamma2=460.0,
    u0=512.0, v0=288.0, k1=-0.03, k2=0.007, p1=1e-4, p2=-2e-4, xi=0.0,
)() if False else CameraIntrinsics(
    model_type="PINHOLE", gamma1=460.0, gamma2=460.0, u0=512.0, v0=288.0,
    k1=-0.03, k2=0.007, p1=1e-4, p2=-2e-4,
)
KB_CAM = CameraIntrinsics(
    model_type="KANNALA_BRANDT", gamma1=350.0, gamma2=350.0, u0=512.0,
    v0=288.0, kb_k2=-0.01, kb_k3=0.004, kb_k4=-0.002, kb_k5=0.0005,
)


def roundtrip(cam, rng, n=200, fov_z=0.4):
    ray = rng.normal(size=(n, 3))
    ray[:, 2] = np.abs(ray[:, 2]) + fov_z  # keep in front, inside FOV
    ray /= np.linalg.norm(ray, axis=-1, keepdims=True)
    uv = np.asarray(camera.space_to_plane(jnp.array(ray * 3.0, jnp.float32), cam))
    keep = (
        (uv[:, 0] > 50) & (uv[:, 0] < 950) & (uv[:, 1] > 50) & (uv[:, 1] < 550)
    )
    ray2 = np.asarray(camera.lift_projective(jnp.array(uv, jnp.float32), cam))
    dots = np.sum(ray * ray2, axis=-1)
    return dots[keep]


def test_mei_roundtrip(rng):
    d = roundtrip(MEI_CAM, rng)
    assert len(d) > 50
    np.testing.assert_allclose(d, 1.0, atol=1e-4)


def test_pinhole_roundtrip(rng):
    d = roundtrip(PINHOLE_CAM, rng, fov_z=0.8)
    assert len(d) > 50
    np.testing.assert_allclose(d, 1.0, atol=1e-4)


def test_kb_roundtrip(rng):
    d = roundtrip(KB_CAM, rng, fov_z=0.5)
    assert len(d) > 50
    np.testing.assert_allclose(d, 1.0, atol=1e-4)


def _render_pair(dt=0.08):
    world = syn.default_world(seed=3)
    traj = syn.figure8_trajectory(scale=3.0, period=30.0)
    img0 = syn.render_camera_image(world, traj, 1.0, width=320, height=240, f=200.0)
    img1 = syn.render_camera_image(world, traj, 1.0 + dt, width=320, height=240, f=200.0)
    return img0, img1


def test_klt_tracks_synthetic_motion():
    img0, img1 = _render_pair()
    # detect corners on img0
    pts, valid = gftt.detect(
        jnp.array(img0), jnp.zeros((1, 2)), jnp.zeros(1, bool), max_pts=64,
        cell=16, border=12,
    )
    assert int(valid.sum()) > 20
    res = klt.track(jnp.array(img0), jnp.array(img1), pts, valid, levels=2,
                    half=7, iters=20)
    ok = np.asarray(res.status)
    assert ok.sum() > 15
    # verify against brute-force local template matching for a few features
    p0 = np.asarray(pts)[ok]
    p1 = np.asarray(res.pts)[ok]
    flow = p1 - p0
    # flows should be coherent (camera motion): median magnitude > 0.3 px
    # and tracked patches should actually match
    from lvislam_tpu.ops import image as imops

    patches0 = np.asarray(imops.extract_patches(jnp.array(img0), jnp.array(p0), 5))
    patches1 = np.asarray(imops.extract_patches(jnp.array(img1), jnp.array(p1), 5))
    errs = np.abs(patches0 - patches1).mean(axis=(1, 2))
    base = np.abs(
        np.asarray(imops.extract_patches(jnp.array(img1), jnp.array(p0), 5)) - patches0
    ).mean(axis=(1, 2))
    # tracking must reduce the photometric error vs not moving
    assert np.median(errs) < np.median(base)
    assert np.median(errs) < 0.08


def test_fundamental_ransac_rejects_outliers(rng):
    n = 120
    # synthetic two-view geometry
    X = rng.uniform(-2, 2, size=(n, 3)) + np.array([0, 0, 5.0])
    R = Rsc.from_euler("xyz", [2, 5, 1], degrees=True).as_matrix()
    t = np.array([0.3, 0.05, 0.02])
    f, cx, cy = 460.0, 320.0, 240.0
    uv1 = X[:, :2] / X[:, 2:3] * f + [cx, cy]
    X2 = X @ R.T + t
    uv2 = X2[:, :2] / X2[:, 2:3] * f + [cx, cy]
    # inject outliers
    out_idx = rng.choice(n, 25, replace=False)
    uv2_noisy = uv2.copy()
    uv2_noisy[out_idx] += rng.uniform(-80, 80, size=(25, 2))
    res = ransac.fundamental_ransac(
        jnp.array(uv1, jnp.float32), jnp.array(uv2_noisy, jnp.float32),
        jnp.ones(n, bool), threshold=1.5, n_hyp=256,
    )
    inl = np.asarray(res.inliers)
    is_out = np.zeros(n, bool)
    is_out[out_idx] = True
    # nearly all true inliers kept, nearly all outliers rejected
    assert inl[~is_out].mean() > 0.9
    assert inl[is_out].mean() < 0.2


def test_pnp_ransac(rng):
    n = 80
    X = rng.uniform(-3, 3, size=(n, 3)) + np.array([0, 0, 8.0])
    R = Rsc.from_euler("xyz", [8, -5, 20], degrees=True).as_matrix()
    t = np.array([0.5, -0.3, 0.4])
    Pc = X @ R.T + t
    uv = Pc[:, :2] / Pc[:, 2:3]
    out_idx = rng.choice(n, 15, replace=False)
    uv_noisy = uv.copy()
    uv_noisy[out_idx] += rng.uniform(-0.3, 0.3, size=(15, 2))
    res = ransac.pnp_ransac(
        jnp.array(X, jnp.float32), jnp.array(uv_noisy, jnp.float32),
        jnp.ones(n, bool), threshold=0.02, n_hyp=128,
    )
    R_est = np.asarray(lie.quat_to_matrix(res.quat))
    assert Rsc.from_matrix(R_est @ R.T).magnitude() < 0.01
    np.testing.assert_allclose(np.asarray(res.trans), t, atol=0.05)


def test_clahe_pallas_matches_xla():
    """The VMEM-resident Pallas CLAHE (hist + LUT apply kernels) must match
    the XLA scan-over-bins form exactly (same math, fp reassociation only).
    Runs the kernels in interpret mode on CPU."""
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.random((64, 1024)).astype(np.float32) ** 2)
    a = np.asarray(imops.clahe(img, use_pallas=False))
    b = np.asarray(imops.clahe(img, use_pallas=True))
    np.testing.assert_allclose(a, b, atol=1e-6)
