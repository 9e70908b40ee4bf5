"""Checkpoint / resume + map export.

The reference's only persistence is the `lio_sam/save_map` service writing
trajectory + corner/surf/global PCDs (`mapOptimization.cpp:179-238`) and
the dead pose-graph save/load (`pose_graph.cpp:697,752`). Here the entire
estimator state is one pytree, so checkpointing is total (SURVEY.md §5
"full-state pytree checkpoint"):

- `save_state` / `load_state`: any NamedTuple/pytree of arrays -> one .npz
  (structure re-created from a template on load, exact resume);
- `save_map_service`: the LIS keyframe map -> ASCII PCD files + TUM-format
  trajectory, with optional voxel resolution — feature parity with the
  reference service (incl. per-keyframe global assembly).
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp


def save_state(path: str, state) -> None:
    leaves, treedef = jax.tree.flatten(state)
    np.savez_compressed(
        path,
        __treedef__=np.frombuffer(str(treedef).encode(), dtype=np.uint8),
        **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)},
    )


def load_state(path: str, template):
    """Load into the structure of `template` (shape-checked)."""
    data = np.load(path)
    leaves, treedef = jax.tree.flatten(template)
    out = []
    for i, leaf in enumerate(leaves):
        arr = data[f"leaf_{i}"]
        if hasattr(leaf, "shape") and tuple(arr.shape) != tuple(np.shape(leaf)):
            raise ValueError(f"leaf {i}: shape {arr.shape} != {np.shape(leaf)}")
        out.append(jnp.asarray(arr))
    return jax.tree.unflatten(treedef, out)


def write_pcd(path: str, xyz: np.ndarray, intensity: np.ndarray | None = None):
    """Minimal ASCII PCD writer (pcl::io::savePCDFileASCII equivalent)."""
    xyz = np.asarray(xyz, np.float32)
    n = len(xyz)
    fields = "x y z" + (" intensity" if intensity is not None else "")
    sizes = "4 4 4" + (" 4" if intensity is not None else "")
    types = "F F F" + (" F" if intensity is not None else "")
    counts = "1 1 1" + (" 1" if intensity is not None else "")
    with open(path, "w") as f:
        f.write(
            "# .PCD v0.7 - Point Cloud Data file format\n"
            f"VERSION 0.7\nFIELDS {fields}\nSIZE {sizes}\nTYPE {types}\n"
            f"COUNT {counts}\nWIDTH {n}\nHEIGHT 1\n"
            "VIEWPOINT 0 0 0 1 0 0 0\n"
            f"POINTS {n}\nDATA ascii\n"
        )
        for i in range(n):
            row = f"{xyz[i,0]:.6f} {xyz[i,1]:.6f} {xyz[i,2]:.6f}"
            if intensity is not None:
                row += f" {float(intensity[i]):.6f}"
            f.write(row + "\n")


def save_trajectory_tum(path: str, stamps, trans, quats_wxyz):
    """TUM format: `t x y z qx qy qz qw` (consumed by evo etc.)."""
    with open(path, "w") as f:
        for t, p, q in zip(stamps, trans, quats_wxyz):
            f.write(
                f"{t:.6f} {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} "
                f"{q[1]:.6f} {q[2]:.6f} {q[3]:.6f} {q[0]:.6f}\n"
            )


def global_map_points(state, resolution: float = 0.0):
    """World-frame (corner, surf) global clouds assembled from the
    keyframe database — the `publishGlobalMap` cloud
    (`mapOptimization.cpp:421-510`), optionally re-downsampled at
    `resolution` (the saveMapService arg)."""
    from ..core import lie
    from ..ops import pointcloud as pc

    n = int(state.kf_count)
    kt = np.asarray(state.kf_trans[:n])
    kq = np.asarray(state.kf_quat[:n])

    def assemble(clouds, valids):
        pts = []
        for k in range(n):
            v = np.asarray(valids[k])
            p = np.asarray(clouds[k])[v]
            t = kt[k]
            q = kq[k]
            pw = np.asarray(
                lie.quat_rotate(jnp.asarray(q)[None], jnp.asarray(p)) + jnp.asarray(t)[None]
            )
            pts.append(pw)
        if not pts:
            return np.zeros((0, 3), np.float32)
        out = np.concatenate(pts)
        if resolution > 0 and len(out):
            xyz, valid, _ = pc.voxel_downsample(
                jnp.asarray(out), jnp.ones(len(out), bool), resolution,
                capacity=max(1024, 1 << int(np.ceil(np.log2(len(out))))),
            )
            out = np.asarray(xyz)[np.asarray(valid)]
        return out

    return (assemble(state.kf_corner, state.kf_corner_valid),
            assemble(state.kf_surf, state.kf_surf_valid))


def save_map_service(state, out_dir: str, resolution: float = 0.0):
    """`saveMapService` (`mapOptimization.cpp:179-238`): writes
    trajectory.pcd (keyframe positions), transformations (TUM), corner/surf
    global maps (optionally re-downsampled at `resolution`), plus the
    offline visualization artifacts (top-down PPM + interactive HTML)."""
    os.makedirs(out_dir, exist_ok=True)
    n = int(state.kf_count)
    kt = np.asarray(state.kf_trans[:n])
    kq = np.asarray(state.kf_quat[:n])
    ktime = np.asarray(state.kf_time[:n])
    write_pcd(os.path.join(out_dir, "trajectory.pcd"), kt)
    save_trajectory_tum(os.path.join(out_dir, "transformations.txt"), ktime, kt, kq)

    corner, surf = global_map_points(state, resolution)
    write_pcd(os.path.join(out_dir, "CornerMap.pcd"), corner)
    write_pcd(os.path.join(out_dir, "SurfMap.pcd"), surf)
    if len(corner) + len(surf):
        gmap = np.concatenate([corner, surf]) if len(corner) else surf
        write_pcd(os.path.join(out_dir, "GlobalMap.pcd"), gmap)
        # top-down render — the RViz global-map + path view
        # (`visualizeGlobalMapThread`, `mapOptimization.cpp:421-510`)
        from .debugviz import draw_map_topdown, export_html_viewer, save_ppm

        save_ppm(os.path.join(out_dir, "GlobalMap_topdown.ppm"),
                 draw_map_topdown(gmap, trajectory=kt))
        # interactive 3D session — the live-RViz counterpart
        export_html_viewer(os.path.join(out_dir, "viewer.html"), kt,
                           map_xyz=gmap)
    return dict(n_keyframes=n, n_corner=len(corner), n_surf=len(surf))
