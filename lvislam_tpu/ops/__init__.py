from . import (  # noqa: F401
    ba, brief, calibration, camera, chessboard, depth_assoc, gftt, icp, image, klt,
    loam, pointcloud, posegraph, preintegration, ransac, scan2map, smallmat,
    triangulate, voxel_hash,
)
