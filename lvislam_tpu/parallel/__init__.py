from . import mesh, sharded_knn, batch_replay  # noqa: F401
