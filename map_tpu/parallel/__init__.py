from map_tpu.parallel.mesh import build_mesh, data_parallel_size  # noqa: F401
