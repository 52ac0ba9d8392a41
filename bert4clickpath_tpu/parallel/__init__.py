from bert4clickpath_tpu.parallel.mesh import make_mesh  # noqa: F401
