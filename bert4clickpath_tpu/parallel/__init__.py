from bert4clickpath_tpu.parallel.mesh import make_mesh  # noqa: F401
from bert4clickpath_tpu.parallel import tp  # noqa: F401
