"""Multi-chip scaling over jax.sharding meshes."""

from xsarsea_tpu.parallel.mesh import make_mesh  # noqa: F401
from xsarsea_tpu.parallel.inversion import sharded_invert_pixels  # noqa: F401
from xsarsea_tpu.parallel.batch import invert_scenes  # noqa: F401
from xsarsea_tpu.parallel.gradients import sharded_streaks_histogram  # noqa: F401
