from gsasr_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                     replicated_sharding)
from gsasr_tpu.parallel.spatial import (gs_render_px_banded,
                                        render_gaussians_banded,
                                        sr_forward_spatial)

__all__ = [
    "make_mesh", "batch_sharding", "replicated_sharding",
    "gs_render_px_banded", "render_gaussians_banded", "sr_forward_spatial",
]
