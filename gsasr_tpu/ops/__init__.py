from gsasr_tpu.ops.reference import gs_render_reference
from gsasr_tpu.ops.rasterizer import gs_render

__all__ = ["gs_render", "gs_render_reference"]
