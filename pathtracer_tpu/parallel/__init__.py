from pathtracer_tpu.parallel.mesh import (
    make_render_mesh,
    render_bdpt_sharded,
    render_chunk_sharded,
    render_regen_sharded,
    render_sampled_sharded,
    render_splatted_sharded,
)

__all__ = [
    "make_render_mesh",
    "render_bdpt_sharded",
    "render_chunk_sharded",
    "render_regen_sharded",
    "render_sampled_sharded",
    "render_splatted_sharded",
]
