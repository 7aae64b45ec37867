from pathtracer_tpu.renderer.naive import render_sampled
from pathtracer_tpu.renderer.output import output_film

__all__ = ["render_sampled", "output_film"]
