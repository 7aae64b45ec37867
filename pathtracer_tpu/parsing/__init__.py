from pathtracer_tpu.parsing.builder import SceneBuilder

__all__ = ["SceneBuilder"]
