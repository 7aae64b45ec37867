from pathtracer_tpu.textures.texture import Textures, eval_texture, MAX_LAYERS

__all__ = ["Textures", "eval_texture", "MAX_LAYERS"]
