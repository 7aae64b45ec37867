from pathtracer_tpu.utils.profile import Profile

__all__ = ["Profile"]
