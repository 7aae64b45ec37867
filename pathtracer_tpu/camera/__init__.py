from pathtracer_tpu.camera.projective import ProjectiveCamera, make_projective_camera

__all__ = ["ProjectiveCamera", "make_projective_camera"]
