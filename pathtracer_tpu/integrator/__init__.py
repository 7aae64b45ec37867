from pathtracer_tpu.integrator.pt import PTSettings, pt_trace

__all__ = ["PTSettings", "pt_trace"]
