from pathtracer_tpu.integrator.pt import PTSettings, pt_trace, trace_camera_sample
from pathtracer_tpu.integrator.lt import LTSettings, lt_trace
from pathtracer_tpu.integrator.bdpt import BDPTSettings, bdpt_trace
from pathtracer_tpu.integrator.pt_regen import pt_trace_regen
from pathtracer_tpu.integrator.pt_persistent import pt_trace_persistent

__all__ = [
    "PTSettings",
    "pt_trace",
    "trace_camera_sample",
    "LTSettings",
    "lt_trace",
    "BDPTSettings",
    "bdpt_trace",
    "pt_trace_regen",
    "pt_trace_persistent",
]
