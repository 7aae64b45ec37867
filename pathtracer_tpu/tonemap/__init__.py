from pathtracer_tpu.tonemap.tonemap import (
    Clamp,
    Reinhard0,
    Reinhard0x3,
    Reinhard1,
    Reinhard1x3,
    sRGB_oetf,
    rec709_oetf,
    rec2020_oetf,
    tonemap_to_rgb,
)
from pathtracer_tpu.tonemap.io_png import write_png
from pathtracer_tpu.tonemap.io_exr import write_exr, read_exr

__all__ = [
    "Clamp",
    "Reinhard0",
    "Reinhard0x3",
    "Reinhard1",
    "Reinhard1x3",
    "sRGB_oetf",
    "rec709_oetf",
    "rec2020_oetf",
    "tonemap_to_rgb",
    "write_png",
    "write_exr",
    "read_exr",
]
