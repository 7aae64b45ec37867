from pathtracer_tpu.world.world import World
from pathtracer_tpu.world.environment import (
    Environment,
    ENV_CONSTANT,
    ENV_SUN,
    ENV_HDR,
    env_emission,
    env_pdf_for,
    env_sample_uv,
)

__all__ = [
    "World",
    "Environment",
    "ENV_CONSTANT",
    "ENV_SUN",
    "ENV_HDR",
    "env_emission",
    "env_pdf_for",
    "env_sample_uv",
]
