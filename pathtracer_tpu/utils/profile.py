"""Ray-count profiling.

Capability parity with src/profile.rs:2-80: per-category ray counters
(camera/bounce/shadow/light rays, env hits) combined monoidally — here a
single device vector summed across the wavefront (and `psum`-reduced across
devices), converted to rays/sec at print time.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

N_COUNTERS = 5
CAMERA_RAYS, BOUNCE_RAYS, SHADOW_RAYS, LIGHT_RAYS, ENV_HITS = range(N_COUNTERS)


def zeros():
    return jnp.zeros((N_COUNTERS,), jnp.float32)


@dataclasses.dataclass
class Profile:
    camera_rays: int = 0
    bounce_rays: int = 0
    shadow_rays: int = 0
    light_rays: int = 0
    env_hits: int = 0

    def add_device_counts(self, counts):
        c = [int(x) for x in counts]
        self.camera_rays += c[CAMERA_RAYS]
        self.bounce_rays += c[BOUNCE_RAYS]
        self.shadow_rays += c[SHADOW_RAYS]
        self.light_rays += c[LIGHT_RAYS]
        self.env_hits += c[ENV_HITS]
        return self

    @property
    def total_rays(self):
        return self.camera_rays + self.bounce_rays + self.shadow_rays + self.light_rays

    def pretty_print(self, elapsed_s: float, devices: int = 1) -> str:
        tot = self.total_rays
        lines = [
            f"trace finished in {elapsed_s:.2f}s on {devices} device(s)",
            f"  camera rays: {self.camera_rays:,}",
            f"  bounce rays: {self.bounce_rays:,}",
            f"  shadow rays: {self.shadow_rays:,}",
            f"  light rays:  {self.light_rays:,}",
            f"  env hits:    {self.env_hits:,}",
            f"  total: {tot:,} rays, {tot / max(elapsed_s, 1e-9) / 1e6:.2f} Mrays/s"
            f" ({tot / max(elapsed_s, 1e-9) / 1e6 / devices:.2f} Mrays/s/device)",
        ]
        return "\n".join(lines)
