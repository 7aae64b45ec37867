"""Spectral-upsampling textures, TPU-native.

Capability parity with the reference's Texture1/Texture4/TexStack
(src/texture.rs:101-116,134-152,204-276): a texture is a stack of layers,
each layer = a 2-D weight map × one basis spectral curve;
eval_at(λ, uv) = Σ_layers weight_layer(uv) · curve_layer(λ).

TPU design: all layer weight maps are flattened into ONE 1-D texel atlas in
HBM; a texture is (layer_start, layer_count) into per-layer metadata. Lookup
is a dense gather — `at_uv` clamps uv to [0,1) and nearest-samples, matching
the reference's Vec2D::at_uv (src/vec2d.rs:17-53).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from pathtracer_tpu.core import spectral

MAX_LAYERS = 4  # static unroll bound; Texture4 has 4 layers, Texture1 has 1


class Textures(NamedTuple):
    layer_start: jnp.ndarray  # i32[T]
    layer_count: jnp.ndarray  # i32[T]
    layer_curve: jnp.ndarray  # i32[L] curve index per layer
    layer_offset: jnp.ndarray  # i32[L] texel offset into atlas
    layer_w: jnp.ndarray  # i32[L]
    layer_h: jnp.ndarray  # i32[L]
    atlas: jnp.ndarray  # f32[A] flattened row-major weight maps

    @property
    def count(self):
        return self.layer_start.shape[0]


def _layer_weight(tex: Textures, layer_idx, uv):
    """Nearest-sample the layer's weight map at uv (clamped to [0,1))."""
    w = tex.layer_w[layer_idx]
    h = tex.layer_h[layer_idx]
    u = jnp.clip(uv[..., 0], 0.0, 1.0 - 1e-6)
    v = jnp.clip(uv[..., 1], 0.0, 1.0 - 1e-6)
    x = (u * w.astype(jnp.float32)).astype(jnp.int32)
    y = (v * h.astype(jnp.float32)).astype(jnp.int32)
    x = jnp.minimum(x, w - 1)
    y = jnp.minimum(y, h - 1)
    return tex.atlas[tex.layer_offset[layer_idx] + y * w + x]


def eval_texture(tex: Textures, bank: spectral.CurveBank, tex_id, lam, uv):
    """Σ_layers weight(uv) · curve(λ) for texture `tex_id` — the EvalAt
    equivalent. tex_id: i32[...]; lam: f32[...]; uv: f32[...,2]."""
    start = tex.layer_start[tex_id]
    count = tex.layer_count[tex_id]
    total = jnp.zeros_like(lam)
    for k in range(MAX_LAYERS):
        li = jnp.minimum(start + k, tex.layer_curve.shape[0] - 1)
        active = k < count
        wgt = _layer_weight(tex, li, uv)
        val = spectral.evaluate(bank, tex.layer_curve[li], lam)
        total = total + jnp.where(active, wgt * val, 0.0)
    return total
