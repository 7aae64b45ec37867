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


def _layer_weight_meta(tex: Textures, curve_f, offset_f, w_f, h_f, uv):
    """Nearest-sample a layer's weight map from pre-gathered metadata."""
    w = w_f.astype(jnp.int32)
    h = h_f.astype(jnp.int32)
    u = jnp.clip(uv[..., 0], 0.0, 1.0 - 1e-6)
    v = jnp.clip(uv[..., 1], 0.0, 1.0 - 1e-6)
    x = jnp.minimum((u * w_f).astype(jnp.int32), w - 1)
    y = jnp.minimum((v * h_f).astype(jnp.int32), h - 1)
    return tex.atlas[offset_f.astype(jnp.int32) + y * w + x]


def eval_texture(tex: Textures, bank: spectral.CurveBank, tex_id, lam, uv):
    """Σ_layers weight(uv) · curve(λ) for texture `tex_id` — the EvalAt
    equivalent. tex_id: i32[...]; lam: f32[...]; uv: f32[...,2].

    Per-lane gathers are minimized: one packed (start,count) row, one packed
    layer-metadata row per unrolled layer, one atlas texel, one curve-pair
    gather (separate column gathers are ~4ms each at 1M lanes on TPU).
    When every texture is single-layer (#layers == #textures, a STATIC
    shape condition — the common constant-color case) the layer loop
    collapses to one iteration with no count mask."""
    meta = jnp.stack(
        [
            tex.layer_curve.astype(jnp.float32),
            tex.layer_offset.astype(jnp.float32),
            tex.layer_w.astype(jnp.float32),
            tex.layer_h.astype(jnp.float32),
        ],
        axis=1,
    )  # [L, 4] loop-invariant
    all_single = tex.layer_curve.shape[0] == tex.layer_start.shape[0]
    if all_single:
        row = meta[tex_id]
        wgt = _layer_weight_meta(tex, row[..., 0], row[..., 1], row[..., 2], row[..., 3], uv)
        val = spectral.evaluate(bank, row[..., 0].astype(jnp.int32), lam)
        return wgt * val
    sc = jnp.stack(
        [tex.layer_start.astype(jnp.float32), tex.layer_count.astype(jnp.float32)],
        axis=1,
    )
    sc_row = sc[tex_id]
    start = sc_row[..., 0].astype(jnp.int32)
    count = sc_row[..., 1].astype(jnp.int32)
    total = jnp.zeros_like(lam)
    for k in range(MAX_LAYERS):
        li = jnp.minimum(start + k, tex.layer_curve.shape[0] - 1)
        active = k < count
        row = meta[li]
        wgt = _layer_weight_meta(tex, row[..., 0], row[..., 1], row[..., 2], row[..., 3], uv)
        val = spectral.evaluate(bank, row[..., 0].astype(jnp.int32), lam)
        total = total + jnp.where(active, wgt * val, 0.0)
    return total
