"""Radiance fields: instant-NGP-style and vanilla-NeRF-style.

TPU-native re-designs of the reference field models
(reference: deblur_e_nerf/external/ngp.py:109-280, external/mlp.py:26-358):
the hash encoding is our XLA gather kernel (models/hash_encoding.py) instead
of tiny-cuda-nn, MLPs are plain XLA matmuls (64-wide layers batch well on
the MXU at >100k-sample batches), and the in-AABB selector gating matches
the reference semantics exactly.

Weight init matches torch.nn.Linear defaults (Kaiming-uniform with a=sqrt(5),
uniform bias) so training dynamics are comparable to the reference.
"""

import math
from typing import Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.ad_checkpoint
import jax.numpy as jnp
from jax.nn import initializers

from ..ops import activations
from . import contraction as contraction_lib
from . import hash_encoding, sh_encoding

# torch.nn.Linear default init: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))
_torch_linear_kernel_init = initializers.variance_scaling(
    scale=1.0 / 3.0, mode="fan_in", distribution="uniform"
)


def _torch_linear_bias_init(fan_in):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        from jax import random
        return random.uniform(key, shape, dtype, -bound, bound)

    return init


class Dense(nn.Module):
    features: int
    use_bias: bool = True
    weight_norm: bool = False

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel = self.param(
            "kernel", _torch_linear_kernel_init,
            (fan_in, self.features), jnp.float32,
        )
        if self.weight_norm:
            # torch weight_norm over output rows: w = g * v / |v|
            g = self.param(
                "scale",
                lambda key, shape: jnp.linalg.norm(
                    kernel.T, axis=-1
                ).reshape(shape),
                (self.features,),
            )
            norm = jnp.linalg.norm(kernel, axis=0, keepdims=True)
            kernel = kernel / jnp.maximum(norm, 1e-12) * g[None, :]
        y = x @ kernel
        if self.use_bias:
            bias = self.param(
                "bias", _torch_linear_bias_init(fan_in), (self.features,)
            )
            y = y + bias
        return y


class MLP(nn.Module):
    """Skip-connection MLP (reference: external/mlp.py:26-113)."""
    output_dim: int
    net_depth: int = 8
    net_width: int = 256
    skip_layer: Optional[int] = 4
    hidden_activation: Callable = nn.relu
    output_activation: Callable = lambda x: x
    output_enabled: bool = True
    weight_norm: bool = False

    @nn.compact
    def __call__(self, x):
        inputs = x
        for i in range(self.net_depth):
            x = Dense(self.net_width, weight_norm=self.weight_norm,
                      name=f"hidden_{i}")(x)
            x = self.hidden_activation(x)
            if (self.skip_layer is not None and i % self.skip_layer == 0
                    and i > 0):
                x = jnp.concatenate([x, inputs], axis=-1)
        if self.output_enabled:
            x = Dense(self.output_dim, weight_norm=self.weight_norm,
                      name="output")(x)
            x = self.output_activation(x)
        return x


class NGPField(nn.Module):
    """Instant-NGP radiance field (reference: external/ngp.py:109-280).

    Density branch: contracted position -> grid encode -> mlp_base
    (1 hidden x 64) -> [raw density | geo features]; density via the
    configured activation, gated by an in-unit-cube selector.
    View branch: SH(dir) ++ geo features -> mlp_head (2 x 64) -> radiance.
    """
    aabb: Tuple[float, ...]
    contraction_type: contraction_lib.ContractionType
    radiance_dim: int = 3
    use_viewdirs: bool = True
    # pos_encoding config
    pos_otype: str = "HashGrid"
    n_levels: int = 16
    n_features_per_level: int = 2
    log2_hashmap_size: int = 19
    base_resolution: int = 16
    per_level_scale: float = 1.4472692012786865
    cellhash_min_load: float = 8.0   # HybridHashGrid switch point
    # dtype the encode GATHERS the table in (param + grads stay f32);
    # "bfloat16" halves the encode's HBM traffic, matching the
    # reference's fp16 tcnn table (external/ngp.py:166-170)
    grid_compute_dtype: str = "float32"
    # dir encoding
    sh_degree: int = 4
    # mlp_base config
    base_hidden_activation: str = "softplus"
    density_activation: str = "shifted_trunc_exp"
    base_n_neurons: int = 64
    base_n_hidden_layers: int = 1
    geo_feat_dim: int = 15
    base_weight_norm: bool = False
    # mlp_head config
    head_hidden_activation: str = "softplus"
    radiance_activation: str = "softplus"
    head_n_neurons: int = 64
    head_n_hidden_layers: int = 2
    head_weight_norm: bool = False

    def setup(self):
        self.levels, total_size = hash_encoding.grid_layout(
            self.pos_otype, self.n_levels, self.base_resolution,
            self.per_level_scale, self.log2_hashmap_size,
            cellhash_min_load=self.cellhash_min_load,
        )
        self.table = self.param(
            "table",
            lambda key, shape: (
                initializers.uniform(scale=2e-4)(
                    key, shape, jnp.float32
                ) - 1e-4
            ),
            (total_size, self.n_features_per_level),
        )
        self.mlp_base = MLP(
            output_dim=1 + self.geo_feat_dim,
            net_depth=self.base_n_hidden_layers,
            net_width=self.base_n_neurons,
            skip_layer=None,
            hidden_activation=activations.hidden_activation(
                self.base_hidden_activation
            ),
            weight_norm=self.base_weight_norm,
            name="mlp_base",
        )
        self.mlp_head = MLP(
            output_dim=self.radiance_dim,
            net_depth=self.head_n_hidden_layers,
            net_width=self.head_n_neurons,
            skip_layer=None,
            hidden_activation=activations.hidden_activation(
                self.head_hidden_activation
            ),
            output_activation=activations.radiance_activation(
                self.radiance_activation
            ),
            weight_norm=self.head_weight_norm,
            name="mlp_head",
        )
        self._density_activation = activations.density_activation(
            self.density_activation
        )

    def _contract(self, x):
        aabb = jnp.asarray(self.aabb, dtype=x.dtype)
        u = contraction_lib.contract(x, aabb, self.contraction_type)
        selector = jnp.all((u > 0.0) & (u < 1.0), axis=-1)
        return u, selector

    def density(self, x, return_feat=False, level_mask=None):
        """`level_mask`: optional (n_levels,) float weights on the grid
        levels — the coarse-to-fine training curriculum (instant-NGP
        style; a TPU-framework extension, not in the reference). Masked
        levels contribute zero features AND zero table gradient."""
        u, selector = self._contract(x)
        # sample positions are stop-gradiented in the render path, so the
        # fast frozen-position table-gradient path applies
        feat = hash_encoding.encode(
            self.table, u, self.levels, differentiable_positions=False,
            compute_dtype=(
                None if self.grid_compute_dtype == "float32"
                else jnp.dtype(self.grid_compute_dtype)
            ),
        )
        # named for the renderer's remat policy: saving the encode output
        # keeps the gather — the most expensive op in the step — out of
        # the backward-pass recompute (renderer.py field_chunk path)
        feat = jax.ad_checkpoint.checkpoint_name(feat, "hash_encode_out")
        if level_mask is not None:
            feat = feat * jnp.repeat(
                jnp.asarray(level_mask, feat.dtype),
                self.n_features_per_level,
            )
        h = self.mlp_base(feat)
        raw_density, geo_feat = h[..., :1], h[..., 1:]
        density = (
            self._density_activation(raw_density)
            * selector[..., None]
        )
        if return_feat:
            return density, geo_feat
        return density

    def __call__(self, x, direction, level_mask=None):
        density, geo_feat = self.density(
            x, return_feat=True, level_mask=level_mask
        )
        if self.use_viewdirs:
            d = sh_encoding.sh_encode(direction, self.sh_degree)
            h = jnp.concatenate([d, geo_feat], axis=-1)
        else:
            h = geo_feat
        radiance = self.mlp_head(h)
        return radiance, density


class VanillaNeRFField(nn.Module):
    """Vanilla NeRF MLP field (reference: external/mlp.py:246-358)."""
    aabb: Tuple[float, ...]
    contraction_type: contraction_lib.ContractionType
    radiance_dim: int = 3
    net_depth: int = 8
    net_width: int = 256
    skip_layer: int = 4
    net_depth_condition: int = 1
    net_width_condition: int = 128
    hidden_activation: str = "softplus"
    density_activation: str = "shifted_trunc_exp"
    radiance_activation: str = "softplus"
    pos_encoder_max_deg: int = 10
    view_encoder_max_deg: int = 4
    weight_norm: bool = False

    def setup(self):
        act = activations.hidden_activation(self.hidden_activation)
        self.base = MLP(
            output_dim=0, net_depth=self.net_depth,
            net_width=self.net_width, skip_layer=self.skip_layer,
            hidden_activation=act, output_enabled=False,
            weight_norm=self.weight_norm, name="base",
        )
        self.sigma_layer = Dense(1, weight_norm=self.weight_norm,
                                 name="sigma_layer")
        self.bottleneck_layer = Dense(
            self.net_width, weight_norm=self.weight_norm,
            name="bottleneck_layer",
        )
        self.rgb_layer = MLP(
            output_dim=self.radiance_dim,
            net_depth=self.net_depth_condition,
            net_width=self.net_width_condition, skip_layer=None,
            hidden_activation=act, weight_norm=self.weight_norm,
            name="rgb_layer",
        )
        self._density_activation = activations.density_activation(
            self.density_activation
        )
        self._radiance_activation = activations.radiance_activation(
            self.radiance_activation
        )

    def _sinusoidal(self, x, max_deg):
        """Sinusoidal encoding with identity passthrough
        (reference: external/mlp.py:208-243)."""
        scales = jnp.asarray(
            [2.0 ** i for i in range(max_deg)], dtype=x.dtype
        )
        xb = (x[..., None, :] * scales[:, None]).reshape(
            *x.shape[:-1], max_deg * x.shape[-1]
        )
        latent = jnp.sin(
            jnp.concatenate([xb, xb + 0.5 * jnp.pi], axis=-1)
        )
        return jnp.concatenate([x, latent], axis=-1)

    def _contract(self, x):
        aabb = jnp.asarray(self.aabb, dtype=x.dtype)
        u = contraction_lib.contract(x, aabb, self.contraction_type)
        selector = jnp.all((u > 0.0) & (u < 1.0), axis=-1)
        # scale input space to [-pi, pi] (reference: external/mlp.py:321-335)
        return 2 * jnp.pi * (u - 0.5), selector

    def density(self, x):
        u, selector = self._contract(x)
        h = self.base(self._sinusoidal(u, self.pos_encoder_max_deg))
        raw_sigma = self.sigma_layer(h)
        return self._density_activation(raw_sigma) * selector[..., None]

    def __call__(self, x, direction):
        u, selector = self._contract(x)
        h = self.base(self._sinusoidal(u, self.pos_encoder_max_deg))
        raw_sigma = self.sigma_layer(h)
        bottleneck = self.bottleneck_layer(h)
        cond = self._sinusoidal(
            direction * jnp.pi, self.view_encoder_max_deg
        )
        raw_rgb = self.rgb_layer(
            jnp.concatenate([bottleneck, cond], axis=-1)
        )
        radiance = self._radiance_activation(raw_rgb)
        density = self._density_activation(raw_sigma) * selector[..., None]
        return radiance, density
