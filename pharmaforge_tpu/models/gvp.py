"""Geometric Vector Perceptron primitives (dense, mask-friendly).

TPU-native re-implementation of the reference GVP stack
(models/gvp.py:43-166, itself adapted from lucidrains'
geometric-vector-perceptron). All modules operate on `(scalars, vectors)`
pairs with arbitrary leading batch dims:

    scalars: [..., n_feats]
    vectors: [..., n_vectors, 3]

which lets the same module run per-node ([B, N, ...]) and per-edge
([B, N, K, ...]) without reshaping — the key enabler for the dense
mask-batched message passing in `pharmaforge_tpu.models.conv`.

Numerics intentionally match the reference:
* Wh/Wu weight matrices initialized U(-1/sqrt(fan_in), +1/sqrt(fan_in))
  (reference gvp.py:63-69);
* linear layers use torch's default init (U(+-1/sqrt(fan_in)) for weight and
  bias) so that imported torch checkpoints are statistically and structurally
  compatible;
* `norm_no_nan` epsilon clamping exactly as reference gvp.py:12-19;
* GVPLayerNorm: learnable LayerNorm(eps=1e-5) on scalars, non-trainable RMS
  norm over vector channels (reference gvp.py:152-166).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from pharmaforge_tpu.ops.geometry import norm_no_nan

Array = jnp.ndarray
GVPData = Tuple[Array, Array]


def torch_linear_init(fan_in: int):
    """torch.nn.Linear default init: U(-1/sqrt(fan_in), +1/sqrt(fan_in))."""
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _activation(name: str) -> Callable[[Array], Array]:
    if name == "silu":
        return jax.nn.silu
    if name == "sigmoid":
        return jax.nn.sigmoid
    if name == "identity":
        return lambda x: x
    raise ValueError(f"unknown activation {name!r}")


class TorchLinear(nn.Module):
    """Dense layer with torch's default initialization scheme.

    `dtype` is the computation dtype: params are stored fp32 and cast for
    the matmul (standard mixed-precision policy).
    """

    features: int
    use_bias: bool = True
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        fan_in = x.shape[-1]
        kernel = self.param("kernel", torch_linear_init(fan_in),
                            (fan_in, self.features))
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
        y = x @ kernel
        if self.use_bias:
            bias = self.param("bias", torch_linear_init(fan_in),
                              (self.features,))
            if self.dtype is not None:
                bias = bias.astype(self.dtype)
            y = y + bias
        return y


class GVP(nn.Module):
    """One geometric vector perceptron with vector gating.

    Mirrors reference gvp.py:43-116 (vector_gating=True branch, the only one
    ever instantiated).
    """

    dim_vectors_in: int
    dim_vectors_out: int
    dim_feats_in: int
    dim_feats_out: int
    hidden_vectors: Optional[int] = None
    feats_activation: str = "silu"
    vectors_activation: str = "sigmoid"
    dtype: Optional[str] = None  # computation dtype; params stay fp32

    @nn.compact
    def __call__(self, data: GVPData) -> GVPData:
        feats, vectors = data
        assert vectors.shape[-1] == 3 and vectors.shape[-2] == self.dim_vectors_in
        assert feats.shape[-1] == self.dim_feats_in

        dim_h = (max(self.dim_vectors_in, self.dim_vectors_out)
                 if self.hidden_vectors is None else self.hidden_vectors)

        wh = self.param("Wh", torch_linear_init(self.dim_vectors_in),
                        (self.dim_vectors_in, dim_h))
        wu = self.param("Wu", torch_linear_init(dim_h),
                        (dim_h, self.dim_vectors_out))
        if self.dtype is not None:
            feats = feats.astype(self.dtype)
            vectors = vectors.astype(self.dtype)
            wh = wh.astype(self.dtype)
            wu = wu.astype(self.dtype)

        vh = jnp.einsum("...vc,vh->...hc", vectors, wh)
        vu = jnp.einsum("...hc,hu->...uc", vh, wu)

        # norms always accumulate in fp32 (bf16 sums of squares lose bits)
        sh = norm_no_nan(vh.astype(jnp.float32)).astype(feats.dtype)
        s = jnp.concatenate([feats, sh], axis=-1)

        feats_out = _activation(self.feats_activation)(
            TorchLinear(self.dim_feats_out, dtype=self.dtype,
                        name="to_feats_out")(s))

        gating = TorchLinear(self.dim_vectors_out, dtype=self.dtype,
                             name="scalar_to_vector_gates")(feats_out)
        vectors_out = _activation(self.vectors_activation)(
            gating)[..., None] * vu
        return feats_out, vectors_out


class GVPChain(nn.Module):
    """A sequence of GVPs (the reference chains them with nn.Sequential).

    Takes kwargs-specs rather than constructed modules so the sublayers are
    created inside this module's scope with stable names (`layers_0`, ...),
    keeping the parameter tree importer-friendly.
    """

    specs: Sequence[dict]
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, data: GVPData) -> GVPData:
        for j, spec in enumerate(self.specs):
            data = GVP(**spec, dtype=self.dtype, name=f"layers_{j}")(data)
        return data


def gvp_dropout(key: jax.Array, rate: float, feats: Array, vectors: Array,
                deterministic: bool) -> Tuple[Array, Array]:
    """Separate scalar / vector-channel dropout (reference gvp.py:118-149).

    Scalar dropout is the standard inverted-scaling elementwise kind; vector
    dropout drops whole 3-vectors (mask over all but the trailing xyz axis).
    """
    if deterministic or rate == 0.0:
        return feats, vectors
    k1, k2 = jax.random.split(key)
    keep = 1.0 - rate
    feat_mask = jax.random.bernoulli(k1, keep, feats.shape)
    feats = jnp.where(feat_mask, feats / keep, 0.0)
    vec_mask = jax.random.bernoulli(k2, keep, vectors.shape[:-1])
    vectors = vectors * vec_mask[..., None] / keep
    return feats, vectors


class GVPDropout(nn.Module):
    """Module wrapper around `gvp_dropout` using the 'dropout' rng stream."""

    rate: float

    @nn.compact
    def __call__(self, feats: Array, vectors: Array,
                 deterministic: bool) -> Tuple[Array, Array]:
        if deterministic or self.rate == 0.0:
            return feats, vectors
        key = self.make_rng("dropout")
        return gvp_dropout(key, self.rate, feats, vectors, deterministic=False)


class GVPLayerNorm(nn.Module):
    """LayerNorm on scalars + non-trainable norm on vectors
    (reference gvp.py:152-166)."""

    feats_h_size: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, feats: Array, vectors: Array) -> Tuple[Array, Array]:
        normed_feats = nn.LayerNorm(epsilon=self.eps, name="feat_norm")(feats)
        vn = norm_no_nan(vectors, axis=-1, keepdims=True, sqrt=False)
        vn = jnp.sqrt(jnp.mean(vn, axis=-2, keepdims=True) + self.eps) + self.eps
        return normed_feats, vectors / vn
