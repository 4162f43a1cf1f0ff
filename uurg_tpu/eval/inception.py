"""InceptionV3 (FID variant) in Flax — the FID/IS feature extractor.

Replaces the reference's TF1 frozen-graph evaluator
(DDPM/evaluator.py:32-36, classify_image_graph_def.pb). Emits the same three
tensors the ADM suite reads: pool3 (2048-d), early spatial features (first 7
channels of the mixed_6 tower output, 17x17x7 = 2023-d — sFID convention),
and 1008-way logits.

This is the *FID* inception, not vanilla torchvision: to match the TF1
graph, the branch avg-pools EXCLUDE padding from their divisor (the
pytorch-fid ``count_include_pad=False`` patch) and Mixed_7c's pool branch is
a MAX pool (the TF graph's quirk, preserved by pytorch-fid's
FIDInceptionE_2). The fc head is 1008-way like the TF checkpoint.

Weights: ``load_inception_npz`` reads a flat npz keyed by flax path
(convert once from the public pt_inception/torchvision checkpoint with
cli/convert_inception.py; the key layout is torchvision's, which
pt_inception-2015-12-05 shares). tests/test_inception_parity.py validates
the conversion numerically against a torch replica on random weights, so a
converted real checkpoint is bit-trustworthy without network access.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _avg_pool_exc(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-1 SAME average pool whose divisor counts only the VALID
    (unpadded) window cells — TF semantics; torch needs
    ``count_include_pad=False`` (the pytorch-fid block patch)."""
    dims, strides = (1, 3, 3, 1), (1, 1, 1, 1)
    s = jax.lax.reduce_window(x, jnp.array(0, x.dtype), jax.lax.add, dims,
                              strides, "SAME")
    ones = jnp.ones((1,) + x.shape[1:3] + (1,), x.dtype)
    cnt = jax.lax.reduce_window(ones, jnp.array(0, x.dtype), jax.lax.add,
                                dims, strides, "SAME")
    return s / cnt


class ConvBN(nn.Module):
    filters: int
    kernel: tuple
    strides: tuple = (1, 1)
    padding: Any = "SAME"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.filters, self.kernel, self.strides,
                    padding=self.padding, use_bias=False, dtype=self.dtype,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         dtype=jnp.float32, name="bn")(x)
        return nn.relu(x)


class InceptionA(nn.Module):
    pool_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(64, (1, 1), dtype=self.dtype, name="b1x1")(x)
        b5 = ConvBN(48, (1, 1), dtype=self.dtype, name="b5x5_1")(x)
        b5 = ConvBN(64, (5, 5), dtype=self.dtype, name="b5x5_2")(b5)
        b3 = ConvBN(64, (1, 1), dtype=self.dtype, name="b3x3dbl_1")(x)
        b3 = ConvBN(96, (3, 3), dtype=self.dtype, name="b3x3dbl_2")(b3)
        b3 = ConvBN(96, (3, 3), dtype=self.dtype, name="b3x3dbl_3")(b3)
        bp = _avg_pool_exc(x)
        bp = ConvBN(self.pool_features, (1, 1), dtype=self.dtype,
                    name="bpool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(384, (3, 3), (2, 2), "VALID", self.dtype, name="b3x3")(x)
        d = ConvBN(64, (1, 1), dtype=self.dtype, name="b3x3dbl_1")(x)
        d = ConvBN(96, (3, 3), dtype=self.dtype, name="b3x3dbl_2")(d)
        d = ConvBN(96, (3, 3), (2, 2), "VALID", self.dtype, name="b3x3dbl_3")(d)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        return jnp.concatenate([b3, d, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(192, (1, 1), dtype=self.dtype, name="b1x1")(x)
        b7 = ConvBN(self.c7, (1, 1), dtype=self.dtype, name="b7x7_1")(x)
        b7 = ConvBN(self.c7, (1, 7), dtype=self.dtype, name="b7x7_2")(b7)
        b7 = ConvBN(192, (7, 1), dtype=self.dtype, name="b7x7_3")(b7)
        d = ConvBN(self.c7, (1, 1), dtype=self.dtype, name="b7x7dbl_1")(x)
        d = ConvBN(self.c7, (7, 1), dtype=self.dtype, name="b7x7dbl_2")(d)
        d = ConvBN(self.c7, (1, 7), dtype=self.dtype, name="b7x7dbl_3")(d)
        d = ConvBN(self.c7, (7, 1), dtype=self.dtype, name="b7x7dbl_4")(d)
        d = ConvBN(192, (1, 7), dtype=self.dtype, name="b7x7dbl_5")(d)
        bp = _avg_pool_exc(x)
        bp = ConvBN(192, (1, 1), dtype=self.dtype, name="bpool")(bp)
        return jnp.concatenate([b1, b7, d, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(192, (1, 1), dtype=self.dtype, name="b3x3_1")(x)
        b3 = ConvBN(320, (3, 3), (2, 2), "VALID", self.dtype, name="b3x3_2")(b3)
        b7 = ConvBN(192, (1, 1), dtype=self.dtype, name="b7x7x3_1")(x)
        b7 = ConvBN(192, (1, 7), dtype=self.dtype, name="b7x7x3_2")(b7)
        b7 = ConvBN(192, (7, 1), dtype=self.dtype, name="b7x7x3_3")(b7)
        b7 = ConvBN(192, (3, 3), (2, 2), "VALID", self.dtype, name="b7x7x3_4")(b7)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    # Mixed_7b uses the padding-excluded avg pool; Mixed_7c uses MAX pool
    # (TF graph quirk kept by pytorch-fid FIDInceptionE_2)
    pool: str = "avg_exc"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(320, (1, 1), dtype=self.dtype, name="b1x1")(x)
        b3 = ConvBN(384, (1, 1), dtype=self.dtype, name="b3x3_1")(x)
        b3 = jnp.concatenate([
            ConvBN(384, (1, 3), dtype=self.dtype, name="b3x3_2a")(b3),
            ConvBN(384, (3, 1), dtype=self.dtype, name="b3x3_2b")(b3),
        ], axis=-1)
        d = ConvBN(448, (1, 1), dtype=self.dtype, name="b3x3dbl_1")(x)
        d = ConvBN(384, (3, 3), dtype=self.dtype, name="b3x3dbl_2")(d)
        d = jnp.concatenate([
            ConvBN(384, (1, 3), dtype=self.dtype, name="b3x3dbl_3a")(d),
            ConvBN(384, (3, 1), dtype=self.dtype, name="b3x3dbl_3b")(d),
        ], axis=-1)
        if self.pool == "max":
            bp = nn.max_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        else:
            bp = _avg_pool_exc(x)
        bp = ConvBN(192, (1, 1), dtype=self.dtype, name="bpool")(bp)
        return jnp.concatenate([b1, b3, d, bp], axis=-1)


class InceptionV3(nn.Module):
    """Returns (pool3 2048-d, spatial 343-d, logits 1008-d)."""

    num_classes: int = 1008
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        x = ConvBN(32, (3, 3), (2, 2), "VALID", d, name="Conv2d_1a")(x)
        x = ConvBN(32, (3, 3), padding="VALID", dtype=d, name="Conv2d_2a")(x)
        x = ConvBN(64, (3, 3), dtype=d, name="Conv2d_2b")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        x = ConvBN(80, (1, 1), padding="VALID", dtype=d, name="Conv2d_3b")(x)
        x = ConvBN(192, (3, 3), padding="VALID", dtype=d, name="Conv2d_4a")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        x = InceptionA(32, d, name="Mixed_5b")(x)
        x = InceptionA(64, d, name="Mixed_5c")(x)
        x = InceptionA(64, d, name="Mixed_5d")(x)
        x = InceptionB(d, name="Mixed_6a")(x)
        x = InceptionC(128, d, name="Mixed_6b")(x)
        x = InceptionC(160, d, name="Mixed_6c")(x)
        x = InceptionC(160, d, name="Mixed_6d")(x)
        x = InceptionC(192, d, name="Mixed_6e")(x)
        spatial = x[..., :7]  # sFID: first 7 channels of the mixed_6 output
        x = InceptionD(d, name="Mixed_7a")(x)
        x = InceptionE("avg_exc", d, name="Mixed_7b")(x)
        x = InceptionE("max", d, name="Mixed_7c")(x)
        pool = jnp.mean(x, axis=(1, 2))
        logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                          name="fc")(pool.astype(jnp.float32))
        B = x.shape[0]
        return pool, spatial.reshape(B, -1), logits


def preprocess(images_uint8: jnp.ndarray, size: int = 299) -> jnp.ndarray:
    """uint8 NHWC -> bilinear resize to 299 -> scale to [-1, 1]."""
    x = images_uint8.astype(jnp.float32)
    x = jax.image.resize(x, (x.shape[0], size, size, x.shape[3]), "bilinear")
    return x / 127.5 - 1.0


def make_extractor(variables, batch_dtype=jnp.float32, materialize=True):
    """Jitted callable: uint8 images -> (pool, spatial, logits).

    ``materialize=True`` returns numpy (blocking). ``materialize=False``
    returns device arrays, letting ``uurg_tpu.eval.generative.featurize``
    overlap the host download with the next batch's compute."""
    model = InceptionV3(dtype=batch_dtype)

    @jax.jit
    def run(imgs):
        return model.apply(variables, preprocess(imgs))

    def extract(images_uint8: np.ndarray):
        pool, spatial, logits = run(jnp.asarray(images_uint8))
        if not materialize:
            return pool, spatial, logits
        return (np.asarray(pool), np.asarray(spatial), np.asarray(logits))

    return extract


def init_inception(key=None):
    model = InceptionV3()
    x = jnp.zeros((1, 299, 299, 3))
    if key is None:
        key = jax.random.key(0)
    return model, jax.jit(model.init)(key, x)


def load_inception_npz(path: str):
    """Flat npz ('path/to/param' -> array) -> nested variables dict."""
    from uurg_tpu.io.inception_interop import unflatten_variables

    flat = np.load(path)
    return unflatten_variables({k: flat[k] for k in flat.files})
