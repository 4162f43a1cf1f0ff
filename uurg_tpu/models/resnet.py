"""CIFAR-style ResNets (Flax / NHWC).

Parity target: Classification/models/resnet.py:107-124 — 3x3 conv stem (no
maxpool), BasicBlock for 18/34, Bottleneck for 50/101/152, BN+ReLU, global
average pool, linear head. Built TPU-first: NHWC, configurable compute dtype,
BatchNorm statistics in float32.

All convolutions use explicit torch-style padding (pad 1 for 3x3, pad 3 for
the 7x7 stem) rather than XLA "SAME": on strided convs the two differ in
alignment, and torch alignment is required for exact numerical parity with
torchvision/reference checkpoints (io/tv_resnet_interop.py).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class BasicBlock(nn.Module):
    filters: int
    strides: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=jnp.float32)
        h = nn.Conv(self.filters, (3, 3), (self.strides, self.strides),
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        h = norm(name="bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.filters, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name="conv2")(h)
        h = norm(name="bn2")(h)
        if x.shape[-1] != self.filters or self.strides != 1:
            x = nn.Conv(self.filters, (1, 1), (self.strides, self.strides),
                        use_bias=False, dtype=self.dtype, name="sc_conv")(x)
            x = norm(name="sc_bn")(x)
        return nn.relu(x + h)


class Bottleneck(nn.Module):
    filters: int
    strides: int = 1
    dtype: Dtype = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, *, train: bool):
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=jnp.float32)
        out_ch = self.filters * self.expansion
        h = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        h = nn.relu(norm(name="bn1")(h))
        h = nn.Conv(self.filters, (3, 3), (self.strides, self.strides),
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name="conv2")(h)
        h = nn.relu(norm(name="bn2")(h))
        h = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(h)
        h = norm(name="bn3")(h)
        if x.shape[-1] != out_ch or self.strides != 1:
            x = nn.Conv(out_ch, (1, 1), (self.strides, self.strides),
                        use_bias=False, dtype=self.dtype, name="sc_conv")(x)
            x = norm(name="sc_bn")(x)
        return nn.relu(x + h)


class ResNet(nn.Module):
    stage_sizes: Sequence[int]
    block: type = BasicBlock
    num_classes: int = 10
    width: int = 64
    dtype: Dtype = jnp.float32
    imagenet_stem: bool = False  # 7x7/s2 conv + maxpool (224px inputs, used
                                 # by the UA classifier probe à la torchvision
                                 # ResNet-34 — DDPM/train_classifier.py)

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = x.astype(self.dtype)
        if self.imagenet_stem:
            x = nn.Conv(self.width, (7, 7), strides=(2, 2),
                        padding=((3, 3), (3, 3)), use_bias=False,
                        dtype=self.dtype, name="conv_stem")(x)
        else:
            x = nn.Conv(self.width, (3, 3), padding=((1, 1), (1, 1)),
                        use_bias=False, dtype=self.dtype,
                        name="conv_stem")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn_stem")(x)
        x = nn.relu(x)
        if self.imagenet_stem:
            x = nn.max_pool(x, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)))
        for i, n_blocks in enumerate(self.stage_sizes):
            for j in range(n_blocks):
                strides = 2 if i > 0 and j == 0 else 1
                x = self.block(self.width * 2**i, strides, self.dtype,
                               name=f"stage{i}_block{j}")(x, train=train)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")(
            x.astype(jnp.float32))
        return x


def ResNet18(num_classes=10, dtype=jnp.float32, imagenet_stem=False):
    return ResNet([2, 2, 2, 2], BasicBlock, num_classes, dtype=dtype,
                  imagenet_stem=imagenet_stem)


def ResNet34(num_classes=10, dtype=jnp.float32, imagenet_stem=False):
    return ResNet([3, 4, 6, 3], BasicBlock, num_classes, dtype=dtype,
                  imagenet_stem=imagenet_stem)


def ResNet50(num_classes=10, dtype=jnp.float32, imagenet_stem=False):
    return ResNet([3, 4, 6, 3], Bottleneck, num_classes, dtype=dtype,
                  imagenet_stem=imagenet_stem)


def ResNet101(num_classes=10, dtype=jnp.float32, imagenet_stem=False):
    return ResNet([3, 4, 23, 3], Bottleneck, num_classes, dtype=dtype,
                  imagenet_stem=imagenet_stem)


def ResNet152(num_classes=10, dtype=jnp.float32, imagenet_stem=False):
    return ResNet([3, 8, 36, 3], Bottleneck, num_classes, dtype=dtype,
                  imagenet_stem=imagenet_stem)


def init_classifier(key: jax.Array, model: nn.Module, resolution: int = 32,
                    channels: int = 3):
    """Returns (params, batch_stats) variable collections."""
    x = jnp.zeros((1, resolution, resolution, channels))
    variables = model.init({"params": key}, x, train=False)
    return variables["params"], variables.get("batch_stats", {})
