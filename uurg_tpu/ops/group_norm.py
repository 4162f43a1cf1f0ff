"""One-pass fused GroupNorm Pallas kernel for TPU.

GroupNorm is the most frequent non-conv op in the DDPM/SD UNets (~40 sites
per forward). XLA evaluates it as a stats reduction pass plus a normalize
pass; this kernel keeps a block of samples VMEM-resident and does both in
one read. Forward reads x once / writes y once; backward reads (x, dy)
once / writes dx once, accumulating dscale/dbias across the sequential
grid like the flash-attention dk/dv. Blocks cover ``_BLOCK_B`` samples per
program — a per-sample grid measures SLOWER than XLA (dispatch overhead
dominates 128 tiny programs), see README perf notes.

Numerics: statistics and the normalize arithmetic are fp32 regardless of
the activation dtype (matching GroupNorm32 / flax _compute_stats); the
(B, G) mean/rstd are saved as residuals so the backward never recomputes
statistics. All tiny reductions are expressed as 2-D matmuls with a
constant (C, G) one-hot — Mosaic rejects 1-D dot operands and
low-lane-width reshapes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK_B = 8  # samples per program (VMEM: 2 * nb*H*W*C fp32 <= ~8MB)


def _group_onehot(c: int, groups: int) -> jnp.ndarray:
    """(C, G) fp32 one-hot mapping channel -> its group."""
    ch = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    gr = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    return (ch // (c // groups) == gr).astype(jnp.float32)


def _gn_fwd_kernel(x_ref, scale_ref, bias_ref, y_ref, mean_ref, rstd_ref,
                   *, groups: int, eps: float):
    x = x_ref[...]                                         # (nb, H, W, C)
    nb, h, w, c = x.shape
    n = h * w * (c // groups)                              # elems per group
    onehot = _group_onehot(c, groups)                      # (C, G)
    xf = x.reshape(nb, h * w, c).astype(jnp.float32)
    sum_c = jnp.sum(xf, axis=1)                            # (nb, C)
    sq_c = jnp.sum(xf * xf, axis=1)                        # (nb, C)
    mean = (sum_c @ onehot) / n                            # (nb, G)
    var = (sq_c @ onehot) / n - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    mean_c = mean @ onehot.T                               # (nb, C)
    rstd_c = rstd @ onehot.T
    y = (xf - mean_c[:, None, :]) * rstd_c[:, None, :]
    y = y * scale_ref[...].astype(jnp.float32)[None, None, :] \
        + bias_ref[...].astype(jnp.float32)[None, None, :]
    y_ref[...] = y.reshape(nb, h, w, c).astype(y_ref.dtype)
    mean_ref[...] = mean
    rstd_ref[...] = rstd


def _gn_bwd_kernel(x_ref, scale_ref, mean_ref, rstd_ref, g_ref,
                   dx_ref, dscale_ref, dbias_ref, *, groups: int):
    i = pl.program_id(0)
    x = x_ref[...]
    nb, h, w, c = x.shape
    n = h * w * (c // groups)                              # elems per group
    onehot = _group_onehot(c, groups)                      # (C, G)
    xf = x.reshape(nb, h * w, c).astype(jnp.float32)
    gf = g_ref[...].reshape(nb, h * w, c).astype(jnp.float32)
    mean_c = mean_ref[...] @ onehot.T                      # (nb, C)
    rstd_c = rstd_ref[...] @ onehot.T
    xhat = (xf - mean_c[:, None, :]) * rstd_c[:, None, :]

    dbias = jnp.sum(gf, axis=(0, 1))                       # (C,)
    dscale = jnp.sum(gf * xhat, axis=(0, 1))               # (C,)

    gs = gf * scale_ref[...].astype(jnp.float32)[None, None, :]
    s1 = (jnp.sum(gs, axis=1) @ onehot) / n                # (nb, G)
    s2 = (jnp.sum(gs * xhat, axis=1) @ onehot) / n
    s1_c = s1 @ onehot.T                                   # (nb, C)
    s2_c = s2 @ onehot.T
    dx = (gs - s1_c[:, None, :] - xhat * s2_c[:, None, :]) \
        * rstd_c[:, None, :]
    dx_ref[...] = dx.reshape(nb, h, w, c).astype(dx_ref.dtype)

    @pl.when(i == 0)
    def _init():
        dscale_ref[...] = dscale
        dbias_ref[...] = dbias

    @pl.when(i > 0)
    def _acc():
        dscale_ref[...] += dscale
        dbias_ref[...] += dbias


def _block_b(b: int) -> int:
    nb = min(_BLOCK_B, b)
    while b % nb != 0:
        nb -= 1
    return nb


def _fwd_impl(x, scale, bias, groups, eps, interpret):
    b, h, w, c = x.shape
    nb = _block_b(b)
    y, mean, rstd = pl.pallas_call(
        functools.partial(_gn_fwd_kernel, groups=groups, eps=eps),
        grid=(b // nb,),
        in_specs=[
            pl.BlockSpec((nb, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((nb, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, groups), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, groups), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
            jax.ShapeDtypeStruct((b, groups), jnp.float32),
            jax.ShapeDtypeStruct((b, groups), jnp.float32),
        ],
        interpret=interpret,
    )(x, scale, bias)
    return y, mean, rstd


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_group_norm(x, scale, bias, groups: int, eps: float = 1e-6,
                     interpret: bool = False):
    """GroupNorm over the channel axis of NHWC ``x``; fp32 statistics."""
    y, _, _ = _fwd_impl(x, scale, bias, groups, eps, interpret)
    return y


def _fwd(x, scale, bias, groups, eps, interpret):
    y, mean, rstd = _fwd_impl(x, scale, bias, groups, eps, interpret)
    return y, (x, scale, mean, rstd)


def _bwd(groups, eps, interpret, res, g):
    x, scale, mean, rstd = res
    b, h, w, c = x.shape
    nb = _block_b(b)
    dx, dscale, dbias = pl.pallas_call(
        functools.partial(_gn_bwd_kernel, groups=groups),
        grid=(b // nb,),
        in_specs=[
            pl.BlockSpec((nb, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, groups), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, groups), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((nb, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
            jax.ShapeDtypeStruct((c,), jnp.float32),
            jax.ShapeDtypeStruct((c,), jnp.float32),
        ],
        interpret=interpret,
    )(x, scale, mean, rstd, g)
    return dx, dscale.astype(scale.dtype), dbias.astype(scale.dtype)


fused_group_norm.defvjp(_fwd, _bwd)


def group_norm(x, scale, bias, *, groups: int = 32, eps: float = 1e-6,
               use_pallas: bool | None = None):
    """Dispatcher. Default is the XLA formulation everywhere: measured on
    the real chip, the Pallas kernel LOSES on the DDPM bench — a
    per-sample grid runs 9.2 vs 12.6 steps/s (dispatch overhead), and the
    8-sample-block variant trips an internal error in this environment's
    remote-compile helper. XLA already fuses GN's normalize pass into its
    neighbors, so the one-pass win is smaller than dispatch costs here.
    Opt in explicitly with ``UURG_FUSED_GN=1`` or ``use_pallas=True``
    (e.g. for future toolchains where the helper bug is fixed)."""
    import os

    c = x.shape[-1]
    while c % groups != 0:
        groups //= 2
    if use_pallas is None:
        use_pallas = (jax.default_backend() == "tpu" and x.ndim == 4
                      and c % 128 == 0
                      and os.environ.get("UURG_FUSED_GN", "0") == "1")
    if use_pallas:
        return fused_group_norm(x, scale, bias, groups, eps)
    return _gn_reference(x, scale, bias, groups, eps)


def _gn_reference(x, scale, bias, groups, eps):
    """Fast-variance GroupNorm with fp32 statistics, in the DISTRIBUTED
    affine form ``y = x * a + b`` where ``a = rstd*scale`` and
    ``b = bias - mean*rstd*scale`` are per-(sample, channel) — tiny.

    Why this shape: the naive ``(x - mean) * rstd * scale + bias`` makes
    autodiff save the fp32 ``(x - mean)`` intermediate at every GN site
    (2x the activation memory — the 860M-UNet step OOMs exactly that way),
    and jax.checkpoint-ing the norm instead costs ~10% step time on the
    bandwidth-bound DDPM bench (recompute re-reads x). In the distributed
    form the only large backward residual is the bf16 input itself."""
    c = x.shape[-1]
    b = x.shape[0]
    cg = c // groups
    xr = x.reshape(b, -1, groups, cg)
    mean = jnp.mean(xr, axis=(1, 3), keepdims=True, dtype=jnp.float32)
    mean2 = jnp.mean(jnp.square(xr), axis=(1, 3), keepdims=True,
                     dtype=jnp.float32)
    rstd = jax.lax.rsqrt(jnp.maximum(mean2 - mean * mean, 0.0) + eps)
    scale_r = scale.astype(jnp.float32).reshape(1, 1, groups, cg)
    bias_r = bias.astype(jnp.float32).reshape(1, 1, groups, cg)
    a = rstd * scale_r                      # (B, 1, G, C/G) — small
    bterm = bias_r - mean * a
    y = xr * a + bterm                      # residuals: x (bf16) + a
    return y.reshape(x.shape).astype(x.dtype)
