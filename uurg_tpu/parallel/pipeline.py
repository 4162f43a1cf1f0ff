"""Pipeline parallelism over the DiT block stack (GPipe-style schedule).

The reference has no pipeline parallelism at all (its distributed surface is
torch DataParallel — SURVEY.md §2.5); this is framework capability beyond it,
for models whose weights do not fit one chip even sharded. TPU-native shape:

- the ``depth``-stacked block params of the scan layout (models/dit.py
  ``nn.scan`` over depth) are sharded over a ``stage`` mesh axis — stage ``s``
  holds blocks ``[s*d/S, (s+1)*d/S)``;
- the batch is split into M microbatches that flow through the stages; each
  pipeline tick every stage applies its local blocks to its current
  microbatch and passes the activation to the next stage with ONE
  ``lax.ppermute`` hop over ICI (neighbour communication only — no
  all-to-all, no host involvement);
- the schedule is the classic fill/drain pipeline: ``M + S - 1`` ticks, a
  bubble fraction of ``(S-1)/(M+S-1)`` — choose M >= S;
- everything lives inside one ``shard_map`` region, so the whole pipelined
  forward (and its transpose, for training) is a single compiled program.

Only the transformer trunk is pipelined. The patchify/conditioning embedders
and the final adaLN head are tiny (<1% of FLOPs) and run replicated on every
stage; their math mirrors models/dit.py DiT.__call__ exactly and
tests/test_pipeline.py asserts the composition matches ``DiT.apply`` to
float tolerance (so any drift between the two is a test failure, not a
silent skew).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from uurg_tpu.models.dit import (
    DiT,
    DiTBlock,
    DiTConfig,
    dit_timestep_embedding,
    sincos_2d_pos_embed,
)


def stage_block_apply(cfg: DiTConfig):
    """One pipeline stage: apply a local (d_per_stage, ...)-stacked slice of
    DiT block params sequentially via lax.scan (compiles the block body
    once, like the model's own nn.scan over depth)."""
    block = DiTBlock(cfg.hidden_size, cfg.num_heads, cfg.mlp_ratio, cfg.dtype)

    def stage(stack, h, c):
        def body(h, bp):
            return block.apply({"params": bp}, h, c), None

        h, _ = jax.lax.scan(body, h, stack)
        return h

    return stage


def pipeline_blocks(stage_fn, block_params, h_mb, c_mb, *, mesh: Mesh,
                    axis: str = "stage", batch_axis: str = "data"):
    """Run microbatches through stage-sharded blocks.

    Args:
      stage_fn: ``(local_param_stack, h, c) -> h`` for one stage's blocks.
      block_params: depth-stacked block params (leading dim = total depth,
        divisible by the stage count).
      h_mb: (M, mb, T, D) microbatched activations, replicated over
        ``axis``; sharded over ``batch_axis`` along mb when the mesh has
        one (dp x pp composition — each data slice runs its own pipeline).
      c_mb: (M, mb, D) per-microbatch conditioning, sharded like ``h_mb``.

    Returns (M, mb, T, D) trunk outputs, sharded like the inputs.
    """
    S = mesh.shape[axis]
    M = h_mb.shape[0]
    depth = jax.tree_util.tree_leaves(block_params)[0].shape[0]
    if depth % S:
        raise ValueError(f"depth {depth} not divisible by {S} stages")

    def pp(bp, xs, cs):
        s = jax.lax.axis_index(axis)
        fwd = [(i, i + 1) for i in range(S - 1)]  # no wraparound: stage 0
        # always ingests a fresh microbatch, never a circulated activation

        def tick(carry, t):
            buf, out = carry
            m = jnp.clip(t - s, 0, M - 1)
            h_in = jnp.where(s == 0, xs[m], buf)
            h = stage_fn(bp, h_in, cs[m])
            valid = (t - s >= 0) & (t - s < M)
            out = out.at[m].set(
                jnp.where(valid & (s == S - 1), h, out[m]))
            buf = jax.lax.ppermute(h, axis, fwd)
            return (buf, out), None

        init = (jnp.zeros_like(xs[0]), jnp.zeros_like(xs))
        (_, out), _ = jax.lax.scan(tick, init, jnp.arange(M + S - 1))
        # outputs exist on the last stage only; a masked psum broadcasts
        # them so the (replicated) final head runs everywhere
        return jax.lax.psum(
            jnp.where(s == S - 1, out, jnp.zeros_like(out)), axis)

    # dp x pp composition: the per-microbatch batch dim shards over
    # batch_axis when the mesh has one — each data slice runs its own
    # pipeline over the stage axis with no cross-slice traffic
    b_ax = batch_axis if batch_axis in mesh.shape else None
    act_spec = P(None, b_ax)
    # check_vma off: the ppermute + masked-psum pattern defeats the static
    # replication checker (outputs ARE uniform over 'axis' — the psum
    # broadcast guarantees it)
    return jax.shard_map(
        pp, mesh=mesh,
        in_specs=(P(axis), act_spec, act_spec),
        out_specs=act_spec,
        check_vma=False,
    )(block_params, h_mb, c_mb)


def dit_embed(params, cfg: DiTConfig, x, t, y, cond_keep=None):
    """DiT input stem (patchify + pos embed + t/y conditioning), applied
    functionally from the model's param subtrees — mirrors
    models/dit.py DiT.__call__ lines 160-185 (equivalence-tested)."""
    B, H, W, _ = x.shape
    p, D = cfg.patch_size, cfg.hidden_size
    grid = H // p
    h = nn.Conv(D, (p, p), strides=(p, p), dtype=cfg.dtype).apply(
        {"params": params["patch_embed"]}, x.astype(cfg.dtype))
    h = h.reshape(B, grid * grid, D)
    h = h + jnp.asarray(sincos_2d_pos_embed(D, grid), cfg.dtype)[None]

    temb = dit_timestep_embedding(t, 256)
    temb = nn.Dense(D, dtype=jnp.float32).apply(
        {"params": params["t_mlp1"]}, temb)
    temb = nn.Dense(D, dtype=jnp.float32).apply(
        {"params": params["t_mlp2"]}, jax.nn.silu(temb))
    if cond_keep is not None:
        y = jnp.where(cond_keep, y, cfg.num_classes)
    yemb = nn.Embed(cfg.num_classes + 1, D, param_dtype=jnp.float32).apply(
        {"params": params["y_embed"]}, y)
    return h, temb + yemb


def dit_final(params, cfg: DiTConfig, h, c, out_shape):
    """DiT output head (final adaLN + zero-init linear + unpatchify) —
    mirrors models/dit.py DiT.__call__ lines 211-227."""
    from uurg_tpu.models.dit import modulate

    B, H, W, C = out_shape
    p, D = cfg.patch_size, cfg.hidden_size
    grid = H // p
    out_c = C * 2 if cfg.learn_sigma else C
    mods = nn.Dense(2 * D, dtype=jnp.float32).apply(
        {"params": params["final_adaLN"]}, jax.nn.silu(c))
    shift, scale = jnp.split(mods, 2, axis=-1)
    h = nn.LayerNorm(use_bias=False, use_scale=False,
                     dtype=jnp.float32).apply({}, h.astype(jnp.float32))
    h = modulate(h, shift, scale)
    h = nn.Dense(p * p * out_c, dtype=jnp.float32).apply(
        {"params": params["final_linear"]}, h)
    h = h.reshape(B, grid, grid, p, p, out_c)
    return jnp.einsum("bhwpqc->bhpwqc", h).reshape(B, H, W, out_c)


def dit_apply_pipelined(params, cfg: DiTConfig, x, t, y, *, mesh: Mesh,
                        n_microbatches: int, axis: str = "stage",
                        cond_keep=None):
    """Full DiT forward with the transformer trunk pipelined over ``axis``.

    Drop-in for ``DiT(cfg).apply({'params': params}, x, t, y, cond_keep)``
    when ``cfg.scan_blocks`` (the stacked-params layout). The batch is split
    into ``n_microbatches`` along axis 0 (must divide the batch)."""
    if not cfg.scan_blocks:
        raise ValueError("pipelining needs the scan (depth-stacked) layout")
    B = x.shape[0]
    M = n_microbatches
    if B % M:
        raise ValueError(f"batch {B} not divisible by {M} microbatches")
    if "data" in mesh.shape and (B // M) % mesh.shape["data"]:
        raise ValueError(
            f"microbatch size {B // M} not divisible by the data axis "
            f"({mesh.shape['data']}) for dp x pp")
    h, c = dit_embed(params, cfg, x, t, y, cond_keep)
    mb = B // M
    h_mb = h.reshape(M, mb, *h.shape[1:])
    c_mb = c.reshape(M, mb, c.shape[-1])
    stage_fn = stage_block_apply(cfg)
    out = pipeline_blocks(stage_fn, params["blocks"], h_mb, c_mb,
                          mesh=mesh, axis=axis)
    h = out.reshape(B, *out.shape[2:])
    return dit_final(params, cfg, h, c, x.shape)


def shard_params_pp(params, mesh: Mesh, axis: str = "stage"):
    """Placement matching the pipeline: block stacks sharded along depth
    over ``axis``, everything else replicated. Cuts per-chip trunk weight
    memory by the stage count before the shard_map even runs."""
    S = mesh.shape[axis]

    def place(path, p):
        keys = [getattr(k, "key", None) for k in path]
        if "blocks" in keys and p.shape and p.shape[0] % S == 0:
            return jax.device_put(
                p, NamedSharding(mesh, P(axis, *(None,) * (p.ndim - 1))))
        return jax.device_put(p, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map_with_path(place, params)
