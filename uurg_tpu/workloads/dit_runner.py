"""Host-side DiT runners: class forgetting, Fisher generation, sampling.

Parity targets: DiT/forget.py:151-361 (SFR-on loop with frozen-VAE latent
encode + EMA), DiT/generate_fisher.py:131-317, DiT/generate_mask.py:16-57,
DiT/sample_ddp.py:45-146 (rank-sharded FID sampling -> here process-sharded
label lists over a data mesh).
"""
from __future__ import annotations

import contextlib
import logging
import os
import time
from typing import Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from uurg_tpu.io.checkpoint import (restore_checkpoint, save_checkpoint,
                                    wait_for_saves)
from uurg_tpu.train import make_optimizer
from uurg_tpu.unlearn import (
    SFRonConfig,
    accumulate_fisher,
    fisher_ratio_mask,
    make_sfron_step,
    mask_sparsity,
)
from uurg_tpu.core.tree import mask_is_packed
from uurg_tpu.unlearn.sfron import init_state
from uurg_tpu.workloads.dit import DiTWorkload

log = logging.getLogger("uurg.dit")


def dit_forget(
    wl: DiTWorkload,
    params,
    forget_batches: Iterator,   # yields (latents, labels) pre-encoded
    remain_batches: Iterator,
    *,
    n_iters: int = 600,
    lr: float = 1e-4,
    forget_alpha: float = 1e-3,
    remain_alpha: float = 1.0,
    unlearn_loss: str = "ga",
    method: str = "ron",
    label_to_forget: int = 0,
    mask=None,
    ema_decay: float = 0.9999,
    decay_forget_alpha: bool = False,
    grad_clip: float | None = 1.0,
    seed: int = 0,
    log_freq: int = 100,
    ckpt_dir: str | None = None,
    ckpt_freq: int = 10000,
    sample_hook: Callable | None = None,
    snapshot_freq: int = 500,
    mesh=None,                 # jax.sharding.Mesh for multi-chip training
    parallelism: str = "dp",   # "dp" | "fsdp" | "tp" (over mesh axis
                               # 'model') | "pp" (pipeline over 'stage')
                               # | "sp" (ring attention over 'seq')
    pp_microbatches: int | None = None,  # pp only; default = stage count
    grad_accum: int = 1,       # microbatches per optimizer update
    mu_dtype=None,             # Adam first-moment storage dtype (bf16
                               # halves it; DiT-XL: -1.35GB)
    nu_dtype=None,             # Adam second-moment storage dtype (bf16:
                               # another -1.35GB, ~0.2% denominator error)
    pack_mask: bool = False,   # bit-pack the saliency mask 8x (bool
                               # 675MB -> 84MB at XL scale)
):
    """SFR-on for DiT (DiT/forget.py:256-345): masked ascent + remain descent
    + update_ema, one jit. ``ema_decay`` follows DiT's update_ema (shadow =
    decay*shadow + (1-decay)*param -> our ema_mu = decay); forget-step grads
    are clipped at ``grad_clip`` (forget.py:294, default 1.0) and
    ``forget_alpha`` cosine-decays only when ``decay_forget_alpha``
    (--decay-forget-alpha, default off like the reference).
    ``sample_hook(state, step)`` fires every ``snapshot_freq`` steps
    (forget.py:344-345 sample grids)."""
    opt = make_optimizer("adamw", lr, weight_decay=0.0,
                         mu_dtype=mu_dtype, nu_dtype=nu_dtype)
    if pack_mask and mask is not None:
        from uurg_tpu.core.tree import pack_mask as _pack

        mask = _pack(mask)
    cfg = SFRonConfig(
        n_iters=n_iters, forget_alpha=forget_alpha,
        remain_alpha=remain_alpha,
        alpha_sched="cosine" if decay_forget_alpha else "const",
        forget_freq=1,
        forget_clip=grad_clip, remain_clip=None, method=method,
        ema_mu=ema_decay, grad_accum=grad_accum,
    )
    step = make_sfron_step(cfg, opt,
                           wl.forget_loss_fn(unlearn_loss, label_to_forget),
                           wl.train_loss_fn())
    if grad_accum > 1:  # effective batch = grad_accum x batch_size
        from uurg_tpu.unlearn import stack_microbatches
        forget_batches = stack_microbatches(forget_batches, grad_accum)
        remain_batches = stack_microbatches(remain_batches, grad_accum)
    state = init_state(params, opt, ema=True, mask=mask)
    start_step = 0
    if ckpt_dir:
        # auto-resume from the full train state if one exists (the
        # reference is save-only; resume matches ddpm_runner._try_resume)
        resume_path = os.path.join(ckpt_dir, "train_state")
        if os.path.exists(resume_path):
            import dataclasses as _dc

            target = {"step": state.step, "params": state.params,
                      "opt_state": state.opt_state,
                      "ema_params": state.ema_params}
            ck = restore_checkpoint(resume_path, target)
            state = _dc.replace(state, step=jnp.asarray(ck["step"]),
                                params=ck["params"],
                                opt_state=ck["opt_state"],
                                ema_params=ck["ema_params"])
            start_step = int(ck["step"])
            log.info("resumed from %s at step %d", resume_path, start_step)
    if mesh is not None:
        # multi-chip placement: state replicated, then params (+EMA shadow)
        # re-sharded per mode; batches land data-sharded. pjit infers the
        # rest — see docs/SCALING.md
        from jax.sharding import NamedSharding, PartitionSpec as P

        from uurg_tpu.parallel import (
            shard_batch, shard_params_fsdp, shard_params_tp)

        state = jax.device_put(state, NamedSharding(mesh, P()))
        # the Adam mu/nu (param-shaped, the dominant HBM term) and the
        # saliency mask shard with the SAME specs as the params: fsdp_spec
        # is shape-only and the TP path-regex rules anchor on the param
        # path tail, which mu/nu/mask leaf paths all end with — so the
        # param helpers apply to those trees verbatim (ZeRO-style: no
        # replicated optimizer state on any chip).
        if parallelism == "fsdp":
            for f in ("params", "ema_params", "opt_state", "mask"):
                if f == "mask" and mask_is_packed(state.mask):
                    continue  # packed bits don't match param specs; at
                              # 1 bit/elem a replicated mask is cheap
                              # (keyed off the tree's actual leaves, not
                              # the pack_mask flag — callers may pass a
                              # pre-packed mask)
                if getattr(state, f) is not None:
                    setattr(state, f, shard_params_fsdp(getattr(state, f),
                                                        mesh))
        elif parallelism == "tp":
            for f in ("params", "ema_params", "opt_state", "mask"):
                if f == "mask" and mask_is_packed(state.mask):
                    continue  # packed bits don't match param specs; at
                              # 1 bit/elem a replicated mask is cheap
                              # (keyed off the tree's actual leaves, not
                              # the pack_mask flag — callers may pass a
                              # pre-packed mask)
                if getattr(state, f) is not None:
                    setattr(state, f, shard_params_tp(getattr(state, f),
                                                      mesh))
        elif parallelism == "pp":
            # pipeline over the 'stage' axis: block stacks sharded along
            # depth, forward routed through the GPipe microbatch schedule
            # (parallel/pipeline.py); embed/final + non-block params stay
            # replicated. Batches replicate (shard_batch has no 'data'
            # axis to use on a stage-only mesh).
            from uurg_tpu.parallel import (dit_apply_pipelined,
                                           shard_params_pp)

            if "stage" not in mesh.shape:
                raise ValueError(
                    "parallelism='pp' needs a 'stage' mesh axis — pass "
                    "e.g. --mesh stage=4")
            n_mb = pp_microbatches or mesh.shape["stage"]
            for f in ("params", "ema_params", "opt_state", "mask"):
                if f == "mask" and mask_is_packed(state.mask):
                    continue  # packed bits don't match param specs; at
                              # 1 bit/elem a replicated mask is cheap
                              # (keyed off the tree's actual leaves, not
                              # the pack_mask flag — callers may pass a
                              # pre-packed mask)
                if getattr(state, f) is not None:
                    setattr(state, f, shard_params_pp(getattr(state, f),
                                                      mesh))
            wl.apply_fn = lambda p, x, t, y, keep: dit_apply_pipelined(
                p, wl.cfg, x, t, y, mesh=mesh, n_microbatches=n_mb,
                cond_keep=keep)
        elif parallelism == "sp":
            # sequence parallelism: every attention inside the step routes
            # through ring attention (parallel/sequence.py) with tokens
            # sharded over the 'seq' mesh axis — the sequence_parallel
            # context wraps the training loop below so the step's FIRST
            # trace happens inside it. Params stay replicated; the batch
            # additionally shards over 'data' when that axis exists
            # (dp x sp composition).
            if "seq" not in mesh.shape:
                raise ValueError(
                    "parallelism='sp' needs a 'seq' mesh axis — pass e.g. "
                    "--mesh seq=4 or --mesh data=2,seq=4")
        elif parallelism != "dp":
            raise ValueError(f"unknown parallelism {parallelism!r}")

        # grad-accum-stacked batches are [grad_accum, B, ...]: the scan axis
        # stays whole per device and the TRUE batch axis (dim 1) shards
        _bdim = 1 if grad_accum > 1 else 0

        def _place(b):
            return shard_batch(b, mesh, batch_dim=_bdim)
    else:
        def _place(b):
            return b

    if mesh is not None and parallelism == "sp":
        from uurg_tpu.parallel import sequence_parallel

        sp_ctx = sequence_parallel(mesh)
    else:
        sp_ctx = contextlib.nullcontext()

    key = jax.random.key(seed)
    start = time.time()
    with sp_ctx:
        for i in range(start_step, n_iters):
            state, metrics = step(state, _place(next(forget_batches)),
                                  _place(next(remain_batches)), key)
            if (i + 1) % log_freq == 0:
                jax.block_until_ready(state.params)
                log.info("step %d forget %.4f remain %.4f (%.2f steps/s)",
                         i, float(metrics["forget_loss"]),
                         float(metrics["remain_loss"]),
                         log_freq / (time.time() - start))
                start = time.time()
            if sample_hook is not None and (i + 1) % snapshot_freq == 0:
                sample_hook(state, i)
            if ckpt_dir and (i + 1) % ckpt_freq == 0:
                # flush the previous async save first (a still-in-flight
                # write to train_state must not race its own replacement),
                # then let this one stream to disk while training continues
                wait_for_saves()
                save_checkpoint(os.path.join(ckpt_dir, f"ckpt_{i:07d}"),
                                {"model": state.params,
                                 "ema": state.ema_params},
                                block=False)
                save_checkpoint(os.path.join(ckpt_dir, "train_state"),
                                {"step": state.step, "params": state.params,
                                 "opt_state": state.opt_state,
                                 "ema_params": state.ema_params},
                                block=False)
    wait_for_saves()
    if ckpt_dir:
        save_checkpoint(os.path.join(ckpt_dir, "final"),
                        {"model": state.params, "ema": state.ema_params})
    return state


def dit_generate_fisher(wl: DiTWorkload, params, forget_batches,
                        remain_batches, *, n_iters: int, out_dir: str,
                        seed: int = 0):
    """Squared-grad accumulation over sampled batches
    (DiT/generate_fisher.py:217-291)."""
    os.makedirs(out_dir, exist_ok=True)
    loss = wl.train_loss_fn()

    def take(it, n):
        for _ in range(n):
            yield next(it)

    for name, it in [("forget", forget_batches), ("remain", remain_batches)]:
        fisher = accumulate_fisher(loss, params, take(it, n_iters),
                                   jax.random.key(seed))
        save_checkpoint(os.path.join(out_dir, f"{name}_fisher"), fisher)
        log.info("saved %s fisher", name)
    return out_dir


def dit_generate_mask(fisher_dir: str, thresholds, params_like=None):
    """Ratio-threshold masks for a threshold list (DiT/generate_mask.py)."""
    ff = restore_checkpoint(os.path.join(fisher_dir, "forget_fisher"),
                            params_like)
    rf = restore_checkpoint(os.path.join(fisher_dir, "remain_fisher"),
                            params_like)
    out = {}
    for th in np.atleast_1d(thresholds):
        mask = fisher_ratio_mask(ff, rf, float(th))
        log.info("th %.3g sparsity %.2f%%", th, mask_sparsity(mask) * 100)
        save_checkpoint(os.path.join(fisher_dir, f"fisher_{th}"), mask)
        out[float(th)] = mask
    return out


def dit_sample_grid(wl: DiTWorkload, params, out_path: str, *,
                    n_per_class: int = 2, classes=None,
                    respacing: str = "50", cond_scale: float = 4.0,
                    seed: int = 0, decode_fn: Callable | None = None):
    """Small CFG sample sheet during forgetting (DiT/forget.py:344-345
    sample_visualization). Saves decoded uint8 images (when a VAE decode is
    supplied) or raw latents as npz."""
    classes = list(classes if classes is not None else range(8))
    labels = np.repeat(classes, n_per_class)
    sampler = jax.jit(wl.make_sampler(respacing=respacing,
                                      cond_scale=cond_scale))
    lat = sampler(params, jnp.asarray(labels), jax.random.key(seed))
    if decode_fn is not None:
        img = np.clip((np.asarray(decode_fn(lat)) + 1) / 2, 0, 1)
        np.savez(out_path, images=(img * 255).astype(np.uint8),
                 labels=labels)
    else:
        np.savez(out_path, latents=np.asarray(lat), labels=labels)
    return out_path


def dit_sample_fid(
    wl: DiTWorkload,
    params,
    class_labels: np.ndarray,
    *,
    respacing: str = "250",
    cond_scale: float = 1.5,
    batch_size: int = 32,
    seed: int = 0,
    decode_fn: Callable | None = None,
) -> np.ndarray:
    """Process-sharded class-conditional sampling (sample_ddp parity: the
    rank-strided index math becomes process_index striding; no barriers —
    the final npz merge is a host-side concat). Within a process the label
    batch additionally lands data-sharded over the local devices (like
    ddpm_runner.sample_class_batches), so all chips sample in parallel."""
    pid, pcount = jax.process_index(), jax.process_count()
    labels = class_labels[pid::pcount]
    sampler = jax.jit(wl.make_sampler(respacing=respacing,
                                      cond_scale=cond_scale))
    sh = None
    local = jax.local_devices()
    if len(local) > 1 and batch_size % len(local) == 0:
        # local mesh only: composes with the process striding above (each
        # process shards its own label slice over its own chips)
        from uurg_tpu.parallel import batch_sharding, make_mesh

        sh = batch_sharding(make_mesh({"data": len(local)}, devices=local))
    outs = []
    key = jax.random.key(seed + pid)
    pending = None  # download batch i while the device samples batch i+1

    def materialize(dev):
        if decode_fn is not None:
            img = np.clip((np.asarray(dev) + 1) / 2, 0, 1)
            return (img * 255).astype(np.uint8)
        return np.asarray(dev)

    for i in range(0, len(labels), batch_size):
        chunk = labels[i : i + batch_size]
        pad = batch_size - len(chunk)
        key, sub = jax.random.split(key)
        lab = jnp.asarray(np.pad(chunk, (0, pad)))
        if sh is not None:
            lab = jax.device_put(lab, sh)
        lat = sampler(params, lab, sub)[: len(chunk)]
        dev = decode_fn(lat) if decode_fn is not None else lat
        if pending is not None:
            outs.append(materialize(pending))
        pending = dev
    if pending is not None:
        outs.append(materialize(pending))
    return np.concatenate(outs)
