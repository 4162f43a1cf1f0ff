"""Host-side DDPM runner: the orchestration the reference keeps in its
Diffusion god-object (DDPM/runners/diffusion.py), rebuilt as small functions
over the jitted compute in ``uurg_tpu.workloads.ddpm``.

Modes (DDPM/train.py:145-168 dispatch parity): pretrain, retrain, sfron,
saliency_unlearn (SalUn), generate_fisher, generate_mask; sampling modes
(sample.py): sample_fid, sample_classes, visualization.
"""
from __future__ import annotations

import logging
import os
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from uurg_tpu.data import (
    ArrayDataset,
    class_forget_split,
    data_transform,
    epoch_batches,
    infinite_batches,
    inverse_data_transform,
    load_cifar10,
    random_flip_batch,
    synthetic_dataset,
)
from uurg_tpu.io.checkpoint import (restore_checkpoint, save_checkpoint,
                                    wait_for_saves)
from uurg_tpu.train import build_reference_optimizer
from uurg_tpu.unlearn import (
    SFRonConfig,
    accumulate_fisher,
    fisher_ratio_mask,
    make_sfron_step,
    mask_sparsity,
    topk_saliency_mask,
)
from uurg_tpu.unlearn.sfron import init_state
from uurg_tpu.workloads.ddpm import DDPMWorkload

log = logging.getLogger("uurg.ddpm")


def _load_train_dataset(args, config) -> ArrayDataset:
    name = config.data.dataset
    if name == "CIFAR10":
        try:
            return load_cifar10(config.data.get("path", "./data"), train=True)
        except FileNotFoundError:
            log.warning("CIFAR-10 not found under %s — synthetic fallback",
                        config.data.get("path"))
    # explicit base_seed: every DDPM-protocol fallback (train, probe
    # classifier, base-dataset export) must share ONE class-pattern set —
    # with base_seed=None the patterns depend on n, so differently-sized
    # fallbacks silently diverge and cross-model probes read noise
    # synthetic_n: stand-in size knob (parity kit --quick shrinks it so the
    # full pipeline stays CI-runnable on one CPU core)
    return synthetic_dataset(config.data.get("synthetic_n", 2048),
                             config.data.image_size,
                             config.data.channels, config.data.n_classes,
                             base_seed=0)


def _flip(config):
    if config.data.get("random_flip", False):
        return random_flip_batch
    return None


_DATA_SHARDING = None


def _data_sharding():
    """Lazy 1-D data mesh over all local devices (None on one device).

    Makes every training loop in this runner multi-chip by default: batches
    land data-sharded, params stay uncommitted (pjit replicates them), and
    the loss mean turns gradient reduction into a psum over ICI — the
    DataParallel replacement at the train loops, matching what
    ``sample_class_batches`` already does for sampling.
    """
    global _DATA_SHARDING
    if _DATA_SHARDING is None:
        local = jax.local_devices()
        if len(local) > 1:
            from uurg_tpu.parallel import batch_sharding, make_mesh

            _DATA_SHARDING = batch_sharding(
                make_mesh({"data": len(local)}, devices=local))
        else:
            _DATA_SHARDING = False
    return _DATA_SHARDING or None


def _device_batch(config, x, c):
    x = jnp.asarray(x)
    x = data_transform(config, x)
    c = jnp.asarray(c)
    sh = _data_sharding()
    if sh is not None and x.shape[0] % len(jax.local_devices()) == 0:
        x = jax.device_put(x, sh)
        c = jax.device_put(c, sh)
    return x, c


def pretrain(args, config, ckpt_dir: str, dataset: ArrayDataset | None = None):
    """Conditional DDPM pretraining (DDPM/runners/diffusion.py:101-177).
    ``dataset`` overrides the config dataset (retrain mode passes the remain
    split for exact unlearning)."""
    wl = DDPMWorkload.from_config(config)
    params = wl.init_params(jax.random.key(args.seed))
    opt = build_reference_optimizer(config)
    # pretrain reuses the SFRon engine with forgetting disabled: remain-only
    # descent + EMA shadow — one code path, fewer bugs
    cfg = SFRonConfig(
        n_iters=config.training.n_iters, forget_alpha=0.0,
        alpha_sched="const", forget_freq=1,
        forget_clip=None, remain_clip=config.optim.get("grad_clip", None),
        ema_mu=config.model.ema_rate if config.model.get("ema") else None,
    )
    zero_loss = lambda p, b, k: jnp.zeros(())
    step = make_sfron_step(cfg, opt, zero_loss, wl.train_loss_fn())
    state = init_state(params, opt, ema=bool(config.model.get("ema")))

    ds = dataset if dataset is not None else _load_train_dataset(args, config)
    it = infinite_batches(ds, config.training.batch_size, seed=args.seed,
                          transform=_flip(config))
    key = jax.random.key(args.seed)
    start = time.time()
    for i in range(config.training.n_iters):
        x, c = next(it)
        batch = _device_batch(config, x, c)
        state, metrics = step(state, batch, batch, key)
        if (i + 1) % config.training.log_freq == 0:
            jax.block_until_ready(state.params)
            log.info("step %d loss %.4f (%.2fs)", i,
                     float(metrics["remain_loss"]), time.time() - start)
            start = time.time()
        if (i + 1) % config.training.snapshot_freq == 0:
            _save(ckpt_dir, state, config)
    _save(ckpt_dir, state, config, full=True)
    return state


def _save(ckpt_dir, state, config, full: bool = False):
    """Snapshot = {params, ema, step} (reference ckpt.pth parity). The full
    train state (opt state included, 2x bigger) is written only when
    ``full`` — end of run or explicit resume points — because at
    snapshot_freq=10 the IO otherwise dwarfs the compute (the 150-step
    north-star run spends ~1s/10 steps computing)."""
    save_checkpoint(
        os.path.join(ckpt_dir, "ckpt"),
        {"params": state.params, "ema_params": state.ema_params,
         "step": state.step},
        metadata={"config": config.to_dict()},
    )
    if full:
        save_checkpoint(
            os.path.join(ckpt_dir, "train_state"),
            {"step": state.step, "params": state.params,
             "opt_state": state.opt_state, "ema_params": state.ema_params},
        )


def _try_resume(ckpt_dir, state):
    """Restore a full train state if one exists; returns (state, step)."""
    path = os.path.join(ckpt_dir, "train_state")
    if not os.path.exists(path):
        return state, 0
    target = {"step": state.step, "params": state.params,
              "opt_state": state.opt_state, "ema_params": state.ema_params}
    ck = restore_checkpoint(path, target)
    import dataclasses as _dc

    state = _dc.replace(state, step=jnp.asarray(ck["step"]),
                        params=ck["params"], opt_state=ck["opt_state"],
                        ema_params=ck["ema_params"])
    log.info("resumed from %s at step %d", path, int(ck["step"]))
    return state, int(ck["step"])


def load_params(args, config, wl: DDPMWorkload, use_ema: bool = False):
    """Load from an Orbax dir or a reference torch ckpt.pth."""
    path = getattr(args, "ckpt_folder", None)
    if not path:
        return wl.init_params(jax.random.key(args.seed))
    torch_path = os.path.join(path, "ckpts", "ckpt.pth")
    if os.path.exists(torch_path):
        from uurg_tpu.io.torch_interop import load_ddpm_reference_checkpoint

        loaded = load_ddpm_reference_checkpoint(torch_path)
        params = loaded["ema_params"] if (use_ema and loaded["ema_params"]) \
            else loaded["params"]
        return jax.tree_util.tree_map(jnp.asarray, params)
    # runs save to <run_dir>/ckpts/ckpt; accept any layout the shared
    # resolver understands (run dir, ckpts dir, bare ckpt dir)
    from uurg_tpu.io.checkpoint import is_checkpoint_dir, resolve_checkpoint_dir

    orbax_path = resolve_checkpoint_dir(path)
    if not is_checkpoint_dir(orbax_path):
        log.warning("no checkpoint under %s — initializing fresh params",
                    path)
        return wl.init_params(jax.random.key(args.seed))
    # no target: structure read from disk (ema may or may not be present)
    ck = restore_checkpoint(orbax_path)
    params = ck["ema_params"] if use_ema and ck.get("ema_params") is not None \
        else ck["params"]
    return jax.tree_util.tree_map(jnp.asarray, params)


def generate_fisher(args, config, out_dir: str):
    """Forget+remain Fisher diagonals
    (DDPM/runners/diffusion.py:1210-1364)."""
    wl = DDPMWorkload.from_config(config)
    params = load_params(args, config, wl)
    ds = _load_train_dataset(args, config)
    remain, forget = class_forget_split(ds, args.label_to_forget)
    loss_fn = wl.fisher_loss_fn(cond_scale=getattr(args, "cond_scale", 2.0))
    os.makedirs(out_dir, exist_ok=True)

    def batches(d):
        for x, c in epoch_batches(d, config.training.batch_size,
                                  drop_last=False):
            yield _device_batch(config, x, c)

    for name, split in [("forget", forget), ("remain", remain)]:
        fisher = accumulate_fisher(loss_fn, params, batches(split),
                                   jax.random.key(args.seed))
        save_checkpoint(os.path.join(out_dir, f"{name}_fisher"), fisher)
        log.info("saved %s fisher (%d examples)", name, len(split))
    return out_dir


def generate_fisher_mask(fisher_dir: str, thresholds, params_like=None):
    """Ratio-threshold saliency masks (DDPM/generate_fisher_mask.py:6-48)."""
    ff = restore_checkpoint(os.path.join(fisher_dir, "forget_fisher"),
                            params_like)
    rf = restore_checkpoint(os.path.join(fisher_dir, "remain_fisher"),
                            params_like)
    out = {}
    for th in np.atleast_1d(thresholds):
        mask = fisher_ratio_mask(ff, rf, float(th))
        sp = mask_sparsity(mask)
        log.info("threshold %.3g -> sparsity %.2f%%", th, sp * 100)
        save_checkpoint(os.path.join(fisher_dir, f"fisher_{th}"), mask)
        out[float(th)] = mask
    return out


def generate_salun_mask(args, config, out_dir: str, ratios):
    """SalUn top-k |grad| mask over the forget split
    (DDPM/runners/diffusion.py:930-1036 generate_mask)."""
    from uurg_tpu.core import tree as tr

    wl = DDPMWorkload.from_config(config)
    params = load_params(args, config, wl)
    ds = _load_train_dataset(args, config)
    _, forget = class_forget_split(ds, args.label_to_forget)
    neg_loss = wl.ga_forget_loss_fn()

    grad_step = jax.jit(lambda acc, p, b, k: jax.tree_util.tree_map(
        jnp.add, acc, jax.grad(neg_loss)(p, b, k)))
    acc = tr.tree_zeros_like(params)
    key = jax.random.key(args.seed)
    for x, c in epoch_batches(forget, config.training.batch_size):
        key, sub = jax.random.split(key)
        acc = grad_step(acc, params, _device_batch(config, x, c), sub)
    os.makedirs(out_dir, exist_ok=True)
    for ratio in np.atleast_1d(ratios):
        mask = topk_saliency_mask(acc, float(ratio))
        save_checkpoint(os.path.join(out_dir, f"with_{ratio}"), mask)
    return out_dir


def sfron_forget(args, config, ckpt_dir: str,
                 sample_hook: Callable | None = None):
    """SFR-on unlearning (DDPM/runners/diffusion.py:1038-1208): forget step
    (adaga/ga/rl, masked, clipped) + remain step + EMA, fused in one jit."""
    wl = DDPMWorkload.from_config(config)
    params = load_params(args, config, wl)

    mask = None
    if getattr(args, "mask_path", None):
        mask = restore_checkpoint(args.mask_path, params)
        # bool: 1 byte/elem in HBM; tree_mul casts at the multiply site
        mask = jax.tree_util.tree_map(
            lambda m: jnp.asarray(m, jnp.bool_), mask)
        if getattr(args, "pack_mask", False):
            # bit-plane layout: 1 bit/elem (the DiT/SD --pack_mask knob,
            # threaded here so the parity kit can run the benched memory
            # policy end to end)
            from uurg_tpu.core.tree import pack_mask as _pack

            mask = _pack(mask)

    opt = build_reference_optimizer(
        config, nu_dtype=getattr(args, "nu_dtype", None))
    sf_cfg = SFRonConfig(
        n_iters=config.training.n_iters,
        forget_alpha=args.forget_alpha,
        remain_alpha=getattr(args, "remain_alpha", 1.0),
        alpha_sched="cosine" if getattr(args, "decay_forget_alpha", False)
        else "const",
        forget_freq=1,
        forget_clip=config.optim.get("grad_clip"),
        remain_clip=config.optim.get("grad_clip"),
        method=getattr(args, "method", "ron"),
        ema_mu=config.model.ema_rate if config.model.get("ema") else None,
    )
    forget_loss = wl.forget_loss_fn(
        getattr(args, "unlearn_loss", "adaga"), args.label_to_forget,
        config.data.n_classes)
    step = make_sfron_step(sf_cfg, opt, forget_loss, wl.train_loss_fn())
    state = init_state(params, opt, ema=bool(config.model.get("ema")),
                       mask=mask)
    state, start_step = _try_resume(ckpt_dir, state)

    ds = _load_train_dataset(args, config)
    remain, forget = class_forget_split(ds, args.label_to_forget)
    f_it = infinite_batches(forget, config.training.batch_size,
                            seed=args.seed, transform=_flip(config))
    r_it = infinite_batches(remain, config.training.batch_size,
                            seed=args.seed + 1, transform=_flip(config))
    key = jax.random.key(args.seed)
    start = time.time()
    for i in range(start_step, config.training.n_iters):
        fx, fc = next(f_it)
        rx, rc = next(r_it)
        state, metrics = step(state, _device_batch(config, fx, fc),
                              _device_batch(config, rx, rc), key)
        if (i + 1) % config.training.log_freq == 0:
            jax.block_until_ready(state.params)
            log.info(
                "step:%04d remain L:%.4f forget L:%.4f forget a:%.6f "
                "time:%.2f", i, float(metrics["remain_loss"]),
                float(metrics["forget_loss"]),
                float(metrics["forget_alpha"]), time.time() - start)
            start = time.time()
        if (i + 1) % config.training.snapshot_freq == 0:
            _save(ckpt_dir, state, config)
            if sample_hook is not None:
                sample_hook(state, i)
    _save(ckpt_dir, state, config, full=True)
    return state


def sa_forget(args, config, ckpt_dir: str):
    """Selective Amnesia (EWC) forgetting
    (DDPM/runners/diffusion.py:354-477): contrastive loss on uniform-noise
    forget images + gamma * remember loss + lambda * EWC pull toward the MLE
    params, with the per-sample FIM from cli/fim.py. Fisher + MLE params are
    jit arguments (aux), never closure constants."""
    import optax

    from uurg_tpu.core import tree as _tr

    wl = DDPMWorkload.from_config(config)
    params = load_params(args, config, wl)
    fisher = restore_checkpoint(
        os.path.join(args.ckpt_folder, "fisher_dict"), params)
    params_mle = jax.tree_util.tree_map(jnp.asarray, params)
    loss_fn = wl.sa_loss_fn(args.label_to_forget,
                            config.training.get("gamma", 1.0),
                            config.training.get("lmbda", 100.0))
    opt = build_reference_optimizer(config)
    opt_state = jax.jit(opt.init)(params)
    ema = params if config.model.get("ema") else None
    mu = config.model.get("ema_rate", 0.9999)

    @jax.jit
    def step(params, opt_state, ema, batch, rng, aux):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, rng, aux)
        clip = config.optim.get("grad_clip")
        if clip:
            grads, _ = _tr.clip_by_global_norm(grads, clip)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if ema is not None:
            ema = _tr.tree_lerp(params, ema, mu)
        return params, opt_state, ema, loss

    # 'remember' samples: generated class_samples folder for all classes
    # except the forgotten one (all_but_one_class_path_dataset equivalent)
    from uurg_tpu.data import load_image_folder

    samples_dir = os.path.join(args.ckpt_folder, "class_samples")
    try:
        classes = [c for c in sorted(os.listdir(samples_dir))
                   if c != str(args.label_to_forget)]
        ds = load_image_folder(samples_dir, config.data.image_size, classes)
    except (FileNotFoundError, NotADirectoryError):
        log.warning("no class_samples dir; falling back to remain split")
        ds, _ = class_forget_split(_load_train_dataset(args, config),
                                   args.label_to_forget)

    it = infinite_batches(ds, config.training.batch_size, seed=args.seed)
    key = jax.random.key(args.seed)
    for i in range(config.training.n_iters):
        x, c = next(it)
        key, sub = jax.random.split(key)
        params, opt_state, ema, loss = step(
            params, opt_state, ema, _device_batch(config, x, c), sub,
            (fisher, params_mle))
        if (i + 1) % config.training.log_freq == 0:
            log.info("step %d loss %.4f", i, float(loss))
        if (i + 1) % config.training.snapshot_freq == 0:
            # flush any in-flight save of this same path, then overlap the
            # new one with the next snapshot_freq training steps
            wait_for_saves()
            save_checkpoint(os.path.join(ckpt_dir, "ckpt"),
                            {"params": params, "ema_params": ema,
                             "step": jnp.asarray(i)}, block=False)
    wait_for_saves()
    save_checkpoint(os.path.join(ckpt_dir, "ckpt"),
                    {"params": params, "ema_params": ema,
                     "step": jnp.asarray(config.training.n_iters)})
    return params


def sample_images(args, config, params, labels: np.ndarray,
                  *, num_steps: int = 50, method: str = "ddim",
                  cond_scale: float = 2.0, batch_size: int | None = None,
                  seed: int = 0) -> np.ndarray:
    """Batched class-conditional sampling -> uint8 NHWC images.

    Multi-batch host loop around the jitted lax.scan sampler (the
    DataParallel/NCCL sample_fid replacement: under a data mesh each batch is
    sharded across devices; multi-host runs shard the label list by
    process_index like DiT/sample_ddp.py:94-104 shards by rank).
    """
    wl = DDPMWorkload.from_config(config)
    sampler = jax.jit(wl.make_sampler(
        num_steps=num_steps, cond_scale=cond_scale, method=method))
    bs = batch_size or config.sampling.batch_size
    # single-process multi-device: shard each batch over a data mesh so the
    # lax.scan sampler runs SPMD across local chips
    sharding = None
    if jax.device_count() > 1:
        from uurg_tpu.parallel import batch_sharding, make_mesh

        sharding = batch_sharding(make_mesh({"data": jax.device_count()}))
        bs = max(bs, jax.device_count()) // jax.device_count() * jax.device_count()
    out = []
    key = jax.random.key(seed)
    pending = None  # download batch i while the device samples batch i+1
    for start in range(0, len(labels), bs):
        chunk = labels[start : start + bs]
        pad = bs - len(chunk)
        key, sub = jax.random.split(key)
        lab = jnp.asarray(np.pad(chunk, (0, pad)))
        if sharding is not None:
            lab = jax.device_put(lab, sharding)
        x = sampler(params, lab, sub)
        x = inverse_data_transform(config, x)[: len(chunk)]
        if pending is not None:
            out.append(np.asarray(pending))
        pending = x
    if pending is not None:
        out.append(np.asarray(pending))
    imgs = np.concatenate(out)
    return (imgs * 255.0).round().astype(np.uint8)
