#!/usr/bin/env python
"""DDPM train/unlearn CLI — reference-flag-compatible (DDPM/train.py:15-172).

Modes: pretrain | retrain | sfron | salun | generate_mask | generate_fisher

Examples (matching DDPM/README.md):
  python cli/train.py --config configs/cifar10_pretrain.yml --mode pretrain
  python cli/train.py --config configs/cifar10_fisher.yml --mode generate_fisher \
      --ckpt_folder results/cifar10/pretrain/<ts> --label_to_forget 0
  python cli/train.py --config configs/cifar10_sfron.yml --mode sfron \
      --ckpt_folder results/cifar10/pretrain/<ts> --label_to_forget 0 \
      --forget_alpha 10.0 --decay_forget_alpha --remain_alpha 1.0 \
      --method ron --unlearn_loss adaga --mask_path <mask dir>
"""
import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def str2bool(v: str) -> bool:
    # argparse type=bool treats any non-empty string (incl. "False") as
    # True; parse the usual spellings explicitly instead
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError(f"boolean value expected, got {v!r}")


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--mode", type=str, default="pretrain",
                   choices=["pretrain", "retrain", "sfron", "sa", "salun",
                            "generate_mask", "generate_fisher"])
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--exp", type=str, default="results")
    p.add_argument("--ckpt_folder", type=str, default="")
    p.add_argument("--label_to_forget", type=int, default=0)
    p.add_argument("--cond_scale", type=float, default=2.0)
    # sfron flags (DDPM/train.py)
    p.add_argument("--forget_alpha", type=float, default=10.0)
    p.add_argument("--remain_alpha", type=float, default=1.0)
    p.add_argument("--decay_forget_alpha", action="store_true")
    p.add_argument("--method", type=str, default="ron",
                   choices=["ron", "joint"])
    p.add_argument("--unlearn_loss", type=str, default="adaga",
                   choices=["adaga", "ga", "rl"])
    p.add_argument("--mask_path", type=str, default="")
    # sampling knobs used by the snapshot grids (DDPM/train.py parity)
    p.add_argument("--sample_type", type=str, default="generalized",
                   choices=["generalized", "ddpm_noisy"],
                   help="generalized = DDIM, ddpm_noisy = ancestral")
    p.add_argument("--skip_type", type=str, default="uniform",
                   choices=["uniform", "quad"])
    p.add_argument("--timesteps", type=int, default=50,
                   help="sampling steps for snapshot grids")
    p.add_argument("--eta", type=float, default=0.0)
    p.add_argument("--verbose", type=str, default="info")
    # reference flags accepted for command-line parity (semantics live in
    # the respective modes/configs)
    p.add_argument("--uc", type=str2bool, default=True)
    p.add_argument("--negative_guidance", type=float, default=1.0)
    p.add_argument("--sparse", type=str2bool, default=False)
    # mask generation
    p.add_argument("--threshold", type=float, nargs="+", default=[1.0])
    p.add_argument("--mask_ratio", type=float, nargs="+", default=[0.5])
    p.add_argument("--n_iters", type=int, default=0,
                   help="override config training.n_iters (smoke runs)")
    p.add_argument("--rng_impl", type=str, default="auto",
                   choices=["auto", "rbg", "threefry2x32"],
                   help="PRNG impl; auto = hardware rbg on TPU (~20%% "
                        "faster steps), threefry elsewhere")
    p.add_argument("--profile_dir", type=str, default="",
                   help="capture a jax.profiler trace of the run there "
                        "(TensorBoard/Perfetto); empty = off")
    return p.parse_args()


def main():
    args = parse_args()
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(message)s")
    from uurg_tpu.core.config import load_config
    from uurg_tpu.core.expdir import setup_run_dirs
    from uurg_tpu.utils.rng import configure_rng

    configure_rng(args.rng_impl)
    from uurg_tpu.workloads import ddpm_runner as R

    config = load_config(args.config)
    if args.n_iters > 0:
        config.training.n_iters = args.n_iters
    # hyperparam-encoded run tree (DDPM/functions/__init__.py:30-91 parity)
    run_dir = setup_run_dirs(args, config, exp_root=args.exp)
    ckpt_dir = config.ckpt_dir

    def sample_hook(state, step_idx):
        """Snapshot sample grid (diffusion.py:874-928 sample_visualization):
        one row per class from the EMA params, written under logs/.

        Fault-isolated: a failure here (e.g. a transient remote-compile
        relay error) loses one cosmetic grid, never the training run —
        the reference wraps its modes in the same broad guard
        (DDPM/train.py:147-171)."""
        try:
            _sample_grid(state, step_idx)
        except Exception:  # noqa: BLE001 — cosmetic path, log and continue
            import traceback
            logging.getLogger("uurg.train").warning(
                "snapshot grid at step %d failed (continuing):\n%s",
                step_idx, traceback.format_exc())

    def _sample_grid(state, step_idx):
        import numpy as np

        from uurg_tpu.utils.images import save_grid

        n_classes = config.data.n_classes
        n_vis = min(config.training.get("visualization_samples", 100),
                    10 * n_classes)
        labels = np.tile(np.arange(n_classes), max(1, n_vis // n_classes))
        params = state.ema_params if state.ema_params is not None \
            else state.params
        steps = min(args.timesteps, config.diffusion.num_diffusion_timesteps)
        method = "ddpm" if args.sample_type == "ddpm_noisy" else "ddim"
        imgs = R.sample_images(args, config, params, labels,
                               num_steps=steps, method=method,
                               cond_scale=args.cond_scale,
                               batch_size=len(labels), seed=args.seed)
        save_grid(imgs, os.path.join(config.log_dir,
                                     f"samples_step{step_idx:05d}.png"),
                  ncol=n_classes)

    hook = sample_hook if config.training.get("visualization_samples") \
        else None

    from uurg_tpu.utils.profiling import maybe_trace

    with maybe_trace(args.profile_dir):
        if args.mode == "pretrain":
            R.pretrain(args, config, ckpt_dir)
        elif args.mode == "retrain":
            # exact unlearning: pretraining on the remain split only
            from uurg_tpu.data import class_forget_split

            remain, _ = class_forget_split(
                R._load_train_dataset(args, config), args.label_to_forget)
            R.pretrain(args, config, ckpt_dir, dataset=remain)
        elif args.mode == "generate_fisher":
            out = os.path.join(args.ckpt_folder or run_dir,
                               f"mask_{args.label_to_forget}")
            R.generate_fisher(args, config, out)
            R.generate_fisher_mask(out, args.threshold)
        elif args.mode == "generate_mask":
            out = os.path.join(args.ckpt_folder or run_dir,
                               f"salun_mask_{args.label_to_forget}")
            R.generate_salun_mask(args, config, out, args.mask_ratio)
        elif args.mode == "sfron":
            R.sfron_forget(args, config, ckpt_dir, sample_hook=hook)
        elif args.mode == "sa":
            R.sa_forget(args, config, ckpt_dir)
        elif args.mode == "salun":
            # SalUn = RandomLabel loss + top-k mask, via the same engine
            args.unlearn_loss = "rl"
            R.sfron_forget(args, config, ckpt_dir, sample_hook=hook)
    print(f"done: {run_dir}")


if __name__ == "__main__":
    main()
