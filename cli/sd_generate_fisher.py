#!/usr/bin/env python
"""SD Fisher generation + saliency mask CLI — reference-flag-compatible
(SD/train-scripts/generate_fisher.py + generate_fisher_mask.py): CFG-composed
eps loss squared-grad accumulation over nsfw / not-nsfw folders, then
ratio-threshold masks.
"""
import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from sd_common import (  # noqa: E402
    latent_prompt_batches,
    load_images_or_synthetic,
    setup_workload,
)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--nsfw_data", type=str, default="data/nsfw")
    p.add_argument("--not_nsfw_data", type=str, default="data/not-nsfw")
    p.add_argument("--forget_prompt", type=str,
                   default="a photo of a nude person")
    p.add_argument("--remain_prompt", type=str,
                   default="a photo of a person wearing clothes")
    p.add_argument("--guidance_scale", type=float, default=3.0)
    p.add_argument("--n_batches", type=int, default=50)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--image_size", type=int, default=512)
    p.add_argument("--ckpt_path", type=str, default="")
    p.add_argument("--threshold", type=float, nargs="+", default=[0.5])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--save_path", type=str, default="results/sd/fisher")
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO)

    import jax
    from uurg_tpu.io.checkpoint import save_checkpoint
    from uurg_tpu.unlearn import (accumulate_fisher, fisher_ratio_mask,
                                  mask_sparsity)

    wl, unet_params = setup_workload(args)
    loss = wl.fisher_loss_fn(args.guidance_scale)
    os.makedirs(args.save_path, exist_ok=True)

    fishers = {}
    for name, folder, prompt in [
        ("forget", args.nsfw_data, args.forget_prompt),
        ("remain", args.not_nsfw_data, args.remain_prompt),
    ]:
        imgs = load_images_or_synthetic(folder, args.image_size, args.seed)
        it = latent_prompt_batches(wl, imgs, prompt, args.batch_size,
                                   args.seed, extra_prompt="")
        fishers[name] = accumulate_fisher(
            loss, unet_params, it, jax.random.key(args.seed),
            num_batches=args.n_batches)
        save_checkpoint(os.path.join(args.save_path, f"nude_{name}"),
                        fishers[name])
        logging.info("saved %s fisher", name)

    for th in args.threshold:
        mask = fisher_ratio_mask(fishers["forget"], fishers["remain"], th)
        logging.info("th %.3g sparsity %.2f%%", th,
                     mask_sparsity(mask) * 100)
        save_checkpoint(os.path.join(args.save_path, f"nude_mask_{th}"),
                        mask)
    print(f"done: {args.save_path}")


if __name__ == "__main__":
    main()
