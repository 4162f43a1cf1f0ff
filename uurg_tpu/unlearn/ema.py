"""EMA / fast-slow weight mixing — one tree-lerp covering all three reference
implementations (SURVEY.md section 2.6 item 6):

- DDPM EMAHelper (DDPM/models/ema.py:22-27):
    shadow = (1 - mu) * param + mu * shadow
- DiT update_ema (DiT/forget.py:52-62):
    ema = decay * ema + (1 - decay) * param            (decay = 0.9999)
- Classification fast-slow (Classification/unlearn/sfron.py:30-37,125-129):
    param = (1 - beta) * param_prev + beta * param_new (beta = ema_beta)
"""
from __future__ import annotations

from uurg_tpu.core.tree import tree_lerp


def ema_update(shadow, params, mu: float):
    """shadow <- (1 - mu) * params + mu * shadow  (DDPM/DiT style;
    mu = 0.9999 for pretrain, 1e-4 during SFR-on per
    DDPM/configs/cifar10_sfron.yml:24).

    The lerp computes in the params dtype and stores back in the shadow's
    dtype, so a bf16 shadow (memory policy for XL models) stays bf16.
    """
    import jax

    return jax.tree_util.tree_map(
        lambda p, s: ((1.0 - mu) * p + mu * s.astype(p.dtype)).astype(s.dtype),
        params, shadow,
    )


def fast_slow_mix(params_new, params_prev, beta: float):
    """params <- beta * params_new + (1 - beta) * params_prev
    (Classification SFRon ema_beta; beta = 1.0 disables mixing)."""
    return tree_lerp(params_new, params_prev, 1.0 - beta)
