"""Classification workload: classifier training, evaluation, and the
building blocks every unlearning method shares.

Reference: Classification/trainer/{train,val}.py, Classification/utils.py,
and the per-method loss definitions under Classification/unlearn/.

Models carry two variable collections: ``params`` (learned) and
``batch_stats`` (BatchNorm running statistics — the reference's buffers).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Iterable

import jax
import jax.numpy as jnp
import optax

from uurg_tpu.diffusion.losses import adaptive_loss


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                  keepdim: bool = False) -> jnp.ndarray:
    per = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    return per if keepdim else per.mean()


def accuracy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    return (jnp.argmax(logits, -1) == labels).mean() * 100.0


@dataclasses.dataclass
class Classifier:
    """Model bundle: apply with/without mutable batch stats."""

    model: Any  # flax Module with __call__(x, train=...)

    def train_apply(self, params, batch_stats, x):
        """Returns (logits, new_batch_stats)."""
        out, mut = self.model.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=True,
            mutable=["batch_stats"])
        return out, mut["batch_stats"]

    def eval_apply(self, params, batch_stats, x):
        return self.model.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=False)

    # -- loss builders (SFRon engine signatures, has_model_state=True) ----

    def ce_loss_fn(self) -> Callable:
        def fn(params, batch_stats, batch, rng):
            x, y = batch
            logits, new_bs = self.train_apply(params, batch_stats, x)
            return cross_entropy(logits, y), new_bs
        return fn

    def neg_adaptive_ce_loss_fn(self, lambd: float) -> Callable:
        """Forget objective: -AdaptiveLoss(CE) — adaga ascent
        (Classification/unlearn/sfron.py:131-134,196-199)."""
        def fn(params, batch_stats, batch, rng):
            x, y = batch
            logits, new_bs = self.train_apply(params, batch_stats, x)
            per = cross_entropy(logits, y, keepdim=True)
            return -adaptive_loss(per, lambd, eps=1e-15), new_bs
        return fn

    def neg_ce_loss_fn(self) -> Callable:
        """Plain gradient-ascent forget objective (``unlearn_loss=ga``)."""
        def fn(params, batch_stats, batch, rng):
            x, y = batch
            logits, new_bs = self.train_apply(params, batch_stats, x)
            return -cross_entropy(logits, y), new_bs
        return fn

    # -- jitted train/eval steps ------------------------------------------

    def make_train_step(self, optimizer: optax.GradientTransformation,
                        lr_schedule: Callable | None = None):
        """Standard supervised step (pretrain / retrain / finetune)."""

        def step(carry, batch, rng):
            params, batch_stats, opt_state, it = carry
            if lr_schedule is not None:
                opt_state.hyperparams["learning_rate"] = lr_schedule(it)

            def loss_fn(p):
                logits, new_bs = self.train_apply(p, batch_stats, batch[0])
                return cross_entropy(logits, batch[1]), (logits, new_bs)

            (loss, (logits, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            acc = accuracy(logits, batch[1])
            return (params, new_bs, opt_state, it + 1), {
                "loss": loss, "acc": acc}

        return jax.jit(step, donate_argnums=(0,))

    def make_eval_step(self):
        def step(params, batch_stats, batch):
            logits = self.eval_apply(params, batch_stats, batch[0])
            return {
                "loss": cross_entropy(logits, batch[1]),
                "acc": accuracy(logits, batch[1]),
                "n": batch[1].shape[0],
            }
        return jax.jit(step)

    def validate(self, params, batch_stats, batches: Iterable) -> dict:
        """Weighted-average top-1/loss over an epoch
        (Classification/trainer/val.py:7-26)."""
        step = self.make_eval_step()
        tot, loss_sum, acc_sum = 0, 0.0, 0.0
        for batch in batches:
            m = step(params, batch_stats, (jnp.asarray(batch[0]),
                                           jnp.asarray(batch[1])))
            n = int(m["n"])
            tot += n
            loss_sum += float(m["loss"]) * n
            acc_sum += float(m["acc"]) * n
        return {"loss": loss_sum / max(tot, 1), "acc": acc_sum / max(tot, 1)}

    def collect_logits(self, params, batch_stats, batches: Iterable):
        """Stacked logits + labels over a loader (for MIA/JS evals)."""
        step = jax.jit(self.eval_apply)
        logits, labels = [], []
        for x, y in batches:
            logits.append(jax.device_get(step(params, batch_stats,
                                              jnp.asarray(x))))
            labels.append(y)
        import numpy as np
        return np.concatenate(logits), np.concatenate(labels)
