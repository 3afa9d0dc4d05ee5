"""Functional optimizers: Noam-scheduled Adam and annealing SGD.

Noam schedule matches utils/optimizer.py:3-32:
    rate = max(min_lr, factor * model_size^-0.5
                      * min(step^-0.5, step * warmup^-1.5))
with the reference's quirk preserved: `model_size` is args.dim_input — the
post-conv feature dim (161, 672 or 5120), NOT dim_model
(utils/functions.py:107). Step starts at 1 (NoamOpt increments before
computing the rate).

Adam reproduces torch.optim.Adam(betas=(0.9, 0.98), eps=1e-9) semantics:
    m̂ = m/(1-β1^t), v̂ = v/(1-β2^t), p -= lr * m̂ / (sqrt(v̂) + eps).

AnnealingOpt note: the reference's AnnealingOpt.step only divides the LR
and never applies the SGD update (utils/optimizer.py:42-45) — a latent
bug, and the CTC path always constructs Noam anyway (train.py:103). The
`sgd_annealing` here implements the *intended* behavior (nesterov SGD with
lr /= anneal per step).

Gradient clipping matches torch.nn.utils.clip_grad_norm_ (global L2 norm).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class NoamConfig(NamedTuple):
    model_size: int  # args.dim_input (reference quirk)
    factor: float    # args.k_lr
    warmup: int
    min_lr: float
    beta1: float = 0.9
    beta2: float = 0.98
    eps: float = 1e-9


def noam_rate(step: jnp.ndarray, c: NoamConfig) -> jnp.ndarray:
    step = step.astype(jnp.float32)
    rate = (c.factor * c.model_size ** -0.5 *
            jnp.minimum(step ** -0.5, step * c.warmup ** -1.5))
    return jnp.maximum(c.min_lr, rate)


def init_adam_state(params, moments_dtype=None) -> Dict:
    """moments_dtype=bfloat16 stores mu/nu at half width (the update
    still computes in f32): cuts the optimizer pass's HBM traffic from
    28 to 20 bytes/param. Training numerics shift slightly (~2^-9
    relative on the moments) — opt-in via --adam-moments-dtype, the
    default reproduces torch.optim.Adam exactly (test_optimizer.py)."""
    z = (jax.tree_util.tree_map(jnp.zeros_like, params)
         if moments_dtype is None else
         jax.tree_util.tree_map(
             lambda p: jnp.zeros(p.shape, moments_dtype), params))
    z2 = jax.tree_util.tree_map(jnp.zeros_like, z)
    return {"step": jnp.zeros((), jnp.int32), "mu": z, "nu": z2}


def clip_by_global_norm(grads, max_norm: float):
    leaves = jax.tree_util.tree_leaves(grads)
    gnorm = jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                         for g in leaves))
    scale = jnp.minimum(1.0, max_norm / (gnorm + 1e-6))
    return jax.tree_util.tree_map(lambda g: g * scale, grads), gnorm


def adam_update(params, grads, state: Dict, lr,
                beta1: float = 0.9, beta2: float = 0.999,
                eps: float = 1e-8) -> Tuple[Dict, Dict]:
    """One bias-corrected Adam step at an externally-chosen lr (torch
    semantics). Shared by the Noam schedule below and lm_train.py's
    fixed-lr path — one owner for the update rule (incl. the optional
    bf16 moment storage)."""
    step = state["step"] + 1
    t = step.astype(jnp.float32)
    bc1 = 1.0 - beta1 ** t
    bc2 = 1.0 - beta2 ** t

    def upd(p, g, m, v):
        g = g.astype(jnp.float32)
        mdt = m.dtype  # moments may be stored bf16 (init_adam_state)
        m = beta1 * m.astype(jnp.float32) + (1.0 - beta1) * g
        v = beta2 * v.astype(jnp.float32) + (1.0 - beta2) * jnp.square(g)
        denom = jnp.sqrt(v / bc2) + eps
        new_p = p - lr * (m / bc1) / denom
        return new_p, m.astype(mdt), v.astype(mdt)

    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(state["mu"])
    flat_v = treedef.flatten_up_to(state["nu"])
    out = [upd(p, g, m, v) for p, g, m, v in
           zip(flat_p, flat_g, flat_m, flat_v)]
    new_params = treedef.unflatten([o[0] for o in out])
    new_mu = treedef.unflatten([o[1] for o in out])
    new_nu = treedef.unflatten([o[2] for o in out])
    return new_params, {"step": step, "mu": new_mu, "nu": new_nu}


def adam_noam_update(params, grads, state: Dict, c: NoamConfig,
                     clip: bool = False, max_norm: float = 400.0
                     ) -> Tuple[Dict, Dict, jnp.ndarray]:
    """One optimizer step. Returns (new_params, new_state, lr)."""
    if clip:
        grads, _ = clip_by_global_norm(grads, max_norm)
    lr = noam_rate(state["step"] + 1, c)
    new_params, new_state = adam_update(params, grads, state, lr,
                                        c.beta1, c.beta2, c.eps)
    return new_params, new_state, lr


# ---------------------------------------------------------------------------
# Annealing SGD (intended semantics of utils/optimizer.py:34-45)
# ---------------------------------------------------------------------------

def init_opt_state(cfg, params) -> Dict:
    """Optimizer state for cfg.opt — the init half of the reference's
    ``init_optimizer(args, model, opt_type)`` (functions.py:101-114)."""
    if cfg.opt == "sgd_annealing":
        return init_sgd_state(params, cfg.lr)
    mdt = (jnp.bfloat16 if getattr(cfg, "adam_moments_dtype",
                                   "float32") == "bfloat16" else None)
    return init_adam_state(params, moments_dtype=mdt)


def init_sgd_state(params, lr: float) -> Dict:
    return {"step": jnp.zeros((), jnp.int32),
            "lr": jnp.asarray(lr, jnp.float32),
            "buf": jax.tree_util.tree_map(jnp.zeros_like, params)}


def sgd_annealing_update(params, grads, state: Dict, momentum: float,
                         lr_anneal: float, clip: bool = False,
                         max_norm: float = 400.0):
    if clip:
        grads, _ = clip_by_global_norm(grads, max_norm)
    lr = state["lr"] / lr_anneal

    def upd(p, g, b):
        g = g.astype(jnp.float32)
        b = momentum * b + g
        return p - lr * (g + momentum * b), b  # nesterov

    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_b = treedef.flatten_up_to(state["buf"])
    out = [upd(p, g, b) for p, g, b in zip(flat_p, flat_g, flat_b)]
    new_params = treedef.unflatten([o[0] for o in out])
    new_buf = treedef.unflatten([o[1] for o in out])
    return new_params, {"step": state["step"] + 1, "lr": lr,
                        "buf": new_buf}, lr
