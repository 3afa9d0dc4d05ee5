"""Jitted train / eval steps.

The whole per-batch pipeline of the reference hot loop
(trainer/asr/trainer.py:49-111) — device copy, forward, loss, backward,
clip, Noam/Adam update — compiles into ONE donated XLA program per
(src_bucket, tgt_bucket) shape, including on-device feature extraction
from raw PCM (ops/features.py). Under a data mesh the same program runs
SPMD with XLA-inserted gradient reductions (parallel/mesh.py).

Reference behaviors preserved:
  * Inf/NaN loss → the whole update is skipped (trainer.py:87-90) via
    lax.cond (no host round-trip);
  * optional clip_grad_norm_ before the step (trainer.py:108-109);
  * CTC input_lengths = src_percentages * decoder length (trainer.py:81-82
    — the reference's quirky recipe, reproduced for parity);
  * teacher-forced argmax hyp/gold returned for train-CER logging
    (transformer.py:80-82).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from end2end_asr_tpu.config import Config
from end2end_asr_tpu.models.transformer import ModelDims, forward
from end2end_asr_tpu.ops.features import batched_features
from end2end_asr_tpu.training.loss import calculate_loss, token_accuracy
from end2end_asr_tpu.training.optimizer import (NoamConfig,
                                                adam_noam_update, noam_rate)


def noam_config_from(cfg: Config) -> NoamConfig:
    # model_size = dim_input (incl. conv arithmetic) — reference quirk,
    # utils/functions.py:101-107
    return NoamConfig(model_size=cfg.conv_dim_input(), factor=cfg.k_lr,
                      warmup=cfg.warmup, min_lr=cfg.min_lr)


def _features_or_passthrough(cfg: Config, batch: Dict):
    if batch.get("pcm") is None:
        return batch["spect"]
    from end2end_asr_tpu.ops.stft_pallas import (batched_features_pallas,
                                                 pallas_supported)
    use_pallas = (cfg.use_pallas_features
                  and pallas_supported(cfg.n_fft, cfg.hop_length)
                  and jax.default_backend() == "tpu")
    fn = batched_features_pallas if use_pallas else batched_features
    return fn(batch["pcm"], batch["n_frames"], cfg.n_fft, cfg.hop_length,
              cfg.window, T_out=batch["spect_T"], normalize=True)


def make_train_step_impl(cfg: Config, dims: ModelDims, from_pcm: bool):
    """The full train-step body, unjitted — shared by make_train_step
    (one jitted program per bucket) and make_multi_train_step (a
    lax.scan over K stacked batches, amortizing host dispatch)."""
    noam = noam_config_from(cfg)
    smoothing = cfg.label_smoothing
    loss_type = cfg.loss
    accum = max(1, int(getattr(cfg, "grad_accum", 1)))

    def _micro_loss_fn(p, model_state, rng, pcm_or_spect, n_frames,
                       targets, tgt_lengths, spect_T):
        batch = ({"pcm": pcm_or_spect, "spect": None}
                 if from_pcm else {"pcm": None, "spect": pcm_or_spect})
        batch["n_frames"] = n_frames
        batch["spect_T"] = spect_T

        def loss_fn(p):
            spect = _features_or_passthrough(cfg, batch)
            if cfg.spec_augment:
                from end2end_asr_tpu.ops.specaugment import apply_spec_augment
                sa_rng, fwd_rng = jax.random.split(rng)
                spect = apply_spec_augment(
                    sa_rng, spect, n_frames,
                    n_freq_masks=cfg.n_freq_masks,
                    freq_width=cfg.freq_mask_width,
                    n_time_masks=cfg.n_time_masks,
                    time_width=cfg.time_mask_width)
            else:
                fwd_rng = rng
            pred, gold, new_state = forward(
                p, model_state, spect, n_frames, targets, dims,
                train=True, rng=fwd_rng)
            U_out = pred.shape[1]
            in_lens = (n_frames.astype(jnp.float32) / spect_T
                       * U_out).astype(jnp.int32)
            loss = calculate_loss(pred, gold, in_lens, tgt_lengths,
                                  smoothing, loss_type)
            return loss, (pred, gold, new_state)

        return jax.value_and_grad(loss_fn, has_aux=True)(p)

    def _accumulated_grads(params, model_state, rng, pcm_or_spect,
                           n_frames, targets, tgt_lengths, spect_T):
        """K sequential microbatches inside one program: lax.scan
        rematerializes each microbatch's activations, so peak memory is
        1/K of the full batch while grads/loss are EXACTLY the full-batch
        values — the CE masked-mean is re-weighted by each microbatch's
        non-PAD token count (CTC 'mean' weights microbatches uniformly;
        sizes are equal by construction). BN running stats advance once
        per microbatch (same as torch seeing K small batches)."""
        B = targets.shape[0]
        if B % accum != 0:
            raise ValueError(
                f"--grad-accum {accum} must divide the batch size {B}")

        def resh(a):
            # INTERLEAVED split: microbatch m = samples [m::accum].
            # A contiguous (accum, B/accum) reshape of a 'data'-sharded
            # batch dim produces a sharding GSPMD can't express per
            # microbatch (custom_partitioning unflatten crashes under a
            # mesh); the interleaved split keeps every microbatch
            # exactly batch-sharded whenever accum divides the
            # per-device batch. Numerics: the loss re-weighting makes
            # the accumulated grads grouping-independent (masked-mean
            # CE re-weighted by tokens; CTC uniform over equal-size
            # microbatches) — only fp summation order changes.
            return a.reshape(B // accum, accum,
                             *a.shape[1:]).swapaxes(0, 1)

        xs = (resh(pcm_or_spect), resh(n_frames), resh(targets),
              resh(tgt_lengths), jax.random.split(rng, accum))
        g0 = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.float32), params)
        carry0 = (g0, model_state, jnp.float32(0.0), jnp.float32(0.0))

        def body(carry, x):
            g_acc, state_c, loss_acc, w_acc = carry
            mb_arr, mb_nf, mb_tg, mb_tl, mb_rng = x
            (loss, (pred, gold, new_state)), grads = _micro_loss_fn(
                params, state_c, mb_rng, mb_arr, mb_nf, mb_tg, mb_tl,
                spect_T)
            if loss_type == "ce":
                w = jnp.sum(gold != 0).astype(jnp.float32)
            else:
                w = jnp.float32(1.0)
            g_acc = jax.tree_util.tree_map(
                lambda a, g: a + g.astype(jnp.float32) * w, g_acc, grads)
            hyp = jnp.argmax(pred, axis=-1).astype(jnp.int32)
            ncorr = token_accuracy(pred, gold)
            ntok = jnp.sum(gold != 0)
            return ((g_acc, new_state, loss_acc + loss * w, w_acc + w),
                    (hyp, gold, ncorr, ntok))

        (g_acc, new_state, loss_acc, w_acc), ys = jax.lax.scan(
            body, carry0, xs)
        hyp_k, gold_k, ncorr_k, ntok_k = ys
        inv = 1.0 / jnp.maximum(w_acc, 1.0)
        grads = jax.tree_util.tree_map(lambda g: g * inv, g_acc)
        loss = loss_acc * inv
        # invert the interleave: (accum, B/accum, …) → original row order
        hyp_seq = hyp_k.swapaxes(0, 1).reshape(B, *hyp_k.shape[2:])
        gold = gold_k.swapaxes(0, 1).reshape(B, *gold_k.shape[2:])
        return (loss, grads, new_state, hyp_seq, gold,
                jnp.sum(ncorr_k), jnp.sum(ntok_k))

    def step(params, opt_state, model_state, rng,
             pcm_or_spect, n_frames, targets, tgt_lengths, spect_T):
        if accum > 1:
            (loss, grads, new_state, hyp_seq_acc, gold_acc, ncorr_acc,
             ntok_acc) = _accumulated_grads(
                params, model_state, rng, pcm_or_spect, n_frames,
                targets, tgt_lengths, spect_T)
            pred = None
            gold = gold_acc
        else:
            (loss, (pred, gold, new_state)), grads = _micro_loss_fn(
                params, model_state, rng, pcm_or_spect, n_frames,
                targets, tgt_lengths, spect_T)

        # Inf/NaN loss → skip the batch (trainer.py:87-90). Per-leaf
        # selects instead of lax.cond: the TPU conditional materialized
        # copies of every param/opt buffer (~1.7 ms/step); the selects
        # fuse into the Adam update (garbage updates from non-finite
        # grads are discarded by the select, never applied).
        finite = jnp.isfinite(loss)
        if cfg.opt == "sgd_annealing":
            from end2end_asr_tpu.training.optimizer import \
                sgd_annealing_update
            upd_params, upd_opt, upd_lr = sgd_annealing_update(
                params, grads, opt_state, cfg.momentum, cfg.lr_anneal,
                clip=cfg.clip, max_norm=cfg.max_norm)
            skip_lr = opt_state["lr"]  # skipped batch: no anneal applied
        else:
            upd_params, upd_opt, upd_lr = adam_noam_update(
                params, grads, opt_state, noam, clip=cfg.clip,
                max_norm=cfg.max_norm)
            skip_lr = noam_rate(opt_state["step"] + 1, noam)

        def pick(new, old):
            return jax.tree_util.tree_map(
                lambda n, o: jnp.where(finite, n, o), new, old)

        new_params = pick(upd_params, params)
        new_opt = pick(upd_opt, opt_state)
        lr = jnp.where(finite, upd_lr, skip_lr)

        if getattr(cfg, "zero1", False) or getattr(cfg, "fsdp", False):
            # ZeRO (parallel/zero.py): pin the new moments (and, at
            # stage 3/FSDP, the new params) to their 'data'-sharded
            # layouts so the donated buffers alias and GSPMD partitions
            # the Adam update instead of replicating it
            from end2end_asr_tpu.parallel import zero
            if zero.active():
                new_opt = zero.constrain_opt(new_opt, params)
                new_params = zero.constrain_params(new_params)

        if accum > 1:
            hyp_seq = hyp_seq_acc
            num_correct, num_token = ncorr_acc, ntok_acc
        else:
            hyp_seq = jnp.argmax(pred, axis=-1).astype(jnp.int32)
            num_correct = token_accuracy(pred, gold)
            num_token = jnp.sum(gold != 0)
        metrics = {
            "loss": jnp.where(finite, loss, 0.0),
            "finite": finite,
            "lr": lr,
            "num_correct": num_correct,
            "num_token": num_token,
        }
        return new_params, new_opt, new_state, metrics, hyp_seq, gold

    return step


# Jitted-step memo: jax.jit caches traces on the *wrapper object*, so a
# fresh make_*_step per Trainer.train() call used to retrace (and, on
# the remote-compile tunnel, re-fetch) the whole grad program — ~30 s
# of the measured 1 s/step trainer-loop gap (tools/probe_tunnel.py,
# BENCH_NOTES round 4). Config and ModelDims are frozen/hashable, so
# identical (cfg, dims, from_pcm) reuse one wrapper process-wide.
_JIT_CACHE: Dict = {}


def _memo(kind: str, cfg: Config, dims: ModelDims, from_pcm: bool, build):
    try:
        key = (kind, cfg, dims, from_pcm)
        if getattr(cfg, "seq_parallel", False):
            # SP traces bake the installed mesh into their sharding
            # constraints (parallel/sp.py module state) — key on the
            # INSTALL GENERATION, not id(mesh): a GC'd mesh whose address
            # a new Mesh reuses must never revive a stale trace
            # (ADVICE r4; regression test tests/test_steps_memo.py).
            from end2end_asr_tpu.parallel import sp
            key += (sp._GEN,)
        if getattr(cfg, "mesh_pipe", 1) > 1:
            # same for the pipeline mesh + microbatch count
            # (parallel/pp.py module state)
            from end2end_asr_tpu.parallel import pp
            key += (pp._GEN, pp._N_MICRO)
        if getattr(cfg, "zero1", False) or getattr(cfg, "fsdp", False):
            # same for the ZeRO mesh + stage (parallel/zero.py state)
            from end2end_asr_tpu.parallel import zero
            key += (zero._GEN, zero._STAGE)
        hash(key)
    except TypeError:
        return build()
    fn = _JIT_CACHE.get(key)
    if fn is None:
        fn = _JIT_CACHE[key] = build()
    return fn


def make_train_step(cfg: Config, dims: ModelDims, from_pcm: bool):
    def build():
        impl = make_train_step_impl(cfg, dims, from_pcm)
        return functools.partial(jax.jit, static_argnames=("spect_T",),
                                 donate_argnums=(0, 1))(impl)

    return _memo("train", cfg, dims, from_pcm, build)


def make_multi_train_step(cfg: Config, dims: ModelDims, from_pcm: bool):
    """K optimizer steps in ONE dispatched program (--steps-per-dispatch).

    lax.scan over K stacked same-bucket batches applies the exact
    single-step body K times — numerics identical to K separate
    dispatches (same traced computation, same RNG stream; pinned by
    tests/test_multi_dispatch.py). The win is host-side: one dispatch,
    one metrics pull and one tunnel round-trip per K batches, which
    matters when the host (1 vCPU here) or the dispatch channel is the
    bottleneck rather than the chip. The trainer groups consecutive
    equal-shape batches and falls back to the single-step program for
    partial groups (training/trainer.py)."""
    def build():
        impl = make_train_step_impl(cfg, dims, from_pcm)

        @functools.partial(jax.jit, static_argnames=("spect_T",),
                           donate_argnums=(0, 1))
        def multi_step(params, opt_state, model_state, rngs,
                       pcm_or_spect, n_frames, targets, tgt_lengths,
                       spect_T):
            def body(carry, x):
                p, o, s = carry
                rng, arr, nf, tg, tl = x
                p, o, s, m, hyp, gold = impl(p, o, s, rng, arr, nf, tg,
                                             tl, spect_T)
                return (p, o, s), (m, hyp, gold)

            ((params, opt_state, model_state),
             (ms, hyps, golds)) = jax.lax.scan(
                body, (params, opt_state, model_state),
                (rngs, pcm_or_spect, n_frames, targets, tgt_lengths))
            return params, opt_state, model_state, ms, hyps, golds

        return multi_step

    return _memo("multi", cfg, dims, from_pcm, build)


def make_eval_step(cfg: Config, dims: ModelDims, from_pcm: bool):
    return _memo("eval", cfg, dims, from_pcm,
                 lambda: _build_eval_step(cfg, dims, from_pcm))


def _build_eval_step(cfg: Config, dims: ModelDims, from_pcm: bool):
    smoothing = cfg.label_smoothing
    loss_type = cfg.loss

    @functools.partial(jax.jit, static_argnames=("spect_T",))
    def eval_step(params, model_state, pcm_or_spect, n_frames, targets,
                  tgt_lengths, spect_T):
        batch = ({"pcm": pcm_or_spect, "spect": None}
                 if from_pcm else {"pcm": None, "spect": pcm_or_spect})
        batch["n_frames"] = n_frames
        batch["spect_T"] = spect_T
        spect = _features_or_passthrough(cfg, batch)
        pred, gold, _ = forward(params, model_state, spect, n_frames,
                                targets, dims, train=False)
        U_out = pred.shape[1]
        in_lens = (n_frames.astype(jnp.float32) / spect_T
                   * U_out).astype(jnp.int32)
        loss = calculate_loss(pred, gold, in_lens, tgt_lengths,
                              smoothing, loss_type)
        hyp_seq = jnp.argmax(pred, axis=-1).astype(jnp.int32)
        return loss, hyp_seq, gold

    return eval_step


def make_encode_fn(cfg: Config, dims: ModelDims, from_pcm: bool):
    """Jitted encode for decoding paths (greedy/beam)."""
    return _memo("encode", cfg, dims, from_pcm,
                 lambda: _build_encode_fn(cfg, dims, from_pcm))


def _build_encode_fn(cfg: Config, dims: ModelDims, from_pcm: bool):
    from end2end_asr_tpu.models.transformer import encode

    @functools.partial(jax.jit, static_argnames=("spect_T",))
    def encode_fn(params, model_state, pcm_or_spect, n_frames, spect_T):
        batch = ({"pcm": pcm_or_spect, "spect": None}
                 if from_pcm else {"pcm": None, "spect": pcm_or_spect})
        batch["n_frames"] = n_frames
        batch["spect_T"] = spect_T
        spect = _features_or_passthrough(cfg, batch)
        enc_out, enc_lens, _ = encode(params, model_state, spect,
                                      n_frames, dims, train=False)
        return enc_out, enc_lens

    return encode_fn
