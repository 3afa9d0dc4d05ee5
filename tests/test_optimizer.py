"""Optimizer oracles: Noam schedule + Adam vs torch.optim.Adam with the
reference's NoamOpt wrapper semantics (utils/optimizer.py:3-32)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from end2end_asr_tpu.training.optimizer import (NoamConfig,
                                                adam_noam_update,
                                                clip_by_global_norm,
                                                init_adam_state, noam_rate)

torch = pytest.importorskip("torch")


def test_noam_rate_matches_reference_formula():
    c = NoamConfig(model_size=161, factor=1.0, warmup=4000, min_lr=1e-5)
    for step in (1, 10, 4000, 20000):
        ref = max(1e-5, 1.0 * (161 ** -0.5)
                  * min(step ** -0.5, step * 4000 ** -1.5))
        ours = float(noam_rate(jnp.asarray(step), c))
        assert abs(ours - ref) < 1e-9


def test_adam_matches_torch_under_noam_schedule():
    rs = np.random.RandomState(0)
    w0 = rs.randn(4, 3).astype(np.float32)
    c = NoamConfig(model_size=161, factor=1.0, warmup=100, min_lr=1e-5)

    # torch side: NoamOpt-style per-step lr assignment before Adam.step()
    wt = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt = torch.optim.Adam([wt], betas=(0.9, 0.98), eps=1e-9)
    # jax side
    params = {"w": jnp.asarray(w0)}
    state = init_adam_state(params)

    for step in range(1, 8):
        g = rs.randn(4, 3).astype(np.float32)
        rate = max(1e-5, (161 ** -0.5)
                   * min(step ** -0.5, step * 100 ** -1.5))
        for group in opt.param_groups:
            group["lr"] = rate
        wt.grad = torch.tensor(g)
        opt.step()

        params, state, lr = adam_noam_update(params, {"w": jnp.asarray(g)},
                                             state, c)
        assert abs(float(lr) - rate) < 1e-10

    np.testing.assert_allclose(np.asarray(params["w"]),
                               wt.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_clip_by_global_norm_matches_torch():
    rs = np.random.RandomState(1)
    grads = {"a": jnp.asarray(rs.randn(5, 5).astype(np.float32)),
             "b": jnp.asarray(rs.randn(7).astype(np.float32))}
    max_norm = 1.5
    clipped, gnorm = clip_by_global_norm(grads, max_norm)

    ta = torch.tensor(np.asarray(grads["a"]), requires_grad=True)
    tb = torch.tensor(np.asarray(grads["b"]), requires_grad=True)
    ta.grad, tb.grad = ta.clone().detach(), tb.clone().detach()
    ref_norm = torch.nn.utils.clip_grad_norm_([ta, tb], max_norm)
    assert abs(float(gnorm) - float(ref_norm)) < 1e-4
    np.testing.assert_allclose(np.asarray(clipped["a"]),
                               ta.grad.numpy(), rtol=1e-4, atol=1e-6)


def test_sgd_annealing_matches_torch_nesterov():
    """sgd_annealing_update vs torch.optim.SGD(nesterov) under the
    AnnealingOpt-intended schedule (lr /= lr_anneal before every
    update, utils/optimizer.py:34-45 + functions.py:108-109)."""
    from end2end_asr_tpu.training.optimizer import (init_sgd_state,
                                                    sgd_annealing_update)
    rs = np.random.RandomState(2)
    w0 = rs.randn(4, 3).astype(np.float32)
    lr0, anneal, momentum = 0.3, 1.1, 0.9

    wt = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt = torch.optim.SGD([wt], lr=lr0, momentum=momentum, nesterov=True)

    params = {"w": jnp.asarray(w0)}
    state = init_sgd_state(params, lr0)

    lr_t = lr0
    for step in range(1, 8):
        g = rs.randn(4, 3).astype(np.float32)
        lr_t = lr_t / anneal
        for group in opt.param_groups:
            group["lr"] = lr_t
        wt.grad = torch.tensor(g)
        opt.step()

        params, state, lr = sgd_annealing_update(
            params, {"w": jnp.asarray(g)}, state, momentum, anneal)
        assert abs(float(lr) - lr_t) < 1e-7

    np.testing.assert_allclose(np.asarray(params["w"]),
                               wt.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_sgd_annealing_train_step_runs(tmp_path):
    """--opt sgd_annealing end-to-end: the train step applies nesterov
    SGD, anneals the LR every step, and skips non-finite batches with
    the LR held."""
    import functools
    from end2end_asr_tpu.config import Config
    from end2end_asr_tpu.models.transformer import (dims_from_config,
                                                    init_transformer)
    from end2end_asr_tpu.training.optimizer import init_opt_state
    from end2end_asr_tpu.training.steps import make_train_step

    cfg = Config(opt="sgd_annealing", lr=0.1, lr_anneal=1.2,
                 feat_extractor="", num_layers=1, num_heads=2,
                 dim_model=32, dim_key=8, dim_value=8, dim_inner=64,
                 dim_emb=32, dim_input=16, dropout=0.0, dtype="float32",
                 src_max_len=16, tgt_max_len=8)
    dims = dims_from_config(cfg)
    params, model_state = jax.jit(functools.partial(
        init_transformer, cfg=cfg, num_vocab=8))(jax.random.PRNGKey(0))
    opt_state = init_opt_state(cfg, params)
    assert "buf" in opt_state and "lr" in opt_state

    step = make_train_step(cfg, dims, from_pcm=False)
    rng = jax.random.PRNGKey(1)
    spect = jnp.asarray(np.random.RandomState(0).randn(2, 16, 16),
                        jnp.float32)
    n_frames = jnp.asarray([16, 12], jnp.int32)
    targets = jnp.asarray([[1, 4, 5, 2, 0, 0, 0, 0],
                           [1, 6, 2, 0, 0, 0, 0, 0]], jnp.int32)
    tgt_lengths = jnp.asarray([4, 3], jnp.int32)
    params_before = jax.tree_util.tree_map(np.asarray, params)
    params2, opt2, _, metrics, _, _ = step(
        params, opt_state, model_state, rng, spect, n_frames,
        targets, tgt_lengths, spect_T=16)
    assert bool(metrics["finite"])
    np.testing.assert_allclose(float(metrics["lr"]), 0.1 / 1.2, rtol=1e-6)
    np.testing.assert_allclose(float(opt2["lr"]), 0.1 / 1.2, rtol=1e-6)
    # params actually moved
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - np.asarray(b)))),
        params_before, params2)
    assert max(jax.tree_util.tree_leaves(moved)) > 0


def test_adam_bf16_moments_tracks_f32():
    """bf16 moment storage (--adam-moments-dtype bfloat16): update still
    computed in f32; trajectories track the exact-f32 Adam closely and
    state stays bf16."""
    from end2end_asr_tpu.training.optimizer import (adam_noam_update,
                                                    init_adam_state)
    rs = np.random.RandomState(5)
    w0 = rs.randn(16, 8).astype(np.float32)
    c = NoamConfig(model_size=161, factor=1.0, warmup=100, min_lr=1e-5)

    p32 = {"w": jnp.asarray(w0)}
    s32 = init_adam_state(p32)
    p16 = {"w": jnp.asarray(w0)}
    s16 = init_adam_state(p16, moments_dtype=jnp.bfloat16)
    assert s16["mu"]["w"].dtype == jnp.bfloat16
    assert s16["nu"]["w"].dtype == jnp.bfloat16

    for step in range(1, 12):
        g = {"w": jnp.asarray(rs.randn(16, 8).astype(np.float32))}
        p32, s32, _ = adam_noam_update(p32, g, s32, c)
        p16, s16, _ = adam_noam_update(p16, g, s16, c)
    assert s16["mu"]["w"].dtype == jnp.bfloat16  # dtype preserved
    a = np.asarray(p16["w"])
    b = np.asarray(p32["w"])
    # moments quantized to ~2^-9 relative; params drift accordingly but
    # stay in lockstep
    np.testing.assert_allclose(a, b, rtol=0, atol=2e-2 * np.abs(b).max())
    assert not np.array_equal(a, b)  # the quantization is real
