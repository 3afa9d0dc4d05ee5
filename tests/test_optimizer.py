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
