"""In-process interleaved ABAB probe: flash train-attention kernel ON vs
OFF, pipelined-dispatch regime (bench.py methodology), same chip, same
minute.  Both step programs are compiled first, then timed alternately
so drift hits both arms equally.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH, T_FRAMES, U_TGT, VOCAB = 12, 800, 48, 4336
ITERS = 40
ROUNDS = 6


def main():
    import jax
    jax.config.update("jax_default_prng_impl", "rbg")

    from __graft_entry__ import _flagship_cfg, _synthetic_batch
    from end2end_asr_tpu.models import layers
    from end2end_asr_tpu.models.transformer import (dims_from_config,
                                                    init_transformer)
    from end2end_asr_tpu.training.optimizer import init_adam_state
    from end2end_asr_tpu.training.steps import make_train_step

    cfg = _flagship_cfg().replace(batch_size=BATCH)
    dims = dims_from_config(cfg)
    params, state = jax.jit(functools.partial(
        init_transformer, cfg=cfg, num_vocab=VOCAB))(jax.random.PRNGKey(0))
    opt_state = init_adam_state(params)

    pcm, n_frames, targets, tgt_lengths = _synthetic_batch(
        cfg, BATCH, T_FRAMES, U_TGT)
    targets = np.minimum(targets, VOCAB - 1).astype(np.int32)
    pcm, n_frames, targets, tgt_lengths = map(
        jax.device_put, (pcm, n_frames, targets, tgt_lengths))

    steps = {}
    for name, flag in (("off", False), ("on", True)):
        layers.FLASH_ATTN_ENABLED = flag
        # fresh jit cache per arm (make_train_step returns a new jit fn;
        # the flag is read at trace time inside mha)
        steps[name] = make_train_step(cfg, dims, from_pcm=True)

    def run(name, p, o, s, rng, n):
        layers.FLASH_ATTN_ENABLED = (name == "on")
        step = steps[name]
        for _ in range(n):
            rng, sub = jax.random.split(rng)
            p, o, s, m, _, _ = step(p, o, s, sub, pcm, n_frames,
                                    targets, tgt_lengths,
                                    spect_T=T_FRAMES)
        float(m["loss"])  # sync through the tunnel
        return p, o, s, rng

    rng = jax.random.PRNGKey(1)
    # compile + warm both arms
    for name in ("off", "on"):
        params, opt_state, state, rng = run(name, params, opt_state,
                                            state, rng, 3)
        print(name, "compiled", flush=True)

    for r in range(ROUNDS):
        for name in ("on", "off") if r % 2 else ("off", "on"):
            t0 = time.perf_counter()
            params, opt_state, state, rng = run(
                name, params, opt_state, state, rng, ITERS)
            ms = (time.perf_counter() - t0) / ITERS * 1e3
            print(f"round {r} {name}: {ms:.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
