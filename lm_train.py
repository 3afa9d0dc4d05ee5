#!/usr/bin/env python3
"""Train the word-level LSTM LM used for beam rescoring.

Working replacement for the reference's broken LM tooling
(utils/lm_functions.py imports a nonexistent module; utils/
lm_data_loader.py has no training script). Trains the JAX LSTM
(models/lm.py) on transcripts from ASR manifests and saves an .npz the
rescorer (models.lm.LM / --lm-path) loads directly.

Usage:
  python lm_train.py --train-manifest-list m1.csv m2.csv \
      --lm-path lm.npz --epochs 10 --lr 1e-3
"""

import argparse
import functools
import logging
import sys

import numpy as np

from end2end_asr_tpu.utils.platform import (enable_compilation_cache,
                                             honor_env_platform)

honor_env_platform()
enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from end2end_asr_tpu.data.lm_loader import (batchify, bptt_batches,
                                            build_word_vocab,
                                            corpus_from_manifests)  # noqa: E402
from end2end_asr_tpu.models.lm import (init_lstm_params, lstm_forward_batch,
                                       save_npz_lm)  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser(description="LSTM LM training")
    ap.add_argument("--train-manifest-list", nargs="+", required=True)
    ap.add_argument("--lm-path", default="lm.npz")
    ap.add_argument("--ninp", type=int, default=256)
    ap.add_argument("--nhid", type=int, default=256)
    ap.add_argument("--nlayers", type=int, default=2)
    ap.add_argument("--tie-weights", action="store_true")
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--bptt", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--min-count", type=int, default=1)
    ap.add_argument("--seed", type=int, default=123456)
    args = ap.parse_args(argv)
    if args.tie_weights and args.ninp != args.nhid:
        # fail before the (possibly minutes-long) corpus scan
        ap.error(f"--tie-weights requires --ninp == --nhid "
                 f"(got {args.ninp} vs {args.nhid})")

    logging.basicConfig(stream=sys.stdout, level=logging.INFO,
                        format="%(asctime)s - %(message)s")
    log = logging.getLogger("lm_train")

    sents = corpus_from_manifests(args.train_manifest_list)
    word2idx = build_word_vocab(sents, args.min_count)
    stream = batchify(sents, word2idx, args.batch_size)
    log.info("corpus: %d sentences, vocab %d, stream %s",
             len(sents), len(word2idx), stream.shape)
    params = init_lstm_params(jax.random.PRNGKey(args.seed), len(word2idx),
                              args.ninp, args.nhid, args.nlayers,
                              args.tie_weights)
    from end2end_asr_tpu.training.optimizer import init_adam_state
    opt = init_adam_state(params)
    lr = args.lr

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt, inputs, targets):
        def loss_fn(p):
            logits = lstm_forward_batch(p, inputs)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            ll = jnp.take_along_axis(logp, targets[..., None], axis=-1)
            return -jnp.mean(ll)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        # plain Adam at fixed lr (bias-corrected, torch semantics) —
        # shared update rule (training/optimizer.py adam_update)
        from end2end_asr_tpu.training.optimizer import adam_update
        new_params, new_opt = adam_update(params, grads, opt, lr)
        return new_params, new_opt, loss

    for epoch in range(args.epochs):
        total, n = 0.0, 0
        for inputs, targets in bptt_batches(stream, args.bptt):
            if inputs.shape[1] < 2:
                continue
            params, opt, loss = step(params, opt, jnp.asarray(inputs),
                                     jnp.asarray(targets))
            total += float(loss)
            n += 1
        if n == 0:
            raise ValueError(
                "corpus too small: no BPTT batch reached 2 columns — "
                f"need at least ~2x --batch-size ({args.batch_size}) "
                "words; lower --batch-size/--bptt or add manifests")
        log.info("epoch %d: loss %.4f ppl %.1f", epoch + 1, total / n,
                 float(np.exp(total / n)))

    save_npz_lm(args.lm_path, jax.tree_util.tree_map(np.asarray, params),
                word2idx)
    log.info("saved LM to %s", args.lm_path)


if __name__ == "__main__":
    main()
