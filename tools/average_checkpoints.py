#!/usr/bin/env python3
"""Average the parameters of N checkpoints into a new one.

Standard end-of-training polish for ASR transformers (uniform parameter
averaging over the last/best K epoch checkpoints typically buys a few
tenths of a CER point); the reference has no equivalent — its best_model
is a single epoch's weights. Works on both checkpoint formats this
framework writes (npz and orbax, auto-detected by load_checkpoint) and
emits an npz checkpoint that train.py/test.py --continue-from loads
directly.

    python tools/average_checkpoints.py out/avg \
        models/run/epoch_28 models/run/epoch_29 models/run/epoch_30

Metadata (config, labels, epoch) is taken from the LAST checkpoint
listed; optimizer state is dropped (an averaged Adam state is
meaningless — resume training from a real epoch checkpoint instead);
BatchNorm running stats are averaged with the weights (they are running
means/vars, so a uniform average of aligned stats is well-defined).
"""

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np


def average_trees(trees):
    """Uniform average over an iterable of pytrees. Streams: only the
    float64 running sums plus ONE tree's leaves are resident at a time
    (a flagship checkpoint is ~300 MB — K of them at once would swamp
    this small host)."""
    import jax
    it = iter(trees)
    first = next(it)
    leaves, treedef = jax.tree_util.tree_flatten(first)
    dtypes = [np.asarray(l).dtype for l in leaves]
    sums = [np.asarray(l, np.float64) for l in leaves]
    n = 1
    for tree in it:
        more, td = jax.tree_util.tree_flatten(tree)
        if td != treedef:
            raise ValueError(
                "checkpoints have different parameter structures "
                f"({td} vs {treedef}) — are they from the same run?")
        for i, l in enumerate(more):
            sums[i] += np.asarray(l, np.float64)
        n += 1
    if n < 2:
        raise ValueError("need at least 2 checkpoints")
    return jax.tree_util.tree_unflatten(
        treedef, [(s / n).astype(dt) for s, dt in zip(sums, dtypes)])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out", help="output checkpoint base path (no ext)")
    ap.add_argument("checkpoints", nargs="+",
                    help="2+ checkpoint base paths to average")
    args = ap.parse_args()
    if len(args.checkpoints) < 2:
        ap.error("need at least 2 checkpoints")

    import jax
    jax.config.update("jax_platforms", "cpu")  # pure host-side tree math

    from end2end_asr_tpu.training.checkpoint import (load_checkpoint,
                                                     save_checkpoint)

    meta = {}

    def stream():
        # one checkpoint resident at a time; metadata kept from the
        # LAST one (matching the docstring contract)
        for p in args.checkpoints:
            cfg, epoch, params, _, st, label2id, id2label, m = \
                load_checkpoint(p)
            meta.update(cfg=cfg, epoch=epoch, label2id=label2id,
                        id2label=id2label, metrics=m)
            yield {"params": params, "state": st or {}}

    avg = average_trees(stream())
    save_checkpoint(args.out, meta["cfg"], meta["epoch"], avg["params"],
                    None, avg["state"], meta["label2id"],
                    meta["id2label"],
                    {**(meta["metrics"] or {}),
                     "averaged_from": list(args.checkpoints)})
    print(f"averaged {len(args.checkpoints)} checkpoints -> "
          f"{args.out}.npz")


if __name__ == "__main__":
    main()
