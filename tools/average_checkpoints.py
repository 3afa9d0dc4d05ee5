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
    import jax
    flat = [jax.tree_util.tree_flatten(t) for t in trees]
    treedef = flat[0][1]
    for _, td in flat[1:]:
        if td != treedef:
            raise ValueError(
                "checkpoints have different parameter structures "
                f"({td} vs {treedef}) — are they from the same run?")
    n = float(len(trees))
    leaves = [
        np.sum([np.asarray(f[0][i], np.float64) for f in flat], axis=0)
        / n for i in range(len(flat[0][0]))]
    return jax.tree_util.tree_unflatten(
        treedef, [l.astype(np.asarray(orig).dtype)
                  for l, orig in zip(leaves, flat[0][0])])


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

    loaded = [load_checkpoint(p) for p in args.checkpoints]
    cfg, epoch, _, _, _, label2id, id2label, metrics = loaded[-1]
    params = average_trees([l[2] for l in loaded])
    states = [l[4] for l in loaded]
    model_state = average_trees(states) if all(states) else states[-1]

    save_checkpoint(args.out, cfg, epoch, params, None, model_state,
                    label2id, id2label,
                    {**(metrics or {}),
                     "averaged_from": list(args.checkpoints)})
    print(f"averaged {len(loaded)} checkpoints -> {args.out}.npz")


if __name__ == "__main__":
    main()
