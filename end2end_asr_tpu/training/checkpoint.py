"""Checkpoint save/load.

Same logical contents as the reference's torch.save dict
(utils/functions.py:11-59): vocab maps, full run config, epoch,
model params, optimizer state (including Noam scalars _step/_rate/warmup/
factor/model_size or lr/lr_anneal), and the metrics history — stored as
`<name>.npz` (flattened param/opt pytrees) + `<name>.json` (everything
else). Layout on disk matches the reference:
  <save_folder>/<name>/epoch_<N>  and  <save_folder>/<name>/best_model
(reference uses .th; we use .npz/.json pairs).

A converter for the reference's torch .th checkpoints lives in
tools/convert_reference_checkpoint.py.

Formats: the default `npz` pair above, or `orbax` (--checkpoint-format
orbax): pytrees stored through orbax.checkpoint's StandardCheckpointer
in `<base>.orbax/` with the same `<base>.json` meta sidecar. Orbax
writes each process's addressable shards directly (multi-host safe, no
gather-to-host-0) and restores with the arrays' current shardings —
the right format on pods or at very large vocab/model sizes. Loading
auto-detects the format, so checkpoints of either kind are drop-in for
--continue-from / --auto-resume / test.py.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from end2end_asr_tpu.config import Config

SEP = "::"


def flatten_tree(tree, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_tree(v, f"{prefix}{k}{SEP}"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(flatten_tree(v, f"{prefix}{i}{SEP}"))
    elif tree is None:
        pass
    else:
        out[prefix[:-len(SEP)]] = np.asarray(tree)
    return out


def unflatten_tree(flat: Dict[str, np.ndarray]):
    root: Dict = {}
    for key, val in flat.items():
        parts = key.split(SEP)
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val)

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def find_latest_checkpoint(save_folder: str, name: str) -> Optional[str]:
    """Newest epoch_N checkpoint base path under <save_folder>/<name>,
    or None. Used by train.py --auto-resume (preemption recovery)."""
    import re
    d = os.path.join(save_folder, name)
    if not os.path.isdir(d):
        return None
    best, best_epoch = None, -1
    for f in os.listdir(d):
        m = re.fullmatch(r"epoch_(\d+)\.json", f)
        if m and (os.path.exists(os.path.join(d, f[:-5] + ".npz"))
                  or os.path.isdir(os.path.join(d, f[:-5] + ".orbax"))):
            e = int(m.group(1))
            if e > best_epoch:
                best_epoch = e
                best = os.path.join(d, f[:-5])
    return best


def checkpoint_paths(save_folder: str, name: str, epoch: Optional[int],
                     best: bool) -> str:
    d = os.path.join(save_folder, name)
    base = "best_model" if best else f"epoch_{epoch}"
    return os.path.join(d, base)


def save_checkpoint(base_path: str, cfg: Config, epoch: int,
                    params, opt_state, model_state,
                    label2id: Dict[str, int], id2label: Dict[int, str],
                    metrics: Optional[Dict] = None,
                    fmt: str = "npz") -> None:
    d = os.path.dirname(base_path)
    if d:  # bare filenames in the cwd have no directory to create
        os.makedirs(d, exist_ok=True)
    if fmt == "orbax":
        # meta is tiny host JSON: write it ONCE (process 0) and BEFORE
        # the orbax save — the save is a collective barrier across the
        # cluster, so any process that finishes save_checkpoint can
        # immediately load_checkpoint (which reads meta first). This is
        # the multi-host configuration orbax exists for (sharded arrays
        # whose shards live on different hosts — np.savez can't see
        # non-addressable shards at all).
        import jax
        if jax.process_index() == 0:
            _write_meta(base_path, cfg, epoch, label2id, id2label, metrics)
        _save_orbax(base_path, params, opt_state, model_state)
        return
    arrays = {}
    arrays.update({"params" + SEP + k: v
                   for k, v in flatten_tree(params).items()})
    arrays.update({"opt" + SEP + k: v
                   for k, v in flatten_tree(opt_state).items()})
    arrays.update({"state" + SEP + k: v
                   for k, v in flatten_tree(model_state or {}).items()})
    # np.savez writes ml_dtypes bfloat16 as raw void '|V2', which
    # np.load returns as un-loadable voids (crashing --auto-resume for
    # --adam-moments-dtype bfloat16 runs). Store those leaves as uint16
    # bit patterns and record the keys so load restores the dtype.
    import ml_dtypes
    bf16 = np.dtype(ml_dtypes.bfloat16)
    bf16_keys = sorted(k for k, v in arrays.items() if v.dtype == bf16)
    for k in bf16_keys:
        arrays[k] = arrays[k].view(np.uint16)
    np.savez(base_path + ".npz", **arrays)
    _write_meta(base_path, cfg, epoch, label2id, id2label, metrics,
                bf16_keys=bf16_keys)


def _write_meta(base_path, cfg, epoch, label2id, id2label, metrics,
                bf16_keys=None):
    meta = {
        "args": cfg.to_dict(),
        "epoch": epoch,
        "label2id": label2id,
        "id2label": {str(k): v for k, v in id2label.items()},
        "metrics": metrics or {},
        "format_version": 1,
    }
    if bf16_keys:
        meta["bf16_keys"] = list(bf16_keys)
    with open(base_path + ".json", "w", encoding="utf-8") as f:
        json.dump(meta, f, ensure_ascii=False)


def _save_orbax(base_path: str, params, opt_state, model_state) -> None:
    import orbax.checkpoint as ocp
    path = os.path.abspath(base_path + ".orbax")
    tree = {"params": params, "opt": opt_state or {},
            "state": model_state or {}}
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)


def _load_orbax(base_path: str):
    import orbax.checkpoint as ocp
    path = os.path.abspath(base_path + ".orbax")
    with ocp.StandardCheckpointer() as ckptr:
        tree = ckptr.restore(path)
    params = tree.get("params")
    opt_state = tree.get("opt") or None
    model_state = tree.get("state") or {}
    return params, opt_state, model_state


def load_checkpoint(base_path: str):
    """Returns (cfg, epoch, params, opt_state, model_state, label2id,
    id2label, metrics). Accepts the path with or without extension."""
    if (base_path.endswith(".npz") or base_path.endswith(".json")
            or base_path.endswith(".orbax")):
        base_path = base_path.rsplit(".", 1)[0]
    with open(base_path + ".json", encoding="utf-8") as f:
        meta = json.load(f)
    if os.path.isdir(base_path + ".orbax"):
        params, opt_state, model_state = _load_orbax(base_path)
    else:
        data = np.load(base_path + ".npz")
        bf16_keys = set(meta.get("bf16_keys", ()))
        if bf16_keys:
            import ml_dtypes
        groups: Dict[str, Dict[str, np.ndarray]] = {
            "params": {}, "opt": {}, "state": {}}
        for key in data.files:
            g, rest = key.split(SEP, 1)
            arr = data[key]
            if key in bf16_keys:  # stored as uint16 bit patterns
                arr = arr.view(ml_dtypes.bfloat16)
            groups[g][rest] = arr
        params = unflatten_tree(groups["params"])
        opt_state = unflatten_tree(groups["opt"]) if groups["opt"] else None
        model_state = (unflatten_tree(groups["state"])
                       if groups["state"] else {})
    cfg = Config.from_dict(meta["args"])
    label2id = meta["label2id"]
    id2label = {int(k): v for k, v in meta["id2label"].items()}
    return (cfg, meta["epoch"], params, opt_state, model_state,
            label2id, id2label, meta.get("metrics", {}))
