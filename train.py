#!/usr/bin/env python3
"""Training CLI — drop-in for the reference's train.py (same flags).

Reference: train.py:20-116. Builds vocab (PAD/SOS/EOS prepended, duplicate
labels warned), datasets/loaders for train + each valid manifest, resumes
from --continue-from, then runs the Trainer. Logs to log/<name>.
"""

import functools
import json
import logging
import os
import sys

import jax
import jax.numpy as jnp

from end2end_asr_tpu.utils.platform import (enable_compilation_cache,
                                             honor_env_platform)

honor_env_platform()
enable_compilation_cache()

from end2end_asr_tpu.config import (ARCH_FIELDS, config_from_args,
                                    explicit_cli_overrides, load_vocab,
                                    resolve_labels_path)
from end2end_asr_tpu.data.dataset import ManifestDataset, NoiseInjector
from end2end_asr_tpu.data.loader import AudioBatchLoader, BucketingSampler
from end2end_asr_tpu.models.transformer import init_transformer
from end2end_asr_tpu.parallel.mesh import (check_divisible, make_mesh,
                                           maybe_initialize_distributed)
from end2end_asr_tpu.training.checkpoint import load_checkpoint
from end2end_asr_tpu.training.optimizer import init_opt_state
from end2end_asr_tpu.training.trainer import Trainer
from end2end_asr_tpu.utils.logger import Logger as StdoutTee


def main(argv=None, trainer_cls=Trainer):
    maybe_initialize_distributed()  # multi-host no-op unless cluster env
    cfg = config_from_args(argv)
    try:
        jax.config.update("jax_default_prng_impl", cfg.rng_impl)
    except Exception:
        pass  # keys already created (e.g. library use) — keep default
    print("=" * 50)
    print("THE EXPERIMENT LOG IS SAVED IN: log/" + cfg.name)
    print("TRAINING MANIFEST: ", list(cfg.train_manifest_list))
    print("VALID MANIFEST: ", list(cfg.valid_manifest_list))
    print("TEST MANIFEST: ", list(cfg.test_manifest_list))
    print("=" * 50)

    os.makedirs("log", exist_ok=True)
    # append on resume — truncating would wipe the very history the
    # preemption-recovery feature exists to preserve
    resuming = bool(cfg.continue_from or cfg.auto_resume)
    logging.basicConfig(filename="log/" + cfg.name,
                        filemode="a" if resuming else "w+",
                        format="%(asctime)s - %(message)s",
                        level=logging.INFO)
    logger = logging.getLogger("end2end_asr_tpu")
    logger.setLevel(logging.INFO)
    # tee stdout into log/<name>.stdout so the console history of
    # (auto-resumed) runs is preserved (utils/logger.py)
    sys.stdout = StdoutTee("log/" + cfg.name + ".stdout")

    start_epoch = 0
    metrics = None
    if cfg.auto_resume and not cfg.continue_from:
        # preemption recovery (TPU-native nicety): resume from the newest
        # checkpoint of this run if one exists
        from end2end_asr_tpu.training.checkpoint import find_latest_checkpoint
        latest = find_latest_checkpoint(cfg.save_folder, cfg.name)
        if latest:
            print("AUTO-RESUME from", latest)
            cfg = cfg.replace(continue_from=latest)
    if cfg.continue_from:
        logger.info("Continue from checkpoint: %s", cfg.continue_from)
        (ckpt_cfg, epoch, params, opt_state, model_state, label2id,
         id2label, metrics) = load_checkpoint(cfg.continue_from)
        if opt_state is None:
            # converted reference .th checkpoints carry only the Noam
            # scalar step (functions.py:86-94) — rebuild fresh moments
            # and seed the step so the LR schedule continues
            opt_state = init_opt_state(ckpt_cfg, params)
            opt_state["step"] = jnp.asarray(
                int(metrics.get("noam_step", 0)), jnp.int32)
            logger.info("No optimizer state in checkpoint; reinitialized "
                        "optimizer moments at noam_step=%d",
                        int(opt_state["step"]))
        # architecture/features come from the checkpoint
        # (functions.py:72-78); any OTHER flag the user explicitly typed
        # on THIS command line overrides the checkpoint (resuming with
        # --grad-accum 4 or --parallel --mesh-model 2 must be honored),
        # and run identity/manifests always follow the CLI
        overrides = {k: getattr(cfg, k)
                     for k in explicit_cli_overrides(argv)
                     if k not in ARCH_FIELDS}
        overrides.update(
            train_manifest_list=cfg.train_manifest_list,
            valid_manifest_list=cfg.valid_manifest_list,
            test_manifest_list=cfg.test_manifest_list,
            epochs=cfg.epochs, name=cfg.name, save_folder=cfg.save_folder,
            batch_size=cfg.batch_size, parallel=cfg.parallel,
            shuffle=cfg.shuffle, continue_from=cfg.continue_from)
        cfg = ckpt_cfg.replace(**overrides)
        start_epoch = epoch
    else:
        label2id, id2label = load_vocab(cfg.labels_path)
        # duplicate-label warning parity (train.py:56-57)
        with open(resolve_labels_path(cfg.labels_path), encoding="utf-8") as f:
            raw = str("".join(json.load(f)))
        seen = set()
        for ch in raw:
            if ch in seen:
                print("multiple label: ", ch)
            seen.add(ch)
        if cfg.model not in ("TRFS", "LRTRFS"):
            logger.info("The model is not supported, check args --h")
            sys.exit(1)
        params, model_state = jax.jit(functools.partial(
            init_transformer, cfg=cfg, num_vocab=len(label2id)))(
                jax.random.PRNGKey(cfg.seed))
        opt_state = init_opt_state(cfg, params)

    noise = (NoiseInjector(cfg.noise_dir, cfg.sample_rate,
                           (cfg.noise_min, cfg.noise_max))
             if cfg.noise_dir else None)
    train_data = ManifestDataset(
        list(cfg.train_manifest_list), label2id,
        sample_rate=cfg.sample_rate, augment=cfg.augment,
        noise_injector=noise, noise_prob=cfg.noise_prob)
    # multi-host: every process runs the same sampler but feeds only its
    # local slice of each batch (parallel/mesh.py put_sharded)
    pidx, pcnt = jax.process_index(), jax.process_count()
    train_loader = AudioBatchLoader(
        train_data, cfg,
        sampler=BucketingSampler(len(train_data), cfg.batch_size,
                                 seed=cfg.seed),
        process_index=pidx, process_count=pcnt)

    valid_loader_list = []
    for m in cfg.valid_manifest_list:
        vd = ManifestDataset([m], label2id, sample_rate=cfg.sample_rate)
        valid_loader_list.append(AudioBatchLoader(
            vd, cfg, process_index=pidx, process_count=pcnt))

    mesh = None
    if cfg.parallel:
        if cfg.mesh_pipe > 1:
            from end2end_asr_tpu.parallel import pp
            from end2end_asr_tpu.parallel.tp import check_tp_divisibility
            pp.check_pp_divisibility(cfg, cfg.mesh_pipe)
            check_tp_divisibility(cfg, cfg.mesh_model)
            mesh = pp.make_mesh_pipe(cfg.mesh_pipe, cfg.mesh_model,
                                     cfg.mesh_data)
            n_micro = cfg.pipe_microbatches or cfg.mesh_pipe
            per_dev = cfg.batch_size // mesh.shape["data"]
            if (per_dev // max(1, cfg.grad_accum)) % n_micro != 0:
                raise SystemExit(
                    f"--pipe-microbatches {n_micro} must divide the "
                    f"per-device microbatch "
                    f"{per_dev}//{max(1, cfg.grad_accum)} (interleaved "
                    f"split stays batch-sharded only then)")
            pp.install(mesh, n_micro)
            logger.info("pipeline mesh: %s (%d microbatches)", mesh,
                        n_micro)
        elif cfg.mesh_model > 1:
            from end2end_asr_tpu.parallel.tp import (check_tp_divisibility,
                                                     make_mesh_2d)
            check_tp_divisibility(cfg, cfg.mesh_model)
            mesh = make_mesh_2d(cfg.mesh_model, cfg.mesh_data)
            logger.info("data x model mesh: %s", mesh)
        else:
            mesh = make_mesh(cfg.mesh_data)
            logger.info("data-parallel mesh: %s", mesh)
        check_divisible(cfg.batch_size, mesh, grad_accum=cfg.grad_accum)
        # ragged final bins (len(dataset) % batch_size) can't shard on
        # the 'data' axis — pad them to the full batch by cycling rows
        # (Batch.real_rows marks the real prefix; metrics trim it)
        train_loader.pad_to_full = True
        for vl in valid_loader_list:
            vl.pad_to_full = True
    elif cfg.mesh_pipe > 1:
        raise SystemExit("--mesh-pipe requires --parallel")

    if cfg.quantize_int8:
        raise SystemExit("--quantize-int8 is eval-only "
                         "(test.py/transcribe.py); training runs f32 "
                         "master weights")

    if cfg.seq_parallel:
        if mesh is None or cfg.mesh_model <= 1:
            raise SystemExit("--seq-parallel requires --parallel "
                             "--mesh-model N (N > 1): it shards the "
                             "encoder time axis across the 'model' axis")
        if cfg.mesh_pipe > 1:
            raise SystemExit(
                "--seq-parallel does not compose with --mesh-pipe: the "
                "pipeline's microbatch activations are already 1/M "
                "size, and SP's time-axis constraints inside the "
                "pipelined region are untested — pick one")
        from end2end_asr_tpu.parallel import sp
        sp.install(mesh)
        logger.info("sequence parallelism ON (encoder T sharded over "
                    "%d-way 'model' axis)", cfg.mesh_model)

    if cfg.zero1 or cfg.fsdp:
        if mesh is None:
            raise SystemExit("--zero1/--fsdp require --parallel: they "
                             "shard optimizer moments (and, for --fsdp, "
                             "parameters) over the 'data' mesh axis")
        from end2end_asr_tpu.parallel import zero
        zero.install(mesh, stage=3 if cfg.fsdp else 1)
        logger.info("ZeRO-%d ON: %.0f%% of optimizer-moment elements "
                    "shard over the %d-way 'data' axis%s",
                    3 if cfg.fsdp else 1,
                    100 * zero.coverage(params, mesh),
                    mesh.shape["data"],
                    " (+ params, FSDP)" if cfg.fsdp else "")

    trainer = trainer_cls(cfg, label2id, id2label,
                          metrics_every=cfg.metrics_every)
    trainer.mesh = mesh
    trainer.train(params, opt_state, model_state, train_loader,
                  valid_loader_list, start_epoch=start_epoch,
                  num_epochs=cfg.epochs, last_metrics=metrics)


if __name__ == "__main__":
    main()
