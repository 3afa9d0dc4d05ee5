#!/usr/bin/env python3
"""Evaluation CLI — drop-in for the reference's test.py (same flags).

Reference: test.py:65-97. Loads the checkpoint named by --continue-from,
rebuilds the feature config FROM THE CHECKPOINT (test.py:78-84), builds the
test loader from --test-manifest-list, optionally loads the rescoring LM,
and runs batch evaluation (greedy or --beam-search)."""

import logging
import sys

from end2end_asr_tpu.utils.platform import (enable_compilation_cache,
                                             honor_env_platform)

honor_env_platform()
enable_compilation_cache()

from end2end_asr_tpu.config import config_from_args
from end2end_asr_tpu.data.dataset import ManifestDataset
from end2end_asr_tpu.data.loader import AudioBatchLoader, BucketingSampler
from end2end_asr_tpu.evaluation import evaluate
from end2end_asr_tpu.training.checkpoint import load_checkpoint


def main(argv=None):
    cli = config_from_args(argv)
    if not cli.continue_from:
        print("need --continue-from checkpoint")
        sys.exit(1)

    logging.basicConfig(stream=sys.stdout,
                        format="%(asctime)s - %(message)s",
                        level=logging.INFO)

    (cfg, epoch, params, opt_state, model_state, label2id,
     id2label) = load_checkpoint(cli.continue_from)[:7]
    # feature + model config from the checkpoint; decode/search +
    # manifests from the CLI (test.py:78-89), plus any other flag the
    # user explicitly typed (resume semantics shared with train.py)
    from end2end_asr_tpu.config import ARCH_FIELDS, explicit_cli_overrides
    overrides = {k: getattr(cli, k)
                 for k in explicit_cli_overrides(argv)
                 if k not in ARCH_FIELDS}
    overrides.update(
        test_manifest_list=cli.test_manifest_list,
        batch_size=cli.batch_size, beam_search=cli.beam_search,
        beam_width=cli.beam_width, beam_nbest=cli.beam_nbest,
        lm_rescoring=cli.lm_rescoring, lm_path=cli.lm_path,
        lm_weight=cli.lm_weight, c_weight=cli.c_weight,
        lm_greedy_as_beam=cli.lm_greedy_as_beam,
        decode_max_len=cli.decode_max_len,
        decode_stage_len=cli.decode_stage_len,
        verbose=cli.verbose, continue_from=cli.continue_from)
    cfg = cfg.replace(**overrides)

    if cfg.quantize_int8:
        from end2end_asr_tpu.models.quantize import quantize_for_inference
        params = quantize_for_inference(params)

    test_data = ManifestDataset(list(cfg.test_manifest_list), label2id,
                                sample_rate=cfg.sample_rate)
    test_loader = AudioBatchLoader(
        test_data, cfg,
        sampler=BucketingSampler(len(test_data), cfg.batch_size,
                                 seed=cfg.seed))

    lm = None
    if cfg.lm_rescoring:
        from end2end_asr_tpu.models.lm import LM
        lm = LM(cfg.lm_path)

    mesh = None
    if cli.parallel:
        from end2end_asr_tpu.parallel.mesh import (check_divisible,
                                                   make_mesh)
        if cli.mesh_model > 1:
            # tensor-parallel inference: attention/FFN weights shard on
            # the model axis (evaluation.py places them via parallel/tp)
            from end2end_asr_tpu.parallel.tp import (check_tp_divisibility,
                                                     make_mesh_2d)
            check_tp_divisibility(cfg, cli.mesh_model)
            mesh = make_mesh_2d(cli.mesh_model, cli.mesh_data)
        else:
            mesh = make_mesh(cli.mesh_data)
        check_divisible(cfg.batch_size, mesh)
        # ragged final bins can't shard on 'data' — pad by cycling;
        # evaluate() trims the duplicates via Batch.real_rows
        test_loader.pad_to_full = True

    if getattr(cfg, "seq_parallel", False) and mesh is not None \
            and cli.mesh_model > 1:
        from end2end_asr_tpu.parallel import sp
        sp.install(mesh)

    results = evaluate(params, model_state, cfg, test_loader, id2label,
                       lm=lm, verbose=cfg.verbose, mesh=mesh)
    print("TEST CER:{:.2f}% WER:{:.2f}% CER_EN:{:.2f}% CER_ZH:{:.2f}%".format(
        results["cer"], results["wer"], results["cer_en"],
        results["cer_zh"]))


if __name__ == "__main__":
    main()
