"""Training loop.

Behavioral contract with trainer/asr/trainer.py:21-213 of the reference:
epoch loop → jitted batch step (steps.py) → running train loss/CER/WER/LR
logging → per-epoch eval over every valid loader (teacher-forced loss +
CER) → metrics history → checkpoint every `save_every` epochs + best-on-
valid-loss → optional sampler shuffle.

Differences (TPU-first, documented):
  * the whole batch step (features→forward→loss→backward→update) is one
    donated XLA program per bucket shape — no per-batch Python in the
    device path;
  * train-CER decode happens on host from the returned argmax ids, like
    the reference (trainer.py:60-104), but can be throttled with
    `metrics_every` since it is pure logging overhead;
  * step-time and utterances/sec/chip counters (SURVEY.md §5.1).
"""

from __future__ import annotations

import contextlib
import logging
import sys
import time
from typing import Dict, List, Optional

import jax
import numpy as np

from end2end_asr_tpu.config import (Config, EOS_CHAR, PAD_TOKEN, SOS_CHAR)
from end2end_asr_tpu.data.loader import AudioBatchLoader, Batch, Prefetcher
from end2end_asr_tpu.models.transformer import dims_from_config
from end2end_asr_tpu.training import checkpoint as ckpt
from end2end_asr_tpu.training.steps import make_eval_step, make_train_step
from end2end_asr_tpu.utils.metrics import calculate_cer, calculate_wer
from end2end_asr_tpu.utils.profiling import ThroughputMeter, trace

logger = logging.getLogger("end2end_asr_tpu")


def ids_to_string_until_pad(ids: np.ndarray, id2label: Dict[int, str]) -> str:
    """Token ids → string, stopping at the first PAD (trainer.py:62-75)."""
    s = ""
    for x in ids:
        if int(x) == PAD_TOKEN:
            break
        s += id2label.get(int(x), "")
    return s


def strip_specials(s: str) -> str:
    return s.replace(SOS_CHAR, "").replace(EOS_CHAR, "")


class Trainer:
    def __init__(self, cfg: Config, label2id: Dict[str, int],
                 id2label: Dict[int, str], metrics_every: int = 1,
                 mesh=None):
        self.cfg = cfg
        self.label2id = label2id
        self.id2label = id2label
        self.dims = dims_from_config(cfg)
        self.metrics_every = max(1, metrics_every)
        # data-parallel mesh (parallel/mesh.py) — replaces --parallel/
        # nn.DataParallel; params replicate, batches shard on 'data'
        self.mesh = mesh
        logger.info("Trainer is initialized")

    # ------------------------------------------------------------------
    def _batch_arrays(self, batch: Batch):
        if batch.pcm is not None:
            arr = batch.pcm
            from_pcm = True
        else:
            arr = batch.spect
            from_pcm = False
        return from_pcm, arr

    def _put_batch(self, *arrays):
        """Place batch-leading arrays sharded on 'data' under a mesh;
        multi-host processes each contribute their local shard
        (parallel.mesh.put_sharded)."""
        if self.mesh is None:
            return arrays
        from end2end_asr_tpu.parallel.mesh import batch_sharded, put_sharded
        return tuple(
            put_sharded(a, batch_sharded(self.mesh, np.ndim(a)))
            for a in arrays)

    def _replicate(self, tree):
        if self.mesh is None:
            return tree
        from end2end_asr_tpu.parallel.mesh import replicated
        sharding = replicated(self.mesh)
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), tree)

    def _place_model(self, params, opt_state, model_state):
        """Params/opt-state placement under the mesh: replicated on a 1-D
        data mesh; attention/FFN weights (and their Adam moments) sharded
        on the 'model' axis of a 2-D mesh (parallel/tp.py)."""
        if self.mesh is None:
            return params, opt_state, model_state
        from end2end_asr_tpu.parallel import zero
        from end2end_asr_tpu.parallel.tp import (mesh_model_size,
                                                 shard_opt_state,
                                                 shard_params)
        if zero.active():
            # ZeRO: moments shard over 'data' (+ any TP axes); at
            # stage 3 (FSDP) the params do too
            place_p = (zero.shard_params_fsdp if zero.stage() >= 3
                       else shard_params)
            return (place_p(self.mesh, params),
                    zero.shard_opt_state(self.mesh, opt_state, params),
                    self._replicate(model_state))
        if mesh_model_size(self.mesh) <= 1:
            return (self._replicate(params), self._replicate(opt_state),
                    self._replicate(model_state))
        return (shard_params(self.mesh, params),
                shard_opt_state(self.mesh, opt_state, params),
                self._replicate(model_state))

    def _accumulate_cer(self, hyp_seq, gold_seq, totals: Dict) -> None:
        for hyp_row, gold_row in zip(np.asarray(hyp_seq), np.asarray(gold_seq)):
            hyp = strip_specials(
                ids_to_string_until_pad(hyp_row, self.id2label))
            gold = strip_specials(
                ids_to_string_until_pad(gold_row, self.id2label))
            totals["cer"] += calculate_cer(hyp.replace(" ", ""),
                                           gold.replace(" ", ""))
            totals["wer"] += calculate_wer(hyp, gold)
            totals["char"] += len(gold.replace(" ", ""))
            totals["word"] += len(gold.split(" "))

    # ------------------------------------------------------------------
    # Validation hooks (overridden by MultiTrainer)
    def _log_valid(self, epoch: int, ind: int, vloss: float,
                   cer_pct: float) -> None:
        logger.info("VALID SET %d LOSS:%.4f CER:%.2f%%", ind, vloss,
                    cer_pct)

    def _best_valid_loss_key(self, valid_losses: List[float]) -> float:
        # reference quirk preserved DELIBERATELY: the best-model decision
        # and metrics['valid_loss'] key off the LAST valid loader only —
        # trainer/asr/trainer.py:189-208 leaks the loop variable
        # `valid_loss` out of `for valid_loader in valid_loader_list`.
        # Covered by tests/test_trainer_multivalid.py.
        return valid_losses[-1] if valid_losses else 0.0

    def _extend_metrics(self, metrics: Dict,
                        valid_losses: List[float]) -> None:
        pass

    # ------------------------------------------------------------------
    def train(self, params, opt_state, model_state,
              train_loader: AudioBatchLoader,
              valid_loader_list: List[AudioBatchLoader],
              start_epoch: int = 0,
              num_epochs: Optional[int] = None,
              last_metrics: Optional[Dict] = None,
              prefetch: bool = True):
        cfg = self.cfg
        num_epochs = num_epochs if num_epochs is not None else cfg.epochs
        history: List[Dict] = list(
            (last_metrics or {}).get("history", []))
        best_valid_loss = (last_metrics or {}).get("valid_loss", 1e9)
        rng = jax.random.PRNGKey(cfg.seed)
        params, opt_state, model_state = self._place_model(
            params, opt_state, model_state)

        train_step = None  # built lazily on first batch (pcm vs spect)
        eval_step = None
        # --steps-per-dispatch state lives at train() scope like
        # train_step: the jitted multi-step program (and the from_pcm
        # flag it was built with) must survive across epochs, or every
        # epoch would retrace + remote-recompile the K-step grad program
        steps_k = max(1, getattr(cfg, "steps_per_dispatch", 1))
        multi_step = None
        fp_flag = False
        group: List = []   # entries buffered for one dispatch

        metrics: Dict = {}
        for epoch in range(start_epoch, num_epochs):
            sys.stdout.flush()
            totals = {"loss": 0.0, "cer": 0, "wer": 0, "char": 1e-9,
                      "word": 1e-9, "batches": 0}
            meter = ThroughputMeter()  # step-time/utt/audio-s counters
            logger.info("TRAIN")
            epoch_start = time.time()
            lr = 0.0

            # Deferred metrics: host reads block on the device (and, on
            # this image, pay a tunnel round trip), so metric pulls trail
            # the dispatched step by `depth` chunks — the device pipeline
            # never stalls on logging. A chunk is one dispatch: a single
            # batch, or K stacked batches under --steps-per-dispatch
            # (whose metrics arrive in ONE device_get for all K).
            pending = []

            def drain(chunk):
                nonlocal lr
                metas, ms, hyps, golds = chunk
                ms, hyps, golds = jax.device_get((ms, hyps, golds))
                stacked = len(metas) > 1
                for j, (idx, n_utts, secs) in enumerate(metas):
                    m = ({k: v[j] for k, v in ms.items()} if stacked
                         else ms)
                    hyp_seq = hyps[j] if stacked else hyps
                    gold_seq = golds[j] if stacked else golds
                    # the step returns the current schedule rate even for
                    # skipped batches (skip_lr) — refresh before the
                    # finite check so logs never show a stale LR
                    lr = float(m["lr"])
                    if not bool(m["finite"]):
                        # skip the batch entirely before any accumulation,
                        # matching the reference's `continue`
                        # (trainer.py:87-90)
                        logger.info("Found infinity loss, masking")
                        continue
                    totals["loss"] += float(m["loss"])
                    totals["batches"] += 1
                    meter.stop(n_utts, secs)
                    meter.start()
                    if idx % self.metrics_every == 0:
                        self._accumulate_cer(hyp_seq[:n_utts],
                                             gold_seq[:n_utts], totals)
                    if idx % 20 == 0:
                        logger.info(
                            "(Epoch %d) it %d TRAIN LOSS:%.4f CER:%.2f%% "
                            "LR:%.7f utt/s:%.1f", epoch + 1, idx,
                            totals["loss"] / max(totals["batches"], 1),
                            totals["cer"] * 100 / totals["char"], lr,
                            meter.utts_per_sec)

            if prefetch:
                shardings = None
                if self.mesh is not None:
                    from end2end_asr_tpu.parallel.mesh import batch_sharded
                    shardings = {
                        "pcm": batch_sharded(self.mesh, 2),
                        "spect": batch_sharded(self.mesh, 3),
                        "n_frames": batch_sharded(self.mesh, 1),
                        "targets": batch_sharded(self.mesh, 2),
                        "tgt_lengths": batch_sharded(self.mesh, 1),
                    }
                iterator = Prefetcher(train_loader, shardings=shardings)
            else:
                iterator = train_loader
            # --steps-per-dispatch K: buffer K consecutive same-shape
            # batches and run them as ONE scanned device program
            # (steps.py make_multi_train_step) — identical numerics,
            # 1/K the dispatch + metrics-pull overhead. Partial groups
            # (bucket change, epoch end) fall back to the single-step
            # program.
            def run_single(entry):
                nonlocal params, opt_state, model_state
                idx, sub, arr, nf, tg, tl, bucket, n_utts, secs = entry
                (params, opt_state, model_state, m, hyp_seq, gold_seq
                 ) = train_step(params, opt_state, model_state, sub,
                                arr, nf, tg, tl, spect_T=bucket)
                pending.append(([(idx, n_utts, secs)], m, hyp_seq,
                                gold_seq))

            def flush_group():
                nonlocal params, opt_state, model_state, multi_step
                if not group:
                    return
                entries = list(group)
                group.clear()
                if len(entries) < steps_k:
                    for e in entries:
                        run_single(e)
                    return
                if multi_step is None:
                    from end2end_asr_tpu.training.steps import \
                        make_multi_train_step
                    multi_step = make_multi_train_step(cfg, self.dims,
                                                       fp_flag)
                import jax.numpy as jnp
                subs, arrs, nfs, tgs, tls = (
                    jnp.stack([e[c] for e in entries])
                    for c in range(1, 6))
                if self.mesh is not None:
                    # jnp.stack of sharded batches emits an op-sharding
                    # the Pallas custom_partitioning can't unflatten;
                    # re-constrain to (step, batch-sharded) explicitly
                    from end2end_asr_tpu.parallel.mesh import \
                        stacked_batch_sharded
                    cons = lambda a: jax.device_put(
                        a, stacked_batch_sharded(self.mesh, a.ndim))
                    arrs, nfs, tgs, tls = map(cons, (arrs, nfs, tgs, tls))
                (params, opt_state, model_state, ms, hyps, golds
                 ) = multi_step(params, opt_state, model_state, subs,
                                arrs, nfs, tgs, tls,
                                spect_T=entries[0][6])
                pending.append(([(e[0], e[7], e[8]) for e in entries],
                                ms, hyps, golds))

            with contextlib.ExitStack() as stack:
                if cfg.trace_dir and epoch == start_epoch:
                    # --trace-dir: jax.profiler trace of the first epoch
                    stack.enter_context(trace(cfg.trace_dir))
                meter.start()
                group_key = None
                for i, batch in enumerate(iterator):
                    from_pcm, arr = self._batch_arrays(batch)
                    if train_step is None:
                        fp_flag = from_pcm
                        train_step = make_train_step(cfg, self.dims,
                                                     from_pcm)
                        eval_step = make_eval_step(cfg, self.dims, from_pcm)
                    rng, sub = jax.random.split(rng)
                    arr, n_frames, targets, tgt_lengths = self._put_batch(
                        arr, batch.n_frames, batch.targets,
                        batch.tgt_lengths)
                    # real (non-cycled-padding) rows — trims duplicate
                    # rows out of CER/throughput when the loader padded a
                    # ragged final bin for the mesh (loader.pad_to_full)
                    rr = (batch.real_rows if batch.real_rows > 0
                          else batch.targets.shape[0])
                    entry = (i, sub, arr, n_frames, targets, tgt_lengths,
                             batch.src_bucket, rr, batch.utt_seconds)
                    if steps_k > 1:
                        key = (batch.src_bucket, tuple(np.shape(arr)),
                               tuple(np.shape(targets)))
                        if group and key != group_key:
                            flush_group()
                        group_key = key
                        group.append(entry)
                        if len(group) == steps_k:
                            flush_group()
                    else:
                        run_single(entry)
                    while len(pending) > 2:
                        drain(pending.pop(0))
                flush_group()
                for chunk in pending:
                    drain(chunk)

            n_batches = max(totals["batches"], 1)
            train_loss = totals["loss"] / n_batches
            logger.info(
                "(Epoch %d) TRAIN LOSS:%.4f CER:%.2f%% LR:%.7f "
                "utt/s/chip:%.2f audio-RTFx:%.1f wall:%.1fs",
                epoch + 1, train_loss, totals["cer"] * 100 / totals["char"],
                lr, meter.utts_per_sec, meter.rtf_x,
                time.time() - epoch_start)

            # ---- validation (trainer.py:124-188) ----
            logger.info("VALID")
            valid_losses: List[float] = []
            valid_cer_total, valid_wer_total = 0, 0
            for ind, valid_loader in enumerate(valid_loader_list):
                vtot = {"loss": 0.0, "cer": 0, "wer": 0, "char": 1e-9,
                        "word": 1e-9, "batches": 0}
                # same deferred-drain pipeline as the train loop: the
                # device runs ahead while the host pulls the previous
                # batches' loss/argmax (one round-trip each on the
                # tunnel) and decodes CER strings
                vpend: List = []

                def vdrain(entry):
                    rr, dev = entry
                    loss, hyp_seq, gold_seq = jax.device_get(dev)
                    loss = float(loss)
                    if not np.isfinite(loss):
                        logger.info("Found infinity loss, masking")
                        return
                    vtot["loss"] += loss
                    vtot["batches"] += 1
                    self._accumulate_cer(hyp_seq[:rr], gold_seq[:rr],
                                         vtot)

                for batch in valid_loader:
                    from_pcm, arr = self._batch_arrays(batch)
                    if eval_step is None:
                        eval_step = make_eval_step(cfg, self.dims, from_pcm)
                    arr, n_frames, targets, tgt_lengths = self._put_batch(
                        arr, batch.n_frames, batch.targets,
                        batch.tgt_lengths)
                    vrr = (batch.real_rows if batch.real_rows > 0
                           else batch.targets.shape[0])
                    vpend.append((vrr, eval_step(
                        params, model_state, arr, n_frames,
                        targets, tgt_lengths,
                        spect_T=batch.src_bucket)))
                    if len(vpend) > 2:
                        vdrain(vpend.pop(0))
                for entry in vpend:
                    vdrain(entry)
                vloss = vtot["loss"] / max(vtot["batches"], 1)
                self._log_valid(epoch, ind,
                                vloss, vtot["cer"] * 100 / vtot["char"])
                valid_losses.append(vloss)
                valid_cer_total += vtot["cer"]
                valid_wer_total += vtot["wer"]

            valid_loss_key = self._best_valid_loss_key(valid_losses)
            metrics = {
                "train_loss": train_loss,
                "valid_loss": valid_loss_key,
                "train_cer": totals["cer"],
                "train_wer": totals["wer"],
                "valid_cer": valid_cer_total,
                "valid_wer": valid_wer_total,
                "history": history,
            }
            self._extend_metrics(metrics, valid_losses)
            history.append({k: v for k, v in metrics.items()
                            if k != "history"})

            if epoch % cfg.save_every == 0:
                base = ckpt.checkpoint_paths(cfg.save_folder, cfg.name,
                                             epoch + 1, best=False)
                logger.info("SAVE MODEL to %s", base)
                ckpt.save_checkpoint(base, cfg, epoch + 1, params, opt_state,
                                     model_state, self.label2id,
                                     self.id2label, metrics,
                                     fmt=cfg.checkpoint_format)

            if valid_loader_list and best_valid_loss > valid_loss_key:
                best_valid_loss = valid_loss_key
                base = ckpt.checkpoint_paths(cfg.save_folder, cfg.name,
                                             None, best=True)
                logger.info("SAVE BEST MODEL to %s", base)
                ckpt.save_checkpoint(base, cfg, epoch + 1, params, opt_state,
                                     model_state, self.label2id,
                                     self.id2label, metrics,
                                     fmt=cfg.checkpoint_format)

            if cfg.shuffle:
                logger.info("SHUFFLE")
                train_loader.shuffle(epoch)

        return params, opt_state, model_state, metrics


class MultiTrainer(Trainer):
    """Joint multi-dataset trainer (multi_train.py).

    Restores the reference's deleted MultiTrainer (only
    trainer/asr/__pycache__/multi_trainer.cpython-35.pyc survives; its
    bytecode strings show the contract): per-TASK validation lines
    `(Epoch N) TASK:i VALID LOSS:… CER:…` and a `valid_losses` list in the
    metrics. The bytecode locals (`all_valid_loss`) indicate the best
    model keys off an aggregate of the task losses rather than the plain
    trainer's last-loader leak; we use the mean.
    """

    def _log_valid(self, epoch: int, ind: int, vloss: float,
                   cer_pct: float) -> None:
        logger.info("(Epoch %d) TASK:%d VALID LOSS:%.4f CER:%.2f%%",
                    epoch + 1, ind, vloss, cer_pct)

    def _best_valid_loss_key(self, valid_losses: List[float]) -> float:
        return float(np.mean(valid_losses)) if valid_losses else 0.0

    def _extend_metrics(self, metrics: Dict,
                        valid_losses: List[float]) -> None:
        metrics["valid_losses"] = list(valid_losses)
