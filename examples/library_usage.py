#!/usr/bin/env python3
"""Library-level usage (no CLIs): build a model, run a jitted train step,
decode greedily, save/load a checkpoint.

Run on CPU:  JAX_PLATFORMS=cpu python examples/library_usage.py
(on this dev image the entry points re-honor JAX_PLATFORMS; see
end2end_asr_tpu/utils/platform.py)
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from end2end_asr_tpu.utils.platform import honor_env_platform

honor_env_platform()

import jax  # noqa: E402
import numpy as np  # noqa: E402

from end2end_asr_tpu.config import Config, build_vocab  # noqa: E402
from end2end_asr_tpu.decoding.greedy import greedy_decode, ids_to_strings  # noqa: E402
from end2end_asr_tpu.models.transformer import (dims_from_config,  # noqa: E402
                                                init_transformer)
from end2end_asr_tpu.ops.features import reflect_pad_pcm  # noqa: E402
from end2end_asr_tpu.training.checkpoint import (load_checkpoint,  # noqa: E402
                                                 save_checkpoint)
from end2end_asr_tpu.training.optimizer import init_adam_state  # noqa: E402
from end2end_asr_tpu.training.steps import (make_encode_fn,  # noqa: E402
                                            make_train_step)


def main():
    # 1. configuration + vocabulary (same knobs as the train.py flags)
    cfg = Config(feat_extractor="", num_layers=2, num_heads=4,
                 dim_model=128, dim_key=32, dim_value=32, dim_inner=256,
                 dim_emb=128, batch_size=4, dropout=0.1, dtype="float32",
                 src_max_len=128, tgt_max_len=16,
                 src_buckets=(64, 128), tgt_buckets=(16,))
    label2id, id2label = build_vocab("abc ")
    dims = dims_from_config(cfg)

    # 2. model + optimizer state (pure pytrees)
    params, model_state = jax.jit(functools.partial(
        init_transformer, cfg=cfg, num_vocab=len(label2id)))(
            jax.random.PRNGKey(0))
    opt_state = init_adam_state(params)

    # 3. a batch: raw PCM (host-reflect-padded) + SOS…EOS token targets
    rng = np.random.RandomState(0)
    T_bucket = 64
    n_pcm = (T_bucket - 1) * cfg.hop_length
    pcm = np.stack([reflect_pad_pcm(
        rng.randn(n_pcm).astype(np.float32) * 0.1, cfg.n_fft, n_pcm)
        for _ in range(cfg.batch_size)])
    n_frames = np.full(cfg.batch_size, T_bucket, np.int32)
    text = "abc"
    ids = [1] + [label2id[c] for c in text] + [2]
    targets = np.zeros((cfg.batch_size, 16), np.int32)
    targets[:, :len(ids)] = ids
    tgt_lengths = np.full(cfg.batch_size, len(ids), np.int32)

    # 4. jitted train steps (features → forward → loss → backward → Noam/Adam)
    step = make_train_step(cfg, dims, from_pcm=True)
    key = jax.random.PRNGKey(1)
    for i in range(30):
        key, sub = jax.random.split(key)
        params, opt_state, model_state, metrics, _, _ = step(
            params, opt_state, model_state, sub, pcm, n_frames, targets,
            tgt_lengths, spect_T=T_bucket)
    print(f"loss after 30 steps: {float(metrics['loss']):.3f} "
          f"(lr {float(metrics['lr']):.2e})")

    # 5. greedy decode
    encode_fn = make_encode_fn(cfg, dims, from_pcm=True)
    enc_out, _ = encode_fn(params, model_state, pcm, n_frames,
                           spect_T=T_bucket)
    hyp_ids = greedy_decode(params, enc_out, dims, max_len=8)
    print("greedy hypotheses:", ids_to_strings(hyp_ids, id2label))

    # 6. checkpoint roundtrip
    save_checkpoint("/tmp/example_ckpt", cfg, epoch=1, params=params,
                    opt_state=opt_state, model_state=model_state,
                    label2id=label2id, id2label=id2label,
                    metrics={"loss": float(metrics["loss"])})
    cfg2, epoch, params2, *_ = load_checkpoint("/tmp/example_ckpt")
    print(f"checkpoint roundtrip OK (epoch {epoch}, "
          f"dim_model {cfg2.dim_model})")

    # 7. streaming transcription (chunked PCM -> partial transcripts);
    # exact: flush() equals the one-shot batch pipeline on the same audio
    from end2end_asr_tpu.streaming import StreamingTranscriber
    st = StreamingTranscriber(params, model_state, cfg, id2label)
    wav = np.asarray(pcm[0])
    for chunk in np.array_split(wav, 4):
        partial = st.feed(chunk)
    print("streaming final:", repr(st.flush()))


if __name__ == "__main__":
    main()
