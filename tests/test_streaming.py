"""StreamingTranscriber: chunked feeding must equal the one-shot path."""

import numpy as np
import jax
import jax.numpy as jnp

from end2end_asr_tpu.config import Config
from end2end_asr_tpu.models.transformer import init_transformer
from end2end_asr_tpu.streaming import StreamingTranscriber

CFG = Config(num_layers=1, num_heads=2, dim_model=32, dim_key=16,
             dim_value=16, dim_inner=64, dim_emb=32, feat_extractor="",
             sample_rate=8000, dim_input=81, src_max_len=64,
             tgt_max_len=16, src_buckets=(16, 32, 64))
VOCAB = 10
ID2LABEL = {i: chr(ord("a") + i) for i in range(VOCAB)}


def _setup():
    params, state = init_transformer(jax.random.PRNGKey(0), CFG,
                                     num_vocab=VOCAB)
    return params, state


def test_chunked_equals_oneshot():
    params, state = _setup()
    rng = np.random.RandomState(0)
    pcm = rng.randn(8000).astype(np.float32) * 0.1  # 1 s of audio

    one = StreamingTranscriber(params, state, CFG, ID2LABEL)
    one.feed(pcm)
    ref = one.flush()

    st = StreamingTranscriber(params, state, CFG, ID2LABEL)
    partials = []
    for chunk in np.array_split(pcm, 7):
        partials.append(st.feed(chunk))
    assert st.flush() == ref
    assert all(isinstance(p, str) for p in partials)


def test_throttle_caches_partial():
    params, state = _setup()
    st = StreamingTranscriber(params, state, CFG, ID2LABEL,
                              min_new_frames=10**9)
    st.feed(np.zeros(400, np.float32))
    # below the throttle: no decode happened yet
    assert st.feed(np.zeros(400, np.float32)) == ""
    assert st.flush() != None  # noqa: E711  (flush always decodes)


def test_reset():
    params, state = _setup()
    st = StreamingTranscriber(params, state, CFG, ID2LABEL)
    st.feed(np.random.RandomState(1).randn(4000).astype(np.float32))
    st.reset()
    assert st.flush() == ""
