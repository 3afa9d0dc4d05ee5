"""Checkpoint semantics: optimizer-step (Noam LR) continuity across
save/load, config roundtrip, converter smoke via shape-compatible
state dict."""

import jax
import jax.numpy as jnp
import numpy as np

from end2end_asr_tpu.config import Config
from end2end_asr_tpu.training.checkpoint import (flatten_tree,
                                                 load_checkpoint,
                                                 save_checkpoint,
                                                 unflatten_tree)
from end2end_asr_tpu.training.optimizer import (NoamConfig,
                                                adam_noam_update,
                                                init_adam_state, noam_rate)


def test_flatten_unflatten_roundtrip():
    tree = {"a": {"b": jnp.ones((2, 3)), "c": [jnp.zeros(4), jnp.ones(5)]},
            "d": jnp.arange(3)}
    flat = flatten_tree(tree)
    back = unflatten_tree(flat)
    assert np.allclose(back["a"]["c"][1], 1.0)
    assert back["d"].shape == (3,)
    assert isinstance(back["a"]["c"], list)


def test_noam_step_continuity_across_checkpoint(tmp_path):
    cfg = Config(name="t", save_folder=str(tmp_path))
    params = {"w": jnp.ones((4, 4))}
    opt = init_adam_state(params)
    noam = NoamConfig(model_size=161, factor=1.0, warmup=100, min_lr=1e-6)

    lrs = []
    for _ in range(5):
        params, opt, lr = adam_noam_update(
            params, {"w": jnp.ones((4, 4)) * 0.1}, opt, noam)
        lrs.append(float(lr))

    base = str(tmp_path / "ckpt")
    save_checkpoint(base, cfg, epoch=3, params=params, opt_state=opt,
                    model_state={}, label2id={"a": 0}, id2label={0: "a"},
                    metrics={"valid_loss": 1.0})
    cfg2, epoch, p2, o2, s2, l2i, i2l, m2 = load_checkpoint(base)
    assert epoch == 3
    assert int(o2["step"]) == 5
    assert m2["valid_loss"] == 1.0
    assert l2i == {"a": 0} and i2l == {0: "a"}

    # the 6th step after resume continues the schedule exactly
    _, o3, lr6 = adam_noam_update(p2, {"w": jnp.ones((4, 4)) * 0.1},
                                  o2, noam)
    expected = float(noam_rate(jnp.asarray(6), noam))
    assert abs(float(lr6) - expected) < 1e-12


def test_config_tuple_roundtrip(tmp_path):
    cfg = Config(train_manifest_list=("a.csv", "b.csv"),
                 src_buckets=(100, 200))
    cfg2 = Config.from_dict(cfg.to_dict())
    assert cfg2.train_manifest_list == ("a.csv", "b.csv")
    assert cfg2.src_buckets == (100, 200)
    assert cfg2 == cfg
