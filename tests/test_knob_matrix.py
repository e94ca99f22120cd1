"""Dialect-knob matrix (VERDICT r4 #6): every surviving DCANET_* trace-time
knob, flipped off-default — plus the meaningful pairs — must agree numerically
with the default dialect through a tiny DCANet forward (eval) and
forward+backward (train).

NOTE: these knobs are read at TRACE time; flipping one after a function is
jit-cached silently has no effect (jit caches don't key on env — ADVICE r4).
This test builds a fresh un-jitted apply per setting; production A/Bs must use
fresh processes (bench.py and the tools/profile_* harnesses do).

Knobs pruned in r5 after their losing arm stopped earning maintenance
(measurements recorded in the pruning commit + surviving docstrings):
DCANET_CONV2D_KHFOLD (2D kh-fold: wins isolated, loses in-extractor) and
DCANET_KD_SELECT=pallas (roofline select: layout copies around the opaque
pallas_call made it slower than the shift form).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dcanet_tpu.nn.layers as L
from dcanet_tpu.models import DCANet

MAXDISP = 16
B, H, W = 1, 16, 32

EVAL_SETTINGS = [
    {"DCANET_FOLD_EVAL_BN": "0"},
    {"DCANET_PACKED_EVAL": "0"},
    {"DCANET_KD_SELECT": "conv"},
    {"DCANET_SD_SELECT": "shift"},
    {"DCANET_POINTWISE_MATMUL": "0"},
    {"DCANET_DECONV_SUBPIXEL": "1"},
    {"DCANET_FOLD_EVAL_BN": "0", "DCANET_KD_SELECT": "conv"},
    {"DCANET_PACKED_EVAL": "0", "DCANET_SD_SELECT": "shift"},
]
TRAIN_SETTINGS = [
    {"DCANET_DECONV_SUBPIXEL_TRAIN": "0"},
    {"DCANET_PACKED_TRAIN_BN": "1"},  # off by default (measured loss, r5)
    {"DCANET_KD_SELECT": "conv"},
    {"DCANET_POINTWISE_MATMUL": "0"},
    {"DCANET_PACKED_TRAIN_BN": "1", "DCANET_DECONV_SUBPIXEL_TRAIN": "0"},
]

_ids = lambda s: "+".join(f"{k.replace('DCANET_', '')}={v}" for k, v in s.items())


@pytest.fixture
def fake_tpu(monkeypatch):
    # activate the TPU-gated dialects; all of them are plain XLA and run on
    # CPU (the Pallas gwc kernel is NOT — pinned off via use_pallas=False)
    monkeypatch.setattr(L.jax, "default_backend", lambda: "tpu")


def _model_and_inputs():
    key = jax.random.PRNGKey(0)
    kl, kr = jax.random.split(key)
    left = jax.random.normal(kl, (B, H, W, 3), jnp.float32)
    right = jax.random.normal(kr, (B, H, W, 3), jnp.float32)
    model = DCANet(
        maxdisp=MAXDISP, num_cva=2, dtype=jnp.bfloat16, use_pallas=False
    )
    # train=True init creates the full tree (train-only classif heads
    # included); the eval trace uses a subset
    variables = model.init(key, left, right, train=True)
    return model, variables, left, right


_cache = {}


def _eval_fwd(monkeypatch, setting):
    for k, v in setting.items():
        monkeypatch.setenv(k, v)
    if "model" not in _cache:
        _cache["model"] = _model_and_inputs()
    model, variables, left, right = _cache["model"]
    out = model.apply(variables, left, right, train=False)
    return np.asarray(out.disparity, np.float32)


def _train_step(monkeypatch, setting):
    for k, v in setting.items():
        monkeypatch.setenv(k, v)
    if "model" not in _cache:
        _cache["model"] = _model_and_inputs()
    model, variables, left, right = _cache["model"]
    gt = jnp.full((B, H, W), 5.0, jnp.float32)

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            left, right, train=True, mutable=["batch_stats"],
        )
        tot = 0.0
        for d in out.disparities:
            tot = tot + jnp.mean(jnp.abs(d - gt))
        for p in out.prob_volumes:
            tot = tot + 0.1 * jnp.mean(p * p)
        return tot

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    gnorm = jnp.sqrt(
        sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in jax.tree.leaves(grads))
    )
    return float(loss), float(gnorm)


@pytest.mark.slow
@pytest.mark.parametrize("setting", EVAL_SETTINGS, ids=_ids)
def test_eval_knob_matches_default(fake_tpu, monkeypatch, setting):
    if "eval_base" not in _cache:
        _cache["eval_base"] = _eval_fwd(monkeypatch, {})
    base = _cache["eval_base"]
    got = _eval_fwd(monkeypatch, setting)
    diff = np.abs(got - base)
    # bf16 dialects reassociate sums; softmax-argmax flips give rare large
    # per-pixel diffs — bound the bulk and the tail separately
    assert np.median(diff) < 0.1, (np.median(diff), setting)
    assert (diff > 1.0).mean() < 0.02, ((diff > 1.0).mean(), setting)


@pytest.mark.slow
@pytest.mark.parametrize("setting", TRAIN_SETTINGS, ids=_ids)
def test_train_knob_matches_default(fake_tpu, monkeypatch, setting):
    if "train_base" not in _cache:
        _cache["train_base"] = _train_step(monkeypatch, {})
    loss0, g0 = _cache["train_base"]
    loss1, g1 = _train_step(monkeypatch, setting)
    assert abs(loss1 - loss0) / max(abs(loss0), 1e-6) < 0.03, (loss0, loss1, setting)
    assert abs(g1 - g0) / max(g0, 1e-6) < 0.10, (g0, g1, setting)
