"""End-to-end numerical parity vs the ACTUAL reference PyTorch networks.

The single highest-value check in the suite: builds the reference models from
/root/reference (models/gwcnet_dca_g.py:126-282, gwcnet_dca1_g.py,
gwcnet_dca0_g.py) with torch (CPU), randomizes weights AND BatchNorm
affine/running stats, converts the state_dict through
tools/convert_torch_ckpt.convert_state_dict, and asserts the flax DCANet
produces the same outputs on the same inputs — eval mode (running-stat BN)
and train mode (batch-stat BN), full supervision ladders.

This transitively verifies every "parity:" claim on the path: conv/BN layout
conversion, BasicBlock wiring, gwc/concat volume semantics, the dense one-hot
SLC re-derivation, D-axis attention head carving, AvgPool3d
count_include_pad, trilinear align_corners=False resizing, ConvTranspose3d
flip, soft-argmin, and convex upsampling.

Uses stacked_features=False so train-mode BN batch stats match the
reference's two separate feature-extractor calls (the default stacked path is
eval-identical; see DCANet.stacked_features).
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dcanet_tpu.models import DCANet  # noqa: E402
from tools.convert_torch_ckpt import convert_state_dict  # noqa: E402
from tools.torch_ref import load_reference_module, randomize_bn_stats  # noqa: E402

MAXDISP = 64
H, W = 64, 128

_REF_MODULES = {
    0: "models.gwcnet_dca0_g",
    1: "models.gwcnet_dca1_g",
    3: "models.gwcnet_dca_g",
}


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(0)
    left = rng.standard_normal((1, 3, H, W)).astype(np.float32)
    right = rng.standard_normal((1, 3, H, W)).astype(np.float32)
    return left, right


def _build_pair(num_cva: int, inputs):
    """(torch model, flax model, converted variables, jax inputs)."""
    ref = load_reference_module(_REF_MODULES[num_cva])
    torch.manual_seed(0)
    tmodel = ref.GwcNet(MAXDISP)
    randomize_bn_stats(tmodel, seed=1)
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}

    fmodel = DCANet(maxdisp=MAXDISP, num_cva=num_cva, stacked_features=False)
    left, right = inputs
    xl = jnp.asarray(np.transpose(left, (0, 2, 3, 1)))
    xr = jnp.asarray(np.transpose(right, (0, 2, 3, 1)))
    variables = fmodel.init(jax.random.PRNGKey(0), xl, xr, train=True)
    params, stats = convert_state_dict(sd, variables, num_cva=num_cva)
    return tmodel, fmodel, {"params": params, "batch_stats": stats}, (xl, xr)


def _np(t):
    t = t.detach()
    if t.dim() == 4 and t.shape[1] == 1:
        t = t.squeeze(1)
    return t.numpy()


@pytest.mark.slow
@pytest.mark.parametrize("num_cva", [0, 1, 3])
def test_eval_and_train_parity(num_cva, inputs):
    tmodel, fmodel, variables, (xl, xr) = _build_pair(num_cva, inputs)
    left, right = inputs
    tl, tr = torch.from_numpy(left), torch.from_numpy(right)

    # ---- eval mode: BN uses (randomized) running stats ----
    tmodel.eval()
    with torch.no_grad():
        targs = (tl, tr, None) if num_cva == 3 else (tl, tr)
        tdisp, tlogits = tmodel(*targs)
    out = fmodel.apply(variables, xl, xr, train=False)

    np.testing.assert_allclose(
        np.asarray(out.disparity), _np(tdisp), atol=5e-3, rtol=0
    )
    if num_cva >= 1:
        # reference eval returns the LAST-BUT-ONE-level classify logits:
        # prob_volume2 for dca3 (gwcnet_dca_g.py:282), prob_volume1 for dca1.
        idx = 1 if num_cva == 3 else 0
        flog, tlog = np.asarray(out.class_logits[idx]), _np(tlogits)
        scale = max(np.abs(tlog).max(), 1.0)
        np.testing.assert_allclose(flog / scale, tlog / scale, atol=1e-4, rtol=0)

    # ---- train mode: BN uses current-batch stats; full supervision ladder ----
    tmodel.train()
    with torch.no_grad():
        tprobs, tdisps = tmodel(*targs)
    tout, _ = fmodel.apply(variables, xl, xr, train=True, mutable=["batch_stats"])

    assert len(tout.prob_volumes) == len(tprobs)
    assert len(tout.disparities) == len(tdisps)
    for i, (f, t) in enumerate(zip(tout.prob_volumes, tprobs)):
        t = _np(t)
        if num_cva == 0:
            # documented deviation: reference dca0 returns RAW classif0 logits
            # (gwcnet_dca0_g.py:188) where the main model softmaxes; our
            # uniform contract softmaxes everywhere (models/dcanet.py header).
            t = torch.softmax(torch.from_numpy(t), dim=1).numpy()
        np.testing.assert_allclose(np.asarray(f), t, atol=1e-3, rtol=0), i
    for i, (f, t) in enumerate(zip(tout.disparities, tdisps)):
        np.testing.assert_allclose(np.asarray(f), _np(t), atol=2e-2, rtol=0), i


@pytest.mark.slow
def test_gwcnet_baseline_train_parity(inputs):
    """Plain-GwcNet baseline (models/gwcnet.py:107-249) vs GwcNetBaseline.
    Train mode only: the reference's eval branch is hijacked for t-SNE
    feature dumping (models/gwcnet.py:241-249) and doesn't return a
    disparity."""
    from dcanet_tpu.models.dcanet import GwcNetBaseline
    from tools.torch_mapping import gwcnet_baseline_mapping

    ref = load_reference_module("models.gwcnet")
    torch.manual_seed(0)
    tmodel = ref.GwcNet(MAXDISP, use_concat_volume=True)
    randomize_bn_stats(tmodel, seed=1)
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}

    fmodel = GwcNetBaseline(maxdisp=MAXDISP, stacked_features=False)
    left, right = inputs
    xl = jnp.asarray(np.transpose(left, (0, 2, 3, 1)))
    xr = jnp.asarray(np.transpose(right, (0, 2, 3, 1)))
    variables = fmodel.init(jax.random.PRNGKey(0), xl, xr, train=True)
    params, stats = convert_state_dict(
        sd, variables, mapping=gwcnet_baseline_mapping()
    )
    tmodel.train()
    with torch.no_grad():
        tdisps = tmodel(
            torch.from_numpy(left), torch.from_numpy(right), None
        )
    out, _ = fmodel.apply(
        {"params": params, "batch_stats": stats}, xl, xr, train=True,
        mutable=["batch_stats"],
    )
    assert len(out.disparities) == len(tdisps) == 4
    for i, (f, t) in enumerate(zip(out.disparities, tdisps)):
        np.testing.assert_allclose(np.asarray(f), _np(t), atol=2e-2, rtol=0), i
