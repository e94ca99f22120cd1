"""PyTorch DCANet checkpoint -> dcanet_tpu parameter pytree.

Ingests the reference's released checkpoints (`trained/sceneflow.tar`,
`fined/kitti12.tar`, `fined/kitti15.tar` — torch.save dicts with a
`state_dict` whose keys carry a `module.` DataParallel prefix,
main_dca.py:275-281 / train_kitti.py:77-86) and emits the flax
params/batch_stats tree of `DCANet(num_cva=N)`.

Key correspondence is the explicit table in tools/torch_mapping.py; layout
conversions:
  torch Conv2d   OIHW      -> flax HWIO
  torch Conv3d   OIDHW     -> flax DHWIO
  torch ConvTranspose3d IODHW -> our lhs-dilated correlation kernel:
        flip spatial dims, then (D, H, W, I, O)
  BN: weight/bias -> scale/bias params; running_mean/var -> batch_stats.

Usage:
  python tools/convert_torch_ckpt.py --ckpt sceneflow.tar --out weights/
  python tools/convert_torch_ckpt.py --selftest    # layout converters
  python tools/convert_torch_ckpt.py --roundtrip   # full mapping roundtrip
"""

from __future__ import annotations

import argparse
import os
import re
import sys
from typing import Dict, Tuple

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.torch_mapping import dcanet_mapping, gwcnet_baseline_mapping  # noqa: E402


def torch_conv2d_to_flax(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def torch_conv3d_to_flax(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 4, 1, 0))  # OIDHW -> DHWIO


def torch_convtranspose3d_to_flax(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose3d weight (I, O, D, H, W) -> our lhs-dilated
    correlation kernel (D, H, W, I, O) with spatial flip."""
    w = w[:, :, ::-1, ::-1, ::-1]
    return np.ascontiguousarray(np.transpose(w, (2, 3, 4, 0, 1)))


_FWD = {
    "conv2d": torch_conv2d_to_flax,
    "conv3d": torch_conv3d_to_flax,
    "deconv3d": torch_convtranspose3d_to_flax,
    "bias": lambda w: w,
}
_INV = {
    "conv2d": lambda w: np.transpose(w, (3, 2, 0, 1)),
    "conv3d": lambda w: np.transpose(w, (4, 3, 0, 1, 2)),
    "deconv3d": lambda w: np.ascontiguousarray(
        np.transpose(w, (3, 4, 0, 1, 2))[:, :, ::-1, ::-1, ::-1]
    ),
    "bias": lambda w: w,
}


def _flatten(tree, sep="/"):
    import flax

    return flax.traverse_util.flatten_dict(tree, sep=sep)


def _unflatten(flat, sep="/"):
    import flax

    return flax.traverse_util.unflatten_dict(flat, sep=sep)


def convert_state_dict(
    state_dict: Dict[str, np.ndarray], variables, num_cva: int = 3, mapping=None
) -> Tuple[Dict, Dict]:
    """torch state_dict -> (params, batch_stats) matching `variables`'
    structure. Raises on missing keys or shape mismatches. `mapping` defaults
    to the DCANet table; pass gwcnet_baseline_mapping() for the baseline."""
    sd = {
        re.sub(r"^module\.", "", k): np.asarray(v)
        for k, v in state_dict.items()
        if "num_batches_tracked" not in k
    }
    params = dict(_flatten(variables["params"]))
    stats = dict(_flatten(variables.get("batch_stats", {})))
    new_params, new_stats = {}, {}

    for tkey, fpath, kind in (mapping or dcanet_mapping(num_cva)):
        if kind == "bn":
            pairs = [
                (f"{tkey}.weight", f"{fpath}/scale", new_params, params),
                (f"{tkey}.bias", f"{fpath}/bias", new_params, params),
                (f"{tkey}.running_mean", f"{fpath}/mean", new_stats, stats),
                (f"{tkey}.running_var", f"{fpath}/var", new_stats, stats),
            ]
            for tk, fp, dst, ref in pairs:
                assert tk in sd, f"missing torch key {tk}"
                assert fp in ref, f"missing flax path {fp}"
                v = sd[tk].astype(np.float32)
                assert v.shape == ref[fp].shape, (tk, v.shape, ref[fp].shape)
                dst[fp] = v
        else:
            assert tkey in sd, f"missing torch key {tkey}"
            assert fpath in params, f"missing flax path {fpath}"
            v = _FWD[kind](sd[tkey].astype(np.float32))
            assert v.shape == params[fpath].shape, (tkey, v.shape, params[fpath].shape)
            new_params[fpath] = v

    missing = set(params) - set(new_params)
    assert not missing, f"unmapped flax params: {sorted(missing)[:10]}"
    missing_s = set(stats) - set(new_stats)
    assert not missing_s, f"unmapped batch stats: {sorted(missing_s)[:10]}"
    return _unflatten(new_params), _unflatten(new_stats)


def export_state_dict(variables, num_cva: int = 3, mapping=None) -> Dict[str, np.ndarray]:
    """Inverse conversion (flax -> torch-style state_dict), used for the
    roundtrip selftest and for serving converted models back to torch."""
    params = dict(_flatten(variables["params"]))
    stats = dict(_flatten(variables.get("batch_stats", {})))
    sd = {}
    for tkey, fpath, kind in (mapping or dcanet_mapping(num_cva)):
        if kind == "bn":
            sd[f"{tkey}.weight"] = np.asarray(params[f"{fpath}/scale"])
            sd[f"{tkey}.bias"] = np.asarray(params[f"{fpath}/bias"])
            sd[f"{tkey}.running_mean"] = np.asarray(stats[f"{fpath}/mean"])
            sd[f"{tkey}.running_var"] = np.asarray(stats[f"{fpath}/var"])
        else:
            sd[tkey] = _INV[kind](np.asarray(params[fpath]))
    return sd


def roundtrip_test(num_cva: int = 1):
    """flax init -> synth torch sd -> convert -> identical trees."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from dcanet_tpu.models import DCANet

    model = DCANet(maxdisp=32, num_cva=num_cva)
    x = jnp.zeros((1, 32, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, x, train=True)

    sd = export_state_dict(variables, num_cva)
    params, stats = convert_state_dict(sd, variables, num_cva)

    ref_p = _flatten(variables["params"])
    got_p = _flatten(params)
    assert set(ref_p) == set(got_p)
    for k in ref_p:
        np.testing.assert_array_equal(np.asarray(ref_p[k]), got_p[k]), k
    ref_s = _flatten(variables["batch_stats"])
    got_s = _flatten(stats)
    for k in ref_s:
        np.testing.assert_array_equal(np.asarray(ref_s[k]), got_s[k]), k
    print(
        f"roundtrip ok: num_cva={num_cva}, {len(got_p)} params + "
        f"{len(got_s)} stats mapped bijectively"
    )


def selftest():
    """Layout converters vs torch functional ops."""
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")
    rng = np.random.default_rng(0)
    w2 = rng.standard_normal((8, 4, 3, 3)).astype(np.float32)  # OIHW
    f2 = torch_conv2d_to_flax(w2)
    assert f2.shape == (3, 3, 4, 8)
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


def convert_file(ckpt_path: str, out_path: str, num_cva: int = 3, maxdisp: int = 192):
    import torch

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from dcanet_tpu.models import DCANet
    from dcanet_tpu.train.checkpoint import save_params_only

    payload = torch.load(ckpt_path, map_location="cpu")
    sd = payload.get("state_dict", payload)
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}

    model = DCANet(maxdisp=maxdisp, num_cva=num_cva)
    x = jnp.zeros((1, 64, 4 * maxdisp, 3))
    variables = model.init(jax.random.PRNGKey(0), x, x, train=True)
    params, stats = convert_state_dict(sd, variables, num_cva)
    save_params_only(out_path, params, stats)
    print(f"converted {ckpt_path} -> {out_path}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt")
    p.add_argument("--out")
    p.add_argument("--num-cva", type=int, default=3)
    p.add_argument("--maxdisp", type=int, default=192)
    p.add_argument("--selftest", action="store_true")
    p.add_argument("--roundtrip", action="store_true")
    args = p.parse_args()
    if args.selftest:
        selftest()
    if args.roundtrip:
        roundtrip_test(1)
        roundtrip_test(3)
    if args.ckpt:
        convert_file(args.ckpt, args.out, args.num_cva, args.maxdisp)


if __name__ == "__main__":
    main()
