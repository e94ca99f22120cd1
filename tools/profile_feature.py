"""A/B the 2D feature extractor with/without the kh-fold fast path and
with/without folded eval-BN, at the KITTI bench shape.

Usage: python tools/profile_feature.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from dcanet_tpu.nn.feature import FeatureExtractor
    from dcanet_tpu.utils.profiling import device_time

    key = jax.random.PRNGKey(0)
    H, W = 384, 1248
    img = jax.random.normal(key, (2, H, W, 3), jnp.float32)
    fe = FeatureExtractor(dtype=jnp.bfloat16)
    fe_vars = jax.jit(lambda k, x: fe.init(k, x, train=False))(key, img[:, :64, :256])

    def run(x):
        out = fe.apply(fe_vars, x, train=False)
        return out["gwc_feature"], out["concat_feature"]

    for khfold in ("1", "0"):
        for foldbn in ("1", "0"):
            os.environ["DCANET_CONV2D_KHFOLD"] = khfold
            os.environ["DCANET_FOLD_EVAL_BN"] = foldbn
            t = device_time(run, img, iters=8)
            print(f"khfold={khfold} foldbn={foldbn}  {t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
