"""Per-op device timing of the CVA block internals at the KITTI eval shape.

Usage: python tools/profile_cva.py [--bf16]
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
    bf16 = "--bf16" in sys.argv
    dtype = jnp.bfloat16 if bf16 else None
    cdtype = jnp.bfloat16 if bf16 else jnp.float32
    print(f"dtype={'bf16' if bf16 else 'f32'}", flush=True)

    from flax import linen as nn

    from dcanet_tpu.nn.aggregation import MultiAggregation
    from dcanet_tpu.nn.attention import DisparityAttentionBlock
    from dcanet_tpu.nn.layers import AvgPool3dTorch, ConvBN, ConvBNAct
    from dcanet_tpu.ops.slc import slc_pool
    from dcanet_tpu.ops.upsample import resize_trilinear
    from dcanet_tpu.utils.profiling import device_time

    key = jax.random.PRNGKey(0)
    D, H, W, C = 48, 96, 312, 32
    cost = jax.random.normal(key, (1, D, H, W, C), cdtype)
    cost_dn = jax.random.normal(key, (1, D // 2, H // 2, W // 2, C), cdtype)
    logits = jax.random.normal(key, (1, D // 2, H // 2, W // 2), cdtype)

    def report(name, fn, *a):
        t = device_time(fn, *a, iters=10)
        print(f"{name:<28s}{t*1e3:9.2f} ms", flush=True)

    pool = AvgPool3dTorch()
    pv = jax.jit(lambda k, x: pool.init(k, x))(key, cost[:, :8, :8, :16])
    report("avgpool3d (1/4->1/8)", lambda x: pool.apply(pv, x), cost)

    down = ConvBNAct(C, 3, 1, 1, dims=3, dtype=dtype)
    dv = jax.jit(lambda k, x: down.init(k, x, False))(key, cost_dn[:, :8, :8, :16])
    report("down_conv 3d (1/8)", lambda x: down.apply(dv, x, False), cost_dn)

    report("slc_pool (1/8)", lambda x, l: slc_pool(x, l), cost_dn, logits)

    attn = DisparityAttentionBlock(
        transform_channels=C, out_channels=C, key_query_num_convs=2, dtype=dtype
    )
    av = jax.jit(lambda k, a, b: attn.init(k, a, b, False))(
        key, cost_dn[:, :8, :8, :16], cost_dn[:, :8, :8, :16]
    )
    report(
        "attention (1/8)", lambda x: attn.apply(av, x, x + 1.0, False), cost_dn
    )

    report("resize_trilinear 2x", lambda x: resize_trilinear(x, 2), cost_dn)

    fuse = ConvBN(C, 1, 1, 0, dims=3, dtype=dtype)
    fv = jax.jit(lambda k, x: fuse.init(k, x, False))(
        key, jnp.concatenate([cost_dn, cost_dn], -1)[:, :8, :8, :16]
    )
    cat = jnp.concatenate([cost, cost], -1)
    report("fuse 1x1x1 (1/4, 64->32)", lambda x: fuse.apply(fv, x, False), cat)

    agg = MultiAggregation(C, dtype=dtype)
    gv = jax.jit(lambda k, x: agg.init(k, x, False))(key, cost[:, :8, :8, :16])
    report("MultiAggregation (1/4)", lambda x: agg.apply(gv, x, False), cost)

    # MultiAggregation internals
    c1 = ConvBNAct(C * 2, 3, 2, 1, dims=3, dtype=dtype)
    c1v = jax.jit(lambda k, x: c1.init(k, x, False))(key, cost[:, :8, :8, :16])
    report("  conv1 s2 32->64", lambda x: c1.apply(c1v, x, False), cost)
    half = jax.random.normal(key, (1, D // 2, H // 2, W // 2, C * 2), cdtype)
    c2 = ConvBNAct(C * 2, 3, 1, 1, dims=3, dtype=dtype)
    c2v = jax.jit(lambda k, x: c2.init(k, x, False))(key, half[:, :8, :8, :16])
    report("  conv2 64->64 (1/8)", lambda x: c2.apply(c2v, x, False), half)
    from dcanet_tpu.nn.layers import TorchConvTranspose

    dc = TorchConvTranspose(C, dims=3, dtype=dtype)
    dcv = jax.jit(lambda k, x: dc.init(k, x))(key, half[:, :8, :8, :16])
    report("  deconv 64->32 (2x)", lambda x: dc.apply(dcv, x), half)
    redir = ConvBN(C, 1, 1, 0, dims=3, dtype=dtype)
    rv = jax.jit(lambda k, x: redir.init(k, x, False))(key, cost[:, :8, :8, :16])
    report("  redir 1x1x1 (1/4)", lambda x: redir.apply(rv, x, False), cost)


if __name__ == "__main__":
    main()
