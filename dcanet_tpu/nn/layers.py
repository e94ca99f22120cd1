"""Shared NN building blocks (flax.linen, channel-last).

Capability parity with reference models/submodule.py (convbn, convbn_3d,
BasicBlock, BasicConv, ResidualBlock) with TPU-first choices:

- channel-last layouts (NHWC / NDHWC) so XLA tiles convs onto the MXU;
- BatchNorm is cross-replica-exact by construction: under jit/pjit the batch
  axis is global, so batch stats are computed over the full (sharded) batch —
  this *is* the reference's SyncBN capability (models/lib/nn/modules/
  batchnorm.py) with zero extra machinery. An optional `axis_name` supports
  shard_map/pmap execution.
- kernel init matches the reference's normal(0, sqrt(2/fan_out)) scheme
  (models/gwcnet_dca_g.py:173-185).

All modules with normalization take `train: bool` in `__call__`.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def reference_conv_init(key, shape, dtype=jnp.float32):
    """normal(0, sqrt(2/n)), n = prod(spatial kernel) * out_channels.

    Matches the reference's init loop (models/gwcnet_dca_g.py:173-185) and
    kaiming_normal(fan_out, relu) used in Guidance (models/submodule.py:435-442).
    Kernel layout is (*spatial, in, out).
    """
    fan_out = math.prod(shape[:-2]) * shape[-1]
    return jax.random.normal(key, shape, dtype) * math.sqrt(2.0 / fan_out)


def _tuple(v, n):
    if isinstance(v, (tuple, list)):
        assert len(v) == n
        return tuple(v)
    return (v,) * n


def fold_eval_bn_enabled(dtype) -> bool:
    """Eval-mode BN folding gate: at bf16 the folded affine is free (scale
    multiplied into the f32 kernel before the bf16 cast; bias fused into the
    conv epilogue — kernels/conv3d.py docstring has the measurements), while
    the unfused affine costs ~0.68 ms/conv in kd-fold chains. f32 paths keep
    the literal flax BN so checkpoint-parity tests stay bit-identical.
    DCANET_FOLD_EVAL_BN=0 disables (A/B + numerics tests)."""
    import os

    return dtype == jnp.bfloat16 and os.environ.get(
        "DCANET_FOLD_EVAL_BN", "1"
    ) == "1"


def packed_eval_enabled(dtype) -> bool:
    """Gate for the packed-dialect eval CVA chain (kernels/deconv3d.py):
    requires the folded-eval-BN regime; DCANET_PACKED_EVAL=1 forces on (CPU
    parity tests), =0 forces off (A/B), unset = auto (TPU only)."""
    import os

    if not fold_eval_bn_enabled(dtype):
        return False
    knob = os.environ.get("DCANET_PACKED_EVAL", "")
    if knob == "1":
        return True
    if knob == "0":
        return False
    import jax

    return jax.default_backend() == "tpu"


class Conv(nn.Conv):
    """nn.Conv with a TPU fast path for 3x3x3 3D convs.

    XLA's native Conv3D at the cost-volume channel widths (C=32) runs at
    ~16 TFLOPS on v5e (~8% of MXU peak; measured, tools/bench_conv3d.py).
    The kd-fold formulation (kernels/conv3d.py: one 2D conv with D in batch
    and kd folded into output channels, then a fixed selection conv over D)
    measures 1.94 ms vs dslice's 3.45 ms / native's 4.84 ms at the bench
    shape — 41 TFLOPS, fully XLA-differentiable. Same class name as nn.Conv
    so flax param paths ("Conv_N/kernel") — and therefore the
    torch-checkpoint mapping — are unchanged.
    """

    @nn.compact
    def __call__(self, x, epilogue=None, residual=None, kernel_only=False):
        """`epilogue=(scale, bias)` (per-out-channel, f32) applies a folded
        affine (eval-mode BN): scale is multiplied into the f32 kernel BEFORE
        the compute-dtype cast (free, one rounding), bias is fused into the
        conv epilogue (kd-fold path: injected into the step-1 output's kd=1
        block; other paths: a plain post-conv add, which XLA fuses on single
        convs).

        `residual` (output-shaped tensor) is added to the conv output; on the
        kd-fold path it rides the center-block injection slot (saves ~0.6 ms
        per seam vs a plain add — kernels/conv3d.py docstring).

        `kernel_only=True` registers and returns the raw f32 kernel param
        without computing — for callers that fuse this conv's weights into a
        composite kernel (e.g. the MultiAggregation packed tail)."""

        def dims(v, n):
            if v is None:
                return (1,) * n
            return (v,) * n if isinstance(v, int) else tuple(v)

        assert not isinstance(self.kernel_size, int)
        ks = tuple(self.kernel_size)
        n = len(ks)
        strides = dims(self.strides, n)
        dilation = dims(self.kernel_dilation, n)
        assert self.feature_group_count == 1
        if isinstance(self.padding, str):
            padding = self.padding  # 'SAME'/'VALID' accepted by lax
        elif isinstance(self.padding, int):
            padding = ((self.padding, self.padding),) * n
        else:
            padding = tuple(
                (p, p) if isinstance(p, int) else tuple(p) for p in self.padding
            )

        # A tuple input means the channel-concat of its parts: convolution
        # distributes over input channels, so each part convolves with its
        # kernel slice and the results sum — avoiding materialized lane-dim
        # concats of full cost volumes (measured 1.6-3.2 ms each on v5e).
        parts = tuple(x) if isinstance(x, (tuple, list)) else None
        in_features = (
            sum(p.shape[-1] for p in parts) if parts is not None else x.shape[-1]
        )

        kernel_shape = ks + (in_features, self.features)
        kernel = self.param("kernel", self.kernel_init, kernel_shape, self.param_dtype)
        if kernel_only:
            return kernel
        bias = (
            self.param("bias", self.bias_init, (self.features,), self.param_dtype)
            if self.use_bias
            else None
        )
        e_bias = None
        if epilogue is not None:
            e_scale, e_bias = epilogue
            kernel = kernel * e_scale.astype(kernel.dtype)
            e_bias = e_bias.astype(jnp.float32)
            if bias is not None:
                # BN(conv + b) == conv·s + (b·s + bn_bias)
                e_bias = e_bias + bias.astype(jnp.float32) * e_scale.astype(jnp.float32)
                bias = None
        from flax.linen.dtypes import promote_dtype

        if parts is not None:
            promoted = promote_dtype(*parts, kernel, bias, dtype=self.dtype)
            parts, kernel, bias = tuple(promoted[:-2]), promoted[-2], promoted[-1]
            x = parts[0]  # shape/dtype probe for the dispatch below
        else:
            x, kernel, bias = promote_dtype(x, kernel, bias, dtype=self.dtype)

        on_tpu = jax.default_backend() == "tpu"
        pointwise = (
            all(k == 1 for k in ks)
            and all(s == 1 for s in strides)
            and (isinstance(padding, str) or all(p == (0, 0) for p in padding))
        )
        from dcanet_tpu.kernels.conv3d import conv3d_kdfold, supports_kdfold

        # narrow heads (e.g. the classif 32->1 logits conv) pad the output
        # channels to 8 for the kd-fold path and slice after: native conv3d
        # at C_out=1 measured 0.8 TFLOPS / 3.2 ms at the bench shape.
        co_pad = -self.features % 8 if n == 3 else 0
        fast = (
            ks == (3, 3, 3)
            and dilation == (1, 1, 1)
            and padding == ((1, 1), (1, 1), (1, 1))
            and x.dtype == jnp.bfloat16  # kd-fold loses to native conv3d at f32
            and on_tpu
            and supports_kdfold(
                x.shape[:-1] + (in_features,),
                kernel_shape[:-1] + (self.features + co_pad,),
                strides,
            )
        )
        # NB a 2D kh-fold analog (kh folded into output channels) was built
        # and A/B'd in r3/r4: 2.3x at the layer1 shape in ISOLATION
        # (tools/profile_conv2d_fold.py, self-contained: 0.56 vs 1.27 ms for
        # a bare 4-conv chain) but a net LOSS inside the extractor
        # (tools/profile_feature.py: 7.7 vs 6.6 ms — the select conv breaks
        # fusion with the BasicBlock residual adds). The losing arm
        # (DCANET_CONV2D_KHFOLD / kernels/conv2d.py) was pruned in r5; the
        # measurement harness keeps its own copy.
        import os

        # A/B knob (trace-time): DCANET_POINTWISE_MATMUL=0 routes pointwise
        # convs through lax.conv instead — measured 99.8 vs 71.6 ms on the
        # full eval model; the matmul form stays the default.
        _pw_matmul = os.environ.get("DCANET_POINTWISE_MATMUL", "1") == "1"
        if pointwise and (on_tpu or parts is not None) and _pw_matmul:
            # 1x1xx1 conv == matmul over a flattened spatial dim; XLA's
            # pointwise ConvND lowering measured ~7x off the HBM roofline.
            wmat = kernel.reshape(in_features, self.features)
            if parts is not None:
                y = None
                off = 0
                for part in parts:
                    ci = part.shape[-1]
                    yp = jax.lax.dot_general(
                        part, wmat[off : off + ci],
                        dimension_numbers=(((part.ndim - 1,), (0,)), ((), ())),
                        precision=self.precision,
                    )
                    y = yp if y is None else y + yp
                    off += ci
            else:
                y = jax.lax.dot_general(
                    x, wmat,
                    dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
                    precision=self.precision,
                )
        elif fast:
            k = kernel
            kd_bias = e_bias
            if co_pad:
                k = jnp.pad(kernel, ((0, 0),) * (kernel.ndim - 1) + ((0, co_pad),))
                if kd_bias is not None:
                    kd_bias = jnp.pad(kd_bias, ((0, co_pad),))
            inject = (
                residual
                if residual is not None and strides == (1, 1, 1) and not co_pad
                else None
            )
            y = conv3d_kdfold(
                parts if parts is not None else x, k, strides=strides,
                bias=kd_bias, residual=inject,
            )
            e_bias = None  # fused into the step-1 epilogue
            if inject is not None:
                residual = None  # consumed
            if co_pad:
                y = y[..., : self.features]
        else:
            if parts is not None:
                x = jnp.concatenate(parts, axis=-1)
            dn = {
                1: ("NWC", "WIO", "NWC"),
                2: ("NHWC", "HWIO", "NHWC"),
                3: ("NDHWC", "DHWIO", "NDHWC"),
            }[n]
            y = jax.lax.conv_general_dilated(
                x, kernel, strides, padding, rhs_dilation=dilation,
                dimension_numbers=dn, precision=self.precision,
            )
        if bias is not None:
            y = y + bias
        if e_bias is not None:
            y = y + e_bias.astype(y.dtype)
        if residual is not None:
            y = y + residual.astype(y.dtype)
        return y


class _ParityPackedBN(nn.Module):
    """nn.BatchNorm-equivalent over a parity-PACKED volume z (..., 8*C)
    (space-to-depth channel order (pd, ph, pw, c) — kernels/deconv3d.py).

    Per-channel statistics are folded across the 8 parity blocks: the SAME
    element set as BN over the interleaved (..., C) volume, but computed
    entirely in the flat 256-lane domain. The alternative — interleave2x then
    flax BN — makes XLA materialize the interleave output in a 4x-padded f32
    layout at the BN reduce (measured 1.5 GB for a 384 MB tensor at b8
    256x512; the b8 OOM of TODO.md r4). No (…, 8, C) minor-dim split either:
    that re-introduces the same padded tiling.

    The variable tree matches nn.BatchNorm exactly (params scale/bias,
    batch_stats mean/var, all (C,)) so train/eval traces and checkpoints are
    interchangeable; momentum/eps pin the same torch-equivalent defaults as
    the BatchNorm wrapper below. Stats accumulate in f32 like flax BN."""

    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, z, train: bool):
        c = z.shape[-1] // 8
        ra_mean = self.variable(
            "batch_stats", "mean", lambda *_: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda *_: jnp.ones((c,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if train:
            zf = z.astype(jnp.float32)
            n = z.size // c  # elements per real channel (incl. parity blocks)
            red = tuple(range(z.ndim - 1))
            s1 = jnp.sum(zf, axis=red)  # (8c,), flat reduce — layout-friendly
            s2 = jnp.sum(zf * zf, axis=red)
            mean = s1.reshape(8, c).sum(0) / n
            var = s2.reshape(8, c).sum(0) / n - mean * mean
            if not self.is_initializing() and self.is_mutable_collection(
                "batch_stats"
            ):
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        a = jnp.tile(inv, 8)  # packed channels are parity-major: tile matches
        b = jnp.tile(bias - mean * inv, 8)
        return z * a.astype(z.dtype) + b.astype(z.dtype)


def packed_train_bn_enabled(dtype) -> bool:
    """Gate for the parity-packed TRAIN BN tail in MultiAggregation (BN +
    redir add + relu before the interleave). DCANET_PACKED_TRAIN_BN=1
    enables; default OFF.

    Measured r5 (v5e, 256x512 sceneflow step): the r4 hypothesis — that the
    interleave->flax-BN boundary's 4x-padded f32 relayout is the b8 OOM and
    a packed-domain BN would fix it — is REFUTED. With stats, redir add and
    relu all in the packed domain (this path, parity-verified), b8 still
    OOMs by 1.57 G (vs 1.65 G for the naive packed variant; plain was
    ~20 MB short pre-r5): the b8 wall is the deep-supervision activation
    set, for which --remat (models/dcanet.py) is the working tool. At b2/b4
    the packed tail is a net LOSS (162.7 vs 156.2 ms b2; 310.8 vs 296.6 ms
    b4 for the naive variant): the redir pack's parity-structured conv
    burns 4x pointwise FLOPs and stores extra backward activations. Kept
    behind the knob with the parity test + knob-matrix coverage."""
    import os

    return os.environ.get("DCANET_PACKED_TRAIN_BN", "0") == "1"


class BatchNorm(nn.Module):
    """Thin wrapper pinning torch-equivalent BN defaults (momentum 0.1 torch
    == 0.9 flax decay, eps 1e-5).

    `fold=True` returns the eval-mode affine `(scale, bias)` in f32 (with
    `x` passed as the feature count) instead of applying the norm — read off
    the inner flax BN by probing it with zeros/ones vectors, so the params,
    their init, and the variable tree stay byte-identical to the unfused
    path. Callers fold the affine into the preceding conv (see Conv
    `epilogue`).

    `parity_packed=True` treats `x` as a parity-packed (..., 8*C) volume and
    applies _ParityPackedBN under the same inner scope name, so the variable
    tree is identical to the plain path."""

    axis_name: Optional[str] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self, x, train: bool, fold: bool = False, parity_packed: bool = False
    ):
        if parity_packed:
            return _ParityPackedBN(
                momentum=0.9, epsilon=1e-5, dtype=self.dtype, name="BatchNorm_0"
            )(x, train)
        if fold:
            assert not train, "BN folding is eval-only"
            feat = int(x)
            bn = nn.BatchNorm(
                use_running_average=True, momentum=0.9, epsilon=1e-5,
                dtype=jnp.float32, axis_name=self.axis_name,
            )
            b = bn(jnp.zeros((1, feat), jnp.float32))[0]
            s = bn(jnp.ones((1, feat), jnp.float32))[0] - b
            return s, b
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            axis_name=self.axis_name,
        )(x)


class ConvBN(nn.Module):
    """Conv (no bias) + BatchNorm, 2D or 3D by `dims`.

    Parity: reference `convbn` / `convbn_3d` (models/submodule.py:115-124).
    `padding` follows torch semantics (symmetric explicit pad); when
    dilation > 1 the 2D reference pads by `dilation` — callers pass that.
    """

    features: int
    kernel: Union[int, Tuple[int, ...]]
    strides: Union[int, Tuple[int, ...]] = 1
    padding: Union[int, Tuple[int, ...]] = 0
    dilation: Union[int, Tuple[int, ...]] = 1
    dims: int = 2
    use_bias: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self, x, train: bool, residual=None, fold_params=False, packed_out=False
    ):
        """`residual` is added AFTER the BN (out = BN(conv(x)) + residual);
        on the folded-eval path it is injected into the conv epilogue.
        `fold_params=True` (eval only) registers the params and returns
        `(kernel_f32, scale, bias)` for callers that fuse this ConvBN into a
        composite kernel instead of running it.
        `packed_out=True` (pointwise 3D ConvBN only) returns the output as a
        parity-PACKED (B, D/2, H/2, W/2, 8*features) volume: the conv runs as
        a fused pack (kernels/deconv3d.py::pack2x_pointwise) and the BN folds
        its statistics across the parity blocks — same math, flat layout.
        Works in train (the MultiAggregation packed-train redir)."""
        n = self.dims
        pad = _tuple(self.padding, n)
        conv = Conv(
            features=self.features,
            kernel_size=_tuple(self.kernel, n),
            strides=_tuple(self.strides, n),
            padding=tuple((p, p) for p in pad),
            kernel_dilation=_tuple(self.dilation, n),
            use_bias=self.use_bias,
            kernel_init=reference_conv_init,
            dtype=self.dtype,
        )
        bn = BatchNorm(dtype=self.dtype)
        if fold_params:
            assert not train and not self.use_bias
            kernel = conv(x, kernel_only=True)
            scale, bias = bn(self.features, train, fold=True)
            return kernel, scale, bias
        if packed_out:
            assert n == 3 and _tuple(self.kernel, n) == (1, 1, 1)
            assert not self.use_bias and residual is None
            from dcanet_tpu.kernels.deconv3d import pack2x_pointwise

            kernel = conv(x, kernel_only=True)
            dt = self.dtype or x.dtype
            wmat = kernel.reshape(x.shape[-1], self.features).astype(dt)
            z = pack2x_pointwise(x.astype(dt), wmat, shift_d=True)
            return bn(z, train, parity_packed=True)
        if not train and fold_eval_bn_enabled(self.dtype):
            return conv(
                x, epilogue=bn(self.features, train, fold=True),
                residual=residual,
            )
        y = bn(conv(x), train)
        return y if residual is None else y + residual


class ConvBNAct(nn.Module):
    """ConvBN + activation (relu by default, matching the reference's
    `convbn(...) + ReLU` stacks)."""

    features: int
    kernel: Union[int, Tuple[int, ...]]
    strides: Union[int, Tuple[int, ...]] = 1
    padding: Union[int, Tuple[int, ...]] = 0
    dilation: Union[int, Tuple[int, ...]] = 1
    dims: int = 2
    act: Callable = nn.relu
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool, fold_params: bool = False):
        y = ConvBN(
            self.features, self.kernel, self.strides, self.padding,
            self.dilation, self.dims, dtype=self.dtype,
        )(x, train, fold_params=fold_params)
        if fold_params:
            return y  # (kernel, scale, bias) — caller applies act after
        return self.act(y)


class BasicBlock(nn.Module):
    """Residual block of the feature extractor.

    Parity: reference models/submodule.py:251-273 — convbn+relu, convbn,
    optional 1x1-conv+BN downsample, residual add with NO trailing relu.
    """

    planes: int
    strides: int = 1
    dilation: int = 1
    padding: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        in_planes = x.shape[-1]
        pad = self.dilation if self.dilation > 1 else self.padding
        out = ConvBNAct(
            self.planes, 3, self.strides, pad, self.dilation, dims=2,
            dtype=self.dtype,
        )(x, train)
        if self.strides != 1 or in_planes != self.planes:
            conv_d = Conv(
                self.planes, (1, 1), strides=(self.strides, self.strides),
                use_bias=False, kernel_init=reference_conv_init,
                dtype=self.dtype,
            )
            bn_d = BatchNorm(dtype=self.dtype)
            if not train and fold_eval_bn_enabled(self.dtype):
                x = conv_d(x, epilogue=bn_d(self.planes, train, fold=True))
            else:
                x = bn_d(conv_d(x), train)
        # the residual rides the second conv's epilogue (kh-fold center-block
        # injection on the 2D fast path; plain add otherwise)
        return ConvBN(
            self.planes, 3, 1, pad, self.dilation, dims=2, dtype=self.dtype
        )(out, train, residual=x)


class BasicConv(nn.Module):
    """Conv(+BN)(+ReLU), parity with reference BasicConv
    (models/submodule.py:276-302)."""

    features: int
    kernel: Union[int, Tuple[int, ...]] = 3
    strides: Union[int, Tuple[int, ...]] = 1
    padding: Union[int, Tuple[int, ...]] = 1
    dims: int = 2
    use_bn: bool = True
    use_relu: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        n = self.dims
        pad = _tuple(self.padding, n)
        conv = Conv(
            self.features,
            kernel_size=_tuple(self.kernel, n),
            strides=_tuple(self.strides, n),
            padding=tuple((p, p) for p in pad),
            use_bias=False,
            kernel_init=reference_conv_init,
            dtype=self.dtype,
        )
        if self.use_bn:
            bn = BatchNorm(dtype=self.dtype)
            if not train and fold_eval_bn_enabled(self.dtype):
                y = conv(x, epilogue=bn(self.features, train, fold=True))
            else:
                y = bn(conv(x), train)
        else:
            y = conv(x)
        if self.use_relu:
            y = nn.relu(y)
        return y


class ResidualBlock(nn.Module):
    """Guidance-net residual block; parity with reference ResidualBlock
    (models/submodule.py:305-354), norm_fn='batch' flavor (the committed
    configuration; Guidance(norm_fn='batch'))."""

    planes: int
    strides: int = 1
    norm_fn: str = "batch"
    dtype: Optional[Dtype] = None

    def _norm(self, x, train):
        if self.norm_fn == "batch":
            return BatchNorm(dtype=self.dtype)(x, train)
        if self.norm_fn == "group":
            return nn.GroupNorm(num_groups=self.planes // 8, dtype=self.dtype)(x)
        if self.norm_fn == "instance":
            # torch InstanceNorm2d default: no affine params
            return nn.GroupNorm(
                num_groups=x.shape[-1], use_bias=False, use_scale=False,
                dtype=self.dtype,
            )(x)
        if self.norm_fn == "none":
            return x
        raise ValueError(self.norm_fn)

    @nn.compact
    def __call__(self, x, train: bool):
        in_planes = x.shape[-1]
        y = nn.Conv(
            self.planes, (3, 3), strides=(self.strides, self.strides),
            padding=((1, 1), (1, 1)), use_bias=True,
            kernel_init=reference_conv_init, dtype=self.dtype,
        )(x)
        y = nn.relu(self._norm(y, train))
        y = nn.Conv(
            self.planes, (3, 3), padding=((1, 1), (1, 1)), use_bias=True,
            kernel_init=reference_conv_init, dtype=self.dtype,
        )(y)
        y = nn.relu(self._norm(y, train))
        if self.strides != 1:
            x = nn.Conv(
                self.planes, (1, 1), strides=(self.strides, self.strides),
                use_bias=True, kernel_init=reference_conv_init,
                dtype=self.dtype,
            )(x)
            x = self._norm(x, train)
        return nn.relu(x + y)


class TorchConvTranspose(nn.Module):
    """Transposed conv with exact torch geometry (kernel 3, stride 2,
    padding 1, output_padding 1 -> exact 2x upsampling), any `dims`.

    Implemented as lhs-dilated correlation: zero-stuff the input by `strides`,
    pad (k-1-p, k-1-p+output_padding), correlate. Equivalent to torch
    ConvTranspose up to a static kernel flip+transpose handled by the
    checkpoint converter. Reference use: models/augment/cva.py:20-22,
    models/gwcnet_dca_g.py:85-91.
    """

    features: int
    kernel: int = 3
    strides: int = 2
    padding: int = 1
    output_padding: int = 1
    dims: int = 3
    use_bias: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, epilogue=None, kernel_only=False):
        n = self.dims
        in_features = x.shape[-1]
        k = self.kernel
        pad_lo = k - 1 - self.padding
        pad_hi = pad_lo + self.output_padding
        kernel_shape = (k,) * n + (in_features, self.features)
        w = self.param("kernel", reference_conv_init, kernel_shape)
        if kernel_only:
            return w
        e_bias = None
        if epilogue is not None:
            e_scale, e_bias = epilogue
            w = w * e_scale.astype(w.dtype)
        if self.dtype is not None:
            x = x.astype(self.dtype)
            w = w.astype(self.dtype)
        if n == 3:
            dn = ("NDHWC", "DHWIO", "NDHWC")
        elif n == 2:
            dn = ("NHWC", "HWIO", "NHWC")
        else:
            raise ValueError(n)
        import os as _os

        use_subpixel = (
            n == 3
            and (k, self.strides, self.padding, self.output_padding)
            == (3, 2, 1, 1)
            and x.dtype == jnp.bfloat16
            and jax.default_backend() == "tpu"
            and _os.environ.get("DCANET_DECONV_SUBPIXEL_TRAIN", "1") == "1"
        )
        if use_subpixel:
            # The flat subpixel decomposition (kernels/deconv3d.py) instead
            # of XLA's lhs-dilated emitter — same linear map (BN stats see
            # identical values), usable in TRAIN too. Full train step
            # measured 169.6 -> 155.8 ms @ b2 (the lhs-dilated backward was
            # the cost: MultiAggregation fwd+bwd 14.7 -> 11.2 ms).
            # DCANET_DECONV_SUBPIXEL_TRAIN=0 restores lhs-dilated for A/Bs.
            from dcanet_tpu.kernels.deconv3d import deconv2x_flat

            y = deconv2x_flat(x, w)
        else:
            y = jax.lax.conv_general_dilated(
                x, w,
                window_strides=(1,) * n,
                padding=((pad_lo, pad_hi),) * n,
                lhs_dilation=(self.strides,) * n,
                dimension_numbers=dn,
            )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            if epilogue is not None:
                e_bias = e_bias + b.astype(jnp.float32) * e_scale.astype(jnp.float32)
            else:
                y = y + b
        if e_bias is not None:
            y = y + e_bias.astype(y.dtype)
        return y


class AvgPool3dTorch(nn.Module):
    """AvgPool3d(kernel 3, stride 2, padding 1) with torch's
    count_include_pad=True (divide by the full 27 window even at borders).
    Parity: reference models/augment/cva.py:39 (`nn.AvgPool3d((3,3,3), 2, 1)`).
    Input (B, D, H, W, C)."""

    kernel: int = 3
    strides: int = 2
    padding: int = 1

    @nn.compact
    def __call__(self, x):
        k, s, p = self.kernel, self.strides, self.padding
        if (
            (k, s, p) == (3, 2, 1)
            and jax.default_backend() == "tpu"
            and x.dtype == jnp.bfloat16
            and x.shape[-1] % 8 == 0
            and x.shape[1] >= 2
        ):
            # avgpool(3, s2, p1, count_include_pad) == conv3d with constant
            # identity/27 weights; the kd-fold conv path (~40 TFLOPS) beats
            # reduce_window (measured 1.03 ms vs ~0.25 ms at the bench
            # shape). Zero-padding == count_include_pad=True exactly.
            from dcanet_tpu.kernels.conv3d import conv3d_kdfold

            c = x.shape[-1]
            eye = jnp.eye(c, dtype=x.dtype) / 27.0
            w = jnp.broadcast_to(eye, (3, 3, 3, c, c))
            return conv3d_kdfold(x, w, strides=(2, 2, 2))
        # (a separable 3-pass variant measured 2x SLOWER than this monolithic
        # reduce_window on v5e — XLA already fuses the window well here)
        window = (1, k, k, k, 1)
        strides = (1, s, s, s, 1)
        pads = ((0, 0), (p, p), (p, p), (p, p), (0, 0))
        # NB: python-scalar init value keeps this the differentiable
        # reduce_window_sum form (a traced-array init breaks the pattern).
        summed = jax.lax.reduce_window(
            x, 0.0, jax.lax.add, window, strides, pads
        )
        return (summed / (k * k * k)).astype(x.dtype)
