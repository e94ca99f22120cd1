"""Explicit torch<->flax key mapping for DCANet checkpoints.

Generates, for `DCANet(num_cva=N, use_concat_volume=True)`, the complete
correspondence between the reference's state_dict keys (gwcnet_dca_g.py
module names, `module.`-prefix already stripped) and this framework's flax
params/batch_stats paths. Used by tools/convert_torch_ckpt.py.

Entry kinds:
  conv2d / conv3d:   weight OIHW / OIDHW -> HWIO / DHWIO
  deconv3d:          ConvTranspose3d IODHW -> flipped DHW(I,O) (lhs-dilated
                     correlation kernel, see nn/layers.py TorchConvTranspose)
  bias:              conv bias, copied as-is
  bn:                expands to 4 tensors: weight->scale, bias->bias,
                     running_mean/running_var -> batch_stats mean/var
"""

from __future__ import annotations

from typing import List, Tuple

Entry = Tuple[str, str, str]  # (torch_prefix, flax_path, kind)


def _convbn(torch_prefix: str, flax_prefix: str, dims: int) -> List[Entry]:
    """torch Sequential(conv, bn) <-> flax ConvBN scope."""
    kind = "conv3d" if dims == 3 else "conv2d"
    return [
        (f"{torch_prefix}.0.weight", f"{flax_prefix}/Conv_0/kernel", kind),
        (f"{torch_prefix}.1", f"{flax_prefix}/BatchNorm_0/BatchNorm_0", "bn"),
    ]


def _convbnact(torch_prefix: str, flax_prefix: str, dims: int) -> List[Entry]:
    """torch Sequential(convbn, ReLU) where convbn is element .0 of a
    2-element Sequential (reference stacks convbn and ReLU separately) —
    callers pass the convbn's own prefix."""
    return _convbn(torch_prefix, f"{flax_prefix}/ConvBN_0", dims)


def _basic_block(torch_prefix: str, flax_prefix: str, downsample: bool) -> List[Entry]:
    out = []
    # conv1 = Sequential(convbn, ReLU) -> conv1.0 is the convbn
    out += _convbnact(f"{torch_prefix}.conv1.0", f"{flax_prefix}/ConvBNAct_0", 2)
    out += _convbn(f"{torch_prefix}.conv2", f"{flax_prefix}/ConvBN_0", 2)
    if downsample:
        out.append(
            (f"{torch_prefix}.downsample.0.weight", f"{flax_prefix}/Conv_0/kernel", "conv2d")
        )
        out.append(
            (f"{torch_prefix}.downsample.1", f"{flax_prefix}/BatchNorm_0/BatchNorm_0", "bn")
        )
    return out


def _feature_extraction(num_blocks=(3, 16, 3, 3), concat: bool = True) -> List[Entry]:
    out = []
    for i, seq in enumerate((0, 2, 4)):
        out += _convbnact(
            f"feature_extraction.firstconv.{seq}",
            f"feature_extraction/ConvBNAct_{i}", 2,
        )
    blk = 0
    for layer, (n, ch_change) in enumerate(
        zip(num_blocks, (False, True, True, False)), start=1
    ):
        for j in range(n):
            down = j == 0 and ch_change
            out += _basic_block(
                f"feature_extraction.layer{layer}.{j}",
                f"feature_extraction/BasicBlock_{blk}",
                downsample=down,
            )
            blk += 1
    if concat:
        # lastconv: Sequential(convbn, ReLU, Conv2d)
        out += _convbnact(
            "feature_extraction.lastconv.0", "feature_extraction/ConvBNAct_3", 2
        )
        out.append(
            ("feature_extraction.lastconv.2.weight", "feature_extraction/Conv_0/kernel", "conv2d")
        )
    return out


def _residual_block(torch_prefix: str, flax_prefix: str, downsample: bool) -> List[Entry]:
    out = [
        (f"{torch_prefix}.conv1.weight", f"{flax_prefix}/Conv_0/kernel", "conv2d"),
        (f"{torch_prefix}.conv1.bias", f"{flax_prefix}/Conv_0/bias", "bias"),
        (f"{torch_prefix}.norm1", f"{flax_prefix}/BatchNorm_0/BatchNorm_0", "bn"),
        (f"{torch_prefix}.conv2.weight", f"{flax_prefix}/Conv_1/kernel", "conv2d"),
        (f"{torch_prefix}.conv2.bias", f"{flax_prefix}/Conv_1/bias", "bias"),
        (f"{torch_prefix}.norm2", f"{flax_prefix}/BatchNorm_1/BatchNorm_0", "bn"),
    ]
    if downsample:
        out += [
            (f"{torch_prefix}.downsample.0.weight", f"{flax_prefix}/Conv_2/kernel", "conv2d"),
            (f"{torch_prefix}.downsample.0.bias", f"{flax_prefix}/Conv_2/bias", "bias"),
            (f"{torch_prefix}.downsample.1", f"{flax_prefix}/BatchNorm_2/BatchNorm_0", "bn"),
        ]
    return out


def _guidance() -> List[Entry]:
    out = [
        ("guidance.conv_start.0.weight", "guidance/Conv_0/kernel", "conv2d"),
        ("guidance.conv_start.0.bias", "guidance/Conv_0/bias", "bias"),
        ("guidance.norm1", "guidance/BatchNorm_0/BatchNorm_0", "bn"),
    ]
    # layer1: 2x ResidualBlock(32, s1); layer2: ResidualBlock(64, s2) + (64, s1)
    out += _residual_block("guidance.layer1.0", "guidance/ResidualBlock_0", False)
    out += _residual_block("guidance.layer1.1", "guidance/ResidualBlock_1", False)
    out += _residual_block("guidance.layer2.0", "guidance/ResidualBlock_2", True)
    out += _residual_block("guidance.layer2.1", "guidance/ResidualBlock_3", False)
    for i in range(2):
        out += [
            (f"guidance.conv_g0.{i}.conv.weight", f"guidance/BasicConv_{i}/Conv_0/kernel", "conv2d"),
            (f"guidance.conv_g0.{i}.bn", f"guidance/BasicConv_{i}/BatchNorm_0/BatchNorm_0", "bn"),
        ]
    out.append(("guidance.guidance.weight", "guidance/Conv_1/kernel", "conv2d"))
    return out


def _projection(torch_prefix: str, flax_prefix: str, num_convs: int) -> List[Entry]:
    out = []
    for i in range(num_convs):
        tp = f"{torch_prefix}.{i}" if num_convs > 1 else torch_prefix
        out += [
            (f"{tp}.0.weight", f"{flax_prefix}/Conv_{i}/kernel", "conv3d"),
            (f"{tp}.1", f"{flax_prefix}/BatchNorm_{i}/BatchNorm_0", "bn"),
        ]
    return out


def _cva(torch_prefix: str, flax_prefix: str) -> List[Entry]:
    out = []
    # downsample = Sequential(AvgPool3d, convbn_3d, ReLU) -> .1 is the convbn
    out += _convbn(f"{torch_prefix}.downsample.1", f"{flax_prefix}/down_conv/ConvBN_0", 3)
    # classify = Sequential(convbn_3d, ReLU, Conv3d)
    out += _convbn(f"{torch_prefix}.classify.0", f"{flax_prefix}/classify0/ConvBN_0", 3)
    out.append((f"{torch_prefix}.classify.2.weight", f"{flax_prefix}/classify1/kernel", "conv3d"))
    att_t = f"{torch_prefix}.slc_net.cross_attention"
    att_f = f"{flax_prefix}/slc/cross_attention"
    out += _projection(f"{att_t}.query_project", f"{att_f}/query_project", 2)
    out += _projection(f"{att_t}.key_project", f"{att_f}/key_project", 2)
    out += _projection(f"{att_t}.value_project", f"{att_f}/value_project", 1)
    out += _projection(f"{att_t}.out_project", f"{att_f}/out_project", 1)
    out += _convbn(f"{torch_prefix}.fuse.0", f"{flax_prefix}/fuse", 3)
    agg_t, agg_f = f"{torch_prefix}.cost_agg", f"{flax_prefix}/cost_agg"
    out += _convbn(f"{agg_t}.conv1.0", f"{agg_f}/conv1/ConvBN_0", 3)
    out += _convbn(f"{agg_t}.conv2.0", f"{agg_f}/conv2/ConvBN_0", 3)
    out.append((f"{agg_t}.conv3.0.weight", f"{agg_f}/conv3/kernel", "deconv3d"))
    out.append((f"{agg_t}.conv3.1", f"{agg_f}/conv3_bn/BatchNorm_0", "bn"))
    out += _convbn(f"{agg_t}.redir", f"{agg_f}/redir", 3)
    return out


def _classifier(torch_prefix: str, flax_prefix: str) -> List[Entry]:
    out = _convbn(f"{torch_prefix}.0", f"{flax_prefix}/ConvBNAct_0/ConvBN_0", 3)
    out.append((f"{torch_prefix}.2.weight", f"{flax_prefix}/Conv_0/kernel", "conv3d"))
    return out


def _hourglass3d(tp: str, fp: str) -> List[Entry]:
    """Plain GwcNet's two-level 3D hourglass (models/gwcnet.py:67-104 <->
    nn/aggregation.py Hourglass3D)."""
    out = []
    for conv in ("conv1", "conv2", "conv3", "conv4"):
        out += _convbn(f"{tp}.{conv}.0", f"{fp}/{conv}/ConvBN_0", 3)
    for deconv in ("conv5", "conv6"):
        out.append((f"{tp}.{deconv}.0.weight", f"{fp}/{deconv}/kernel", "deconv3d"))
        out.append((f"{tp}.{deconv}.1", f"{fp}/{deconv}_bn/BatchNorm_0", "bn"))
    out += _convbn(f"{tp}.redir1", f"{fp}/redir1", 3)
    out += _convbn(f"{tp}.redir2", f"{fp}/redir2", 3)
    return out


def gwcnet_baseline_mapping(use_concat: bool = True) -> List[Entry]:
    """Key table for the plain-GwcNet baseline (models/gwcnet.py:107-249 <->
    models/dcanet.py GwcNetBaseline): feature extractor + dres0/1 + 3 stacked
    Hourglass3D aggregators + 4 classif heads (no guidance/prop)."""
    out = _feature_extraction(concat=use_concat)
    out += _convbn("dres0.0", "ConvBNAct_0/ConvBN_0", 3)
    out += _convbn("dres0.2", "ConvBNAct_1/ConvBN_0", 3)
    out += _convbn("dres1.0", "ConvBNAct_2/ConvBN_0", 3)
    out += _convbn("dres1.2", "ConvBN_0", 3)
    for name in ("dres2", "dres3", "dres4"):
        out += _hourglass3d(name, name)
    for i in range(4):
        out += _classifier(f"classif{i}", f"classif{i}")
    return out


def dcanet_mapping(num_cva: int = 3, use_concat: bool = True) -> List[Entry]:
    out = _feature_extraction()
    out += _guidance()
    # dres0 = Sequential(convbn, ReLU, convbn, ReLU); dres1 = (convbn, ReLU, convbn)
    out += _convbn("dres0.0", "ConvBNAct_0/ConvBN_0", 3)
    out += _convbn("dres0.2", "ConvBNAct_1/ConvBN_0", 3)
    out += _convbn("dres1.0", "ConvBNAct_2/ConvBN_0", 3)
    out += _convbn("dres1.2", "ConvBN_0", 3)
    for i in range(1, num_cva + 1):
        out += _cva(f"cva{i}", f"cva{i}")
    heads = range(num_cva + 1) if num_cva > 0 else (0,)
    for i in heads:
        out += _classifier(f"classif{i}", f"classif{i}")
    # prop.conv = Sequential(convbn, ReLU, Conv2d)
    out += _convbn("prop.conv.0", "prop/ConvBNAct_0/ConvBN_0", 2)
    out.append(("prop.conv.2.weight", "prop/Conv_0/kernel", "conv2d"))
    return out
