"""Model registry — a working replacement for the reference's dead
`__models__` dict (models/__init__.py:1-7 imports a module absent from the
snapshot; entry scripts bypass it). Names cover the whole ablation family."""

from __future__ import annotations

from typing import Any, Callable, Dict

from dcanet_tpu.models.dcanet import DCANet, GwcNetBaseline
from dcanet_tpu.models.ganet import GANetStereo


def _dca(num_cva: int, use_concat: bool = True, full_res: bool = False) -> Callable:
    def factory(maxdisp: int = 192, **kw: Any):
        return DCANet(
            maxdisp=maxdisp,
            num_cva=num_cva,
            use_concat_volume=use_concat,
            full_res_supervision=full_res,
            **kw,
        )

    return factory


MODELS: Dict[str, Callable] = {
    # flagship (reference gwcnet_dca_g.py, GwcNet_GC)
    "dcanet": _dca(3),
    "dcanet-g": _dca(3, use_concat=False),
    # ablation family (disparity-class-count / #CVA-block sweep)
    "dcanet-cva0": _dca(0),
    "dcanet-cva1": _dca(1),
    "dcanet-cva2": _dca(2),
    "dcanet-cva4": _dca(4, full_res=True),
    # upstream baseline (reference models/gwcnet.py)
    "gwcnet-g": lambda maxdisp=192, **kw: GwcNetBaseline(
        maxdisp=maxdisp, use_concat_volume=False, **kw
    ),
    "gwcnet-gc": lambda maxdisp=192, **kw: GwcNetBaseline(
        maxdisp=maxdisp, use_concat_volume=True, **kw
    ),
    # guided-aggregation lineage (reference models/libs/GANet — CUDA kernels
    # vendored but never assembled; completed here)
    "ganet": lambda maxdisp=192, **kw: GANetStereo(maxdisp=maxdisp, **kw),
}


def make_model(name: str, maxdisp: int = 192, **kw: Any):
    if name not in MODELS:
        raise KeyError(f"unknown model {name!r}; available: {sorted(MODELS)}")
    return MODELS[name](maxdisp=maxdisp, **kw)
