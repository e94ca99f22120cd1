from dcanet_tpu.kernels.gwc import build_gwc_volume_pallas

__all__ = ["build_gwc_volume_pallas"]
