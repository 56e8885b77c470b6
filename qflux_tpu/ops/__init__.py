from qflux_tpu.ops import attention, layers, norms, packing, rope

__all__ = ["attention", "layers", "norms", "packing", "rope"]
