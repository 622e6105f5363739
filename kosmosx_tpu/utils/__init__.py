from kosmosx_tpu.utils.pytree import param_count, param_bytes

__all__ = ["param_count", "param_bytes"]
