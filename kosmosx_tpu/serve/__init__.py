from kosmosx_tpu.serve.engine import Request, ServeConfig, ServeEngine
from kosmosx_tpu.serve.server import ServeServer

__all__ = ["Request", "ServeConfig", "ServeEngine", "ServeServer"]
