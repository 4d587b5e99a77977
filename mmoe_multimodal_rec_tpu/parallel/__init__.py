from .mesh import (batch_shardings, make_mesh, param_shardings, replicated)

__all__ = ["batch_shardings", "make_mesh", "param_shardings", "replicated"]
