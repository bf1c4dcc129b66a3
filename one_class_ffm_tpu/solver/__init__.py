from .params import HyperParams

__all__ = ["HyperParams"]
