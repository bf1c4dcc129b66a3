from .numpy_metrics import ladder_metrics_np, TOP_K_LADDER

__all__ = ["ladder_metrics_np", "TOP_K_LADDER"]
