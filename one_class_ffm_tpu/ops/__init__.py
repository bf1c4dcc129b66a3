from .sparse_ops import project, scatter, project_xla, scatter_xla

__all__ = ["project", "scatter", "project_xla", "scatter_xla"]
