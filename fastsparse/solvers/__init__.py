from .cg import cg, cg_normal, CGResult

__all__ = ["cg", "cg_normal", "CGResult"]
