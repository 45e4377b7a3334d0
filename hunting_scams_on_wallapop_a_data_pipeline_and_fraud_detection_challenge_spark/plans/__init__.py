from .queries import REGISTRY, QuerySpec

__all__ = ["REGISTRY", "QuerySpec"]
