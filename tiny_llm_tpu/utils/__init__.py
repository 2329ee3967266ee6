from .pytree import pytree_dataclass, static_field

__all__ = ["pytree_dataclass", "static_field"]
