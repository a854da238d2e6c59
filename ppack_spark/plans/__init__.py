from .linker import Linker

__all__ = ["Linker"]
