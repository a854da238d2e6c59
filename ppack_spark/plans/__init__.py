from .corpus import CorpusPipeline, CorpusSpec
from .linker import Linker

__all__ = ["CorpusPipeline", "CorpusSpec", "Linker"]
