"""flutpu.inject — dynamic pipeline rebuild (reference: injectbin plugin)."""

from .injectbin import InjectBin

__all__ = ["InjectBin"]
