"""Canonical host-side record stores.

The reference keeps canonical records in ETS with native indexes as
rebuildable acceleration (/root/reference/README.md:14-23). Here the canonical
store is host memory (:class:`MemoryStore`); device arrays are always
rebuildable from it.
"""

from .base import Store
from .memory import MemoryStore

__all__ = ["Store", "MemoryStore"]
