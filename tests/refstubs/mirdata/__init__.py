"""mirdata stub (import-graph satisfaction for the reference GuitarSet loader)."""

from . import datasets  # noqa: F401
