"""Datasets: MAPS, MAESTRO V1-V3, GuitarSet, combos, synthetics, batching."""

from .common import TranscriptionDataset, DataLoader, collate
from .maps import MAPS
from .maestro import MAESTRO_V1, MAESTRO_V2, MAESTRO_V3
from .guitarset import GuitarSet
from .combo import DatasetCombo
from .synthetic import SyntheticPiano, SyntheticGuitar, render_notes, random_notes

__all__ = ['TranscriptionDataset', 'DataLoader', 'collate', 'MAPS',
           'MAESTRO_V1', 'MAESTRO_V2', 'MAESTRO_V3', 'GuitarSet',
           'DatasetCombo', 'SyntheticPiano', 'SyntheticGuitar',
           'render_notes', 'random_notes']
