"""Transcription models: base classes, output layers, O&F v1/v2, TabCNN."""

from .common import (TranscriptionModel, OutputLayer, SoftmaxGroups,
                     LogisticBank, RegressionBank, run_on_batch)
from .onsetsframes import (OnsetsFrames, OnsetsFrames2, OnsetsFramesOnline,
                           AcousticModel, LanguageModel, OnlineLanguageModel,
                           fuse_acoustic_variables, unfuse_acoustic_variables,
                           fuse_lm_variables, unfuse_lm_variables)
from .tabcnn import TabCNN

__all__ = ['TranscriptionModel', 'OutputLayer', 'SoftmaxGroups', 'LogisticBank',
           'RegressionBank',
           'run_on_batch', 'OnsetsFrames', 'OnsetsFrames2', 'OnsetsFramesOnline',
           'AcousticModel', 'LanguageModel', 'OnlineLanguageModel', 'TabCNN',
           'fuse_acoustic_variables', 'unfuse_acoustic_variables',
           'fuse_lm_variables', 'unfuse_lm_variables']
