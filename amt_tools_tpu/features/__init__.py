"""Feature extraction: STFT/Mel/CQT/VQT/HCQT/HVQT/waveform/power/combo/streams."""

from .common import FeatureModule
from .waveform import WaveformWrapper
from .stft import STFT
from .mel import MelSpec
from .cqt import CQT, VQT
from .hcqt import HCQT, HVQT
from .power import SignalPower
from .combo import FeatureCombo
from .stream import FeatureStream, MicrophoneStream, AudioStream, AudioFileStream

__all__ = ['FeatureModule', 'WaveformWrapper', 'STFT', 'MelSpec', 'CQT', 'VQT',
           'HCQT', 'HVQT', 'SignalPower', 'FeatureCombo', 'FeatureStream',
           'MicrophoneStream', 'AudioStream', 'AudioFileStream']
